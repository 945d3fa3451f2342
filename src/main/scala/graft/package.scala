package object graft {
  /** Driver query contract: (session, sf-dir) => result DataFrame. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
