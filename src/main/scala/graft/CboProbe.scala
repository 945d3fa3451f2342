package graft

import org.apache.spark.sql.SparkSession

/** Dev tooling (PLANS.md generator): prints the optimized logical plan of
  * CboSpec's pessimally-ordered Q5 join graph with and without CBO join
  * reorder, against ANALYZE'd copies of the sf0.001 tables. The spec
  * asserts the reorder fires; this main captures the before/after plan
  * text PLANS.md pins ("CBO join reorder" section). Not part of the
  * engine or the driver contract.
  */
object CboProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/cbo_probe_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val tables =
      Seq("lineitem", "orders", "customer", "supplier", "nation", "region")
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_probe")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").saveAsTable(s"cbo_probe.$t")
      spark.sql(s"ANALYZE TABLE cbo_probe.$t COMPUTE STATISTICS")
    }
    val q5 = """
      SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
      FROM cbo_probe.lineitem l, cbo_probe.orders o, cbo_probe.customer c,
           cbo_probe.supplier s, cbo_probe.nation n, cbo_probe.region r
      WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
        AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name"""
    for (on <- Seq(false, true)) {
      spark.conf.set("spark.sql.cbo.enabled", on.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
      println(s"==== CBO ${if (on) "ON (stats + joinReorder)" else "OFF"} ====")
      println(spark.sql(q5).queryExecution.optimizedPlan.treeString)
    }
    spark.sql("DROP DATABASE IF EXISTS cbo_probe CASCADE")
    spark.stop()
  }
}
