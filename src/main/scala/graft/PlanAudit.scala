package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: sweep every query's physical plan for scale red flags. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
          "GlobalWindow" -> p.linesIterator.exists(l =>
            l.contains("windowspecdefinition(") && !l.contains(", windowspecdefinition")
              && l.contains("Window [") && !l.matches(".*windowspecdefinition\\([a-zA-Z_].*"))
        ).collect { case (k, true) => k }
        println(f"AUDIT $name%-22s ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"AUDIT $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
