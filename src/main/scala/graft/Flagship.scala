package graft

import graft.Tables._
import graft.ops.dsum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship "daily box-office report" re-expressed on the testdata star
  * schema (SURVEY.md §7.2): scan → date-window filter (B7) → fact⋈fact join →
  * revenue aggregation (D1) → rank window (W3) → top-10 (S2) → deterministic
  * sort (S1). This is the reference's end-to-end shape — the daily top-10
  * chart (README.md:174-177) over consolidated daily data — in one Spark job.
  *
  * Plan shape at scale: filter pushed into the orders scan, lineitem⋈orders
  * shuffle join on the order key (AQE picks broadcast when the filtered side
  * is small), single shuffle for the groupBy, TakeOrderedAndProject for the
  * top-k — no global sort and no single-partition window over the full
  * per-customer aggregate (hundreds of millions of rows at 100 TB). The rank
  * column is derived AFTER the limit, over ≤10 rows, where a single-partition
  * window is free; the (revenue desc, custkey) order is total, so
  * rank ≡ row_number and matches the pre-limit rank semantics exactly.
  */
object Flagship {
  def report(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val o = orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val revenue = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2)
        .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
    revenue
      .orderBy(col("revenue").desc, col("o_custkey")) // TakeOrderedAndProject
      .limit(10)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("revenue").desc, col("o_custkey"))))
      .orderBy("rnk")
  }
}
