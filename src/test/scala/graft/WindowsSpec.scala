package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function invariants (SURVEY.md §5.2 #3). */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sf0001).cache()

  test("cumsum's last value per key equals the key's total (W2)") {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val last = orders
      .withColumn("cum", sum("o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_custkey")))
      .filter($"rn" === $"n")
      .select($"o_custkey", $"cum")
    val total = orders.groupBy("o_custkey").agg(sum("o_totalprice").as("t"))
    val bad = last.join(total, "o_custkey")
      .filter(abs($"cum" - $"t") > 1e-6)
    assert(bad.isEmpty)
  }

  test("lag delta telescopes: sum of deltas = last - first (W1)") {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val d = orders
      .withColumn("delta", col("o_totalprice") - lag("o_totalprice", 1).over(w))
    val sums = d.groupBy("o_custkey").agg(
      sum("delta").as("dsum"),
      max(struct(col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))
        .getField("o_totalprice").as("lastv"),
      min(struct(col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))
        .getField("o_totalprice").as("firstv"))
    val bad = sums.filter($"dsum".isNotNull &&
      abs($"dsum" - ($"lastv" - $"firstv")) > 1e-6)
    assert(bad.isEmpty)
  }

  test("rank within month never exceeds month row count (W3)") {
    val w = Window.partitionBy("m").orderBy(col("o_totalprice").desc)
    val bad = orders
      .withColumn("m", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("rnk", rank().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("m")))
      .filter($"rnk" > $"n")
    assert(bad.isEmpty)
  }

  test("share-of-total sums to 1 per day (W4)") {
    val shares = orders
      .withColumn("share", col("o_totalprice") /
        sum("o_totalprice").over(Window.partitionBy("o_orderdate")))
      .groupBy("o_orderdate").agg(sum("share").as("s"))
    assert(shares.filter(abs($"s" - 1.0) > 1e-9).isEmpty)
  }

  test("funnel stages shrink monotonically and match a brute-force walk") {
    val r = ops.Windows.queries("funnel_conversion")(spark, sf0001)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    val (nu, nv, nc, np, rv, rc, rp) = r
    assert(nu >= nv && nv >= nc && nc >= np && np >= 0)
    Seq(rv, rc, rp).foreach(x => assert(x >= 0.0 && x <= 1.0))
    // brute force: per-user ordered event walk on the collected slice
    val evs = Tables.events(spark, sf0001)
      .filter($"ts" < to_timestamp(lit("2024-01-08")))
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
      .as[(Long, String, Long)].collect()
    val byUser = evs.groupBy(_._1)
    def stage(u: Long): Int = {
      val es = byUser(u).sortBy(_._3)
      val tv = es.collectFirst { case (_, "view", t) => t }
      val tc = tv.flatMap(v =>
        es.collectFirst { case (_, "click", t) if t > v => t })
      val tp = tc.flatMap(c =>
        es.collectFirst { case (_, "purchase", t) if t > c => t })
      if (tp.isDefined) 3 else if (tc.isDefined) 2
      else if (tv.isDefined) 1 else 0
    }
    val stages = byUser.keys.toSeq.map(stage)
    assert(nu === byUser.size.toLong)
    assert(nv === stages.count(_ >= 1).toLong)
    assert(nc === stages.count(_ >= 2).toLong)
    assert(np === stages.count(_ >= 3).toLong)
  }
}
