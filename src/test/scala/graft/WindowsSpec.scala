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

  test("attribution_last_touch: channels cover attributable purchases, " +
    "share sums to 1") {
    val res = ops.Windows.queries("attribution_last_touch")(spark, sf0001)
      .as[(String, Long, Long, Double, Double)].collect()
    // a purchase can never credit itself
    assert(res.forall(_._1 != "purchase"))
    assert(math.abs(res.map(_._5).sum - 1.0) < 1e-9)
    // brute force: per-user ordered walk, credit the last non-purchase
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id",
        $"event_type").as[(Long, Long, Long, String)].collect()
    val brute = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var lastCh: String = null
      sorted.flatMap { case (_, _, _, ty) =>
        val credit = if (ty == "purchase" && lastCh != null)
          Some(lastCh) else None
        if (ty != "purchase") lastCh = ty
        credit
      }
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(res.map(r => (r._1, r._2)).toMap === brute)
  }

  test("win_distinct_rolling: k bounded by frame fill and type domain") {
    val w = Window.partitionBy("user_id").orderBy($"ts", $"event_id")
    val base = Tables.events(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .select($"user_id", $"event_id", $"rn")
    val res = ops.Windows.queries("win_distinct_rolling")(spark, sf0001)
    val joined = res.join(base, Seq("user_id", "event_id"))
      .select($"k_types_10", least($"rn", lit(10)).as("fill"))
      .as[(Long, Int)].collect()
    // 1 <= k <= min(rows-in-frame, |event type domain| = 5)
    assert(joined.forall { case (k, fill) =>
      k >= 1 && k <= fill && k <= 5 })
  }

  test("win_rolling_median: matches a brute-force per-user walk") {
    val res = ops.Windows.queries("win_rolling_median")(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()
    val brute = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - 8), i + 1)
          .map(_._4).sorted
        val n = win.length
        val med = if (n % 2 == 1) win(n / 2)
          else (win(n / 2 - 1) + win(n / 2)) / 2
        ((sorted(i)._1, sorted(i)._3), med)
      }
    }.toMap
    res.foreach { case (u, eid, _, med) =>
      assert(med === brute((u, eid)), s"user $u event $eid") }
    assert(res.length === evs.length)
  }

  test("user_streaks: streaks partition active days into maximal " +
    "consecutive runs") {
    val res = ops.Windows.queries("user_streaks")(spark, sf0001)
      .as[(Long, java.sql.Date, java.sql.Date, Long)].collect()
    val active = Tables.events(spark, sf0001)
      .select($"user_id", $"ts".cast("date").as("day")).distinct()
      .as[(Long, java.sql.Date)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2.toLocalDate).toSet).toMap
    // every streak is a full consecutive run of the user's active days,
    // lengths agree, and streaks cover all active days exactly once
    val covered = scala.collection.mutable.Map.empty[Long, Set[java.time.LocalDate]]
    res.foreach { case (u, s0, e0, len) =>
      val (s, e) = (s0.toLocalDate, e0.toLocalDate)
      val days = Iterator.iterate(s)(_.plusDays(1))
        .takeWhile(!_.isAfter(e)).toSet
      assert(days.size.toLong === len, s"user $u streak $s..$e")
      assert(days.subsetOf(active(u)), s"user $u: inactive day inside streak")
      // maximality: the day before and after the streak are inactive
      assert(!active(u).contains(s.minusDays(1)), s"user $u: $s not maximal")
      assert(!active(u).contains(e.plusDays(1)), s"user $u: $e not maximal")
      val prev = covered.getOrElse(u, Set.empty)
      assert(prev.intersect(days).isEmpty, s"user $u: overlapping streaks")
      covered(u) = prev ++ days
    }
    assert(covered === active.map { case (k, v) => k -> v })
  }

  test("ts_ewma: convex combination stays inside the tap window; " +
    "first row equals its own revenue") {
    val rows = ops.Windows.queries("ts_ewma")(spark, sf0001)
      .as[(java.sql.Date, Double, Double)].collect()
    val revs = rows.map(_._2)
    rows.zipWithIndex.foreach { case ((_, _, ewma), i) =>
      val window = revs.slice(math.max(0, i - 7), i + 1)
      assert(ewma >= window.min - 1e-9 && ewma <= window.max + 1e-9,
        s"row $i: ewma $ewma outside [${window.min}, ${window.max}]")
    }
    assert(math.abs(rows.head._3 - rows.head._2) < 1e-9)
    // most recent tap dominates: weight 1/2 on today by construction
    val manual = rows.indices.map { i =>
      val window = revs.slice(math.max(0, i - 7), i + 1).reverse
      val ws = window.indices.map(j => math.pow(0.5, j + 1))
      window.zip(ws).map { case (x, wt) => x * wt }.sum / ws.sum
    }
    rows.zip(manual).foreach { case ((_, _, got), want) =>
      assert(math.abs(got - want) < 1e-6) }
  }
}
