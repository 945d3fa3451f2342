package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.KmvSketch.kmvDistinct

/** Accuracy gates for the approximate-distinct queries (SURVEY §2.D D7).
  *
  * `agg_approx_distinct` is rows-only at the driver (sketch implementations
  * differ between Spark and DuckDB), so this spec is its verification story:
  * the HLL estimates from the DECLARED query must land within 5% of the
  * exact counts from the declared `agg_count_distinct` query at sf0.01
  * (Spark's approx_count_distinct default rsd is 0.05). Likewise KMV's
  * above-k regime — the oracle-checked `agg_kmv_distinct` only exercises
  * exact-below-k — is pinned here on real table data with distinct count
  * ≫ k, within the 3/√k KMV error bound.
  */
class ApproxAccuracySpec extends SparkSpec {
  def sf001 = "/root/testdata/sf0.01"

  private def relErr(est: Long, exact: Long): Double =
    math.abs(est - exact.toDouble) / exact.toDouble

  test("agg_approx_distinct (declared query) within 5% of exact at sf0.01") {
    val Row(approxCust: Long, approxOrders: Long) =
      SparkEntry.queries("agg_approx_distinct")(spark, sf001).collect().head
    val Row(exactCust: Long, _, _) =
      SparkEntry.queries("agg_count_distinct")(spark, sf001).collect().head
    val exactOrders =
      Tables.orders(spark, sf001).agg(countDistinct(col("o_orderkey")))
        .collect().head.getLong(0)
    assert(relErr(approxCust, exactCust) < 0.05,
      s"HLL custkey estimate $approxCust vs exact $exactCust")
    assert(relErr(approxOrders, exactOrders) < 0.05,
      s"HLL orderkey estimate $approxOrders vs exact $exactOrders")
  }

  test("agg_approx_percentile (declared query) within 1% of declared exact " +
      "per group at sf0.01") {
    // approx_percentile (Greenwald-Khanna) with accuracy 10000 → rank error
    // <= n/10000; pin the DECLARED grouped query's per-group VALUE error
    // against the oracle-checked agg_percentile query (its exact mirror —
    // same groups, same percentiles).
    def byGroup(name: String): Map[String, Seq[Double]] =
      SparkEntry.queries(name)(spark, sf001).collect().map { r =>
        r.getString(0) -> Seq(1, 2, 3).map(i =>
          r.get(i).toString.toDouble)
      }.toMap
    val approx = byGroup("agg_approx_percentile")
    val exact = byGroup("agg_percentile")
    assert(approx.keySet === exact.keySet)
    for ((g, es) <- exact; ((a, e), p) <- approx(g).zip(es).zip(
        Seq("p50", "p90", "p99"))) {
      assert(math.abs(a - e) / e < 0.01,
        s"group $g $p: approx $a vs exact $e")
    }
  }

  test("dq_profile_approx (declared query) nd_* within 5% of exact profile " +
      "at sf0.01") {
    // The production HLL profile must agree with the oracle-checked exact
    // profile on everything it shares: non-distinct fields EXACTLY (same
    // plan modulo the distinct aggregate), distinct estimates within the
    // sketch's documented rsd (0.05).
    def profile(name: String): Map[String, Row] =
      SparkEntry.queries(name)(spark, sf001).collect()
        .map(r => r.getString(0) -> r).toMap
    val exact = profile("dq_profile")
    val approx = profile("dq_profile_approx")
    assert(approx.keySet === exact.keySet)
    for ((cn, e) <- exact) {
      val a = approx(cn)
      for (f <- Seq("n_rows", "n_nonnull", "null_frac", "min_repr", "max_repr"))
        assert(a.getAs[Any](f) === e.getAs[Any](f), s"$cn.$f differs")
      val (ndA, ndE) = (a.getAs[Long]("n_distinct"), e.getAs[Long]("n_distinct"))
      assert(relErr(ndA, ndE) < 0.05, s"$cn: HLL nd $ndA vs exact $ndE")
    }
  }

  test("agg_histogram_eqdepth_approx: per-bucket mass within 2% of ideal " +
      "n/10 at sf0.01") {
    // The GK-boundary twin is the wired 100 TB path for the exact
    // oracle-checked agg_histogram_eqdepth. Equal-depth semantics =
    // every decile bucket holds ~n/10 rows; with accuracy 10000 the rank
    // error per boundary is <= n/10000, so each bucket's mass can drift
    // at most ~2·n/10000 = 0.2% of n (2% of the bucket). Assert with a
    // little slack for the cent-grid boundary rounding.
    val approx = SparkEntry.queries("agg_histogram_eqdepth_approx")(
      spark, sf001).collect()
    assert(approx.map(_.getAs[Int]("bucket")).toSeq == (0 to 9),
      "expected exactly buckets 0..9")
    val n = approx.map(_.getAs[Long]("n")).sum
    for (r <- approx) {
      val mass = r.getAs[Long]("n").toDouble
      assert(math.abs(mass - n / 10.0) / (n / 10.0) < 0.02,
        s"bucket ${r.getAs[Int]("bucket")}: mass $mass vs ideal ${n / 10.0}")
    }
  }

  test("customer_rfm_approx: scores drift <=1 quintile vs exact, <10% of " +
      "customers drift at all, at sf0.01") {
    // r and f are coarse discrete variables (days, order counts): the
    // exact form INTERPOLATES quintile boundaries while GK returns actual
    // data values, so a boundary moving across one tie-class (say f=8)
    // legitimately shifts every customer in that class by one quintile.
    // Hence the per-score bound is hard (<=1) but the drifted-fraction
    // bound is sized to a couple of tie-classes, not sketch error.
    def scores(name: String): Map[Long, (Int, Int, Int)] =
      SparkEntry.queries(name)(spark, sf001).collect().map { r =>
        r.getAs[Long]("o_custkey") ->
          ((r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
            r.getAs[Int]("m_score")))
      }.toMap
    val exact = scores("customer_rfm")
    val approx = scores("customer_rfm_approx")
    assert(approx.keySet === exact.keySet)
    var drifted = 0
    for ((k, (re, fe, me)) <- exact) {
      val (ra, fa, ma) = approx(k)
      for (((a, e), nm) <- Seq(ra -> re, fa -> fe, ma -> me)
          .zip(Seq("r", "f", "m"))) {
        assert(math.abs(a - e) <= 1,
          s"custkey $k ${nm}_score: approx $a vs exact $e")
      }
      if ((ra, fa, ma) != ((re, fe, me))) drifted += 1
    }
    assert(drifted.toDouble / exact.size < 0.10,
      s"$drifted/${exact.size} customers drifted a quintile")
  }

  test("dq_outlier_mad_approx: outlier set Jaccard >= 0.9 vs exact, " +
      "per-source median within 1 char, at sf0.01") {
    // GK returns actual values where the exact form interpolates to x.5,
    // so only docs sitting hard on the 3·MAD boundary may flip — the set
    // must stay essentially the same, and medians can differ by < 1.
    def run(name: String) =
      SparkEntry.queries(name)(spark, sf001).collect()
    def flagged(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1))).toSet
    def meds(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.get(3).toString.toDouble).toMap
    val e = run("dq_outlier_mad")
    val a = run("dq_outlier_mad_approx")
    val (se, sa) = (flagged(e), flagged(a))
    val jac = (se intersect sa).size.toDouble / (se union sa).size
    assert(jac >= 0.9, s"outlier sets diverged: |e|=${se.size} " +
      s"|a|=${sa.size} jaccard=$jac")
    for ((src, me) <- meds(e); ma <- meds(a).get(src))
      assert(math.abs(me - ma) < 1.0, s"$src: med approx $ma vs exact $me")
  }

  test("KMV above-k estimation on real table data (distinct >> k)") {
    val o = Tables.orders(spark, sf001)
    val exact = o.agg(countDistinct(col("o_orderkey"))).collect().head.getLong(0)
    assert(exact > 1024, s"fixture precondition: want distinct >> k, got $exact")
    val est = o.agg(kmvDistinct(col("o_orderkey"), k = 256))
      .collect().head.getLong(0)
    assert(relErr(est, exact) < 3.0 / math.sqrt(256),
      s"KMV estimate $est vs exact $exact")
  }

  test("KMV above-k grouped estimation (per-group sketches stay bounded)") {
    val o = Tables.orders(spark, sf001)
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_orderkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = o.groupBy("o_orderpriority")
      .agg(kmvDistinct(col("o_orderkey"), k = 256).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    for ((g, e) <- exact) {
      assert(relErr(est(g), e) < 3.0 / math.sqrt(256),
        s"group $g: KMV ${est(g)} vs exact $e")
    }
  }

  test("agg_hll_rollup: union-of-monthly-sketches estimate EQUALS the " +
    "direct single-pass estimate and is within 5% of exact") {
    val rolled = SparkEntry.queries("agg_hll_rollup")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf001)
      .withColumn("year", date_format(col("o_orderdate"), "yyyy"))
    // HLL registers are slot-maxes: merge order is immaterial, so the
    // rollup must be EXACTLY the direct estimate, not just close
    val direct = o.groupBy("year")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(14)))
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled === direct,
      "sketch rollup must be lossless vs the single-pass sketch")
    val exact = o.groupBy("year")
      .agg(countDistinct(col("o_custkey"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((y, e) <- exact)
      assert(relErr(rolled(y), e) < 0.05,
        s"year $y: HLL rollup ${rolled(y)} vs exact $e")
  }
}
