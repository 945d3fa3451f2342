package graft

/** Diffs every declared query's AQE-final plan features against the
  * committed PLANSNAP.json (see PlanSnap's scaladoc for what's pinned
  * and why). A failure here means the PLAN changed, not the results —
  * if the change is intentional (new Spark, deliberate conf move, a
  * query rewrite), regenerate the artifact with `scripts/plansnap.sh`
  * and commit the one-line diff.
  */
class PlanSnapSpec extends SparkSpec {

  private def committedFile(name: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p),
      s"$name missing — generate it with scripts/plansnap.sh")
    PlanSnap.parseLines(java.nio.file.Files.readString(p))
  }
  private def committed: Map[String, String] = committedFile("PLANSNAP.json")

  test("every declared query's AQE-final plan matches PLANSNAP.json " +
      "(join strategies, exchange counts, scan pushdown)") {
    val want = committed
    // other suites sharing the session may leave cached tables behind;
    // a cached input turns a FileSourceScan into an InMemoryTableScan
    // and reads as phantom plan drift (scans 1 -> 0) — start clean, as
    // the generator main does by construction (fresh session)
    spark.catalog.clearCache()
    val got: Map[String, String] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
        val f = PlanSnap.features(fn(spark, sf0001))
        spark.catalog.clearCache()
        n -> s""""$n": ${f.json}"""
      }.toMap
    val missing = (got.keySet -- want.keySet).toSeq.sorted
    val stale = (want.keySet -- got.keySet).toSeq.sorted
    val drifted = got.keySet.intersect(want.keySet).toSeq.sorted
      .filter(n => got(n) != want(n))
      .map(n => s"$n\n  committed: ${want(n)}\n  current:   ${got(n)}")
    assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
      s"""plan-shape drift vs PLANSNAP.json — intentional changes need a
         |regenerated artifact (see PlanSnapSpec scaladoc).
         |new queries not in artifact: ${missing.mkString(", ")}
         |artifact queries no longer declared: ${stale.mkString(", ")}
         |drifted plans:
         |${drifted.mkString("\n")}""".stripMargin)
  }

  test("the top-30 heaviest queries' sf0.1 (bench-scale) plans match " +
      "PLANSNAP_SF01.json — AQE flips that only happen at bench sizes " +
      "are caught here, not as bench noise") {
    // r15 verdict residual: the sf0.001 snapshot can't see a
    // broadcast<->sort-merge decision that flips only once the inputs
    // cross the 10MB threshold at sf0.1 — the sizes the committed bench
    // actually runs at. Same generator, same session shape, bench scale.
    val want = committedFile("PLANSNAP_SF01.json")
    spark.catalog.clearCache()
    val got: Map[String, String] =
      PlanSnap.benchTop30.sorted.map { n =>
        val f = PlanSnap.features(
          SparkEntry.queries(n)(spark, "/root/testdata/sf0.1"))
        spark.catalog.clearCache()
        n -> s""""$n": ${f.json}"""
      }.toMap
    val missing = (got.keySet -- want.keySet).toSeq.sorted
    val stale = (want.keySet -- got.keySet).toSeq.sorted
    val drifted = got.keySet.intersect(want.keySet).toSeq.sorted
      .filter(n => got(n) != want(n))
      .map(n => s"$n\n  committed: ${want(n)}\n  current:   ${got(n)}")
    assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
      s"""bench-scale plan drift vs PLANSNAP_SF01.json — intentional
         |changes need a regenerated artifact (scripts/plansnap.sh).
         |new queries not in artifact: ${missing.mkString(", ")}
         |artifact queries no longer declared: ${stale.mkString(", ")}
         |drifted plans:
         |${drifted.mkString("\n")}""".stripMargin)
  }

  test("the sf0.1 diff fires on a deliberate regression: threshold " +
      "drift flips dedup_simhash's stats-chosen band-join broadcast") {
    // the bench-scale twin of the sf0.001 teeth test below:
    // dedup_simhash's band self-join broadcasts from STATS (no hint in
    // the code) — with the threshold forced to -1 the sf0.1 feature
    // line must change, else the new artifact can't catch the exact
    // drift class it was added for.
    val want = committedFile("PLANSNAP_SF01.json")("dedup_simhash")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = PlanSnap.features(
        SparkEntry.queries("dedup_simhash")(spark, "/root/testdata/sf0.1"))
      val regressed = s""""dedup_simhash": ${f.json}"""
      assert(regressed != want,
        "threshold -1 left the sf0.1 feature line unchanged — the " +
          "bench-scale snapshot would not detect a broadcast-to-sort-" +
          "merge drift")
      assert(f.joins.getOrElse("BroadcastHashJoin", 0) === 0,
        "control broken: threshold -1 should remove the stats broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the diff fires on a deliberate regression: conf drift that " +
      "flips a stats-chosen broadcast join to sort-merge") {
    // sql_values_inline's 12-row VALUES side broadcasts from STATS (no
    // hint in the SQL) — exactly the silent drift class PLANSNAP exists
    // to catch. Forcing the threshold to -1 must change the feature
    // line; if it doesn't, the snapshot has no teeth and this test
    // stops the gate from rotting into a tautology.
    val want = committed("sql_values_inline")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.catalog.clearCache() // same phantom-drift guard as the sweep
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = PlanSnap.features(
        SparkEntry.queries("sql_values_inline")(spark, sf0001))
      val regressed = s""""sql_values_inline": ${f.json}"""
      assert(regressed != want,
        "threshold -1 left the feature line unchanged — the snapshot " +
          "would not detect a broadcast-to-sort-merge drift")
      assert(f.joins.getOrElse("BroadcastHashJoin", 0) === 0,
        "control broken: threshold -1 should remove the stats broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
