package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** The persisted-changelog contract (SURVEY §2.L L127/L128/L132, r13):
  * the snapshot family reads a SEQ-PARTITIONED parquet store written once
  * (the table-format transaction-log shape), not an in-plan derivation —
  * and an as-of read's horizon predicate must resolve against partition
  * METADATA so later-commit files are never opened. This is the scaladoc
  * claim on `Relational.ensureChangelogStore`, pinned here.
  */
class ChangelogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def storeScans(name: String) =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains("graft_changelog_store_")) => f
      }

  test("snapshot_asof reads the store with the horizon as a PARTITION " +
      "filter — the seq=3 commit is pruned at metadata time (L127)") {
    val scans = storeScans("snapshot_asof")
    assert(scans.nonEmpty, "snapshot_asof must read the changelog store")
    for (f <- scans) {
      val pf = f.metadata.getOrElse("PartitionFilters", "")
      assert(pf.contains("seq"),
        s"horizon predicate not a partition filter: $pf")
    }
    // and the pruned read physically opens only seq<=2 directories
    val files = Relational.changelogStore(spark, sf0001)
      .filter(col("seq") <= 2)
      .select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(f =>
        f.contains("seq=1") || f.contains("seq=2")),
      s"read outside the horizon: ${files.filterNot(f =>
        f.contains("seq=1") || f.contains("seq=2")).take(3).mkString(",")}")
  }

  test("snapshot_history and snapshot_vacuum read the persisted store, " +
      "covering every commit partition (L128/L132)") {
    for (q <- Seq("snapshot_history", "snapshot_vacuum"))
      assert(storeScans(q).nonEmpty, s"$q must read the changelog store")
    val files = Relational.changelogStore(spark, sf0001)
      .select(input_file_name()).distinct().as[String].collect()
    for (seq <- 1 to 3)
      assert(files.exists(_.contains(s"seq=$seq")),
        s"store is missing the seq=$seq commit partition")
  }

  test("store contents match the in-plan changelog derivation exactly " +
      "(write-then-read loses nothing)") {
    val fromStore = Relational.changelogStore(spark, sf0001)
      .orderBy("o_orderkey", "seq")
      .collect().map(_.toSeq).toSeq
    val inPlan = Relational.cdcLog(spark, sf0001)
      .select(col("o_orderkey"), col("seq"), col("op"), col("price"))
      .orderBy("o_orderkey", "seq")
      .collect().map(_.toSeq).toSeq
    assert(fromStore === inPlan)
  }

  test("ensureChangelogStore is idempotent: a second call rewrites nothing") {
    val dir = Relational.ensureChangelogStore(spark, sf0001)
    def sig = new java.io.File(s"$dir/log.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    val before = sig
    Relational.ensureChangelogStore(spark, sf0001) // must be a no-op
    assert(sig === before)
  }
}
