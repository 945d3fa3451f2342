package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec, Tables}

/** The incremental-dedup snapshot store contract (SURVEY §2.L L40): the
  * snapshot's MinHash signatures and exact-hash index are WRITTEN ONCE at
  * curation time and read back by `dedup_incremental` — the query must
  * never re-read snapshot text, or per-batch cost scales with the corpus
  * instead of the batch.
  */
class SnapshotStoreSpec extends SparkSpec {

  private def docScans(name: String) =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains("documents.parquet")) => f
      }

  test("dedup_incremental never reads snapshot text: every documents scan " +
      "touching `text` is the batch side (doc_id >= boundary pushed)") {
    val scans = docScans("dedup_incremental")
    assert(scans.nonEmpty, "expected at least the batch-side documents scan")
    val textScans = scans.filter(_.requiredSchema.fieldNames.contains("text"))
    assert(textScans.nonEmpty, "batch side must still read its own text")
    for (f <- textScans) {
      val pushed = f.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("GreaterThanOrEqual(doc_id,250)"),
        s"documents scan reading `text` without the batch filter — " +
          s"snapshot text leaked into the hot path: $pushed")
    }
  }

  test("dedup_incremental reads signatures + exact index from the store") {
    val storeScans = SparkEntry.queries("dedup_incremental")(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains("graft_snapshot_store_")) => f
      }
    val read = storeScans.flatMap(_.relation.location.rootPaths)
      .map(_.toString).toSet
    assert(read.exists(_.contains("sigs.parquet")),
      s"no signature-store scan in plan: $read")
    assert(read.exists(_.contains("exact.parquet")),
      s"no exact-index-store scan in plan: $read")
  }

  test("store is built once and is idempotent (_DONE marker)") {
    TextSim.ensureSnapshotStore(spark, sf0001)
    val dir = TextSim.snapshotStoreDir(sf0001)
    assert(new java.io.File(dir, "_DONE").exists())
    val before = spark.read.parquet(s"$dir/sigs.parquet").count()
    TextSim.ensureSnapshotStore(spark, sf0001) // must be a no-op
    assert(spark.read.parquet(s"$dir/sigs.parquet").count() === before)
    val snapshotDocs = Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 250)
    // one signature row per snapshot doc that has >= 1 shingle
    assert(before > 0 && before <= snapshotDocs.count())
  }

  test("store-readback result is identical to recompute-from-text") {
    // The store path must be a pure I/O swap: pair it against a from-
    // scratch recompute of the same cross-corpus banding and exact check.
    val d = sf0001
    val docs = Tables.documents(spark, d)
    val index = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val idx = index.select(h60(col("text")).as("ht")).distinct()
    val exact = batch
      .join(idx, h60(batch("text")) === idx("ht"), "left_semi")
      .select(col("doc_id"), lit(1L).as("exact_dup"))
    val near = TextSim.minhashPairsBetween(index, batch)
      .groupBy(col("ib").as("doc_id"))
      .agg(count(lit(1)).as("n_near"), max(col("est_sim")).as("best_sim"))
    val recomputed = near.join(exact, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(0L)).as("exact_dup"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        coalesce(col("best_sim"), lit(0.0)).as("best_sim"))
      .orderBy("doc_id").collect().toSeq
    val stored = SparkEntry.queries("dedup_incremental")(spark, d)
      .collect().toSeq
    assert(stored === recomputed)
  }
}
