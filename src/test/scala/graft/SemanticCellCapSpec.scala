package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry, Tables}

/** The dedup_semantic runaway-cell boundary (SURVEY §2.L L41): cells above
  * `SemCellCap` must be sub-blocked by sign-LSH instead of exact all-pairs
  * — the cap is what bounds the worst cell's pair stage at cap² when the
  * centroid assignment skews at 100 TB. The declared query's oracle row
  * can't see this path (the cap sits above every testdata cell by design),
  * so this spec drives it on a synthetic hot cell.
  */
class SemanticCellCapSpec extends SparkSpec {
  import spark.implicits._

  // 64-d one-hot-ish fixture (the LSH planes are 64-d): identical pairs
  // have cosine 1 ≥ τ and ALWAYS share every sign bucket (guaranteed
  // recall — the assertion never rides on LSH luck); distinct one-hots
  // have cosine 0 < τ and are never flagged by either path because every
  // candidate is verified with the exact cosine.
  private def oneHot(i: Int): Seq[Float] =
    Seq.tabulate(64)(j => if (j == i) 1.0f else 0.0f)

  private def fixture = Seq(
    // hot cell 10: six vectors — two identical pairs + two singletons
    (1L, 10, oneHot(0)), (2L, 10, oneHot(0)),
    (3L, 10, oneHot(1)), (4L, 10, oneHot(1)),
    (5L, 10, oneHot(2)), (6L, 10, oneHot(3)),
    // small cell 20: one identical pair + one singleton
    (7L, 20, oneHot(4)), (8L, 20, oneHot(4)), (9L, 20, oneHot(5)))
    .toDF("vec_id", "cid", "embedding")
    .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))

  private def dupIds(cap: Int): Set[Long] =
    Embeddings.semanticDupIds(fixture, cap, Embeddings.TauSem)
      .collect().map(_.getLong(0)).toSet

  test("runaway cell (population > cap) is sub-blocked and still finds " +
      "its duplicates") {
    val hotSize = fixture.filter(col("cid") === 10).count()
    assert(hotSize > 4, "fixture precondition: cell 10 must exceed the cap")
    // cap=4: cell 10 (6 members) takes the sign-LSH path, cell 20 (3)
    // stays exact — the duplicate of each identical pair (larger id) is
    // flagged either way.
    assert(dupIds(cap = 4) === Set(2L, 4L, 8L))
  }

  test("sub-blocked path agrees with the exact path on the same fixture") {
    assert(dupIds(cap = 4) === dupIds(cap = 1000))
  }

  test("declared cap sits above every real testdata cell (oracle row " +
      "byte-identical)") {
    val maxCell = SparkEntry.queries("dedup_semantic")(spark, sf0001)
      .groupBy("centroid_id").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxCell < Embeddings.SemCellCap,
      s"testdata cell of $maxCell reached the cap — the declared oracle " +
        "row would flow through the LSH path")
  }
}
