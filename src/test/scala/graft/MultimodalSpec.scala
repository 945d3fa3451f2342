package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing tests: schema round-trip, batch shape, deterministic
  * stub decode, metadata-only planning.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synth(spark, 300).cache()

  test("binary + metadata schema round-trips parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm_").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(back.count() === 300)
    // payload survives byte-for-byte
    val a = media.filter($"media_id" === 7).select("content")
      .as[Array[Byte]].collect().head
    val b = back.filter($"media_id" === 7).select("content")
      .as[Array[Byte]].collect().head
    assert(a.toSeq === b.toSeq)
  }

  test("feature extraction is deterministic and batch-shaped") {
    // tasks run in this JVM (local mode) and report through the static
    // probe — a captured local would mutate a deserialized closure copy.
    MultimodalSpec.BatchProbe.clear()
    val feats = Multimodal.extractFeatures(
      Multimodal.repartitionForDecode(media), batchSize = 50,
      decodeBatch = batch => {
        MultimodalSpec.BatchProbe.record(batch.size)
        batch.map(Multimodal.decodeStub)
      })
    val rows = feats.collect()
    assert(rows.length === 300)
    // the decoder saw BATCHES, not single rows (except partition tails)
    val sizes = MultimodalSpec.BatchProbe.snapshot()
    assert(sizes.nonEmpty && sizes.forall(_ <= 50))
    assert(sizes.exists(_ > 1))
    // determinism + embedding shape
    val f7a = rows.find(_.media_id == 7).get.feature.toSeq
    val f7b = Multimodal.extractFeatures(media).collect()
      .find(_.media_id == 7).get.feature.toSeq
    assert(f7a === f7b)
    assert(f7a.length === 16)
    assert(math.abs(f7a.sum - 1.0) < 1e-5) // L1-normalized histogram
  }

  test("frame sampling is metadata-only and exact") {
    // parquet-backed so the plan shows what is actually read from disk
    val dir = java.nio.file.Files.createTempDirectory("graft_mmfs_").toString
    media.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val sampled = Multimodal.sampleFrames(fromDisk, everyN = 12)
    // every video contributes ceil(n_frames/12) frames
    val expected = media.filter($"kind" === "video")
      .select(ceil($"meta.n_frames" / 12.0).cast("long"))
      .as[Long].collect().sum
    assert(sampled.count() === expected)
    // the binary column never leaves the parquet footer (column pruning)
    val scanLine = sampled.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanLine.contains("content"), s"binary column scanned: $scanLine")
  }

  test("decode stub handles empty payloads without dividing by zero") {
    val f = Multimodal.decodeStub(Array.emptyByteArray)
    assert(f.length === 16 && f.forall(_ === 0f))
  }

  test("zero-frame videos emit no sampled frames") {
    val row = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(99L, "video", Array[Byte](1),
          org.apache.spark.sql.Row(0, 0, 0, 0, 0L))),
      Multimodal.mediaSchema)
    assert(Multimodal.sampleFrames(row, 4).isEmpty)
  }

  test("resize planning preserves aspect and never upscales") {
    val plan = Multimodal.planResize(media, maxDim = 32)
    val bad = plan.filter($"dst_w" > 32 || $"dst_h" > 32 ||
      $"dst_w" > $"src_w" || $"dst_h" > $"src_h")
    assert(bad.isEmpty)
    // aspect ratio within rounding
    val off = plan.filter(abs($"dst_w" * $"src_h" - $"dst_h" * $"src_w") >
      $"src_w" + $"src_h")
    assert(off.isEmpty)
  }
}

object MultimodalSpec {
  /** Task-side batch-size probe, shared through the JVM (local mode). */
  object BatchProbe {
    private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    def clear(): Unit = sizes.clear()
    def record(n: Int): Unit = sizes.add(n)
    def snapshot(): Seq[Int] = {
      import scala.jdk.CollectionConverters._
      sizes.asScala.toSeq
    }
  }
}
