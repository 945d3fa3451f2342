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

  test("real image decode: javax.imageio PNG through extractFeatures") {
    // Known-content PNGs: half black / half white, and solid red.
    def png(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val bw = png(8, 8, (x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val red = png(5, 3, (_, _) => 0xFF0000)

    assert(Multimodal.imageMeta(bw) === ((8, 8)))
    assert(Multimodal.imageMeta(red) === ((5, 3)))

    val df = Seq((1L, "image", bw), (2L, "image", red))
      .toDF("media_id", "kind", "content")
    val feats = Multimodal.extractFeatures(df,
        decodeBatch = Multimodal.decodeImageBatch)
      .collect().map(f => f.media_id -> f.feature).toMap

    // black (luma 0 → bin 0) and white (luma 255 → bin 15), half each
    assert(math.abs(feats(1L)(0) - 0.5f) < 1e-6)
    assert(math.abs(feats(1L)(15) - 0.5f) < 1e-6)
    assert(math.abs(feats(1L).sum - 1.0f) < 1e-5)
    // solid red: BT.601 luma = 299*255/1000 = 76 → bin 4, all pixels
    assert(feats(2L)(4) === 1.0f)
    assert(feats(2L).count(_ != 0f) === 1)
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
