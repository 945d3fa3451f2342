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

  test("real audio decode: synthesized WAV tone has the expected RMS profile") {
    // 1600 mono samples at 8 kHz: first half silence, second half a ±0.5
    // full-scale square wave — segments 0-7 must read 0, segments 8-15
    // must read 0.5 (RMS of a square wave equals its amplitude).
    val sr = 8000f
    val samples = Array.tabulate[Short](1600)(i =>
      if (i < 800) 0 else if (i % 2 == 0) 16384 else -16384)
    def encode(t: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
      import javax.sound.sampled._
      val bigEndian = t != AudioFileFormat.Type.WAVE // AIFF/AU are BE
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sr, 16, 1,
        2, sr, bigEndian)
      val data = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        val (lo, hi) = ((samples(i) & 0xFF).toByte, (samples(i) >> 8).toByte)
        if (bigEndian) { data(2 * i) = hi; data(2 * i + 1) = lo }
        else { data(2 * i) = lo; data(2 * i + 1) = hi }
      }
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length), t, out)
      out.toByteArray
    }
    val wav = encode(javax.sound.sampled.AudioFileFormat.Type.WAVE)
    // header probe reads the declared geometry, not the samples
    assert(Multimodal.audioMeta(wav) === ((8000, 1600L, 200L)))
    // through the full Spark plumbing with the AUTO dispatcher: the RIFF
    // magic must land on the real audio codec, not the stub
    val feats = Multimodal.extractFeatures(
        Seq((1L, "audio", wav)).toDF("media_id", "kind", "content"),
        decodeBatch = Multimodal.decodeAutoBatch)
      .collect().head.feature
    (0 until 8).foreach(b => assert(math.abs(feats(b)) < 1e-4, s"seg $b"))
    (8 until 16).foreach(b =>
      assert(math.abs(feats(b) - 0.5f) < 1e-3, s"seg $b = ${feats(b)}"))
    // AIFF (FORM/AIFF) and AU (.snd) route to the same real codec: byte
    // containers differ, decoded profiles must agree with the WAV's
    for (t <- Seq(javax.sound.sampled.AudioFileFormat.Type.AIFF,
        javax.sound.sampled.AudioFileFormat.Type.AU)) {
      val alt = Multimodal.decodeAuto(encode(t))
      feats.indices.foreach(i =>
        assert(math.abs(alt(i) - feats(i)) < 1e-4, s"$t seg $i"))
    }
  }

  test("real video decode: 2-frame GIF composites deltas onto the canvas") {
    def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    def gif(frames: java.awt.image.BufferedImage*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        w.setOutput(ios)
        w.prepareWriteSequence(null)
        frames.foreach(f =>
          w.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
        w.endWriteSequence()
      } finally { w.dispose(); ios.close() }
      out.toByteArray
    }
    // full-frame animation: black 8x8 then white 8x8
    val full = gif(frame(8, 8, 0x000000), frame(8, 8, 0xFFFFFF))
    assert(Multimodal.gifFrameCount(full) === 2)
    val hists = Multimodal.decodeGifFrames(full)
    assert(hists.length === 2)
    assert(hists(0)(0) === 1.0f, "frame 1 is all black")
    assert(hists(1)(15) === 1.0f, "frame 2 is all white")
    // the AUTO dispatcher averages the per-frame histograms
    val avg = Multimodal.decodeAuto(full)
    assert(math.abs(avg(0) - 0.5f) < 1e-6 && math.abs(avg(15) - 0.5f) < 1e-6)
    // DELTA frame: white 8x8 then a 4x8 black rect — frame 2's VISIBLE
    // canvas is half black, half still-white; a raw-raster histogram
    // (the pre-compositing bug) would read all black.
    val delta = gif(frame(8, 8, 0xFFFFFF), frame(4, 8, 0x000000))
    val dh = Multimodal.decodeGifFrames(delta)
    assert(math.abs(dh(1)(0) - 0.5f) < 1e-6,
      s"composited frame 2 must be half black: ${dh(1).toSeq}")
    assert(math.abs(dh(1)(15) - 0.5f) < 1e-6,
      s"composited frame 2 must keep frame 1's white right half: ${dh(1).toSeq}")
  }

  test("real video decode #2: MJPEG-in-AVI frames through the RIFF walk") {
    def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    // hand-assemble a minimal AVI: RIFF('AVI ', LIST('hdrl', avih),
    // LIST('movi', 00dc×3)) — chunk sizes little-endian, even-padded
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(
        8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(cc.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(kind: String, subs: Array[Byte]*): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ subs.flatten)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40000)      // us/frame (25 fps)
      .putInt(0).putInt(0).putInt(0)
      .putInt(3)          // dwTotalFrames
      .putInt(0).putInt(1).putInt(0)
      .putInt(8).putInt(8) // width, height
      .array()
    val frames = Seq(frame(8, 8, 0x000000), frame(8, 8, 0xFFFFFF),
      frame(8, 8, 0x000000)).map(jpeg)
    val avi = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih)) ++
      list("movi", frames.map(chunk("00dc", _)): _*))
    // header probe: the avih fields surface without any pixel decode
    assert(Multimodal.aviMeta(avi) === ((8, 8, 3L, 40000L)))
    // all three frames decode; JPEG is lossy so assert dominant bins
    val hists = Multimodal.decodeAviMjpegFrames(avi)
    assert(hists.length === 3)
    assert(hists(0)(0) > 0.9f, s"frame 1 ~black: ${hists(0).toSeq}")
    assert(hists(1)(15) > 0.9f, s"frame 2 ~white: ${hists(1).toSeq}")
    assert(hists(2)(0) > 0.9f, s"frame 3 ~black: ${hists(2).toSeq}")
    // stride sampling mirrors sampleFrames
    assert(Multimodal.decodeAviMjpegFrames(avi, everyN = 2).length === 2)
    // the AUTO dispatcher routes RIFF/AVI to the real decoder (NOT the
    // WAV branch, NOT the stub) and averages per-frame histograms
    val avg = Multimodal.decodeAuto(avi)
    assert(avg(0) > 0.6f && avg(15) > 0.3f && avg(0) < 0.7f,
      s"expected ~2/3 black + ~1/3 white average: ${avg.toSeq}")
    // a payload that is RIFF but not AVI still goes elsewhere
    intercept[IllegalArgumentException] {
      Multimodal.decodeAviMjpegFrames("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    ()
  }

  test("videoMeta reads mp4 and webm durations from headers alone") {
    // minimal ISO BMFF: ftyp + moov(mvhd v0, timescale 600, duration 1200)
    val mp4 = java.nio.ByteBuffer.allocate(16 + 36)
    mp4.putInt(16).put("ftypisom".getBytes("US-ASCII")).putInt(0)
    mp4.putInt(36).put("moov".getBytes("US-ASCII"))
    mp4.putInt(28).put("mvhd".getBytes("US-ASCII"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(600).putInt(1200) // timescale, duration -> 2000 ms
    assert(Multimodal.videoMeta(mp4.array()) === (("mp4", 2000L)))
    // minimal EBML: header + Segment(Info(TimestampScale 1e6, Duration
    // 5000.0f ticks)) -> 5000 ms
    val webm = java.nio.ByteBuffer.allocate(5 + 5 + 5 + 7 + 7)
    webm.put(Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte, 0x80.toByte))
    webm.put(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67)) // Segment
      .put((0x80 | 19).toByte) // payload: 19 bytes
    webm.put(Array[Byte](0x15, 0x49, 0xA9.toByte, 0x66)) // Info
      .put((0x80 | 14).toByte)
    webm.put(Array[Byte](0x2A, 0xD7.toByte, 0xB1.toByte)) // TimestampScale
      .put((0x80 | 3).toByte).put(Array[Byte](0x0F, 0x42, 0x40))
    webm.put(Array[Byte](0x44, 0x89.toByte)) // Duration (float32 5000.0)
      .put((0x80 | 4).toByte).putFloat(5000.0f)
    assert(Multimodal.videoMeta(webm.array()) === (("webm", 5000L)))
    // neither container -> loud failure, not fake metadata
    intercept[IllegalArgumentException] {
      Multimodal.videoMeta(Array[Byte](1, 2, 3, 4, 5))
    }
    ()
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

  test("declared media queries (L129-L131) agree with direct plumbing " +
    "calls and the decode aggregate matches a driver-side stub replay") {
    // media_decode_agg: f0_mass per kind must equal the stub decode run
    // directly over the synth payloads (the query adds repartition +
    // batching, which must not change the fold under the decimal contract)
    val agg = ops.Media.queries("media_decode_agg")(spark, "")
      .collect().map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_media"), r.getAs[Long]("total_bytes"),
          r.getAs[Double]("f0_mass"))).toMap
    assert(agg.keySet === Set("image", "audio", "video"))
    val direct = Multimodal.synth(spark, 4096)
      .select($"media_id", $"kind", $"content").collect()
      .map(r => (r.getAs[String]("kind"),
        r.getAs[Array[Byte]]("content")))
      .groupBy(_._1).map { case (k, rows) =>
        val f0s = rows.map(r => BigDecimal(
          Multimodal.decodeStub(r._2)(0).toDouble).setScale(8,
          BigDecimal.RoundingMode.HALF_UP))
        k -> (rows.length.toLong,
          rows.map(_._2.length.toLong).sum,
          f0s.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    direct.foreach { case (k, (n, bytes, f0)) =>
      assert(agg(k) === ((n, bytes, f0)), s"kind $k")
    }
    // media_frame_plan: every sampled count is ceil(n_frames/4), frames
    // only from videos
    val fp = ops.Media.queries("media_frame_plan")(spark, "").collect()
    fp.foreach { r =>
      val nf = r.getAs[Int]("n_frames")
      assert(r.getAs[Long]("n_sampled") === (nf + 3) / 4)
      assert(r.getAs[Int]("last_frame") % 4 === 0)
    }
    // media_resize_plan: never upscales, fits in 24
    val rp = ops.Media.queries("media_resize_plan")(spark, "")
    assert(rp.filter($"dst_w" > 24 || $"dst_h" > 24 ||
      $"dst_w" > $"src_w" || $"dst_h" > $"src_h").isEmpty)
    assert(rp.count() > 0)
  }

  test("real pixel resize executes the plan: dims, content, PNG payload") {
    def png(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // 64x32 solid red, planned into maxDim=16 → 16x8
    val red = png(64, 32, (_, _) => 0xFF0000)
    val small = Multimodal.resizeImage(red, 16, 8)
    assert(Multimodal.imageMeta(small) === ((16, 8)))
    // bilinear over a solid color stays solid: luma hist all in bin 4
    val feats = Multimodal.decodeImage(small)
    assert(feats(4) === 1.0f, s"solid color bled: ${feats.toSeq}")
    // batch form matches element-wise application
    val batch = Multimodal.resizeImageBatch(
      Seq((red, 16, 8), (red, 32, 16)))
    assert(batch.map(Multimodal.imageMeta) === Seq((16, 8), (32, 16)))
    // transparency survives the hop: an RGB canvas would SrcOver-composite
    // transparent pixels onto black, recoloring them instead of scaling
    val argb = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 8; x <- 0 until 8)
      argb.setRGB(x, y, if (x < 4) 0xFFFF0000 else 0x00000000)
    val out2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(argb, "png", out2)
    val rsz = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(out2.toByteArray, 4, 4)))
    assert((rsz.getRGB(0, 0) >>> 24) === 0xFF, "opaque half lost alpha")
    assert((rsz.getRGB(3, 0) >>> 24) === 0x00, "transparent half opaqued")
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
