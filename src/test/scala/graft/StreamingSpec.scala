package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps

/** Structured Streaming semantics that batch can't express (SURVEY.md §2.I
  * T1/T5/T6), driven with MemoryStream / file-stream golden runs.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2025-01-15 $h%02d:$m%02d:00")

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

  test("T5: watermark drops events later than the 1h threshold") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.watermarkedDaily(ms.toDF())
      .writeStream.format("memory").queryName("t5_out")
      .outputMode("update").start()
    try {
      // batch 1: events at 10:00 and 12:00 -> watermark advances to 11:00
      ms.addData(Ev(1, ts(10), 1, 1.0), Ev(2, ts(12), 1, 1.0))
      q.processAllAvailable()
      // batch 2: a 10:30 event is BEHIND the 11:00 watermark but its 1-day
      // window [2025-01-15, 2025-01-16) is still open (window.end 00:00 on
      // the 16th > watermark), so it must still count; a 2025-01-13 event's
      // window closed long ago and must be dropped.
      ms.addData(Ev(3, ts(10, 30), 1, 1.0),
        Ev(4, Timestamp.valueOf("2025-01-13 09:00:00"), 1, 1.0))
      q.processAllAvailable()
      val counts = spark.table("t5_out")
        .groupBy("win_start").max("n")
        .as[(Timestamp, Long)].collect().toMap
      assert(counts(Timestamp.valueOf("2025-01-15 00:00:00")) === 3L)
      assert(!counts.contains(Timestamp.valueOf("2025-01-13 00:00:00")),
        "late event beyond watermark must not open a closed window")
    } finally q.stop()
  }

  test("T6: dropDuplicatesWithinWatermark dedups across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName("t6_out")
      .outputMode("append").start()
    try {
      ms.addData(Ev(1, ts(10), 1, 1.0), Ev(1, ts(10, 5), 1, 1.0))
      q.processAllAvailable()
      ms.addData(Ev(1, ts(10, 10), 1, 1.0), Ev(2, ts(10, 15), 1, 1.0))
      q.processAllAvailable()
      val ids = spark.table("t6_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L),
        "duplicate event_id within the watermark must be emitted once")
    } finally q.stop()
  }

  test("T1: Trigger.AvailableNow file ingest matches the batch count") {
    val out = java.nio.file.Files.createTempDirectory("graft_t1_").toString
    // FileStreamSource wants a directory — stage the single-file table.
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$out/in"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$out/in/events.parquet"))
    val batch = Tables.events(spark, sf0001)
    val stream = Tables.eventsStream(spark, sf0001, s"$out/in")
    val q = StreamOps.tumblingDaily(stream)
      .writeStream.format("memory").queryName("t1_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("t1_out").agg(org.apache.spark.sql.functions
        .sum("n")).as[Long].collect().head
      assert(streamed === batch.count())
    } finally q.stop()
  }

  test("T1 end-to-end: file stream through idempotentDailySink is idempotent on disk") {
    // The full T1 story in one piece: a real temp-dir parquet FileStreamSource
    // drained by Trigger.AvailableNow INTO foreachBatch(idempotentDailySink),
    // then the whole stream REPLAYED from a fresh checkpoint — simulating a
    // lost-checkpoint reprocess, the worst duplication hazard. Dynamic
    // partition overwrite must rewrite the same daily partitions, leaving
    // the store byte-identical in row count, not doubled.
    val out = java.nio.file.Files.createTempDirectory("graft_t1e2e_").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$out/in"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$out/in/events.parquet"))
    val nBatch = Tables.events(spark, sf0001).count()
    def runOnce(ckpt: String): Unit = {
      val q = Tables.eventsStream(spark, sf0001, s"$out/in")
        .select("event_id", "ts", "user_id", "value")
        .writeStream
        .foreachBatch(StreamOps.idempotentDailySink(s"$out/store") _)
        .option("checkpointLocation", s"$out/$ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    runOnce("ckpt1")
    val n1 = spark.read.parquet(s"$out/store").count()
    runOnce("ckpt2") // fresh checkpoint => full reprocess of every file
    val n2 = spark.read.parquet(s"$out/store").count()
    assert(n1 === nBatch, "first drain must land the whole table")
    assert(n2 === n1, "replay must overwrite daily partitions, not append")
  }

  test("exactlyOnceSink end-to-end: a real stream drained twice (fresh " +
      "checkpoint replay) lands exactly one copy via the epoch ledger") {
    // the lost-checkpoint reprocess again, but against the epoch-ledger
    // sink: the second drain re-delivers batchId 0, the ledger marks it
    // committed, and the delivery is dropped AT THE SINK — stronger than
    // idempotentDailySink's overwrite (no rewrite I/O at all on replay)
    val out = java.nio.file.Files.createTempDirectory("graft_eoe2e_").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$out/in"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$out/in/events.parquet"))
    val nBatch = Tables.events(spark, sf0001).count()
    def runOnce(ckpt: String): Unit = {
      val q = Tables.eventsStream(spark, sf0001, s"$out/in")
        .select("event_id", "ts", "user_id", "value")
        .writeStream
        // compactEvery=1: the ledger compacts after EVERY micro-batch,
        // so this end-to-end path (a real writeStream, not manual sink
        // calls) exercises the manifest read/replay-check under the
        // engine's own delivery — the default 64 would never compact in
        // a one-batch test
        .foreachBatch(StreamOps.exactlyOnceSink(s"$out/store",
          compactEvery = 1) _)
        .option("checkpointLocation", s"$out/$ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    runOnce("ckpt1")
    val store = s"$out/store"
    assert(StreamOps.committedEpochs(spark, store).count() === nBatch)
    assert(new java.io.File(s"$store/_epochs").listFiles()
      .exists(_.getName.startsWith("manifest-")),
      "compactEvery=1 should have rolled the marker into a manifest")
    val dataMtimes = new java.io.File(s"$store/data").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    runOnce("ckpt2") // fresh checkpoint => batch 0 re-delivered
    assert(StreamOps.committedEpochs(spark, store).count() === nBatch,
      "replayed epoch duplicated rows")
    val after = new java.io.File(s"$store/data").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after === dataMtimes, "replayed epoch rewrote data files — the " +
      "ledger should have dropped the delivery before any I/O")
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.sessionizeStateful(ms.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("fmgs_out")
      .outputMode("append").start()
    try {
      // batch 1: one session forming (10:00, 10:10) — nothing closes yet
      ms.addData(Ev(1, ts(10), 7, 1.0), Ev(2, ts(10, 10), 7, 1.0))
      q.processAllAvailable()
      assert(spark.table("fmgs_out").isEmpty)
      // batch 2: 12:00 is >= 30min after 10:10 — the first session closes,
      // state carried the open session across the batch boundary
      ms.addData(Ev(3, ts(12), 7, 1.0))
      q.processAllAvailable()
      val out = spark.table("fmgs_out")
        .as[StreamOps.SessionOut].collect().toSeq
      assert(out === Seq(StreamOps.SessionOut(7,
        ts(10).getTime * 1000, ts(10, 10).getTime * 1000, 2)))
    } finally q.stop()
  }

  test("sessionizer with event-time timeout flushes idle users") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.sessionizeStatefulTimeout(
        ms.toDF().withWatermark("ts", "0 seconds"), gapMinutes = 30)
      .writeStream.format("memory").queryName("fmgs_timeout")
      .outputMode("append").start()
    try {
      // user 7's session [10:00, 10:10] forms, then the user goes SILENT —
      // the NoTimeout variant would hold this state forever
      ms.addData(Ev(1, ts(10), 7, 1.0), Ev(2, ts(10, 10), 7, 1.0))
      q.processAllAvailable()
      assert(spark.table("fmgs_timeout").isEmpty)
      // other users' traffic advances the watermark: batch 2 runs with
      // watermark 10:10 (no flush — 10:40 not passed), batch 3 with 12:00
      ms.addData(Ev(3, ts(12), 8, 1.0))
      q.processAllAvailable()
      ms.addData(Ev(4, ts(12, 5), 8, 1.0))
      q.processAllAvailable()
      val out = spark.table("fmgs_timeout")
        .as[StreamOps.SessionOut].collect().toSeq
      assert(out === Seq(StreamOps.SessionOut(7,
        ts(10).getTime * 1000, ts(10, 10).getTime * 1000, 2)),
        s"idle session not flushed by watermark passage: $out")
    } finally q.stop()
  }

  test("sessionizer timeout: rows behind the watermark are dropped, no ghost state") {
    // pins the input-filtering contract the timeout variant depends on:
    // FlatMapGroupsWithStateExec drops rows older than the watermark
    // BEFORE they reach the state function, so a late burst can neither
    // emit a session nor park never-firing state (the in-function
    // expired-interval guard stays as defense in depth).
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.sessionizeStatefulTimeout(
        ms.toDF().withWatermark("ts", "0 seconds"), gapMinutes = 30)
      .writeStream.format("memory").queryName("fmgs_expired")
      .outputMode("append").start()
    try {
      // watermark advances to 12:00 on other traffic first
      ms.addData(Ev(1, ts(12), 8, 1.0))
      q.processAllAvailable()
      // user 7's burst is entirely behind the 12:00 watermark → filtered
      ms.addData(Ev(2, ts(10), 7, 1.0), Ev(3, ts(10, 5), 7, 1.0))
      q.processAllAvailable()
      // further watermark advance: if ghost state HAD been parked for
      // user 7, a timeout would now fire and emit a bogus session
      ms.addData(Ev(4, ts(14), 8, 1.0))
      q.processAllAvailable()
      val out = spark.table("fmgs_expired")
        .as[StreamOps.SessionOut].collect().toSeq.filter(_.user_id == 7L)
      assert(out.isEmpty,
        s"late rows behind the watermark must be dropped, got: $out")
    } finally q.stop()
  }

  test("sessionizer: a late in-session event never moves bounds backwards") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.sessionizeStateful(ms.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("fmgs_late")
      .outputMode("append").start()
    try {
      // open session [10:00, 10:20]
      ms.addData(Ev(1, ts(10), 9, 1.0), Ev(2, ts(10, 20), 9, 1.0))
      q.processAllAvailable()
      // LATE event 10:05 inside the session — must extend, not rewind last
      ms.addData(Ev(3, ts(10, 5), 9, 1.0))
      q.processAllAvailable()
      // 10:45 is 25min after the TRUE last (10:20) — same session, so
      // nothing closes; a rewound lastMs=10:05 would wrongly split here
      ms.addData(Ev(4, ts(10, 45), 9, 1.0))
      q.processAllAvailable()
      assert(spark.table("fmgs_late").isEmpty,
        "late event rewound the session and caused a bogus split")
      // event past the gap closes one session covering all four events
      ms.addData(Ev(5, ts(13), 9, 1.0))
      q.processAllAvailable()
      val out = spark.table("fmgs_late")
        .as[StreamOps.SessionOut].collect().toSeq
      assert(out === Seq(StreamOps.SessionOut(9,
        ts(10).getTime * 1000, ts(10, 45).getTime * 1000, 4)))
    } finally q.stop()
  }

  test("sessionizer: a burst of late events coalesces into one session") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.sessionizeStateful(ms.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("fmgs_burst")
      .outputMode("append").start()
    try {
      ms.addData(Ev(1, ts(10), 11, 1.0), Ev(2, ts(10, 20), 11, 1.0))
      q.processAllAvailable()
      // three related LATE events, hours before the open session — must
      // close as ONE 3-event session, not three singletons
      ms.addData(Ev(3, ts(8), 11, 1.0), Ev(4, ts(8, 5), 11, 1.0),
        Ev(5, ts(8, 10), 11, 1.0))
      q.processAllAvailable()
      val out = spark.table("fmgs_burst")
        .as[StreamOps.SessionOut].collect().toSeq
      assert(out === Seq(StreamOps.SessionOut(11,
        ts(8).getTime * 1000, ts(8, 10).getTime * 1000, 3)))
    } finally q.stop()
  }

  test("salted join equals the plain join (skew mitigation)") {
    val fact = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, Seq("o_custkey"))
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    val salted = graft.ops.Skew.saltedJoin(fact, dim, "o_custkey", salt = 8)
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("stream-stream join matches clicks to errors within the window") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val errors = MemoryStream[Ev]
    val q = StreamOps.clickErrorJoin(
        clicks.toDF().withColumn("event_type", lit("click")),
        errors.toDF().withColumn("event_type", lit("error")))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, ts(10), 5, 1.0),   // 5 min before error: match
        Ev(2, ts(9, 30), 5, 1.0),             // 35 min before: no match
        Ev(3, ts(10, 5), 6, 1.0))             // other user: no match
      errors.addData(Ev(9, ts(10, 5), 5, 1.0))
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("err_id", "user_id").as[(Long, Long)].collect().toSeq
      assert(got === Seq((9L, 5L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched errors with NULL " +
      "click once the watermark closes their window") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val errors = MemoryStream[Ev]
    val q = StreamOps.errorClickJoinOuter(
        clicks.toDF().withColumn("event_type", lit("click")),
        errors.toDF().withColumn("event_type", lit("error")))
      .writeStream.format("memory").queryName("ssoj_out")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, ts(10), 5, 1.0))    // 5 min before err: match
      errors.addData(
        Ev(9, ts(10, 5), 5, 1.0),              // matched error
        Ev(8, ts(10, 5), 7, 1.0))              // user 7 never clicked
      q.processAllAvailable()
      // advance BOTH watermarks past 10:05 + 10min delay so the join
      // state for the unmatched error is provably closed, then trigger
      // the state-cleanup batch that emits the NULL row
      clicks.addData(Ev(2, ts(11), 5, 1.0))
      errors.addData(Ev(7, ts(11), 6, 1.0))
      q.processAllAvailable()
      clicks.addData(Ev(3, ts(11, 30), 5, 1.0))
      errors.addData(Ev(6, ts(11, 30), 6, 1.0))
      q.processAllAvailable()
      val got = spark.table("ssoj_out")
        .filter(col("err_id").isin(9L, 8L))
        .select(col("err_id"), col("user_id"),
          col("click_ts").isNull.as("noclick"))
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got.contains((9L, 5L, false)),
        s"matched error must carry its click: $got")
      assert(got.contains((8L, 7L, true)),
        s"unmatched error must emit with NULL click after watermark: $got")
    } finally q.stop()
  }

  test("stream-static join enriches micro-batches from a bounded dim") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[Ev]
    val q = StreamOps.enrichWithDim(ms.toDF(), dim)
      .writeStream.format("memory").queryName("ss_out")
      .outputMode("append").start()
    try {
      ms.addData(Ev(1, ts(10), 1, 1.0), Ev(2, ts(10), 2, 1.0))
      q.processAllAvailable()
      ms.addData(Ev(3, ts(11), 3, 1.0)) // unknown user must survive as null
      q.processAllAvailable()
      val got = spark.table("ss_out")
        .select("event_id", "tier").as[(Long, Option[String])]
        .collect().toMap
      assert(got === Map(1L -> Some("gold"), 2L -> Some("silver"),
        3L -> None))
    } finally q.stop()
  }

  test("foreachBatch daily sink is idempotent under batch replay") {
    val out = java.nio.file.Files.createTempDirectory("graft_fb_").toString
    val batch = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "value")
    val sink = StreamOps.idempotentDailySink(s"$out/store") _
    sink(batch, 0L)
    val n1 = spark.read.parquet(s"$out/store").count()
    sink(batch, 0L) // replay the same batch — must overwrite, not append
    val n2 = spark.read.parquet(s"$out/store").count()
    assert(n1 === batch.count() && n2 === n1)
  }

  test("exactlyOnceSink: epoch-ledger dedup survives replay, heals torn " +
      "writes, and hides uncommitted epochs from readers (T5 write side)") {
    val out = java.nio.file.Files.createTempDirectory("graft_eo_").toString
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "value")
    val b0 = ev.filter(col("event_id") % 2 === 0)
    val b1 = ev.filter(col("event_id") % 2 === 1)
    val sink = StreamOps.exactlyOnceSink(out) _
    sink(b0, 0L)
    sink(b1, 1L)
    val full = StreamOps.committedEpochs(spark, out)
    assert(full.count() === ev.count())
    // at-least-once replay of BOTH epochs: ledger makes them no-ops
    sink(b0, 0L); sink(b1, 1L)
    assert(StreamOps.committedEpochs(spark, out).count() === ev.count())
    // torn write: epoch 2's data lands but the crash precedes the marker —
    // readers must not see it, and the retry must heal (single copy)
    b0.withColumn("epoch", lit(2L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(s"$out/data")
    assert(StreamOps.committedEpochs(spark, out).count() === ev.count(),
      "uncommitted epoch leaked into reads")
    sink(b0, 2L) // the replayed delivery commits epoch 2 exactly once
    assert(StreamOps.committedEpochs(spark, out).count() ===
      ev.count() + b0.count())
    assert(StreamOps.committedEpochs(spark, out)
      .filter(col("epoch") === 2).count() === b0.count())
  }

  test("exactlyOnceSink ledger compaction: marker files roll into one " +
      "manifest, reads stay correct across the boundary, replay of a " +
      "compacted epoch is still a no-op") {
    val out = java.nio.file.Files.createTempDirectory("graft_eoc_").toString
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "value")
    val batches = (0L to 4L).map(i => i -> ev.filter(col("event_id") % 5 === i))
    val sink = StreamOps.exactlyOnceSink(out, compactEvery = 2) _
    // epochs 0..4 with compactEvery=2: the tail never accumulates more
    // than compactEvery marker files, and a manifest appears
    batches.foreach { case (i, b) =>
      sink(b, i)
      assert(StreamOps.committedEpochs(spark, out).count() ===
        batches.take(i.toInt + 1).map(_._2.count()).sum,
        s"read after epoch $i wrong — compaction boundary broke reads")
    }
    val ledger = new java.io.File(s"$out/_epochs")
    def markers = ledger.listFiles().filter(_.getName.matches("[0-9]+"))
    def manifests = ledger.listFiles().filter(_.getName.startsWith("manifest-"))
    assert(markers.length < 5, "no compaction happened — 5 epochs left " +
      "5 marker files")
    assert(manifests.length === 1, "exactly one manifest must survive")
    // the manifest + tail together cover all 5 epochs exactly once
    assert(StreamOps.committedEpochs(spark, out)
      .select("epoch").distinct().count() === 5)
    // replay of a COMPACTED epoch (0 is in the manifest, its marker file
    // is gone): the sink must still recognize it as committed — no
    // rewrite I/O, no duplicate rows
    val dataMtimes = new java.io.File(s"$out/data").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    sink(batches.head._2, 0L)
    val after = new java.io.File(s"$out/data").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after === dataMtimes,
      "replay of a manifest-committed epoch rewrote data files")
    assert(StreamOps.committedEpochs(spark, out).count() === ev.count())
    // crash window (2): an epoch present in BOTH manifest and a stale
    // marker file must not double-count (semi-join dedups the ledger)
    java.nio.file.Files.write(new java.io.File(ledger, "0").toPath,
      "0".getBytes("UTF-8"))
    assert(StreamOps.committedEpochs(spark, out).count() === ev.count(),
      "epoch in manifest AND marker double-counted")
  }

  test("vacuumEpochs: drops ledger entries and data partitions together " +
      "(ledger first), keeps the rest readable, and is idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft_eov_").toString
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "value")
    val batches = (0L to 3L).map(i => i -> ev.filter(col("event_id") % 4 === i))
    val sink = StreamOps.exactlyOnceSink(out, compactEvery = 2) _
    batches.foreach { case (i, b) => sink(b, i) }
    val keptRows = batches.drop(2).map(_._2.count()).sum
    StreamOps.vacuumEpochs(out, keepFrom = 2L)
    // reads: only epochs 2..3 survive, row-exact
    val read = StreamOps.committedEpochs(spark, out)
    assert(read.count() === keptRows)
    // partition-column type is directory-inferred (int here) — compare
    // through an explicit cast
    assert(read.select(col("epoch").cast("long")).distinct()
      .orderBy("epoch").collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // disk: the dropped partitions are gone, the kept ones intact
    assert(!new java.io.File(s"$out/data/epoch=0").exists() &&
      !new java.io.File(s"$out/data/epoch=1").exists(),
      "vacuum left dropped epoch partitions on disk")
    assert(new java.io.File(s"$out/data/epoch=2").exists() &&
      new java.io.File(s"$out/data/epoch=3").exists())
    // idempotent: a second vacuum at the same horizon is a no-op
    StreamOps.vacuumEpochs(out, keepFrom = 2L)
    assert(StreamOps.committedEpochs(spark, out).count() === keptRows)
    // the sink keeps working past a vacuum: a new epoch lands and reads
    sink(batches.head._2, 4L)
    assert(StreamOps.committedEpochs(spark, out).count() ===
      keptRows + batches.head._2.count())
    // crash window between step 1 and 2: an orphaned invisible
    // partition (data present, ledger forgot it) stays unread and the
    // NEXT vacuum removes it
    batches(1)._2.withColumn("epoch", lit(1L))
      .write.mode("append").partitionBy("epoch").parquet(s"$out/data")
    assert(StreamOps.committedEpochs(spark, out)
      .filter(col("epoch") === 1).count() === 0,
      "orphaned partition leaked into reads")
    StreamOps.vacuumEpochs(out, keepFrom = 2L)
    assert(!new java.io.File(s"$out/data/epoch=1").exists(),
      "the horizon sweep should collect the orphaned partition even " +
        "though the ledger no longer names it")
    assert(StreamOps.committedEpochs(spark, out).count() ===
      keptRows + batches.head._2.count())
  }

  test("committedEpochs pre-r15 compat: zero-byte legacy markers (which " +
      "the binaryFile source skips) are still read as committed") {
    val out = java.nio.file.Files.createTempDirectory("graft_eoz_").toString
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "value")
    val b0 = ev.filter(col("event_id") % 2 === 0)
    // simulate a pre-r15 sink: data partition + zero-byte marker
    b0.withColumn("epoch", lit(0L))
      .write.partitionBy("epoch").parquet(s"$out/data")
    val ledger = new java.io.File(s"$out/_epochs")
    ledger.mkdirs()
    assert(new java.io.File(ledger, "0").createNewFile())
    assert(StreamOps.committedEpochs(spark, out).count() === b0.count(),
      "legacy zero-byte ledger read as empty — every pre-r15 committed " +
        "epoch would silently vanish")
    // the next sink write compacts the legacy marker into the manifest
    val b1 = ev.filter(col("event_id") % 2 === 1)
    StreamOps.exactlyOnceSink(out, compactEvery = 1)(b1, 1L)
    assert(StreamOps.committedEpochs(spark, out).count() === ev.count())
    assert(!new java.io.File(ledger, "0").exists(),
      "compaction should fold the legacy marker into the manifest")
  }

  test("OHLC bars update across micro-batches with tie-broken endpoints") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.ohlcHourly(
        ms.toDF().withColumn("event_type", lit("tick")))
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("update").start()
    try {
      // events 1 and 2 share the 10:05 timestamp — the open must pick the
      // LOWER event_id (3.0), not arrival order (5.0 arrives first)
      ms.addData(Ev(2, ts(10, 5), 1, 5.0), Ev(1, ts(10, 5), 1, 3.0),
        Ev(3, ts(10, 40), 1, 1.0))
      q.processAllAvailable()
      // a second batch extends the same 10:00 bar (close moves to 4.0)
      // and opens a new 12:00 bar
      ms.addData(Ev(4, ts(10, 55), 1, 4.0), Ev(5, ts(12, 0), 1, 9.0))
      q.processAllAvailable()
      // update mode re-emits a bar per batch; keep each bar's latest state
      val bars = spark.table("ohlc_out")
        .as[(String, Timestamp, Double, Double, Double, Double, Long)]
        .collect().groupBy(_._2).map { case (k, vs) => k -> vs.maxBy(_._7) }
      assert(bars(ts(10)) === (("tick", ts(10), 3.0, 5.0, 1.0, 4.0, 4L)))
      assert(bars(ts(12)) === (("tick", ts(12), 9.0, 9.0, 9.0, 9.0, 1L)))
    } finally q.stop()
  }

  test("rate alert joins the static baseline into the stream and fires " +
    "exactly once per breaching window (append mode)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    // static model parameter: 'tick' averages 1.5 events/hour
    val ref = Seq(("tick", 1.5)).toDF("event_type", "avg_hourly")
    val q = StreamOps.rateAlert(
        ms.toDF().withColumn("event_type", lit("tick")), ref)
      .writeStream.format("memory").queryName("alert_out")
      .outputMode("append").start()
    try {
      // hour 10: 4 events (> 2*1.5 → alert); hour 11: 2 events (no alert)
      ms.addData(Ev(1, ts(10, 1), 1, 1.0), Ev(2, ts(10, 2), 1, 1.0),
        Ev(3, ts(10, 10), 1, 1.0), Ev(4, ts(10, 30), 1, 1.0),
        Ev(5, ts(11, 5), 1, 1.0), Ev(6, ts(11, 6), 1, 1.0))
      q.processAllAvailable()
      // advance the watermark past hour 11 so both windows finalize
      ms.addData(Ev(7, ts(14), 1, 1.0))
      q.processAllAvailable()
      val alerts = spark.table("alert_out")
        .as[(String, Timestamp, Long, Double)].collect()
      assert(alerts.toSeq === Seq(("tick", ts(10), 4L, 1.5)),
        s"got ${alerts.toSeq}")
    } finally q.stop()
  }

  test("T++ stream top-k: append mode ranks each finalized window " +
    "exactly once in foreachBatch") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{concat, lit, col}
    val ms = MemoryStream[Ev]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    val q = StreamOps.hourlyCounts(ms.toDF()
        .withColumn("event_type", concat(lit("t"), col("user_id"))))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ranked = StreamOps.rankTopK(batch, 2)
          .as[(Long, Long, String, Long)].collect()
        out.synchronized { out ++= ranked }
        ()
      }
      .start()
    try {
      // hour 10: t1 ×3, t2 ×2, t3 ×1 (t3 must fall out of the top-2);
      // hour 11: t2 ×2, t1 ×1
      ms.addData(
        Ev(1, ts(10, 1), 1, 0), Ev(2, ts(10, 2), 1, 0), Ev(3, ts(10, 3), 1, 0),
        Ev(4, ts(10, 4), 2, 0), Ev(5, ts(10, 5), 2, 0), Ev(6, ts(10, 6), 3, 0),
        Ev(7, ts(11, 1), 2, 0), Ev(8, ts(11, 2), 2, 0), Ev(9, ts(11, 3), 1, 0))
      q.processAllAvailable()
      assert(out.isEmpty, "no window may rank before the watermark closes it")
      // advance the watermark past 12:00 → both hours finalize, once
      ms.addData(Ev(10, ts(13), 9, 0))
      q.processAllAvailable()
      val byWin = out.toSeq.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, rows) =>
          rows.sortBy(_._2).map(r => (r._2, r._3, r._4))
        }
      assert(byWin === Seq(
        Seq((1L, "t1", 3L), (2L, "t2", 2L)),
        Seq((1L, "t2", 2L), (2L, "t1", 1L))))
    } finally q.stop()
  }

  test("T2/T4 transforms produce identical results in batch re-runs") {
    // determinism: the same StreamOps transform over the same input is
    // stable run to run (required for idempotent micro-batch re-execution).
    val e = Tables.events(spark, sf0001)
    val a = StreamOps.sessionize(e).collect().toSeq
    val b = StreamOps.sessionize(e).collect().toSeq
    assert(a === b)
  }

  case class Chg(o_orderkey: Long, seq: Int, op: String,
    price: Option[Double])

  test("cdcLatestWins carries latest-wins state across micro-batches, " +
    "tombstones keep winning over late lower-seq rows") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Chg]
    val q = StreamOps.cdcLatestWins(ms.toDF())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      // batch 1: inserts
      ms.addData(Chg(1, 1, "I", Some(10.0)), Chg(2, 1, "I", Some(20.0)))
      q.processAllAvailable()
      // batch 2: key 1 updates, key 2 deletes, key 3 inserts
      ms.addData(Chg(1, 2, "U", Some(11.0)), Chg(2, 2, "D", None),
        Chg(3, 1, "I", Some(30.0)))
      q.processAllAvailable()
      // batch 3: a LATE lower-seq row for key 2 — the stored tombstone
      // (seq 2) must still win; key 1 gets a redelivered seq-1 row, the
      // stored update must win.
      ms.addData(Chg(2, 1, "I", Some(20.0)), Chg(1, 1, "I", Some(10.0)))
      q.processAllAvailable()
      val rows = spark.table("cdc_out")
        .as[(Long, String, Option[Double])].collect().toSeq
      // last emitted row per key is the maintained state
      val state = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (k, v) => k -> v.maxBy(_._2)._1 }
      assert(state(1L) === ((1L, "U", Some(11.0))))
      assert(state(2L) === ((2L, "D", None)))
      assert(state(3L) === ((3L, "I", Some(30.0))))
    } finally q.stop()
  }

  test("cdcLatestWins is provider-agnostic: RocksDB state store yields " +
    "identical output and actually holds the state (100 TB posture)") {
    // The default HDFSBackedStateStoreProvider keeps every key's state on
    // the executor HEAP — at 100 TB CDC key cardinality that is an OOM
    // by design. RocksDBStateStoreProvider spills state to local SSD and
    // is the standard fix (one config, no code change); this spec proves
    // the transform is provider-agnostic: same emitted rows, and the
    // query's stateOperators metrics show RocksDB actually engaged
    // (rocksdb* custom metrics present, state rows > 0).
    implicit val ctx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Chg]
      val q = StreamOps.cdcLatestWins(ms.toDF())
        .writeStream.format("memory").queryName("cdc_rocks_out")
        .outputMode("update").start()
      try {
        ms.addData(Chg(1, 1, "I", Some(10.0)), Chg(2, 1, "I", Some(20.0)))
        q.processAllAvailable()
        ms.addData(Chg(1, 2, "U", Some(11.0)), Chg(2, 2, "D", None),
          Chg(3, 1, "I", Some(30.0)))
        q.processAllAvailable()
        ms.addData(Chg(2, 1, "I", Some(20.0)), Chg(1, 1, "I", Some(10.0)))
        q.processAllAvailable()
        // identical maintained state to the heap-backed run above
        val rows = spark.table("cdc_rocks_out")
          .as[(Long, String, Option[Double])].collect().toSeq
        val state = rows.zipWithIndex.groupBy(_._1._1)
          .map { case (k, v) => k -> v.maxBy(_._2)._1 }
        assert(state(1L) === ((1L, "U", Some(11.0))))
        assert(state(2L) === ((2L, "D", None)))
        assert(state(3L) === ((3L, "I", Some(30.0))))
        // and the provider really is RocksDB: its custom metrics surface
        // in the progress (absent under the heap-backed provider)
        val so = q.lastProgress.stateOperators
        assert(so.nonEmpty)
        assert(so(0).numRowsTotal === 3L)
        val custom = so(0).customMetrics.keySet()
        assert(custom.toString.contains("rocksdb"),
          s"expected rocksdb* state-store metrics, got $custom")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }
  case class Dim(c_custkey: Long, seg: String, ts: Int)

  test("scd2Versions maintains SCD2 versions across micro-batches " +
    "(state = the open version): the last UPDATE-mode emission per " +
    "(key, valid_from) equals the batch Scd2.apply history") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Dim]
    val q = StreamOps.scd2Versions(ms.toDF())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("update").start()
    try {
      // batch 1: first load — keys 1..3 open their first versions
      ms.addData(Dim(1, "A", 1), Dim(2, "A", 1), Dim(3, "B", 1))
      q.processAllAvailable()
      // batch 2: key 1 changes (close + reopen), key 2 unchanged
      // (skipped), key 3 absent (survives current)
      ms.addData(Dim(1, "B", 2), Dim(2, "A", 2))
      q.processAllAvailable()
      // batch 3: key 1 changes AGAIN, key 3 changes after a gap
      ms.addData(Dim(1, "C", 3), Dim(3, "C", 3))
      q.processAllAvailable()
      val rows = spark.table("scd2_out")
        .as[(Long, String, Int, Option[Int], Boolean)].collect().toSeq
      // last emission per (key, valid_from) is the maintained version
      val versions = rows.zipWithIndex
        .groupBy(r => (r._1._1, r._1._3))
        .map { case (_, v) => v.maxBy(_._2)._1 }.toSet
      val expected = Set(
        (1L, "A", 1, Some(2), false), (1L, "B", 2, Some(3), false),
        (1L, "C", 3, None, true),
        (2L, "A", 1, None, true),
        (3L, "B", 1, Some(3), false), (3L, "C", 3, None, true))
      assert(versions === expected)
      // batch-by-batch agreement with the incremental batch operator:
      // replay the same three batches through Scd2.init/apply
      val b1 = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("c_custkey", "seg")
      val b2 = Seq((1L, "B"), (2L, "A")).toDF("c_custkey", "seg")
      val b3 = Seq((1L, "C"), (3L, "C")).toDF("c_custkey", "seg")
      import org.apache.spark.sql.functions.lit
      val s3 = graft.ops.Scd2.apply(
        graft.ops.Scd2.apply(graft.ops.Scd2.init(b1, lit(1)),
          b2, Seq("c_custkey"), Seq("seg"), lit(2)),
        b3, Seq("c_custkey"), Seq("seg"), lit(3))
      val batchHist = s3.as[(Long, String, Int, Option[Int], Boolean)]
        .collect().toSet
      assert(versions === batchHist,
        "stateful stream and batch SCD2 operator disagree")
    } finally q.stop()
  }

  case class Doc(doc_id: Long, text: String)

  test("nearDupCollisions flags cross-trigger near-dups and hands the " +
    "reference to a smaller late id (min-id-keeps, maintained in state)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Doc]
    val q = StreamOps.nearDupCollisions(ms.toDF())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    try {
      // trigger 1: first arrival of each bucket — nothing may emit
      ms.addData(Doc(100, textA), Doc(300, "totally different words here"))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() === 0,
        "first arrivals are references, not dups")
      // trigger 2: an exact near-dup of doc 100 — flagged against the
      // state carried from trigger 1, est 1.0 on every band
      ms.addData(Doc(200, textA))
      q.processAllAvailable()
      val hits2 = spark.table("neardup_out")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(hits2.map(_._1).distinct === Seq(200L))
      assert(hits2.forall(h => h._3 === 100L && h._4 === 1.0))
      assert(hits2.map(_._2).sorted === Seq(0, 1, 2, 3),
        "an identical doc collides on all 4 bands")
      // trigger 3: a SMALLER id arrives late — it takes over as the
      // bucket reference and the old reference is reported as its dup
      ms.addData(Doc(50, textA))
      q.processAllAvailable()
      val hits3 = spark.table("neardup_out")
        .filter(col("ref_id") === 50L)
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(hits3.map(_._1).distinct === Seq(100L),
        "the displaced reference is reported against the new minimum")
    } finally q.stop()
  }

  test("nearDupCollisions batch form matches the per-row/batch signature " +
    "contract: per-row sigs equal sigTable's") {
    val batch = ops.Streaming.queries("stream_dedup_minhash")(spark, sf0001)
      .collect()
    assert(batch.nonEmpty, "the corpus's dup families must collide")
    batch.foreach { r =>
      assert(r.getAs[Long]("doc_id") > r.getAs[Long]("ref_id"))
      val e = r.getAs[Double]("est_sim")
      assert(e >= 0.0 && e <= 1.0 && (e * 16) == math.round(e * 16))
    }
  }

}
