package graft.ops

import graft.Q
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Declared-query surface for the multimodal family (SURVEY.md §2.L
  * L129–L131) — the L23 plumbing (`multimodal/Multimodal.scala`: binary
  * payload + typed metadata schema, batched mapPartitions decode,
  * metadata-only planning) exposed as oracle-checked board queries
  * instead of spec-only machinery (VERDICT r11 "growth axis" option b).
  *
  * The media table is [[Multimodal.synth]]'s deterministic generator
  * (`media_id → kind, payload bytes, metadata`), NOT driver parquet — the
  * testdata ships no media table, and a formula-generated payload is what
  * makes an EXACT DuckDB oracle possible: the oracle replays the synth
  * arithmetic and the 16-bin byte-histogram stub decode from
  * `generate_series`, so even the decode path is hash-compared, not
  * rows-only. The byte-level contract mirrored in SQL:
  * `content[b] = (i·31 + b·7) mod 251` stored as a signed byte; the stub's
  * `& 0xFF` recovers the 0..250 value, so `bin = ((i·31+b·7) mod 251) mod
  * 16` in both engines. Histogram normalization is count/len in FLOAT —
  * a single correctly-rounded IEEE division of exact small integers in
  * both engines — widened to double (exact) before the cross-media
  * DECIMAL(30,8) accumulation.
  *
  * Scale posture: `media_decode_agg` is the full decode pipeline shape —
  * round-robin repartition (payload skew), batched per-partition decode
  * (one codec call per 64-row batch, the vectorized-UDF shape), then one
  * reducing aggregate by kind; the binary column never shuffles after
  * decode. The two plan queries are METADATA-ONLY: the binary column is
  * pruned at the source (at 100 TB, planning a sampling/resize job costs
  * a metadata scan, not a media read).
  */
object Media {

  /** Synth size: fixed — the media table is modality plumbing, not
    * SF-scaled driver data; the oracle interpolates the same constant. */
  private val MediaN = 4096

  val queries: Map[String, Q] = Map(

    // L129 — the decode pipeline as a declared query: prune → round-robin
    // spread → batched stub decode (mapPartitions, 64-row batches) →
    // per-kind reducing aggregate over payload sizes and the first
    // histogram feature. f0 rides float→double (exact widening) into a
    // decimal sum, so batch/partition order cannot reorder the fold.
    "media_decode_agg" -> ((s, _) => {
      val media = Multimodal.synth(s, MediaN)
      val feats = Multimodal
        .extractFeatures(Multimodal.repartitionForDecode(media))
        .toDF()
      feats
        .select(col("kind"), col("n_bytes"),
          element_at(col("feature"), 1).cast("double").as("f0"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes").cast("long")).as("total_bytes"),
          dsum(col("f0"), 6).as("f0_mass"))
        .orderBy("kind")
    }),

    // L130 — frame-sampling plan (every 4th frame), metadata-only: the
    // sequence/explode/pmod pipeline never touches `content` (parquet
    // column pruning leaves the payload on disk). Per video: how many
    // frames the decode stage will receive and the last sampled index.
    "media_frame_plan" -> ((s, _) => {
      val media = Multimodal.synth(s, MediaN)
      Multimodal.sampleFrames(media, 4)
        .groupBy("media_id", "n_frames")
        .agg(count(lit(1)).as("n_sampled"),
          max(col("frame_idx")).cast("int").as("last_frame"))
        .orderBy("media_id")
    }),

    // L131 — resize plan (fit inside 24px preserving aspect, never
    // upscale), metadata-only: target geometry from the metadata struct.
    // The scale factor is one IEEE division + one multiply + floor on
    // identical operands in both engines — no rounding surface.
    "media_resize_plan" -> ((s, _) => {
      val media = Multimodal.synth(s, MediaN)
      Multimodal.planResize(media, 24).orderBy("media_id")
    })
  )

  /** Shared synth replay: media_id, kind, payload length from
    * generate_series — the [[Multimodal.synth]] formula verbatim. */
  private val dSynth =
    s"""m AS (SELECT i AS media_id,
      |    CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
      |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    64 + (i % 16) * 8 AS len,
      |    CASE WHEN i % 3 <> 1 THEN CAST(16 + (i % 4) * 16 AS INT)
      |      ELSE 0 END AS w,
      |    CASE WHEN i % 3 <> 1 THEN CAST((16 + (i % 4) * 16) / 2 AS INT)
      |      ELSE 0 END AS h,
      |    CASE WHEN i % 3 = 2 THEN CAST(24 + (i % 5) * 24 AS INT)
      |      ELSE 0 END AS n_frames
      |  FROM generate_series(0, ${MediaN - 1}) t(i))""".stripMargin

  val oracles: Map[String, String] = Map(
    "media_decode_agg" ->
      s"""WITH $dSynth,
        |b AS (SELECT media_id, kind, len,
        |    unnest(generate_series(0, len - 1)) AS p FROM m),
        |h AS (SELECT media_id, kind, len,
        |    CAST(sum(CASE WHEN ((media_id * 31 + p * 7) % 251) % 16 = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0
        |  FROM b GROUP BY 1, 2, 3),
        |f AS (SELECT kind, len,
        |    CAST(CAST(c0 AS FLOAT) / CAST(len AS FLOAT) AS DOUBLE) AS f0
        |  FROM h)
        |SELECT kind, count(*) AS n_media,
        |  CAST(sum(len) AS BIGINT) AS total_bytes,
        |  CAST(round(sum(CAST(f0 AS DECIMAL(30,8))), 6) AS DOUBLE)
        |    AS f0_mass
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "media_frame_plan" ->
      s"""WITH $dSynth,
        |fr AS (SELECT media_id, n_frames,
        |    unnest(generate_series(0, n_frames - 1)) AS frame_idx
        |  FROM m WHERE kind = 'video' AND n_frames > 0)
        |SELECT media_id, n_frames, count(*) AS n_sampled,
        |  CAST(max(frame_idx) AS INT) AS last_frame
        |FROM fr WHERE frame_idx % 4 = 0
        |GROUP BY 1, 2 ORDER BY media_id""".stripMargin,
    "media_resize_plan" ->
      s"""WITH $dSynth
        |SELECT media_id, w AS src_w, h AS src_h,
        |  CAST(floor(w * least(1.0, 24 / CAST(greatest(w, h) AS DOUBLE)))
        |    AS INT) AS dst_w,
        |  CAST(floor(h * least(1.0, 24 / CAST(greatest(w, h) AS DOUBLE)))
        |    AS INT) AS dst_h
        |FROM m WHERE kind IN ('image', 'video')
        |ORDER BY media_id""".stripMargin
  )
}
