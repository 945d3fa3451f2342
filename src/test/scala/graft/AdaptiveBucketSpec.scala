package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r11: adaptive sign-LSH bucket width for over-cap blocks.
  *
  * The fixed 4-bit × 8-table sub-blocking only cuts an oversized block's
  * all-pairs mass ~2.5× (a random pair survives ≥1 of 8 tables with
  * P = 1−(15/16)⁸ ≈ 0.40 — measured 0.41 at the decade), so a 1M-vector
  * hot label would still emit ~4·10¹¹ candidates. [[TextSim.bucketBits]]
  * spends ceil(log2(cnt/cap)) bits (clamped [4,16]) so the expected
  * bucket population is ≤ cap at ANY block size, bounding the pair stage
  * at ~8·cnt·cap/2 — linear in the block. This spec pins (a) the integer
  * width formula, (b) the width-4 mask ≡ the legacy 4-bit bucket (so
  * every at-cap-scale result is bit-for-bit unchanged, decade included),
  * (c) the candidate-mass reduction on a synthetic hot block, and (d)
  * guaranteed recall of identical pairs (same vector ⇒ same buckets at
  * any width).
  */
class AdaptiveBucketSpec extends SparkSpec {
  import spark.implicits._

  test("bucketBits: integer ceil(log2(cnt/cap)) clamped to [4,16]") {
    val got = Seq(10L, 1000L, 2000L, 16000L, 16001L, 33000L, 1000000L,
        100000000000L)
      .toDF("cnt")
      .select(TextSim.bucketBits(col("cnt"), 1000).as("bits"))
      .collect().map(_.getInt(0)).toSeq
    //            10  1000 2000 16k 16001 33k  1M   1e11   (cap 1000)
    // q=ceil/cap: 1    1    2   16   17   33  1000  1e8
    // raw bits:    0    0    1    4    5    6   10    27
    assert(got === Seq(4, 4, 4, 4, 5, 6, 10, 16))
  }

  // deterministic pseudo-random 64-d vector (splitmix-style, seeded by i)
  private def vec(i: Long): Seq[Float] = {
    var x = (i + 1) * 0x9E3779B97F4A7C15L
    Seq.tabulate(64) { _ =>
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31
      (((x & 0xFFFFL).toDouble / 65535.0) * 2.0 - 1.0).toFloat
    }
  }

  test("width-4 mask equals the legacy 4-bit bucket on every table") {
    val df = (0L until 64L).map(i => Tuple1(vec(i))).toDF("embedding")
    val checks = (0 until 8).map { t =>
      (TextSim.signBucket(t, col("embedding")) ===
        TextSim.signBucketMasked(t, col("embedding"), lit(4))).as(s"t$t")
    }
    val bad = df.select(checks: _*)
      .collect().flatMap(r => (0 until 8).filter(i => !r.getBoolean(i)))
    assert(bad.isEmpty, s"mask(4) diverged from legacy bucket: $bad")
  }

  test("adaptive width bounds a hot block's candidate mass near-linearly " +
    "and keeps identical pairs (synthetic 2000-vector label, cap 50)") {
    val cap = 50
    val n = 2000 // 40x over cap -> q=40 -> 6 bits (64 buckets/table)
    // 1990 distinct vectors + 10 planted identical pairs
    val rows = (0L until (n - 10).toLong).map(i => (i, vec(i))) ++
      (0L until 10L).map(j => (n - 10 + j, vec(j))) // dup of vec(j)
    val e = rows.toDF("vec_id", "embedding")
      .withColumn("label", lit(1))
      .withColumn("cnt", lit(n.toLong))

    def candidates(bits: Int): org.apache.spark.sql.DataFrame = {
      val bl = e.select(col("label"), col("vec_id"),
        posexplode(array((0 until 8).map(t =>
          TextSim.signBucketMasked(t, col("embedding"), lit(bits))): _*))
          .as(Seq("tbl", "key")))
      bl.as("a").join(bl.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.key") === col("b.key") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"))
        .distinct()
    }

    val adaptiveBits = e.select(TextSim.bucketBits(col("cnt"), cap))
      .head().getInt(0)
    assert(adaptiveBits === 6)
    val fixed = candidates(4).count()
    val adaptive = candidates(adaptiveBits).count()
    val allPairs = n.toLong * (n - 1) / 2
    // fixed 4-bit keeps ~40% of all pairs; adaptive ~1-(63/64)^8 ~ 12%
    assert(fixed > allPairs * 3 / 10,
      s"fixed-width candidate mass unexpectedly low: $fixed / $allPairs")
    assert(adaptive < fixed / 2,
      s"adaptive width did not reduce candidates: $adaptive vs $fixed")
    assert(adaptive < 8L * n * cap, // the documented ~8*n*cap/2 bound, 2x slack
      s"adaptive candidates exceed the linear bound: $adaptive")
    // planted identical pairs always share every bucket at any width
    val cands = candidates(adaptiveBits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 10L).map(j => (j, (n - 10 + j).toLong)).toSet
    assert(planted.subsetOf(cands),
      s"missing planted identical pairs: ${planted -- cands}")
  }
}
