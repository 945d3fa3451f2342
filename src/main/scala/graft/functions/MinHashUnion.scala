package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom UDAF surface (SURVEY.md §2.J U6): merges per-document MinHash
  * signatures into one group signature by elementwise min.
  *
  * A MinHash signature is a mergeable sketch: min is associative and
  * commutative, so partial aggregation (map-side combine) is exact — the
  * same property the reference leans on with its partial→final SUM
  * re-aggregation (box_office_showrange.sql:6-29), applied to a sketch.
  * Registered via `udaf(...)`, so it plans as a regular two-phase
  * HashAggregate at any scale.
  */
object MinHashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private val Slots = 16

  override def zero: Array[Long] = Array.fill(Slots)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    // fail loudly on malformed input — a short signature would otherwise
    // leave Long.MaxValue sentinels in the merged result as if they were
    // real minima
    require(sig != null && sig.length == Slots,
      s"minhash_union expects $Slots-slot signatures, got " +
        s"${if (sig == null) "null" else sig.length.toString}")
    var i = 0
    while (i < Slots) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Slots) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  def register(spark: SparkSession): Unit =
    spark.udf.register("minhash_union", udaf(this))
}
