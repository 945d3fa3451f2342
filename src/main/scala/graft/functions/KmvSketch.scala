package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the binary-buffer aggregate surface
  * (SURVEY.md §2.J U6, second form: MinHashUnion shows the typed
  * `Aggregator`, this shows the Catalyst-internal sketch shape that
  * `approx_count_distinct` itself uses).
  *
  * The estimator (Bar-Yossef et al. 2002): keep the k smallest 64-bit
  * hashes; with U(k) the k-th smallest as a fraction of the hash space,
  * n ≈ (k−1)/U(k). The buffer is a bounded sorted set, so update is
  * O(log k), merge is a bounded union, and the aggregate is exact below k
  * distinct values. Plans as a standard two-phase (partial → final)
  * HashAggregate — executor memory is O(k) per group at any data scale.
  */
case class KmvSketch(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** splitmix64 over a stable per-type seed — any well-mixed 64-bit hash
    * serves KMV; unsigned comparison via the +MinValue shift trick. */
  private def hash(v: Any): Long = {
    var x = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: UTF8String =>
        val b = s.getBytes
        var acc = 0xCBF29CE484222325L // FNV-1a over the bytes
        var i = 0
        while (i < b.length) { acc ^= b(i); acc *= 0x100000001B3L; i += 1 }
        acc
      case other => other.hashCode().toLong
    }
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    x + Long.MinValue // order by unsigned value using signed TreeSet
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) buf.add(h)
    else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, hash(v))
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // k-th smallest as fraction of the unsigned 64-bit space. Recover
      // the unsigned value in DOUBLE arithmetic: subtracting Long.MinValue
      // as longs wraps back to a signed reinterpretation and went negative
      // whenever the unsigned kth hash >= 2^63 (i.e. whenever the true
      // distinct count is within ~2k of k).
      val kth = buf.last().longValue().toDouble - Long.MinValue.toDouble
      math.round((k - 1).toDouble / (kth / 1.8446744073709552E19))
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  def kmvDistinct(c: Column, k: Int = 256): Column =
    org.apache.spark.sql.graftshim.column(
      KmvSketch(org.apache.spark.sql.graftshim.expression(c), k)
        .toAggregateExpression())
}
