package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min Sketch frequency aggregate (Cormode & Muthukrishnan 2005)
  * over Spark's public `org.apache.spark.util.sketch.CountMinSketch` —
  * the heavy-hitters sketch a training-data pipeline runs to find
  * dominating tokens / domains / URLs without a full groupBy of the
  * stream.
  *
  * Mergeability: CMS cells are sums, so partition merges commute — the
  * estimate is independent of partition order (unlike float sums), and
  * with a fixed seed the sketch is bit-deterministic across runs. Plans
  * as a standard two-phase HashAggregate; executor memory is
  * O(depth x width) regardless of data scale.
  *
  * Guarantee: estimate >= true count (one-sided error), so
  * `estimate >= T` can never miss a true heavy hitter — the basis of the
  * sketch-prefilter + exact-verify pattern in `agg_cms_heavy`
  * (ops/Corpus.scala), which keeps the final output exact.
  */
case class CmsSketch(
    child: Expression,
    depth: Int = 5,
    width: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  private val Seed = 42

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, Seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.addString(s.toString)
      case l: Long => buf.addLong(l)
      case i: Int => buf.addLong(i.toLong)
      case other => buf.add(other)
    }
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b); a
  }

  /** The serialized sketch itself — collected driver-side as a model
    * parameter (depth x width x 8 bytes, ~160 KB at the defaults) and fed
    * to [[CmsEstimate]]. */
  override def eval(buf: CountMinSketch): Any = serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): CmsSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketch =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "cms_sketch"
}

/** Point estimate from a driver-side CMS (string keys). The deserialized
  * sketch rides into generated code as a reference object — the probe is a
  * few array reads inside whole-stage codegen, the same shape Spark's own
  * BloomFilterMightContain uses.
  */
case class CmsEstimate(sketch: CountMinSketch, child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    sketch.estimateCount(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount($c.toString())")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs a STRING key, got ${child.dataType.sql}")

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
  override def prettyName: String = "cms_estimate"
}

object CmsSketch {
  import org.apache.spark.sql.graftshim

  def cmsAgg(c: Column, depth: Int = 5, width: Int = 4096): Column =
    graftshim.column(
      CmsSketch(graftshim.expression(c), depth, width).toAggregateExpression())

  def cmsEstimate(sketchBytes: Array[Byte], c: Column): Column =
    graftshim.column(CmsEstimate(
      CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes)),
      graftshim.expression(c)))
}
