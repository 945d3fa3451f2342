package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftshim

/** Column-DSL surface over Spark's internal Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind runtime row-group filtering, unregistered in SQL). Exposed via
  * the graftshim Column<->Expression bridge, same pattern as
  * [[DotProductExpr]].
  *
  * The intended shape is sketch-prefilter + exact-verify: build the filter
  * over the SMALL side (an eval set, a blocklist), embed it as a foldable
  * binary literal, prefilter the 100 TB side map-side with
  * [[mightContain]] (no false negatives, so nothing true is lost), then
  * exact-join only the survivors. The final result is EXACT — false
  * positives die in the verify join — so the whole plan stays
  * oracle-checkable while the expensive join's probe side shrinks by the
  * filter's rejection rate.
  */
object BloomFunctions {

  /** Aggregate: Bloom filter (binary blob) over xxhash64 of `c`.
    * `numBits` fixes the blob size (numBits/8 bytes); fpp ~= (1/2)^(bits
    * per item * ln 2) — 16 bits/item gives ~5e-4.
    */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    graftshim.column(new BloomFilterAggregate(
      graftshim.expression(xxhash64(c)),
      Literal(estimatedItems), Literal(numBits))
      .toAggregateExpression())

  /** Predicate: might `c` be in the serialized filter `bloomBytes`?
    * The blob must be driver-side (a collected model parameter, KB-sized —
    * the IVF-centroid pattern): `BloomFilterMightContain` requires its
    * filter side foldable or a scalar subquery, and a literal makes the
    * deserialized filter a per-executor lazy singleton inside codegen.
    */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    graftshim.column(BloomFilterMightContain(
      Literal(bloomBytes),
      graftshim.expression(xxhash64(c))))
}
