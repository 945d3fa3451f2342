package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch.kmvDistinct

/** KMV sketch: exact below k, bounded error above, mergeable across
  * partitions (the partial→final two-phase property).
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct count < k") {
    val o = Tables.orders(spark, sf0001)
    val exact = o.agg(countDistinct(col("o_orderstatus"))).as[Long]
      .collect().head
    val kmv = o.agg(kmvDistinct(col("o_orderstatus"))).as[Long]
      .collect().head
    assert(kmv === exact)
  }

  test("within ~3/sqrt(k) relative error above k") {
    val ids = spark.range(100000).select(col("id"))
    val kmv = ids.agg(kmvDistinct(col("id"), k = 256)).as[Long]
      .collect().head
    val err = math.abs(kmv - 100000.0) / 100000.0
    assert(err < 3.0 / math.sqrt(256), s"KMV estimate $kmv err $err")
  }

  test("sane in the k..2k window (unsigned kth hash >= 2^63)") {
    // regression: the kth smallest of ~300 hashes sits in the upper half
    // of the unsigned space; a signed reinterpretation returned negative
    // estimates here
    val ids = spark.range(300).select(col("id"))
    val kmv = ids.agg(kmvDistinct(col("id"), k = 256)).as[Long]
      .collect().head
    assert(kmv > 0, s"negative estimate $kmv")
    assert(math.abs(kmv - 300.0) / 300.0 < 3.0 / math.sqrt(256),
      s"KMV estimate $kmv for 300 distinct")
  }

  test("partition-layout invariant (mergeable partials)") {
    val ids = spark.range(50000).select(col("id"))
    val a = ids.repartition(1).agg(kmvDistinct(col("id"))).as[Long]
      .collect().head
    val b = ids.repartition(32).agg(kmvDistinct(col("id"))).as[Long]
      .collect().head
    assert(a === b) // the bounded union is order/layout independent
  }

  test("string inputs and grouped aggregation") {
    val c = Tables.customer(spark, sf0001)
    val got = c.groupBy("c_mktsegment")
      .agg(kmvDistinct(col("c_name")).as("n_names"),
        countDistinct(col("c_name")).as("exact"))
      .filter(col("n_names") =!= col("exact")) // < k distinct => exact
    assert(got.isEmpty)
  }
}
