package graft

import org.apache.spark.sql.functions._

/** CMS invariants beyond the agg_cms_heavy oracle: the one-sided error
  * guarantee (estimate >= exact, the property that makes the prefilter
  * lossless) and merge determinism across partition layouts.
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def tokRows = Tables.documents(spark, sf0001)
    .select(explode(split(lower(col("text")), " ")).as("tok"))

  test("cms estimate never underestimates any token's true count") {
    val cms = tokRows.agg(functions.CmsSketch.cmsAgg(col("tok")))
      .head().getAs[Array[Byte]](0)
    val bad = tokRows.groupBy("tok").agg(count(lit(1)).as("exact"))
      .withColumn("est",
        functions.CmsSketch.cmsEstimate(cms, col("tok")))
      .filter(col("est") < col("exact"))
      .count()
    assert(bad == 0, "CMS must be one-sided: estimate >= exact count")
  }

  test("cms sketch is identical across partition layouts") {
    val a = tokRows.repartition(1)
      .agg(functions.CmsSketch.cmsAgg(col("tok")))
      .head().getAs[Array[Byte]](0)
    val b = tokRows.repartition(7, col("tok"))
      .agg(functions.CmsSketch.cmsAgg(col("tok")))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b),
      "cell sums commute — merge order must not change the sketch")
  }

  test("estimates are reasonably tight at this cardinality") {
    // depth 5 x width 4096 over ~vocab-100 tokens: collisions add at most
    // a tiny fraction of the stream; require est <= 2x exact for tokens
    // with exact >= 100 (loose, deterministic bound).
    val cms = tokRows.agg(functions.CmsSketch.cmsAgg(col("tok")))
      .head().getAs[Array[Byte]](0)
    val loose = tokRows.groupBy("tok").agg(count(lit(1)).as("exact"))
      .filter(col("exact") >= 100)
      .withColumn("est",
        functions.CmsSketch.cmsEstimate(cms, col("tok")))
      .filter(col("est") > col("exact") * 2)
      .count()
    assert(loose == 0)
  }
}
