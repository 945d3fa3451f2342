package graft

import org.apache.spark.sql.functions._

/** Invariants of the composed curation capstone beyond the oracle hash:
  * each stage must actually bite, and the output must be a partition of
  * the survivors.
  */
class PipelineCurateSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline_curate: every stage drops something; splits partition") {
    val card = ops.Curation.queries("pipeline_curate")(spark, sf0001).cache()
    val total = Tables.documents(spark, sf0001).count()
    val survivors = card.agg(sum("n")).as[Long].head()
    // the corpus plants exact dups, near-dups, and eval-overlapping docs,
    // and 10 eval ids are excluded — survivors must be a strict subset
    assert(survivors > 0 && survivors < total - 10,
      s"expected real attrition: $survivors of $total")
    // all three splits present, and no (split, lang) cell is empty
    val splits = card.select("split").distinct().as[String].collect().toSet
    assert(splits == Set("train", "val", "test"))
    assert(card.filter(col("n") <= 0).count() == 0)
    // ~90/5/5: train must dominate every other split
    val bySplit = card.groupBy("split").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(bySplit("train") > bySplit("val") * 5 &&
      bySplit("train") > bySplit("test") * 5)
    card.unpersist()
    ()
  }

  test("pipeline_curate2: the r9 stack composes — attrition at every " +
    "policy, token masses near-balanced across sources") {
    val card = ops.Curation.queries("pipeline_curate2")(spark, sf0001)
      .cache()
    val total = Tables.documents(spark, sf0001).count()
    val survivors = card.agg(sum("n")).as[Long].head()
    assert(survivors > 0 && survivors < total,
      s"expected real attrition: $survivors of $total")
    assert(card.filter(col("n") <= 0).count() == 0)
    // the token-budget mixture stage must land every source's planned
    // mass near the binding source's (hash sampling is binomial around
    // the per-source rate — allow wide but real tolerance)
    val bySource = card.groupBy("source").agg(sum("tokens").as("t"))
      .as[(String, Long)].collect().map(_._2)
    assert(bySource.max.toDouble / bySource.min < 2.5,
      s"token masses should be near-balanced: ${bySource.toSeq.sorted}")
    // train dominates (90/5/5 downstream of everything)
    val bySplit = card.groupBy("split").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0L) &&
      bySplit("train") > bySplit.getOrElse("test", 0L))
    card.unpersist()
    ()
  }
}
