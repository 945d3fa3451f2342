package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DotProductExpr
import graft.plans.AnnRewriteRule

/** AnnRewriteRule: the naive quadratic cosine-threshold pair search is
  * rewritten (only when opted in) into an LSH-bucketed equi join with the
  * original predicate re-verified — same answers on near-dup data, no
  * cartesian/nested-loop stage in the physical plan.
  */
class AnnRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = DotProductExpr.dot(a, b)

  /** 40 base vectors + 40 near-duplicates (cos ≈ 0.9998). */
  private lazy val vecs: DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
    var id = 0L
    for (_ <- 0 until 40) {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      rows += ((id, v)); id += 1
      rows += ((id, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))); id += 1
    }
    rows.toSeq.toDF("vec_id", "embedding")
      .withColumn("nrm", sqrt(dot($"embedding", $"embedding")))
  }

  /** The naive shape the rule targets: crossJoin + cosine filter. */
  private def naive: DataFrame = {
    val a = vecs.select($"vec_id".as("ia"), $"embedding".as("ea"),
      $"nrm".as("na"))
    val b = vecs.select($"vec_id".as("ib"), $"embedding".as("eb"),
      $"nrm".as("nb"))
    a.crossJoin(b)
      .filter($"ia" < $"ib" &&
        dot($"ea", $"eb") / ($"na" * $"nb") >= 0.9)
      .select("ia", "ib")
  }

  test("rule off: plan keeps the cartesian and is the ground truth") {
    spark.conf.set(AnnRewriteRule.ConfKey, "false")
    spark.experimental.extraOptimizations = Seq(AnnRewriteRule)
    val q = naive
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("CartesianProduct") ||
      phys.contains("BroadcastNestedLoopJoin"))
    assert(q.count() === 40) // the 40 planted pairs
  }

  test("rule on: bucketed equi join replaces the cartesian, same answers") {
    spark.experimental.extraOptimizations = Seq(AnnRewriteRule)
    spark.conf.set(AnnRewriteRule.ConfKey, "true")
    try {
      val truth = { // computed with the rule disabled
        spark.conf.set(AnnRewriteRule.ConfKey, "false")
        val t = naive.as[(Long, Long)].collect().toSet
        spark.conf.set(AnnRewriteRule.ConfKey, "true")
        t
      }
      val q = naive
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bk"), s"rule did not fire:\n$opt")
      // multiplicity is preserved by the first-collision filter — the
      // rewrite must NOT dedup output rows (that would collapse genuinely
      // duplicate input rows too)
      assert(!opt.contains("Deduplicate") && !opt.contains("Aggregate"))
      val phys = q.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") &&
        !phys.contains("BroadcastNestedLoopJoin"),
        s"quadratic join survived:\n$phys")
      // precision exact (predicate re-verified) and, at cos≈0.9998, the
      // 8-table miss probability is ~1e-13 per pair — equality, not
      // recall; compare as a sorted MULTISET so a multi-table double-emit
      // would fail the test
      assert(q.as[(Long, Long)].collect().toSeq.sorted ===
        truth.toSeq.sorted)
    } finally {
      spark.conf.set(AnnRewriteRule.ConfKey, "false")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rule on but no positive threshold: plan is untouched") {
    spark.experimental.extraOptimizations = Seq(AnnRewriteRule)
    spark.conf.set(AnnRewriteRule.ConfKey, "true")
    try {
      val a = vecs.select($"vec_id".as("ia"), $"embedding".as("ea"))
      val b = vecs.select($"vec_id".as("ib"), $"embedding".as("eb"))
      val q = a.crossJoin(b)
        .filter(dot($"ea", $"eb") >= -1.0 && $"ia" < $"ib") // keeps ~all pairs
      assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_bk"))
    } finally {
      spark.conf.set(AnnRewriteRule.ConfKey, "false")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("positive bound on an UNRELATED column must not trigger the rewrite") {
    spark.experimental.extraOptimizations = Seq(AnnRewriteRule)
    spark.conf.set(AnnRewriteRule.ConfKey, "true")
    try {
      val a = vecs.select($"vec_id".as("ia"), $"embedding".as("ea"),
        lit(1.5).as("weight"))
      val b = vecs.select($"vec_id".as("ib"), $"embedding".as("eb"))
      // anti-correlated pair search + an unrelated positive bound: sign-LSH
      // buckets would lose ~all qualifying pairs, so the rule must not fire
      val q = a.crossJoin(b)
        .filter(dot($"ea", $"eb") <= -0.5 && $"weight" >= 1.0 &&
          $"ia" < $"ib")
      assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_bk"))
    } finally {
      spark.conf.set(AnnRewriteRule.ConfKey, "false")
      spark.experimental.extraOptimizations = Nil
    }
  }
}
