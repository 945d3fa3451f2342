package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The AUTOMATIC skew lever (VERDICT r9 next-round #6): `join_skew_salted`
  * proves the manual salting lever; this spec proves the other half of the
  * 100 TB posture — AQE's OptimizeSkewedJoin re-planning a sort-merge join
  * at runtime when one key dominates, WITHOUT any query rewrite. The
  * pinned plan shape lives in PLANS.md ("AQE skew join").
  *
  * The skew thresholds are lowered to fire at test scale (the defaults
  * trigger at 256 MB partitions); production keeps the defaults and gets
  * the same re-plan when a real partition crosses them.
  */
class AqeSkewSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** collect() that also descends into materialized query stages (AQE
    * wraps each stage as a LEAF node whose subtree hangs off `.plan`). */
  private def deepCollect[T](p: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++
      p.collect { case q: QueryStageExec => q.plan }
        .flatMap(deepCollect(_)(pf))

  test("OptimizeSkewedJoin splits the dominant key's partition at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fire at test scale: a partition is skewed when > 5x median AND
      // > 100 KB (default 256 MB), split to ~64 KB targets
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      // no broadcast escape hatch: force the sort-merge path a 100 TB
      // fact-fact join takes
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // keep AQE from first coalescing everything into one partition
      "spark.sql.adaptive.coalescePartitions.minPartitionNum" -> "4") {
      // ~90% of the left rows share key 0; the right side is uniform
      val left = spark.range(0, 400000)
        .select(when(col("id") < 360000, 0L).otherwise(col("id") % 512)
          .as("k"),
          concat(lit("payload-"), col("id")).as("v"))
      val right = spark.range(0, 512)
        .select(col("id").as("k"), (col("id") * 7).as("w"))
      val joined = left.join(right, "k")
      // drive THIS dataset's QueryExecution (count() would plan a separate
      // aggregate query, leaving joined's adaptive plan un-materialized)
      assert(joined.queryExecution.toRdd.count() === 400000L)

      val fin = finalPlan(joined.queryExecution.executedPlan)
      val smj = deepCollect(fin) { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join, got:\n$fin")
      assert(smj.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not fire (no skew=true):\n$fin")
      // the skewed partition really was split into multiple partial reads
      val splits = deepCollect(fin) { case r: AQEShuffleReadExec =>
        r.partitionSpecs.count(_.isInstanceOf[PartialReducerPartitionSpec])
      }
      assert(splits.exists(_ > 1),
        s"no PartialReducerPartitionSpec splits in:\n$fin")
      // pinned in PLANS.md ("AQE skew join")
      val reads = deepCollect(fin) { case r: AQEShuffleReadExec =>
        s"${r.partitionSpecs.size} specs / " +
          s"${r.partitionSpecs.count(_.isInstanceOf[PartialReducerPartitionSpec])} skew-splits"
      }
      info(s"AQEShuffleRead partitioning: ${reads.mkString(" | ")}")
    }
  }

  test("the same join without skew keeps a plain sort-merge (no skew=true)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val left = spark.range(0, 400000)
        .select((col("id") % 512).as("k"),
          concat(lit("payload-"), col("id")).as("v"))
      val right = spark.range(0, 512)
        .select(col("id").as("k"), (col("id") * 7).as("w"))
      val joined = left.join(right, "k")
      assert(joined.queryExecution.toRdd.count() === 400000L)
      val fin = finalPlan(joined.queryExecution.executedPlan)
      val smj = deepCollect(fin) { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty && smj.forall(!_.isSkewJoin),
        s"uniform join unexpectedly flagged skewed:\n$fin")
    }
  }
}
