package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** r18 verdict task 5: the engine carries ~30 deliberate GLOBAL
  * (un-partitioned) windows — share-of-total divisions, cumulative
  * day-level sums, rank-over-aggregate shapes. Each is safe because its
  * input frame is already reduced by an aggregation (≤ |groups| rows), a
  * limit, or a literal relation BEFORE the single-partition WindowExec
  * runs. A global window over a ROW-LEVEL frame, by contrast, is the
  * classic single-reducer scale bug ("No Partition Defined for Window"
  * on corpus-sized input), and until now nothing stopped one landing
  * silently. This spec walks every declared query's analyzed plan and
  * FAILS if any global window's subtree can reach a row-level leaf
  * without passing through an Aggregate/Limit — turning the r18 claim
  * ("all global windows sit on ≤|groups|-row aggregates") into a pinned
  * assertion.
  *
  * Leaf classification: LocalRelation/OneRowRelation are bounded
  * (literal rows); file scans and LogicalRDDs (checkpointed frames) are
  * NOT — a checkpoint of a corpus-sized frame must not launder a global
  * window past this gate. If a future query legitimately windows over a
  * checkpointed aggregate, restructure it to window first or whitelist
  * it here with a documented row bound.
  */
class GlobalWindowSpec extends SparkSpec {

  /** True when every path from `p` to a leaf passes through a
    * row-reducing node before any unbounded source. */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case l if l.children.isEmpty => l match {
      case _: LocalRelation => true
      case _: OneRowRelation => true
      case _ => false
    }
    case other => other.children.forall(bounded)
  }

  /** (windowExprs, offending) for every global window in `df`'s analyzed
    * plan whose input is not provably bounded. */
  private def unboundedGlobalWindows(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
        w.windowExpressions.map(_.name).mkString("[", ",", "]")
    }

  test("no declared query runs a global (un-partitioned) window over a " +
      "row-level frame — every one sits behind an aggregate or limit") {
    spark.catalog.clearCache()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (n, fn) =>
        val bad = unboundedGlobalWindows(fn(spark, sf0001))
        spark.catalog.clearCache()
        bad.map(b => s"$n: global window $b over an unbounded frame")
    }
    assert(offenders.isEmpty,
      s"""row-level global windows found (single-reducer at scale):
         |${offenders.mkString("\n")}
         |Partition the window, or reduce the frame with an aggregate
         |first (see GlobalWindowSpec scaladoc).""".stripMargin)
  }

  test("the gate has teeth: a deliberate row-level global window is " +
      "flagged, and the same window behind an aggregate is not") {
    val docs = Tables.documents(spark, sf0001)
    val bad = docs.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("doc_id")))
    assert(unboundedGlobalWindows(bad).nonEmpty,
      "control broken: a global window directly over the corpus scan " +
        "must be flagged")
    val good = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("n"), asc("lang"))))
    assert(unboundedGlobalWindows(good).isEmpty,
      "control broken: a global window over a groupBy aggregate must " +
        "pass")
  }
}
