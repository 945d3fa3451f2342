package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd2

/** SCD2 type-2 maintenance (dbt snapshots): transition semantics on
  * golden micro-data, null-safe change detection, the dup-key data
  * error, schema discipline, and the current-slice-only plan shape.
  * The ModelGraph wiring is pinned in ModelGraphSpec/PipelineSpec; the
  * board-scale oracle is scd2_apply.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def toSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Option[String], Int, Option[Int], Boolean)]
      .collect().toSet

  test("init + two applies: change closes and reopens, unchanged " +
      "skips, absent survives, new key opens — and a NULL<->value " +
      "tracked flip IS a change (null-safe compare)") {
    val b1 = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("k", "attr")
    val s1 = Scd2.init(b1, lit(10))
    assert(toSet(s1) === Set((1L, Some("a"), 10, None, true),
      (2L, Some("b"), 10, None, true), (3L, None, 10, None, true)))
    // batch 2: k=1 changed, k=2 unchanged (skip), k=3 NULL->value
    // (change), k=4 new; k absent from nothing yet
    val b2 = Seq((1L, Some("a2")), (2L, Some("b")), (3L, Some("c")),
      (4L, Some("d"))).toDF("k", "attr")
    val s2 = Scd2.apply(s1, b2, Seq("k"), Seq("attr"), lit(20))
    assert(toSet(s2) === Set(
      (1L, Some("a"), 10, Some(20), false),
      (1L, Some("a2"), 20, None, true),
      (2L, Some("b"), 10, None, true),
      (3L, None, 10, Some(20), false), (3L, Some("c"), 20, None, true),
      (4L, Some("d"), 20, None, true)))
    // batch 3: k=1 absent (survives), k=3 value->NULL (change again)
    val b3 = Seq((2L, Some("b")), (3L, None), (4L, Some("d")))
      .toDF("k", "attr")
    val s3 = Scd2.apply(s2, b3, Seq("k"), Seq("attr"), lit(30))
    assert(toSet(s3) === Set(
      (1L, Some("a"), 10, Some(20), false),
      (1L, Some("a2"), 20, None, true),
      (2L, Some("b"), 10, None, true),
      (3L, None, 10, Some(20), false),
      (3L, Some("c"), 20, Some(30), false), (3L, None, 30, None, true),
      (4L, Some("d"), 20, None, true)))
  }

  test("a batch with duplicate natural keys raises " +
      "GRAFT_SCD2_DUPLICATE_KEY — two concurrent current versions is " +
      "the MERGE-grade data error") {
    val s1 = Scd2.init(Seq((1L, "a")).toDF("k", "attr"), lit(1))
    val bad = Seq((1L, "x"), (1L, "y")).toDF("k", "attr")
    val e = intercept[Exception] {
      Scd2.apply(s1, bad, Seq("k"), Seq("attr"), lit(2)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("GRAFT_SCD2_DUPLICATE_KEY"))
  }

  test("schema discipline: state must be exactly batch columns + the " +
      "SCD2 meta; a metadata collision in the batch is refused") {
    val s1 = Scd2.init(Seq((1L, "a")).toDF("k", "attr"), lit(1))
    val e = intercept[IllegalArgumentException] {
      Scd2.apply(s1, Seq((1L, "a", 0.0)).toDF("k", "attr", "extra"),
        Seq("k"), Seq("attr"), lit(2))
    }
    assert(e.getMessage.contains("state schema"))
    val e2 = intercept[IllegalArgumentException] {
      Scd2.init(Seq((1L, 5)).toDF("k", "valid_from"), lit(1))
    }
    assert(e2.getMessage.contains("collision"))
  }

  test("plan shape: history rows ride a UNION branch — only the " +
      "current slice joins the batch (one equi join; no window, no " +
      "sort of the history)") {
    val deep = Scd2.apply(
      Scd2.init(Seq((1L, "a"), (2L, "b")).toDF("k", "attr"), lit(1)),
      Seq((1L, "a2")).toDF("k", "attr"), Seq("k"), Seq("attr"), lit(2))
    val plan = deep.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val joins = plan.collect { case j: Join => j.joinType.sql }
    // the SCD2 join + (at most) the dup-key pre-count join-back; the
    // optimizer may fold the empty dup side, so 1 or 2 — never more,
    // and never a window/sort over the accumulated history
    assert(joins.count(_ == "FULL OUTER") === 1,
      s"expected one full-outer SCD2 join, got $joins")
    assert(joins.size <= 2, s"unexpected extra joins: $joins")
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      "SCD2 must not window the history")
  }
}
