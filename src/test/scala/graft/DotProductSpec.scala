package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProductExpr

/** The native expression must agree bit-for-bit with the higher-order-
  * function fold it replaced (same ascending-index double accumulation),
  * and must run inside whole-stage codegen.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the zip_with+aggregate fold") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 20f - 10f),
      Seq.fill(64)(rnd.nextFloat() * 20f - 10f)))
    val df = rows.toDF("a", "b")
    val pairs = df.select(
      DotProductExpr.dot($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).as[(Double, Double)].collect()
    pairs.foreach { case (native, hof) =>
      assert(java.lang.Double.doubleToLongBits(native) ===
        java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("unequal lengths fold over the common prefix") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(2f, 3f))).toDF("a", "b")
    assert(df.select(DotProductExpr.dot($"a", $"b")).as[Double]
      .collect().head === 8.0)
  }

  test("runs inside whole-stage codegen") {
    // raw scan (no repartition): with an Exchange in the plan, AQE's plan
    // rendering hides the codegen stage markers even when codegen runs
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = df.select(DotProductExpr.dot($"embedding", $"embedding").as("d"))
    val norms = q.as[Double].collect() // execute so AQE finalizes the plan
    assert(norms.forall(_ > 0.0))
    // the projection carrying graft_dot must sit inside a codegen stage —
    // a doGenCode failure would silently fall back and drop the marker
    // codegen stages render as "*(n)" in the compact tree
    val projLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("graft_dot")).getOrElse("")
    assert(projLine.trim.startsWith("*("),
      s"graft_dot projection not inside a codegen stage: $projLine")
  }

  test("two dots inlined in one codegen scope do not collide") {
    // non-nullable (literal) inputs make nullSafeCodeGen inline WITHOUT
    // braces — fixed local names would be duplicate declarations and
    // silently fall back to interpreted
    val a = typedlit(Seq(1f, 2f)); val b = typedlit(Seq(3f, 4f))
    val c = typedlit(Seq(5f, 6f)); val e = typedlit(Seq(7f, 8f))
    val v = spark.range(1)
      .select((DotProductExpr.dot(a, b) + DotProductExpr.dot(c, e)).as("v"))
      .as[Double].collect().head
    assert(v === (11.0 + 83.0))
  }

  test("graft_dot is callable from SQL once registered") {
    graft.plans.GraftExtensions.register(spark)
    val v = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))"""
        .stripMargin).as[Double].collect().head
    assert(v === 11.0)
  }

  test("rejects non-float-array inputs at analysis") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(DotProductExpr.dot($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
