package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProductExpr

/** SparkSessionExtensions entry point (SURVEY.md §4.3): makes the library's
  * native expressions first-class SQL functions —
  *
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions
  *   ... SELECT graft_dot(embedding, probe) FROM ...
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Deliberately NO custom optimizer Rule or Strategy ships here: every
  * operator in SURVEY.md §2 maps onto built-in logical operators, and the
  * optimizations a rule would re-implement already exist in Catalyst
  * (e.g. rank-filter top-k pruning is InferWindowGroupLimit, limit-through-
  * window is LimitPushDownThroughWindow). The extension surface is wired
  * and tested so a genuinely novel operator can plug in a Rule/Strategy
  * without new infrastructure.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {
  private[graft] val dotFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_dot expects 2 arguments, got ${children.length}")
      DotProductExpr(children.head, children(1))
    })

  /** Runtime registration for sessions built without the extension conf. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = dotFunction
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }
}
