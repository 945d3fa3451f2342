package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the vector-similarity hot path: the dot
  * product of two float arrays, accumulated in double in ascending index
  * order — the SAME sequential fold as the `zip_with`+`aggregate`
  * formulation (and the DuckDB oracle), so results are bit-identical.
  *
  * Why a custom Expression (SURVEY.md §2.J U7): higher-order-function
  * lambdas are interpreted per element and break whole-stage codegen around
  * the call site; `doGenCode` below emits a tight primitive loop that lives
  * INSIDE the generated stage — no per-element virtual calls, no object
  * churn. This is preference order (b) from the builder brief: a scalar
  * Expression, not a new plan node, so Catalyst still sees a plain
  * deterministic function it can prune/push/reorder around.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: with non-nullable inputs nullSafeCodeGen inlines this
      // WITHOUT braces, so two dots in one generated scope would otherwise
      // collide on fixed local names (janino duplicate-declaration ->
      // silent interpreted fallback).
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Column-level entry point — wraps the expression directly, no registry
    * or session state needed. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.column(DotProductExpr(
      org.apache.spark.sql.graftshim.expression(a),
      org.apache.spark.sql.graftshim.expression(b)))
}
