package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (UDTF surface, SURVEY.md §2.J): emit
  * every word n-gram of a token array as its own row, with its 0-based
  * position. The built-in generators (`explode`, `posexplode`, `inline`)
  * can only unnest EXISTING collections, so the n-gram expansion otherwise
  * needs a `transform(sequence(...))` higher-order projection first — which
  * re-inlines the token-array child once per lambda element after
  * ProjectCollapse and falls out of whole-stage codegen (the round-2
  * HOF trap, see TextSim.shingleRows). A Generator builds each n-gram
  * once, inside `GenerateExec`, straight off the ArrayData — no
  * intermediate array-of-arrays is materialized per row.
  *
  * Generators are evaluated by `GenerateExec` via this `eval` (codegen for
  * generators covers only the built-ins), hence CodegenFallback; the
  * PROJECTIONS around it stay inside whole-stage codegen because
  * GenerateExec supports codegen of its child/output path.
  *
  * Scale: per-row fan-out is (len - n + 1) rows — linear in corpus token
  * count, the same growth as `posexplode(toks)`; nothing driver-side.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngrams expects array<string> and n >= 1, got ${child.dataType.sql}, n=$n")
  }

  override def elementSchema: StructType = StructType(
    StructField("pos", IntegerType, nullable = false) ::
      StructField("ngram", StringType, nullable = false) :: Nil)

  override def prettyName: String = "ngrams"

  private lazy val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val m = arr.numElements() - n + 1
      if (m <= 0) Iterator.empty
      else (0 until m).iterator.map { i =>
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        InternalRow(i, UTF8String.concatWs(sep, parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
}

object NGramGenerator {
  /** Column-level entry point: select(col("id"), ngrams(toks, 3)) expands
    * to (id, pos, ngram) rows via GenerateExec, exactly like posexplode. */
  def ngrams(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.column(NGramGenerator(
      org.apache.spark.sql.graftshim.expression(tokens), n))
}
