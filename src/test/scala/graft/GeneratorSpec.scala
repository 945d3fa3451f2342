package graft

import org.apache.spark.sql.functions._
import graft.functions.NGramGenerator

/** NGramGenerator (native Generator / UDTF surface) unit invariants beyond
  * the text_ngram_gen oracle: exact row shapes on hand-sized inputs, edge
  * cases the corpus may not exercise (len == n, len < n, null array), and
  * the physical plan (GenerateExec, not a HOF projection).
  */
class GeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def gen(texts: Seq[String], n: Int) =
    texts.toDF("text")
      .select(NGramGenerator.ngrams(split(col("text"), " "), n))
      .as[(Int, String)].collect().toSeq

  test("trigrams of a 5-token doc: 3 rows, sliding positions") {
    assert(gen(Seq("a b c d e"), 3) ==
      Seq((0, "a b c"), (1, "b c d"), (2, "c d e")))
  }

  test("len == n yields exactly one gram; len < n yields none") {
    assert(gen(Seq("x y z"), 3) == Seq((0, "x y z")))
    assert(gen(Seq("x y"), 3).isEmpty)
    assert(gen(Seq(""), 2).isEmpty) // split("") -> [""], 1 < 2
  }

  test("unigrams degenerate to posexplode") {
    val got = gen(Seq("p q"), 1)
    assert(got == Seq((0, "p"), (1, "q")))
  }

  test("null token array generates no rows (not a null row)") {
    val got = Seq(("a b c", true), ("ignored", false)).toDF("text", "keep")
      .select(col("keep"),
        NGramGenerator.ngrams(
          when(col("keep"), split(col("text"), " ")), 2))
      .collect()
    assert(got.length == 2) // only the non-null row's two bigrams
    assert(got.forall(_.getBoolean(0)))
  }

  test("plans through GenerateExec") {
    val df = Seq("a b c d").toDF("text")
      .select(NGramGenerator.ngrams(split(col("text"), " "), 2))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan.take(800))
  }
}
