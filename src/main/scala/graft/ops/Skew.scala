package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helper (builder brief: "skewed keys → salting or AQE
  * skew-join"). AQE's skew-join split handles most sort-merge skew
  * automatically at runtime; explicit salting remains necessary when the
  * skewed side feeds an AGGREGATION on the hot key, or when a deterministic
  * layout is needed (bucketed tables, AQE off).
  */
object Skew {

  /** Inner-join `fact` to `dim` on `key`, salted: each dim row is
    * replicated `salt` times and each fact row picks one replica via a
    * deterministic hash of its whole row, so one hot key spreads over
    * `salt` reducers. Result is exactly the plain inner join (dim keys
    * assumed unique — replicas never double-match a fact row).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int): DataFrame = {
    val factCols = fact.columns.map(col)
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(factCols: _*), lit(salt)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
