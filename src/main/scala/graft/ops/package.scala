package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round, sum}
import org.apache.spark.sql.types.DecimalType

package object ops {
  /** Exact distributed SUM of a double expression: accumulate as decimal so
    * the result is independent of partition/combine order (double summation
    * is not associative — the same query can differ in the last ulp run to
    * run and engine to engine), then one deterministic round + cast back.
    * The 8-digit fractional headroom is far below the doubles' representation
    * error of the source's 2–4-decimal money values, so the decimal quantum
    * is exact in both Spark and the DuckDB oracle.
    */
  def exactSum(e: Column): Column = sum(e.cast(DecimalType(30, 8)))

  /** exactSum rounded to `scale` and returned as double. */
  def dsum(e: Column, scale: Int): Column =
    round(exactSum(e), scale).cast("double")
}
