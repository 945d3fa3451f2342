package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access shim: `classic.ExpressionUtils` (Column <-> Expression)
  * and `classic.Dataset.ofRows` (LogicalPlan -> DataFrame, used for MERGE
  * subquery sources) are private[sql] in Spark 4, so third-party Catalyst
  * extensions need a bridge compiled into an org.apache.spark.sql
  * subpackage — the standard pattern for Spark extension libraries.
  * Nothing else lives here.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
