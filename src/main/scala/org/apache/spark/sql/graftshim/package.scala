package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access shim: `classic.ExpressionUtils` (Column <-> Expression)
  * is private[sql] in Spark 4, so third-party Catalyst expressions need a
  * bridge compiled into an org.apache.spark.sql subpackage — the standard
  * pattern for Spark extension libraries. Nothing else lives here.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
