package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made Column wrap a ColumnNode (for
  * Connect parity) and gated the Expression conversions behind
  * `private[sql]`; this shim re-exports just those two conversions for
  * graft's custom codegen expressions. No other internals are touched.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
