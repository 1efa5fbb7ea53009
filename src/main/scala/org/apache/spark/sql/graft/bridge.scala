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

  /** Register a temp SQL function backed by a raw Expression builder on a
    * live session (FunctionRegistry is `private[sql]`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Inject the same function through SparkSessionExtensions (the
    * `spark.sql.extensions` path). */
  def injectFunction(ext: org.apache.spark.sql.SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft", name), builder))
  }
}
