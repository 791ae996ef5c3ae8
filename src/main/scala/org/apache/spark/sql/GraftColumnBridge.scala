package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for graft's native expressions.
  *
  * Spark 4 wraps Columns in ColumnNodes and keeps the converters
  * `private[sql]`; placing this one-file accessor inside the sql package is
  * the established pattern third-party expression libraries use to lift a
  * custom Expression into the public Column API without forking Spark.
  * Nothing else in this repository lives outside the `graft` namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Register a function triple on an ALREADY-RUNNING session (the
    * extensions path only applies at session build time). */
  def registerFunction(
      spark: SparkSession,
      reg: (catalyst.FunctionIdentifier,
            catalyst.expressions.ExpressionInfo,
            Seq[Expression] => Expression)): Unit =
    spark.sessionState.functionRegistry.registerFunction(reg._1, reg._2, reg._3)
}
