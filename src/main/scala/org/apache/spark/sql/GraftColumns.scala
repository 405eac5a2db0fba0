package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters so graft's
  * native codegen expressions ([[graft.functions.DotProduct]]) can be used
  * as plain Columns without registering SQL functions or controlling the
  * session via SparkSessionExtensions — the standard extension-package
  * pattern for libraries shipping custom Catalyst expressions. */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function into a live session's `private[sql]` registry —
    * the in-session counterpart of `SparkSessionExtensions.injectFunction`
    * for sessions that already exist (tests, notebooks, services). */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
