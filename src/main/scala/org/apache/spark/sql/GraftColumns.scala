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
}
