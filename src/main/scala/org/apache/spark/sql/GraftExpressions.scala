package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 routes Column construction through ColumnNodes and keeps the
  * classic converters `private[sql]`; extension libraries bridge from
  * inside the package — the standard pattern for custom expressions. */
object GraftExpressions {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
