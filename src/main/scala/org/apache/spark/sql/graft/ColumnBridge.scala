package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so graft
  * can expose custom Catalyst expressions as user-facing `Column`s (the same
  * technique every Spark extension library uses — the public API only added
  * `Column.apply(ColumnNode)` in 4.x and classic Expressions need
  * ExpressionUtils).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
