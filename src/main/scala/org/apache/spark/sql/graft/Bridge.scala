package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` onto `ColumnNode`s; the Expression<->Column
  * bridge lives in `private[sql]` `classic.ExpressionUtils`. This shim —
  * the standard pattern for Catalyst-extension libraries — re-exports
  * just the two converters graft needs.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
