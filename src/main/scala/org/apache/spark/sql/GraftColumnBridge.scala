package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 Columns wrap ColumnNodes; the Expression converters live in
  * `private[sql]` scope. This bridge re-exports the two conversions the
  * graft custom expressions need — the standard pattern for libraries
  * that add Catalyst expressions without forking Spark.
  */
object GraftColumnBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
