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

  /** EAGER ColumnNode→Expression conversion. `toExpression` wraps
    * non-trivial Columns in a lazy `ColumnNodeExpression`, which only the
    * Dataset API boundary converts — an expression injected through the
    * FunctionRegistry (the SQL front door) never crosses that boundary
    * and would reach codegen unevaluable. This walks the node tree now,
    * yielding plain Catalyst nodes (UnresolvedFunction children resolve
    * in the analyzer's fixed point like any parsed SQL).
    */
  def toExpressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
