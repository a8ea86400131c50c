package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** An optimizer fence: evaluates EXACTLY as its child (same codegen, no
  * per-row cost) but reports `deterministic = false`, so Catalyst will
  * not move it — no predicate pushdown, no alias substitution into a
  * scan's DataFilters, no constant folding.
  *
  * Why it exists: a filter on an expensive derived column (e.g.
  * corpus_clean's quality gate) placed right after a
  * [[graft.util.Par.spread]] repartition gets substituted + pushed below
  * the exchange into the scan stage; on a one-split local source that
  * serializes the whole evaluation onto one core (measured 4.9s of the
  * gate at 10×-sf0.1). Conjunct-level guards don't help — the pushdown
  * rule pushes each deterministic conjunct separately — so the fence
  * must wrap the predicate itself. At scale the source has many splits,
  * [[graft.util.Par.spread]] is a no-op, and scan + filter share one
  * whole-stage-codegen pass either way, so fencing costs nothing there.
  */
case class PlanFenceExpr(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): PlanFenceExpr = copy(child = newChild)
}

object PlanFence {
  /** Wrap a Column so the optimizer treats it as immovable. */
  def fence(c: Column): Column =
    GraftColumnBridge.toColumn(PlanFenceExpr(GraftColumnBridge.toExpression(c)))
}
