package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Runtime kernel for [[ArrayShiftExpr]]: one allocation, two tight copy
  * loops — the reference's `copy_from_slice` pattern (`src/lib.rs:518-524`)
  * applied to a row-local array. Shared by interpreted eval and codegen.
  */
object ArrayShiftUtil {
  def shift(arr: ArrayData, k: Int, fill: Any, et: DataType): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val pad = math.min(k, n)
    var i = 0
    while (i < pad) { out(i) = fill; i += 1 }
    i = 0
    val kept = n - k
    while (i < kept) {
      out(i + k) = if (arr.isNullAt(i)) null else arr.get(i, et)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd truncating array shift: `out[i] = fill` for `i < k`, else
  * `in[i-k]`; the last k input elements are dropped (reference semantics,
  * `src/lib.rs:262-264`).
  *
  * Exists as the perf escape hatch over the built-in
  * `concat(array_repeat(fill,k), slice(arr,1,n-k))` chain
  * ([[graft.lagops.ArrayLag.shift]]), which allocates three intermediate
  * arrays per row where this allocates one. `k` and `fill` are node
  * parameters (not child expressions) so a NULL fill stays expressible —
  * a null child expression would null the whole result.
  *
  * Codegen emits a single static call, keeping the enclosing operator
  * inside whole-stage codegen.
  */
case class ArrayShiftExpr(child: Expression, k: Int, fill: Option[Any])
    extends UnaryExpression {
  require(k >= 0, s"lag must be non-negative, got $k")

  override def dataType: DataType = child.dataType match {
    case ArrayType(et, _) => ArrayType(et, containsNull = true)
    case other => throw new IllegalArgumentException(
      s"array_shift needs an array input, got $other")
  }

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any =
    ArrayShiftUtil.shift(input.asInstanceOf[ArrayData], k,
      fill.orNull, elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fillRef = ctx.addReferenceObj("fill", fill.orNull, "java.lang.Object")
    val etRef = ctx.addReferenceObj("et", elementType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayShiftUtil.shift($c, $k, $fillRef, $etRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayShiftExpr {
  /** Column-API entry: `array_shift(col, k, Some(0.0f))`. Spark 4 Columns
    * wrap ColumnNodes, not Expressions — convert through the classic
    * bridge both ways.
    */
  def apply(c: Column, k: Int, fill: Option[Any]): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      new ArrayShiftExpr(
        org.apache.spark.sql.GraftColumnBridge.toExpression(c), k, fill))
}
