package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object ZOrderImpl {
  /** Spread the low 31 bits of v to the even bit positions of a long
    * (the classic Morton-code magic-mask dilation — constant time, no
    * per-bit loop). 31 bits, not 32: bit 31 of the odd-position
    * dimension would land on the sign bit and break key monotonicity
    * (negative Z-keys would range-partition first). Callers clustering
    * wider domains bucket them below 2^31 first.
    */
  def dilate(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of the low 31 bits of (x, y): x on even bit positions,
    * y on odd. Monotone in each dimension within the other's bit
    * prefix, which is what gives every Z-contiguous file a bounded
    * min/max range in BOTH columns.
    */
  def interleave(x: Long, y: Long): Long =
    dilate(x) | (dilate(y) << 1)
}

/** Native Z-order (Morton) key over two non-negative integral columns,
  * each truncated to its low 31 bits. Codegen'd: stays inside
  * whole-stage codegen when used as a repartition/sort key over a full
  * table — exactly the hot path a layout rewrite runs on.
  */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects two BIGINT columns, got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderImpl.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderImpl.interleave($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  def zorderKey(x: Column, y: Column): Column =
    Cols.column(ZOrderKey(Cols.expression(x), Cols.expression(y)))
}
