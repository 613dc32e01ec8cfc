package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder2(a, b)`: Morton (Z-order) interleave of the low 31 bits of
  * two non-negative longs — bit i of `a` lands at position 2i, bit i of
  * `b` at 2i+1. Sorting by the result clusters rows so that ANY
  * contiguous z-range is roughly a rectangle in (a, b) space: a file
  * layout sorted this way keeps BOTH columns' per-file min/max stats
  * narrow, so parquet row-group/file skipping works for predicates on
  * either column — the multi-column analogue of q55's single-key
  * sorted layout, and the standard technique (Delta/Iceberg `ZORDER
  * BY`) for 100 TB fact tables queried along two independent
  * dimensions. Callers normalize dimensions to comparable bit widths
  * first ([[graft.ops.ScaleJoins.zValue16]]) — raw interleave of
  * differently-scaled keys degenerates to ordering by the wider one.
  *
  * Pure bit arithmetic (five spread steps per operand), codegen'd.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 31 bits of x to the even bit positions (magic-mask
    * Morton spreading). */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
