package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 62-bit Morton (Z-order) key of two
  * non-negative integer columns — bit i of each input lands at output
  * bits 2i+1 / 2i, so sorting by the key clusters rows that are close
  * in BOTH dimensions. This is the multi-column data-layout lever:
  * a 100 TB table written in Z-key order gives every file/row-group a
  * narrow min/max rectangle in (a, b) space, so a predicate on EITHER
  * column (or both) skips most files — where single-column sorting
  * only serves predicates on that column. ZOrderSpec measures the
  * effect: chunks of a z-sorted layout span far fewer coarse quadrant
  * cells than chunks of a one-column-sorted layout.
  *
  * Inputs are masked to their low 31 bits (the key must fit one
  * signed long); callers range-check or pre-scale — the gate query
  * documents the discipline by masking in BOTH engines. NULL in ⇒
  * NULL out. The spread uses the standard magic-number doubling
  * (shift-or-mask cascade), one branch-free pass per side.
  *
  * Reference counterpart: none (SURVEY.md §2.3 extension surface).
  */
case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType

  // integral arguments coerce to bigint like Spark built-ins, so SQL
  // callers can write zorder2(1, 2) without explicit CASTs
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderInterleave {

  /** Low 31 bits participate; the interleaved key occupies bits 0..61. */
  val Mask31: Long = (1L << 31) - 1

  /** Spread the low 31 bits of x to the even bit positions 0,2,..,60. */
  private def spread(x0: Long): Long = {
    var x = x0 & Mask31
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton key: bit i of `a` at output bit 2i+1, bit i of `b` at 2i.
    * Exposed for codegen (called from generated Java). */
  def interleave(a: Long, b: Long): Long =
    (spread(a) << 1) | spread(b)

  /** Column wrapper. */
  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderInterleave(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
