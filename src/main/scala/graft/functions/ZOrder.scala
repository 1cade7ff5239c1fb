package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving — the multi-dimensional clustering key
  * behind lakehouse OPTIMIZE ZORDER BY: sorting on z keeps rows close
  * in BOTH dimensions close in the file layout, so parquet min/max
  * row-group pruning works for predicates on either column.
  *
  * Coordinates are taken modulo 2^31 (the z of bit b of x lands at
  * 2b, of y at 2b+1 — top result bit 62, so z is always a positive
  * BIGINT in both engines; no sign-bit divergence). The magic-number
  * bit-spread is the textbook O(log w) form, replayed step-for-step by
  * the DuckDB oracle.
  */
object Morton {
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

/** z_value(x, y): 62-bit Morton code of two BIGINT columns. */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    Morton.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Morton.interleave($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
