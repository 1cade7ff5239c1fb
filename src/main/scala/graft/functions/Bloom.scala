package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom-filter kernel shared by the build side (bit positions) and the
  * probe side (membership). All hashing is the splitmix64 finalizer
  * over (key + i·C) — deterministic, seed-free, and cheap enough to
  * stay inside whole-stage codegen on the probe path.
  */
object BloomKernel {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bit position of hash i of key x in an m-bit filter. */
  def pos(x: Long, i: Int, m: Int): Int =
    ((mix(x + i.toLong * 0xc2b2ae3d27d4eb4fL) & Long.MaxValue) % m).toInt

  /** Probe: true iff all k probe bits are set (no false negatives). */
  def mightContain(bits: Array[Long], x: Long, k: Int): Boolean = {
    val m = bits.length * 64
    var i = 0
    while (i < k) {
      val p = pos(x, i, m)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** bloom_might_contain(key): membership probe against a bitset literal
  * built by [[graft.operators.BloomJoin.buildBloom]]. The bitset rides
  * into generated code as a reference object — one array load + k
  * mixes per row, no shuffle, no broadcast-hash-table memory.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(x: Any): Any =
    BloomKernel.mightContain(bits, x.asInstanceOf[Long], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      x => s"graft.functions.BloomKernel.mightContain($bitsRef, $x, $k)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
