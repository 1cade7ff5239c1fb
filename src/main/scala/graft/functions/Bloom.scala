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

  /** Hash count of the A41 per-file index (fixed; the per-file m
    * scales with row count instead). */
  val NumHashes = 5

  /** Build-side positions as catalyst array data (codegen helper). */
  def positionsArray(x: Long, m: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Int](NumHashes)
    var i = 0
    while (i < NumHashes) { out(i) = pos(x, i, m); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Row-wise probe over an array<long> bitset column (codegen helper). */
  def mightContainArray(bits: org.apache.spark.sql.catalyst.util.ArrayData,
      x: Long): Boolean = {
    val m = bits.numElements() * 64
    var i = 0
    while (i < NumHashes) {
      val p = pos(x, i, m)
      if ((bits.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

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

/** The k bit positions of `key` in an `mBits`-bit filter, as an
  * array<int> — the BUILD side of the per-file bloom index (A41):
  * positions explode → collect_set per file → the driver folds them
  * into the bitset. `mBits` is a column so each FILE can size its
  * filter to its own row count (bits-per-row × rows), which is what
  * keeps the false-positive rate flat across skewed file sizes.
  */
case class BloomPositionsExpr(key: Expression, mBits: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private val k = BloomKernel.NumHashes
  override def left: Expression = key
  override def right: Expression = mBits
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(x: Any, m: Any): Any =
    BloomKernel.positionsArray(x.asInstanceOf[Long], m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, m) =>
      s"graft.functions.BloomKernel.positionsArray($x, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(key = l, mBits = r)
}

/** Row-wise probe for the per-file bloom index: `bits` is an
  * array<long> COLUMN (one filter per row = per file), `key` the
  * probed value — so the "which files might hold key x" question is a
  * distributed filter over the index relation, and only the few
  * surviving file names are ever collected. No false negatives.
  */
case class BloomRowMightContain(bits: Expression, key: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = bits
  override def right: Expression = key
  override def dataType: DataType = BooleanType
  override def nullSafeEval(b: Any, x: Any): Any =
    BloomKernel.mightContainArray(
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, x) =>
      s"graft.functions.BloomKernel.mightContainArray($b, $x)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(bits = l, key = r)
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
