package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helpers — top-level objects so the generated Java can call
  * them through their static forwarders.
  */
object VecOps {
  /** Dot product of two float vectors, accumulated in double (element
    * order preserved so results are bit-identical to a sequential sum).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** L2 norm, double accumulation. */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }

  /** [[distSq]] against a plain driver-side centroid array — the
    * columnar batch kernel's form, where the centroid literal is
    * unpacked once per task instead of once per row. Same
    * left-to-right accumulation, bit-identical to the ArrayData
    * overload.
    */
  def distSq(a: ArrayData, c: Array[Double]): Double = {
    val n = math.min(a.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val t = a.getFloat(i).toDouble - c(i)
      s += t * t
      i += 1
    }
    s
  }

  /** Squared L2 distance between a float vector and a DOUBLE vector
    * (a centroid), sequential left-to-right accumulation so DuckDB's
    * list_sum(list_transform(...)) replays it bit-for-bit.
    */
  def distSq(a: ArrayData, c: ArrayData): Double = {
    val n = math.min(a.numElements(), c.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val t = a.getFloat(i).toDouble - c.getDouble(i)
      s += t * t
      i += 1
    }
    s
  }

  /** djb2 (h = h*33 + c, 64-bit wrap) over SIGNED UTF-8 bytes, the
    * reference engine's reducer-routing hash — /root/reference/src/
    * omp_count_words.cpp:291-303 (`Hash` folds `char`, which is
    * signed there: a non-ASCII byte sign-extends before the add).
    * Folding code points instead diverges on any non-ASCII word —
    * the reference corpus contains some ('étape') and the parity
    * spec replays the signed-byte recurrence independently. Java's
    * wrapping long arithmetic matches C++ unsigned wraparound
    * bit-for-bit; bytes are already sign-extended by JVM widening.
    */
  def djb2(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 5381L
    var i = 0
    while (i < bytes.length) {
      h = h * 33L + bytes(i)
      i += 1
    }
    h
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 over the string's UTF-8 bytes — numerically
    * IDENTICAL to `conv(substr(md5(x), 1, 15), 16, 10)` (the first 15
    * hex chars are the first 15 nibbles = the first 8 digest bytes as
    * an unsigned big-endian long, shifted right 4), but with no hex
    * string materialized, no substring copy, no base-16 reparse. The
    * digest instance is thread-local: one allocation per task thread,
    * not per row.
    */
  def md5Prefix60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v >>> 4
  }
}

/** Native (whole-stage-codegen) dot product over two `array<float>`
  * columns. Preferred over `aggregate(zip_with(...))` in the KNN hot
  * path: stays inside WholeStageCodegen with a tight primitive loop
  * instead of per-element lambda evaluation.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.functions.VecOps.dot($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class FloatVecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any = VecOps.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance: `array<float>` column vs `array<double>`
  * centroid literal — the k-means assignment kernel.
  */
case class FloatVecDistSq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, c: Any): Any =
    VecOps.distSq(a.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, c) => s"graft.functions.VecOps.distSq($a, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 60-bit md5 prefix of a string column (see VecOps.md5Prefix60) —
  * the dedup/span family's window hash. Oracle parity is exact: the
  * DuckDB side keeps `('0x' || substr(md5(x), 1, 15))::BIGINT` /
  * `conv(substr(md5(x), 1, 15), 16, 10)` and this computes the same
  * 60-bit value from the digest bytes directly.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    VecOps.md5Prefix60(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.md5Prefix60($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** djb2 of a string column (see VecOps.djb2). */
case class Djb2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = VecOps.djb2(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.djb2($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
