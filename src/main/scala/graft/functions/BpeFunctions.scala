package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE (byte-pair-encoding) kernels — static helpers invoked from the
  * generated Java of the expressions below, mirroring the VecOps
  * pattern. The merge pass is the textbook left-to-right non-overlapping
  * scan: in "a a a" the merge (a,a) produces ["aa", "a"], never
  * ["a", "aa"], which is the order every reference BPE trainer uses.
  */
object BpeOps {

  /** One merge pass over a symbol array: each adjacent (l, r) becomes
    * the single symbol l+r, scanning left to right without overlap.
    */
  def mergeOnce(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur.equals(l) && syms.getUTF8String(i + 1).equals(r)) {
        out(k) = UTF8String.concat(l, r)
        i += 2
      } else {
        out(k) = cur
        i += 1
      }
      k += 1
    }
    if (k == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Full encode: split `word` into code-point symbols, then apply the
    * merge table (parallel lefts/rights arrays) in rank order. One
    * static call per word keeps the whole encode inside a single
    * codegen'd expression evaluation.
    */
  def encode(word: UTF8String, lefts: ArrayData, rights: ArrayData): ArrayData = {
    val str = word.toString
    var syms = new Array[AnyRef](str.codePointCount(0, str.length))
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      syms(k) = UTF8String.fromString(str.substring(i, i + w))
      i += w
      k += 1
    }
    var m = 0
    val nm = lefts.numElements()
    while (m < nm && syms.length >= 2) {
      syms = mergePass(syms, lefts.getUTF8String(m), rights.getUTF8String(m))
      m += 1
    }
    new GenericArrayData(syms)
  }

  private def mergePass(syms: Array[AnyRef], l: UTF8String, r: UTF8String): Array[AnyRef] = {
    val n = syms.length
    val out = new Array[AnyRef](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cur = syms(i).asInstanceOf[UTF8String]
      if (i + 1 < n && cur.equals(l) && syms(i + 1).asInstanceOf[UTF8String].equals(r)) {
        out(k) = UTF8String.concat(l, r)
        i += 2
      } else {
        out(k) = cur
        i += 1
      }
      k += 1
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }
}

/** One BPE merge pass over an `array<string>` symbol column — the
  * training loop's per-iteration rewrite, whole-stage-codegen'd.
  */
case class BpeMergeOnce(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(syms: Any, l: Any, r: Any): Any =
    BpeOps.mergeOnce(syms.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = graft.functions.BpeOps.mergeOnce($s, $l, $r);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Full BPE encode of a string column under a trained merge table
  * (lefts/rights as parallel `array<string>` literals).
  */
case class BpeEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(word: Any, l: Any, r: Any): Any =
    BpeOps.encode(word.asInstanceOf[UTF8String],
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, l, r) =>
      s"${ev.value} = graft.functions.BpeOps.encode($w, $l, $r);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
