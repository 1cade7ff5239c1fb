package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{toColumn => column, toExpression => expression}

/** Column-facing façade over graft's native Catalyst expressions.
  * These run inside whole-stage codegen (each has `doGenCode`), unlike
  * Scala UDFs or higher-order-function lambdas.
  */
package object functions {
  /** Dot product of two `array<float>` columns (double accumulation). */
  def vec_dot(a: Column, b: Column): Column =
    column(FloatVecDot(expression(a), expression(b)))

  /** L2 norm of an `array<float>` column. */
  def vec_norm(a: Column): Column =
    column(FloatVecNorm(expression(a)))

  /** Cosine similarity of two `array<float>` columns. */
  def vec_cosine(a: Column, b: Column): Column =
    column(FloatVecCosine(expression(a), expression(b)))

  /** djb2 hash of a string column — the reference engine's reducer
    * routing hash (omp_count_words.cpp:291-303).
    */
  def djb2(c: Column): Column =
    column(Djb2(expression(c)))

  /** 60-bit md5 prefix of a string column — the dedup/span window
    * hash, equal to `conv(substr(md5(x), 1, 15), 16, 10)`.
    */
  def md5_prefix60(c: Column): Column =
    column(Md5Prefix60(expression(c)))

  /** Squared L2 distance of an `array<float>` column from an
    * `array<double>` centroid literal.
    */
  def vec_dist_sq(a: Column, c: Column): Column =
    column(FloatVecDistSq(expression(a), expression(c)))

  /** A41 build side: the k bloom bit positions of a long key in an
    * `mBits`-bit per-file filter. */
  def bloom_positions(key: Column, mBits: Column): Column =
    column(BloomPositionsExpr(expression(key), expression(mBits)))

  /** A41 probe side: row-wise membership against an `array<long>`
    * bitset column (one filter per file). */
  def bloom_row_might_contain(bits: Column, key: Column): Column =
    column(BloomRowMightContain(expression(bits), expression(key)))

  /** 62-bit Morton (Z-order) code of two BIGINT columns. */
  def z_value(x: Column, y: Column): Column =
    column(ZValue(expression(x), expression(y)))

  /** One BPE merge pass over an `array<string>` symbol column. */
  def bpe_merge(syms: Column, l: Column, r: Column): Column =
    column(BpeMergeOnce(expression(syms), expression(l), expression(r)))

  /** Full BPE encode of a string column under a merge table given as
    * parallel lefts/rights `array<string>` literals.
    */
  def bpe_encode(word: Column, lefts: Column, rights: Column): Column =
    column(BpeEncode(expression(word), expression(lefts), expression(rights)))

  /** Bloom-filter membership probe of a BIGINT key column against a
    * bitset built by `BloomJoin.buildBloom` (k hash probes, codegen'd).
    */
  def bloom_might_contain(key: Column, bits: Array[Long], k: Int): Column =
    column(BloomMightContain(expression(key.cast("long")), bits, k))
}
