package graft

import org.apache.spark.sql.functions._

import graft.operators.Tokenizer

/** Verifies the distributed BPE trainer against an independent plain
  * -Scala reference implementation (the textbook algorithm over an
  * in-memory word-frequency map) on the sf0.001 corpus.
  */
class TokenizerSpec extends GraftSuite {

  /** Reference BPE: merge-pair argmax with (cnt DESC, left ASC, right
    * ASC) tiebreak, left-to-right non-overlapping merge application.
    * Deliberately written list-functionally, nothing shared with the
    * distributed implementation.
    */
  private def referenceBpe(
      freqs: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    def mergeWord(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r => (a + b) :: mergeWord(rest, l, r)
        case a :: rest => a :: mergeWord(rest, l, r)
        case Nil => Nil
      }
    var dict = freqs.toSeq.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var stop = false
    while (i < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- dict; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        dict = dict.map { case (syms, f) => (mergeWord(syms, l, r), f) }
        i += 1
      }
    }
    out.toSeq
  }

  private def referenceEncode(
      word: String, merges: Seq[(String, String)]): List[String] = {
    def mergeWord(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r => (a + b) :: mergeWord(rest, l, r)
        case a :: rest => a :: mergeWord(rest, l, r)
        case Nil => Nil
      }
    merges.foldLeft(word.map(_.toString).toList) {
      case (syms, (l, r)) => mergeWord(syms, l, r)
    }
  }

  private lazy val freqs: Map[String, Long] =
    Tokenizer.wordFreq(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("trainBpe reproduces the reference merge sequence exactly") {
    val got = Tokenizer.trainBpe(Tables.documents(spark, sf), 16)
      .map(m => (m.left, m.right, m.cnt))
    val want = referenceBpe(freqs, 16)
    assert(got == want)
  }

  test("bpe_encode matches the reference encoder on every unique word") {
    val merges = Tokenizer.trainBpe(Tables.documents(spark, sf), 16)
    val pairs = merges.map(m => (m.left, m.right))
    val lefts = typedLit(merges.map(_.left))
    val rights = typedLit(merges.map(_.right))
    val got = Tokenizer.wordFreq(Tables.documents(spark, sf))
      .select(col("word"),
        graft.functions.bpe_encode(col("word"), lefts, rights).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for ((w, toks) <- got)
      assert(toks == referenceEncode(w, pairs), s"word '$w'")
    assert(got.nonEmpty)
  }

  test("q_bpe_pairs equals the reference iteration-0 pair counts") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freqs if w.length >= 2; i <- 0 until w.length - 1)
      counts(w.substring(i, i + 2)) = counts.getOrElse(w.substring(i, i + 2), 0L) + f
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    val got = Tokenizer.qBpePairs(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("q_bpe_tokenize conserves tokens (merges only ever shrink counts)") {
    val df = Tokenizer.qBpeTokenize(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    // every doc: 1 <= bpe tokens per word <= max word length
    assert(df.filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
    val bad = df.filter(col("tokens_per_word") < 1.0).count()
    assert(bad == 0)
    df.unpersist()
  }
}
