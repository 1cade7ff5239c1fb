package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{bpe_encode, bpe_merge}

/** Distributed BPE tokenizer training (SURVEY.md §2.6 extension,
  * F11-F13) — the classic byte-pair-encoding loop re-expressed as Spark
  * aggregates, the way a 100 TB pretraining pipeline would train its
  * vocabulary.
  *
  * Scale design: training never touches the corpus per iteration — it
  * runs on the WORD-FREQUENCY DICTIONARY (one corpus-wide aggregate up
  * front, after which dict size is the vocabulary of unique word forms,
  * orders of magnitude smaller than the corpus). Each merge iteration is
  * one distributed pair-count aggregate over the dict plus a 1-row
  * driver action to pick the argmax pair — the same
  * model-update-as-driver-action pattern as MLlib's iterative
  * algorithms and this repo's LSH hyperplanes; everything per-row runs
  * through the native codegen'd [[graft.functions.BpeOps]] kernels (no
  * UDFs, no interpreted lambdas).
  */
object Tokenizer {

  val NumMerges = 16

  /** Word-frequency dictionary — the corpus aggregate all of BPE rides. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs
      .selectExpr(s"${TextAnalysis.wordsExpr} AS w")
      .select(explode(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private val wordFreqCte: String =
    """WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |u AS (SELECT unnest(w) AS word FROM t),
      |f AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM u GROUP BY word)""".stripMargin

  // F11 — initial BPE pair statistics: adjacent character-pair counts
  // over the word dict, weighted by word frequency. This is iteration 0
  // of the trainer, surfaced as an oracled query (the full loop's
  // argmax sequence is spec-verified against an independent reference
  // implementation — the merge rewrite isn't expressible in one SQL
  // statement). Deterministic top-50 via the (cnt DESC, pair ASC)
  // total order.
  def qBpePairs(s: SparkSession, d: String): DataFrame =
    wordFreq(Tables.documents(s, d))
      .where(length(col("word")) >= 2)
      .select(col("freq"), col("word"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("pos"))
      .select(expr("substring(word, pos, 2)").as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(50)
      .select("pair", "cnt")

  val qBpePairsSql: String =
    wordFreqCte +
      """,
        |p AS (SELECT substr(word, i, 2) AS pair, freq
        |  FROM f, unnest(range(1, length(word))) AS r(i)
        |  WHERE length(word) >= 2)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50""".stripMargin

  /** One trained merge: rank order, the pair, and its count at
    * selection time. */
  final case class Merge(rank: Int, left: String, right: String, cnt: Long)

  /** F12 — the BPE training loop. Each iteration: (1) one distributed
    * pair-count aggregate over the symbol dict (adjacent pairs built
    * array-side from two shifted slices — codegen, same shape as the
    * dedup shingle builder); (2) a 1-row collect of the argmax pair
    * (deterministic tiebreak cnt DESC, left ASC, right ASC); (3) a
    * codegen'd merge pass rewriting the symbol arrays. localCheckpoint
    * per iteration keeps lineage flat, exactly like the CC loop.
    */
  /** One trained merge table per (corpus plan, numMerges), mirroring
    * the dedup family's shingle-index registry: the model is
    * deterministic, tiny (numMerges rows), and shared by every
    * tokenizer query over the same corpus — q_bpe_tokenize reuses
    * q_bpe_merges' training instead of re-running 16 aggregate+argmax
    * rounds. Driver-side state only.
    */
  private val trained = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), Seq[Merge]]

  def trainBpe(docs: DataFrame, numMerges: Int = NumMerges): Seq[Merge] = synchronized {
    val key = (docs.queryExecution.analyzed.canonicalized, numMerges)
    trained.getOrElseUpdate(key, runTraining(docs, numMerges))
  }

  private def runTraining(docs: DataFrame, numMerges: Int): Seq[Merge] = {
    var dict = wordFreq(docs)
      .select(col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var rank = 0
    while (rank < numMerges && !done) {
      val n1 = size(col("syms")) - 1
      val top = dict
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), n1).as("a"),
          slice(col("syms"), lit(2), n1).as("b"))).as("z"))
        .groupBy(col("z.a").as("l"), col("z.b").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect() // 1 row: the model update (argmax pair)
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, c)
        dict = dict
          .select(col("freq"), bpe_merge(col("syms"), lit(l), lit(r)).as("syms"))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }

  /** The trained merge table as a DataFrame (rank, left, right, merged,
    * cnt). Driver-side rows: the model itself is tiny (numMerges rows)
    * — it's the training that is distributed. rows-only driver check;
    * TokenizerSpec asserts the exact sequence against an independent
    * in-memory reference implementation.
    */
  def qBpeMerges(s: SparkSession, d: String): DataFrame = {
    val m = trainBpe(Tables.documents(s, d))
    import s.implicits._
    m.map(x => (x.rank.toLong, x.left, x.right, x.left + x.right, x.cnt))
      .toDF("rank", "left", "right", "merged", "cnt")
  }

  /** F13 — tokenize the corpus under the trained merges. Encoding runs
    * ONCE PER UNIQUE WORD (the dict again), then a token-keyed join
    * fans the per-word token counts back onto the corpus — at 100 TB
    * the encode cost is O(vocab), not O(corpus tokens), and the join
    * shuffles (word, n) pairs, never text.
    */
  def qBpeTokenize(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = trainBpe(docs)
    val lefts = typedLit(merges.map(_.left))
    val rights = typedLit(merges.map(_.right))
    val wordTok = wordFreq(docs)
      .select(col("word"),
        size(bpe_encode(col("word"), lefts, rights)).cast("long").as("n_bpe"))
    docs
      .selectExpr("doc_id", s"${TextAnalysis.wordsExpr} AS w")
      .select(col("doc_id"), explode(col("w")).as("word"))
      .join(wordTok, "word")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_bpe").as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 4)
          .as("tokens_per_word"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_pairs" -> qBpePairs,
    "q_bpe_merges" -> qBpeMerges,
    "q_bpe_tokenize" -> qBpeTokenize)

  /** F12/F13 oracles (r11, closing the last `no_oracle` rows): the
    * training loop's argmax sequence is not expressible in one SQL
    * statement, so the oracle SELECTs PRECOMPUTED ground truth — the
    * committed `oracles/bpe_*_sf001.parquet`, generated by the
    * independent Python reference implementation in
    * `tools/gen_bpe_oracle.py` over the sf0.01 documents table (the
    * same reference-ground-truth move as the A12 parity file; the
    * fractional `tokens_per_word` is derived IN SQL from the stored
    * integers, mirroring the Spark-side `round(x, 4)`). The files are
    * sf0.01-specific — the driver's correctness gate scale. */
  /** Repo-relative oracle parquet path (r12, advice fix): resolved at
    * ORACLE-CONSTRUCTION time from `graft.repo.root` (set it when the
    * harness runs DuckDB from another cwd) falling back to the working
    * directory — the committed `oracles/` dir travels with the
    * checkout, so baking an absolute `/root/repo` would break any
    * other clone location. */
  private def oracleParquet(name: String): String =
    java.nio.file.Paths.get(
      sys.props.getOrElse("graft.repo.root", sys.env.getOrElse(
        "GRAFT_REPO_ROOT", ".")), "oracles", name)
      .toAbsolutePath.normalize.toString.replace("'", "''")

  def oracles: Map[String, String] = Map(
    "q_bpe_pairs" -> qBpePairsSql,
    "q_bpe_merges" ->
      s"""SELECT rank, "left", "right", merged, cnt
        |FROM read_parquet('${oracleParquet("bpe_merges_sf001.parquet")}')"""
        .stripMargin,
    "q_bpe_tokenize" ->
      s"""SELECT doc_id, n_words, n_bpe_tokens,
        |  round(CAST(n_bpe_tokens AS DOUBLE) / n_words, 4) AS tokens_per_word
        |FROM read_parquet('${oracleParquet("bpe_tokenize_sf001.parquet")}')"""
        .stripMargin)
}
