package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis block (SURVEY.md §2.6) — per-document metrics for a
  * training-data pipeline. Everything is built from codegen'd built-in
  * expressions over one scan of `documents`; no UDFs, so the plans
  * stay inside WholeStageCodegen and scale linearly with the corpus.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens, as a SQL expression string (kept
    * textual so the DuckDB oracle mirrors it token-for-token).
    */
  private[graft] val wordsExpr = raw"filter(split(text, '\\s+'), x -> x <> '')"

  /** F32 (r9) — UNICODE-aware tokens: CJK ideographs segment as single
    * characters (the standard heuristic absent a trained segmenter —
    * what a whitespace split gets catastrophically wrong on CJK, where
    * a whole sentence is one "token"), and every other letter/digit
    * run is one token with punctuation stripped. Two engine-portable
    * steps — isolate each Han character with spaces, then split on
    * non-(letter|digit) — because Java regex and DuckDB's RE2 disagree
    * on class-intersection syntax but agree on `\p{L}`/`\p{Nd}` and
    * the Han script class. Whitespace tokenization (F1) stays the
    * default for reference parity.
    */
  private[graft] val unicodeWordsExpr =
    raw"filter(split(regexp_replace(text, '(\\p{IsHan})', ' $$1 '), " +
      raw"'[^\\p{L}\\p{Nd}]+'), x -> x <> '')"

  def qTokenStatsUnicode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", s"$unicodeWordsExpr AS w")
      .selectExpr(
        "doc_id",
        "CAST(size(w) AS BIGINT) AS n_tokens",
        "CAST(size(filter(w, x -> x rlike '^[A-Za-z]+$')) AS BIGINT) AS n_latin_tokens",
        raw"CAST(size(filter(w, x -> x rlike '^\\p{IsHan}$$')) AS BIGINT) AS n_cjk_tokens",
        "CAST(size(array_distinct(w)) AS BIGINT) AS n_distinct_tokens")

  val qTokenStatsUnicodeSql: String =
    raw"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(
      |    regexp_replace(text, '(\p{Han})', ' \1 ', 'g'),
      |    '[^\p{L}\p{Nd}]+'), x -> x <> '') AS w
      |  FROM documents)
      |SELECT doc_id,
      |  len(w) AS n_tokens,
      |  len(list_filter(w, x -> regexp_full_match(x, '[A-Za-z]+'))) AS n_latin_tokens,
      |  len(list_filter(w, x -> regexp_full_match(x, '\p{Han}'))) AS n_cjk_tokens,
      |  len(list_distinct(w)) AS n_distinct_tokens
      |FROM t""".stripMargin

  /** The F2 keep/drop rule over a token-array column `w` — ONE
    * definition shared by the batch pipeline and the streaming
    * pipeline so the two ingest paths cannot drift. */
  private[graft] def qualityOkExpr(w: String): String =
    s"size($w) >= 5 AND size($w) <= 10000 AND " +
      s"CAST(size(filter($w, x -> x IN ('a', 'the', 'of', 'and', 'in', 'to', 'is'))) AS DOUBLE)" +
      s" / nullif(size($w), 0) > 0.01"

  // F1 — token counting: whitespace tokens plus a BPE-ish breakdown into
  // word/number/other character classes.
  def qTokenStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", s"$wordsExpr AS w", "text")
      .selectExpr(
        "doc_id",
        "CAST(size(w) AS BIGINT) AS n_tokens",
        "CAST(length(text) AS BIGINT) AS n_chars",
        "CAST(size(filter(w, x -> x rlike '^[a-z]+$')) AS BIGINT) AS n_alpha_tokens",
        "CAST(size(filter(w, x -> x rlike '^[0-9]+$')) AS BIGINT) AS n_num_tokens",
        "CAST(size(array_distinct(w)) AS BIGINT) AS n_distinct_tokens")

  val qTokenStatsSql: String =
    """WITH t AS (SELECT doc_id, text,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents)
      |SELECT doc_id,
      |  len(w) AS n_tokens,
      |  length(text) AS n_chars,
      |  len(list_filter(w, x -> regexp_full_match(x, '[a-z]+'))) AS n_alpha_tokens,
      |  len(list_filter(w, x -> regexp_full_match(x, '[0-9]+'))) AS n_num_tokens,
      |  len(list_distinct(w)) AS n_distinct_tokens
      |FROM t""".stripMargin

  // F2 — quality scoring: the usual pretraining-filter features
  // (length, punctuation density, stopword ratio, lexical diversity).
  /** Empty/whitespace-only docs divide by zero in every ratio; the
    * guards are nullif + coalesce (0.0 ratios, quality_ok=false),
    * mirrored verbatim in the oracle — NOT a CASE around the
    * higher-order aggregate, which would drop it out of codegen into
    * interpreted per-row eval (measured 25x slower). */
  def quality(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", s"$wordsExpr AS w", "text")
      .selectExpr(
        "doc_id",
        "CAST(size(w) AS BIGINT) AS n_tokens",
        "coalesce(round(CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '')) AS DOUBLE) / nullif(length(text), 0), 4), 0.0) AS punct_ratio",
        "coalesce(round(CAST(size(filter(w, x -> x IN ('a', 'the', 'of', 'and', 'in', 'to', 'is'))) AS DOUBLE) / nullif(size(w), 0), 4), 0.0) AS stopword_ratio",
        "coalesce(round(aggregate(w, CAST(0 AS BIGINT), (acc, x) -> acc + length(x)) / CAST(nullif(size(w), 0) AS DOUBLE), 4), 0.0) AS mean_token_len",
        "coalesce(round(CAST(size(array_distinct(w)) AS DOUBLE) / nullif(size(w), 0), 4), 0.0) AS unique_ratio",
        s"${qualityOkExpr("w")} AS quality_ok")

  def qQuality(s: SparkSession, d: String): DataFrame =
    quality(Tables.documents(s, d))

  val qQualitySql: String =
    """WITH t AS (SELECT doc_id, text,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents)
      |SELECT doc_id,
      |  len(w) AS n_tokens,
      |  coalesce(round((length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')))::DOUBLE / nullif(length(text), 0), 4), 0.0) AS punct_ratio,
      |  coalesce(round(len(list_filter(w, x -> list_contains(['a', 'the', 'of', 'and', 'in', 'to', 'is'], x)))::DOUBLE / nullif(len(w), 0), 4), 0.0) AS stopword_ratio,
      |  coalesce(round(list_sum(list_transform(w, x -> length(x)))::DOUBLE / nullif(len(w), 0), 4), 0.0) AS mean_token_len,
      |  coalesce(round(len(list_distinct(w))::DOUBLE / nullif(len(w), 0), 4), 0.0) AS unique_ratio,
      |  len(w) >= 5 AND len(w) <= 10000 AND len(list_filter(w, x -> list_contains(['a', 'the', 'of', 'and', 'in', 'to', 'is'], x)))::DOUBLE / nullif(len(w), 0) > 0.01 AS quality_ok
      |FROM t""".stripMargin

  // F3 — language ID: marker-stopword voting with a deterministic
  // argmax (en > es > fr > de on ties, 'und' when no marker hits).
  // A real pipeline swaps in richer marker lists / fastText; the
  // operator shape (per-doc score vector → argmax) is the same.
  def qLangid(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", s"$wordsExpr AS w")
      .selectExpr(
        "doc_id",
        "CAST(size(filter(w, x -> x IN ('the', 'a', 'is', 'and', 'of'))) AS BIGINT) AS en_hits",
        "CAST(size(filter(w, x -> x IN ('el', 'la', 'los', 'es', 'y'))) AS BIGINT) AS es_hits",
        "CAST(size(filter(w, x -> x IN ('le', 'la', 'les', 'est', 'et'))) AS BIGINT) AS fr_hits",
        "CAST(size(filter(w, x -> x IN ('der', 'die', 'das', 'ist', 'und'))) AS BIGINT) AS de_hits")
      .selectExpr(
        "doc_id", "en_hits", "es_hits", "fr_hits", "de_hits",
        """CASE
          |  WHEN en_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND de_hits = 0 THEN 'und'
          |  WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
          |  WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
          |  WHEN fr_hits >= de_hits THEN 'fr'
          |  ELSE 'de'
          |END AS predicted_lang""".stripMargin)

  val qLangidSql: String =
    """WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |h AS (SELECT doc_id,
      |  len(list_filter(w, x -> list_contains(['the', 'a', 'is', 'and', 'of'], x))) AS en_hits,
      |  len(list_filter(w, x -> list_contains(['el', 'la', 'los', 'es', 'y'], x))) AS es_hits,
      |  len(list_filter(w, x -> list_contains(['le', 'la', 'les', 'est', 'et'], x))) AS fr_hits,
      |  len(list_filter(w, x -> list_contains(['der', 'die', 'das', 'ist', 'und'], x))) AS de_hits
      |  FROM t)
      |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
      |  CASE
      |    WHEN en_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND de_hits = 0 THEN 'und'
      |    WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
      |    WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
      |    WHEN fr_hits >= de_hits THEN 'fr'
      |    ELSE 'de'
      |  END AS predicted_lang
      |FROM h""".stripMargin

  // F4 — document fingerprinting: md5 of the normalized text plus a
  // 60-bit integer fingerprint (md5-prefix), the join key for exact
  // dedup across shards.
  def qFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id",
        "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')) AS norm")
      .selectExpr(
        "doc_id",
        "md5(norm) AS fp_md5",
        "CAST(conv(substr(md5(norm), 1, 15), 16, 10) AS BIGINT) AS fp64")

  val qFingerprintSql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT doc_id, md5(norm) AS fp_md5,
      |  CAST(('0x' || substr(md5(norm), 1, 15)) AS BIGINT) AS fp64
      |FROM t""".stripMargin

  // F5 — PII redaction: the standard pretraining scrub (emails, phone
  // numbers, long digit runs as opaque IDs) as pure codegen'd
  // regexp_replace — one scan, no UDF. Patterns stay in the RE2 ∩
  // java.util.regex common dialect so the oracle replays them exactly.
  // The result carries match COUNTS plus an md5 of the redacted text
  // (comparing a hash, not 500 full documents, keeps the oracle dump
  // small while still bit-exact on content).
  private val emailRe = raw"[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** SQL expression redacting emails/phones/long-digit IDs from `c` —
    * the reusable form of q_pii_redact for pipeline composition. */
  def redactedExpr(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($c, '$emailRe', '<EMAIL>'), '$phoneRe', '<PHONE>'), '$idRe', '<ID>')"
  private val phoneRe = raw"\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  private val idRe = raw"\\b\\d{4,}\\b"

  def qPiiRedact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr(
        "doc_id",
        s"CAST(size(regexp_extract_all(text, '$emailRe', 0)) AS BIGINT) AS n_emails",
        s"CAST(size(regexp_extract_all(text, '$phoneRe', 0)) AS BIGINT) AS n_phones",
        s"CAST(size(regexp_extract_all(text, '$idRe', 0)) AS BIGINT) AS n_ids",
        s"md5(regexp_replace(regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>'), '$phoneRe', '<PHONE>'), '$idRe', '<ID>')) AS redacted_md5")

  val qPiiRedactSql: String =
    raw"""SELECT doc_id,
      |  len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
      |  len(regexp_extract_all(text, '\b\d{4,}\b')) AS n_ids,
      |  md5(regexp_replace(regexp_replace(regexp_replace(text,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
      |    '\b\d{4,}\b', '<ID>', 'g')) AS redacted_md5
      |FROM documents""".stripMargin

  // F6 — deterministic train/holdout split: bucket = first md5 byte of
  // the doc id. Content-addressed (no RNG, no row order dependence) so
  // the split is reproducible across engines, re-runs, and re-shards —
  // the only property a 100 TB pipeline split can rely on.
  /** Content-addressed md5 bucket of the doc id (0-255) — reusable for
    * splits and sampling in pipeline composition. */
  val bucketExpr =
    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT)"

  def qHashSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr(
        "doc_id",
        s"$bucketExpr AS bucket",
        s"CASE WHEN $bucketExpr < 216 THEN 'train' ELSE 'holdout' END AS split")

  val qHashSplitSql: String =
    """SELECT doc_id,
      |  CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2)) AS BIGINT) AS bucket,
      |  CASE WHEN CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2)) AS BIGINT) < 216
      |    THEN 'train' ELSE 'holdout' END AS split
      |FROM documents""".stripMargin

  // F7 — stratified deterministic sampling: ~20% of each source via the
  // same md5 bucketing (rate = 51/256). Unlike df.sample, survives
  // re-partitioning and re-runs bit-identically, and the per-stratum
  // rate is exact-in-expectation without a count-per-stratum pre-pass.
  def qSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(expr(s"$bucketExpr < 51"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum("n_chars").as("kept_chars"))

  val qSampleSql: String =
    """SELECT source, count(*) AS n_kept,
      |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
      |FROM documents
      |WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2)) AS BIGINT) < 51
      |GROUP BY source""".stripMargin

  // F8 — n-gram counting (bigrams): posexplode + window-lead pairing —
  // the same O(1)-per-token shape as the dedup shingle builder (array
  // higher-order lambdas run interpreted; the window form stays in
  // codegen + one doc_id-partitioned sort). Deterministic top-30 via
  // the (cnt DESC, bigram ASC) total order.
  def qBigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", s"$wordsExpr AS w")
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead("tok", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")))
      .where(col("nxt").isNotNull)
      .select(concat(col("tok"), lit(" "), col("nxt")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(30)

  val qBigramsSql: String =
    raw"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos FROM t),
      |b AS (SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram FROM u)
      |SELECT bigram, count(*) AS cnt FROM b WHERE bigram IS NOT NULL
      |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 30""".stripMargin

  // F9 — repetition scoring (Gopher-style): the fraction of a doc's
  // bigrams taken by its single most frequent bigram. Boilerplate and
  // template spam concentrate mass in one bigram; prose does not. Two
  // hash aggregates over the bigram stream, both keyed by doc_id so
  // the second rides the first's partitioning. Docs with < 2 tokens
  // have no bigrams and emit no row (mirrored by the oracle's
  // NULL-bigram filter). The `repetitive` flag compares UN-rounded
  // ratios identically in both engines.
  def qRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", s"$wordsExpr AS w")
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead("tok", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), concat(col("tok"), lit(" "), col("nxt")).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_bigrams"), max("cnt").as("top_cnt"))
      .select(
        col("doc_id"), col("n_bigrams"), col("top_cnt"),
        round(col("top_cnt").cast("double") / col("n_bigrams"), 4).as("top_bigram_frac"),
        (col("top_cnt").cast("double") / col("n_bigrams") > 0.18).as("repetitive"))

  val qRepetitionSql: String =
    raw"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos FROM t),
      |b AS (SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
      |      FROM u),
      |c AS (SELECT doc_id, bigram, count(*) AS cnt FROM b
      |      WHERE bigram IS NOT NULL GROUP BY 1, 2),
      |s AS (SELECT doc_id, max(cnt) AS top_cnt,
      |        CAST(sum(cnt) AS BIGINT) AS n_bigrams FROM c GROUP BY 1)
      |SELECT doc_id, n_bigrams, CAST(top_cnt AS BIGINT) AS top_cnt,
      |  round(top_cnt::DOUBLE / n_bigrams, 4) AS top_bigram_frac,
      |  top_cnt::DOUBLE / n_bigrams > 0.18 AS repetitive
      |FROM s""".stripMargin

  // F10 — unigram language-model scoring: fit corpus unigram
  // probabilities in one aggregate, then score every doc by its mean
  // negative log-likelihood — the classic cheap LM-quality signal
  // (gibberish and rare-token spam score high, fluent prose low).
  // Plan shape at 100 TB: the vocab is a token-keyed aggregate of the
  // same corpus (shuffle by token), the corpus total joins in via a
  // broadcast 1-row aggregate, and the scoring join is token-keyed —
  // no driver-side model state anywhere.
  def qUnigramLm(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .selectExpr("doc_id", s"$wordsExpr AS w")
      .select(col("doc_id"), explode(col("w")).as("tok"))
    // the FIT pass: one distributed count whose scalar result ships
    // into the scoring plan as a literal — the same model-as-literal
    // pattern as the LSH hyperplanes. (A 1-row joined "total" relation
    // would plan as a nested-loop join; a literal keeps the scoring
    // pass a pure token-keyed hash join.)
    val total = toks.count()
    val probs = Tables.documents(s, d)
      .selectExpr("doc_id", s"$wordsExpr AS w")
      .select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"), (col("cnt").cast("double") / lit(total)).as("p"))
    toks.join(probs, "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log(col("p"))), 4).as("mean_nll"))
  }

  val qUnigramLmSql: String =
    raw"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(w) AS tok FROM t),
      |vocab AS (SELECT tok, count(*) AS cnt FROM u GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab)
      |SELECT u.doc_id, count(*) AS n_tokens,
      |  round(avg(-ln(vocab.cnt::DOUBLE / tot.n)), 4) AS mean_nll
      |FROM u JOIN vocab USING (tok) CROSS JOIN tot
      |GROUP BY u.doc_id""".stripMargin

  // F28 — bigram language-model scoring (one order up from F10; the
  // CCNet/KenLM-style perplexity filter): corpus bigram model with
  // add-one smoothing over the observed vocabulary, every doc scored
  // by the mean negative log-likelihood of its bigram stream. Where
  // F10 flags rare-TOKEN spam, this flags improbable token ORDER —
  // shuffled/templated text whose unigrams look fluent. Plan shape at
  // 100 TB: bigrams assemble array-side (two shifted slices zipped, no
  // per-token window), the model is a (w1,w2)-keyed aggregate joined
  // with a w1-keyed context aggregate of the same rows, V ships as a
  // literal (model-as-literal), and scoring is a pair-keyed hash join
  // — no driver-side model state.
  def qBigramLm(s: SparkSession, d: String): DataFrame =
    bigramLm(Tables.documents(s, d))

  def bigramLm(documents: DataFrame): DataFrame = {
    val docs = documents.selectExpr("doc_id", s"$wordsExpr AS w")
    val bg = docs.where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("b"))).as("z"))
      .select(col("doc_id"), col("z.a").as("w1"), col("z.b").as("w2"))
    val vocabSize = docs.select(explode(col("w")).as("tok"))
      .agg(countDistinct("tok")).head().getLong(0) // FIT scalar -> literal
    val pairCnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctxCnt = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val probs = pairCnt.join(ctxCnt, "w1")
      .select(col("w1"), col("w2"),
        ((col("c12") + 1).cast("double") / (col("c1") + lit(vocabSize))).as("p"))
    bg.join(probs, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("p"))), 4).as("mean_nll"))
  }

  val qBigramLmSql: String =
    raw"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |bg AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
      |  FROM t, unnest(range(0, greatest(len(w) - 1, 0))) AS r(i)),
      |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vs
      |  FROM (SELECT unnest(w) AS tok FROM t)),
      |pc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |cc AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
      |SELECT bg.doc_id, count(*) AS n_bigrams,
      |  round(avg(-ln((pc.c12 + 1)::DOUBLE / (cc.c1 + v.vs))), 4) AS mean_nll
      |FROM bg JOIN pc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
      |GROUP BY bg.doc_id""".stripMargin

  // F14 — TF-IDF: top-3 terms per document by (cnt/doclen) * ln(N/df),
  // the standard keyword-extraction / relevance signal. Plan shape at
  // 100 TB: tf is a (doc, term)-keyed aggregate, df a term-keyed
  // aggregate of the same rows (rides the first shuffle's output), the
  // corpus size N ships as a literal (model-as-literal — a 1-row joined
  // total would plan as a nested-loop join), and the final top-3 is a
  // doc-partitioned window. Ranking compares the ROUNDED score (then
  // term ASC) so sub-ulp double noise between engines can't flip the
  // order of near-ties.
  def qTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.count() // the FIT scalar, shipped as a literal
    val tf = docs
      .selectExpr("doc_id", s"$wordsExpr AS w")
      .select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    val doclen = tf.groupBy("doc_id").agg(sum("cnt").as("n_tokens"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    tf.join(doclen, "doc_id").join(df, "term")
      .select(col("doc_id"), col("term"),
        round((col("cnt").cast("double") / col("n_tokens")) *
          log(lit(nDocs.toDouble) / col("df")), 4).as("tfidf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
  }

  val qTfidfSql: String =
    raw"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(w) AS term FROM t),
      |tf AS (SELECT doc_id, term, count(*) AS cnt FROM u GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens FROM tf GROUP BY 1),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |sc AS (SELECT tf.doc_id, tf.term,
      |    round((cnt::DOUBLE / n_tokens) * ln(n_docs::DOUBLE / df.df), 4) AS tfidf
      |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
      |  JOIN df ON tf.term = df.term CROSS JOIN n)
      |SELECT doc_id, term, tfidf,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      |FROM sc
      |QUALIFY rank <= 3""".stripMargin

  /** F32 — BM25 ranked retrieval (Robertson k1=1.2, b=0.75, the
    * Lucene idf form): top-5 documents per query over a deterministic
    * query set drawn from the corpus itself (df ranks 21–40, five
    * 4-term queries — the mid-frequency band where BM25's saturation
    * and length normalization actually discriminate). Plan shape at
    * 100 TB: tf is the SAME (doc, term) aggregate TF-IDF builds, df
    * and doclen ride its output, the corpus scalars (N, avgdl) ship
    * as literals, the query set is a BROADCAST of 20 rows — so
    * scoring is one map-side semi-join of the posting rows that match
    * a query term (never the full corpus) and one (query, doc)
    * aggregate. Ranking compares the ROUNDED score then doc_id, the
    * qTfidf tie-break trick, so sub-ulp float noise between engines
    * cannot flip near-ties.
    */
  def qBm25(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .selectExpr("doc_id", s"$wordsExpr AS w")
      .select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    val doclen = tf.groupBy("doc_id").agg(sum("cnt").as("dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // FIT scalars as literals (a 1-row join would plan nested-loop)
    val st = doclen.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl").cast("double")).as("avgdl")).head
    val (n, avgdl) = (st.getDouble(0), st.getDouble(1))
    // the query set: df ranks 21–40, round-robined into 5 queries —
    // 20 rows collected (knob-bounded) and broadcast back
    val qrows = dft.orderBy(col("df").desc, col("term").asc).limit(40)
      .collect().drop(20).zipWithIndex
      .map { case (r, i) => (i.toLong % 5, r.getString(0)) }
    val qterms = s.createDataFrame(qrows.toIndexedSeq)
      .toDF("query_id", "term")
    val contrib =
      log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("cnt") * lit(2.2)) /
        (col("cnt") + lit(1.2) * (lit(0.25) +
          lit(0.75) * col("dl").cast("double") / lit(avgdl)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    tf.join(doclen, "doc_id").join(dft, "term")
      .join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id")
      .agg(round(sum(contrib), 4).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5)
  }

  val qBm25Sql: String =
    raw"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(w) AS term FROM t),
      |tf AS (SELECT doc_id, term, count(*) AS cnt FROM u GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl FROM tf GROUP BY 1),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |st AS (SELECT count(*)::DOUBLE AS n, avg(dl::DOUBLE) AS avgdl FROM dl),
      |qt AS (SELECT (row_number() OVER (ORDER BY df DESC, term) - 1) % 5
      |    AS query_id, term
      |  FROM (SELECT term, df FROM df
      |        ORDER BY df DESC, term LIMIT 20 OFFSET 20)),
      |sc AS (SELECT qt.query_id, tf.doc_id,
      |    round(sum(ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1) *
      |      (tf.cnt * 2.2) /
      |      (tf.cnt + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 4) AS score
      |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
      |  JOIN qt USING (term) CROSS JOIN st
      |  GROUP BY 1, 2)
      |SELECT query_id, doc_id, score,
      |  row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS rank
      |FROM sc QUALIFY rank <= 5""".stripMargin

  /** F33 — term frequency-of-frequencies spectrum (the Zipf corpus
    * health check: how many terms occur exactly k times). Hapax-heavy
    * spectra flag OCR junk / boilerplate stripping gone wrong; a
    * truncated tail flags dedup over-aggression. Two exact integer
    * aggregates — (term → corpus frequency) rides the same token
    * stream every F-family op shares, then (frequency → #terms) is a
    * tiny second shuffle (|distinct frequencies| rows). All-integer
    * output: no float can wobble the hash.
    */
  def qTermSpectrum(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr(s"$wordsExpr AS w")
      .select(explode(col("w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("occurrences"))
      .groupBy("occurrences").agg(count(lit(1)).as("n_terms"))

  val qTermSpectrumSql: String =
    raw"""WITH t AS (SELECT
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |tf AS (SELECT unnest(w) AS term FROM t),
      |f AS (SELECT term, count(*) AS occurrences FROM tf GROUP BY 1)
      |SELECT occurrences, count(*) AS n_terms FROM f GROUP BY 1""".stripMargin

  /** F16 — character-level Shannon entropy per document, the cheap
    * gibberish/compression-quality signal (binary junk and
    * single-char spam score far from prose's ~4 bits/char). One
    * map-side explode to (doc, char) with partial counting, then a
    * doc-keyed aggregate; the shuffle carries per-doc CHARACTER
    * DISTRIBUTIONS (≤ alphabet size per doc), never the text. Uses
    * the log identity H = log2(n) - Σ cnt·log2(cnt)/n so one
    * aggregate suffices (no per-row p=cnt/n window pass).
    */
  def qEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n"),
        sum(col("cnt").cast("double") * log2(col("cnt"))).as("sl"))
      .select(col("doc_id"), col("n").as("n_chars"),
        round(log2(col("n")) - col("sl") / col("n"), 4).as("char_entropy"))

  val qEntropySql: String =
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |cnt AS (SELECT doc_id, ch, count(*) AS cnt FROM ch
      |  WHERE ch <> '' GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
      |    sum(cnt::DOUBLE * log2(cnt)) AS sl
      |  FROM cnt GROUP BY 1)
      |SELECT doc_id, n AS n_chars,
      |  round(log2(n) - sl / n, 4) AS char_entropy
      |FROM agg""".stripMargin

  /** F18 — regex extraction table: every non-overlapping match of a
    * pattern, exploded to one row per occurrence with its 1-based
    * match index (the scan→extract→explode shape behind PII mining,
    * citation harvesting, markup stripping). Pattern kept in the
    * RE2 ∩ Java common dialect (like the F5 redaction rules) so both
    * engines find the identical leftmost-longest match sequence.
    */
  def qExtract(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]{5,}', 0)").as("ms"))
      .select(col("doc_id"), posexplode(col("ms")).as(Seq("idx0", "matched")))
      .select(col("doc_id"), (col("idx0") + 1).cast("long").as("idx"), col("matched"))

  val qExtractSql: String =
    """WITH m AS (
      |  SELECT doc_id, regexp_extract_all(text, '[a-z]{5,}') AS ms
      |  FROM documents)
      |SELECT doc_id, generate_subscripts(ms, 1) AS idx, unnest(ms) AS matched
      |FROM m""".stripMargin

  /** F19 — deterministic WEIGHTED sampling: keep probability scales
    * with document length (long docs carry more training signal), but
    * the coin is the content-addressed md5 bucket — the F6/F7
    * derandomization applied to importance sampling, so the sample is
    * re-run- and re-shard-stable with NO RNG state to coordinate
    * across executors. A doc is kept iff bucket/256 < n_chars/500
    * (capped at 1): every doc ≥ 500 chars always survives, a 250-char
    * doc survives with p = 0.5, chosen by its own hash.
    */
  def qWeightedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", "source", "n_chars",
        s"$bucketExpr AS bucket")
      .where(expr("CAST(bucket AS DOUBLE) / 256.0 < least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)"))
      .select("doc_id", "source", "n_chars")

  val qWeightedSampleSql: String =
    """SELECT doc_id, source, n_chars
      |FROM (SELECT doc_id, source, n_chars,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) AS bucket
      |  FROM documents)
      |WHERE CAST(bucket AS DOUBLE) / 256.0 < least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)""".stripMargin

  /** F20 — distribution drift (Population Stability Index) of document
    * length per source vs the whole corpus: the monitoring signal that
    * catches a source whose scrape changed shape. Bins are INTEGER
    * arithmetic over the exact global [min, max] (a broadcast 1-row
    * stats join), so bucket assignment is bit-identical cross-engine;
    * PSI sums (p−q)·ln(p/q) over bins where both sides are nonzero
    * (the standard zero-bin convention, mirrored in the oracle).
    * PSI < 0.1 is conventionally "stable" — flagged as `drifted`
    * on the ROUNDED score.
    */
  def qDrift(s: SparkSession, d: String, bins: Int = 10): DataFrame = {
    val docs = Tables.documents(s, d)
    val stats = docs.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
    val binned = docs.crossJoin(broadcast(stats))
      .selectExpr("source",
        s"CAST(((n_chars - mn) * $bins) div (mx - mn + 1) AS BIGINT) AS bin")
    val g = binned.groupBy("bin").agg(count(lit(1)).as("gc"))
      .withColumn("q", col("gc").cast("double") /
        sum("gc").over(org.apache.spark.sql.expressions.Window.partitionBy()))
    val p = binned.groupBy("source", "bin").agg(count(lit(1)).as("sc"))
      .withColumn("p", col("sc").cast("double") /
        sum("sc").over(org.apache.spark.sql.expressions.Window.partitionBy("source")))
    p.join(g.select("bin", "q"), "bin")
      .groupBy("source")
      .agg(round(sum(expr("(p - q) * ln(p / q)")), 4).as("psi"))
      .withColumn("drifted", col("psi") > 0.1)
  }

  val qDriftSql: String =
    """WITH st AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents),
      |b AS (SELECT source,
      |    CAST((n_chars - mn) * 10 // (mx - mn + 1) AS BIGINT) AS bin
      |  FROM documents, st),
      |g AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM b) AS q
      |  FROM b GROUP BY bin),
      |p AS (SELECT source, bin,
      |    count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY source) AS p
      |  FROM b GROUP BY source, bin)
      |SELECT source, round(sum((p - q) * ln(p / q)), 4) AS psi,
      |  round(sum((p - q) * ln(p / q)), 4) > 0.1 AS drifted
      |FROM p JOIN g USING (bin) GROUP BY source""".stripMargin

  /** F21 — overlapping text chunking (window 200 chars, stride 100):
    * the long-document splitter every embedding/RAG pipeline runs
    * before vectorizing. Chunk count derives from length arithmetic
    * (no per-char explode — the sequence is over CHUNK indexes, so
    * the row blowup is L/stride, not L), tails shorter than the
    * window are kept, and chunk content ships as md5 so the oracle
    * stays bit-exact without moving text twice.
    */
  def qChunk(s: SparkSession, d: String, window: Int = 200,
      stride: Int = 100): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", "text",
        s"""sequence(0, greatest(CAST(ceil((length(text) - $window) / CAST($stride AS DOUBLE)) AS INT), 0))
           | AS ks""".stripMargin)
      .select(col("doc_id"), col("text"), explode(col("ks")).as("k"))
      .selectExpr("doc_id", "CAST(k AS BIGINT) AS chunk_idx",
        s"CAST(k * $stride + 1 AS BIGINT) AS chunk_start",
        s"CAST(length(substring(text, k * $stride + 1, $window)) AS BIGINT) AS chunk_len",
        s"md5(substring(text, k * $stride + 1, $window)) AS chunk_md5")

  val qChunkSql: String =
    """SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |  CAST(k * 100 + 1 AS BIGINT) AS chunk_start,
      |  length(substr(text, k * 100 + 1, 200)) AS chunk_len,
      |  md5(substr(text, k * 100 + 1, 200)) AS chunk_md5
      |FROM documents,
      |  unnest(range(0, greatest(CAST(ceil((length(text) - 200) / 100.0) AS INT), 0) + 1)) AS t(k)""".stripMargin

  /** F22 — top terms per source (the per-corpus vocabulary report):
    * token counts keyed by (source, token) — one shuffle, map-side
    * partial — then rank-5 within each source under the (cnt DESC,
    * token ASC) total order. The rank window partitions by source
    * over VOCABULARY-bounded rows (per-source distinct tokens), not
    * corpus rows, so partition size is bounded by vocabulary at any
    * corpus scale.
    */
  def qTopTerms(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("cnt").desc, col("tok").asc)
    Tables.documents(s, d)
      .selectExpr("source", s"$wordsExpr AS w")
      .select(col("source"), explode(col("w")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  val qTopTermsSql: String =
    """WITH t AS (SELECT source,
      |  unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents),
      |c AS (SELECT source, tok, count(*) AS cnt FROM t GROUP BY 1, 2)
      |SELECT source, tok, cnt,
      |  row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tok) AS rank
      |FROM c QUALIFY rank <= 5""".stripMargin

  // F31 — distributed Naive Bayes classifier (the closed-form cousin
  // of the fasttext-style quality/domain filter every web-corpus
  // pipeline runs): FIT per-source add-one-smoothed unigram
  // likelihoods and log priors over the deterministic md5 TRAIN split
  // (F6's bucketing — re-runs bit-identically), then classify every
  // HOLDOUT doc by the max posterior. Closed form = one aggregate
  // fits the whole model, so unlike iterative LR the train pass is
  // exactly reproducible and fully oracled. Plan shape at 100 TB:
  // the model is a (source, token)-keyed aggregate (shuffle by
  // token); the per-class priors/denominators are a |sources|-row
  // frame BROADCAST into scoring; scoring is a (class, token)-keyed
  // hash join with map-side partial aggregation; the argmax window
  // runs over |sources| rows per doc. No driver-side model state —
  // the two FIT scalars (vocab size, train doc count) ship as
  // literals, the model-as-literal pattern. Scores round to 4
  // decimals BEFORE the argmax with a class-name tiebreak, so float
  // association order can never flip the prediction between engines.
  def qNbClassify(s: SparkSession, d: String): DataFrame =
    nbClassify(Tables.documents(s, d))

  def nbClassify(documents: DataFrame): DataFrame = {
    val docs = documents
      .selectExpr("doc_id", "source", s"$wordsExpr AS w",
        s"CASE WHEN $bucketExpr < 216 THEN 'train' ELSE 'holdout' END AS split")
    val train = docs.where(col("split") === "train")
    val toks = train.select(col("source"), explode(col("w")).as("tok"))
    val counts = toks.groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val vocab = counts.select("tok").distinct().count() // FIT scalar
    val nTrain = train.count()                          // FIT scalar
    val classes = toks.groupBy("source").agg(count(lit(1)).as("toktotal"))
      .join(train.groupBy("source").agg(count(lit(1)).as("docs")), "source")
      .select(col("source").as("cls"),
        log(col("docs").cast("double") / lit(nTrain.toDouble)).as("logprior"),
        (col("toktotal") + lit(vocab)).cast("double").as("denom"))
    val hold = docs.where(col("split") === "holdout")
      .select(col("doc_id"), explode(col("w")).as("tok"))
    // Σ log((cnt+1)/denom) = Σ log(cnt+1) − n·log(denom): the smoothed
    // zero-count terms need no vocab×class grid — absent join rows
    // contribute log(1) = 0 to the first sum
    val scored = hold.crossJoin(broadcast(classes))
      .join(counts.withColumnRenamed("source", "cls"),
        Seq("cls", "tok"), "left_outer")
      .groupBy("doc_id", "cls")
      .agg(round(max(col("logprior")) +
        sum(log(coalesce(col("cnt"), lit(0L)).cast("double") + lit(1.0))) -
        count(lit(1)).cast("double") * log(max(col("denom"))), 4).as("nb_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("nb_score").desc, col("cls"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("predicted"), col("nb_score"))
  }

  val qNbClassifySql: String =
    raw"""WITH docs AS (SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w,
      |    CASE WHEN CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2)) AS BIGINT) < 216
      |      THEN 'train' ELSE 'holdout' END AS split
      |  FROM documents),
      |toks AS (SELECT source, unnest(w) AS tok FROM docs WHERE split = 'train'),
      |counts AS (SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
      |vocab AS (SELECT count(DISTINCT tok) AS v FROM counts),
      |ntrain AS (SELECT count(*) AS n FROM docs WHERE split = 'train'),
      |classes AS (
      |  SELECT c.source AS cls,
      |    ln(d.docs::DOUBLE / (SELECT n FROM ntrain)) AS logprior,
      |    (c.toktotal + (SELECT v FROM vocab))::DOUBLE AS denom
      |  FROM (SELECT source, CAST(sum(cnt) AS BIGINT) AS toktotal
      |        FROM counts GROUP BY 1) c
      |  JOIN (SELECT source, count(*) AS docs FROM docs
      |        WHERE split = 'train' GROUP BY 1) d USING (source)),
      |hold AS (SELECT doc_id, unnest(w) AS tok FROM docs WHERE split = 'holdout'),
      |scored AS (
      |  SELECT h.doc_id, cl.cls,
      |    round(max(cl.logprior) + sum(ln(coalesce(c.cnt, 0) + 1))
      |      - count(*) * ln(max(cl.denom)), 4) AS nb_score
      |  FROM hold h CROSS JOIN classes cl
      |  LEFT JOIN counts c ON c.source = cl.cls AND c.tok = h.tok
      |  GROUP BY 1, 2)
      |SELECT doc_id, cls AS predicted, nb_score
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY doc_id ORDER BY nb_score DESC, cls) AS rn
      |      FROM scored)
      |WHERE rn = 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_nb_classify" -> qNbClassify,
    "q_top_terms" -> ((s, d) => qTopTerms(s, d)),
    "q_drift" -> ((s, d) => qDrift(s, d)),
    "q_chunk" -> ((s, d) => qChunk(s, d)),
    "q_weighted_sample" -> qWeightedSample,
    "q_extract" -> qExtract,
    "q_entropy" -> qEntropy,
    "q_tfidf" -> qTfidf,
    "q_bm25" -> qBm25,
    "q_term_spectrum" -> qTermSpectrum,
    "q_token_stats" -> qTokenStats,
    "q_token_stats_unicode" -> qTokenStatsUnicode,
    "q_quality" -> qQuality,
    "q_langid" -> qLangid,
    "q_fingerprint" -> qFingerprint,
    "q_pii_redact" -> qPiiRedact,
    "q_hash_split" -> qHashSplit,
    "q_sample" -> qSample,
    "q_bigrams" -> qBigrams,
    "q_repetition" -> qRepetition,
    "q_unigram_lm" -> qUnigramLm,
    "q_bigram_lm" -> qBigramLm)

  def oracles: Map[String, String] = Map(
    "q_nb_classify" -> qNbClassifySql,
    "q_top_terms" -> qTopTermsSql,
    "q_drift" -> qDriftSql,
    "q_chunk" -> qChunkSql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_extract" -> qExtractSql,
    "q_entropy" -> qEntropySql,
    "q_tfidf" -> qTfidfSql,
    "q_bm25" -> qBm25Sql,
    "q_term_spectrum" -> qTermSpectrumSql,
    "q_token_stats" -> qTokenStatsSql,
    "q_quality" -> qQualitySql,
    "q_langid" -> qLangidSql,
    "q_fingerprint" -> qFingerprintSql,
    "q_pii_redact" -> qPiiRedactSql,
    "q_hash_split" -> qHashSplitSql,
    "q_sample" -> qSampleSql,
    "q_bigrams" -> qBigramsSql,
    "q_repetition" -> qRepetitionSql,
    "q_unigram_lm" -> qUnigramLmSql,
    "q_bigram_lm" -> qBigramLmSql,
    "q_token_stats_unicode" -> qTokenStatsUnicodeSql)
}
