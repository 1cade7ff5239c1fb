package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.wordsExpr

/** Training-data preparation block (SURVEY.md §2.6 F23–F26): the
  * operators that turn a deduplicated, quality-filtered corpus into
  * model-ready training shards — sequence packing, vocabulary-growth
  * monitoring, dedup observability, and cluster-canonicalization.
  *
  * Scale design notes per operator are on each method; none collects
  * to the driver, and every window partitions by a bounded key
  * (source shard / bucket / component), never globally.
  */
object TrainPrep {

  /** F23 — token-budget sequence packing (concat-and-chunk): docs are
    * concatenated in deterministic (source, doc_id) order and cut at
    * `budget`-token context boundaries — each doc gets the bin it
    * STARTS in and its offset there, which is exactly the layout a
    * packed-pretraining loader needs (a doc may straddle into the
    * next bin; the loader reads on). Packing is PER SOURCE — the
    * shard key — so the running-offset window never needs a global
    * sort: at 100 TB each source packs independently and in parallel,
    * and adding a source never reshuffles the others' bins.
    */
  def qPack(s: SparkSession, d: String, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    Tables.documents(s, d)
      .selectExpr("doc_id", "source", s"CAST(size($wordsExpr) AS BIGINT) AS n_tokens")
      .withColumn("offset",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("offset") / budget).cast("long").as("bin"),
        (col("offset") % budget).as("bin_offset"))
  }

  val qPackSql: String =
    raw"""WITH t AS (SELECT doc_id, source,
      |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (SELECT doc_id, source, n_tokens,
      |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM t)
      |SELECT doc_id, source, n_tokens,
      |  CAST(floor(off / 512.0) AS BIGINT) AS bin,
      |  off % 512 AS bin_offset
      |FROM o""".stripMargin

  /** F24 — vocabulary growth curve (the Heaps'-law monitor): how many
    * NEW distinct tokens each batch of `bucketDocs` documents
    * contributes, plus the running vocabulary size. The signal a
    * crawl-ingest pipeline watches for corpus saturation (new-token
    * rate collapsing → the crawl is re-reading the same material) or
    * contamination (a spike → a new domain or a junk injection).
    * One shuffle on token (min-doc aggregate, map-side partial), then
    * a bucket-count whose cumulative window runs over ~|corpus|/bucket
    * rows — nothing global touches row-level data.
    */
  def qVocabGrowth(s: SparkSession, d: String, bucketDocs: Long = 50L): DataFrame = {
    val firstSeen = Tables.documents(s, d)
      .selectExpr("doc_id", s"explode($wordsExpr) AS tok")
      .groupBy("tok").agg(min("doc_id").as("first_doc"))
      .select(floor(col("first_doc") / bucketDocs).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_words"))
    firstSeen
      .withColumn("cum_vocab",
        sum(col("new_words")).over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
  }

  val qVocabGrowthSql: String =
    raw"""WITH u AS (SELECT doc_id,
      |  unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents),
      |fs AS (SELECT tok, min(doc_id) AS first_doc FROM u GROUP BY tok),
      |b AS (SELECT CAST(floor(first_doc / 50.0) AS BIGINT) AS bucket,
      |        count(*) AS new_words
      |      FROM fs GROUP BY 1)
      |SELECT bucket, new_words,
      |  CAST(sum(new_words) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
      |FROM b""".stripMargin

  /** F25 — per-source near-duplication rate (dedup observability):
    * for each source, how many docs the D7 pipeline would drop and
    * the drop rate. The per-shard report a 100 TB ingest watches to
    * catch a mirrored crawl or a boilerplate-heavy domain BEFORE
    * paying to train on it. Rides the shared verified-pair registry —
    * the report is a join of (tiny) pair list against (doc_id,
    * source), grouped by source.
    */
  def qDedupRate(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val drop = Dedup.nearDupPairs(s, d, tau)
      .select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, d)
      .join(drop.withColumn("dup", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dups"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        round(col("n_dups").cast("double") / col("n_docs"), 4).as("dup_rate"))
  }

  val qDedupRateSql: String =
    Dedup.shinglesCte + Dedup.jaccardPairsCte +
      """,
        |drop AS (SELECT DISTINCT doc_b AS doc_id FROM p
        |  JOIN c ca ON doc_a = ca.doc_id JOIN c cb ON doc_b = cb.doc_id
        |  WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.5)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
        |  round(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 4) AS dup_rate
        |FROM documents d LEFT JOIN drop dr ON d.doc_id = dr.doc_id
        |GROUP BY d.source""".stripMargin

  /** F26 — canonical representative per near-dup cluster: D8's
    * connected components, but instead of "keep the min doc_id" the
    * KEPT doc is the best one — longest content wins, doc_id breaks
    * ties — the "keep the richest copy" refinement real dedup
    * pipelines apply (a truncated mirror shouldn't shadow the full
    * original). One struct-max aggregate per component (map-side
    * combinable), joined against component membership; components are
    * tiny relative to the corpus by construction.
    */
  def qClusterRep(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val comp = Dedup.qDedupCc(s, d, tau) // (doc_id, component)
    val docs = Tables.documents(s, d).select("doc_id", "n_chars")
    comp.join(docs, "doc_id")
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"),
        // max over (n_chars, -doc_id): longest doc, lowest id on ties
        max(struct(col("n_chars"), (-col("doc_id")).as("nid"),
          col("doc_id"))).as("m"))
      .select(col("component"), col("n_members"),
        col("m.doc_id").as("rep_id"), col("m.n_chars").as("rep_chars"))
  }

  val qClusterRepSql: String =
    Dedup.ccCte +
      """
        |SELECT component, n_members, doc_id AS rep_id, n_chars AS rep_chars
        |FROM (
        |  SELECT c.component,
        |    count(*) OVER (PARTITION BY c.component) AS n_members,
        |    c.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY c.component
        |      ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
        |  FROM comp c JOIN documents d ON c.doc_id = d.doc_id)
        |WHERE rn = 1""".stripMargin

  /** F27 — deterministic mixture construction: downsample each source
    * to a TOKEN budget (here `frac` of its token mass — in production
    * a per-source weights map, e.g. "30% web / 30% code / …"). Docs
    * are admitted in content-addressed md5 order until the budget
    * fills, so the sample is rerun- and reshard-stable with no RNG
    * state to coordinate (the F6/F19 property, applied to the
    * mixture), and a re-crawled copy of a doc keeps its
    * admission status. Per-source windows only — each mixture
    * component samples independently at 100 TB. The boundary doc that
    * crosses the budget is kept (its cum ≤ budget + its own tokens),
    * matching the "fill then stop" loader convention; output carries
    * cum_tokens so the loader can trim mid-doc if it must.
    */
  def qMixture(s: SparkSession, d: String, frac: Double = 0.4): DataFrame = {
    val w = Window.partitionBy("source").orderBy("ord", "doc_id")
    val wTot = Window.partitionBy("source")
    Tables.documents(s, d)
      .selectExpr("doc_id", "source", "md5(text) AS ord",
        s"CAST(size($wordsExpr) AS BIGINT) AS n_tokens")
      .withColumn("budget", ceil(sum(col("n_tokens")).over(wTot) * frac).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") - col("n_tokens") < col("budget"))
      .select("doc_id", "source", "n_tokens", "cum")
  }

  val qMixtureSql: String =
    raw"""WITH t AS (SELECT doc_id, source, md5(text) AS ord,
      |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |b AS (SELECT doc_id, source, n_tokens,
      |  CAST(ceil(sum(n_tokens) OVER (PARTITION BY source) * 0.4) AS BIGINT) AS budget,
      |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM t)
      |SELECT doc_id, source, n_tokens, cum
      |FROM b WHERE cum - n_tokens < budget""".stripMargin

  /** F29 — deterministic epoch shuffle + shard routing: for each
    * training epoch, every doc gets a fresh pseudo-random position —
    * `shard` (which of `shards` loader files it lands in) and `pos`
    * (its rank within that shard) — from a content-addressed hash of
    * (epoch, doc_id). The shuffle a pretraining loader needs, with the
    * properties df.sample/rand cannot give: bit-identical across
    * reruns and re-partitioning (no RNG state to coordinate across
    * 1000 executors), a DIFFERENT permutation each epoch (the hash is
    * salted by epoch), and stable per-doc routing while the corpus
    * grows (appending docs never moves existing ones between shards —
    * only pos shifts, which a loader re-reads anyway).
    *
    * Scale: no global sort anywhere — shard assignment is a stateless
    * hash, and the position window partitions by (epoch, shard), so
    * ordering cost is one shuffle into shards + a per-shard sort, the
    * same movement writing the shard files requires anyway.
    */
  def qEpochShuffle(s: SparkSession, d: String, epochs: Int = 2,
      shards: Int = 8): DataFrame = {
    val w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    val es = s.range(epochs).select(col("id").cast("int").as("epoch"))
    Tables.documents(s, d).select("doc_id")
      .crossJoin(broadcast(es)) // k-row epoch table, broadcast by design
      .withColumn("h", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      .withColumn("shard",
        expr(s"CAST(conv(substring(h, 1, 4), 16, 10) AS BIGINT) % $shards"))
      .select(col("epoch"), col("doc_id"), col("shard"),
        row_number().over(w).cast("long").as("pos"))
  }

  val qEpochShuffleSql: String =
    """WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1),
      |t AS (SELECT e.epoch, d.doc_id,
      |        md5(e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR) AS h
      |      FROM documents d CROSS JOIN e),
      |b AS (SELECT epoch, doc_id, h,
      |        CAST(('0x' || substr(h, 1, 4)) AS BIGINT) % 8 AS shard
      |      FROM t)
      |SELECT epoch, doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY epoch, shard
      |    ORDER BY h, doc_id) AS BIGINT) AS pos
      |FROM b""".stripMargin

  /** F30 — DSIR-style importance resampling (Xie et al., NeurIPS'23
    * "Data Selection for Language Models via Importance Resampling"):
    * score every POOL document by how much more likely its tokens are
    * under a TARGET-domain language model than under the general
    * corpus model — the published recipe for "give me more data that
    * looks like my curated set" — and keep the top `keep` by weight.
    * Here target = sources src0/src1 (the curated slice), models are
    * add-one-smoothed unigram LMs over the corpus vocabulary (the F10
    * machinery; DSIR's hashed-ngram features reduce to exactly this at
    * unigram order), and the per-doc weight is the length-normalized
    * log importance ratio mean_w[ln p_t(w) − ln p_c(w)], rounded
    * before ranking so cross-engine float noise can't flip near-ties.
    *
    * Plan at 100 TB: both models are ONE vocabulary-keyed aggregate
    * over the same token stream (target counts = a conditional count —
    * no second scan), the three scalars (N_t, N_c, V) ship as literals
    * (model-as-literal), scoring is a token-keyed hash join with
    * map-side partials, and the selection is TakeOrderedAndProject —
    * no global sort, no per-row rank; the final rank window runs over
    * ≤ keep rows.
    */
  def qDsirSelect(s: SparkSession, d: String, keep: Int = 100): DataFrame =
    dsirSelect(Tables.documents(s, d), Seq("src0", "src1"), keep)

  def dsirSelect(docs: DataFrame, targetSources: Seq[String],
      keep: Int): DataFrame = {
    val toks = docs
      .selectExpr("doc_id", "source", s"$wordsExpr AS w")
      .select(col("doc_id"), col("source"), explode(col("w")).as("tok"))
    val isTarget = col("source").isin(targetSources: _*)
    val sums = toks.agg(count(lit(1)).as("nc"),
      count(when(isTarget, 1)).as("nt")).head()
    val (nc, nt) = (sums.getLong(0), sums.getLong(1))
    val v = toks.select("tok").distinct().count()
    val model = toks
      .groupBy("tok")
      .agg(count(lit(1)).as("cc"), count(when(isTarget, 1)).as("ct"))
      .select(col("tok"),
        (log((col("ct") + 1).cast("double") / lit((nt + v).toDouble)) -
          log((col("cc") + 1).cast("double") / lit((nc + v).toDouble))).as("lr"))
    val scored = toks.filter(!isTarget)
      .join(model, "tok")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tokens"), round(avg(col("lr")), 4).as("logweight"))
    val top = scored
      .orderBy(col("logweight").desc, col("doc_id").asc).limit(keep)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("logweight").desc, col("doc_id").asc)).cast("long"))
  }

  val qDsirSelectSql: String =
    raw"""WITH t AS (SELECT doc_id, source,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |u AS (SELECT doc_id, source, unnest(w) AS tok FROM t),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS nc,
      |  CAST(count(*) FILTER (WHERE source IN ('src0','src1')) AS BIGINT) AS nt,
      |  CAST(count(DISTINCT tok) AS BIGINT) AS v FROM u),
      |model AS (
      |  SELECT tok,
      |    ln((count(*) FILTER (WHERE source IN ('src0','src1')) + 1)::DOUBLE
      |        / (st.nt + st.v))
      |    - ln((count(*) + 1)::DOUBLE / (st.nc + st.v)) AS lr
      |  FROM u CROSS JOIN st GROUP BY tok, st.nt, st.nc, st.v),
      |scored AS (
      |  SELECT u.doc_id, u.source, CAST(count(*) AS BIGINT) AS n_tokens,
      |    round(avg(lr), 4) AS logweight
      |  FROM u JOIN model USING (tok)
      |  WHERE u.source NOT IN ('src0','src1')
      |  GROUP BY u.doc_id, u.source)
      |SELECT doc_id, source, n_tokens, logweight,
      |  CAST(row_number() OVER (ORDER BY logweight DESC, doc_id) AS BIGINT)
      |    AS rank
      |FROM scored ORDER BY logweight DESC, doc_id LIMIT 100""".stripMargin

  /** F36 — END-TO-END CURATION FUNNEL (the F-family capstone): raw
    * corpus → training-ready set in one pipeline, composed entirely
    * from the family's own oracled gates — the F6 content-addressed
    * split (train buckets), the F2 quality gate, the F3 langid gate
    * (English), F4-fingerprint EXACT DEDUP (min doc_id survives), and
    * F15 8-gram decontamination against the holdout split. The
    * artifact is the funnel report every dataset card publishes:
    * per-stage surviving doc/token counts plus the final stage per
    * source.
    *
    * Scale shape: every per-doc gate (split/quality/lang) is a flag in
    * ONE projection over one scan; dedup adds the pipeline's only
    * shuffle (argmin per fingerprint, map-side combinable); decontam
    * is a broadcast semi-join against the eval-sized holdout gram set.
    * Nothing rescans the corpus per stage — the funnel counts are
    * conditional aggregates over the same narrow plan.
    */
  def qCuration(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // r15 (guide §1.2-1, don't recompute what you throw away): the
    // funnel report is a UNION of six aggregates, and Spark evaluates
    // each union branch independently — the tokenize+flag projection,
    // the dedup window and the 8-gram decontamination chain were each
    // re-run per branch (the gram hash of the whole corpus twice).
    // Materialize each funnel stage ONCE (localCheckpoint inside the
    // measured query — an intermediate of this computation, recomputed
    // every invocation) and let the six aggregates read the
    // materialized stages; at scale this is the same discipline — a
    // funnel over one annotated pass, not one corpus scan per stage.
    val flagged = docs
      .selectExpr("doc_id", "source", "text", s"$wordsExpr AS w",
        s"${TextAnalysis.bucketExpr} AS bucket")
      .selectExpr("doc_id", "source", "text", "bucket",
        "CAST(size(w) AS BIGINT) AS n_tokens",
        "bucket < 216 AS in_train",
        s"(${TextAnalysis.qualityOkExpr("w")}) AS q_ok",
        "CAST(size(filter(w, x -> x IN ('the','a','is','and','of'))) AS BIGINT) AS en_hits",
        "CAST(size(filter(w, x -> x IN ('el','la','los','es','y'))) AS BIGINT) AS es_hits",
        "CAST(size(filter(w, x -> x IN ('le','la','les','est','et'))) AS BIGINT) AS fr_hits",
        "CAST(size(filter(w, x -> x IN ('der','die','das','ist','und'))) AS BIGINT) AS de_hits")
      .selectExpr("doc_id", "source", "text", "bucket", "n_tokens",
        "in_train", "q_ok",
        "(NOT (en_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND de_hits = 0) " +
          "AND en_hits >= es_hits AND en_hits >= fr_hits " +
          "AND en_hits >= de_hits) AS is_en")
      .localCheckpoint() // ONE tokenize+flag pass serves every branch
    val s1 = flagged.filter(col("in_train"))
    val s2 = s1.filter(col("q_ok"))
    val s3 = s2.filter(col("is_en"))
      .withColumn("fp",
        expr("md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')))"))
    val reps = s3.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val s4 = s3.join(reps.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint() // feeds the gram hash, two funnels and s5
    val holdout = flagged.filter(col("bucket") >= 216)
      .select("doc_id", "text")
    val bad = Decontam.contaminatedIds(s4.select("doc_id", "text"), holdout)
    val s5 = s4.join(bad, Seq("doc_id"), "left_anti")
      .localCheckpoint() // the clean set feeds two aggregate branches
    def funnel(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
        .select(lit(name).as("stage"), lit("all").as("src"),
          col("n_docs"), col("n_tokens"))
    funnel(s1, "split")
      .unionByName(funnel(s2, "quality"))
      .unionByName(funnel(s3, "lang"))
      .unionByName(funnel(s4, "dedup"))
      .unionByName(funnel(s5, "clean"))
      .unionByName(s5.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .select(lit("clean_src").as("stage"), col("source").as("src"),
          col("n_docs"), col("n_tokens")))
  }

  /** Full funnel replay: the same gates CTE by CTE. */
  val qCurationSql: String = {
    val gram = (1 to 8).map(i => s"w[i+$i]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, source, text,
       |  CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2)) AS BIGINT) AS bucket,
       |  list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |f AS (SELECT doc_id, source, text, w,
       |  CAST(len(w) AS BIGINT) AS n_tokens, bucket,
       |  bucket < 216 AS in_train,
       |  (len(w) >= 5 AND len(w) <= 10000 AND
       |   len(list_filter(w, x -> list_contains(['a','the','of','and','in','to','is'], x)))::DOUBLE
       |     / nullif(len(w), 0) > 0.01) AS q_ok,
       |  len(list_filter(w, x -> list_contains(['the','a','is','and','of'], x))) AS en_hits,
       |  len(list_filter(w, x -> list_contains(['el','la','los','es','y'], x))) AS es_hits,
       |  len(list_filter(w, x -> list_contains(['le','la','les','est','et'], x))) AS fr_hits,
       |  len(list_filter(w, x -> list_contains(['der','die','das','ist','und'], x))) AS de_hits
       |  FROM t),
       |l AS (SELECT *, (NOT (en_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND de_hits = 0)
       |  AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits) AS is_en
       |  FROM f),
       |s1 AS (SELECT * FROM l WHERE in_train),
       |s2 AS (SELECT * FROM s1 WHERE q_ok),
       |s3 AS (SELECT *, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
       |  FROM s2 WHERE is_en),
       |s4 AS (SELECT * FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS rep FROM s3)
       |  WHERE doc_id = rep),
       |g AS (SELECT DISTINCT doc_id,
       |  CAST(('0x' || substr(md5($gram), 1, 15)) AS BIGINT) AS h
       |  FROM s4, unnest(range(0, greatest(len(w) - 7, 0))) AS tt(i)),
       |hg AS (SELECT DISTINCT
       |  CAST(('0x' || substr(md5($gram), 1, 15)) AS BIGINT) AS h
       |  FROM t, unnest(range(0, greatest(len(w) - 7, 0))) AS tt(i)
       |  WHERE bucket >= 216),
       |bad AS (SELECT DISTINCT g.doc_id FROM g JOIN hg USING (h)),
       |s5 AS (SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM bad))
       |SELECT 'split' AS stage, 'all' AS src, count(*) AS n_docs,
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM s1
       |UNION ALL SELECT 'quality', 'all', count(*),
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s2
       |UNION ALL SELECT 'lang', 'all', count(*),
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s3
       |UNION ALL SELECT 'dedup', 'all', count(*),
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s4
       |UNION ALL SELECT 'clean', 'all', count(*),
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s5
       |UNION ALL SELECT 'clean_src', source, count(*),
       |  CAST(sum(n_tokens) AS BIGINT) FROM s5 GROUP BY source""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation" -> ((s, d) => qCuration(s, d)),
    "q_dsir_select" -> ((s, d) => qDsirSelect(s, d)),
    "q_mixture" -> ((s, d) => qMixture(s, d)),
    "q_pack" -> ((s, d) => qPack(s, d)),
    "q_vocab_growth" -> ((s, d) => qVocabGrowth(s, d)),
    "q_dedup_rate" -> ((s, d) => qDedupRate(s, d)),
    "q_cluster_rep" -> ((s, d) => qClusterRep(s, d)),
    "q_epoch_shuffle" -> ((s, d) => qEpochShuffle(s, d)))

  def oracles: Map[String, String] = Map(
    "q_curation" -> qCurationSql,
    "q_dsir_select" -> qDsirSelectSql,
    "q_mixture" -> qMixtureSql,
    "q_pack" -> qPackSql,
    "q_vocab_growth" -> qVocabGrowthSql,
    "q_dedup_rate" -> qDedupRateSql,
    "q_cluster_rep" -> qClusterRepSql,
    "q_epoch_shuffle" -> qEpochShuffleSql)
}
