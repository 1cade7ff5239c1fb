package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.vec_cosine

/** Deduplication block (SURVEY.md §2.4) — exact and near-dup detection
  * over the documents/embeddings tables.
  *
  * Scale design: nothing here is O(n²) except the final verification of
  * candidate pairs. Shingles/bands build an inverted index (explode +
  * shuffle on the shingle/band key), so cost is O(corpus) + O(candidate
  * pairs) — the standard MinHash-LSH layout for web-scale dedup.
  *
  * All hashing is md5-derived and immediately folded to 60-bit BIGINTs:
  * engine-agnostic (the DuckDB oracle replays it bit-for-bit) AND
  * HashAggregate-friendly — min()/group-by over fixed-width longs stays
  * in whole-stage codegen, where min() over strings would fall back to
  * SortAggregate and sort the corpus per aggregation.
  */
object Dedup {

  val NumHashes = 12
  val NumBands = 4 // 3 rows per band

  /** 60-bit integer from the leading 15 hex chars of md5. */
  private def h60(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** Distinct 3-word shingles per document, as 60-bit hashes:
    * (doc_id, h). Collisions (~2^-60) hit both engines identically.
    */
  def shingles(docs: DataFrame): DataFrame =
    // cached: every operator in the dedup family starts from this index
    // (jaccard, minhash, LSH, pipeline) and Spark's CacheManager matches
    // the canonicalized plan, so one materialization serves them all —
    // the batch-job layout where the shingle index is built once per
    // corpus. Bounded: distinct (doc_id, 60-bit hash) longs.
    docs
      .selectExpr("doc_id", raw"filter(split(text, '\\s+'), x -> x <> '') AS w")
      // row-level guard, NOT a CASE around the lambda: conditionals
      // wrapping a higher-order function drop it out of codegen into
      // per-row interpreted evaluation (measured 25x slower)
      .where("size(w) >= 3")
      .selectExpr("doc_id",
        // three O(1) element_at lookups, not slice+array_join (which
        // copies a subarray per shingle in the interpreted HOF path)
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))) AS shs")
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .selectExpr("doc_id", s"${h60("sh")} AS h")
      .distinct()
      .cache()

  /** Shared CTE prefix mirroring [[shingles]] in DuckDB SQL. */
  private val shinglesCte: String =
    """WITH toks AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  CAST(('0x' || substr(md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]), 1, 15)) AS BIGINT) AS h
      |  FROM toks, unnest(range(0, greatest(len(w) - 2, 0))) AS t(i))""".stripMargin

  // D1 — exact dedup: group by content hash, keep the min doc_id.
  // At 100 TB this is one shuffle on a 128-bit key; the text column
  // never moves, only (hash, id).
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))

  val qDedupExactSql: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_copies,
      |  min(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text)""".stripMargin

  // D2 — n-gram Jaccard near-dup pairs via inverted shingle index:
  // join docs through shared shingles (never all-pairs), then exact
  // Jaccard on the intersection counts.
  def qJaccardPairs(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val sh = shingles(Tables.documents(s, d))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // posting-list formulation: one shuffle on the shingle hash, pairs
    // generated inside each posting (sorted, so doc_a < doc_b for free)
    // — no self-join, so the shingle pipeline runs once, and partial
    // aggregation compresses (doc_a, doc_b) counts map-side.
    val inter = sh
      .groupBy("h")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .selectExpr(
        """explode(flatten(transform(ids,
          |  (x, i) -> transform(slice(ids, i + 2, size(ids)),
          |    y -> struct(x AS doc_a, y AS doc_b))))) AS p""".stripMargin)
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(sizes.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  val qJaccardPairsSql: String =
    shinglesCte +
      """,
        |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(inter::DOUBLE / (ca.n + cb.n - inter), 4) AS jaccard
        |FROM p JOIN c ca ON doc_a = ca.doc_id JOIN c cb ON doc_b = cb.doc_id
        |WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.5""".stripMargin

  /** D3 — MinHash signatures: k seeded 60-bit min-hashes per doc,
    * computed in ONE HashAggregate over the exploded shingles (k min()
    * aggregates over longs, map-side partial).
    */
  def minhash(docs: DataFrame, k: Int = NumHashes): DataFrame = {
    val aggs = (0 until k).map { i =>
      min(expr(h60(f"concat('s$i%02d|', CAST(h AS STRING))"))).as(f"mh$i%02d")
    }
    shingles(docs).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  private def minhashSelectSql: String = {
    val cols = (0 until NumHashes)
      .map(i =>
        f"  min(CAST(('0x' || substr(md5('s$i%02d|' || CAST(h AS VARCHAR)), 1, 15)) AS BIGINT)) AS mh$i%02d")
      .mkString(",\n")
    s"SELECT doc_id,\n$cols\nFROM sh GROUP BY doc_id"
  }

  def qMinhash(s: SparkSession, d: String): DataFrame =
    minhash(Tables.documents(s, d))

  val qMinhashSql: String = shinglesCte + "\n" + minhashSelectSql

  /** D4 — LSH candidate pairs: hash each signature band to a 60-bit
    * bucket key, group docs by bucket, emit pairs within a bucket.
    * Single pipeline pass (no self-join recompute): shingles → minhash
    * → band buckets → collect per bucket → pairs. Probability of a
    * pair surfacing ≈ 1-(1-j^rows)^bands — the classic S-curve.
    * Pathological buckets (mass-duplicated content) are capped at
    * `maxBucket` docs, the standard guard against quadratic blowup on
    * boilerplate at web scale.
    */
  def lshCandidates(docs: DataFrame, k: Int = NumHashes, bands: Int = NumBands,
      maxBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    val sigs = minhash(docs, k)
    val bandCols = (0 until bands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => f"CAST(mh$i%02d AS STRING)").mkString(", ")
      struct(lit(b).as("band"), expr(h60(s"concat_ws('|', $cat)")).as("sig"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .groupBy(col("bs.band").as("band"), col("bs.sig").as("sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .selectExpr(
        """explode(flatten(transform(ids,
          |  (x, i) -> transform(slice(ids, i + 2, size(ids)),
          |    y -> struct(x AS doc_a, y AS doc_b))))) AS p""".stripMargin)
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  def qMinhashLsh(s: SparkSession, d: String): DataFrame =
    lshCandidates(Tables.documents(s, d))

  val qMinhashLshSql: String = {
    val rows = NumHashes / NumBands
    val bandSelects = (0 until NumBands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => f"CAST(mh$i%02d AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, CAST(('0x' || substr(md5($cat), 1, 15)) AS BIGINT) AS sig FROM mh"
    }.mkString("\n  UNION ALL ")
    // mirrors lshCandidates exactly, INCLUDING the maxBucket cap
    shinglesCte +
      s""",
         |mh AS (\n$minhashSelectSql),
         |buckets AS (\n  $bandSelects),
         |sized AS (
         |  SELECT doc_id, band, sig, count(*) OVER (PARTITION BY band, sig) AS bsz
         |  FROM buckets)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM sized a JOIN sized b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |WHERE a.bsz <= 1000""".stripMargin
  }

  // D5 — SimHash: 60-bit fingerprint by per-bit voting over token
  // hashes weighted by term frequency. The 60 bit-votes are 60 agg
  // columns in ONE HashAggregate (not a 60× row explosion): one
  // shuffle of (doc, word) counts, then a width-60 reduction.
  def qSimhash(s: SparkSession, d: String): DataFrame = {
    val votes = (0 until 60).map { b =>
      sum(expr(s"cnt * (CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)")).as(s"v$b")
    }
    val fp = (0 until 60)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b}L ELSE 0L END)")
      .mkString(" + ")
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(raw"filter(split(text, '\\s+'), x -> x <> '')")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", expr(h60("word")))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .selectExpr("doc_id", s"$fp AS simhash")
  }

  val qSimhashSql: String =
    """WITH tok AS (
      |  SELECT doc_id, word, count(*) AS cnt,
      |    CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
      |        FROM documents) t
      |  WHERE word <> '' GROUP BY doc_id, word),
      |votes AS (
      |  SELECT doc_id, i AS bit,
      |    sum(cnt * (CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) AS vote
      |  FROM tok, unnest(range(0, 60)) AS b(i)
      |  GROUP BY doc_id, i)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
      |FROM votes GROUP BY doc_id""".stripMargin

  // D6 — embedding near-dup: exact cosine over candidate pairs. Kept
  // all-pairs here (the verification kernel); the scale path prunes
  // candidates with Similarity.lsh buckets first.
  def qEmbedDup(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(vec_cosine(col("a.embedding"), col("b.embedding")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }

  val qEmbedDupSql: String =
    """WITH n AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 4) AS cos_sim
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE round(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 4) >= 0.4""".stripMargin

  // D7 — end-to-end dedup pipeline: the corpus with near-duplicates
  // removed. Candidates from the LSH/jaccard path, greedy keep-lowest-id
  // (any doc that is the higher id of a verified pair is dropped), then
  // an anti join back to the corpus. At 100 TB: candidates are tiny
  // relative to the corpus, so this is one broadcast-able anti join.
  def qDedupPipeline(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val drop = qJaccardPairs(s, d, tau).select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, d)
      .join(drop, Seq("doc_id"), "left_anti")
      .select("doc_id", "source", "lang", "n_chars")
  }

  val qDedupPipelineSql: String =
    shinglesCte +
      """,
        |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |drop AS (SELECT DISTINCT doc_b AS doc_id FROM p
        |  JOIN c ca ON doc_a = ca.doc_id JOIN c cb ON doc_b = cb.doc_id
        |  WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.5)
        |SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM drop)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_pipeline" -> ((s, d) => qDedupPipeline(s, d)),
    "q_dedup_exact" -> qDedupExact,
    "q_jaccard_pairs" -> ((s, d) => qJaccardPairs(s, d)),
    "q_minhash" -> qMinhash,
    "q_minhash_lsh" -> qMinhashLsh,
    "q_simhash" -> qSimhash,
    "q_embed_dup" -> ((s, d) => qEmbedDup(s, d)))

  def oracles: Map[String, String] = Map(
    "q_dedup_pipeline" -> qDedupPipelineSql,
    "q_dedup_exact" -> qDedupExactSql,
    "q_jaccard_pairs" -> qJaccardPairsSql,
    "q_minhash" -> qMinhashSql,
    "q_minhash_lsh" -> qMinhashLshSql,
    "q_simhash" -> qSimhashSql,
    "q_embed_dup" -> qEmbedDupSql)
}
