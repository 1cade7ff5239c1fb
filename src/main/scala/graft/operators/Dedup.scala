package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.vec_cosine

/** Deduplication block (SURVEY.md §2.4) — exact and near-dup detection
  * over the documents/embeddings tables.
  *
  * Scale design: nothing here is O(n²) except the final verification of
  * candidate pairs. Shingles/bands build an inverted index (explode +
  * shuffle on the shingle/band key), so cost is O(corpus) + O(candidate
  * pairs) — the standard MinHash-LSH layout for web-scale dedup. All
  * hashing is md5-based and engine-agnostic, so the DuckDB oracle can
  * replay it bit-for-bit.
  */
object Dedup {

  val NumHashes = 12
  val NumBands = 4 // 3 rows per band

  /** Distinct 3-word shingles per document: (doc_id, sh). */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", raw"filter(split(text, '\\s+'), x -> x <> '') AS w")
      .selectExpr("doc_id",
        """CASE WHEN size(w) >= 3
          |  THEN transform(sequence(1, size(w) - 2), i -> array_join(slice(w, i, 3), ' '))
          |  ELSE array() END AS shs""".stripMargin)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .distinct()

  /** Shared CTE prefix mirroring [[shingles]] in DuckDB SQL. */
  private val shinglesCte: String =
    """WITH toks AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sh AS (SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh
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
    val sh = shingles(Tables.documents(s, d)).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
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
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(inter::DOUBLE / (ca.n + cb.n - inter), 4) AS jaccard
        |FROM p JOIN c ca ON doc_a = ca.doc_id JOIN c cb ON doc_b = cb.doc_id
        |WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.5""".stripMargin

  /** D3 — MinHash signatures: k md5-seeded min-hashes per doc, computed
    * in ONE aggregation over the exploded shingles (k min() aggregates,
    * map-side partial).
    */
  def minhash(docs: DataFrame, k: Int = NumHashes): DataFrame = {
    val aggs = (0 until k).map { i =>
      min(md5(concat(lit(f"s$i%02d|"), col("sh")))).as(f"mh$i%02d")
    }
    shingles(docs).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  def qMinhash(s: SparkSession, d: String): DataFrame =
    minhash(Tables.documents(s, d))

  val qMinhashSql: String = {
    val cols = (0 until NumHashes)
      .map(i => f"  min(md5('s$i%02d|' || sh)) AS mh$i%02d")
      .mkString(",\n")
    shinglesCte + s"\nSELECT doc_id,\n$cols\nFROM sh GROUP BY doc_id"
  }

  /** D4 — LSH candidate pairs: hash each band of the signature to a
    * bucket key, join docs sharing a bucket. Probability of a pair
    * surfacing ≈ 1-(1-j^rows)^bands — the classic S-curve.
    */
  def lshCandidates(docs: DataFrame, k: Int = NumHashes, bands: Int = NumBands): DataFrame = {
    val rows = k / bands
    val sigs = minhash(docs, k)
    val bandSig: Int => Column = b =>
      md5(concat((b * rows until (b + 1) * rows).map(i => col(f"mh$i%02d")): _*))
    val bandCols = (0 until bands).map(b => struct(lit(b).as("band"), bandSig(b).as("sig")))
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  def qMinhashLsh(s: SparkSession, d: String): DataFrame =
    lshCandidates(Tables.documents(s, d))

  val qMinhashLshSql: String = {
    val rows = NumHashes / NumBands
    val mh = (0 until NumHashes)
      .map(i => f"  min(md5('s$i%02d|' || sh)) AS mh$i%02d")
      .mkString(",\n")
    val bandSelects = (0 until NumBands).map { b =>
      val cat = (b * rows until (b + 1) * rows).map(i => f"mh$i%02d").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS sig FROM mh"
    }.mkString("\n  UNION ALL ")
    shinglesCte +
      s""",
         |mh AS (SELECT doc_id,\n$mh\n  FROM sh GROUP BY doc_id),
         |buckets AS (\n  $bandSelects)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin
  }

  // D5 — SimHash: 60-bit fingerprint by per-bit voting over token
  // hashes weighted by term frequency. Two chained aggregations
  // (doc×bit votes → doc fingerprint), both with map-side partials.
  def qSimhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(raw"filter(split(text, '\\s+'), x -> x <> '')")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", expr("CAST(conv(substr(md5(word), 1, 15), 16, 10) AS BIGINT)"))
      .select(col("doc_id"), col("cnt"), col("h"), explode(expr("sequence(0, 59)")).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(expr("cnt * (CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END)")).as("vote"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) ELSE CAST(0 AS BIGINT) END")).as("simhash"))

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
      |  sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS simhash
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_jaccard_pairs" -> ((s, d) => qJaccardPairs(s, d)),
    "q_minhash" -> qMinhash,
    "q_minhash_lsh" -> qMinhashLsh,
    "q_simhash" -> qSimhash,
    "q_embed_dup" -> ((s, d) => qEmbedDup(s, d)))

  def oracles: Map[String, String] = Map(
    "q_dedup_exact" -> qDedupExactSql,
    "q_jaccard_pairs" -> qJaccardPairsSql,
    "q_minhash" -> qMinhashSql,
    "q_minhash_lsh" -> qMinhashLshSql,
    "q_simhash" -> qSimhashSql,
    "q_embed_dup" -> qEmbedDupSql)
}
