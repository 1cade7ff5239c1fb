package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Benchmark decontamination (F15) — the pretraining hygiene pass that
  * finds training documents sharing long word n-grams with an
  * evaluation/holdout set, so leaked eval content can be dropped before
  * training.
  *
  * Scale design: both sides reduce to DISTINCT (doc, 60-bit gram hash)
  * rows — the text never moves. The eval side is, by contract, a
  * benchmark suite (tiny next to a 100 TB corpus), so its distinct gram
  * set is broadcast: the contamination check is then a map-side
  * broadcast semi-join over the training grams, no shuffle of the big
  * side at all. Here the "eval set" is the F6 content-addressed holdout
  * split, which makes the operator a pure function of the corpus (no
  * side inputs) and lets the DuckDB oracle replay it bit-for-bit.
  */
object Decontam {

  val GramN = 8

  /** Distinct (doc_id, h) 8-gram hashes — the shingle builder's
    * slice/zip shape (Dedup.buildShingleIndex) generalized to n=8:
    * n shifted slices zipped positionally, all codegen'd.
    */
  private def gramHashes(docs: DataFrame, n: Int = GramN): DataFrame = {
    val names = (0 until n).map(i => s"g$i")
    val nGrams = size(col("w")) - (n - 1)
    val zipped: Column = arrays_zip(
      names.zipWithIndex.map { case (nm, i) =>
        slice(col("w"), lit(i + 1), nGrams).as(nm)
      }: _*)
    docs
      .selectExpr("doc_id", s"${TextAnalysis.wordsExpr} AS w")
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(zipped).as("z"))
      .selectExpr("doc_id",
        "CAST(conv(substr(md5(concat_ws(' ', " +
          names.map(nm => s"z.$nm").mkString(", ") + ")), 1, 15), 16, 10) AS BIGINT) AS h")
      .distinct()
  }

  /** Doc ids of `train` rows sharing at least one n-gram with the
    * `holdout` relation — the reusable pipeline form (both args any
    * (doc_id, text) relation).
    */
  def contaminatedIds(train: DataFrame, holdout: DataFrame): DataFrame =
    gramHashes(train)
      .join(broadcast(gramHashes(holdout).select("h").distinct()), "h")
      .select("doc_id").distinct()

  /** F15 — contaminated training docs: every train-split doc sharing at
    * least one 8-gram with the holdout split, with the distinct-gram
    * overlap count and fraction.
    */
  def qDecontam(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("bucket", expr(TextAnalysis.bucketExpr))
    val train = gramHashes(docs.where(col("bucket") < 216))
    val holdout = gramHashes(docs.where(col("bucket") >= 216))
      .select("h").distinct()
    val totals = train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = train.join(broadcast(holdout), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
    hits.join(totals, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_hit_grams"),
        round(col("n_hit_grams").cast("double") / col("n_grams"), 4)
          .as("hit_frac"))
  }

  val qDecontamSql: String = {
    val gram = (1 to GramN).map(i => s"w[i+$i]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id,
       |  CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2)) AS BIGINT) AS bucket,
       |  list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |g AS (SELECT DISTINCT doc_id, bucket,
       |  CAST(('0x' || substr(md5($gram), 1, 15)) AS BIGINT) AS h
       |  FROM toks, unnest(range(0, greatest(len(w) - ${GramN - 1}, 0))) AS t(i)),
       |tg AS (SELECT doc_id, h FROM g WHERE bucket < 216),
       |hg AS (SELECT DISTINCT h FROM g WHERE bucket >= 216),
       |tot AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id),
       |hit AS (SELECT doc_id, count(*) AS n_hit_grams
       |  FROM tg JOIN hg USING (h) GROUP BY doc_id)
       |SELECT hit.doc_id, n_grams, n_hit_grams,
       |  round(n_hit_grams::DOUBLE / n_grams, 4) AS hit_frac
       |FROM hit JOIN tot ON hit.doc_id = tot.doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontam" -> qDecontam)

  def oracles: Map[String, String] = Map(
    "q_decontam" -> qDecontamSql)
}
