package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B28 — mergeable sketches beyond HLL (B15): count-min heavy hitters
  * and approximate quantiles. Both are one-pass, fixed-size summaries
  * whose per-partition states OR/merge associatively — the only
  * aggregation shapes that stay cheap at 100 TB when the exact answer
  * would need a full shuffle of the key space (heavy hitters) or a
  * global sort (quantiles).
  *
  * Correctness story: both are approximate, so neither can be
  * hash-oracled; the specs assert the published error bounds against
  * the exact answers instead (one-sided eps·N overcount for count-min,
  * rank error ≤ relativeError·n for the Greenwald-Khanna quantiles),
  * and the driver records rows-only — the same treatment as B15.
  */
object Sketches {

  /** Estimated frequencies of a candidate key set via a count-min
    * sketch built in one distributed pass over the fact column. The
    * candidate set (here: the supplier dim — at scale, any bounded
    * side input) keeps the probe phase off the fact table entirely.
    */
  def cmsEstimates(fact: DataFrame, factCol: String,
      candidates: Seq[Long], eps: Double, confidence: Double): DataFrame = {
    val spark = fact.sparkSession
    import spark.implicits._
    val cms = fact.stat.countMinSketch(
      col(factCol), eps = eps, confidence = confidence, seed = 42)
    candidates.sorted
      .map(k => (k, cms.estimateCount(k)))
      .toDF(factCol, "est_cnt")
  }

  def qHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.supplier(s, d)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSeq
    cmsEstimates(Tables.lineitem(s, d), "l_suppkey", keys,
      eps = 0.001, confidence = 0.99)
  }

  /** Greenwald-Khanna approximate quantiles (`approxQuantile`) of a
    * fact column — rank error bounded by relativeError·n, single pass,
    * mergeable per-partition summaries.
    */
  def qApproxQuantile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val probs = Array(0.25, 0.5, 0.75, 0.95, 0.99)
    val qs = Tables.lineitem(s, d).stat
      .approxQuantile("l_extendedprice", probs, 0.001)
    probs.zip(qs).toSeq.toDF("p", "value")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> qHeavyHitters,
    "q_approx_quantile" -> qApproxQuantile)

  /** Approximate by construction — rows-only, like B15. */
  def oracles: Map[String, String] = Map.empty
}
