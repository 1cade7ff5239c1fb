package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B28 — mergeable sketches beyond HLL (B15): count-min heavy hitters
  * and approximate quantiles. Both are one-pass, fixed-size summaries
  * whose per-partition states merge associatively — the only
  * aggregation shapes that stay cheap at 100 TB when the exact answer
  * would need a full shuffle of the key space (heavy hitters) or a
  * global sort (quantiles).
  *
  * Correctness story: the count-min sketch here is DETERMINISTIC given
  * (data, seed) — Carter-Wegman universal hashing h_i(x) = ((a_i·x +
  * b_i) mod p) mod width with p = 2^31−1, so every intermediate fits a
  * signed 64-bit product and the DuckDB oracle replays the whole
  * build+probe bit-for-bit (full rows+schema+hash check). The
  * eps·N overcount bound additionally holds by the standard CMS
  * argument (pairwise-independent rows) and is spec-asserted. The GK
  * quantiles stay rows-only (engine-internal summary, like B15's HLL).
  */
object Sketches {

  /** Mersenne prime 2^31−1: keys and multipliers both fold below 2^31,
    * so a·x + b < 2^62 — exact in BIGINT in Spark AND DuckDB, no
    * overflow-wrap emulation, ANSI-safe. */
  val CmsPrime = 2147483647L

  /** Per-row (a, b) hash coefficients, derived deterministically from
    * the seed so the DuckDB oracle can embed them as literals. */
  def cmsParams(depth: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(depth)((
      math.floorMod(rnd.nextLong(), CmsPrime - 1) + 1, // a ∈ [1, p−1]
      math.floorMod(rnd.nextLong(), CmsPrime)))        // b ∈ [0, p−1]
  }

  def cmsBucket(key: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(key.cast("long"), lit(CmsPrime)) * lit(a) + lit(b), lit(CmsPrime)) % width

  /** The sketch as a DataFrame: depth×width counters, built in one
    * distributed pass (explode to depth rows per fact row; map-side
    * partial agg collapses each partition to ≤ depth·width partials,
    * so the exchange carries the sketch, not the data — the mergeable-
    * summary property, expressed as a groupBy). */
  def cmsTable(fact: DataFrame, factCol: String,
      depth: Int, width: Int, seed: Long): DataFrame = {
    val buckets = cmsParams(depth, seed).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row_i"), cmsBucket(col(factCol), a, b, width).as("bucket"))
    }
    fact.select(explode(array(buckets.toIndexedSeq: _*)).as("rb"))
      .groupBy(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimated frequency of every key in `candidates` (a DataFrame —
    * the probe stays distributed; no driver-side key loop). The sketch
    * is ≤ depth·width rows, so it broadcasts; estimate = min over rows
    * of the matching counter, 0 for never-hit buckets.
    */
  def cmsEstimates(fact: DataFrame, factCol: String, candidates: DataFrame,
      depth: Int = 7, width: Int = 2000, seed: Long = 42L): DataFrame = {
    val keyCol = candidates.columns.head
    val table = cmsTable(fact, factCol, depth, width, seed)
    val buckets = cmsParams(depth, seed).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row_i"), cmsBucket(col(keyCol), a, b, width).as("bucket"))
    }
    candidates
      .select(col(keyCol), explode(array(buckets.toIndexedSeq: _*)).as("rb"))
      .select(col(keyCol), col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .join(broadcast(table), Seq("row_i", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  // depth 7 / width 2000 = the eps=0.001, confidence=0.99 sizing
  // (width = ceil(2/eps), depth = ceil(log2(1/(1−conf))))
  def qHeavyHitters(s: SparkSession, d: String): DataFrame =
    cmsEstimates(Tables.lineitem(s, d), "l_suppkey",
      Tables.supplier(s, d).select(col("s_suppkey").as("l_suppkey")))

  /** DuckDB replay of [[qHeavyHitters]]: same (a, b) literals, same
    * mod-arithmetic buckets, same min-over-rows probe. */
  val qHeavyHittersSql: String = {
    val params = cmsParams(7, 42L).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH params(row_i, a, b) AS (VALUES $params),
       |tbl AS (
       |  SELECT row_i, ((l_suppkey % $CmsPrime * a + b) % $CmsPrime) % 2000 AS bucket,
       |    count(*) AS cnt
       |  FROM lineitem CROSS JOIN params GROUP BY 1, 2),
       |probe AS (
       |  SELECT s.s_suppkey AS l_suppkey, p.row_i,
       |    ((s.s_suppkey % $CmsPrime * p.a + p.b) % $CmsPrime) % 2000 AS bucket
       |  FROM supplier s CROSS JOIN params p)
       |SELECT pr.l_suppkey, CAST(min(coalesce(t.cnt, 0)) AS BIGINT) AS est_cnt
       |FROM probe pr LEFT JOIN tbl t USING (row_i, bucket)
       |GROUP BY pr.l_suppkey""".stripMargin
  }

  /** Greenwald-Khanna approximate quantiles (`approxQuantile`) of a
    * fact column — rank error bounded by relativeError·n, single pass,
    * mergeable per-partition summaries.
    *
    * The output carries the error ENVELOPE, measured exactly: each row
    * is (p, estimate, rank_lo, rank_hi, n, rank_err) where [rank_lo,
    * rank_hi] is the estimate's exact rank interval (ties make it an
    * interval) from ONE conditional-aggregate pass over the fact table,
    * and rank_err = the distance from that interval to the target band
    * p·n ± eps·n, as a fraction of n — 0.0 when the GK guarantee holds.
    * r9 (the r8 verdict's item 8): [[qApproxQuantile]] projects this to
    * the ORACLE-GATE shape (p, n, within_bound) whose DuckDB hash
    * asserts `TRUE AS within_bound` — an estimate drifting out of its
    * envelope fails CORRECTNESS, not just a spec. The estimate and its
    * rank interval stay in this detail artifact, where
    * non-reproducibility doesn't matter; the spec asserts the bound
    * against an independently sorted copy.
    */
  def qApproxQuantileDetail(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val probs = Array(0.25, 0.5, 0.75, 0.95, 0.99)
    val eps = 0.001
    val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
    val qs = li.stat.approxQuantile("v", probs, eps)
    // exact rank interval of all 5 estimates in one distributed pass
    val aggs = probs.indices.flatMap(i => Seq(
      sum(when(col("v") < qs(i), 1L).otherwise(0L)).as(s"lt_$i"),
      sum(when(col("v") <= qs(i), 1L).otherwise(0L)).as(s"le_$i")))
    val row = li.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = row.getAs[Long]("n")
    val out = probs.indices.map { i =>
      val rankLo = row.getAs[Long](s"lt_$i") + 1L
      val rankHi = row.getAs[Long](s"le_$i")
      val bandLo = (probs(i) - eps) * n
      val bandHi = (probs(i) + eps) * n
      val err = math.max(0.0,
        math.max(bandLo - rankHi, rankLo - bandHi)) / n
      (probs(i), qs(i), rankLo, rankHi, n,
        BigDecimal(err).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out.toDF("p", "estimate", "rank_lo", "rank_hi", "n", "rank_err")
  }

  /** The gate shape: the verdict column the oracle hash covers. */
  def qApproxQuantile(s: SparkSession, d: String): DataFrame =
    qApproxQuantileDetail(s, d)
      .select(col("p"), col("n"), (col("rank_err") === 0.0).as("within_bound"))

  val qApproxQuantileSql: String =
    """SELECT CAST(p AS DOUBLE) AS p,
      |  (SELECT count(*) FROM lineitem) AS n,
      |  TRUE AS within_bound
      |FROM (VALUES (0.25), (0.5), (0.75), (0.95), (0.99)) t(p)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> qHeavyHitters,
    "q_approx_quantile" -> qApproxQuantile)

  /** The CMS is deterministic given (data, seed) → full oracle; the GK
    * gate asserts its measured envelope (within_bound) under the hash. */
  def oracles: Map[String, String] = Map(
    "q_heavy_hitters" -> qHeavyHittersSql,
    "q_approx_quantile" -> qApproxQuantileSql)
}
