package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{bloom_might_contain, BloomKernel}

/** B26 — semi-join pushdown via a broadcast Bloom filter.
  *
  * The 100 TB shape: a fact⋈dim semi join where the dim key set is too
  * big to broadcast as a hash table (10⁹ keys ≈ tens of GB) but its
  * Bloom filter fits anywhere (~10 bits/key). The filter is built in
  * ONE distributed pass (per-partition partial bitsets, OR-merged
  * through an aggregate whose shuffle carries at most `numWords` rows
  * per partition — never keys), ships to executors as a plain `long[]`
  * reference object, and the probe runs inside whole-stage codegen
  * directly above the scan. The pre-filter removes the non-matching
  * ~94% of the fact table BEFORE the exact join, which at scale is the
  * difference between shuffling 100 TB and shuffling the matching few
  * TB; the exact join on top clears the false positives, so results
  * are exact (Bloom has no false negatives). Spark's AQE runtime
  * bloom filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * inject this automatically per-query; the explicit operator makes
  * the filter REUSABLE — built once, applied to every query touching
  * the fact table, the lakehouse "join index" pattern.
  */
object BloomJoin {

  /** Build an m = numWords·64 bit Bloom filter (k probes per key) over
    * a key column. The only driver-side data is the bitset itself —
    * the same object any engine would broadcast.
    */
  def buildBloom(df: DataFrame, keyCol: String, numWords: Int, k: Int): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = numWords * 64
    val partial = df.select(col(keyCol).cast("long")).na.drop().distinct()
      .as[Long]
      .mapPartitions { it =>
        val arr = new Array[Long](numWords)
        it.foreach { x =>
          var i = 0
          while (i < k) {
            val p = BloomKernel.pos(x, i, m)
            arr(p >>> 6) |= 1L << (p & 63)
            i += 1
          }
        }
        Iterator.range(0, numWords).filter(arr(_) != 0L).map(w => (w, arr(w)))
      }
      .toDF("w", "mask")
      .groupBy("w").agg(bit_or(col("mask")).as("mask"))
      .collect()
    val bits = new Array[Long](numWords)
    partial.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** Per-supplier lineitem volume for one nation's suppliers: Bloom
    * pre-filter (built on the dim side) → exact semi join → aggregate.
    * The oracle is the PLAIN semi join — correctness must not depend
    * on the filter, only the plan shape does.
    */
  def qBloomSemi(s: SparkSession, d: String): DataFrame = {
    val supp = Tables.supplier(s, d)
      .filter(col("s_nationkey") === 7).select("s_suppkey")
    val bits = buildBloom(supp, "s_suppkey", numWords = 128, k = 5)
    Tables.lineitem(s, d).select("l_suppkey", "l_quantity")
      .filter(bloom_might_contain(col("l_suppkey"), bits, 5))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
  }

  val qBloomSemiSql: String =
    """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 7)
      |GROUP BY l_suppkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_semi" -> qBloomSemi)

  def oracles: Map[String, String] = Map(
    "q_bloom_semi" -> qBloomSemiSql)
}
