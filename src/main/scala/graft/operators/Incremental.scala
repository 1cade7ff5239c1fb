package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B27 — incremental aggregate maintenance (the materialized-view /
  * incremental-ETL pattern): a pre-aggregated state table is advanced
  * by a new batch WITHOUT rescanning history. Works for any algebraic
  * aggregate — keep the partial state (counts and sums), merge states
  * by key, derive the final measures (avg = sum/cnt) at read time.
  *
  * Scale design: this is what turns a 100 TB daily full re-aggregation
  * into a |state| + |batch| job — the state table is keyed by the
  * grouping columns (bounded by group cardinality, not fact rows) and
  * the merge is one shuffle of two small relations. The same state
  * shape is what Spark's own partial aggregation exchanges between
  * map and reduce sides; here it is persisted across runs.
  */
object Incremental {

  /** Merge two aggregate states (cnt/sum_qty/sum_price per key). */
  def mergeAggState(prev: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    prev.unionByName(batch)
      .groupBy(keys.map(col): _*)
      .agg(sum("cnt").as("cnt"),
        sum("sum_qty").as("sum_qty"),
        sum("sum_price").as("sum_price"))

  /** Partial-aggregate state of a lineitem slice. */
  private def aggState(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_price"))

  /** History state + new batch, finalized; the oracle is the FULL
    * aggregate over everything — incremental maintenance must be
    * indistinguishable from recomputation.
    */
  def qIncrAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice")
    // "history" was aggregated in a previous run; today's "batch" is
    // the newly-landed 10% — the split is deterministic so both
    // engines see the same partition of the data
    val state = aggState(li.filter(col("l_orderkey") % 10 =!= 0))
    val batch = aggState(li.filter(col("l_orderkey") % 10 === 0))
    mergeAggState(state, batch, Seq("l_returnflag", "l_linestatus"))
      .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
        round(col("sum_qty"), 4).as("sum_qty"),
        round(col("sum_price"), 4).as("sum_price"),
        round(col("sum_qty") / col("cnt"), 4).as("avg_qty"))
  }

  val qIncrAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_price,
      |  round(sum(l_quantity) / count(*), 4) AS avg_qty
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incr_agg" -> qIncrAgg)

  def oracles: Map[String, String] = Map(
    "q_incr_agg" -> qIncrAggSql)
}
