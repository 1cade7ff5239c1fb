package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew handling (SURVEY.md §2.2 / §5).
  *
  * At 100 TB the failure mode of a shuffled equi-join is one hot key
  * pinning one reducer. Two defenses ship here:
  *  1. AQE skew-join splitting — enabled via session conf (the default
  *     path; splits oversized partitions at runtime).
  *  2. Explicit salting — for engines/pipelines where AQE can't see the
  *     skew (e.g. the hot key is hot AFTER a filter AQE planned around).
  *     `saltedJoin` spreads each big-side key over `factor` salted
  *     sub-keys and replicates the small side `factor`×, turning one
  *     hot reducer into `factor` even ones at the cost of a bounded
  *     small-side blowup.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted into
    * `factor` sub-keys. Result is identical to the unsalted join for
    * any salt assignment, so the salt derives from a cheap hash of the
    * row id — no randomness, reproducible plans.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(abs(xxhash64(monotonically_increasing_id())), lit(factor)).cast("int"))
    val reps = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(reps, Seq(key, "__salt")).drop("__salt")
  }

  // Demonstration query: lineitem joined to its order priorities via a
  // salted join (o_orderkey fan-out is bounded here, but the plan shape
  // is the one you'd deploy against a hot key). Oracle: the plain join
  // — result equality IS the correctness property of salting.
  def qSaltedJoin(s: SparkSession, d: String): DataFrame =
    saltedJoin(
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity"),
      Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
      "l_orderkey", factor = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 4).as("sum_qty"))

  val qSaltedJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  round(sum(l_quantity), 4) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_join" -> qSaltedJoin)

  def oracles: Map[String, String] = Map(
    "q_salted_join" -> qSaltedJoinSql)
}
