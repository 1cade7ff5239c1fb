package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing queries for the native-plan block (SURVEY.md §2.2
  * B18). The query deliberately layers a key-only filter ON TOP of the
  * operator so the oracle also proves [[PushFilterThroughTopKPerKey]]
  * semantically correct: if sinking the predicate below the top-k
  * changed results, the row_number formulation (filter applied to the
  * full ranking) would diverge.
  */
object Native {

  def qTopkNative(s: SparkSession, d: String): DataFrame =
    NativeTopK.topKPerKey(
      Tables.orders(s, d),
      keyCols = Seq("o_custkey"), scoreCol = "o_totalprice",
      idCol = "o_orderkey", k = 2)
      .filter(col("o_custkey") % 10 === 0)

  val qTopkNativeSql: String =
    """SELECT o_custkey, rn AS rank, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2 AND o_custkey % 10 = 0""".stripMargin

  /** C9 — native as-of join carrying a full payload (click id AND
    * value), which the single-window composition (C5) cannot do
    * without per-column max-over-struct contortions. Equal-time
    * clicks resolve to the max event_id on both engines (tiebreak
    * sort here, arg_max in the oracle).
    */
  def qAsofNative(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    NativeAsOfJoin.asofJoin(
      purchases, clicks,
      keyCol = "user_id", timeCol = "ts",
      tiebreakCols = Seq("event_id"),
      payloadCols = Seq("event_id", "value"),
      payloadNames = Seq("click_id", "click_value"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("click_id"), col("click_value"))
  }

  val qAsofNativeSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, max(event_id) AS click_id,
      |        arg_max(value, event_id) AS click_value
      |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  c.click_id, c.click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_native" -> qTopkNative,
    "q_asof_native" -> qAsofNative)

  def oracles: Map[String, String] = Map(
    "q_topk_native" -> qTopkNativeSql,
    "q_asof_native" -> qAsofNativeSql)
}
