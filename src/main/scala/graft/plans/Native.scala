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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_native" -> qTopkNative)

  def oracles: Map[String, String] = Map(
    "q_topk_native" -> qTopkNativeSql)
}
