package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Events / time-series block (SURVEY.md §2.3, batch side).
  * Window keys are emitted as formatted strings so the DuckDB oracle
  * compares on identical second-truncated values regardless of the
  * engines' internal timestamp precision (Spark µs vs DuckDB ns).
  */
object Events {

  // C1 — tumbling-window aggregation: one shuffle on (hour, event_type),
  // map-side partial agg carries the rest.
  def qEventsTumble(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))

  val qEventsTumbleSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // C2 — gap-based sessionization (gap > 30 min starts a new session).
  // Classic lag + cumulative-sum formulation: two window passes over ONE
  // shuffle on user_id. Timestamps are compared at full precision via
  // epoch seconds (double).
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("gap_s", col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
      .withColumn("new_sess", when(col("gap_s").isNull || col("gap_s") > 1800d, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
        round(sum("value"), 4).as("sum_value"))
  }

  val qSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    epoch(ts) - epoch(lag(ts) OVER w) AS gap_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS new_sess
      |  FROM g),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
      |  round(sum(value), 4) AS sum_value
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_tumble" -> qEventsTumble,
    "q_sessionize" -> qSessionize)

  def oracles: Map[String, String] = Map(
    "q_events_tumble" -> qEventsTumbleSql,
    "q_sessionize" -> qSessionizeSql)
}
