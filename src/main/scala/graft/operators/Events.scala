package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  // Precision parity with the oracle: events.parquet is TIMESTAMP(NANOS);
  // Spark floors to micros (Tables.events, `ts div 1000`) and DuckDB's
  // parquet reader ALSO truncates ns->us on read (verified:
  // ...165275999ns reads back as ...165275us) — both engines order and
  // gap-compare the identical microsecond values, so no sub-us
  // divergence is possible in this or the as-of oracle.
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
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
      |  round(sum(value), 4) AS sum_value
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  // C5 — as-of join: for each purchase, the latest click at-or-before
  // it by the same user. Composed Spark-first (the preferred path over
  // a custom SparkPlan): union both sides tagged, ONE window pass
  // computes the running max click-time per user — no per-key loops,
  // no range self-join; a single shuffle on user_id at any scale.
  // Oracle: DuckDB's native ASOF LEFT JOIN.
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val tagged = e.select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"),
      when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("side"))
      .filter(col("event_type").isin("click", "purchase"))
    // clicks (side 0) sort before purchases at equal ts → ">=" semantics
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("click_ts", max(when(col("side") === 0, col("ts"))).over(w))
      .filter(col("side") === 1)
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("last_click_ts"))
  }

  val qAsofJoinSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  // C6 — semi-structured extraction: pull typed fields out of the JSON
  // props column and aggregate on them. get_json_object is a codegen'd
  // path expression — no UDF, no schema inference pass over the corpus.
  def qJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        round(avg("k"), 4).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))

  val qJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
      |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  // C10 — sliding (hopping) window: 1h windows every 30min, so each
  // event contributes to exactly 2 windows. Spark expands the windows
  // inside the scan stage; cost is one duplicated map-side row per
  // slide, collapsed by partial agg before the (window, type) shuffle.
  // Oracle replays the epoch-aligned window starts explicitly.
  def qSlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  val qSlidingWindowSql: String =
    """WITH e AS (SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS s1,
      |    event_type, value FROM events),
      |w AS (SELECT unnest([s1, s1 - 1800]) AS ws, event_type, value FROM e)
      |SELECT strftime(to_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS win_start,
      |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM w GROUP BY 1, 2""".stripMargin

  // C11 — gap sessionization via the BUILT-IN session_window operator
  // (the engine-native twin of C2's lag+cumsum formulation): merging
  // session state lives in the aggregation, one shuffle on user_id.
  // Boundary semantics: a gap of EXACTLY the 30-min window starts a
  // new session (session end is exclusive), hence >= in the oracle
  // where C2's manual rule used >.
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
        col("n_events"), col("sum_value"))

  val qSessionWindowSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    epoch(ts) - epoch(lag(ts) OVER w) AS gap_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN gap_s IS NULL OR gap_s >= 1800 THEN 1 ELSE 0 END AS new_sess
      |  FROM g),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
      |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS end_ts,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  // C12 — resample / gap-fill: a dense hourly spine per event_type with
  // zero-filled quiet hours (the time-series shape downstream models
  // expect). The spine is generated DISTRIBUTED-FIRST: bounds come from
  // one aggregate (no driver-side collect of timestamps), sequence()
  // explodes them into the spine, and the spine × type cross join is a
  // bounded dims-only product (hours-in-range × |types|) that
  // broadcasts against the hourly counts — the fact table is touched
  // exactly once, by the counting aggregate.
  def qResample(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val bounds = e.agg(
      date_trunc("hour", min("ts")).as("lo"),
      date_trunc("hour", max("ts")).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val types = e.select("event_type").distinct()
    val counts = e
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
    spine.crossJoin(types)
      .join(counts, Seq("hour", "event_type"), "left")
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("n"),
        coalesce(col("sv"), lit(0.0)).as("sum_value"))
  }

  val qResampleSql: String =
    """WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS lo,
      |    date_trunc('hour', max(ts)) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      |  FROM bounds),
      |ty AS (SELECT DISTINCT event_type FROM events),
      |cnt AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |        round(sum(value), 4) AS sv FROM events GROUP BY 1, 2)
      |SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour, ty.event_type,
      |  coalesce(cnt.n, 0) AS n, coalesce(cnt.sv, 0.0) AS sum_value
      |FROM spine s CROSS JOIN ty
      |LEFT JOIN cnt ON cnt.hour = s.hour AND cnt.event_type = ty.event_type""".stripMargin

  /** C16 — ordered conversion funnel (view → click → purchase): users
    * advance a stage only with an event at-or-after their entry to the
    * previous stage (min-timestamp cascade). Each stage is ONE shuffle
    * on user_id and the per-user state is a single timestamp, so the
    * stage frames shrink monotonically — at 100 TB the later joins run
    * on the (far smaller) converted-user sets, never fact×fact.
    * Micros-identical timestamps on both engines (see qSessionize note)
    * make the >= cascade exact cross-engine.
    */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select("user_id", "event_type", "ts")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("vt"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("vt"))
      .groupBy("user_id").agg(min("ts").as("ct"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("ct"))
      .groupBy("user_id").agg(min("ts").as("pt"))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("users")).withColumn("stage", lit(name))
    stage(v, "1_view").unionByName(stage(c, "2_click"))
      .unionByName(stage(p, "3_purchase"))
      .select("stage", "users")
  }

  val qFunnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS vt FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.vt GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.ct GROUP BY 1)
      |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
      |UNION ALL
      |SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      |UNION ALL
      |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p""".stripMargin

  /** C19 — growth accounting: each user's FIRST event hour, then the
    * hourly new-user count and its cumulative curve. The scale shape:
    * first-touch is one user_id-keyed min-aggregate (map-side partial),
    * the cumulative window runs over the HOUR spine — bounded by the
    * time range (720 rows/month), never by users or events, so the
    * unpartitioned running sum is safe at any data size.
    */
  def qNewUsers(s: SparkSession, d: String): DataFrame = {
    val firstTouch = Tables.events(s, d)
      .groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(date_format(date_trunc("hour", col("first_ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"))
      .groupBy("hour").agg(count(lit(1)).as("new_users"))
    firstTouch.withColumn("cum_users",
      sum("new_users").over(Window.orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)))
  }

  val qNewUsersSql: String =
    """WITH ft AS (
      |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
      |h AS (
      |  SELECT strftime(date_trunc('hour', first_ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |    count(*) AS new_users
      |  FROM ft GROUP BY 1)
      |SELECT hour, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM h""".stripMargin

  /** C20 — cohort retention: users grouped by their signup week, then
    * distinct active users per (cohort week, week offset) — the classic
    * retention triangle. Two user_id-keyed aggregates plus one
    * distinct-count on (cohort, offset, user); every shuffle key is
    * high-cardinality or bounded.
    */
  def qCohort(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort_w"))
    ev.select(col("user_id"), date_trunc("week", col("ts")).as("act_w"))
      .join(cohort, "user_id")
      .groupBy(
        date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"),
        // floor division: activity BEFORE the signup week (possible in
        // the synthetic stream) must land in offset -1, not truncate to
        // 0 — mirrored by floor(.../7.0) in the oracle
        floor(datediff(col("act_w"), col("cohort_w")) / 7.0).cast("long").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  val qCohortSql: String =
    """WITH c AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |a AS (
      |  SELECT e.user_id, c.cohort_w, date_trunc('week', e.ts) AS act_w
      |  FROM events e JOIN c ON e.user_id = c.user_id)
      |SELECT strftime(cohort_w, '%Y-%m-%d') AS cohort_week,
      |  CAST(floor(date_diff('day', cohort_w, act_w) / 7.0) AS BIGINT) AS week_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM a GROUP BY 1, 2""".stripMargin

  /** C21 — event-type transition matrix (first-order Markov counts):
    * each user's event stream in (ts, event_id) total order, paired
    * with its successor by lead() over the user partition — one
    * user_id shuffle, then a |types|²-bounded aggregate.
    */
  def qTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  val qTransitionsSql: String =
    """WITH t AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** C22 — latest-per-key compaction (the CDC read path): one row per
    * user, the (ts, event_id)-max event. row_number over the user
    * partition in descending total order, keep rank 1 — the snapshot
    * query every upsert table answers. Deterministic via the event_id
    * tiebreak.
    */
  def qLatest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        round(col("value"), 4).as("value"))
  }

  val qLatestSql: String =
    """SELECT user_id, event_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  round(value, 4) AS value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** Per-user gap sessions as second-granular [lo, hi] intervals —
    * the C2 sessionization collapsed to interval endpoints, shared by
    * the overlap join. */
  private def sessionIntervals(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("gap_s", col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
      .withColumn("new_sess", when(col("gap_s").isNull || col("gap_s") > 1800d, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(unix_timestamp(min("ts")).as("lo"), unix_timestamp(max("ts")).as("hi"))
  }

  private val sessionIntervalsCte: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS new_sess
      |  FROM g),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM f),
      |iv AS (
      |  SELECT user_id, session_id,
      |    CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
      |    CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
      |  FROM sess GROUP BY user_id, session_id)""".stripMargin

  /** C18 — interval OVERLAP concurrency (interval × interval, the shape
    * range-join B21 and as-of C5/C9 don't cover): how many OTHER
    * users' sessions overlap each session.
    *
    * r7 rewrite — LINEAR endpoint counting instead of a pair join. The
    * original hour-bucket equi-join did Σ per-bucket concurrency² work
    * plus a pair-dedup; ScaleGen replicates users WITHOUT stretching
    * time, so concurrency itself scales with the factor and the pair
    * volume scales with its SQUARE (measured 7.9× wall at 10× data —
    * and a real 100 TB events table is exactly that shape: more users,
    * same clock). The count never needed the pairs:
    *
    *   overlap(s) = #{t : t.lo <= s.hi AND t.hi >= s.lo, t.user != s.user}
    *              = (A − A_u) − (B − B_u)
    *   A   = #sessions (any user) with lo <= s.hi   (starts up to s.hi)
    *   B   = #sessions (any user) with hi <  s.lo   (ended before s.lo)
    *   A_u/B_u = the same restricted to s's own user (self cancels).
    *
    * One endpoint frame — TWO rows per session, each playing an event
    * role and a query role at once: the lo-row is the start event
    * (wA=1) AND the B-reader, the hi-row is the end event (wB=1) AND
    * the A-reader. ONE total order (t, pri) with pri lo=0 < hi=1
    * satisfies both tie rules: starts at t sort before a hi-row at the
    * same t (so lo <= hi counts inclusively for A), and ends at t sort
    * after a lo-row at the same t (so hi < lo stays strict for B).
    * Global running counts ride the B29 TeraSort layout (range
    * partition + per-partition sums + broadcast offsets — no
    * data-sized single-partition window); per-user corrections are a
    * plain high-cardinality user window. Everything is O(sessions)
    * per stage, at any concurrency.
    */
  def qOverlapSessions(s: SparkSession, d: String): DataFrame = {
    val iv = sessionIntervals(s, d)
    def part(t: Column, pri: Int, wA: Int, wB: Int) = iv.select(
      t.as("t"), lit(pri).as("pri"),
      lit(wA.toLong).as("wA"), lit(wB.toLong).as("wB"),
      col("user_id"), col("session_id"), col("lo"), col("hi"))
    val frame = part(col("lo"), 0, 1, 0)     // start event + B-reader
      .unionByName(part(col("hi"), 1, 0, 1)) // end event + A-reader
    val keys = Seq(col("t"), col("pri"))
    val parted = frame.repartitionByRange(32, keys: _*).localCheckpoint()
      .withColumn("__pid", spark_partition_id())
    val pidW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1) // |partitions| rows only
    val offsets = parted.groupBy("__pid")
      .agg(sum("wA").as("__pa"), sum("wB").as("__pb"))
      .withColumn("__offA", coalesce(sum("__pa").over(pidW), lit(0L)))
      .withColumn("__offB", coalesce(sum("__pb").over(pidW), lit(0L)))
      .select("__pid", "__offA", "__offB")
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wu = Window.partitionBy("user_id").orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cums = parted
      .withColumn("cA", sum("wA").over(w))
      .withColumn("cB", sum("wB").over(w))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("uA", sum("wA").over(wu))
      .withColumn("uB", sum("wB").over(wu))
    // hi-row answers A − A_u, lo-row answers B − B_u; one aggregate
    // reunites the two rows of each session (no second join)
    cums.groupBy("user_id", "session_id")
      .agg(max("lo").as("lo"), max("hi").as("hi"),
        max(when(col("pri") === 1,
          col("__offA") + col("cA") - col("uA"))).as("othA"),
        max(when(col("pri") === 0,
          col("__offB") + col("cB") - col("uB"))).as("othB"))
      .select(col("user_id"), col("session_id"), col("lo"), col("hi"),
        (col("othA") - col("othB")).as("n_concurrent"))
  }

  val qOverlapSessionsSql: String =
    sessionIntervalsCte +
      """,
        |p AS (
        |  SELECT a.user_id, a.session_id, count(*) AS n
        |  FROM iv a JOIN iv b
        |    ON a.lo <= b.hi AND b.lo <= a.hi AND a.user_id <> b.user_id
        |  GROUP BY 1, 2)
        |SELECT iv.user_id, iv.session_id, lo, hi,
        |  coalesce(p.n, 0) AS n_concurrent
        |FROM iv LEFT JOIN p
        |  ON iv.user_id = p.user_id AND iv.session_id = p.session_id""".stripMargin

  /** C23 — SCD2 / gaps-and-islands: each user's event stream collapsed
    * to runs of consecutive identical event_type, emitted as validity
    * intervals [valid_from, valid_to) with the open current run — the
    * type-2 slowly-changing-dimension build. Change flags + cumulative
    * run ids are two window passes over ONE user_id shuffle; the
    * valid_to chain is a lead() over the (small) per-user run table.
    */
  def qScd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(s, d)
      .withColumn("chg", when(lag("event_type", 1).over(w).isNull ||
        lag("event_type", 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "run_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"))
    val wr = Window.partitionBy("user_id").orderBy("run_id")
    runs
      .withColumn("valid_to", lead("valid_from", 1).over(wr))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "run_id", "event_type", "n_events",
        "valid_from", "valid_to", "is_current")
  }

  val qScd2Sql: String =
    """WITH c AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (
      |  SELECT user_id, event_type, ts,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      |  FROM c),
      |runs AS (
      |  SELECT user_id, run_id, event_type, count(*) AS n_events,
      |    strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS valid_from
      |  FROM r GROUP BY 1, 2, 3)
      |SELECT user_id, run_id, event_type, n_events, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL AS is_current
      |FROM runs""".stripMargin

  /** C24 — rolling 7-day distinct actives per day (DAU→WAU curve).
    * Exact, not sketched: collapse to distinct (day, user) pairs first
    * — DAILY ACTIVES, orders of magnitude under events — then join
    * the bounded day spine against a trailing 7-day window of those
    * pairs and distinct-count. The ×7 pair blowup is the explicit,
    * bounded cost of exact rolling distinct (sets don't subtract, so
    * no window running-sum shortcut exists).
    */
  def qRollingActive(s: SparkSession, d: String): DataFrame = {
    val du = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = du.select(col("day").as("d")).distinct()
    broadcast(days)
      .join(du, datediff(col("d"), col("day")).between(0, 6))
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("day"))
      .agg(count_distinct(col("user_id")).as("active_7d"))
  }

  val qRollingActiveSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |ds AS (SELECT DISTINCT day AS d FROM du)
      |SELECT strftime(d, '%Y-%m-%d') AS day,
      |  count(DISTINCT user_id) AS active_7d
      |FROM ds JOIN du ON date_diff('day', du.day, ds.d) BETWEEN 0 AND 6
      |GROUP BY 1""".stripMargin

  /** C27 — multi-granularity time rollup: hourly, daily, and
    * grand-total aggregates per event type in ONE pass (grouping sets
    * over precomputed time buckets — one Expand + one aggregate,
    * where a union-of-aggregates formulation scans the stream once
    * per granularity). The standard time-series OLAP cube layout.
    */
  def qTimeRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), col("value"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .groupingSets(
        Seq(Seq(col("event_type"), col("day"), col("hour")),
          Seq(col("event_type"), col("day")),
          Seq(col("event_type"))),
        col("event_type"), col("day"), col("hour"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select("event_type", "day", "hour", "n", "sum_value")

  val qTimeRollupSql: String =
    """WITH e AS (
      |  SELECT event_type, value,
      |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
      |  FROM events)
      |SELECT event_type, day, hour, count(*) AS n,
      |  round(sum(value), 4) AS sum_value
      |FROM e
      |GROUP BY GROUPING SETS ((event_type, day, hour), (event_type, day), (event_type))""".stripMargin

  /** C28 — lag-1 autocorrelation of the hourly volume series per event
    * type (the cheap seasonality/burstiness diagnostic): hourly counts
    * (one aggregate), each paired with its predecessor by lag() over
    * the HOUR series — bounded by the time range, not by events — then
    * Pearson corr, an algebraic aggregate. Near 0 for a Poisson-flat
    * stream, positive under bursty/diurnal load.
    */
  def qAutocorr(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour")
    Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev", lag("n", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        round(corr(col("n").cast("double"), col("prev").cast("double")), 4).as("lag1_autocorr"))
  }

  val qAutocorrSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, n,
      |    lag(n) OVER (PARTITION BY event_type ORDER BY hour) AS prev
      |  FROM h)
      |SELECT event_type, count(*) AS n_hours,
      |  round(corr(n::DOUBLE, prev::DOUBLE), 4) AS lag1_autocorr
      |FROM l WHERE prev IS NOT NULL GROUP BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_autocorr" -> qAutocorr,
    "q_time_rollup" -> qTimeRollup,
    "q_overlap_sessions" -> qOverlapSessions,
    "q_scd2" -> qScd2,
    "q_rolling_active" -> qRollingActive,
    "q_new_users" -> qNewUsers,
    "q_cohort" -> qCohort,
    "q_transitions" -> qTransitions,
    "q_latest" -> qLatest,
    "q_events_tumble" -> qEventsTumble,
    "q_sessionize" -> qSessionize,
    "q_asof_join" -> qAsofJoin,
    "q_json_extract" -> qJsonExtract,
    "q_sliding_window" -> qSlidingWindow,
    "q_session_window" -> qSessionWindow,
    "q_resample" -> qResample,
    "q_funnel" -> qFunnel)

  def oracles: Map[String, String] = Map(
    "q_autocorr" -> qAutocorrSql,
    "q_time_rollup" -> qTimeRollupSql,
    "q_overlap_sessions" -> qOverlapSessionsSql,
    "q_scd2" -> qScd2Sql,
    "q_rolling_active" -> qRollingActiveSql,
    "q_new_users" -> qNewUsersSql,
    "q_cohort" -> qCohortSql,
    "q_transitions" -> qTransitionsSql,
    "q_latest" -> qLatestSql,
    "q_events_tumble" -> qEventsTumbleSql,
    "q_sessionize" -> qSessionizeSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_sliding_window" -> qSlidingWindowSql,
    "q_session_window" -> qSessionWindowSql,
    "q_resample" -> qResampleSql,
    "q_funnel" -> qFunnelSql)
}
