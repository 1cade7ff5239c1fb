package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

class EventsSpec extends GraftSuite {

  test("funnel stages are monotone and ordered by the timestamp cascade") {
    val rows = graft.operators.Events.qFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(rows("1_view") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
    assert(rows("1_view") > 0)
  }

  test("events read adapts to the REAL testdata schema with sane epochs") {
    // The on-disk ts encoding has changed between testdata generations
    // (TIMESTAMP(NANOS) → TIMESTAMP_MICROS); this pins the adaptive
    // read against whatever /root/testdata currently carries. The range
    // assertion catches the silent failure class too: a stale
    // nanos-vs-micros rescale lands timestamps 1000× off, far outside
    // any plausible year.
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val yr = ev.select(
      min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi")).head
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts outside sane epoch range: $yr — stale ts rescale?")
    assert(ev.count() > 0)
  }

  test("legacy nanos events files still read through the adaptive path") {
    // current testdata is TIMESTAMP_MICROS, so the LongType→nanos
    // branch is otherwise dead code — exactly the condition under
    // which the r5 regression shipped. Stage an events dir whose ts
    // is a raw long of nanoseconds and assert both the batch read and
    // the streaming source land on the same true timestamps.
    import org.apache.spark.sql.functions._
    val micros = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .limit(500)
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_events")
    dir.toFile.deleteOnExit()
    micros.select(col("event_id"), (col("us") * 1000L).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val batch = Tables.events(spark, dir.toString)
    assert(batch.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val want = micros.select(sum("us")).head.getLong(0)
    assert(batch.select(sum(unix_micros(col("ts")))).head.getLong(0) == want)
    val streamed = graft.streaming.EventsStream
      .eventsStreamSource(spark, dir.resolve("events.parquet").toString)
    assert(streamed.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("tumbling agg partitions every event into exactly one window") {
    val n = Events.qEventsTumble(spark, sf).agg(sum("n")).collect()(0).getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("sessionization covers all events with positive-size sessions") {
    val sess = Events.qSessionize(spark, sf)
    val n = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(n == Tables.events(spark, sf).count())
    assert(sess.filter(col("session_id") < 1).count() == 0)
  }

  test("as-of join keeps one row per purchase with click at-or-before it") {
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val asof = Events.qAsofJoin(spark, sf)
    assert(asof.count() == purchases)
    // matched rows: the click can't be after the purchase (string
    // compare works on yyyy-MM-dd HH:mm:ss)
    val bad = asof.filter(col("last_click_ts") > col("purchase_ts")).count()
    assert(bad == 0)
  }

  test("sql interface exposes events.ts as a real timestamp") {
    val df = GraftSql.sql(spark, sf,
      "SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1")
    assert(df.schema("h").dataType.typeName.startsWith("timestamp"))
    assert(df.count() > 0)
  }

  test("sql surface survives one unreadable table: lineitem SQL still answers") {
    // fault-isolated registration: stage a warehouse dir where
    // events.parquet is garbage but lineitem is real — queries that
    // never touch events must still run (the r5 regression killed the
    // whole SQL surface through one broken table)
    val dir = java.nio.file.Files.createTempDirectory("graft_broken_wh")
    dir.toFile.deleteOnExit()
    for (t <- Tables.all if t != "events")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$sf/$t.parquet").toAbsolutePath)
    java.nio.file.Files.write(dir.resolve("events.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    val r = GraftSql.sql(spark, dir.toString, GraftSql.revenueSql).collect()(0)
    assert(r.getAs[Long]("n_items") > 0)
  }

  test("sql interface runs the same text as the oracle") {
    val r = GraftSql.qSqlInterface(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_items") > 0)
    assert(r.getAs[Double]("revenue") > 0)
  }

  test("sliding windows double-count every event exactly once per hop") {
    // 1h window / 30min slide: each event lands in exactly 2 windows,
    // so the sliding n-total is exactly twice the event count
    val slidingN = Events.qSlidingWindow(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(slidingN == 2 * Tables.events(spark, sf).count())
  }

  test("session_window and manual sessionization agree on session count per user") {
    val builtIn = Events.qSessionWindow(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val manual = Events.qSessionize(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // boundary rule differs only on gaps of EXACTLY 30min (none in the
    // corpus) — session structure must match
    assert(builtIn === manual)
  }

  test("resample emits a dense hourly spine with zero-filled gaps") {
    val rows = Events.qResample(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    // dense grid: every (hour, type) cell present exactly once
    assert(rows.length % types == 0)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    // non-gap totals must equal the raw event count
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count())
    // and zero rows carry 0.0 sums, not nulls
    rows.filter(_.getAs[Long]("n") == 0L)
      .foreach(r => assert(r.getAs[Double]("sum_value") == 0.0))
  }
}
