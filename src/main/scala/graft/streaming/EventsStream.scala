package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming block (SURVEY.md §2.3, stream side).
  *
  * The same tumbling-window aggregation as the batch `q_events_tumble`,
  * but executed by the streaming engine: file source → event-time
  * watermark → windowed agg → sink. Because the plan is declarative,
  * the identical query runs against a Kafka source on a cluster —
  * only the `readStream`/`writeStream` endpoints change. Verified
  * against the same DuckDB batch oracle (stream/batch unification).
  */
object EventsStream {

  /** Stage `$d/events.parquet` into a fresh directory for the file
    * streaming source (which monitors a directory; testdata is
    * read-only) — symlinking the LEAF parquet files, because the events
    * table ships BOTH as a single driver-written file and as a
    * Spark-written directory of part files (ScaleGen's scaled dirs):
    * symlinking the directory itself would nest it one level down,
    * where the reader finds no files and schema inference dies.
    */
  private def stageEventsDir(d: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    dir.toFile.deleteOnExit()
    val src = java.nio.file.Paths.get(s"$d/events.parquet").toAbsolutePath
    if (java.nio.file.Files.isDirectory(src)) {
      val s = java.nio.file.Files.list(src)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.createSymbolicLink(
              dir.resolve(p.getFileName.toString), p)
        }
      } finally s.close()
    } else
      java.nio.file.Files.createSymbolicLink(dir.resolve("events.parquet"), src)
    dir.toString
  }

  /** Streaming file sources require a declared schema, and the events
    * files have shipped as both legacy TIMESTAMP(NANOS) (long under the
    * nanos conf) and TIMESTAMP_MICROS — so infer the real on-disk schema
    * with a one-shot batch footer read of the same directory, then
    * normalize `ts` to TimestampType exactly like Tables.events. Future
    * testdata regenerations change the footer, not this code.
    */
  def eventsStreamSource(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = s.read.parquet(dir).schema
    val src = s.readStream.schema(onDisk).parquet(dir)
    onDisk("ts").dataType match {
      case LongType => src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => src.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** The streaming plan, source-agnostic: event-time watermark + 1h
    * tumbling window per event_type. Expects `ts` already normalized to
    * TimestampType (eventsStreamSource does this for file sources).
    */
  def tumblingAgg(src: DataFrame): DataFrame =
    src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  // C3 — run the streaming query synchronously over the parquet file
  // source and hand back the materialized result (memory sink,
  // complete mode: every window closes once the file is drained).
  /** State store: RocksDB instead of the default HDFS-backed heap map.
    * For this bounded smoke the state is tiny either way; at scale the
    * difference is structural — RocksDB keeps windowed/sessionized
    * state off the executor heap (no GC pressure, no OOM from key
    * cardinality) and checkpoint uploads are incremental SST files
    * rather than full snapshots. Read per query AT START, so setting
    * it on the shared session only affects streaming queries started
    * here.
    */
  private def useRocksDbState(s: SparkSession): Unit =
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Stateful-operator parallelism is a per-stream sizing decision:
    * every shuffle partition owns its own state-store instance (a
    * stream-stream join owns FOUR per partition — two per side), and
    * each RocksDB instance has a fixed open/checkpoint cost. Sizing
    * partitions to the stream's actual volume is the difference
    * between 12s and 134s on the bounded smoke (measured, 32→8
    * partitions); at production volume the same knob scales state
    * bandwidth UP. The conf is bound at query start, so set-run-restore
    * leaves the session's batch parallelism untouched.
    */
  private def withStreamPartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def qStreamTumble(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    useRocksDbState(s)
    val src = eventsStreamSource(s, stageEventsDir(d))
    val name = "stream_tumble_out"
    withStreamPartitions(s, 8) {
      val q = tumblingAgg(src).writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(name)
  }

  val qStreamTumbleSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** C4 — custom streaming state: running per-user event counter and
    * value total via mapGroupsWithState (the arbitrary-state API; the
    * state store shards by user_id across executors). Exercised by
    * StreamingSpec with a MemoryStream source.
    */
  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserState(n: Long, total: Double)
  case class UserSnapshot(user_id: Long, n_events: Long, total_value: Double)

  def updateUserState(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserState]): UserSnapshot = {
    val prev = state.getOption.getOrElse(UserState(0L, 0.0))
    var n = prev.n
    var total = prev.total
    events.foreach { e => n += 1; total += e.value }
    state.update(UserState(n, total))
    UserSnapshot(userId, n, total)
  }

  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateUserState)
  }

  /** C7 — streaming gap sessionization via flatMapGroupsWithState with
    * EventTimeTimeout: the streaming twin of the batch `q_sessionize`
    * (same 30-minute gap rule). State per user holds the open session;
    * an event past the gap closes it (emitted downstream) and opens a
    * new one; a user going quiet is closed by the event-time timeout
    * once the watermark passes last_event + gap. Closed sessions are
    * append-mode output — exactly-once with checkpointing on a real
    * sink. Open sessions at end-of-stream are deliberately unemitted
    * (they are not over), which is why this is spec-verified rather
    * than compared to the batch oracle, whose finite input closes
    * every session.
    */
  case class TsEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessState(startMs: Long, lastMs: Long, n: Long, total: Double)
  case class ClosedSession(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long, sum_value: Double)

  val SessionGapMs: Long = 30L * 60 * 1000

  def sessionizeUser(
      userId: Long,
      events: Iterator[TsEvent],
      state: GroupState[SessState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(userId, s.startMs, s.lastMs, s.n, s.total))
    }
    val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = state.getOption
    // micro-batches deliver a group's events unordered; the gap rule
    // needs time order within the batch
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs > SessionGapMs =>
          closed += ClosedSession(userId, s.startMs, s.lastMs, s.n, s.total)
          cur = Some(SessState(t, t, 1L, e.value))
        case Some(s) =>
          cur = Some(SessState(s.startMs, math.max(s.lastMs, t), s.n + 1, s.total + e.value))
        case None =>
          cur = Some(SessState(t, t, 1L, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + SessionGapMs)
    }
    closed.iterator
  }

  def streamingSessions(events: Dataset[TsEvent]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionizeUser)
  }

  /** C8 — streaming exact dedup: the ingest-time twin of the batch
    * `q_dedup_exact`. Dedup state is keyed by content hash (md5), so
    * the payload never enters the state store, and
    * `dropDuplicatesWithinWatermark` bounds state to the watermark
    * horizon — the property that makes continuous dedup viable at
    * 100 TB/day, where an unbounded `dropDuplicates` would accrete
    * every hash ever seen. Duplicates arriving within the horizon are
    * suppressed; the first arrival wins.
    */
  def streamingDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")

  /** C14 — watermarked stream-stream INTERVAL JOIN: attribute each
    * purchase to every click by the same user in the preceding 30
    * minutes. The time-bound condition is what makes this viable
    * unbounded: with both sides watermarked and the join range closed,
    * the state store retains only rows inside the watermark ± range
    * horizon and evicts everything older — without the bound, each
    * side would buffer forever. Inner-join matches emit as soon as
    * both rows have arrived (append mode), so on a drained bounded
    * source the result equals the batch interval join and the DuckDB
    * oracle applies unchanged (stream/batch unification again).
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour").alias("c")
    val p = purchases.withWatermark("ts", "1 hour").alias("p")
    c.join(p, expr(
      """p.user_id = c.user_id AND
        |p.ts >= c.ts AND p.ts <= c.ts + interval 30 minutes""".stripMargin))
      .select(
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.user_id").as("user_id"),
        round(col("p.ts").cast("double") - col("c.ts").cast("double"), 4).as("gap_s"))
  }

  def qStreamJoin(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    useRocksDbState(s)
    val dir = stageEventsDir(d)
    def side(tpe: String): DataFrame =
      eventsStreamSource(s, dir)
        .filter(col("event_type") === tpe)
        .select("event_id", "ts", "user_id")
    val name = "stream_join_out"
    withStreamPartitions(s, 8) {
      val q = intervalJoin(side("click"), side("purchase")).writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(name)
  }

  val qStreamJoinSql: String =
    """WITH c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
      |  round(epoch(p.ts) - epoch(c.ts), 4) AS gap_s
      |FROM c JOIN p ON p.user_id = c.user_id
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumble" -> qStreamTumble,
    "q_stream_join" -> qStreamJoin)

  def oracles: Map[String, String] = Map(
    "q_stream_tumble" -> qStreamTumbleSql,
    "q_stream_join" -> qStreamJoinSql)
}
