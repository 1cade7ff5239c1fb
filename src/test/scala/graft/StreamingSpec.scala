package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Events
import graft.streaming.EventsStream

class StreamingSpec extends GraftSuite {

  test("streaming tumbling agg equals the batch plan on the same data") {
    val streamed = EventsStream.qStreamTumble(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Events.qEventsTumble(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("mapGroupsWithState accumulates per-user running state across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventsStream.UserEvent]
    val q = EventsStream.runningUserCounts(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("user_state").start()
    try {
      input.addData(
        EventsStream.UserEvent(1L, "click", 1.0),
        EventsStream.UserEvent(1L, "view", 2.0),
        EventsStream.UserEvent(2L, "click", 5.0))
      q.processAllAvailable()
      input.addData(EventsStream.UserEvent(1L, "purchase", 10.0))
      q.processAllAvailable()
      val out = spark.table("user_state").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // last snapshot per user wins
      val last = out.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(last(1L) == ((1L, 3L, 13.0)))
      assert(last(2L) == ((2L, 1L, 5.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: gap closes, timeout closes, order repaired") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(u: Long, minute: Long, v: Double) = EventsStream.TsEvent(
      u, new java.sql.Timestamp(1700000000000L + minute * 60000L), v)
    val input = MemoryStream[EventsStream.TsEvent]
    val q = EventsStream.streamingSessions(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      // user 1: two events 10 min apart (one session), delivered out of
      // order; then an event 60 min later IN THE SAME BATCH → the gap
      // rule must close session 1 inline
      input.addData(ev(1L, 10, 2.0), ev(1L, 0, 1.0), ev(1L, 70, 5.0), ev(2L, 0, 9.0))
      q.processAllAvailable()
      // advance event time far enough that the watermark (delay 30 min)
      // passes every open session's timeout...
      input.addData(ev(3L, 300, 0.0))
      q.processAllAvailable()
      // ...and one more batch so the timed-out state is actually swept
      input.addData(ev(3L, 301, 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      def mins(u: Long) = out.filter(_._1 == u)
        .map(t => ((t._2 - 1700000000000L) / 60000L, (t._3 - 1700000000000L) / 60000L, t._4, t._5))
        .sortBy(_._1).toList
      // user 1: [0,10] closed by the gap (2 events), [70,70] closed by timeout
      assert(mins(1L) == Seq((0L, 10L, 2L, 3.0), (70L, 70L, 1L, 5.0)))
      // user 2: single-event session closed by timeout
      assert(mins(2L) == Seq((0L, 0L, 1L, 9.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches across micro-batches and equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def row(id: Long, minute: Long, u: Long) =
      (id, new java.sql.Timestamp(1700000000000L + minute * 60000L), u)
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    def named(ms: MemoryStream[(Long, java.sql.Timestamp, Long)]) =
      ms.toDF().toDF("event_id", "ts", "user_id")
    val q = EventsStream.intervalJoin(named(clicks), named(purchases))
      .writeStream.outputMode("append").format("memory").queryName("sj_out").start()
    try {
      // batch 1: clicks only — no output yet, state buffers them
      clicks.addData(row(100L, 0, 1L), row(101L, 5, 1L), row(102L, 0, 2L))
      q.processAllAvailable()
      assert(spark.table("sj_out").count() == 0)
      // batch 2: purchases arrive — must match clicks from batch 1
      // (u1@20min pairs with BOTH clicks; u2@40min is outside 30min)
      purchases.addData(row(200L, 20, 1L), row(201L, 40, 2L))
      q.processAllAvailable()
      val got = spark.table("sj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 200L), (101L, 200L)))
    } finally q.stop()
  }

  test("q_stream_join equals the equivalent batch interval join") {
    val streamed = EventsStream.qStreamJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val e = Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type")
    import org.apache.spark.sql.functions._
    val c = e.filter(col("event_type") === "click").alias("c")
    val p = e.filter(col("event_type") === "purchase").alias("p")
    val batch = c.join(p, expr(
        "p.user_id = c.user_id AND p.ts >= c.ts AND p.ts <= c.ts + interval 30 minutes"))
      .select(col("c.event_id"), col("p.event_id"), col("c.user_id"),
        round(col("p.ts").cast("double") - col("c.ts").cast("double"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup suppresses same-content docs across batches, first wins") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val src = input.toDS().toDF("doc_id", "text", "ts")
    val q = EventsStream.streamingDedup(src)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      input.addData((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "alpha", ts(2)))
      q.processAllAvailable()
      input.addData((4L, "alpha", ts(3)), (5L, "gamma", ts(4)))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      // one survivor per content, and it is the FIRST arrival
      assert(kept.map(_._2).sorted.toSeq === Seq("alpha", "beta", "gamma"))
      assert(kept.find(_._2 == "alpha").get._1 === 1L)
    } finally q.stop()
  }

  test("streaming minhash signatures are bit-identical to the batch pipeline") {
    import graft.streaming.StreamingNearDup
    val docs = Tables.documents(spark, sf)
    val batch = graft.operators.Dedup.minhash(docs).collect()
      .map(r => r.getLong(0) -> (1 to 12).map(i => r.getLong(i)).toVector).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // batch drops docs with < 3 tokens; compare the rest
    batch.foreach { case (id, sig) =>
      val streamed = StreamingNearDup.signature(texts(id)).toVector
      assert(streamed === sig, s"doc $id signature drift")
    }
    assert(batch.nonEmpty)
  }

  test("streaming LSH emits candidate pairs ACROSS micro-batches") {
    import spark.implicits._
    import graft.streaming.StreamingNearDup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[StreamingNearDup.StreamDoc]
    val q = StreamingNearDup.candidates(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("neardup_out").start()
    try {
      input.addData(
        StreamingNearDup.StreamDoc(1L, text),
        StreamingNearDup.StreamDoc(2L, "completely different words nothing shared here at all folks"))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() == 0) // nothing similar yet
      input.addData(StreamingNearDup.StreamDoc(3L, text)) // near-dup arrives LATER
      q.processAllAvailable()
      val pairs = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(pairs.toSeq === Seq((1L, 3L)), s"got ${pairs.toSeq}")
    } finally q.stop()
  }

  test("near-dup TTL: pairs within the horizon, eviction past it") {
    import spark.implicits._
    import graft.streaming.StreamingNearDup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val input = MemoryStream[StreamingNearDup.TsStreamDoc]
    val q = StreamingNearDup.candidatesWithTtl(input.toDS(), ttlMs = 30L * 60 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("neardup_ttl").start()
    try {
      input.addData(StreamingNearDup.TsStreamDoc(1L, text, ts(0)))
      q.processAllAvailable()
      // within the 30-min TTL: match found
      input.addData(StreamingNearDup.TsStreamDoc(2L, text, ts(10)))
      q.processAllAvailable()
      // advance the watermark far past doc 2's timeout (10 + 30 min)
      input.addData(StreamingNearDup.TsStreamDoc(99L,
        "completely unrelated filler words to push the watermark forward now", ts(120)))
      q.processAllAvailable()
      input.addData(StreamingNearDup.TsStreamDoc(98L,
        "more unrelated filler words keep pushing the watermark forward again", ts(125)))
      q.processAllAvailable() // timeout fires in a batch AFTER the watermark moves
      // same content arrives after eviction: no pair against 1 or 2
      input.addData(StreamingNearDup.TsStreamDoc(3L, text, ts(130)))
      q.processAllAvailable()
      val pairs = spark.table("neardup_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
      assert(pairs === Seq((1L, 2L)), s"got $pairs")
    } finally q.stop()
  }
}
