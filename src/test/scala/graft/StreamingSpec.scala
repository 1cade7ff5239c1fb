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
