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
}
