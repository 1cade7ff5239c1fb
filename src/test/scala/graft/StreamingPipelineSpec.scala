package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.Snapshots
import graft.streaming.StreamingPipeline

class StreamingPipelineSpec extends GraftSuite {

  private def ts(minute: Long) = new java.sql.Timestamp(1700000000000L + minute * 60000L)

  test("streaming ingest: quality-filter, redact, dedup, and version every batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // seed table: one pre-existing doc, snapshotted as v0
    val dir = Files.createTempDirectory("graft_spipe").toString + "/t"
    Seq((100L, ts(0), "seed", "the original seed document text here"))
      .toDF("doc_id", "ts", "source", "text").write.parquet(dir)
    Snapshots.init(spark, dir)

    val input = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val q = StreamingPipeline.start(
      input.toDS().toDF("doc_id", "ts", "source", "text"), dir)
    try {
      input.addData(
        // passes quality, lands
        (1L, ts(1), "web", "the quick brown fox jumps over a dog"),
        // same text again under a new id: exact dup, suppressed
        (2L, ts(2), "web", "the quick brown fox jumps over a dog"),
        // too short: quality filter drops it
        (3L, ts(3), "web", "xx yy"),
        // email is scrubbed before landing
        (4L, ts(4), "web", "contact bob@example.com about the offer please"))
      q.processAllAvailable()
      input.addData(
        // doc 1 revised (new content hash -> passes dedup, upserts)
        (1L, ts(10), "web", "the quick brown fox rewrote a document"),
        (5L, ts(11), "web", "a completely fresh document about the weather"))
      q.processAllAvailable()
    } finally q.stop()

    assert(Snapshots.currentVersion(dir) == 2)
    def snap(v: Int): Map[Long, String] =
      Snapshots.read(spark, dir, v).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

    val v1 = snap(1); val v2 = snap(2)
    // batch 1: doc 1 in, dup 2 suppressed, junk 3 dropped, 4 redacted
    assert(v1.keySet == Set(100L, 1L, 4L))
    assert(v1(1L) == "the quick brown fox jumps over a dog")
    assert(v1(4L) == "contact <EMAIL> about the offer please")
    // batch 2: doc 1 upserted, doc 5 inserted, earlier state pinned in v1
    assert(v2.keySet == Set(100L, 1L, 4L, 5L))
    assert(v2(1L) == "the quick brown fox rewrote a document")
    assert(v1(100L) == v2(100L)) // untouched seed rides through
    // time travel: v1 still shows the pre-revision doc 1
    assert(snap(1)(1L) == "the quick brown fox jumps over a dog")
  }
}
