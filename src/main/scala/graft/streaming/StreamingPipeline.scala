package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming twin of the batch `graft.Pipeline` capstone: continuous
  * document ingest through the same cleaning stages, landing in a
  * versioned table.
  *
  *   quality filter (F2, the SAME rule expression as the batch path)
  *   → PII redaction (F5)
  *   → streaming exact dedup within the watermark horizon (C8)
  *   → versioned upsert sink (C25: one table version per micro-batch)
  *
  * The composition is the point: every stage is stateless or
  * watermark-bounded, so state never outgrows the horizon; the sink
  * gives each batch a manifest version, so a training run downstream
  * pins the exact table state it read while ingest keeps running —
  * the continuous analog of the batch pipeline's deterministic
  * content-addressed split.
  *
  * Input stream schema: (doc_id LONG, text STRING, source STRING,
  * ts TIMESTAMP event-time).
  */
object StreamingPipeline {

  /** The cleaning transform alone (stream-safe: projections + filter
    * + watermarked dedup; no joins, no global state). Exposed so the
    * spec can drain it without the sink. */
  def clean(docs: DataFrame): DataFrame = {
    val kept = docs
      .selectExpr("*", s"${TextAnalysis.wordsExpr} AS __w")
      .where(expr(TextAnalysis.qualityOkExpr("__w")))
      .drop("__w")
    val redacted = kept.selectExpr(
      "doc_id", "ts", "source",
      s"${TextAnalysis.redactedExpr("text")} AS text")
    EventsStream.streamingDedup(redacted).drop("content_hash")
  }

  /** Start the full pipeline into a Snapshots-initialized table at
    * `path`. Last change per doc_id wins within a batch (event-time
    * order); each batch commits a new table version.
    */
  def start(docs: DataFrame, path: String,
      checkpoint: Option[String] = None): StreamingQuery =
    UpsertSink.startVersioned(clean(docs), path, "doc_id", "ts", checkpoint)
}
