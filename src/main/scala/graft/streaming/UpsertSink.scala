package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Merge

/** C15 — streaming upsert sink: a change stream merged into a keyed
  * parquet table via `foreachBatch` + the A16 copy-on-write MERGE.
  * This is the CDC-ingest endpoint of the lakehouse family — streams
  * land as upserts, not appends, so the table is always a current
  * snapshot (one row per key) instead of a log the reader must
  * re-deduplicate.
  *
  * Scale design: `foreachBatch` gives each micro-batch to the SAME
  * index-pruned merge the batch path uses — on a key-clustered layout
  * (A13/A14) a batch touching few key ranges rewrites few files, so
  * per-batch write cost tracks batch size, not table size. Within a
  * batch, the last change per key wins (max-tiebreak on the batch's
  * own order column), mirroring Delta/Iceberg MERGE semantics under
  * multiple updates to one key.
  */
object UpsertSink {

  /** Start the merge sink. `orderCol` breaks ties when one key changes
    * several times inside a micro-batch (highest wins = latest change).
    */
  def start(changes: DataFrame, path: String, keyCol: String,
      orderCol: String): StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = batch
          .withColumn("__rn", row_number().over(
            Window.partitionBy(keyCol).orderBy(col(orderCol).desc)))
          .filter(col("__rn") === 1).drop("__rn")
        if (!latest.isEmpty) {
          Merge.mergeInto(batch.sparkSession, path, latest, keyCol)
          ()
        }
      }
      .start()
  }

  /** C25 — versioned streaming upsert: the same CDC merge, but through
    * the A18 snapshot log ([[graft.sources.Snapshots.mergeVersioned]])
    * so every micro-batch commits a NEW TABLE VERSION. The table is
    * simultaneously a current snapshot (latest version) and a full
    * history (time travel to any batch boundary) — the
    * streaming-ingest + reproducible-training-set combination a 100 TB
    * pipeline needs: a training run pins the version it read, and
    * later ingest can't silently change it. Per-batch cost is still
    * index-pruned rewrite; history cost is bounded by `vacuum`.
    */
  def startVersioned(changes: DataFrame, path: String, keyCol: String,
      orderCol: String): StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = batch
          .withColumn("__rn", row_number().over(
            Window.partitionBy(keyCol).orderBy(col(orderCol).desc)))
          .filter(col("__rn") === 1).drop("__rn")
        if (!latest.isEmpty) {
          graft.sources.Snapshots.mergeVersioned(
            batch.sparkSession, path, latest, keyCol)
          ()
        }
      }
      .start()
  }
}
