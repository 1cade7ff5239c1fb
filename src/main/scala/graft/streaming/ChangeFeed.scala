package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** A23 — streaming consumption of the A20 change feed: the
  * bronze→silver chaining pattern. A20 computes changes between two
  * versions; this consumer drives that computation INCREMENTALLY — one
  * batch per committed upstream version, delivered to a
  * foreachBatch-style callback, with progress checkpointed so restarts
  * resume instead of replay.
  *
  * Scale design: each batch is one manifest diff, so per-batch cost
  * tracks the CHANGED files of that version, never table size — the
  * property that lets a 100 TB bronze table feed a silver pipeline
  * continuously. Delivery is at-least-once (progress commits AFTER the
  * callback, the same order the C25 replay marker uses); the
  * downstream apply in [[Feed.mirrorAvailable]] is a keyed
  * upsert+delete, which is content-idempotent, so a crash between
  * callback and progress commit re-applies one batch with identical
  * table content — exactly-once table state, like the C25 sink.
  *
  * Retention contract (same as the reference table formats' CDF): the
  * upstream `vacuum` must keep every version ≥ the slowest consumer's
  * checkpoint, or the consumer's next diff hits a reclaimed manifest.
  */
object ChangeFeed {

  /** Open (or resume) a feed consumer. `checkpointDir` scopes the
    * progress: reopening with the same directory resumes after the
    * last processed version; a NEW directory is a NEW consumer that
    * re-delivers from the earliest retained version — pair it with a
    * fresh downstream table.
    */
  def open(spark: SparkSession, path: String, keyCol: String,
      checkpointDir: String): Feed = {
    Files.createDirectories(Paths.get(checkpointDir))
    new Feed(spark, path, keyCol, checkpointDir)
  }

  final class Feed private[ChangeFeed] (
      spark: SparkSession, path: String, keyCol: String, checkpointDir: String) {

    private def progressFile = Paths.get(checkpointDir, "progress")

    /** Last upstream version this consumer has fully processed, or -1
      * before the initial snapshot batch. */
    def lastProcessed: Int =
      if (Files.exists(progressFile))
        new String(Files.readAllBytes(progressFile), "UTF-8").trim.toInt
      else -1

    /** Progress commits via temp-file + atomic move (replace): a crash
      * mid-write can never leave a truncated marker, and a torn state
      * errs toward REPLAY (at-least-once), never toward skipping. */
    private def commitProgress(v: Int): Unit = {
      val tmp = Files.createTempFile(Paths.get(checkpointDir), "progress", ".tmp")
      Files.write(tmp, v.toString.getBytes("UTF-8"))
      Files.move(tmp, progressFile, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    /** Process every upstream version committed since the checkpoint.
      * The first-ever batch is the earliest retained version's full
      * content as inserts (so a downstream starts from a complete
      * snapshot, not a dangling diff); every later batch is
      * [[Snapshots.changesWithPayload]] across ONE version step, in
      * commit order. `fn(batch, fromV, toV)` sees columns
      * (key, change_type, payload…). Returns batches delivered.
      */
    def processAllAvailable(fn: (DataFrame, Int, Int) => Unit): Int = {
      var n = 0
      var last = lastProcessed
      if (last < 0) {
        val v0 = Snapshots.earliestVersion(path)
        val snap = Snapshots.read(spark, path, v0)
        val payload = snap.columns.filterNot(_ == keyCol).toIndexedSeq
        fn(snap.select(col(keyCol) +: lit("insert").as("change_type") +:
          payload.map(col): _*), -1, v0)
        commitProgress(v0); last = v0; n += 1
      }
      while (last < Snapshots.currentVersion(path)) {
        val next = last + 1
        fn(Snapshots.changesWithPayload(spark, path, last, next, keyCol),
          last, next)
        commitProgress(next); last = next; n += 1
      }
      n
    }

    /** Bronze→silver: mirror the feed into a downstream VERSIONED
      * table — inserts/updates as a keyed merge, deletes as a keyed
      * delete, one downstream version per non-empty change batch. The
      * downstream is itself a snapshot log, so a third pipeline stage
      * can chain off ITS change feed the same way. Returns upstream
      * batches consumed.
      */
    def mirrorAvailable(dstPath: String): Int = processAllAvailable { (batch, _, _) =>
      val s = batch.sparkSession
      if (Snapshots.currentVersion(dstPath) < 0) {
        // schema-only seed so the first merge has a typed target
        batch.drop("change_type").limit(0)
          .write.mode("overwrite").parquet(dstPath)
        Snapshots.init(s, dstPath)
      }
      val ups = batch.filter(col("change_type") =!= "delete").drop("change_type")
      if (!ups.isEmpty) Snapshots.mergeVersioned(s, dstPath, ups, keyCol)
      // delete keys stay a DATAFRAME end to end: the anti-join delete
      // keeps plan size O(1) in the key count, where a collected
      // isin(...) list put one literal per key into the plan and a
      // large delete batch bloated (then broke) analysis/codegen
      val dels = batch.filter(col("change_type") === "delete").select(keyCol)
      if (!dels.isEmpty) Snapshots.deleteVersionedKeys(s, dstPath, dels, keyCol)
      ()
    }
  }
}
