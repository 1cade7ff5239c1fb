package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A16 — copy-on-write MERGE (upsert) into a keyed parquet directory:
  * the Delta/Iceberg `MERGE INTO` write path without the transaction
  * log. Rows whose key appears in `updates` are replaced; new keys are
  * inserted.
  *
  * Scale design: the whole point is to NOT rewrite the table. The A15
  * file index finds the files whose key range intersects any update
  * key (conservative superset of files actually containing one), only
  * THOSE files are read and rewritten — on a key-clustered layout
  * (A13/A14) that is a tiny fraction of a 100 TB table — and every
  * other file is left physically untouched. The update keys broadcast
  * (updates are small relative to the table by contract). The final
  * swap is filesystem rename, not a transactional commit — a real
  * lakehouse puts a metadata log in front of exactly this write
  * pattern; the data movement is identical.
  */
object Merge {

  case class MergeStats(
      filesTotal: Long,
      filesRewritten: Long,
      rowsBefore: Long,
      rowsAfter: Long,
      rowsUpdated: Long,
      rowsInserted: Long)

  def mergeInto(
      spark: SparkSession, path: String,
      updates: DataFrame, keyCol: String): MergeStats = {
    val idx = Sources.buildFileIndex(spark, path, Seq(keyCol)).cache()
    val filesTotal = idx.count()
    val keys = updates.select(col(keyCol).as("__k")).distinct()
    val touched = idx
      .join(broadcast(keys),
        col("__k") >= col(s"${keyCol}_min") && col("__k") <= col(s"${keyCol}_max"),
        "left_semi")
      .select("file").collect().map(_.getString(0))
    idx.unpersist()

    val target = spark.read.parquet(path)
    val rowsBefore = target.count()
    val oldTouched =
      if (touched.isEmpty) target.limit(0)
      else spark.read.parquet(touched.toIndexedSeq: _*)
    // upsert semantics: kept = touched rows whose key is NOT updated;
    // every update row lands in the table (replacing or inserting)
    val kept = oldTouched.join(broadcast(updates.select(keyCol)), Seq(keyCol), "left_anti")
    val rowsUpdated = oldTouched
      .join(broadcast(updates.select(keyCol)), Seq(keyCol), "left_semi").count()
    val rewritten = kept.unionByName(updates.select(oldTouched.columns.toIndexedSeq.map(col): _*))

    // stage the replacement files, MOVE them into the table dir, and
    // only then delete the superseded originals (the retain-then-commit
    // order deleteVersioned uses): a crash inside the swap window then
    // leaves duplicate rows — recoverable by re-running the merge —
    // instead of permanently losing the kept rows, which is what
    // delete-first would do if any later step threw.
    val stage = java.nio.file.Files.createTempDirectory("graft_merge").toString
    rewritten.write.mode(SaveMode.Overwrite).parquet(stage)
    moveStagedThenDelete(stage, path, "merge", touched)
    val after = spark.read.parquet(path)
    val rowsAfter = after.count()
    MergeStats(filesTotal, touched.length.toLong, rowsBefore, rowsAfter,
      rowsUpdated, rowsAfter - rowsBefore)
  }

  case class DeleteStats(
      filesTotal: Long,
      filesRewritten: Long,
      rowsBefore: Long,
      rowsAfter: Long,
      rowsDeleted: Long)

  /** A21 — copy-on-write DELETE (the Delta/Iceberg `DELETE FROM`
    * write path): rows matching `predicate` are removed by rewriting
    * ONLY the files that contain one. File discovery is a single
    * pushdown-pruned probe — the predicate reaches the parquet reader
    * and only `input_file_name` comes back — so on a layout clustered
    * by the predicate column (A13/A14) the probe skips most files via
    * row-group stats and the rewrite touches a tiny fraction of a
    * 100 TB table; every other file stays physically untouched.
    */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): DeleteStats = {
    val target = spark.read.parquet(path)
    val rowsBefore = target.count()
    val filesTotal = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      try s.filter(_.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val touched = target.filter(predicate)
      .select(input_file_name().as("file")).distinct()
      .collect().map(_.getString(0))
    if (touched.isEmpty)
      return DeleteStats(filesTotal, 0L, rowsBefore, rowsBefore, 0L)

    // keep = NOT(pred) with SQL DELETE's null semantics: a NULL
    // predicate deletes nothing, but NOT(null) is null and filter drops
    // it — so without the coalesce, null-predicate rows survive in
    // untouched files yet vanish from any file that had a TRUE match.
    val keptRows = spark.read.parquet(touched.toIndexedSeq: _*)
      .filter(!coalesce(predicate, lit(false)))
    val stage = java.nio.file.Files.createTempDirectory("graft_delete").toString
    keptRows.write.mode(SaveMode.Overwrite).parquet(stage)
    moveStagedThenDelete(stage, path, "delete", touched)
    val rowsAfter = spark.read.parquet(path).count()
    DeleteStats(filesTotal, touched.length.toLong, rowsBefore, rowsAfter,
      rowsBefore - rowsAfter)
  }

  /** Swap staged replacement files into the table directory BEFORE
    * deleting the superseded originals. The originals come back from
    * `input_file_name()` as %-encoded `file:` URIs (a path with a
    * space arrives as `%20`); routing them through
    * [[Snapshots.canonical]] decodes to a real filesystem path — the
    * raw-stripPrefix form made `Files.delete` throw on such paths,
    * mid-sequence, exactly inside the unrecoverable window.
    */
  private def moveStagedThenDelete(
      stage: String, path: String, prefix: String,
      originals: Array[String]): Unit = {
    val dst = java.nio.file.Paths.get(path)
    val staged = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
    try staged.forEach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet"))
        java.nio.file.Files.move(p, dst.resolve(s"${prefix}_$name"))
    } finally staged.close()
    originals.foreach { f =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(Snapshots.canonical(f)))
    }
  }
}
