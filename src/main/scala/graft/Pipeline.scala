package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Decontam, Dedup, TextAnalysis}

/** End-to-end training-data pipeline (SURVEY.md §7): the shipped
  * operators composed into the flow a pretraining corpus actually
  * runs — profile → quality filter → PII redaction → near-dup removal
  * → repeated-span removal → deterministic split → decontamination →
  * partitioned/sorted layout sink. One driver program; every stage is one of the §2 operators,
  * so the whole pipeline inherits their plan properties (pushdown,
  * partial agg, inverted-index dedup, content-addressed split,
  * broadcast decontam semi-join, bounded file sizes).
  *
  * Usage: runMain graft.Pipeline <sfDir> <outDir>
  * Prints one JSON line of per-stage counts.
  */
object Pipeline {

  case class StageCounts(
      input: Long,
      qualityKept: Long,
      dedupKept: Long,
      spanTokensRemoved: Long,
      decontamKept: Long,
      train: Long,
      holdout: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String,
      tau: Double = 0.5): StageCounts = {
    val docs = Tables.documents(spark, sfDir)
    val input = docs.count()

    // 1. quality filter (F2) then 2. PII redaction (F5) — redaction
    // runs BEFORE dedup on purpose: scrubbing distinct IDs/emails to
    // the same placeholder can turn boilerplate variants into true
    // near-dups, and those must be caught by the dedup stage, not
    // created after it.
    val kept = docs
      .join(TextAnalysis.quality(docs).select("doc_id", "quality_ok"), "doc_id")
      .filter(col("quality_ok"))
      .selectExpr(
        "doc_id",
        s"${TextAnalysis.redactedExpr("text")} AS text",
        "lang", "source", "n_chars")
      // the dedup stage reads this relation several times (shingle
      // index + anti join) — cache the filtered+redacted corpus once
      .cache()
    val qualityKept = kept.count()

    // 3. near-dup removal (D2/D7): inverted-index Jaccard candidates
    // on the redacted corpus, greedy keep-lowest-id, anti join back
    val drop = Dedup.jaccardPairs(kept.select("doc_id", "text"), tau)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = kept.join(drop, Seq("doc_id"), "left_anti")
    val dedupKept = deduped.count()

    // 3b. repeated-span removal (D15): doc-level dedup keeps ONE copy
    // of a near-dup page, but a boilerplate block pasted into
    // otherwise-unique survivors is still duplicated text — cut every
    // 8-token window that occurs more than once across the deduped
    // corpus, keep the reassembled survivors. Runs after doc dedup
    // (removing whole dups first means shared spans between a page and
    // its own near-copy don't count), before the split (span removal
    // changes content, and the split must hash FINAL content).
    val spanned = deduped.drop("text", "n_chars")
      .join(Dedup.spanCleanedText(deduped.select("doc_id", "text")), "doc_id")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .cache()
    val spanTokensRemoved = spanned.agg(sum("n_removed")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }

    // 4. content-addressed split (F6)
    val labeled = spanned.drop("n_tokens", "n_removed")
      .selectExpr(
        "doc_id", "text", "lang", "source", "n_chars",
        s"CASE WHEN ${TextAnalysis.bucketExpr} < 216 THEN 'train' ELSE 'holdout' END AS split")
      .cache()

    // 5. decontamination (F15): any TRAIN doc still sharing an 8-gram
    // with the holdout split leaks eval content — drop it. Runs after
    // dedup (near-dup removal already thinned the overlap) and only
    // ever removes train rows, so the holdout side stays intact.
    val trainSide = labeled.filter(col("split") === "train")
    val holdSide = labeled.filter(col("split") === "holdout")
    val leakIds = Decontam.contaminatedIds(
      trainSide.select("doc_id", "text"), holdSide.select("doc_id", "text"))
    val clean = trainSide.join(leakIds, Seq("doc_id"), "left_anti")
      .unionByName(holdSide)
    val decontamKept = clean.count()

    // 6. layout sink (A13): split dirs, doc_id-sorted files, bounded size
    graft.sources.Sources.writeLayout(
      clean, outDir, "split", Seq("doc_id"), maxRecordsPerFile = 100000L)

    val out = spark.read.parquet(outDir)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.unpersist()
    spanned.unpersist()
    labeled.unpersist()
    Dedup.unpersistShingleIndexes()
    StageCounts(input, qualityKept, dedupKept, spanTokensRemoved, decontamKept,
      counts.getOrElse("train", 0L), counts.getOrElse("holdout", 0L))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val c = run(spark, sfDir, outDir)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"pipeline","input":${c.input},"quality_kept":${c.qualityKept},""" +
      s""""dedup_kept":${c.dedupKept},"span_tokens_removed":${c.spanTokensRemoved},""" +
      s""""decontam_kept":${c.decontamKept},""" +
      s""""train":${c.train},"holdout":${c.holdout},""" +
      s""""sec":$sec,"out":"$outDir"}""")
    spark.stop()
  }
}
