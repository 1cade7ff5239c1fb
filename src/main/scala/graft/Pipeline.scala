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
      spanKept: Long,
      decontamKept: Long,
      train: Long,
      holdout: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String,
      tau: Double = 0.5): StageCounts =
    runOn(spark, Tables.documents(spark, sfDir), outDir, tau)

  /** DataFrame-based form so a pipeline (or a spec) can run any
    * (doc_id, text, lang, source, n_chars) corpus, not just the
    * warehouse table. */
  private[graft] def runOn(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame, outDir: String,
      tau: Double = 0.5): StageCounts = {
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
    // cached: the span stage below reads this relation three times
    // (shingle/window builds + the text join-back), and its plan
    // carries the expensive near-dup anti join
    val deduped = kept.join(drop, Seq("doc_id"), "left_anti").cache()
    val dedupKept = deduped.count()

    // 3b. repeated-span removal (D15): doc-level dedup keeps ONE copy
    // of a near-dup page, but a boilerplate block pasted into
    // otherwise-unique survivors is still duplicated text — cut every
    // 8-token window that occurs more than once across the deduped
    // corpus. Runs after doc dedup (removing whole dups first means
    // shared spans between a page and its own near-copy don't count)
    // and before decontamination, which must compare FINAL content.
    val cleaned = Dedup.spanCleanedText(deduped.select("doc_id", "text"))
      .withColumnRenamed("text", "__clean")
    val spannedAll = deduped
      .join(cleaned, "doc_id")
      // untouched docs keep their ORIGINAL text: reassembly is \s+
      // retokenization + single-space joining, which would flatten
      // newline/paragraph structure corpus-wide for zero benefit
      .withColumn("text",
        when(col("n_removed") === 0L, col("text")).otherwise(col("__clean")))
      .drop("__clean", "n_tokens")
      .cache()
    // measured BEFORE the empty-shell filter: tokens cut from a doc
    // that vanishes entirely are still tokens cut
    val spanTokensRemoved = spannedAll.agg(sum("n_removed")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    // a doc can be cut to nothing (all its content duplicated
    // elsewhere while every pairwise overlap stays below tau) — drop
    // the empty shells instead of shipping zero-content rows
    val spanned0 = spannedAll
      .filter(length(col("text")) > 0)
      .withColumn("n_chars", length(col("text")).cast("long"))

    // 3c. span cutting can CREATE near-dup pairs: removing a block
    // doc A shares with some THIRD doc shrinks A's unique mass
    // against B, which can push J(A,B) over tau. One more near-dup
    // drop on the cleaned text restores the zero-residual property —
    // and it terminates: dropping docs can only ever LOWER the
    // similarity of the survivors, so no third pass is needed.
    val drop2 = Dedup.jaccardPairs(spanned0.select("doc_id", "text"), tau)
      .select(col("doc_b").as("doc_id")).distinct()
    val spanned = spanned0.join(drop2, Seq("doc_id"), "left_anti")
    val spanKept = spanned.count()

    // 4. content-addressed split (F6) — bucket = md5(doc_id), so split
    // membership is stable regardless of how stages rewrite content
    val labeled = spanned.drop("n_removed")
      .selectExpr(
        "doc_id", "text", "lang", "source", "n_chars",
        s"CASE WHEN ${TextAnalysis.bucketExpr} < 216 THEN 'train' ELSE 'holdout' END AS split")
      .cache()

    // 5. decontamination (F15): any TRAIN doc still sharing an 8-gram
    // with the holdout split leaks eval content — drop it. Honest
    // overlap note: the span stage already cut every corpus-internal
    // duplicated 8-gram from BOTH sides, so against this INTERNAL
    // holdout the stage mostly catches grams newly created at
    // reassembly seams — it earns its keep as defense-in-depth here
    // and does the real work when pointed at an EXTERNAL eval set the
    // span stage never saw (the production decontam shape).
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
    deduped.unpersist()
    spannedAll.unpersist()
    labeled.unpersist()
    Dedup.unpersistShingleIndexes()
    StageCounts(input, qualityKept, dedupKept, spanTokensRemoved, spanKept,
      decontamKept, counts.getOrElse("train", 0L), counts.getOrElse("holdout", 0L))
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
      s""""span_kept":${c.spanKept},""" +
      s""""decontam_kept":${c.decontamKept},""" +
      s""""train":${c.train},"holdout":${c.holdout},""" +
      s""""sec":$sec,"out":"$outDir"}""")
    spark.stop()
  }
}
