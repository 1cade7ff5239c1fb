package graft

import org.apache.spark.sql.functions._

/** End-to-end pipeline: the §2 operators composed into the full
  * training-data flow, checked stage by stage on real output files.
  */
class PipelineSpec extends GraftSuite {

  test("profile -> filter -> dedup -> redact -> split -> layout, verified end to end") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_spec").toString
    val c = Pipeline.run(spark, sf, out)

    // counts are monotone through the funnel and nothing is lost after
    // decontamination
    assert(c.input > 0)
    assert(c.qualityKept <= c.input && c.qualityKept > 0)
    assert(c.dedupKept <= c.qualityKept && c.dedupKept > 0)
    assert(c.decontamKept <= c.dedupKept && c.decontamKept > 0)
    assert(c.train + c.holdout == c.decontamKept)
    // span-stage accounting is sane (magnitude is corpus-dependent:
    // after doc-level dedup removed whole near-dup pages, the tiny
    // test corpus can legitimately have zero repeated spans left —
    // the cutting mechanism itself is pinned by DedupSpec)
    assert(c.spanTokensRemoved >= 0)

    val result = spark.read.parquet(out)
    // layout: split partition dirs exist and split values are the dirs
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(dirs.toSet.subsetOf(Set("split=train", "split=holdout")) && dirs.nonEmpty)

    // redaction holds on the shipped corpus: no long digit runs survive
    val leaked = result.filter(col("text").rlike("\\b\\d{4,}\\b")).count()
    assert(leaked == 0, s"$leaked docs leaked unredacted long digit runs")

    // no near-dup pair survives among the kept docs at the same tau
    // (span removal cannot CREATE one: cutting content shared by both
    // docs removes equal mass from intersection and union, so pairwise
    // Jaccard only decreases)
    val residual = operators.Dedup.jaccardPairs(
      result.select("doc_id", "text"), tau = 0.5).count()
    assert(residual == 0, s"$residual near-dup pairs survived dedup")

    // span-cleaned text is canonically single-spaced (reassembly joins
    // survivors with one space)
    assert(result.filter(col("text").rlike("\\s\\s")).count() == 0)

    // zero residual contamination: no shipped train doc shares an
    // 8-gram with the shipped holdout split
    val residualLeak = operators.Decontam.contaminatedIds(
      result.filter(col("split") === "train").select("doc_id", "text"),
      result.filter(col("split") === "holdout").select("doc_id", "text")).count()
    assert(residualLeak == 0, s"$residualLeak contaminated train docs shipped")

    // split is content-addressed: recomputing the bucket agrees
    val wrongSplit = result.selectExpr(
      "split",
      s"CASE WHEN ${operators.TextAnalysis.bucketExpr} < 216 THEN 'train' ELSE 'holdout' END AS expect")
      .filter(col("split") =!= col("expect")).count()
    assert(wrongSplit == 0)
  }
}
