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
    assert(c.spanKept <= c.dedupKept && c.spanKept > 0)
    assert(c.decontamKept <= c.spanKept && c.decontamKept > 0)
    assert(c.train + c.holdout == c.decontamKept)
    // span-stage magnitude is corpus-dependent (after doc-level dedup
    // removed whole near-dup pages, this corpus has no repeated spans
    // left); the nonzero path is exercised by the seeded test below
    assert(c.spanTokensRemoved >= 0)

    val result = spark.read.parquet(out)
    // layout: split partition dirs exist and split values are the dirs
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(dirs.toSet.subsetOf(Set("split=train", "split=holdout")) && dirs.nonEmpty)

    // redaction holds on the shipped corpus: no long digit runs survive
    val leaked = result.filter(col("text").rlike("\\b\\d{4,}\\b")).count()
    assert(leaked == 0, s"$leaked docs leaked unredacted long digit runs")

    // no near-dup pair survives among the kept docs at the same tau —
    // guaranteed by the post-span re-dedup pass (span cutting CAN
    // create pairs: removing a block doc A shares with a third doc
    // shrinks A's unique mass against B)
    val residual = operators.Dedup.jaccardPairs(
      result.select("doc_id", "text"), tau = 0.5).count()
    assert(residual == 0, s"$residual near-dup pairs survived dedup")

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

  test("span stage with REAL cuts: exact accounting, empty shells dropped, structure kept") {
    import spark.implicits._
    // seeded corpus: an 8-token boilerplate block B shared by three
    // docs (window count 3 >= 2 -> cut everywhere), unique tails with
    // a stopword so the quality filter keeps everything, pairwise
    // Jaccard far below tau so doc-dedup keeps all docs
    val b = "the b1 b2 b3 b4 b5 b6 b7"
    def tail(p: String) = (1 to 20).map(k => s"$p$k").mkString(" ")
    // the token AFTER the block differs per doc, so the only shared
    // 8-window is the block itself (start-2 windows differ)
    val docs = Seq(
      (0L, s"$b ux ${tail("u")}", "en", "seed"),
      (1L, s"$b vx ${tail("v")}", "en", "seed"),
      (2L, b, "en", "seed"),                       // ALL content covered -> empty shell
      (3L, s"the only unique doc a ${tail("w")}", "en", "seed")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_span").toString
    val c = Pipeline.runOn(spark, docs, out)

    assert(c.input == 4 && c.qualityKept == 4 && c.dedupKept == 4)
    // docs 0, 1, 2 each lose exactly the 8 covered B positions
    assert(c.spanTokensRemoved == 24, s"expected 24 tokens cut, got ${c.spanTokensRemoved}")
    // doc 2 is cut to nothing and must NOT ship
    assert(c.spanKept == 3)
    val result = spark.read.parquet(out)
    assert(result.filter(org.apache.spark.sql.functions.length(col("text")) === 0).count() == 0)
    val texts = result.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // cut docs reassemble without the block; untouched doc keeps its
    // ORIGINAL text verbatim
    texts.get(0L).foreach(t => assert(t == s"ux ${tail("u")}"))
    texts.get(3L).foreach(t => assert(t == s"the only unique doc a ${tail("w")}"))
    assert(!texts.contains(2L))
  }
}
