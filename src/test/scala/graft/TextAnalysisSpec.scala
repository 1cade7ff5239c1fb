package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends GraftSuite {

  test("token stats are internally consistent") {
    val rows = TextAnalysis.qTokenStats(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_distinct_tokens"))
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_alpha_tokens"))
      assert(r.getAs[Long]("n_chars") > 0)
    }
  }

  test("quality ratios live in [0,1] and means are positive") {
    TextAnalysis.qQuality(spark, sf).collect().foreach { r =>
      Seq("punct_ratio", "stopword_ratio", "unique_ratio").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
      assert(r.getAs[Double]("mean_token_len") > 0)
    }
  }

  test("langid votes deterministically with en-priority tiebreak") {
    val rows = TextAnalysis.qLangid(spark, sf).collect()
    rows.foreach { r =>
      val (en, es, fr, de) = (r.getAs[Long]("en_hits"), r.getAs[Long]("es_hits"),
        r.getAs[Long]("fr_hits"), r.getAs[Long]("de_hits"))
      val pred = r.getAs[String]("predicted_lang")
      if (en == 0 && es == 0 && fr == 0 && de == 0) assert(pred == "und")
      else if (en >= es && en >= fr && en >= de) assert(pred == "en")
    }
  }

  test("quality scoring is total: empty/whitespace docs get 0.0 ratios, not NULL") {
    import spark.implicits._
    val rows = TextAnalysis.quality(
      Seq((1L, ""), (2L, "   \t  "), (3L, "one two three four five six"))
        .toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = rows(id)
      assert(r.getAs[Long]("n_tokens") == 0L)
      // token-based ratios guard on size(w); punct_ratio guards on
      // length(text) and is legitimately non-zero for whitespace-only
      Seq("stopword_ratio", "mean_token_len", "unique_ratio")
        .foreach(c => assert(r.getAs[Double](c) == 0.0, s"doc $id $c"))
      assert(!r.getAs[Boolean]("quality_ok"))
      assert(!r.isNullAt(r.fieldIndex("quality_ok")))
    }
    assert(rows(1L).getAs[Double]("punct_ratio") == 0.0)
    assert(!rows(2L).isNullAt(rows(2L).fieldIndex("punct_ratio")))
    assert(rows(3L).getAs[Double]("mean_token_len") > 0.0)
  }

  test("fingerprints are stable and collision-free on distinct texts") {
    val rows = TextAnalysis.qFingerprint(spark, sf).collect()
    assert(rows.map(_.getAs[String]("fp_md5")).distinct.length == rows.length)
    val again = TextAnalysis.qFingerprint(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet ==
      again.map(r => (r.getLong(0), r.getString(1))).toSet)
  }
}
