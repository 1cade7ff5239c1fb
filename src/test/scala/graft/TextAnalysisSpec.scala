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

  test("unicode tokenizer: CJK segments per character, punctuation strips, whitespace parity on ASCII") {
    import spark.implicits._
    def toks(text: String): Seq[String] =
      Seq(text).toDF("text")
        .selectExpr(s"${TextAnalysis.unicodeWordsExpr} AS w")
        .head().getSeq[String](0)

    // CJK: a whitespace split sees ONE degenerate token; the unicode
    // tokenizer segments every ideograph — mixed scripts interleave
    assert(toks("Spark引擎速度快") ==
      Seq("Spark", "引", "擎", "速", "度", "快"))
    assert(toks("机器学习") == Seq("机", "器", "学", "习"))
    // punctuation and symbols strip; digits and accented letters keep
    assert(toks("Hello, world! naïve café v2.0") ==
      Seq("Hello", "world", "naïve", "café", "v2", "0"))
    // pure-ASCII prose: same tokens as the whitespace split modulo
    // attached punctuation
    assert(toks("the quick brown fox") == Seq("the", "quick", "brown", "fox"))
    assert(toks("") == Seq.empty)

    // the oracled query shape: CJK docs count as cjk tokens
    val df = Seq((1L, "深度学习模型 training data 123"),
      (2L, "plain english only")).toDF("doc_id", "text")
    df.createOrReplaceTempView("unicode_probe")
    val stats = df.selectExpr("doc_id", s"${TextAnalysis.unicodeWordsExpr} AS w")
      .selectExpr("doc_id",
        "CAST(size(filter(w, x -> x rlike '^\\\\p{IsHan}$')) AS BIGINT) AS n_cjk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats(1L) == 6L && stats(2L) == 0L)
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

  test("pii redaction rewrites emails, phones and long ids, counts match") {
    import spark.implicits._
    val doc = "mail bob.smith@example.com or call 555-123-4567, badge 123456, room 42"
    val out = TextAnalysis.qPiiRedact(spark, sf) // plan compiles against real table
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_emails", "n_phones", "n_ids", "redacted_md5"))
    // semantics pinned on a synthetic doc via the same expressions
    val redacted = Seq((1L, doc)).toDF("doc_id", "text")
      .selectExpr("doc_id",
        raw"regexp_replace(regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>'), '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>'), '\\b\\d{4,}\\b', '<ID>') AS red")
      .head.getString(1)
    assert(redacted === "mail <EMAIL> or call <PHONE>, badge <ID>, room 42")
  }

  test("hash split is deterministic, content-addressed, and ~84/16") {
    val rows = TextAnalysis.qHashSplit(spark, sf).collect()
    val again = TextAnalysis.qHashSplit(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSet ===
      again.map(r => (r.getLong(0), r.getString(2))).toSet)
    val train = rows.count(_.getString(2) == "train").toDouble / rows.length
    assert(train > 0.70 && train < 0.95, s"train fraction $train")
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 256))
  }

  test("stratified sample keeps roughly the target rate in every stratum") {
    val kept = TextAnalysis.qSample(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    val totals = Tables.documents(spark, sf).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    // 51/256 ≈ 0.2; sf0.001 strata are tiny so allow wide but bounded drift
    kept.foreach { case (src, n) =>
      val rate = n.toDouble / totals(src)
      assert(rate > 0.0 && rate < 0.7, s"$src rate $rate")
    }
  }

  test("repetition fractions are valid and prose corpus is not flagged wholesale") {
    val rows = TextAnalysis.qRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frac = r.getAs[Double]("top_bigram_frac")
      assert(frac > 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("top_cnt") <= r.getAs[Long]("n_bigrams"))
      // flag must equal the unrounded comparison
      assert(r.getAs[Boolean]("repetitive") ==
        (r.getAs[Long]("top_cnt").toDouble / r.getAs[Long]("n_bigrams") > 0.18))
    }
    // synthetic prose corpus: the overwhelming majority is not repetitive
    assert(rows.count(_.getAs[Boolean]("repetitive")) < rows.length / 2)
  }

  test("unigram LM: rare-token docs score higher nll than common-token docs") {
    val rows = TextAnalysis.qUnigramLm(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf)
      .selectExpr(s"size(${TextAnalysis.wordsExpr}) AS n")
      .filter("n > 0").count())
    rows.foreach(r => assert(r.getAs[Double]("mean_nll") > 0.0))
    // corpus-level consistency: token counts match token_stats
    val lmTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val directTokens = TextAnalysis.qTokenStats(spark, sf)
      .selectExpr("sum(n_tokens)").head.getLong(0)
    assert(lmTokens == directTokens)
  }

  test("bigram LM: flags improbable token order the unigram model cannot see") {
    val rows = TextAnalysis.qBigramLm(spark, sf).collect()
    // every doc with >= 2 tokens is scored, positively
    assert(rows.length == Tables.documents(spark, sf)
      .selectExpr(s"size(${TextAnalysis.wordsExpr}) AS n")
      .filter("n >= 2").count())
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_nll") > 0.0)
      assert(r.getAs[Long]("n_bigrams") > 0L)
    }
    // hand-checked model: docs "a b","a b","a c" -> V=3, c1(a)=3,
    // P(b|a)=(2+1)/(3+3)=1/2, P(c|a)=(1+1)/(3+3)=1/3 — the repeated
    // continuation scores lower NLL than the rare one
    import spark.implicits._
    val tiny = Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(tiny).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_nll")).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(out(0L) == r4(-math.log(0.5)))
    assert(out(2L) == r4(-math.log(1.0 / 3.0)))
    assert(out(0L) == out(1L) && out(0L) < out(2L))
  }

  test("bigram counts: deterministic top-30, counts consistent with token counts") {
    val rows = TextAnalysis.qBigrams(spark, sf).collect()
    assert(rows.length <= 30)
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.sameElements(counts.sorted.reverse), "not sorted by cnt desc")
    // total bigrams across the corpus = sum over docs of (n_tokens - 1)
    val totalBigrams = TextAnalysis.qTokenStats(spark, sf)
      .selectExpr("sum(greatest(n_tokens - 1, 0))").head.getLong(0)
    assert(counts.sum <= totalBigrams)
  }

  test("F31 Naive Bayes: distinctive vocabulary classifies to its source") {
    import spark.implicits._
    // two sources with disjoint distinctive vocab; enough docs that the
    // md5 split leaves both train docs and holdout docs per source
    val docs = (1L to 120L).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma alpha beta", "news")
      else (i, "delta epsilon zeta delta epsilon", "web")
    }.toDF("doc_id", "text", "source")
    val out = TextAnalysis.nbClassify(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty, "md5 split must leave holdout docs")
    // every holdout doc's text is verbatim its class's training text:
    // the classifier must recover the true source for all of them
    out.foreach { case (id, pred) =>
      assert(pred == (if (id % 2 == 0) "news" else "web"), s"doc $id")
    }
    // and both classes appear among predictions (not a degenerate prior)
    assert(out.values.toSet == Set("news", "web"))
  }
}
