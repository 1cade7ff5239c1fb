package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Analytics, Dedup, TextAnalysis}

class AnalyticsSpec extends GraftSuite {

  test("globalRank matches the single-partition window formulation") {
    val got = Analytics.qGlobalRank(spark, sf)
      .select("o_orderkey", "global_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.orders(spark, sf)
      .withColumn("global_rank", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .select("o_orderkey", "global_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalRank ranks within partitions in parallel (no data-sized global window)") {
    // the plan must not contain a window over an empty partition spec
    // on the DATA path; the only Window.orderBy-without-partition runs
    // over the #partitions-row offsets side
    val plan = Analytics.qGlobalRank(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), "per-partition rank window missing")
  }

  test("qEquidepth buckets are balanced and cover the value range") {
    val rows = Analytics.qEquidepth(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L))
    val counts = rows.map(_.getAs[Long]("n_rows"))
    assert(counts.max - counts.min <= 1, s"unbalanced: ${counts.toSeq}")
    // buckets tile the range in order: each bucket's hi <= next's lo
    val pairs = rows.sliding(2).toSeq
    assert(pairs.forall(p =>
      p(0).getAs[Double]("hi") <= p(1).getAs[Double]("lo")))
  }

  test("qGroupingSets = per-source + per-lang + grand total in one pass") {
    val rows = Analytics.qGroupingSets(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[Long]("g_source") == 1 && r.getAs[Long]("g_lang") == 1)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_docs") == Tables.documents(spark, sf).count())
    val bySource = rows.filter(_.getAs[Long]("g_source") == 0)
    assert(bySource.map(_.getAs[Long]("n_docs")).sum == grand.head.getAs[Long]("n_docs"))
    // one Expand + one aggregate, not a union of scans
    val plan = Analytics.qGroupingSets(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Union"))
  }

  test("saltedDistinct is exact: disjoint salt partitions re-sum to the true count") {
    val got = Analytics.qSaltedDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(count_distinct(col("l_partkey")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("qOutliers flags exactly the rows beyond the rounded z threshold") {
    val rows = Analytics.qOutliers(spark, sf).collect()
    assert(rows.forall(r => math.abs(r.getAs[Double]("zscore")) > 2.5))
    // sanity: outliers are rare (well under 5% of events for z=2.5)
    val total = Tables.events(spark, sf).count()
    assert(rows.length < total / 20)
  }

  test("qMovingAvg matches an independent self-join formulation of the frame") {
    val got = Analytics.qMovingAvg(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("mov_avg_1h")).toMap
    val e = Tables.events(spark, sf)
      .withColumn("es", unix_timestamp(col("ts")))
      .select("event_id", "user_id", "es", "value")
    val want = e.as("x")
      .join(e.as("y"), col("x.user_id") === col("y.user_id") &&
        col("y.es").between(col("x.es") - 3599, col("x.es")))
      .groupBy(col("x.event_id"))
      .agg(round(avg(col("y.value")), 4).as("want"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("want")).toMap
    assert(got.keySet == want.keySet)
    assert(got.forall { case (k, v) => math.abs(v - want(k)) <= 1e-4 })
  }

  test("fuzzyPairs only compares within blocks and finds known near-names") {
    val pairs = Analytics.qFuzzyMatch(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    // all pairs share the head-noun block and respect the cutoff
    assert(pairs.forall { case (a, b, dst) =>
      a.split(" ").last == b.split(" ").last && dst <= 3 && a < b })
    // the classic near-pair surfaces
    assert(pairs.exists { case (a, b, _) => a == "old bolt" && b == "red bolt" })
  }

  test("qMinhashEst estimates are within the MinHash error envelope of exact Jaccard") {
    val est = Dedup.qMinhashEst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(est.nonEmpty)
    val exact = Dedup.qJaccardPairs(spark, sf, tau = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    // k=12 hashes: stderr = sqrt(J(1-J)/12) <= 0.145; allow 3 sigma
    val errs = est.collect { case (k, e) if exact.contains(k) => math.abs(e - exact(k)) }
    assert(errs.nonEmpty && errs.max <= 0.45, s"worst err ${errs.max}")
  }

  test("qWindowFuncs: analytic functions are consistent within each customer") {
    val rows = Analytics.qWindowFuncs(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (1 to 4).contains(r.getAs[Int]("quartile"))))
    // cume_dist r/N >= percent_rank (r-1)/(N-1) always
    assert(rows.forall(r => r.getAs[Double]("cume") >= r.getAs[Double]("pct_rank")))
    // exactly one lag-null (first order) per customer
    val custs = rows.map(_.getAs[Long]("o_custkey")).distinct.length
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("prev_price"))) == custs)
  }

  test("qCollect: sorted joined keys match a direct per-customer computation") {
    val got = Analytics.qCollect(spark, sf).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[String]("order_keys")).toMap
    val want = Tables.orders(spark, sf).select("o_custkey", "o_orderkey").collect()
      .groupBy(_.getLong(0))
      .map { case (c, rs) => c -> rs.map(_.getLong(1)).sorted.mkString(",") }
    assert(got == want)
  }

  test("qQuantized: codes span [0, 254] and the quantization is deterministic") {
    val rows = graft.operators.Similarity.qQuantized(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("code_min") >= 0 &&
      r.getAs[Long]("code_max") <= 254))
    // some dim hits each end of the range somewhere in the corpus
    assert(rows.exists(_.getAs[Long]("code_min") == 0))
    assert(rows.exists(_.getAs[Long]("code_max") == 254))
  }

  test("qNewUsers: cumulative curve ends at the distinct-user total") {
    import graft.operators.Events
    val rows = Events.qNewUsers(spark, sf).collect().sortBy(_.getAs[String]("hour"))
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("new_users")).sum == totalUsers)
    assert(rows.last.getAs[Long]("cum_users") == totalUsers)
    // cumulative is nondecreasing
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }

  test("qCohort: every signup cohort is fully active in its own week") {
    import graft.operators.Events
    val rows = Events.qCohort(spark, sf).collect()
    val at0 = rows.filter(_.getAs[Long]("week_offset") == 0)
      .map(r => r.getAs[String]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    // offset-0 activity includes at least the signup event itself, so
    // week-0 retention is 100% of the cohort
    val cohortSizes = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t"))
      .select(date_format(date_trunc("week", col("t")), "yyyy-MM-dd").as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(at0 == cohortSizes)
  }

  test("qTransitions: transition mass = events minus one per user") {
    import graft.operators.Events
    val n = Events.qTransitions(spark, sf).collect().map(_.getAs[Long]("n")).sum
    val events = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(n == events - users)
  }

  test("qLatest: one row per user, carrying that user's max timestamp") {
    import graft.operators.Events
    val rows = Events.qLatest(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.length == users)
    val maxTs = Tables.events(spark, sf).groupBy("user_id")
      .agg(date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r => r.getAs[String]("ts_s") == maxTs(r.getAs[Long]("user_id"))))
  }

  test("tableChecksum is invariant under repartitioning (order-independent)") {
    val li = Tables.lineitem(spark, sf)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_linestatus")
    val a = Analytics.tableChecksum(li, "l_returnflag", cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Analytics.tableChecksum(li.repartition(7), "l_returnflag", cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
    // and it actually detects a changed row
    val mutated = li.withColumn("l_suppkey",
      when(col("l_orderkey") === li.select("l_orderkey").head().getLong(0),
        col("l_suppkey") + 1).otherwise(col("l_suppkey")))
    val c = Analytics.tableChecksum(mutated, "l_returnflag", cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a != c)
  }

  test("qExtract emits every >=5-letter run with 1-based indices") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.qExtract(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[String]("matched").length >= 5 &&
      r.getAs[Long]("idx") >= 1))
    // spot-check one doc against an independent Scala regex scan
    val doc = Tables.documents(spark, sf).select("doc_id", "text").head()
    val want = "[a-z]{5,}".r.findAllIn(doc.getString(1)).toSeq
    val got = rows.filter(_.getLong(0) == doc.getLong(0))
      .sortBy(_.getAs[Long]("idx")).map(_.getAs[String]("matched")).toSeq
    assert(got == want)
  }

  test("qOverlapSessions: bucketed overlap count matches a direct theta join") {
    import graft.operators.Events
    val got = Events.qOverlapSessions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n_concurrent")).toMap
    // independent check: direct all-pairs overlap on the interval set
    val iv = Events.qOverlapSessions(spark, sf)
      .select("user_id", "session_id", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = iv.map { case (u, s0, lo, hi) =>
      (u, s0) -> iv.count { case (u2, _, lo2, hi2) =>
        u2 != u && lo <= hi2 && lo2 <= hi }.toLong
    }.toMap
    assert(got == want)
    assert(got.values.exists(_ > 0))
  }

  test("qScd2: runs tile each user's history and current runs are open") {
    import graft.operators.Events
    val rows = Events.qScd2(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.count(_.getAs[Boolean]("is_current")) == users)
    // run event counts sum back to the full stream
    assert(rows.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    // within a user, runs alternate: no two consecutive runs share a type
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("run_id")).map(_.getAs[String]("event_type"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a != b })
    }
  }

  test("qRollingActive: trailing 7-day actives >= that day's actives") {
    import graft.operators.Events
    val roll = Events.qRollingActive(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("active_7d")).toMap
    val daily = Tables.events(spark, sf)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"), col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(roll.keySet == daily.keySet)
    assert(daily.forall { case (d, n) => roll(d) >= n })
    val total = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(roll.values.forall(_ <= total))
  }

  test("qNested: struct arrays sort by line number and fold to exact totals") {
    val rows = Analytics.qNested(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum == Tables.lineitem(spark, sf).count())
    val one = rows.maxBy(_.getAs[Long]("n_items"))
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === one.getLong(0))
      // line numbers repeat in the synthetic data, so the total order
      // (the struct field order sort_array uses) is the reference
      .sort(col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .collect()
      .map(r => s"${r.getAs[Long]("l_partkey")}:${r.getAs[Double]("l_quantity").toLong}")
      .mkString(",")
    assert(one.getAs[String]("items_s") == want)
  }

  test("qCorrelated decorrelates to a join and matches a manual aggregate+join") {
    val rows = Analytics.qCorrelated(spark, sf).collect()
    val avgs = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(avg("o_totalprice").as("a")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("o_totalprice") >
      math.round(1.5 * avgs(r.getAs[Long]("o_custkey")) * 100) / 100.0))
    // the subquery must have been decorrelated: no per-row subquery
    // node survives in the physical plan
    val plan = Analytics.qCorrelated(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalarsubquery") || plan.contains("Join"),
      "correlated subquery not decorrelated into a join")
  }

  test("qLateral yields one row per nation with exact customer counts") {
    val rows = Analytics.qLateral(spark, sf).collect()
    assert(rows.length == Tables.nation(spark, sf).count())
    assert(rows.map(_.getAs[Long]("n_customers")).sum ==
      Tables.customer(spark, sf).count())
  }

  test("qTimeRollup: hour rows aggregate to day rows aggregate to type totals") {
    import graft.operators.Events
    val rows = Events.qTimeRollup(spark, sf).collect()
    val hourly = rows.filter(r => r.getAs[String]("hour") != null)
    val daily = rows.filter(r => r.getAs[String]("hour") == null && r.getAs[String]("day") != null)
    val total = rows.filter(r => r.getAs[String]("day") == null)
    assert(hourly.map(_.getAs[Long]("n")).sum == daily.map(_.getAs[Long]("n")).sum)
    assert(daily.map(_.getAs[Long]("n")).sum == total.map(_.getAs[Long]("n")).sum)
    assert(total.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count())
  }

  test("qWeightedSample: long docs always survive, short docs by their own hash") {
    import graft.operators.TextAnalysis
    val kept = TextAnalysis.qWeightedSample(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "n_chars", s"${TextAnalysis.bucketExpr} AS bucket").collect()
    docs.foreach { r =>
      val expect = r.getLong(2) / 256.0 < math.min(r.getLong(1) / 500.0, 1.0)
      assert(kept.contains(r.getLong(0)) == expect, s"doc ${r.getLong(0)}")
    }
    assert(docs.filter(_.getLong(1) >= 500).forall(r => kept.contains(r.getLong(0))))
  }

  test("qChunk: windows tile every document with stride overlap, tails kept") {
    import graft.operators.TextAnalysis
    val chunks = TextAnalysis.qChunk(spark, sf).collect()
    val lens = Tables.documents(spark, sf).selectExpr("doc_id", "length(text) AS l")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == lens.keySet) // every doc chunks, even short ones
    byDoc.foreach { case (id, cs) =>
      val l = lens(id)
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      // indexes are dense from 0; starts advance by the stride
      assert(sorted.map(_.getAs[Long]("chunk_idx")).toSeq == sorted.indices.map(_.toLong))
      assert(sorted.forall(c => c.getAs[Long]("chunk_start") ==
        c.getAs[Long]("chunk_idx") * 100 + 1))
      // full coverage: last chunk reaches the end of the document
      val last = sorted.last
      assert(last.getAs[Long]("chunk_start") + last.getAs[Long]("chunk_len") - 1 == l)
      // every non-tail chunk is full-window
      assert(sorted.init.forall(_.getAs[Long]("chunk_len") == 200) || sorted.length == 1)
    }
  }

  test("qDrift: PSI is ~0 for the corpus vs itself and detects an injected shift") {
    import graft.operators.TextAnalysis
    // per-source PSI vs the global distribution on the real corpus is
    // small (sources share one generator)
    val psi = TextAnalysis.qDrift(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(psi.nonEmpty)
    // a synthetic corpus with one shifted source must flag it
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("drift").toString
    val base = (1L to 400L).map(i => (i, "t", "steady", 100L + (i % 50)))
    val shifted = (401L to 500L).map(i => (i, "t", "shifted", 2000L + (i % 50)))
    (base ++ shifted).toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val flags = TextAnalysis.qDrift(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("drifted")).toMap
    assert(flags("shifted"))
  }

  test("qEntityResolution: fuzzy-linked names share one canonical variant") {
    val canon = Analytics.qEntityResolution(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon.size == Tables.part(spark, sf).select("p_name").distinct().count())
    // linked pair collapses to the lexicographic min of its component
    assert(canon("old bolt") == canon("red bolt"))
    // every canonical is itself a member name mapping to itself
    canon.values.foreach(c => assert(canon(c) == c))
  }

  test("qAbtest: cohorts partition events and the t statistic is finite") {
    import graft.operators.Events
    val rows = Analytics.qAbtest(spark, sf).collect()
    val byType = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == byType(r.getString(0)))
      assert(!r.getAs[Double]("t_stat").isNaN)
      // hash split is roughly balanced (well within 4 sigma)
      val (na, nb) = (r.getAs[Long]("n_a").toDouble, r.getAs[Long]("n_b").toDouble)
      assert(math.abs(na - nb) < 4 * math.sqrt(na + nb))
    }
  }

  test("qContainment finds a full-quote subset pair that Jaccard scores low") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("containment").toString
    val small = (1 to 10).map(i => s"tok$i").mkString(" ")            // 8 shingles
    val big = (1 to 200).map(i => s"word$i").mkString(" ") + " " + small
    Seq((1L, small), (2L, big)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.qContainment(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("cont_ab"), r.getAs[Double]("cont_ba")))
    // the small doc is fully contained: cont(A->B) = 1.0
    assert(rows.exists { case (a, b, cab, _) => a == 1L && b == 2L && cab == 1.0 })
    // while symmetric Jaccard on the same pair is far below the D2 cutoff
    val j = Dedup.jaccardPairs(
      Tables.documents(spark, tmp), tau = 0.0).collect()
      .map(r => r.getAs[Double]("jaccard")).max
    assert(j < 0.1)
    Dedup.unpersistShingleIndexes()
  }

  test("qDqChecks: the clean warehouse passes every constraint; a dirty table fails") {
    val clean = Analytics.qDqChecks(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.size == 6)
    assert(clean.values.forall(_ == 0L), s"clean data flagged: $clean")
    // sanity that the rules CAN fire: a violating row count is nonzero
    // when evaluated against deliberately broken data
    import spark.implicits._
    val broken = Seq((1L, 0.0), (1L, 10.0)).toDF("o_orderkey", "o_totalprice")
    assert(broken.filter(col("o_totalprice") <= 0).count() == 1)
    assert(broken.count() - broken.select("o_orderkey").distinct().count() == 1)
  }

  test("qAutocorr: one row per event type, correlation within [-1, 1]") {
    import graft.operators.Events
    val rows = Events.qAutocorr(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("lag1_autocorr"); c >= -1.0 && c <= 1.0 })
    assert(rows.forall(_.getAs[Long]("n_hours") > 0))
  }

  test("qEntropy: uniform text scores high, constant text scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefgh"), // 8 distinct chars -> 3 bits
      (2L, "aaaaaaaa")  // constant -> 0 bits
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("entropy").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.qEntropy(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("char_entropy")).toMap
    assert(got(1L) == 3.0)
    assert(got(2L) == 0.0)
  }

  test("degenerate inputs are rejected or well-defined, not silently wrong") {
    import spark.implicits._
    // empty-text docs vanish from the entropy output (no char rows) —
    // the same rows the oracle's unnest produces none for
    val tmp = java.nio.file.Files.createTempDirectory("degenerate").toString
    Seq((1L, ""), (2L, "ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ids = graft.operators.TextAnalysis.qEntropy(spark, tmp).collect().map(_.getLong(0))
    assert(ids.toSet == Set(2L))
    // native top-k refuses nonpositive k instead of returning nothing
    intercept[IllegalArgumentException] {
      graft.plans.NativeTopK.topKPerKey(
        Tables.orders(spark, sf), Seq("o_orderstatus"), "o_totalprice", "o_orderkey", 0)
    }
    // ragged embedding corpora are rejected by the dim probe, not
    // silently collapsed (the guard every vector operator shares)
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.lshKnn(ragged, ragged, k = 1)
    }
  }
}
