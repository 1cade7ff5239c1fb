package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TrainPrep}

class TrainPrepSpec extends GraftSuite {

  test("DSIR selection: target-like pool docs outrank target-unlike ones") {
    import spark.implicits._
    // target speaks "alpha beta gamma"; pool doc 10 speaks the target's
    // language, 11 a different one, 12 a mix — the importance ratio
    // must order them 10 > 12 > 11
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "t"),
      (2L, "beta gamma alpha gamma", "t"),
      (10L, "alpha beta gamma beta alpha", "pool"),
      (11L, "delta epsilon zeta delta epsilon", "pool"),
      (12L, "alpha delta beta epsilon", "pool"))
      .toDF("doc_id", "text", "source")
    val out = TrainPrep.dsirSelect(docs, Seq("t"), keep = 10).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(out.keySet == Set(10L, 11L, 12L), "pool docs only, all kept")
    assert(out(10L)._2 == 1L && out(11L)._2 == 3L && out(12L)._2 == 2L,
      s"ranking did not follow target-likeness: $out")
    assert(out(10L)._1 > out(12L)._1 && out(12L)._1 > out(11L)._1)

    // on the real corpus: exactly `keep` rows, dense ranks, no target
    // docs, weights non-increasing
    val real = TrainPrep.qDsirSelect(spark, sf, keep = 50).collect()
    assert(real.length == 50)
    assert(real.map(_.getLong(4)).sorted.toSeq == (1L to 50L))
    assert(real.forall(r => !Set("src0", "src1").contains(r.getString(1))))
    val byRank = real.sortBy(_.getLong(4)).map(_.getDouble(3))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("packing: offsets chain exactly within each source shard") {
    val rows = TrainPrep.qPack(spark, sf, budget = 512).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    for ((_, docs) <- rows) {
      var offset = 0L
      for ((_, _, nTok, bin, binOff) <- docs.sortBy(_._2)) {
        assert(bin == offset / 512 && binOff == offset % 512,
          s"doc at offset $offset got (bin=$bin, off=$binOff)")
        offset += nTok
      }
    }
  }

  test("vocab growth: increments sum to the distinct vocabulary") {
    val rows = TrainPrep.qVocabGrowth(spark, sf).orderBy("bucket").collect()
    val vocab = Tables.documents(spark, sf)
      .selectExpr(s"explode(${graft.operators.TextAnalysis.wordsExpr}) AS tok")
      .select("tok").distinct().count()
    assert(rows.map(_.getLong(1)).sum == vocab)
    assert(rows.last.getLong(2) == vocab, "running total must end at |vocab|")
    // cumulative column is the running sum of increments
    assert(rows.map(_.getLong(1)).scanLeft(0L)(_ + _).tail.toSeq ===
      rows.map(_.getLong(2)).toSeq)
  }

  test("dedup rate: covers every source, bounded, consistent with the pipeline") {
    val rows = TrainPrep.qDedupRate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val corpus = Tables.documents(spark, sf)
    assert(rows.values.map(_._1).sum == corpus.count())
    for ((src, (n, d, rate)) <- rows) {
      assert(d >= 0 && d <= n, s"$src: $d dups of $n docs")
      assert(math.abs(rate - d.toDouble / n) < 1e-3)
    }
    // total drops match D7's drop set size
    val dropped = corpus.count() - Dedup.qDedupPipeline(spark, sf).count()
    assert(rows.values.map(_._2).sum == dropped)
  }

  test("mixture sample fills each source's token budget then stops") {
    val frac = 0.4
    val kept = TrainPrep.qMixture(spark, sf, frac).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val totals = Tables.documents(spark, sf)
      .selectExpr("source", s"CAST(size(${graft.operators.TextAnalysis.wordsExpr}) AS BIGINT) AS n")
      .groupBy("source").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == totals.keySet, "every source must be represented")
    for ((src, docs) <- kept) {
      val budget = math.ceil(totals(src) * frac).toLong
      val maxCum = docs.map(_._4).max
      val lastTokens = docs.maxBy(_._4)._3
      // the budget is filled: last admitted doc STARTS before the
      // budget and crossing it by at most that doc's own tokens
      assert(maxCum - lastTokens < budget && maxCum <= budget + lastTokens)
      // admitted token mass is ~frac of the source (within one doc)
      assert(maxCum >= budget, s"$src under-filled: $maxCum < $budget")
    }
    // deterministic: a second run is bit-identical
    val again = TrainPrep.qMixture(spark, sf, frac).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(again == kept.values.flatten.map(t => (t._2, t._4)).toSeq.sorted)
  }

  test("cluster representative is the longest member, lowest id on ties") {
    val comp = Dedup.qDedupCc(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val chars = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = comp.groupBy(_._2).map { case (c, members) =>
      val ids = members.map(_._1)
      c -> ((ids.maxBy(id => (chars(id), -id)), ids.length.toLong))
    }
    val got = TrainPrep.qClusterRep(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(1)))).toMap
    assert(got == want)
  }

  test("epoch shuffle: total per-epoch coverage, dense shard positions, fresh permutation per epoch") {
    val rows = TrainPrep.qEpochShuffle(spark, sf, epochs = 2, shards = 8).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sf).count()
    // every doc appears exactly once per epoch
    assert(rows.length == 2 * nDocs)
    assert(rows.groupBy(_._1).forall(_._2.map(_._2).distinct.length == nDocs))
    // positions are dense 1..n within each (epoch, shard)
    for (((_, _), g) <- rows.groupBy(r => (r._1, r._3)))
      assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq)
    // the permutation actually changes between epochs: some doc moves
    // shard, and shard routing is epoch-salted not constant
    val byEpoch = rows.groupBy(_._1).map { case (e, g) =>
      e -> g.map(r => r._2 -> r._3).toMap }
    assert(byEpoch(0).exists { case (doc, sh) => byEpoch(1)(doc) != sh })
    // determinism: a rerun is bit-identical (no RNG state anywhere)
    val again = TrainPrep.qEpochShuffle(spark, sf, epochs = 2, shards = 8).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq == rows.sorted.toSeq)
  }
}
