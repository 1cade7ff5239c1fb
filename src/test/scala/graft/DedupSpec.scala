package graft

import graft.operators.Dedup

class DedupSpec extends GraftSuite {

  test("q_dedup_exact keeps one representative per content hash") {
    val rows = Dedup.qDedupExact(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum == Tables.documents(spark, sf).count())
    assert(rows.map(_.getAs[String]("content_hash")).distinct.length == rows.length)
  }

  test("jaccard pairs are within [tau, 1] and deduplicated") {
    val rows = Dedup.qJaccardPairs(spark, sf, tau = 0.5).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("minhash-LSH candidates recover all high-jaccard pairs (recall on S-curve)") {
    val trueDups = Dedup.qJaccardPairs(spark, sf, tau = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = Dedup.qMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 12 hashes / 4 bands: P(candidate | j>=0.8) = 1-(1-j^3)^4 >= 0.95
    assert(trueDups.nonEmpty)
    assert((trueDups -- candidates).size <= math.max(1, trueDups.size / 10))
  }

  test("simhash of near-duplicate docs differ in few bits") {
    val fp = Dedup.qSimhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val dups = Dedup.qJaccardPairs(spark, sf, tau = 0.8).collect()
    assert(dups.nonEmpty)
    dups.foreach { r =>
      val dist = java.lang.Long.bitCount(fp(r.getLong(0)) ^ fp(r.getLong(1)))
      assert(dist <= 20, s"hamming $dist for pair ${r.getLong(0)},${r.getLong(1)}")
    }
  }

  test("dedup pipeline drops exactly the higher ids of verified pairs") {
    val docs = Tables.documents(spark, sf)
    val dropped = Dedup.qJaccardPairs(spark, sf, tau = 0.5).select("doc_b")
      .distinct().collect().map(_.getLong(0)).toSet
    val kept = Dedup.qDedupPipeline(spark, sf).collect().map(_.getLong(0)).toSet
    assert(kept.size == docs.count() - dropped.size)
    assert((kept & dropped).isEmpty)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.qEmbedDup(spark, sf, tau = 0.4).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_sim") >= 0.4)
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
    }
  }
}
