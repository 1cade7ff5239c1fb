package graft

import scala.math.BigDecimal.RoundingMode

import graft.operators.Clustering

/** Verifies distributed Lloyd's against an independent in-memory
  * reference on sf0.001 — same deterministic init, argmin tiebreak, and
  * 6-decimal centroid quantization, nothing shared with the Spark
  * implementation.
  */
class ClusteringSpec extends GraftSuite {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble

  test("q_kmeans matches a reference Lloyd's run exactly") {
    val data = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val k = Clustering.K
    var cents = data.take(k).map(_._2.clone())
    def distSq(v: Array[Double], c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - c(i); s += t * t; i += 1 }
      s
    }
    def assign(): Map[Long, Int] = data.map { case (id, v) =>
      id -> (0 until k).minBy(j => (distSq(v, cents(j)), j))
    }.toMap
    for (_ <- 0 until Clustering.Iters) {
      val a = assign()
      cents = (0 until k).map { j =>
        val members = data.filter { case (id, _) => a(id) == j }
        (0 until cents(j).length).map { d =>
          round6(members.map(_._2(d)).sum / members.size)
        }.toArray
      }.toArray
    }
    val want = assign()
    val got = Clustering.qKmeans(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got.keySet == want.keySet)
    assert(got == want)
    // sanity on the model: no empty cluster at this sf (the documented
    // keep-previous-centroid rule never fires, so the oracle's simpler
    // semantics agree)
    assert(got.values.toSet == (0 until k).toSet)
  }

  test("coreset keeps exactly the m nearest vectors per cluster, via the native top-k") {
    val assigned = Clustering.qKmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = Clustering.qCoreset(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
    // independent reference: sort each cluster by (dist, id), take m
    val want = assigned.groupBy(_._2).toSeq.flatMap { case (cl, rs) =>
      rs.sortBy(r => (r._3, r._1)).take(Clustering.CoresetM)
        .zipWithIndex.map { case (r, i) => (cl, (i + 1).toLong, r._1) }
    }.toSet
    assert(got.toSet == want)
    // per-cluster cardinality is bounded by m
    got.groupBy(_._1).foreach { case (_, rs) => assert(rs.length <= Clustering.CoresetM) }
  }

  test("kmeans init plans as distributed top-k, never a global sort") {
    // the deterministic init (k lowest vec_ids) must stay
    // TakeOrderedAndProject: per-partition bounded heaps + driver
    // merge. A refactor that regresses it to Sort+Limit would global-
    // sort the whole corpus to pick k rows at 100 TB.
    val init = Clustering.initFrame(
      Tables.embeddings(spark, sf).select("vec_id", "embedding"), 16)
    val plan = init.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("GlobalLimit"), plan.take(800))
  }

  test("kmeans assignment quality beats a degenerate single cluster") {
    val out = Clustering.qKmeans(spark, sf).collect()
    val inertia = out.map(_.getDouble(2)).sum
    // all-in-one-cluster inertia (variance around the global mean) must
    // be strictly worse than the k-means objective
    val data = Tables.embeddings(spark, sf)
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble))
    val dim = data.head.size
    val mean = (0 until dim).map(d => data.map(_(d)).sum / data.size)
    val single = data.map(v =>
      (0 until dim).map(d => (v(d) - mean(d)) * (v(d) - mean(d))).sum).sum
    assert(inertia < single)
  }
}
