package graft

import graft.operators.Graph

class GraphSpec extends GraftSuite {

  test("pagerank on a path graph matches the hand-rolled reference") {
    import spark.implicits._
    // undirected path a-b-c: b is the hub and must rank highest
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Graph.pagerank(pairs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: same fixed-point loop in plain Scala with the same
    // round-8 quantization per iteration
    def round8(x: Double) = BigDecimal(x)
      .setScale(8, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val edges = Seq(1L -> 2L, 2L -> 3L).flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 0 until Graph.PrIters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / deg(s) }.sum).toMap
      pr = pr.keys.map(v => v ->
        round8((1.0 - Graph.Damping) / 3 + Graph.Damping * contrib.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == Set(1L, 2L, 3L))
    for ((k, v) <- pr) assert(math.abs(got(k) - v) < 1e-12, s"node $k: ${got(k)} vs $v")
    assert(got(2L) > got(1L) && got(2L) > got(3L))
  }

  test("triangles: 4-clique + pendant chain, degree-ordered count") {
    import spark.implicits._
    // 4-clique {1,2,3,4} (4 triangles, each node in C(3,2)=3) plus a
    // chain 4-5-6 that closes nothing
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Graph.triangles(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L, 6L -> 0L))
  }

  test("q_pagerank conserves rank mass on the near-dup graph") {
    val out = Graph.qPagerank(spark, sf).collect().map(_.getDouble(1))
    if (out.nonEmpty) {
      // symmetric graph, no dangling nodes → total mass stays 1 up to
      // the per-iteration round-8 quantization
      assert(math.abs(out.sum - 1.0) < out.length * 5e-8 + 1e-9, out.sum)
      assert(out.forall(_ > 0))
    }
  }
}
