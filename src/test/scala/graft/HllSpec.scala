package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll

/** A61 — the per-file NDV sketch's math, pinned without Spark: the
  * estimator's accuracy across magnitudes (including the linear-
  * counting small range), and the register-wise merge being exactly
  * set union. The end-to-end path (statsLines → manifest → CBO stats
  * without ANALYZE, delete-tracking) is pinned in LakeSqlSpec.
  */
class HllSpec extends AnyFunSuite {

  // splitmix64: a uniform stand-in for the xxhash64 the engine feeds
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def sketchOf(values: Iterable[Long]): Array[Byte] =
    values.foldLeft(Hll.RegistersAgg.zero)((b, v) =>
      Hll.RegistersAgg.reduce(b, mix(v)))

  test("estimate accuracy: exact-ish in the linear-counting range, " +
      "within ~20% at scale, duplicates never inflate") {
    for (n <- Seq(1, 10, 100)) {
      val e = Hll.estimate(sketchOf(1L to n.toLong))
      assert(math.abs(e - n) <= math.max(1, n / 5), s"n=$n est=$e")
    }
    for (n <- Seq(10000, 200000)) {
      val e = Hll.estimate(sketchOf(1L to n.toLong))
      assert(e > n * 0.8 && e < n * 1.2, s"n=$n est=$e")
    }
    // 50k values, each 10 times: the estimate sees 50k, not 500k
    val dup = sketchOf((1L to 500000L).map(_ % 50000L))
    val e = Hll.estimate(dup)
    assert(e > 40000 && e < 60000, s"dup est=$e")
    // empty sketch estimates ~nothing
    assert(Hll.estimate(Hll.RegistersAgg.zero) <= 1L)
  }

  test("register-wise merge IS set union (overlapping, disjoint, " +
      "subset files)") {
    val a = sketchOf(1L to 30000L)
    val b = sketchOf(20000L to 50000L) // overlaps a
    val m = Hll.merge(a, b)
    val u = Hll.estimate(m)
    assert(u > 50000 * 0.8 && u < 50000 * 1.2, s"union est=$u")
    // merge with a subset changes nothing
    val sub = sketchOf(5L to 99L)
    assert(Hll.estimate(Hll.merge(a, sub)) == Hll.estimate(a))
    // merge is commutative and idempotent on registers
    assert(Hll.merge(a, b).toSeq == Hll.merge(b, a).toSeq)
    assert(Hll.merge(m, m).toSeq == m.toSeq)
    // hex round-trip is exact
    assert(Hll.fromHex(Hll.toHex(m)).toSeq == m.toSeq)
  }
}
