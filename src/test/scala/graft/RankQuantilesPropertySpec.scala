package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Randomized property armor for the B12 weighted-rank quantile
  * machinery: many seeded datasets spanning the layout's edge
  * geometry — heavy ties (collapse weights > 1), groups smaller than
  * the partition count (empty layout partitions), single-row and
  * all-equal groups, bounds straddling partition boundaries — each
  * compared against a driver-side reference quantile_cont.
  */
class RankQuantilesPropertySpec extends GraftSuite {

  /** quantile_cont reference: sort, h = (n-1)p, interpolate. */
  private def ref(values: Seq[Double], p: Double): Double = {
    val v = values.sorted
    val h = (v.size - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    v(lo) + (h - lo) * (v(hi) - v(lo))
  }

  private val quantiles = Seq(
    "p00" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
    "p77" -> 0.77, "p95" -> 0.95, "p100" -> 1.0)

  test("rankQuantiles matches reference quantile_cont on 20 seeded random datasets") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 20) {
      val nGroups = 1 + rnd.nextInt(4)
      val groups = (0 until nGroups).map(i => s"g$i")
      // tie-heavy value pools force collapse weights > 1; continuous
      // pools force near-unique values (collapse ~no-op)
      val tieHeavy = rnd.nextBoolean()
      val data: Seq[(String, Double)] = groups.flatMap { g =>
        val n = 1 + rnd.nextInt(400)
        (0 until n).map { _ =>
          val v =
            if (tieHeavy) rnd.nextInt(12).toDouble
            else math.rint(rnd.nextDouble() * 1e6) / 100.0
          g -> v
        }
      }
      val numParts = Seq(2, 5, 32)(rnd.nextInt(3))
      val df = spark.createDataFrame(data).toDF("grp", "value")
      val got = Relational.rankQuantiles(
        df, Seq("grp"), "value", quantiles, numParts)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
      val byGroup = data.groupBy(_._1)
      for ((g, rows) <- byGroup; (qn, p) <- quantiles) {
        val want = ref(rows.map(_._2), p)
        val have = got.getOrElse((g, qn),
          fail(s"trial $trial: missing ($g, $qn) [parts=$numParts]"))
        assert(math.abs(have - want) <= 1e-9 * math.max(1.0, math.abs(want)),
          s"trial $trial: ($g, $qn) = $have, want $want " +
            s"[n=${rows.size}, parts=$numParts, tieHeavy=$tieHeavy]")
      }
    }
  }

  test("degenerate geometries: single row, all-equal, group count > rows per part") {
    val cases = Seq(
      Seq("a" -> 42.0),                                  // single row
      Seq("a" -> 7.0, "a" -> 7.0, "a" -> 7.0),           // all equal
      ('a' to 'z').map(c => c.toString -> c.toDouble),   // 26 one-row groups
      Seq("a" -> 1.0, "a" -> 2.0, "b" -> 3.0))           // 2-and-1 split
    for ((data, i) <- cases.zipWithIndex) {
      val df = spark.createDataFrame(data).toDF("grp", "value")
      val got = Relational.rankQuantiles(df, Seq("grp"), "value", quantiles, 32)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
      for ((g, rows) <- data.groupBy(_._1); (qn, p) <- quantiles) {
        val want = ref(rows.map(_._2), p)
        assert(math.abs(got((g, qn)) - want) <= 1e-9,
          s"case $i: ($g, $qn) = ${got((g, qn))}, want $want")
      }
    }
  }
}
