package graft

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Sketches}

class SketchesSpec extends GraftSuite {

  test("count-min heavy hitters: one-sided error within eps*N") {
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val exact = li.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.qHeavyHitters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((k, e) <- est) {
      val t = exact.getOrElse(k, 0L)
      assert(e >= t, s"CMS undercounted key $k: $e < $t")
      assert(e <= t + (0.001 * n).ceil.toLong * 3,
        s"CMS overcount beyond bound for $k: $e vs true $t (n=$n)")
    }
  }

  test("approx quantiles: rank error within relativeError bound") {
    val vals = Tables.lineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val rows = Sketches.qApproxQuantileDetail(spark, sf).collect()
    val got = rows.map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // the query's self-reported envelope agrees with the guarantee
    rows.foreach(r => assert(r.getAs[Double]("rank_err") == 0.0,
      s"self-reported rank envelope violated: $r"))
    for ((p, v) <- got) {
      // rank of the returned value must be within (p ± err) * n
      val rankLo = vals.count(_ < v)
      val rankHi = vals.count(_ <= v)
      val err = 0.001
      val lo = math.floor((p - err) * n) - 1
      val hi = math.ceil((p + err) * n) + 1
      assert(rankHi >= lo && rankLo <= hi,
        s"p=$p value $v has rank [$rankLo,$rankHi] outside [$lo,$hi] of n=$n")
    }
  }

  test("incremental agg state merge equals full recomputation") {
    val full = graft.operators.Incremental.qIncrAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val li = Tables.lineitem(spark, sf)
    val want = li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 4).as("sq"),
        round(sum("l_extendedprice"), 4).as("sp"),
        round(sum("l_quantity") / count(lit(1)), 4).as("aq"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(full == want)
    // three-way split merges to the same state as a two-way split
    val s3 = Seq(0, 1, 2).map(i => li.filter(col("l_orderkey") % 3 === i)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_price")))
    val merged = s3.reduce((a, b) =>
      Incremental.mergeAggState(a, b, Seq("l_returnflag", "l_linestatus")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cnts = full.map { case (k, v) => k -> v._1 }
    assert(merged == cnts)
  }
}
