package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomKernel
import graft.operators.BloomJoin

/** Bloom semi-join pushdown: no false negatives (exactness), real
  * selectivity (the point of the pre-filter), codegen'd probe.
  */
class BloomSpec extends GraftSuite {

  test("kernel: inserted keys always probe true") {
    val keys = (1L to 200L).map(_ * 7919L)
    val numWords = 64
    val bits = new Array[Long](numWords)
    for (x <- keys; i <- 0 until 5) {
      val p = BloomKernel.pos(x, i, numWords * 64)
      bits(p >>> 6) |= 1L << (p & 63)
    }
    assert(keys.forall(BloomKernel.mightContain(bits, _, 5)))
  }

  test("q_bloom_semi: equals plain semi join; pre-filter prunes the fact side") {
    val supp = Tables.supplier(spark, sf)
      .filter(col("s_nationkey") === 7).select("s_suppkey")
    val li = Tables.lineitem(spark, sf).select("l_suppkey", "l_quantity")
    val total = li.count()
    val exactRows = li
      .join(supp, li("l_suppkey") === supp("s_suppkey"), "left_semi").count()

    val bits = BloomJoin.buildBloom(supp, "s_suppkey", numWords = 128, k = 5)
    val pre = li.filter(graft.functions.bloom_might_contain(col("l_suppkey"), bits, 5))
    val preRows = pre.count()
    // superset of the true matches (no false negatives), far below total
    assert(preRows >= exactRows)
    assert(preRows < total / 2, s"pre-filter kept $preRows of $total")

    val got = BloomJoin.qBloomSemi(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = li.join(supp, li("l_suppkey") === supp("s_suppkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)

    // the probe participates in whole-stage codegen above the scan
    val plan = pre.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("bloommightcontain"), plan.take(500))
  }
}
