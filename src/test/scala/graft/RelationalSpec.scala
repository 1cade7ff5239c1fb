package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends GraftSuite {

  test("q1_agg groups by (returnflag, linestatus) with consistent totals") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q_filter pushes predicate and projection into the parquet scan") {
    val plan = Relational.qFilter(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull"))
    // projection pruned to the selected + filtered columns only
    assert(!plan.contains("l_comment") && !plan.contains("l_tax,"))
  }

  test("q_bcast_join broadcasts the part dimension") {
    val plan = Relational.qBcastJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q_topk_orders returns exactly the 10 priciest orders") {
    val got = Relational.qTopkOrders(spark, sf).collect().map(_.getAs[Long]("o_orderkey"))
    val want = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).collect().map(_.getAs[Long]("o_orderkey"))
    assert(got.sameElements(want))
  }

  test("q_semi + q_anti partition orders-with/without matching rows") {
    val semi = Relational.qSemi(spark, sf).count()
    val withBig = Tables.lineitem(spark, sf).filter(col("l_quantity") >= 49)
      .select("l_orderkey").distinct().count()
    assert(semi == withBig)
  }

  test("q_approx_distinct artifact self-certifies its HLL error envelope") {
    val rows = graft.operators.Relational.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"HLL estimate outside the 5×rsd envelope: $r")
      // exact columns really are exact — the envelope is anchored
      assert(r.getAs[Long]("exact_parts") > 0 && r.getAs[Long]("exact_orders") > 0)
    }
  }

  test("q_rollup contains the grand total row") {
    val rows = Relational.qRollup(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.lineitem(spark, sf).count())
  }

  test("TopKByScore aggregator: bounded buffer, deterministic merge order") {
    val agg = new graft.functions.TopKByScore(3)
    import graft.functions.Scored
    val rows = Seq(Scored(5, 1), Scored(9, 2), Scored(9, 9), Scored(1, 3), Scored(7, 4))
    val b = rows.foldLeft(agg.zero)(agg.reduce)
    assert(b.length == 3)
    assert(agg.finish(b) == Seq(Scored(9, 2), Scored(9, 9), Scored(7, 4)))
    // merge of two partial buffers == aggregate of the union
    val (l, r) = rows.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == agg.finish(b))
  }

  test("q_topk_per_key agrees with the window formulation") {
    val viaAgg = Relational.qTopkPerKey(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = Tables.orders(spark, sf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("q_window running_spend is monotone within a customer") {
    val rows = Relational.qWindow(spark, sf)
      .orderBy("o_custkey", "rn").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    rows.values.foreach { rs =>
      val spends = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("running_spend"))
      assert(spends.sameElements(spends.sorted))
    }
  }

  test("q_pivot is one single-pass hash aggregate, totals match q1-style sums") {
    val df = Relational.qPivot(spark, sf)
    assert(df.columns.toSeq === Seq("l_linestatus", "qty_a", "qty_n", "qty_r"))
    // explicit pivot values: ONE aggregate over ONE scan, no values-discovery job
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CollectLimit"), "pivot ran a values-discovery job")
    val pivotTotal = df.collect()
      .flatMap(r => Seq("qty_a", "qty_n", "qty_r").map(c =>
        Option(r.getAs[java.lang.Double](c)).map(_.doubleValue).getOrElse(0.0))).sum
    val direct = Tables.lineitem(spark, sf).agg(sum("l_quantity")).head.getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6 * direct)
  }

  test("q_cube emits all four grouping sets with consistent grand total") {
    val rows = Relational.qCube(spark, sf).collect()
    val sets = rows.map(r => (r.getAs[Int]("g_status"), r.getAs[Int]("g_prio"))).toSet
    assert(sets === Set((0, 0), (0, 1), (1, 0), (1, 1)))
    val grand = rows.filter(r => r.getAs[Int]("g_status") == 1 && r.getAs[Int]("g_prio") == 1)
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_orders") === Tables.orders(spark, sf).count())
    // single Expand + aggregate, not one scan per grouping set
    val plan = Relational.qCube(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Union"), "cube planned as per-set scans + union")
  }

  test("q_range_join partitions every part into exactly one band") {
    val rows = Relational.qRangeJoin(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_parts")).sum === Tables.part(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("min_price") >= 900.0 - 1e-9)
      assert(r.getAs[Double]("max_price") < 1000.0 + 1e-9)
    }
    // the 4-row interval side must broadcast, never shuffle the fact side
    val plan = Relational.qRangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q_histogram buckets partition all rows with ordered bounds") {
    val rows = Relational.qHistogram(spark, sf).orderBy("bucket").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Double]("lo") >= b * 5000.0 - 1e-6)
      assert(r.getAs[Double]("hi") < (b + 1) * 5000.0 + 1e-6)
    }
  }

  test("q_outer_join keeps unmatched rows from BOTH sides") {
    val rows = Relational.qOuterJoin(spark, sf).collect()
    val cats = rows.groupBy(r =>
      (r.getAs[Boolean]("in_segment"), r.getAs[Boolean]("has_orders")))
    assert(cats.contains((true, false)), "missing left-only rows")
    assert(cats.contains((true, true)), "missing matched rows")
    // right-only rows must exist at sf with enough orders; all
    // unmatched rows are zero-filled, never null
    rows.filter(!_.getAs[Boolean]("has_orders")).foreach { r =>
      assert(r.getAs[Long]("n_orders") == 0L && r.getAs[Double]("spend") == 0.0)
    }
  }

  test("q_profile one-row summary matches direct counts") {
    val r = Relational.qProfile(spark, sf).head
    val docs = Tables.documents(spark, sf)
    assert(r.getAs[Long]("n_rows") == docs.count())
    assert(r.getAs[Long]("nd_source") ==
      docs.select("source").distinct().count())
    assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("max_chars"))
  }

  test("q_stats_agg moments are finite and consistent") {
    val rows = Relational.qStatsAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sd_price") > 0)
      assert(r.getAs[Double]("var_qty") > 0)
      assert(math.abs(r.getAs[Double]("corr_qty_price")) <= 1.0)
    }
  }
}
