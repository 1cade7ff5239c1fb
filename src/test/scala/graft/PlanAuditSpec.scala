package graft

/** Plan-shape audit across the whole inventory: the properties that
  * decide whether a query survives a 100× scale-up, asserted on the
  * actual executed plans.
  */
class PlanAuditSpec extends GraftSuite {

  // queries allowed to build a nested-loop/cartesian plan: bounded
  // query-set kernels (q_knn_brute) and bounded broadcast sides
  // (q_knn_ivf's 16-row centroid table). q_embed_dup is NOT here
  // anymore — it must plan as an equi-join on its LSH buckets.
  // q_range_join joins against a 4-row broadcast interval table — the
  // broadcast nested-loop IS the intended scale plan there.
  private val allPairsWhitelist =
    Set("q_knn_brute", "q_knn_lsh", "q_knn_ivf", "q_range_join",
      // q_knn_ivfpq: the same E4 16-row centroid broadcast (coarse
      // quantizer); the scan join itself is equi on (cell, code)
      "q_knn_ivfpq",
      // q_knn_ivfpq_refine (r12): shares q_knn_ivfpq's ADC core (same
      // 16-row centroid broadcast); the refine legs are equi-joins on
      // neighbor_id/query_id against broadcast candidate pools
      "q_knn_ivfpq_refine",
      // q_knn_filtered (r12/E18): the E1/E4 kernels over the
      // label-filtered corpus — same bounded query-set broadcast
      "q_knn_filtered",
      // q_crossmodal (r12/G7): the E1 kernel with the corpus pre-pruned
      // by the broadcast metadata semi-join; the 12-row query set is
      // the broadcast side of the intended nested-loop
      "q_crossmodal",
      // q_resample: hourly-spine x event-type dims cross join (bounded
      // dimension product), broadcast against the hourly counts
      "q_resample",
      // q_quantized: ONE broadcast row (the per-dim range arrays)
      // against the corpus — the model-as-literal join
      "q_quantized",
      // q_rolling_active: bounded day spine (one row per day) broadcast
      // against daily-active pairs on a 7-day band condition
      "q_rolling_active",
      // q_drift: ONE broadcast row (global min/max) against the corpus
      // for integer bin assignment — the same model-as-literal join
      "q_drift",
      // q_semdedup: the E4 quantizer kernel — 16-row centroid table
      // broadcast against the corpus for cell assignment; the dedup
      // pair join itself is equi on the cell key
      "q_semdedup",
      // q_hard_negatives: the same E4 kernel (bounded centroid
      // broadcast) with a similarity ceiling before ranking
      "q_hard_negatives",
      // q_epoch_shuffle: the EPOCHS-row (2-row) epoch table broadcast
      // against the corpus — the model-as-literal cross join; every
      // downstream op is hash-partitioned on (epoch, shard)
      "q_epoch_shuffle",
      // q_nb_classify (F31): the |sources|-row priors/denominators
      // frame broadcast against the holdout token stream — the
      // model-as-literal join; the likelihood join is equi on
      // (class, token)
      "q_nb_classify",
      // q_embed_decontam (E14): the eval-sized benchmark set broadcast
      // against the corpus — for a one-shot decontam sweep the
      // broadcast scan IS the intended scale plan (see the operator
      // doc; E2/E4 are the repeated-query path)
      "q_embed_decontam")
  // building these DataFrames runs a streaming query — audited by
  // StreamingSpec instead.
  private val skip = Set("q_stream_tumble", "q_stream_join")

  // AUDIT-EXEMPT EAGER QUERIES (documented, not skipped): these run
  // their heavy work at DataFrame-CONSTRUCTION time and return only a
  // local relation or a final aggregate, so the plan asserts below see
  // the residue, not the heavy plan. Each one's heavy plan is audited
  // through another surface: q_equidepth rides the SAME selectAtBounds
  // selection core as q_percentile (whose returned frame IS the lazy
  // selection plan, pinned below); the q_lake_* staging/merge/feed
  // plans are pinned by SnapshotsSpec, MergeSpec and StreamingSpec.
  // This test keeps the documented set in sync with the inventory.
  private val eagerAudited = Set("q_equidepth", "q_lake_timetravel",
    "q_lake_vacuum", "q_lake_optimize", "q_lake_merge", "q_lake_changefeed",
    "q_lake_feed_stream", "q_lake_schema_evo", "q_lake_schema_map",
    "q_lake_zorder", "q_lake_partitioned",
    // r7 second pass: staging + maintenance chains whose plans are
    // pinned by SnapshotsSpec; q_lake_rowcount RETURNS a local
    // relation by design (the manifest-only count IS the point)
    "q_lake_restore", "q_lake_clone", "q_lake_dv", "q_lake_rowcount")

  test("audit-exempt eager query set matches the inventory") {
    assert(eagerAudited.subsetOf(SparkEntry.queries.keySet),
      s"documented eager queries missing from inventory: " +
        (eagerAudited -- SparkEntry.queries.keySet).mkString(", "))
  }

  test("audit walks the complete query inventory") {
    // the r5 regression hid 22 queries from the audit because plan
    // enumeration threw; pin the inventory size so a silently-shrunk
    // walk (or a dropped registration) fails loudly
    assert(SparkEntry.queries.size >= 137,
      s"query inventory shrank to ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "oracle entries without a matching query")
  }

  test("no unintended cartesian/nested-loop joins anywhere in the inventory") {
    SparkEntry.queries.keys.filterNot(skip).filterNot(allPairsWhitelist).foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name has BroadcastNestedLoopJoin")
      sources.LakehouseQueries.reclaim() // free eager lake staging copies
    }
  }

  test("every parquet scan in the inventory prunes its read schema") {
    // no query needs every lineitem column; a scan reading the full
    // schema means projection pushdown broke
    val fullLineitem = "l_orderkey,l_partkey,l_suppkey,l_linenumber,l_quantity," +
      "l_extendedprice,l_discount,l_tax,l_returnflag,l_linestatus,l_shipdate"
    SparkEntry.queries.keys.filterNot(skip).foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.replace(" ", "").contains(fullLineitem.replace(" ", "")),
        s"$name reads all lineitem columns")
      sources.LakehouseQueries.reclaim() // free eager lake staging copies
    }
  }

  test("dimension joins broadcast, never shuffle the fact side") {
    Seq("q_bcast_join", "q5_multijoin").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name lost its broadcast join")
    }
  }

  test("q5 multijoin: only dimensions build broadcast sides, facts always stream") {
    // the B6 scale contract: nation/region ride the broadcast chain;
    // lineitem/orders/customer/supplier may ONLY ever appear on the
    // streamed side of a broadcast join — a planner/stats change that
    // flips a fact table into a build side ships the fact to every
    // executor at 100 TB. Checked on the physical tree, not the plan
    // string, so the build-side scan set is exact.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    // at the test SF every table fits under the auto-broadcast
    // threshold and the planner broadcasts the facts too — exactly
    // what does NOT happen at 100 TB. Disabling auto-broadcast leaves
    // only the joins the QUERY declares broadcastable, which is the
    // decision that must hold at any scale.
    val exec = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      SparkEntry.queries("q5_multijoin")(spark, sf).queryExecution.sparkPlan
    }
    val bhj = exec.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size == 2, s"nation+region broadcast chain degraded: ${bhj.size} broadcasts")
    val buildScans = bhj.flatMap { j =>
      val build = if (j.buildSide == BuildRight) j.right else j.left
      build.collect { case sc: FileSourceScanExec =>
        sc.relation.location.rootPaths.mkString }
    }
    assert(buildScans.nonEmpty)
    buildScans.foreach { p =>
      assert(p.contains("nation") || p.contains("region"),
        s"fact table on a broadcast build side: $p")
    }
  }

  test("span family: the per-hash window consumes a pre-aggregation, not raw rows") {
    // the corpus-wide occurrence count must ride the (doc, h) pre-agg
    // (map-side combine; window partitions bounded by DOCS containing
    // h) — a window straight over the exploded occurrence rows buffers
    // a hot boilerplate hash whole in one WindowExec group
    Seq("q_dup_spans", "q_span_clean").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      val afterWindow = plan.substring(plan.indexOf("Window"))
      val agg = afterWindow.indexOf("Aggregate")
      val gen = afterWindow.indexOf("Generate")
      assert(agg >= 0 && gen > agg,
        s"$name: window sits on raw exploded rows — the (doc,h) pre-agg is gone")
    }
  }

  test("q_percentile keeps no full-column aggregation buffer") {
    // B12 must stay on the global-rank layout: Spark's percentile()
    // plans an ObjectHashAggregate whose buffer accumulates every value
    // in the group — a per-task OOM at 100 TB with few groups. The
    // rank-selection plan has no percentile() call and no
    // ObjectHashAggregate anywhere.
    val plan = SparkEntry.queries("q_percentile")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "percentile() buffer is back")
    assert(!plan.contains("ObjectHashAggregate"),
      "q_percentile plans an object-buffer aggregate")
  }

  test("whole-stage codegen covers the flagship aggregation") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    df.collect() // finalize the adaptive plan
    // codegen stages show as "*(n) Operator" in the finalized plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(500))
  }
}
