package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, Snapshots}

/** A55 — incremental materialized-view maintenance: exact parity with
  * a full recompute after mixed DML waves, exactly-once refresh under
  * the A51 mark, the no-base-scan property (an untouched base file can
  * vanish from disk), and the NULL sum algebra (sum of an all-NULL
  * group is NULL, maintained from deltas alone).
  */
class MaterializedViewSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_mv").toString

  private def ordersDf = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def recompute(base: String): DataFrame =
    Snapshots.read(spark, base).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("o_custkey").as("sum_o_custkey"),
        avg("o_custkey").as("avg_o_custkey"))

  private def assertSame(got: DataFrame, want: DataFrame): Unit =
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "mismatch:\n got-extra: " + got.exceptAll(want).take(5).mkString("; ") +
        "\n want-extra: " + want.exceptAll(got).take(5).mkString("; "))

  test("refresh equals a full recompute after merge/delete/append waves") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    assertSame(MaterializedView.read(spark, mv), recompute(base))

    // wave 1: updates that MOVE rows between groups + fresh inserts
    Snapshots.mergeVersioned(spark, base,
      ordersDf.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("M"))
        .unionByName(ordersDf.filter(col("o_orderkey") % 7 === 1)
          .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
          .withColumn("o_orderstatus", lit("Q"))),
      "o_orderkey")
    // wave 2: deletes
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 11 === 3)
    // wave 3: appends
    Snapshots.appendVersioned(spark, base,
      ordersDf.filter(col("o_orderkey") % 13 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 80000000L))
    val v1 = MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv), recompute(base))

    // exactly-once: nothing new consumed → version unchanged, twice
    assert(MaterializedView.refresh(spark, mv) == v1)
    assert(MaterializedView.refresh(spark, mv) == v1)
    assert(MaterializedView.consumedVersion(mv) ==
      Snapshots.currentVersion(base))

    // a second wave keeps following
    Snapshots.deleteVersioned(spark, base, col("o_orderstatus") === "M")
    MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv), recompute(base))
    // the M group died entirely — no zero-count tombstone survives
    assert(MaterializedView.read(spark, mv)
      .filter(col("o_orderstatus") === "M").isEmpty)
  }

  test("refresh never scans the base: an untouched base file can vanish") {
    val base = tmp(); val mv = tmp() + "/mv"
    // range-partitioned layout: the wave below touches only the
    // lowest key range, so most original files stay live untouched
    ordersDf.repartitionByRange(6, col("o_orderkey"))
      .write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    val before = Snapshots.liveFiles(base, Snapshots.currentVersion(base))
    Snapshots.mergeVersioned(spark, base,
      ordersDf.orderBy(col("o_orderkey")).limit(50)
        .withColumn("o_custkey", col("o_custkey") + 1000L), "o_orderkey")
    val expected = recompute(base).collect().toSeq // while files exist
    // remove one ORIGINAL file the merge retained: a refresh that
    // rescanned the base would now throw
    val untouched = Snapshots
      .liveFiles(base, Snapshots.currentVersion(base)).filter(before.contains)
    assert(untouched.nonEmpty)
    Files.delete(Paths.get(untouched.head))
    MaterializedView.refresh(spark, mv)
    val got = MaterializedView.read(spark, mv).collect().toSeq
    assert(got.toSet == expected.toSet,
      s"got ${got.size} rows, want ${expected.size}")
  }

  test("NULL sum algebra: all-NULL group sums to NULL through waves") {
    import spark.implicits._
    val base = tmp(); val mv = tmp() + "/mv"
    Seq((1L, "a", Some(2.0)), (2L, "a", None), (3L, "b", None))
      .toDF("k", "g", "x").write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "k", Seq("g"), Seq("x"))
    def row(g: String) = MaterializedView.read(spark, mv)
      .filter(col("g") === g).collect().head
    assert(row("b").isNullAt(2) && row("b").isNullAt(3)) // sum_x, avg_x
    assert(row("a").getDouble(2) == 2.0)

    // b gains a non-null contributor → sum appears
    Snapshots.appendVersioned(spark, base,
      Seq((4L, "b", Some(5.5))).toDF("k", "g", "x"))
    MaterializedView.refresh(spark, mv)
    assert(row("b").getDouble(2) == 5.5 && row("b").getLong(1) == 2L)

    // ... and loses it again → back to NULL (nn_x hit 0, cnt didn't)
    Snapshots.deleteVersioned(spark, base, col("k") === 4L)
    MaterializedView.refresh(spark, mv)
    assert(row("b").isNullAt(2) && row("b").getLong(1) == 1L)

    // a NULL group value and the string "null" stay distinct groups
    Snapshots.appendVersioned(spark, base,
      Seq((5L, null.asInstanceOf[String], Some(1.0)),
        (6L, "null", Some(2.0))).toDF("k", "g", "x"))
    MaterializedView.refresh(spark, mv)
    val mvRows = MaterializedView.read(spark, mv)
    assert(mvRows.filter(col("g").isNull).count() == 1)
    assert(mvRows.filter(col("g") === "null").count() == 1)
  }

  test("A55×A45: continuous MV — the CDF stream triggers exactly-once " +
      "refreshes that stay recompute-exact") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    val ckpt = tmp()
    val q = spark.readStream.format("graft").option("keyCol", "o_orderkey")
      .option("readChangeFeed", "true").load(base)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        // the stream is the TRIGGER; refresh() reads the feed itself
        // under the A51 mark, so a replayed batch is a no-op — this is
        // what makes foreachBatch's at-least-once safe here
        MaterializedView.refresh(spark, mv); ()
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable() // v0 snapshot batch: refresh no-ops
      val mvV0 = Snapshots.currentVersion(mv)
      Snapshots.mergeVersioned(spark, base,
        ordersDf.filter(col("o_orderkey") % 6 === 0)
          .withColumn("o_orderstatus", lit("S")), "o_orderkey")
      q.processAllAvailable()
      assertSame(MaterializedView.read(spark, mv), recompute(base))
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 9 === 4)
      q.processAllAvailable()
      assertSame(MaterializedView.read(spark, mv), recompute(base))
      // exactly one MV commit per consumed base commit, none for v0
      assert(Snapshots.currentVersion(mv) == mvV0 + 2)
    } finally q.stop()
  }

  test("A57 join MV: refresh equals recompute under simultaneous waves " +
      "on both sides, incl. join-key moves and matched double-inserts") {
    val l = tmp(); val r = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(l)
    Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"),
        col("c_acctbal"))
      .write.mode("overwrite").parquet(r)
    Snapshots.init(spark, l, changeDataFeed = true)
    Snapshots.init(spark, r, changeDataFeed = true)
    MaterializedView.createJoin(spark, mv, l, "o_orderkey", r, "o_custkey",
      "o_custkey", Seq("c_mktsegment"), Seq("o_orderkey"))
    def recomputeJoin = Snapshots.read(spark, l)
      .join(Snapshots.read(spark, r), Seq("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        sum("o_orderkey").as("sum_o_orderkey"),
        avg("o_orderkey").as("avg_o_orderkey"))
    assertSame(MaterializedView.read(spark, mv), recomputeJoin)

    // simultaneous waves: left moves JOIN KEYS and inserts a row whose
    // matching customer arrives in the SAME window (the ΔL⋈ΔR term);
    // right moves groups and kills a fanout
    Snapshots.mergeVersioned(spark, l,
      ordersDf.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_custkey", col("o_custkey") + 1L) // join-key move
        .unionByName(ordersDf.filter(col("o_orderkey") % 11 === 5)
          .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
          .withColumn("o_custkey", lit(77777777L))), // matches new cust
      "o_orderkey")
    Snapshots.deleteVersioned(spark, l, col("o_orderkey") % 13 === 1)
    import spark.implicits._
    Snapshots.appendVersioned(spark, r,
      Seq((77777777L, "NEWSEG", 0.0))
        .toDF("o_custkey", "c_mktsegment", "c_acctbal"))
    Snapshots.mergeVersioned(spark, r,
      Tables.customer(spark, sf).filter(col("c_custkey") % 5 === 2)
        .select(col("c_custkey").as("o_custkey"),
          lit("MOVED").as("c_mktsegment"), col("c_acctbal")),
      "o_custkey")
    Snapshots.deleteVersioned(spark, r, col("o_custkey") % 17 === 3)

    val v1 = MaterializedView.refreshJoin(spark, mv)
    assertSame(MaterializedView.read(spark, mv), recomputeJoin)
    // the double-insert window really contributed
    assert(MaterializedView.read(spark, mv)
      .filter(col("c_mktsegment") === "NEWSEG").count() == 1)
    // exactly-once + both marks atomic
    assert(MaterializedView.refreshJoin(spark, mv) == v1)
    assert(Snapshots.txnVersionOf(mv, "mvL@" +
      java.nio.file.Paths.get(l).toAbsolutePath.normalize).contains(
      Snapshots.currentVersion(l).toLong))
    assert(Snapshots.txnVersionOf(mv, "mvR@" +
      java.nio.file.Paths.get(r).toAbsolutePath.normalize).contains(
      Snapshots.currentVersion(r).toLong))

    // one-sided window: only the left moves (the L_old ⋈ ΔR term absent)
    Snapshots.deleteVersioned(spark, l, col("o_orderkey") % 19 === 2)
    MaterializedView.refreshJoin(spark, mv)
    assertSame(MaterializedView.read(spark, mv), recomputeJoin)
    // ... and only the right moves
    Snapshots.deleteVersioned(spark, r, col("o_custkey") % 23 === 4)
    MaterializedView.refreshJoin(spark, mv)
    assertSame(MaterializedView.read(spark, mv), recomputeJoin)
  }

  test("multi-column group keys keep tuple boundaries: " +
      "(ab,c) and (a,bc) are different groups") {
    import spark.implicits._
    val base = tmp(); val mv = tmp() + "/mv"
    Seq((1L, "ab", "c", 10L), (2L, "a", "bc", 20L), (3L, "ab", "c", 30L),
      (4L, "a|b", "c", 1L), (5L, "a", "b|c", 2L)) // separator-bearing
      .toDF("k", "g1", "g2", "x").write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "k", Seq("g1", "g2"), Seq("x"))
    val rows = MaterializedView.read(spark, mv)
    assert(rows.count() == 4)
    assert(rows.filter(col("g1") === "ab" && col("g2") === "c")
      .collect().head.getLong(2) == 2L)
    // a delta against one of the twin groups touches ONLY that group
    Snapshots.deleteVersioned(spark, base, col("k") === 2L)
    MaterializedView.refresh(spark, mv)
    val after = MaterializedView.read(spark, mv)
    assert(after.count() == 3)
    assert(after.filter(col("g1") === "a" && col("g2") === "bc").isEmpty)
    assert(after.filter(col("g1") === "a|b").count() == 1)
    assert(after.filter(col("g1") === "a" && col("g2") === "b|c")
      .count() == 1)
  }

  test("vacuum lease: an aggressive base vacuum cannot reclaim the " +
      "window the next refresh needs; consuming releases it") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true) // v0
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey")) // lease pins v0
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 3 === 0) // v1
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 5 === 1) // v2
    // aggressive vacuum: without the lease this drops v0/v1 history
    // (incl. v1's stored change data) and the refresh would fail or
    // silently fall back onto missing manifests
    Snapshots.vacuum(base, keepFrom = 2)
    MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv), recompute(base))
    // the lease MOVED to v2: the same vacuum now reclaims the history
    assert(Snapshots.vacuum(base, keepFrom = 2) > 0)
    // ... and a join MV's lease protects the old-left time travel too
    val r = tmp(); val jmv = tmp() + "/jmv"
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("o_custkey", "seg")
      .write.mode("overwrite").parquet(r)
    Snapshots.init(spark, r, changeDataFeed = true)
    val l2 = tmp()
    ordersDf.filter(col("o_custkey") <= 2L).write.mode("overwrite").parquet(l2)
    Snapshots.init(spark, l2, changeDataFeed = true) // v0 = join-MV's L_old
    MaterializedView.createJoin(spark, jmv, l2, "o_orderkey", r,
      "o_custkey", "o_custkey", Seq("seg"), Seq.empty)
    Snapshots.mergeVersioned(spark, r,
      Seq((1L, "x2")).toDF("o_custkey", "seg"), "o_custkey") // ΔR
    Snapshots.deleteVersioned(spark, l2, col("o_orderkey") % 2 === 0) // ΔL
    Snapshots.vacuum(l2, keepFrom = 1) // would drop v0 without the lease
    MaterializedView.refreshJoin(spark, jmv) // L_old = v0 still readable
    val want = Snapshots.read(spark, l2)
      .join(Snapshots.read(spark, r), Seq("o_custkey"))
      .groupBy("seg").agg(count(lit(1)).as("cnt"))
    assertSame(MaterializedView.read(spark, jmv), want)
  }

  test("medallion composition: base CDF stream drives the MV (silver), " +
      "the MV's own stream feeds downstream (gold)") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    // silver: CDF-triggered exactly-once refreshes (as in the A55×A45
    // test); gold: the MV is ITSELF a graft table, so a downstream
    // consumer just streams it — versions-as-offsets, no extra code
    val silver = spark.readStream.format("graft")
      .option("keyCol", "o_orderkey").option("readChangeFeed", "true")
      .load(base).writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        MaterializedView.refresh(spark, mv); () }
      .option("checkpointLocation", tmp()).start()
    val goldRows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val gold = spark.readStream.format("graft")
      .option("keyCol", "__mv_key").load(mv).writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        goldRows.synchronized {
          goldRows ++= b.select("o_orderstatus", "cnt").collect()
            .map(r => (r.getString(0), r.getLong(1)))
        }; ()
      }
      .option("checkpointLocation", tmp()).start()
    try {
      silver.processAllAvailable(); gold.processAllAvailable()
      goldRows.synchronized(goldRows.clear()) // drop the initial snapshot
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 4 === 2)
      silver.processAllAvailable() // bronze → silver
      gold.processAllAvailable()   // silver → gold
      val want = Snapshots.read(spark, base).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // the gold stream delivered the refreshed MV's rows
      assert(goldRows.synchronized(goldRows.toSet) == want,
        s"gold=${goldRows.toSet} want=$want")
    } finally { silver.stop(); gold.stop() }
  }

  test("OPTIMIZE on the MV composes: marks and lease survive compaction, " +
      "describe() reports freshness") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 4 === 1)
    MaterializedView.refresh(spark, mv)
    // the MV is an ordinary graft table: compact it like any other —
    // the A51 marks (and so the watermark) self-carry through
    Snapshots.compact(spark, mv)
    val d0 = MaterializedView.describe(mv)
    assert(d0.size == 1 && d0.head._6 == 0L, s"lag after refresh: $d0")
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 6 === 2)
    assert(MaterializedView.describe(mv).head._6 == 1L) // one behind
    MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv), recompute(base))
    assert(MaterializedView.describe(mv).head._6 == 0L)
  }

  test("drop() releases the lease: history the MV pinned becomes " +
      "reclaimable") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"))
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 2 === 0)
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 3 === 0)
    assert(Snapshots.vacuum(base, keepFrom = 2) == 0) // lease pins v0..
    MaterializedView.drop(mv)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(mv)))
    assert(Snapshots.vacuum(base, keepFrom = 2) > 0) // ..until dropped
  }

  test("refusals: double create, refresh without create, RESTOREd base") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.limit(100).write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"))
    intercept[IllegalArgumentException] {
      MaterializedView.create(spark, mv, base, "o_orderkey",
        Seq("o_orderstatus"))
    }
    intercept[Exception] {
      MaterializedView.refresh(spark, tmp() + "/nomv")
    }
  }

  // ── A58: MV-aware query rewrite ────────────────────────────────────

  import graft.sources.MvRegistry

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  /** Graft tables the optimized plan still scans (the rewrite's
    * success criterion is the BASE path vanishing from this set). */
  private def scannedGraftPaths(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location match {
              case g: graft.sources.GraftFileIndex => Seq(g.tablePath)
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        }
    }.flatten.map(norm).toSet

  private def baseQuery(base: String): DataFrame =
    spark.read.format("graft").load(base).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("o_custkey").as("sum_o_custkey"),
        avg("o_custkey").as("avg_o_custkey"))

  test("A58 rewrite: exact group match answers from the MV — the base " +
      "scan disappears and survives a deleted base data file") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    MvRegistry.register(spark, mv)
    try {
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 11 === 3)
      Snapshots.mergeVersioned(spark, base,
        ordersDf.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_orderstatus", lit("M")), "o_orderkey")
      MaterializedView.refresh(spark, mv)
      val want = recompute(base).collect().toSet
      val q = baseQuery(base)
      assert(!scannedGraftPaths(q).contains(norm(base)),
        "the rewritten plan must not scan the base")
      assert(q.collect().toSet == want)
      // the hard pin: delete a LIVE base data file from disk — only a
      // genuinely scan-free plan can still answer
      val victim = Snapshots.liveFiles(base,
        Snapshots.currentVersion(base)).head
      Files.delete(Paths.get(victim))
      assert(baseQuery(base).collect().toSet == want)
    } finally MvRegistry.unregister(mv)
  }

  test("A58 staleness fallback: base moved after the refresh → the " +
      "scan stays; over-fresh (time travel) → the scan stays") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    MvRegistry.register(spark, mv)
    try {
      // STALE: a wave the MV has not consumed — must fall back to the
      // base scan AND return the fresh answer
      Snapshots.appendVersioned(spark, base,
        ordersDf.filter(col("o_orderkey") % 13 === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 70000000L))
      val q = baseQuery(base)
      assert(scannedGraftPaths(q).contains(norm(base)),
        "a stale MV must not serve")
      assertSame(q, recompute(base))
      MaterializedView.refresh(spark, mv)
      // fresh again → rewrite returns
      assert(!scannedGraftPaths(baseQuery(base)).contains(norm(base)))
      // OVER-fresh pin served FROM MV HISTORY (r11): a time-travel
      // read pinned at a base version SOME refresh consumed serves
      // from that retained MV version — time travel on the base
      // time-travels the rewrite
      val old = spark.read.format("graft").option("versionAsOf", 0)
        .load(base).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      assert(!scannedGraftPaths(old).contains(norm(base)),
        "a consumed pin must serve from MV history")
      assertSame(old, Snapshots.read(spark, base, 0)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt")))
      // …but a pin NO refresh ever consumed falls back: two waves,
      // one refresh — the consumed mark jumps over the middle version
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 17 === 5)
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 23 === 6)
      MaterializedView.refresh(spark, mv)
      val midV = Snapshots.currentVersion(base) - 1
      val mid = spark.read.format("graft").option("versionAsOf", midV)
        .load(base).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      assert(scannedGraftPaths(mid).contains(norm(base)),
        "a never-consumed pin must fall back to the scan")
      assertSame(mid, Snapshots.read(spark, base, midV)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt")))
      // unsupported aggregate (min) falls back whole-query
      val m = spark.read.format("graft").load(base)
        .groupBy("o_orderstatus").agg(min("o_custkey").as("mn"))
      assert(scannedGraftPaths(m).contains(norm(base)))
      // kill switch
      withConf("spark.graft.mvRewrite.enabled" -> "false") {
        assert(scannedGraftPaths(baseQuery(base)).contains(norm(base)))
      }
    } finally MvRegistry.unregister(mv)
  }

  test("A58 filtered rewrite: a predicate over GROUP columns commutes " +
      "onto the MV; any non-group reference falls back to the scan") {
    val base = tmp(); val mv = tmp() + "/mv"
    val df = Tables.orders(spark, sf).select("o_orderkey", "o_custkey",
      "o_orderstatus", "o_orderpriority")
    df.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_custkey"))
    MvRegistry.register(spark, mv)
    try {
      def agg(d: DataFrame) = d.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("sc"))
      // filter on a group column IN the query's grouping
      val q1 = agg(spark.read.format("graft").load(base)
        .filter(col("o_orderstatus") === "F"))
      assert(!scannedGraftPaths(q1).contains(norm(base)))
      assertSame(q1, agg(Snapshots.read(spark, base)
        .filter(col("o_orderstatus") === "F")))
      // filter on a group column NOT in the query's grouping (rollup
      // over a σ on the other MV group column)
      val q2 = agg(spark.read.format("graft").load(base)
        .filter(col("o_orderpriority").startsWith("1")))
      assert(!scannedGraftPaths(q2).contains(norm(base)))
      assertSame(q2, agg(Snapshots.read(spark, base)
        .filter(col("o_orderpriority").startsWith("1"))))
      // compound group-column predicate
      val q3 = agg(spark.read.format("graft").load(base)
        .filter(col("o_orderstatus") =!= "O" &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH")))
      assert(!scannedGraftPaths(q3).contains(norm(base)))
      assertSame(q3, agg(Snapshots.read(spark, base)
        .filter(col("o_orderstatus") =!= "O" &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))))
      // a NON-group column in the predicate: the MV pre-aggregated
      // those rows away — must fall back to the base scan
      val q4 = agg(spark.read.format("graft").load(base)
        .filter(col("o_custkey") % 2 === 0))
      assert(scannedGraftPaths(q4).contains(norm(base)),
        "a non-group predicate must never be served by the MV")
      assertSame(q4, agg(Snapshots.read(spark, base)
        .filter(col("o_custkey") % 2 === 0)))
    } finally MvRegistry.unregister(mv)
  }

  test("A58 rollup rewrite: a SUBSET of the MV's group columns " +
      "re-aggregates from the MV, never the base") {
    val base = tmp(); val mv = tmp() + "/mv"
    val df = Tables.orders(spark, sf).select("o_orderkey", "o_custkey",
      "o_orderstatus", "o_orderpriority")
    df.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_custkey"))
    MvRegistry.register(spark, mv)
    try {
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 7 === 1)
      MaterializedView.refresh(spark, mv)
      val q = baseQuery(base) // groups by o_orderstatus only — a subset
      assert(!scannedGraftPaths(q).contains(norm(base)),
        "the rollup rewrite must not scan the base")
      val want = Snapshots.read(spark, base).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum("o_custkey").as("sum_o_custkey"),
          avg("o_custkey").as("avg_o_custkey"))
      assertSame(q, want)
      // full-table rollup (no groups at all) also answers from the MV —
      // but GraftMetaAggRule may claim plain count(*) first, so pin on
      // the sum/avg shape the meta rule cannot answer
      val tot = spark.read.format("graft").load(base)
        .agg(sum("o_custkey").as("s"), avg("o_custkey").as("a"))
      assert(!scannedGraftPaths(tot).contains(norm(base)))
      assertSame(tot, Snapshots.read(spark, base)
        .agg(sum("o_custkey").as("s"), avg("o_custkey").as("a")))
      // count(col) serves from the stored non-null count (r11)
      val cc = spark.read.format("graft").load(base)
        .groupBy("o_orderstatus").agg(count(col("o_custkey")).as("nc"))
      assert(!scannedGraftPaths(cc).contains(norm(base)))
      assertSame(cc, Snapshots.read(spark, base).groupBy("o_orderstatus")
        .agg(count(col("o_custkey")).as("nc")))
    } finally MvRegistry.unregister(mv)
  }

  // ── r11: continuous maintenance as a first-class surface ──────────

  test("continuousRefresh: a C25 streaming upsert sink drives the base " +
      "while the CDF-trigger stream keeps the MV recompute-exact") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.drop("o_totalprice").write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    val refreshQs = MaterializedView.continuousRefresh(spark, mv, tmp())
    val spool = tmp()
    val upsert = spark.readStream
      .schema(Snapshots.read(spark, base).schema).parquet(spool)
      .writeStream.format("graft").option("keyCol", "o_orderkey")
      .option("checkpointLocation", tmp()).start(base)
    def recomputeNoTp = Snapshots.read(spark, base)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("o_custkey").as("sum_o_custkey"),
        avg("o_custkey").as("avg_o_custkey"))
    try {
      ordersDf.drop("o_totalprice")
        .filter(col("o_orderkey") % 6 === 0)
        .withColumn("o_orderstatus", lit("S"))
        .write.mode("append").parquet(spool)
      upsert.processAllAvailable()
      refreshQs.foreach(_.processAllAvailable())
      assertSame(MaterializedView.read(spark, mv), recomputeNoTp)
      // a batch delete between sink batches rides the same feed
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 9 === 4)
      ordersDf.drop("o_totalprice")
        .filter(col("o_orderkey") % 13 === 2)
        .withColumn("o_custkey", col("o_custkey") + 1000000L)
        .write.mode("append").parquet(spool)
      upsert.processAllAvailable()
      refreshQs.foreach(_.processAllAvailable())
      assertSame(MaterializedView.read(spark, mv), recomputeNoTp)
      assert(MaterializedView.consumedVersion(mv) ==
        Snapshots.currentVersion(base), "the MV must track the head")
    } finally { upsert.stop(); refreshQs.foreach(_.stop()) }
  }

  test("continuousRefresh on a JOIN MV: either base's feed triggers a " +
      "full two-side refresh; both watermarks track both heads") {
    val l = tmp(); val r = tmp(); val mv = tmp() + "/mv"
    ordersDf.drop("o_totalprice").write.mode("overwrite").parquet(l)
    Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(r)
    Snapshots.init(spark, l, changeDataFeed = true)
    Snapshots.init(spark, r, changeDataFeed = true)
    MaterializedView.createJoin(spark, mv, l, "o_orderkey", r,
      "o_custkey", "o_custkey", Seq("c_mktsegment"), Seq("o_orderkey"))
    def recomputeJ = Snapshots.read(spark, l)
      .join(Snapshots.read(spark, r), Seq("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        sum("o_orderkey").as("sum_o_orderkey"),
        avg("o_orderkey").as("avg_o_orderkey"))
    val refreshQs = MaterializedView.continuousRefresh(spark, mv, tmp())
    assert(refreshQs.size == 2, "a join MV streams both bases' feeds")
    try {
      Snapshots.deleteVersioned(spark, l, col("o_orderkey") % 13 === 1)
      refreshQs.foreach(_.processAllAvailable())
      assertSame(MaterializedView.read(spark, mv), recomputeJ)
      Snapshots.deleteVersioned(spark, r, col("o_custkey") % 17 === 3)
      refreshQs.foreach(_.processAllAvailable())
      assertSame(MaterializedView.read(spark, mv), recomputeJ)
      assert(Snapshots.txnVersionOf(mv, "mvL@" +
        java.nio.file.Paths.get(l).toAbsolutePath.normalize).contains(
        Snapshots.currentVersion(l).toLong))
      assert(Snapshots.txnVersionOf(mv, "mvR@" +
        java.nio.file.Paths.get(r).toAbsolutePath.normalize).contains(
        Snapshots.currentVersion(r).toLong))
    } finally refreshQs.foreach(_.stop())
  }

  // ── r11: min/max in the MV algebra ─────────────────────────────────

  private def recomputeMm(base: String): DataFrame =
    Snapshots.read(spark, base).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("o_custkey").as("sum_o_custkey"),
        min("o_totalprice").as("min_o_totalprice"),
        max("o_totalprice").as("max_o_totalprice"))

  test("A55 min/max: extremum-deleting waves recompute group-scoped; " +
      "folds, same-group value moves, and group death stay exact") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"), Seq("o_totalprice"))
    assertSame(MaterializedView.read(spark, mv)
      .select("o_orderstatus", "cnt", "sum_o_custkey",
        "min_o_totalprice", "max_o_totalprice"), recomputeMm(base))

    // wave 1 — fold-only: inserts (new extrema can only arrive, never
    // leave) and a delete that provably misses every extremum is not
    // constructible cheaply, so this wave is insert-only
    Snapshots.appendVersioned(spark, base,
      ordersDf.filter(col("o_orderkey") % 13 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 80000000L)
        .withColumn("o_totalprice", col("o_totalprice") * 2.0))
    MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv)
      .select("o_orderstatus", "cnt", "sum_o_custkey",
        "min_o_totalprice", "max_o_totalprice"), recomputeMm(base))

    // wave 2 — delete the TOP of the distribution: every group whose
    // max lives above the threshold takes the recompute path
    val thr = Snapshots.read(spark, base)
      .agg(max("o_totalprice")).head().getDouble(0) * 0.7
    Snapshots.deleteVersioned(spark, base, col("o_totalprice") > thr)
    MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv)
      .select("o_orderstatus", "cnt", "sum_o_custkey",
        "min_o_totalprice", "max_o_totalprice"), recomputeMm(base))

    // wave 3 — an update that moves ONLY the min/max column (net
    // d_cnt = 0: the group survives on the extrema columns alone), and
    // hits the minimum side too
    Snapshots.mergeVersioned(spark, base,
      Snapshots.read(spark, base).filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 0.5),
      "o_orderkey")
    MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv)
      .select("o_orderstatus", "cnt", "sum_o_custkey",
        "min_o_totalprice", "max_o_totalprice"), recomputeMm(base))

    // wave 4 — group death: no tombstone, no recompute attempt
    val victimGroup = Snapshots.read(spark, base)
      .select("o_orderstatus").distinct().orderBy("o_orderstatus")
      .head().getString(0)
    Snapshots.deleteVersioned(spark, base,
      col("o_orderstatus") === victimGroup)
    MaterializedView.refresh(spark, mv)
    assertSame(MaterializedView.read(spark, mv)
      .select("o_orderstatus", "cnt", "sum_o_custkey",
        "min_o_totalprice", "max_o_totalprice"), recomputeMm(base))
    assert(MaterializedView.read(spark, mv)
      .filter(col("o_orderstatus") === victimGroup).isEmpty)
  }

  test("A55 min/max NULL algebra: all-NULL groups store NULL extrema, " +
      "NULL→value and value→NULL transitions stay exact") {
    import spark.implicits._
    val base = tmp(); val mv = tmp() + "/mv"
    Seq((1L, "a", Some(5.0)), (2L, "a", Some(9.0)),
      (3L, "n", None: Option[Double]), (4L, "n", None: Option[Double]))
      .toDF("k", "g", "v").write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "k", Seq("g"),
      Seq.empty, Seq("v"))
    def want = Snapshots.read(spark, base).groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        min("v").as("min_v"), max("v").as("max_v"))
    def got = MaterializedView.read(spark, mv)
    assertSame(got, want)
    assert(got.filter(col("g") === "n" && col("min_v").isNull)
      .count() == 1, "all-NULL group must store NULL extrema")
    // delete a's max → group-scoped recompute lands on 5.0
    Snapshots.deleteVersioned(spark, base, col("k") === 2L)
    MaterializedView.refresh(spark, mv)
    assertSame(got, want)
    assert(got.filter(col("g") === "a").head().getDouble(2) == 5.0)
    // NULL → value on a row of the all-NULL group (net d_cnt = 0)
    Snapshots.mergeVersioned(spark, base,
      Seq((3L, "n", Some(7.0))).toDF("k", "g", "v"), "k")
    MaterializedView.refresh(spark, mv)
    assertSame(got, want)
    // value → gone again: deleting the only non-NULL value recomputes
    // the group back to NULL extrema (cnt stays > 0)
    Snapshots.deleteVersioned(spark, base, col("k") === 3L)
    MaterializedView.refresh(spark, mv)
    assertSame(got, want)
    assert(got.filter(col("g") === "n" && col("min_v").isNull)
      .count() == 1)
    // group death
    Snapshots.deleteVersioned(spark, base, col("g") === "n")
    MaterializedView.refresh(spark, mv)
    assertSame(got, want)
  }

  test("A58 min/max rewrite: exact and rollup min/max serve from the " +
      "stored extrema — scan-free past a deleted base file") {
    val base = tmp(); val mv = tmp() + "/mv"
    val df = Tables.orders(spark, sf).select("o_orderkey", "o_custkey",
      "o_orderstatus", "o_orderpriority", "o_totalprice")
    df.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_custkey"),
      Seq("o_totalprice"))
    MvRegistry.register(spark, mv)
    try {
      // a wave that deletes extrema, so the served values went through
      // the recompute path at least once
      val thr = Snapshots.read(spark, base)
        .agg(max("o_totalprice")).head().getDouble(0) * 0.8
      Snapshots.deleteVersioned(spark, base, col("o_totalprice") > thr)
      MaterializedView.refresh(spark, mv)
      def exact(d: DataFrame) = d.groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), min("o_totalprice").as("mn"),
          max("o_totalprice").as("mx"), sum("o_custkey").as("sc"))
      def rollup(d: DataFrame) = d.groupBy("o_orderstatus")
        .agg(max("o_totalprice").as("mx"), min("o_totalprice").as("mn"))
      val wantE = exact(Snapshots.read(spark, base)).collect().toSet
      val wantR = rollup(Snapshots.read(spark, base)).collect().toSet
      val qe = exact(spark.read.format("graft").load(base))
      val qr = rollup(spark.read.format("graft").load(base))
      assert(!scannedGraftPaths(qe).contains(norm(base)))
      assert(!scannedGraftPaths(qr).contains(norm(base)))
      // the hard pin: only a scan-free plan survives this
      val victim = Snapshots.liveFiles(base,
        Snapshots.currentVersion(base)).head
      Files.delete(Paths.get(victim))
      assert(exact(spark.read.format("graft").load(base))
        .collect().toSet == wantE)
      assert(rollup(spark.read.format("graft").load(base))
        .collect().toSet == wantR)
    } finally MvRegistry.unregister(mv)
  }

  test("A57×A63 join-MV min/max: extremum-killing deletes on either " +
      "side recompute group-scoped from the target-version join; the " +
      "rewrite serves min/max from the stored extrema") {
    val l = tmp(); val r = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(l)
    Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(r)
    Snapshots.init(spark, l, changeDataFeed = true)
    Snapshots.init(spark, r, changeDataFeed = true)
    MaterializedView.createJoin(spark, mv, l, "o_orderkey", r,
      "o_custkey", "o_custkey", Seq("c_mktsegment"), Seq("o_orderkey"),
      Seq("o_totalprice"))
    def recomputeJ = Snapshots.read(spark, l)
      .join(Snapshots.read(spark, r), Seq("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        sum("o_orderkey").as("sum_o_orderkey"),
        min("o_totalprice").as("min_o_totalprice"),
        max("o_totalprice").as("max_o_totalprice"))
    def got = MaterializedView.read(spark, mv)
      .select("c_mktsegment", "cnt", "sum_o_orderkey",
        "min_o_totalprice", "max_o_totalprice")
    assertSame(got, recomputeJ)
    // LEFT-side extremum kill: every group's max above the cut dies
    val thr = Snapshots.read(spark, l)
      .agg(max("o_totalprice")).head().getDouble(0) * 0.7
    Snapshots.deleteVersioned(spark, l, col("o_totalprice") > thr)
    MaterializedView.refreshJoin(spark, mv)
    assertSame(got, recomputeJ)
    // RIGHT-side delete that kills fanouts (removes whole join groups'
    // contributions, extrema included) + a left value-move in one window
    Snapshots.deleteVersioned(spark, r, col("o_custkey") % 11 === 2)
    Snapshots.mergeVersioned(spark, l,
      Snapshots.read(spark, l).filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 0.25),
      "o_orderkey")
    MaterializedView.refreshJoin(spark, mv)
    assertSame(got, recomputeJ)
    // the A58 rewrite serves join-MV min/max scan-free
    MvRegistry.register(spark, mv)
    try {
      val q = spark.read.format("graft").load(l)
        .join(spark.read.format("graft").load(r), Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"),
          count(lit(1)).as("cnt"))
      assert(!scannedGraftPaths(q).contains(norm(l)) &&
        !scannedGraftPaths(q).contains(norm(r)),
        "join-MV min/max rewrite must drop both base scans")
      val want = Snapshots.read(spark, l)
        .join(Snapshots.read(spark, r), Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"),
          count(lit(1)).as("cnt"))
      assertSame(q, want)
    } finally MvRegistry.unregister(mv)
  }

  test("A57→A58 join rewrite: the dashboard join+groupBy serves from " +
      "the join MV in either join order — scan-free past deleted " +
      "files on BOTH bases; one stale side falls back") {
    val l = tmp(); val r = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(l)
    Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(r)
    Snapshots.init(spark, l, changeDataFeed = true)
    Snapshots.init(spark, r, changeDataFeed = true)
    MaterializedView.createJoin(spark, mv, l, "o_orderkey", r,
      "o_custkey", "o_custkey", Seq("c_mktsegment", "o_orderstatus"),
      Seq("o_orderkey"))
    MvRegistry.register(spark, mv)
    try {
      // waves on both sides, then an exact refresh
      Snapshots.mergeVersioned(spark, l,
        ordersDf.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1L), "o_orderkey")
      Snapshots.deleteVersioned(spark, r, col("o_custkey") % 17 === 3)
      MaterializedView.refreshJoin(spark, mv)
      def gl = spark.read.format("graft").load(l)
      def gr = spark.read.format("graft").load(r)
      def exact(d: DataFrame) = d
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_orderkey").as("s"),
          avg("o_orderkey").as("a"))
      def rollup(d: DataFrame) = d.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), sum("o_orderkey").as("s"))
      val joined = Snapshots.read(spark, l)
        .join(Snapshots.read(spark, r), Seq("o_custkey"))
      val wantE = exact(joined).collect().toSet
      val wantR = rollup(joined).collect().toSet
      val wantF = exact(joined.filter(col("c_mktsegment") === "BUILDING"))
        .collect().toSet

      val qe = exact(gl.join(gr, Seq("o_custkey")))
      val qRev = exact(gr.join(gl, Seq("o_custkey")))
      val qr = rollup(gl.join(gr, Seq("o_custkey")))
      val qf = exact(gl.join(gr, Seq("o_custkey"))
        .filter(col("c_mktsegment") === "BUILDING"))
      for (q <- Seq(qe, qRev, qr, qf)) {
        val scanned = scannedGraftPaths(q)
        assert(!scanned.contains(norm(l)) && !scanned.contains(norm(r)),
          s"join rewrite must drop BOTH base scans, scanned $scanned")
      }
      assert(wantE.nonEmpty && wantR.nonEmpty && wantF.nonEmpty)
      assert(qe.collect().toSet == wantE)
      assert(qRev.collect().toSet == wantE)
      assert(qr.collect().toSet == wantR)
      assert(qf.collect().toSet == wantF)
      // time travel: BOTH bases pinned at their create-time versions
      // serve from MV v0 — the atomic mark pair indexes MV history
      val qtt = exact(spark.read.format("graft")
        .option("versionAsOf", 0).load(l)
        .join(spark.read.format("graft").option("versionAsOf", 0).load(r),
          Seq("o_custkey")))
      assert(!scannedGraftPaths(qtt).contains(norm(l)) &&
        !scannedGraftPaths(qtt).contains(norm(r)),
        "a consumed (vL, vR) pin must serve from join-MV history")
      assertSame(qtt, exact(Snapshots.read(spark, l, 0)
        .join(Snapshots.read(spark, r, 0), Seq("o_custkey"))))
      // a MIXED pin no refresh ever consumed falls back
      val qmix = exact(spark.read.format("graft")
        .option("versionAsOf", 0).load(l).join(gr, Seq("o_custkey")))
      assert(scannedGraftPaths(qmix).contains(norm(l)))
      // a non-group predicate (the join key) falls back to the scan
      val qBad = exact(gl.join(gr, Seq("o_custkey"))
        .filter(col("o_custkey") % 2 === 0))
      assert(scannedGraftPaths(qBad).contains(norm(l)))
      // ONE stale side falls back whole-query …
      Snapshots.deleteVersioned(spark, l, col("o_orderkey") % 19 === 2)
      val qStale = exact(gl.join(gr, Seq("o_custkey")))
      assert(scannedGraftPaths(qStale).contains(norm(l)),
        "a one-side-stale join MV must not serve")
      assertSame(qStale, exact(Snapshots.read(spark, l)
        .join(Snapshots.read(spark, r), Seq("o_custkey"))))
      // … and an exact refresh restores the rewrite
      MaterializedView.refreshJoin(spark, mv)
      val wantE2 = exact(Snapshots.read(spark, l)
        .join(Snapshots.read(spark, r), Seq("o_custkey")))
        .collect().toSet
      // the hard pin, doubled: delete a live data file from EACH base
      Files.delete(Paths.get(Snapshots.liveFiles(l,
        Snapshots.currentVersion(l)).head))
      Files.delete(Paths.get(Snapshots.liveFiles(r,
        Snapshots.currentVersion(r)).head))
      val qPinned = exact(gl.join(gr, Seq("o_custkey")))
      assert(qPinned.collect().toSet == wantE2)
    } finally MvRegistry.unregister(mv)
  }

  test("r12 filtered MV: refresh equals a filtered recompute across " +
      "predicate-boundary-crossing waves") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"),
      filter = Some("o_totalprice > 150000"))
    // rows cross the predicate in BOTH directions: some gain price
    // (enter), some lose it (leave), some update inside, some delete
    Snapshots.mergeVersioned(spark, base,
      ordersDf.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 200000.0),
      "o_orderkey")
    Snapshots.mergeVersioned(spark, base,
      ordersDf.filter(col("o_orderkey") % 7 === 1)
        .withColumn("o_totalprice", lit(1.0)), "o_orderkey")
    Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 9 === 2)
    MaterializedView.refresh(spark, mv)
    val want = Snapshots.read(spark, base)
      .filter(col("o_totalprice") > 150000)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("sum_o_custkey"),
        avg("o_custkey").as("avg_o_custkey"))
    assertSame(MaterializedView.read(spark, mv)
      .select("o_orderstatus", "cnt", "sum_o_custkey", "avg_o_custkey"),
      want)
  }

  test("r12 subsumption rewrite: non-subsumed queries keep the base scan") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"),
      filter = Some("o_totalprice > 150000"))
    MvRegistry.register(spark, mv)
    try {
      def agg(df: DataFrame) = df.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("s"))
      val g = spark.read.format("graft").load(base)
      // subsumed: equal predicate → MV serves
      assert(!scannedGraftPaths(agg(g.filter(col("o_totalprice") > 150000)))
        .contains(norm(base)), "equal predicate must rewrite")
      // subsumed + residual group-col conjunct → MV serves
      assert(!scannedGraftPaths(agg(g.filter(col("o_totalprice") > 150000 &&
        col("o_orderstatus") === "F"))).contains(norm(base)),
        "subsuming predicate with group-col residual must rewrite")
      // NOT subsumed: unfiltered query — the MV is missing rows
      assert(scannedGraftPaths(agg(g)).contains(norm(base)),
        "unfiltered query over a filtered MV must scan the base")
      // NOT subsumed: different literal
      assert(scannedGraftPaths(agg(g.filter(col("o_totalprice") > 100000)))
        .contains(norm(base)),
        "a weaker predicate must scan the base")
      // NOT subsumed: residual on a NON-group column
      assert(scannedGraftPaths(agg(g.filter(col("o_totalprice") > 150000 &&
        col("o_custkey") > 10))).contains(norm(base)),
        "a non-group residual must scan the base")
      // the subsumed answers match a recompute
      val want = Snapshots.read(spark, base)
        .filter(col("o_totalprice") > 150000)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("s"))
      assertSame(agg(g.filter(col("o_totalprice") > 150000)), want)
    } finally MvRegistry.unregister(mv)
  }

  test("r12 range-implication rewrite: a STRICTER range on a group " +
      "column serves from the filtered MV, residual re-applied") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus", "o_custkey"), Seq("o_totalprice"),
      filter = Some("o_custkey >= 100"))
    MvRegistry.register(spark, mv)
    try {
      def agg(df: DataFrame) = df.groupBy("o_orderstatus", "o_custkey")
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("s"))
      val g = spark.read.format("graft").load(base)
      // x >= 500 implies x >= 100: MV serves, residual re-applied
      assert(!scannedGraftPaths(agg(g.filter(col("o_custkey") >= 500)))
        .contains(norm(base)), "stricter >= must rewrite")
      // x > 100 implies x >= 100 too
      assert(!scannedGraftPaths(agg(g.filter(col("o_custkey") > 100)))
        .contains(norm(base)), "strict > at the same cut must rewrite")
      // x = 700 implies x >= 100 (point query served from the MV)
      assert(!scannedGraftPaths(agg(g.filter(col("o_custkey") === 700)))
        .contains(norm(base)), "an equality above the cut must rewrite")
      // x >= 50 does NOT imply x >= 100: rows are missing from the MV
      assert(scannedGraftPaths(agg(g.filter(col("o_custkey") >= 50)))
        .contains(norm(base)), "a looser range must scan the base")
      // ROLLUP under the implied range: group-subset + residual
      val roll = g.filter(col("o_custkey") >= 500).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("s"))
      assert(!scannedGraftPaths(roll).contains(norm(base)),
        "rollup under an implied range must rewrite")
      // answers match a recompute, both shapes
      def want(cut: Long) = Snapshots.read(spark, base)
        .filter(col("o_custkey") >= cut)
        .groupBy("o_orderstatus", "o_custkey")
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("s"))
      assertSame(agg(g.filter(col("o_custkey") >= 500)), want(500))
      assertSame(roll, Snapshots.read(spark, base)
        .filter(col("o_custkey") >= 500).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("s")))
    } finally MvRegistry.unregister(mv)
  }

  test("r13 approx-distinct sketches: the hll dashboard serves from the " +
      "MV bit-exactly through waves; rollup unions; mismatched lgK and " +
      "approx_count_distinct keep the base scan") {
    val base = tmp(); val mv = tmp() + "/mv"
    val df = ordersDf.withColumn("o_bucket", col("o_custkey") % 50)
    df.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), distinctCols = Seq("o_bucket"))
    MvRegistry.register(spark, mv)
    try {
      def dash(): DataFrame = spark.read.format("graft").load(base)
        .groupBy("o_orderstatus")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_bucket))").as("nd"))
      def global(): DataFrame = spark.read.format("graft").load(base)
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_bucket))").as("nd"))
      // ground truth via the library read (plain parquet plan — the
      // rewrite only matches graft relations)
      def truth(): Set[(String, Long)] = Snapshots.read(spark, base)
        .groupBy("o_orderstatus")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_bucket))").as("nd"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(!scannedGraftPaths(dash()).contains(norm(base)),
        "the sketch dashboard must rewrite to the MV")
      assert(!scannedGraftPaths(global()).contains(norm(base)),
        "the global rollup must rewrite to the MV (sketch union)")
      assert(dash().collect().map(r =>
        (r.getString(0), r.getLong(1))).toSet == truth())
      // waves: updates move bucket values across groups, deletes
      // force the group-scoped sketch recompute (no subtraction)
      Snapshots.mergeVersioned(spark, base,
        ordersDf.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderstatus", lit("Z"))
          .withColumn("o_bucket", col("o_custkey") % 3), "o_orderkey")
      Snapshots.deleteVersioned(spark, base, col("o_orderkey") % 11 === 5)
      MaterializedView.refresh(spark, mv)
      val want = truth()
      assert(dash().collect().map(r =>
        (r.getString(0), r.getLong(1))).toSet == want)
      val gWant = global().collect().map(_.getLong(0)).toSet
      // refusals keep the scan: a different lgConfigK would estimate
      // from different register state, and approx_count_distinct is a
      // different algorithm entirely
      val badK = spark.read.format("graft").load(base)
        .groupBy("o_orderstatus")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_bucket, 13))").as("nd"))
      assert(scannedGraftPaths(badK).contains(norm(base)))
      val acd = spark.read.format("graft").load(base)
        .groupBy("o_orderstatus")
        .agg(approx_count_distinct("o_bucket").as("nd"))
      assert(scannedGraftPaths(acd).contains(norm(base)))
      // the hard pin: delete a live base file — the rewritten
      // dashboards still answer, bit-identically
      val victim = Snapshots.liveFiles(base,
        Snapshots.currentVersion(base)).head
      Files.delete(Paths.get(victim))
      assert(dash().collect().map(r =>
        (r.getString(0), r.getLong(1))).toSet == want)
      assert(global().collect().map(_.getLong(0)).toSet == gWant)
    } finally MvRegistry.unregister(mv)
  }

  test("r13 by-name registration: spark.table dashboards rewrite " +
      "scan-free; a table that is not the MV's base refuses") {
    val base = tmp(); val mv = tmp() + "/mv"
    ordersDf.write.mode("overwrite").parquet(base)
    Snapshots.init(spark, base, changeDataFeed = true)
    MaterializedView.create(spark, mv, base, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"), Seq("o_totalprice"))
    spark.sql("DROP TABLE IF EXISTS mv_byname")
    spark.sql(s"CREATE TABLE mv_byname USING graft " +
      s"OPTIONS (path '$base', keyCol 'o_orderkey')")
    try {
      MvRegistry.registerByName(spark, "mv_byname", mv)
      // the named dashboard: count/sum + the A63 min/max shapes
      def dash(): DataFrame = spark.table("mv_byname")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("s"),
          min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      val want = Snapshots.read(spark, base).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("s"),
          min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
        .collect().toSet
      assert(!scannedGraftPaths(dash()).contains(norm(base)),
        "the by-name dashboard must rewrite to the MV")
      assert(dash().collect().toSet == want)
      // scan-free pin through the NAME
      val victim = Snapshots.liveFiles(base,
        Snapshots.currentVersion(base)).head
      Files.delete(Paths.get(victim))
      assert(dash().collect().toSet == want)
      // a table pointing elsewhere is not this MV's base
      val other = tmp()
      ordersDf.limit(5).write.mode("overwrite").parquet(other)
      Snapshots.init(spark, other)
      spark.sql("DROP TABLE IF EXISTS mv_byname_other")
      spark.sql(s"CREATE TABLE mv_byname_other USING graft " +
        s"OPTIONS (path '$other', keyCol 'o_orderkey')")
      try {
        val e = intercept[IllegalArgumentException] {
          MvRegistry.registerByName(spark, "mv_byname_other", mv)
        }
        assert(e.getMessage.contains("not a base"))
      } finally spark.sql("DROP TABLE IF EXISTS mv_byname_other")
    } finally {
      MvRegistry.unregister(mv)
      spark.sql("DROP TABLE IF EXISTS mv_byname")
    }
  }
}
