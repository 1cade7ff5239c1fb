package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{HiddenPartitions, ModTransform, PartitionedSnapshots,
  Snapshots}

/** A50 × A26 × A49 (r14, the r13 verdict's top item) — the COMPOSED
  * bucket layout: hash-bucketed snapshot tables UNDER a hive-partitioned
  * or hidden-transform root, declared to the scan as one table-wide
  * `BucketSpec`. The 100 TB design point is date-partitioned +
  * join-key-bucketed facts, so the pins here are the load-bearing
  * claims: exchange-free co-bucketed joins THROUGH the multi-dir
  * connector, bucket pruning composing with partition pruning, the
  * layout surviving per-dir DML including a brand-new partition's
  * bootstrap, and the whole-table degrade when any one dir stages an
  * untagged file.
  */
class BucketedComposedSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_bktcomp").toString

  private def ordersDf = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  private def customerDf = Tables.customer(spark, sf)
    .select("c_custkey", "c_name", "c_acctbal")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def partRead(path: String) = spark.read.format("graft")
    .option("partitionCol", "o_orderstatus").load(path)

  test("partitioned + bucketed: co-bucketed join and groupBy through " +
      "the connector run exchange-free; partition pruning composes") {
    val (po, pc) = (tmp() + "/t", tmp())
    PartitionedSnapshots.init(spark, po, ordersDf, "o_orderstatus",
      bucketBy = Some(("o_custkey", 8)))
    Snapshots.writeBucketedVersioned(spark, pc, customerDf, "c_custkey", 8)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = partRead(po).join(spark.read.format("graft").load(pc),
        col("o_custkey") === col("c_custkey"))
      assert(!plan(j).contains("Exchange"), plan(j).take(1200))
      assert(j.count() == ordersDf.join(customerDf,
        col("o_custkey") === col("c_custkey")).count())

      val g = partRead(po).groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"), plan(g).take(1200))

      // partition pruning composes: the status filter arrives as a
      // PARTITION filter (whole dirs pruned before bucket grouping)
      val q = partRead(po).filter(col("o_orderstatus") === "F")
        .groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(q).contains("Exchange"), plan(q).take(1200))
      assert(plan(q).contains("PartitionFilters") &&
        plan(q).contains("o_orderstatus"), plan(q).take(1200))
      assert(partRead(po).filter(col("o_orderstatus") === "F").count() ==
        ordersDf.filter(col("o_orderstatus") === "F").count())
    }
  }

  test("partitioned + bucketed: bucket point-lookup prunes to one " +
      "bucket across every partition dir") {
    val po = tmp() + "/t"
    PartitionedSnapshots.init(spark, po, ordersDf, "o_orderstatus",
      bucketBy = Some(("o_custkey", 8)))
    val k = ordersDf.select("o_custkey").head().getLong(0)
    withConf(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val q = partRead(po).filter(col("o_custkey") === lit(k))
      assert(plan(q).contains("SelectedBucketsCount: 1 out of 8"),
        plan(q).take(1200))
      assert(q.count() ==
        ordersDf.filter(col("o_custkey") === lit(k)).count())
    }
  }

  test("partitioned + bucketed: merge wave, per-dir delete and a NEW " +
      "partition's bootstrap all preserve the layout, values exact") {
    val po = tmp() + "/t"
    PartitionedSnapshots.init(spark, po, ordersDf, "o_orderstatus",
      bucketBy = Some(("o_custkey", 8)))
    // in-place merge wave (same partition values)
    val wave = ordersDf.filter(col("o_orderkey") % 20 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    PartitionedSnapshots.mergePartitioned(spark, po, wave,
      "o_orderkey", "o_orderstatus")
    // keyed delete INSIDE one partition dir
    Snapshots.deleteVersioned(spark,
      PartitionedSnapshots.partitionDir(po, "F"),
      col("o_orderkey") % 37 === 1)
    // a brand-new partition value must bootstrap BUCKETED
    val fresh = ordersDf.filter(col("o_orderkey") % 41 === 2)
      .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
      .withColumn("o_orderstatus", lit("X"))
    PartitionedSnapshots.mergePartitioned(spark, po, fresh,
      "o_orderkey", "o_orderstatus")
    val xDir = PartitionedSnapshots.partitionDir(po, "X")
    assert(Snapshots.bucketSpecOf(xDir, Snapshots.currentVersion(xDir))
      .contains(("o_custkey", 8)),
      "the new partition's log must record the composed bucket spec")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = partRead(po).groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"),
        "layout must survive merge + per-dir delete + new-partition " +
          "bootstrap\n" + plan(g).take(1200))
    }
    // value-level correctness of the full wave sequence
    val expected = ordersDf
      .join(wave.select(col("o_orderkey").as("__k"),
        col("o_totalprice").as("__p")),
        col("o_orderkey") === col("__k"), "left_outer")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        coalesce(col("__p"), col("o_totalprice")).as("o_totalprice"))
      .filter(!(col("o_orderstatus") === "F" && col("o_orderkey") % 37 === 1))
      .unionByName(fresh)
    val got = partRead(po)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("hidden + bucketed: exchange-free join through the connector; " +
      "merge preserves the layout; transform pruning composes") {
    val (ph, pc) = (tmp() + "/t", tmp())
    HiddenPartitions.init(spark, ph, ordersDf,
      ModTransform("o_orderkey", 4), bucketBy = Some(("o_custkey", 8)))
    Snapshots.writeBucketedVersioned(spark, pc, customerDf, "c_custkey", 8)
    HiddenPartitions.merge(spark, ph,
      ordersDf.filter(col("o_orderkey") % 30 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0),
      "o_orderkey")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.read.format("graft").load(ph)
        .join(spark.read.format("graft").load(pc),
          col("o_custkey") === col("c_custkey"))
      assert(!plan(j).contains("Exchange"), plan(j).take(1200))
      assert(j.count() == ordersDf.join(customerDf,
        col("o_custkey") === col("c_custkey")).count())
    }
    // hidden-dir pruning still composes: a transform-column point
    // predicate opens only its own directory's files
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum
    }
    val all = scanned(spark.read.format("graft").load(ph))
    val one = scanned(spark.read.format("graft").load(ph)
      .filter(col("o_orderkey") === 8L))
    assert(one < all,
      s"transform pruning must survive the bucketed index ($one/$all)")
  }

  test("one dir staging an untagged file degrades the WHOLE table to " +
      "a plain scan, correctly") {
    val po = tmp() + "/t"
    PartitionedSnapshots.init(spark, po, ordersDf, "o_orderstatus",
      bucketBy = Some(("o_custkey", 4)))
    // land one untagged parquet in ONE partition dir and commit it live
    val fDir = PartitionedSnapshots.partitionDir(po, "F")
    val extraDir = Files.createTempDirectory("graft_bktcomp_extra").toString
    val extra = ordersDf.filter(col("o_orderkey") % 53 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 80000000L)
      .withColumn("o_orderstatus", lit("F")).drop("o_orderstatus")
    val extraN = extra.count()
    extra.coalesce(1).write.mode("overwrite").parquet(extraDir)
    import scala.jdk.CollectionConverters._
    val moved = Files.list(java.nio.file.Paths.get(extraDir)).iterator()
      .asScala.filter(_.toString.endsWith(".parquet")).toSeq.headOption
      .map { p =>
        val dst = java.nio.file.Paths.get(fDir, "v1_untagged.parquet")
        Files.move(p, dst)
        dst.toString
      }
    val live = Snapshots.liveFiles(fDir, Snapshots.currentVersion(fDir))
    Snapshots.commit(fDir, live ++ moved.toSeq,
      Some(Snapshots.read(spark, fDir).schema))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = partRead(po).groupBy("o_custkey").agg(count("*").as("n"))
      assert(plan(g).contains("Exchange"),
        "an untagged file in any dir must degrade the whole-table claim")
    }
    assert(partRead(po).count() == ordersDf.count() + extraN)
  }

  test("MoR + reconcile on a bucketed dir re-tags the folded files: " +
      "the exchange-free layout survives the steady-state loop") {
    val po = tmp()
    Snapshots.writeBucketedVersioned(spark, po,
      ordersDf.select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", 4)
    // MoR wave: DV-mark + append (appended files bucket-tagged)
    Snapshots.mergeVersionedDV(spark, po,
      ordersDf.select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(col("o_orderkey") % 20 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 7.0),
      "o_orderkey")
    assert(Snapshots.dvFiles(po, 1).nonEmpty)
    val v2 = Snapshots.reconcileDV(spark, po)
    assert(Snapshots.dvFiles(po, v2).isEmpty)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = spark.read.format("graft").load(po)
        .groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"),
        "the folded files must carry bucket tags\n" + plan(g).take(1200))
    }
    assert(spark.read.format("graft").load(po).count() == ordersDf.count())
  }

  test("the steady-state 100 TB loop: MoR streaming ingest + " +
      "auto-reconcile into a partitioned+bucketed root keeps the " +
      "exchange-free layout, data exact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp() + "/t"
    // pre-created composed layout: partitioned by p, bucketed on k
    PartitionedSnapshots.init(spark,
      root, (1L to 400L).map(k => (k, s"p${k % 2}", k * 1.0))
        .toDF("k", "part", "x"), "part", bucketBy = Some(("k", 4)))
    val mem = MemoryStream[(Long, String, Double)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_bktcomp_ckpt").toString
    val q = mem.toDF().toDF("k", "part", "x")
      .writeStream.format("graft")
      .option("keyCol", "k")
      .option("morWrites", "true")
      .option("autoReconcileMaxDvFiles", "2")
      .option("checkpointLocation", ckpt)
      .partitionBy("part")
      .start(root)
    try {
      // 6 update waves: every batch DV-marks in both partitions, the
      // auto-reconcile fold re-tags (the r14 reconcileDV fix) — so the
      // layout must survive continuous ingest + folds
      (1 to 6).foreach { i =>
        mem.addData((1L, "p1", i * 10.0), (2L, "p0", i * 20.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    Seq("p0", "p1").foreach { v =>
      val d = PartitionedSnapshots.partitionDir(root, v)
      assert(Snapshots.dvFiles(d, Snapshots.currentVersion(d)).size <= 2,
        s"$v DV sidecars must stay bounded")
    }
    // fold any remaining DVs so the fast path (and its BucketSpec
    // claim) serves the read, then pin the exchange-free property
    Seq("p0", "p1").foreach(v =>
      PartitionedSnapshots.reconcilePartition(spark, root, v))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = spark.read.format("graft")
        .option("partitionCol", "part").load(root)
        .groupBy("k").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"),
        "the composed layout must survive the whole ingest loop\n" +
          plan(g).take(1200))
    }
    val rows = spark.read.format("graft")
      .option("partitionCol", "part").load(root)
      .filter(col("k").isin(1L, 2L)).select("k", "x").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows == Map(1L -> 60.0, 2L -> 120.0))
    assert(spark.read.format("graft")
      .option("partitionCol", "part").load(root).count() == 400)
  }

  test("refusals: bucket column = partition column; mismatched per-dir " +
      "spec degrades rather than lies") {
    val po = tmp() + "/t"
    val e = intercept[IllegalArgumentException] {
      PartitionedSnapshots.init(spark, po, ordersDf, "o_orderstatus",
        bucketBy = Some(("o_orderstatus", 4)))
    }
    assert(e.getMessage.contains("partition column"))
  }
}
