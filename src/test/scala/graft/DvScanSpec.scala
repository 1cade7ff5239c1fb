package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** r13 — the vectorized DV/mapping read path (GraftDvScanRule):
  * extensions sessions serve merge-on-read state through the stock
  * parquet ColumnarBatch scan with a row-index anti join, instead of
  * the row-based compat relation. Plan shape AND content pinned.
  */
class DvScanSpec extends GraftSuite {

  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_dvscan").toString + "/t"
    (1L to 400L).map(k => (k, s"v$k", k * 2))
      .toDF("k", "payload", "x")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    dir
  }

  /** Every node of the FINAL physical plan, descending through AQE
    * wrappers and query-stage leaves (collect() alone stops at them). */
  private def allNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect() // finalize any adaptive plan before inspecting it
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan)
  }

  private def scans(df: org.apache.spark.sql.DataFrame)
      : (Seq[FileSourceScanExec], Seq[org.apache.spark.sql.execution.SparkPlan]) = {
    val nodes = allNodes(df)
    (nodes.collect { case f: FileSourceScanExec => f },
      nodes.filter(_.getClass.getSimpleName.contains("RowDataSourceScan")))
  }

  test("DV-carrying version reads vectorized under the extensions " +
      "session: ColumnarBatch scan, pushed filters, no row-based scan") {
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Snapshots.deleteVersionedDV(spark, dir, col("k") % 9 === 0) // v1: DVs
    assert(Snapshots.dvFiles(dir, 1).nonEmpty)
    val se = graft.plans.GraftSessions.withExtensions(spark)
    val df = se.read.format("graft").load(dir).filter(col("k") > 100L)
    val (file, row) = scans(df)
    assert(file.nonEmpty, "expected the vectorized parquet scan")
    assert(row.isEmpty, "the row-based compat scan must not appear")
    // the scan is columnar and the predicate reached it
    assert(file.exists(_.supportsColumnar),
      "expected a ColumnarBatch-capable scan")
    assert(file.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("GreaterThan"))),
      s"filter not pushed: ${file.map(_.metadata.get("PushedFilters"))}")
    // content identical to the library read
    val expect = Snapshots.read(spark, dir).filter(col("k") > 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(expect.nonEmpty && expect.forall { case (k, _, _) => k % 9 != 0 })
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
    // the PLAIN session still answers identically through the compat
    // relation (the rule is acceleration, not a correctness dependency)
    val plainDf = spark.read.format("graft").load(dir)
      .filter(col("k") > 100L)
    val (pf, pr) = scans(plainDf)
    assert(pf.isEmpty && pr.nonEmpty,
      "the plain session should keep the row-based compat scan")
    assert(plainDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == expect)
  }

  test("column mapping + DVs compose on the vectorized path; " +
      "reconcile hands back the plain fast path") {
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Snapshots.renameColumn(spark, dir, "x", "double_k") // v1: mapping
    Snapshots.mergeVersionedDV(spark, dir,
      Seq((7L, "UP7", 70L), (900L, "NEW", 1800L))
        .toDF("k", "payload", "double_k"), "k") // v2: DVs
    val se = graft.plans.GraftSessions.withExtensions(spark)
    val df = se.read.format("graft").load(dir)
    val (file, row) = scans(df)
    assert(file.nonEmpty && row.isEmpty)
    val byK = df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byK.size == 401)
    assert(byK(7L) == ("UP7", 70L))
    assert(byK(900L) == ("NEW", 1800L))
    assert(byK(8L) == ("v8", 16L)) // untouched row through the rename
    // aggregation over the renamed column — the projection resolves
    assert(df.agg(sum("double_k")).head().getLong(0) ==
      (1L to 400L).filterNot(_ == 7).map(_ * 2).sum + 70L + 1800L)
    // reconcile: DVs fold, but the mapping remains → still the
    // substituted vectorized path, now with no anti join
    Snapshots.reconcileDV(spark, dir)
    val df2 = se.read.format("graft").load(dir)
    val (f2, r2) = scans(df2)
    assert(f2.nonEmpty && r2.isEmpty)
    assert(df2.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "no DV anti join expected after reconcile")
    assert(df2.count() == 401)
  }

  test("CBO flip: a catalog-named DV-carrying table exposes a " +
      "DV-adjusted rowCount to the estimator") {
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Snapshots.deleteVersionedDV(spark, dir, col("k") <= 100L) // v1: 300 live
    val se = graft.plans.GraftSessions.withExtensions(spark)
    se.sql("DROP TABLE IF EXISTS dv_cbo")
    se.sql(s"CREATE TABLE dv_cbo USING graft OPTIONS (path '$dir', keyCol 'k')")
    try {
      val prev = se.conf.getOption("spark.sql.cbo.enabled")
      se.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val plan = se.table("dv_cbo").queryExecution.optimizedPlan
        // the estimator-facing contract is the SCAN node's cardinality
        // (join estimation above it can only be as good as its inputs,
        // and the DV side is a bare parquet relation): the substituted
        // vectorized scan must expose the DV-ADJUSTED rowCount — 300,
        // not the manifest's raw 400
        val scan = plan.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation
              if l.relation.isInstanceOf[
                org.apache.spark.sql.execution.datasources.HadoopFsRelation] => l
        }
        assert(scan.nonEmpty, "expected the substituted parquet relation")
        assert(scan.head.stats.rowCount.contains(BigInt(300)),
          s"expected DV-adjusted rowCount 300, got ${scan.head.stats.rowCount}")
      } finally prev match {
        case Some(v) => se.conf.set("spark.sql.cbo.enabled", v)
        case None => se.conf.unset("spark.sql.cbo.enabled")
      }
    } finally se.sql("DROP TABLE IF EXISTS dv_cbo")
  }

  test("PARTITIONED DV state vectorizes as ONE spanning scan (r14); a " +
      "partition predicate prunes dirs inside the index") {
    val root = Files.createTempDirectory("graft_dvscan_p").toString + "/t"
    val df0 = (1L to 300L).map(k =>
        (k, s"v$k", if (k % 3 == 0) "A" else if (k % 3 == 1) "B" else "C"))
      .toDF("k", "payload", "grp")
    graft.sources.PartitionedSnapshots.init(spark, root, df0, "grp")
    // MoR wave into two of the three partitions → DVs there
    graft.sources.PartitionedSnapshots.mergePartitioned(spark, root,
      Seq((3L, "UA", "A"), (4L, "UB", "B")).toDF("k", "payload", "grp"),
      "k", "grp", mor = true)
    val se = graft.plans.GraftSessions.withExtensions(spark)
    val df = se.read.format("graft").load(root)
    val (file, row) = scans(df)
    assert(file.nonEmpty && row.isEmpty,
      "partitioned DV reads must vectorize under the extensions session")
    val expect = spark.read.format("graft").load(root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet == expect)
    assert(expect.contains((3L, "UA", "A")) && expect.size == 300)
    // r14: ONE data scan spans every partition dir (the multi-dir
    // stats-pruning index replaced the per-dir union), and a partition
    // predicate prunes whole dirs INSIDE listFiles — the scan's file
    // count drops to the surviving partition's files
    val dataScansAll = file.filter(_.relation.location
      .isInstanceOf[graft.sources.GraftPartitionedFileIndex])
    assert(dataScansAll.size == 1,
      s"expected ONE spanning data scan, got ${dataScansAll.size}")
    val (fAll, _) = scans(se.read.format("graft").load(root))
    val allFiles = fAll.filter(_.relation.location
      .isInstanceOf[graft.sources.GraftPartitionedFileIndex])
      .head.metrics("numFiles").value
    val one = se.read.format("graft").load(root).filter(col("part") === "A")
    val (fOne, _) = scans(one)
    val dataScans = fOne.filter(_.relation.location
      .isInstanceOf[graft.sources.GraftPartitionedFileIndex])
    assert(dataScans.size == 1,
      s"expected exactly one data scan, got ${dataScans.size}")
    assert(dataScans.head.metrics("numFiles").value < allFiles,
      "the partition predicate must prune dirs inside the index")
    assert(one.count() == 100)
  }

  test("r14: the substitution plans ONE scan node regardless of dir " +
      "count (64-partition table), partition pruning intact") {
    val root = Files.createTempDirectory("graft_dvscan_many").toString + "/t"
    val df0 = (1L to 1280L).map(k => (k, s"v$k", s"g${k % 64}"))
      .toDF("k", "payload", "grp")
    graft.sources.PartitionedSnapshots.init(spark, root, df0, "grp")
    // a MoR wave into every partition → DVs everywhere
    graft.sources.PartitionedSnapshots.mergePartitioned(spark, root,
      (0L until 64L).map(i => (i + 1L, "U", s"g${(i + 1) % 64}"))
        .toDF("k", "payload", "grp"),
      "k", "grp", mor = true)
    val se = graft.plans.GraftSessions.withExtensions(spark)
    val df = se.read.format("graft").load(root)
    val (file, row) = scans(df)
    assert(row.isEmpty, "must vectorize")
    val dataScans = file.filter(_.relation.location
      .isInstanceOf[graft.sources.GraftPartitionedFileIndex])
    assert(dataScans.size == 1,
      s"64 dirs must plan ONE scan node, got ${dataScans.size} " +
        s"(plus ${file.size - dataScans.size} non-data scans)")
    assert(df.count() == 1280)
    val one = se.read.format("graft").load(root)
      .filter(col("part") === "g7")
    assert(one.count() == 20)
    val (fOne, _) = scans(one)
    val oneScan = fOne.filter(_.relation.location
      .isInstanceOf[graft.sources.GraftPartitionedFileIndex]).head
    assert(oneScan.metrics("numFiles").value <
      dataScans.head.metrics("numFiles").value)
  }

  test("r13 second pass: HIDDEN-transform DV state vectorizes — no " +
      "layout column, content exact, columnar scans") {
    val root = Files.createTempDirectory("graft_dvscan_h").toString + "/t"
    graft.sources.HiddenPartitions.init(spark, root,
      (1L to 200L).map(k => (k, s"v$k")).toDF("k", "payload")
        .repartition(2), graft.sources.ModTransform("k", 4))
    graft.sources.HiddenPartitions.merge(spark, root,
      (1L to 10L).map(k => (k, "U")).toDF("k", "payload"), "k", mor = true)
    val se = graft.plans.GraftSessions.withExtensions(spark)
    val df = se.read.format("graft").load(root)
    assert(df.columns.toSeq == Seq("k", "payload"), "layout must not leak")
    val (file, row) = scans(df)
    assert(file.nonEmpty && row.isEmpty,
      "hidden DV reads must vectorize under the extensions session")
    val byK = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byK.size == 200 && byK(5L) == "U" && byK(11L) == "v11")
    // reconcile restores the fast FileIndex path on the plain session
    graft.sources.HiddenPartitions.reconcile(spark, root)
    val (pf, pr) = scans(spark.read.format("graft").load(root))
    assert(pf.nonEmpty && pr.isEmpty)
  }
}
