package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{PartitionedSnapshots, Snapshots}

/** A36 — the registered `format("graft")` data source: batch reads
  * plan over the manifest through a custom FileIndex (stats-pruned),
  * writes route to overwrite/merge commits, and the streaming read is
  * a real Structured Streaming Source with versions as offsets.
  */
class ConnectorSpec extends GraftSuite {

  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_conn_spec").toString + "/t"
    (1L to 100L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "gen")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    dir
  }

  test("batch read: head and versionAsOf match Snapshots.read, by short name") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Snapshots.mergeVersioned(spark, dir,
      Seq((5L, "UP5", 1L)).toDF("k", "payload", "gen"), "k") // v1

    val head = spark.read.format("graft").load(dir)
    assert(head.count() == 100)
    assert(head.filter(col("k") === 5L).select("payload").head().getString(0) == "UP5")

    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(dir)
    assert(v0.filter(col("k") === 5L).select("payload").head().getString(0) == "v5")

    // a non-table dir refuses loudly
    intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .load(Files.createTempDirectory("graft_conn_empty").toString)
    }
  }

  test("batch read: manifest stats prune files before the scan plans") {
    val dir = freshTable()
    Snapshots.init(spark, dir) // 4 range files with recorded k min/max

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // run, so the scan metric is populated
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "expected a FileSourceScanExec")
      scans.map(_.metrics("numFiles").value).sum
    }

    val all = spark.read.format("graft").load(dir)
    assert(scannedFiles(all) == 4)

    // k <= 10 lives in ONE of the four range files: three pruned from
    // the FILE LIST (not merely row-skipped) by the manifest stats
    val narrow = spark.read.format("graft").load(dir).filter(col("k") <= 10L)
    assert(narrow.count() == 10)
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("k") <= 10L)) == 1)

    // disjunction prunes to the union of the two sides' files
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("k") <= 10L || col("k") > 90L)) == 2)

    // r12: STRING columns carry truncated-prefix stats too — "v5" is
    // provably outside exactly one of the four files' [min, max] byte
    // ranges ("v51".."v75"; the others straddle it because "v5" sorts
    // between "v1x" and "v9x" prefixes), so the equality prunes 1 file
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("payload") === "v5")) == 3)
    // a filter shape the stats cannot judge keeps every file
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(length(col("payload")) > 1)) == 4)
  }

  test("bloom index joins the connector's skipping stack for point queries") {
    val dir = Files.createTempDirectory("graft_conn_bloom").toString + "/t"
    spark.range(40000)
      .selectExpr("id AS k", "(id * 2654435761) % 1000003 AS u", "id % 97 AS gen")
      .repartitionByRange(8, col("k")).write.parquet(dir)
    Snapshots.init(spark, dir)
    Snapshots.addBloomIndex(spark, dir, "u")

    def scanned(d: org.apache.spark.sql.DataFrame): Long = {
      d.collect()
      d.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    }
    val present = (123L * 2654435761L) % 1000003L
    // u is scattered, so the k-range stats cannot prune it — only the
    // bloom can, and the connector consults it at plan time
    assert(spark.read.format("graft").load(dir)
      .filter(col("u") === present).count() >= 1)
    val f = scanned(spark.read.format("graft").load(dir)
      .filter(col("u") === present))
    assert(f <= 3, s"connector bloom skipped nothing: $f of 8 files")
    // an absent value usually opens zero files; rows are exactly zero
    assert(spark.read.format("graft").load(dir)
      .filter(col("u") === 999999937L).count() == 0)
  }

  test("null-count stats prune IS NULL / IS NOT NULL at the file level") {
    val dir = Files.createTempDirectory("graft_conn_nulls").toString + "/t"
    // two cleanly-aligned files: one with v entirely null, one with
    // zero nulls — exactly the cases the null counts can decide
    spark.range(1, 51).selectExpr("id AS k", "CAST(NULL AS BIGINT) AS v")
      .coalesce(1).write.parquet(dir)
    spark.range(51, 101).selectExpr("id AS k", "id AS v")
      .coalesce(1).write.mode("append").parquet(dir)
    Snapshots.init(spark, dir)

    def scanned(d: org.apache.spark.sql.DataFrame): Long = {
      d.collect()
      d.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    }
    val isNull = spark.read.format("graft").load(dir).filter(col("v").isNull)
    assert(isNull.count() == 50)
    assert(scanned(spark.read.format("graft").load(dir)
      .filter(col("v").isNull)) == 1)
    val notNull = spark.read.format("graft").load(dir).filter(col("v").isNotNull)
    assert(notNull.count() == 50)
    assert(scanned(spark.read.format("graft").load(dir)
      .filter(col("v").isNotNull)) == 1)
    // any predicate on v implies IS NOT NULL: the all-null file is
    // skipped for it too
    assert(scanned(spark.read.format("graft").load(dir)
      .filter(col("v") > 0L)) == 1)
  }

  test("batch read serves DV and column-mapped versions via the compat scan") {
    val dir = freshTable()
    Snapshots.init(spark, dir)
    Snapshots.deleteVersionedDV(spark, dir, col("k") === 7L) // v1: DVs

    // the DV-carrying version reads through the connector: dead rows
    // stay dead, filters and projections are exact
    val dv = spark.read.format("graft").load(dir)
    assert(dv.count() == 99)
    assert(dv.filter(col("k") === 7L).isEmpty)
    assert(dv.filter(col("k") <= 10L).count() == 9)
    assert(dv.select("payload").where(col("k") === 8L).head().getString(0) == "v8")
    // time travel to the pre-delete version still shows the row
    assert(spark.read.format("graft").option("versionAsOf", 0)
      .load(dir).filter(col("k") === 7L).count() == 1)

    Snapshots.reconcileDV(spark, dir) // v2: plain files again (fast path)
    assert(spark.read.format("graft").load(dir).count() == 99)

    Snapshots.renameColumn(spark, dir, "payload", "body") // v3: mapping
    val mapped = spark.read.format("graft").load(dir)
    assert(mapped.schema.fieldNames.contains("body") &&
      !mapped.schema.fieldNames.contains("payload"),
      "compat read must answer under LOGICAL names")
    assert(mapped.filter(col("k") === 8L).select("body").head().getString(0) == "v8")
    // pre-mapping versions still read under their own schema
    assert(spark.read.format("graft").option("versionAsOf", 2)
      .load(dir).select("payload").count() == 99)

    // the numFiles pin: manifest stats still SKIP files inside the
    // compat path — a point predicate on the range-clustered key keeps
    // 1 of 4 files, through the logical→physical stat mapping
    import org.apache.spark.sql.sources.{EqualTo => SEq}
    val kept = graft.sources.GraftCompatRelation.planFiles(dir, 3,
      Array(SEq("k", 5L)))
    assert(kept.size == 1, s"compat pruning kept ${kept.size} of 4 files")
    // r12: the RENAMED STRING column prunes through the same
    // logical→physical mapping — its 'S' prefix stats exclude the one
    // file whose byte range provably misses "v5"
    val keptStr = graft.sources.GraftCompatRelation.planFiles(dir, 3,
      Array(SEq("body", "v5")))
    assert(keptStr.size == 3, s"string stats kept ${keptStr.size} of 4 files")
  }

  test("write path: overwrite bootstraps/replaces, append is a keyed merge") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_conn_write").toString + "/t"

    // overwrite on a fresh dir bootstraps v0
    (1L to 50L).map(k => (k, s"v$k")).toDF("k", "payload")
      .write.format("graft").mode("overwrite").save(dir)
    assert(Snapshots.currentVersion(dir) == 0)
    assert(spark.read.format("graft").load(dir).count() == 50)

    // append without keyCol refuses; with keyCol it merges
    intercept[Exception] {
      Seq((5L, "UP")).toDF("k", "payload")
        .write.format("graft").mode("append").save(dir)
    }
    Seq((5L, "UP5"), (51L, "NEW")).toDF("k", "payload")
      .write.format("graft").option("keyCol", "k").mode("append").save(dir) // v1
    val after = spark.read.format("graft").load(dir)
    assert(after.count() == 51)
    assert(after.filter(col("k") === 5L).select("payload").head().getString(0) == "UP5")

    // overwrite on a versioned table commits a new version; the old
    // content stays time-travelable
    Seq((999L, "OW")).toDF("k", "payload")
      .write.format("graft").mode("overwrite").save(dir) // v2
    assert(spark.read.format("graft").load(dir).count() == 1)
    assert(spark.read.format("graft").option("versionAsOf", 1)
      .load(dir).count() == 51)

    // ErrorIfExists refuses on a versioned table
    intercept[Exception] {
      Seq((1L, "X")).toDF("k", "payload")
        .write.format("graft").mode("error").save(dir)
    }
  }

  test("partitioned table through the connector: partition pruning, then per-file stats") {
    import spark.implicits._

    val dir = Files.createTempDirectory("graft_conn_part").toString + "/t"
    val df = (1L to 1000L).map(k => (k, if (k % 2 == 0) "E" else "O", k % 7))
      .toDF("k", "st", "gen").repartitionByRange(4, col("k"))
    PartitionedSnapshots.init(spark, dir, df, "st")

    def scannedFiles(d: org.apache.spark.sql.DataFrame): Long = {
      d.collect()
      d.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    }
    val rel = spark.read.format("graft").option("partitionCol", "st").load(dir)
    assert(rel.count() == 1000)
    assert(rel.columns.contains("st"))
    assert(rel.filter(col("st") === "E").count() == 500)
    val allFiles = scannedFiles(spark.read.format("graft")
      .option("partitionCol", "st").load(dir))

    // a partition predicate prunes the OTHER partition's files wholesale
    val oneSide = scannedFiles(spark.read.format("graft")
      .option("partitionCol", "st").load(dir).filter(col("st") === "E"))
    assert(oneSide * 2 == allFiles, s"partition pruning: $oneSide of $allFiles")

    // within the surviving partition, per-file manifest stats prune on k
    val narrow = scannedFiles(spark.read.format("graft")
      .option("partitionCol", "st").load(dir)
      .filter(col("st") === "E" && col("k") <= 200L))
    assert(narrow < oneSide, s"stats pruning: $narrow vs $oneSide")
    assert(spark.read.format("graft").option("partitionCol", "st").load(dir)
      .filter(col("st") === "E" && col("k") <= 200L).count() == 100)

    // merges on a partition are visible through the connector read
    PartitionedSnapshots.mergePartitioned(spark, dir,
      Seq((2L, "E", 99L)).toDF("k", "st", "gen"), "k", "st")
    assert(spark.read.format("graft").option("partitionCol", "st").load(dir)
      .filter(col("k") === 2L).select("gen").head().getLong(0) == 99L)

    // a DV delete in ONE partition routes the table through the
    // partitioned compat scan: dead rows stay dead, the untouched
    // partition is bit-identical, partition + stats pruning still hold
    Snapshots.deleteVersionedDV(spark,
      PartitionedSnapshots.partitionDir(dir, "E"), col("k") % 10 === 0)
    val compat = spark.read.format("graft").option("partitionCol", "st").load(dir)
    assert(compat.count() == 900) // 100 even multiples of 10 are dead
    assert(compat.filter(col("k") % 10 === 0).isEmpty)
    assert(compat.filter(col("st") === "O").count() == 500)
    assert(compat.filter(col("st") === "E" && col("k") <= 200L).count() == 80)
    // driver-side partition pruning pin for the compat path
    import org.apache.spark.sql.sources.{EqualTo => SEq}
    val dirsNow = Seq("E", "O").map(v =>
      v -> PartitionedSnapshots.partitionDir(dir, v))
    assert(graft.sources.GraftPartitionedCompatRelation
      .survivingParts(dirsNow, "st", Array(SEq("st", "E"))).map(_._1) == Seq("E"))
    assert(graft.sources.GraftPartitionedCompatRelation
      .survivingParts(dirsNow, "st", Array(SEq("k", 5L))).size == 2)
  }

  test("timestamp time travel and metadata tables over the log") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Thread.sleep(20)
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(20)
    Snapshots.mergeVersioned(spark, dir,
      Seq((5L, "UP5", 1L)).toDF("k", "payload", "gen"), "k") // v1

    // TIMESTAMP AS OF: a time between the commits resolves to v0
    assert(Snapshots.versionAsOfTime(dir, betweenCommits) == 0)
    assert(spark.read.format("graft")
      .option("timestampAsOf", betweenCommits.toString).load(dir)
      .filter(col("k") === 5L).select("payload").head().getString(0) == "v5")
    assert(spark.read.format("graft")
      .option("timestampAsOf", System.currentTimeMillis().toString).load(dir)
      .filter(col("k") === 5L).select("payload").head().getString(0) == "UP5")
    // a time before the table existed refuses
    intercept[IllegalArgumentException] {
      Snapshots.versionAsOfTime(dir, 1L)
    }

    // metadata tables read the LOG, not the data
    val hist = spark.read.format("graft").option("metadata", "history")
      .load(dir).orderBy("version").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert(hist.map(_.getLong(1)).forall(_ > 0))
    assert(hist(0).getLong(1) <= hist(1).getLong(1))
    val files = spark.read.format("graft").option("metadata", "files").load(dir)
    assert(files.agg(sum("rows")).head().getLong(0) == 100)
    graft.sources.Refs.tag(dir, "m1", 0)
    val tags = spark.read.format("graft").option("metadata", "tags").load(dir).collect()
    assert(tags.map(r => r.getString(0) -> r.getInt(1)).toSeq == Seq("m1" -> 0))
  }

  test("streaming sink: writeStream.format(\"graft\") commits a version per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val dst = Files.createTempDirectory("graft_conn_sink").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_conn_sink_ckpt").toString
    val q = mem.toDF().toDF("k", "payload", "ts")
      .writeStream.format("graft")
      .option("keyCol", "k").option("orderCol", "ts")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      // first batch bootstraps v0; two changes to k=1 resolve to the
      // LATEST by ts (last-change-wins within the batch)
      mem.addData((1L, "a", 1L), (2L, "b", 1L), (1L, "a2", 2L))
      q.processAllAvailable()
      assert(Snapshots.currentVersion(dst) == 0)
      val v0 = Snapshots.read(spark, dst).select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v0 == Map(1L -> "a2", 2L -> "b"))

      // the next batch commits the next version; history is intact
      mem.addData((2L, "b2", 3L), (3L, "c", 3L))
      q.processAllAvailable()
      assert(Snapshots.currentVersion(dst) == 1)
      val v1 = Snapshots.read(spark, dst).select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v1 == Map(1L -> "a2", 2L -> "b2", 3L -> "c"))
      assert(Snapshots.read(spark, dst, 0).filter(col("k") === 2L)
        .select("payload").head().getString(0) == "b")
    } finally q.stop()
  }

  test("morWrites streaming sink: micro-batches append + DV-mark, zero rewrites") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val dst = Files.createTempDirectory("graft_conn_morsink").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_conn_morsink_ckpt").toString
    val q = mem.toDF().toDF("k", "payload", "ts")
      .writeStream.format("graft")
      .option("keyCol", "k").option("orderCol", "ts")
      .option("morWrites", "true")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      mem.addData((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      q.processAllAvailable() // v0 bootstrap (append — nothing to mark)
      val v0files = Snapshots.liveFiles(dst, 0).toSet
      mem.addData((2L, "b2", 2L), (4L, "d", 2L))
      q.processAllAvailable() // v1: MoR — update k=2, insert k=4
      val v1files = Snapshots.liveFiles(dst, 1).toSet
      // merge-on-read: the bootstrap files are ALL still live; the
      // batch arrived as appended files plus one deletion vector
      assert(v0files.subsetOf(v1files) && v1files.size > v0files.size)
      assert(Snapshots.dvFiles(dst, 1).nonEmpty)
      val now = Snapshots.read(spark, dst).select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(now == Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
      // time travel to the bootstrap is unaffected
      assert(Snapshots.read(spark, dst, 0).filter(col("k") === 2L)
        .select("payload").head().getString(0) == "b")
      // reconcile folds the stream's DVs like any other
      Snapshots.reconcileDV(spark, dst)
      val folded = Snapshots.read(spark, dst).select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(folded == now)
    } finally q.stop()
  }

  test("streaming sink auto-compaction: live file count stays bounded across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val dst = Files.createTempDirectory("graft_conn_ac").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_conn_ac_ckpt").toString
    val q = mem.toDF().toDF("k", "payload", "ts")
      .writeStream.format("graft")
      .option("keyCol", "k").option("orderCol", "ts")
      .option("checkpointLocation", ckpt)
      .option("autoCompactMinFiles", "4")
      .start(dst)
    try {
      // 12 micro-batches of disjoint keys: without auto-compaction the
      // live set accumulates each batch's staged files forever
      (0 until 12).foreach { i =>
        mem.addData((100L * i, s"p$i", i.toLong), (100L * i + 1, s"q$i", i.toLong))
        q.processAllAvailable()
      }
      val head = Snapshots.currentVersion(dst)
      val live = Snapshots.liveFiles(dst, head)
      assert(live.size < 8,
        s"auto-compaction should bound the live set (got ${live.size} files)")
      // and the data is exactly the 24 upserted keys
      val rows = Snapshots.read(spark, dst).select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.size == 24)
      (0 until 12).foreach { i =>
        assert(rows(100L * i) == s"p$i" && rows(100L * i + 1) == s"q$i")
      }
    } finally q.stop()
  }

  test("r14 autoReconcileMaxDvFiles: steady-state MoR ingest keeps DV " +
      "sidecars bounded; the fold is layout-only (empty feed), data exact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val dst = Files.createTempDirectory("graft_conn_ar").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_conn_ar_ckpt").toString
    val q = mem.toDF().toDF("k", "payload", "ts")
      .writeStream.format("graft")
      .option("keyCol", "k").option("orderCol", "ts")
      .option("morWrites", "true")
      .option("autoReconcileMaxDvFiles", "3")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      mem.addData((1L to 8L).map(k => (k, s"v$k", 0L)): _*)
      q.processAllAvailable() // bootstrap, no DVs
      // 10 update waves on the same keys: every batch DV-marks, so
      // without the gate the head would carry 10 sidecars
      (1 to 10).foreach { i =>
        mem.addData((1L, s"a$i", i.toLong), (2L, s"b$i", i.toLong))
        q.processAllAvailable()
        val head = Snapshots.currentVersion(dst)
        assert(Snapshots.dvFiles(dst, head).size <= 3,
          s"DV count must stay bounded (v$head carries " +
            s"${Snapshots.dvFiles(dst, head).size})")
      }
      val head = Snapshots.currentVersion(dst)
      // at least one auto-fold happened, and every fold was a
      // LAYOUT-ONLY commit: the A20 feed across it is empty
      val folds = (1 to head).filter { v =>
        Snapshots.dvFiles(dst, v).isEmpty &&
          Snapshots.dvFiles(dst, v - 1).nonEmpty
      }
      assert(folds.nonEmpty, "expected at least one auto-reconcile commit")
      folds.foreach { v =>
        assert(Snapshots.changesBetween(spark, dst, v - 1, v, "k").isEmpty,
          s"reconcile commit v$v must be invisible to the change feed")
      }
      // data exact after the whole run
      val rows = Snapshots.read(spark, dst).select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows == (3L to 8L).map(k => k -> s"v$k").toMap +
        (1L -> "a10") + (2L -> "b10"))
    } finally q.stop()
  }

  test("r14 autoReconcile on a hidden root: per-dir DV sidecars stay " +
      "bounded under morWrites ingest") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dst = Files.createTempDirectory("graft_conn_arh").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_conn_arh_ckpt").toString
    graft.sources.HiddenPartitions.init(spark, dst,
      (1L to 8L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "ts"),
      graft.sources.ModTransform("k", 2))
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("k", "payload", "ts")
      .writeStream.format("graft")
      .option("keyCol", "k").option("orderCol", "ts")
      .option("morWrites", "true")
      .option("autoReconcileMaxDvFiles", "2")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      (1 to 8).foreach { i =>
        // touch both residues every batch
        mem.addData((1L, s"a$i", i.toLong), (2L, s"b$i", i.toLong))
        q.processAllAvailable()
        graft.sources.HiddenPartitions.epochGroups(dst)
          .flatMap(_._3).map(_._2).foreach { d =>
            val v = Snapshots.currentVersion(d)
            assert(Snapshots.dvFiles(d, v).size <= 2,
              s"dir $d head carries ${Snapshots.dvFiles(d, v).size} DVs")
          }
      }
      val rows = graft.sources.HiddenPartitions.read(spark, dst)
        .select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows(1L) == "a8" && rows(2L) == "b8" && rows.size == 8)
    } finally q.stop()
  }

  test("the full loop: readStream graft -> transform -> writeStream graft") {
    import spark.implicits._
    val src = freshTable()
    Snapshots.init(spark, src) // v0
    val dst = Files.createTempDirectory("graft_conn_loop").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_conn_loop_ckpt").toString
    // mirror upserts (the feed's post-images) into a second versioned
    // table, entirely through the registered format — both directions
    val q = spark.readStream.format("graft").option("keyCol", "k").load(src)
      .filter(col("change_type") =!= "delete")
      .select("k", "payload", "gen", "_commit_version")
      .writeStream.format("graft")
      .option("keyCol", "k").option("orderCol", "_commit_version")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      q.processAllAvailable() // initial snapshot lands as dst v0
      assert(spark.read.format("graft").load(dst).count() == 100)
      Snapshots.mergeVersioned(spark, src,
        Seq((5L, "UP5", 7L)).toDF("k", "payload", "gen"), "k")
      q.processAllAvailable()
      val mirrored = spark.read.format("graft").load(dst)
      assert(mirrored.filter(col("k") === 5L)
        .select("payload").head().getString(0) == "UP5")
      assert(mirrored.count() == 100)
    } finally q.stop()
  }

  test("CDF stream composes with watermark + window into a graft sink (silver loop)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_conn_silver_src").toString + "/t"
    val dst = Files.createTempDirectory("graft_conn_silver_dst").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_conn_silver_ckpt").toString
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    (1L to 40L).map(k => (k, ts((k % 30).toInt), 1L))
      .toDF("k", "ts", "v")
      .repartitionByRange(2, col("k")).write.parquet(src)
    Snapshots.init(spark, src) // v0

    // bronze CDF → event-time window counts → versioned silver table,
    // every stage engine-managed (update mode: the sink merges each
    // window's refreshed count by its start key)
    val q = spark.readStream.format("graft").option("keyCol", "k").load(src)
      .filter(col("change_type") =!= "delete")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
      .writeStream.outputMode("update")
      .format("graft").option("keyCol", "wstart")
      .option("checkpointLocation", ckpt)
      .start(dst)
    def silver: Map[java.sql.Timestamp, Long] =
      Snapshots.read(spark, dst).collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    def batchEquivalent: Map[java.sql.Timestamp, Long] =
      Snapshots.read(spark, src)
        .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("n")).collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    try {
      q.processAllAvailable()
      assert(silver == batchEquivalent, s"silver $silver vs $batchEquivalent")

      // more bronze commits with IN-WATERMARK event times (after the
      // snapshot batch the watermark sits at 10:29 − 10 min = 10:19,
      // so 10:25 and 10:40 are admitted; a 10:05 row would be dropped
      // by exactly the late-data rule — verified the hard way): the
      // silver table converges to the refreshed batch answer
      Snapshots.mergeVersioned(spark, src,
        (100L to 110L).map(k => (k, ts(40), 1L)).toDF("k", "ts", "v"), "k")
      Snapshots.mergeVersioned(spark, src,
        (111L to 113L).map(k => (k, ts(25), 1L)).toDF("k", "ts", "v"), "k")
      q.processAllAvailable()
      assert(silver == batchEquivalent, s"after commits: $silver vs $batchEquivalent")
    } finally q.stop()
  }

  test("streaming source: versions are offsets, initial snapshot, checkpoint resume") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Snapshots.mergeVersioned(spark, dir,
      Seq((5L, "UP5", 1L)).toDF("k", "payload", "gen"), "k") // v1
    val ckpt = Files.createTempDirectory("graft_conn_ckpt").toString

    // foreachBatch sink: supports checkpoint recovery (a memory sink
    // refuses it), and hands us the delivered rows per micro-batch
    def startQuery(buf: scala.collection.mutable.ArrayBuffer[(Long, String, Int)]) =
      spark.readStream.format("graft").option("keyCol", "k").load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= b.collect().map(r =>
              (r.getLong(0), r.getString(1), r.getInt(4)))
          }; ()
        }
        .option("checkpointLocation", ckpt).start()

    val got1 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    val q1 = startQuery(got1)
    try {
      q1.processAllAvailable()
      // initial batch: 100-row snapshot at v0 (inserts) + v1's update
      assert(got1.size == 101)
      assert(got1.count(_._3 == 0) == 100)
      assert(got1.filter(_._3 == 1).map(t => (t._1, t._2)) == Seq((5L, "update")))

      // a new commit while the query runs becomes the next micro-batch
      Snapshots.deleteVersioned(spark, dir, col("k") === 9L) // v2
      q1.processAllAvailable()
      assert(got1.size == 102)
      assert(got1.filter(_._3 == 2).map(t => (t._1, t._2)) == Seq((9L, "delete")))
    } finally q1.stop()

    // restart against the SAME checkpoint: only post-checkpoint
    // versions are delivered — no snapshot replay, no duplicates
    Snapshots.mergeVersioned(spark, dir,
      Seq((200L, "NEW", 1L)).toDF("k", "payload", "gen"), "k") // v3
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    val q2 = startQuery(got2)
    try {
      q2.processAllAvailable()
      assert(got2.toSeq == Seq((200L, "insert", 3)))
    } finally q2.stop()

    // startingVersion: a fresh consumer that already holds v1's state
    // gets NO snapshot — exactly the v2 and v3 changes
    val got3 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    val q3 = spark.readStream.format("graft")
      .option("keyCol", "k").option("startingVersion", 1).load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got3.synchronized {
          got3 ++= b.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(4)))
        }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_conn_sv_ckpt").toString)
      .start()
    try {
      q3.processAllAvailable()
      assert(got3.sorted.toSeq ==
        Seq((9L, "delete", 2), (200L, "insert", 3)))
    } finally q3.stop()
  }

  test("readChangeFeed streaming: 4-way _change_type, pre-images, checkpoint resume") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir, changeDataFeed = true) // v0
    Snapshots.mergeVersioned(spark, dir,
      Seq((5L, "UP5", 1L), (200L, "NEW", 1L)).toDF("k", "payload", "gen"),
      "k") // v1: one update (with stored pre-image), one insert
    Snapshots.deleteVersioned(spark, dir, col("k") === 9L) // v2

    val ckpt = Files.createTempDirectory("graft_cdf_ckpt").toString
    def startQuery(buf: scala.collection.mutable.ArrayBuffer[(Long, String, String, Int)]) =
      spark.readStream.format("graft").option("keyCol", "k")
        .option("readChangeFeed", "true").load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= b.collect().map(r =>
              (r.getLong(0), r.getString(1), r.getString(2), r.getInt(4)))
          }; ()
        }
        .option("checkpointLocation", ckpt).start()

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Int)]
    val q = startQuery(got)
    try {
      q.processAllAvailable()
      // snapshot: 100 inserts at v0 under the CDF column name
      assert(got.count(t => t._4 == 0 && t._2 == "insert") == 100)
      // v1: BOTH update images (pre carries the old payload, served
      // from the A31 stored pre-image rows) plus the plain insert
      assert(got.filter(_._4 == 1).sorted.toSeq == Seq(
        (5L, "update_postimage", "UP5", 1),
        (5L, "update_preimage", "v5", 1),
        (200L, "insert", "NEW", 1)).sorted)
      // v2: the delete carries its PRE-IMAGE payload (not null)
      assert(got.filter(_._4 == 2).toSeq == Seq((9L, "delete", "v9", 2)))
      assert(got.size == 104)
    } finally q.stop()

    // restart against the SAME checkpoint: only the new commit's rows
    Snapshots.mergeVersioned(spark, dir,
      Seq((7L, "UP7", 2L)).toDF("k", "payload", "gen"), "k") // v3
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Int)]
    val q2 = startQuery(got2)
    try {
      q2.processAllAvailable()
      assert(got2.sorted.toSeq == Seq(
        (7L, "update_postimage", "UP7", 3),
        (7L, "update_preimage", "v7", 3)).sorted)
    } finally q2.stop()
  }

  test("readChangeFeed start controls: startingVersion skips the " +
      "snapshot; startingTimestamp resolves to the first commit at or " +
      "after the instant; refusals pin the contract") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir, changeDataFeed = true) // v0
    Snapshots.mergeVersioned(spark, dir,
      Seq((5L, "UP5", 1L)).toDF("k", "payload", "gen"), "k") // v1
    val t1 = Snapshots.commitTime(dir, 1).get
    Snapshots.deleteVersioned(spark, dir, col("k") === 9L) // v2

    def collectFeed(opts: Map[String, String]): Seq[(Long, String, Int)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
      var r = spark.readStream.format("graft").option("keyCol", "k")
        .option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load(dir).writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= b.collect().map(x =>
              (x.getLong(0), x.getString(1), x.getInt(4)))
          }; ()
        }
        .option("checkpointLocation",
          Files.createTempDirectory("graft_cdf_start").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      buf.toSeq
    }
    // startingVersion 1 on the CDF feed: no snapshot, v2's delete only
    assert(collectFeed(Map("startingVersion" -> "1")) ==
      Seq((9L, "delete", 2)))
    // startingTimestamp at v1's commit instant: v1 is AT the instant,
    // so its change rows are delivered (start = after v0)
    val fromT1 = collectFeed(Map("startingTimestamp" -> t1.toString))
    assert(fromT1.map(_._3).distinct.sorted == Seq(1, 2),
      s"expected v1+v2 changes, got $fromT1")
    assert(fromT1.count(_._3 == 1) == 2) // both update images
    // refusals: both options together; an instant predating history;
    // an instant AFTER every commit (Delta parity — a typo'd far-future
    // instant must not become a silently empty feed; from-now tailing
    // is spelled startingVersion = currentVersion)
    intercept[Exception] {
      collectFeed(Map("startingVersion" -> "1", "startingTimestamp" -> "0"))
    }
    intercept[Exception] { collectFeed(Map("startingTimestamp" -> "0")) }
    val tLate = Snapshots.commitTime(dir, 2).get + 1
    intercept[Exception] {
      collectFeed(Map("startingTimestamp" -> tLate.toString))
    }
  }

  test("changesCdf: stored-change fast path matches the manifest-diff path") {
    import spark.implicits._
    // two tables, identical history; only `a` records change data —
    // so a's single-step feed serves from stored rows and b's from the
    // manifest diff. The CDF row sets must be identical.
    def build(cdf: Boolean): String = {
      val dir = freshTable()
      Snapshots.init(spark, dir, changeDataFeed = cdf)
      Snapshots.mergeVersioned(spark, dir,
        Seq((5L, "UP5", 1L), (200L, "NEW", 1L)).toDF("k", "payload", "gen"), "k")
      Snapshots.deleteVersioned(spark, dir, col("k") % 10 === 0)
      dir
    }
    val a = build(cdf = true)
    val b = build(cdf = false)
    for (v <- 1 to 2) {
      val fast = Snapshots.changesCdf(spark, a, v - 1, v, "k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).sorted.toSeq
      val diff = Snapshots.changesCdf(spark, b, v - 1, v, "k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).sorted.toSeq
      assert(fast == diff, s"window ($v-1,$v]")
      assert(fast.nonEmpty)
    }
    // the multi-version window (always manifest diff) nets out the
    // intermediate images: one update pair per SURVIVING change
    val whole = Snapshots.changesCdf(spark, a, 0, 2, "k")
    assert(whole.filter(col("_change_type") === "update_preimage").count() ==
      whole.filter(col("_change_type") === "update_postimage").count())
  }

  test("snapshotFilesPerTrigger chunks the initial snapshot; mid-snapshot resume exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_conn_chunk").toString + "/t"
    (1L to 80L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "gen")
      .repartitionByRange(8, col("k")).write.parquet(dir)
    Snapshots.init(spark, dir) // v0: 8 snapshot files
    Snapshots.mergeVersioned(spark, dir,
      Seq((5L, "UP5", 1L)).toDF("k", "payload", "gen"), "k") // v1

    val ckpt = Files.createTempDirectory("graft_chunk_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Int)]
    def writer() = spark.readStream.format("graft")
      .option("keyCol", "k").option("snapshotFilesPerTrigger", 3).load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got.synchronized {
          got ++= b.collect().map(r => (id, r.getLong(0), r.getString(1), r.getInt(4)))
        }; ()
      }
      .option("checkpointLocation", ckpt)

    // one trigger → only the first chunk of the snapshot arrives
    val q1 = writer()
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q1.awaitTermination()
    val afterOne = got.size
    assert(afterOne > 0 && afterOne < 80,
      s"first trigger delivered $afterOne of 80 snapshot rows — not chunked")

    // restart from the checkpoint mid-snapshot: the rest arrives across
    // further chunked batches, bit-identical to the single-batch
    // contract, zero duplicates
    val q2 = writer().start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = got.toSeq
    assert(rows.map(_._1).distinct.size >= 3,
      s"snapshot+feed arrived in only ${rows.map(_._1).distinct.size} batches")
    val snapRows = rows.filter(_._4 == 0)
    assert(snapRows.map(_._2).sorted == (1L to 80L).toSeq,
      "snapshot incomplete or duplicated across the resume")
    assert(snapRows.forall(_._3 == "insert"))
    assert(rows.filter(_._4 == 1).map(r => (r._2, r._3)) == Seq((5L, "update")))
  }

  test("maxVersionsPerTrigger bounds catch-up batches to one commit each") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_conn_maxv").toString + "/t"
    (1L to 20L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "gen")
      .coalesce(1).write.parquet(dir)
    Snapshots.init(spark, dir) // v0
    (1 to 4).foreach { i =>
      Snapshots.mergeVersioned(spark, dir,
        Seq((100L + i, s"n$i", i.toLong)).toDF("k", "payload", "gen"), "k")
    } // v1..v4 committed BEFORE the consumer starts — the downtime case
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = spark.readStream.format("graft")
      .option("keyCol", "k").option("maxVersionsPerTrigger", 1).load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got.synchronized {
          got ++= b.collect().map(r => (id, r.getLong(0), r.getInt(4)))
        }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_maxv_ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = got.toSeq
    // complete delivery: the v0 snapshot plus one insert per version
    assert(rows.count(_._3 == 0) == 20)
    assert((1 to 4).forall(i => rows.count(_._3 == i) == 1))
    // and the catch-up arrived over MULTIPLE batches, each advancing at
    // most one version past the previous (never one giant batch)
    val perBatch = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct.sorted)
    assert(perBatch.size >= 4, s"caught up in only ${perBatch.size} batches")
    perBatch.values.foreach { vs =>
      assert(vs.max - vs.min <= 1, s"a batch spanned versions $vs") }
  }

  test("Trigger.AvailableNow: backfill drains every committed version, " +
      "self-terminates, resumes incrementally") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_conn_an").toString + "/t"
    (1L to 20L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "gen")
      .coalesce(1).write.parquet(dir)
    Snapshots.init(spark, dir) // v0
    Snapshots.mergeVersioned(spark, dir,
      Seq((101L, "n1", 1L)).toDF("k", "payload", "gen"), "k") // v1
    Snapshots.deleteVersioned(spark, dir, col("k") === 9L)    // v2
    val ckpt = Files.createTempDirectory("graft_conn_an_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    // the modern backfill verb: process everything committed so far,
    // then STOP — batch jobs over a streaming source. The source
    // implements SupportsTriggerAvailableNow natively, so the engine
    // captures the head at start, keeps firing rate-limited batches
    // (maxVersionsPerTrigger still bounds each) until it is reached,
    // then self-terminates — no wrapper flag, no single-batch fallback
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("keyCol", "k").option("maxVersionsPerTrigger", 1).load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= b.collect().map(r => (r.getLong(0), r.getInt(4)))
          }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000),
        "AvailableNow query did not self-terminate")
    }
    drain()
    assert(got.count(_._2 == 0) == 20) // full v0 snapshot
    assert(got.count(_._2 == 1) == 1 && got.count(_._2 == 2) == 1)
    assert(got.size == 22)
    // commits while the consumer is STOPPED; the next drain delivers
    // exactly those and stops again — the scheduled-backfill loop
    Snapshots.mergeVersioned(spark, dir,
      Seq((202L, "n2", 2L)).toDF("k", "payload", "gen"), "k") // v3
    got.clear()
    drain()
    assert(got.toSeq == Seq((202L, 3)))
  }

  test("float column stats prune soundly: a float point probe keeps its file") {
    import spark.implicits._
    // 0.7f widens to 0.699999988…; a Float.toString-recorded min ("0.7")
    // re-parsed as double is 0.69999999999999996 — ABOVE the true widened
    // min — so `f === 0.7f` would prove the file cannot match and prune
    // it, silently losing the row. Stats are now aggregated as double
    // (exact widening, round-tripping toString), so the probe survives.
    val dir = Files.createTempDirectory("graft_conn_float").toString + "/t"
    Seq((1L, 0.7f), (2L, 0.9f)).toDF("k", "f").coalesce(1).write.parquet(dir)
    Snapshots.init(spark, dir)
    val hit = spark.read.format("graft").load(dir).filter(col("f") === 0.7f)
    assert(hit.count() == 1)
    assert(hit.select("k").head().getLong(0) == 1L)
    // and the range pruning still WORKS on floats: a value outside the
    // recorded range scans zero files
    val miss = spark.read.format("graft").load(dir).filter(col("f") === 5.5f)
    miss.collect()
    val scanned = miss.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    assert(scanned == 0, s"expected 0 files scanned, got $scanned")
  }

  test("commit timestamps are strictly monotonic across rapid commits") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir)
    // commits landing within one wall-clock millisecond must still
    // record strictly increasing instants, or TIMESTAMP AS OF between
    // them is ill-defined (the Delta commit-time adjustment)
    (1 to 5).foreach { i =>
      Snapshots.mergeVersioned(spark, dir,
        Seq((i.toLong, s"U$i", 9L)).toDF("k", "payload", "gen"), "k")
    }
    val ts = (0 to Snapshots.currentVersion(dir))
      .map(v => Snapshots.commitTime(dir, v).get)
    assert(ts == ts.sorted && ts.distinct == ts,
      s"commit times not strictly increasing: $ts")
  }

  test("r9: partitioned streaming read — per-partition version-map offsets, new partitions mid-stream, resume") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_part_stream").toString + "/t"
    // two partitions, 50 keys each
    PartitionedSnapshots.init(spark, root,
      (1L to 100L).map(k => (k, s"v$k", if (k <= 50) "a" else "b"))
        .toDF("k", "payload", "src"), "src")
    val ckpt = Files.createTempDirectory("graft_part_stream_ckpt").toString

    // (k, tag, version, partition)
    def startQuery(buf: scala.collection.mutable.ArrayBuffer[(Long, String, Int, String)]) =
      spark.readStream.format("graft")
        .option("keyCol", "k").option("partitionCol", "src").load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= b.collect().map(r =>
              (r.getLong(0), r.getString(1), r.getInt(3), r.getString(4)))
          }; ()
        }
        .option("checkpointLocation", ckpt).start()

    val got1 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int, String)]
    val q1 = startQuery(got1)
    try {
      q1.processAllAvailable()
      // initial batch: both partitions' v0 snapshots, rows tagged with
      // their partition value
      assert(got1.size == 100)
      assert(got1.forall(_._2 == "insert") && got1.forall(_._3 == 0))
      assert(got1.count(_._4 == "a") == 50 && got1.count(_._4 == "b") == 50)

      // a merge touching ONE partition: only its change is delivered,
      // under ITS OWN next version; the untouched partition is silent
      PartitionedSnapshots.mergePartitioned(spark, root,
        Seq((7L, "UP7", "a")).toDF("k", "payload", "src"), "k", "src")
      q1.processAllAvailable()
      assert(got1.size == 101)
      assert(got1.last == ((7L, "update", 1, "a")))

      // a BRAND-NEW partition lands mid-stream: its bootstrap snapshot
      // is delivered as inserts at its own v0
      PartitionedSnapshots.mergePartitioned(spark, root,
        (201L to 203L).map(k => (k, s"c$k", "c")).toDF("k", "payload", "src"),
        "k", "src")
      q1.processAllAvailable()
      assert(got1.size == 104)
      val cRows = got1.filter(_._4 == "c")
      assert(cRows.map(_._1).sorted == Seq(201L, 202L, 203L))
      assert(cRows.forall(r => r._2 == "insert" && r._3 == 0))
    } finally q1.stop()

    // restart on the SAME checkpoint: only post-checkpoint commits —
    // no snapshot replay for any of the three partitions
    PartitionedSnapshots.mergePartitioned(spark, root,
      Seq((60L, "UP60", "b")).toDF("k", "payload", "src"), "k", "src")
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int, String)]
    val q2 = startQuery(got2)
    try {
      q2.processAllAvailable()
      assert(got2.toSeq == Seq((60L, "update", 1, "b")))
    } finally q2.stop()

    // version-addressed options are per-partition concepts: refuse
    val err = intercept[Exception] {
      spark.readStream.format("graft").option("keyCol", "k")
        .option("startingVersion", 1).load(root)
        .writeStream.format("noop").start().processAllAvailable()
    }
    assert(err.getMessage != null)
  }

  test("r9: partitioned streaming read composes with readChangeFeed (typed 4-way rows)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_part_cdf").toString + "/t"
    PartitionedSnapshots.init(spark, root,
      (1L to 20L).map(k => (k, s"v$k", if (k <= 10) "a" else "b"))
        .toDF("k", "payload", "src"), "src")
    // one update in a, one delete in b — each in its own log
    PartitionedSnapshots.mergePartitioned(spark, root,
      Seq((3L, "UP3", "a")).toDF("k", "payload", "src"), "k", "src")
    Snapshots.deleteVersioned(spark,
      PartitionedSnapshots.partitionDir(root, "b"), col("k") === 15L)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String)]
    val q = spark.readStream.format("graft")
      .option("keyCol", "k").option("partitionCol", "src")
      .option("readChangeFeed", "true").load(root)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getString(2), r.getString(4)))
        }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_part_cdf_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      // snapshots: 20 inserts; a's update delivers pre+post; b's
      // delete carries the OLD payload
      assert(got.count(_._2 == "insert") == 20)
      assert(got.filter(t => t._1 == 3L && t._4 == "a").map(t => (t._2, t._3)).sorted.toSeq ==
        Seq(("insert", "v3"), ("update_postimage", "UP3"), ("update_preimage", "v3")))
      assert(got.filter(t => t._1 == 15L && t._4 == "b").map(t => (t._2, t._3)).sorted.toSeq ==
        Seq(("delete", "v15"), ("insert", "v15")))
    } finally q.stop()
  }

  test("r13 AvailableNow contract: a table uninitialized at query start " +
      "yields nothing even if v0 commits mid-run") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_conn_an13").toString + "/t"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.IntegerType)))
    val src = new graft.sources.GraftChangeSource(spark, dir, "k", schema)
    // AvailableNow captures the head BEFORE the table exists: the
    // drain's contract is 'data available at query start' — nothing
    src.prepareForTriggerAvailableNow()
    Seq((1L, "a")).toDF("k", "payload").write.parquet(dir)
    Snapshots.init(spark, dir) // v0 commits mid-run
    assert(src.getOffset.isEmpty,
      "an AvailableNow drain leaked a version committed after query start")
    // a source WITHOUT the captured cap (normal micro-batch tailing)
    // sees the new head immediately
    val tailSrc = new graft.sources.GraftChangeSource(spark, dir, "k", schema)
    assert(tailSrc.getOffset.nonEmpty)
  }

  test("r13 hidden-root streaming sink: the table's own transform " +
      "routes each micro-batch; morWrites = zero rewrites per dir; " +
      "partitionBy refuses") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dst = Files.createTempDirectory("graft_conn_hidsink").toString + "/t"
    graft.sources.HiddenPartitions.init(spark, dst,
      (1L to 40L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "ts")
        .coalesce(1), graft.sources.ModTransform("k", 4))
    val dirsOf = () => graft.sources.HiddenPartitions.epochGroups(dst)
      .flatMap(_._3)
    val liveBefore = dirsOf().map { case (v, d) =>
      v -> Snapshots.liveFiles(d, Snapshots.currentVersion(d)).toSet }.toMap
    val mem = MemoryStream[(Long, String, Long)]
    val ckpt = Files.createTempDirectory("graft_conn_hidsink_ck").toString
    val q = mem.toDF().toDF("k", "payload", "ts")
      .writeStream.format("graft")
      .option("keyCol", "k").option("orderCol", "ts")
      .option("morWrites", "true")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      // updates land in residues 1 and 2; an insert opens nothing new
      // (residue 3 exists); two changes to k=5 resolve last-wins
      mem.addData((5L, "old5", 1L), (5L, "U5", 2L), (6L, "U6", 2L),
        (101L, "NEW", 2L))
      q.processAllAvailable()
      val df = spark.read.format("graft").load(dst)
      assert(df.count() == 41)
      val byK = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(byK(5L) == "U5" && byK(6L) == "U6" && byK(101L) == "NEW")
      assert(byK(7L) == "v7")
      // zero rewrites: every bootstrap file still live in its dir, the
      // touched residues carry DVs
      var dvDirs = 0
      dirsOf().foreach { case (v, d) =>
        val cur = Snapshots.currentVersion(d)
        assert(liveBefore(v).subsetOf(
          Snapshots.liveFiles(d, cur).toSet),
          s"dir $v retired a file under the hidden MoR sink")
        if (Snapshots.dvFiles(d, cur).nonEmpty) dvDirs += 1
      }
      assert(dvDirs == 2, s"expected DVs in residues 1 and 2, got $dvDirs")
      // second batch keeps streaming; replay guard holds versions exact
      mem.addData((8L, "U8", 3L))
      q.processAllAvailable()
      assert(spark.read.format("graft").load(dst)
        .filter(col("k") === 8L).head().getString(1) == "U8")
    } finally q.stop()
    // partitionBy on a hidden root refuses at start (the layout is
    // the table's own transform)
    val mem2 = MemoryStream[(Long, String, Long)]
    val ckpt2 = Files.createTempDirectory("graft_conn_hidsink_ck2").toString
    val err = intercept[IllegalArgumentException] {
      mem2.toDF().toDF("k", "payload", "ts")
        .writeStream.format("graft")
        .option("keyCol", "k").option("checkpointLocation", ckpt2)
        .partitionBy("payload")
        .start(dst)
    }
    assert(err.getMessage.contains("hidden-transform"))
  }

  test("r13 hidden medallion chain: hidden bronze streams through a " +
      "transform into a hidden silver with a DIFFERENT layout") {
    import spark.implicits._
    val bronze = Files.createTempDirectory("graft_conn_hmed_b").toString + "/t"
    val silver = Files.createTempDirectory("graft_conn_hmed_s").toString + "/t"
    graft.sources.HiddenPartitions.init(spark, bronze,
      (1L to 60L).map(k => (k, k * 10)).toDF("k", "amt").coalesce(1),
      graft.sources.ModTransform("k", 4))
    graft.sources.HiddenPartitions.init(spark, silver,
      Seq((0L, 0L, "seed")).toDF("k", "amt2", "change_note").limit(0)
        .unionByName(Seq((0L, 0L, "seed")).toDF("k", "amt2", "change_note")),
      graft.sources.BucketTransform("k", 8))
    val ckpt = Files.createTempDirectory("graft_conn_hmed_ck").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft").option("keyCol", "k")
        .load(bronze)
        .filter(col("change_type") =!= "delete")
        .select(col("k"), (col("amt") * 2).as("amt2"),
          concat(lit("b"), col("_commit_version")).as("change_note"))
        .writeStream.format("graft")
        .option("keyCol", "k").option("morWrites", "true")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(silver)
      assert(q.awaitTermination(120000), "chain drain did not terminate")
    }
    drain()
    val s1 = spark.read.format("graft").load(silver)
    assert(s1.count() == 61) // 60 snapshot rows + the seed
    assert(s1.filter(col("k") === 7L).head().getLong(1) == 140L)
    // a MoR wave on bronze flows through on the next drain
    graft.sources.HiddenPartitions.merge(spark, bronze,
      Seq((7L, 777L), (200L, 2000L)).toDF("k", "amt"), "k", mor = true)
    drain()
    val s2 = spark.read.format("graft").load(silver)
    assert(s2.count() == 62)
    val byK = s2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(7L) == 1554L && byK(200L) == 4000L)
    // the silver's own hidden layout is intact: 8 bucket dirs, hidden
    assert(s2.columns.toSeq == Seq("k", "amt2", "change_note"))
    assert(graft.sources.HiddenPartitions.epochGroups(silver)
      .flatMap(_._3).size <= 8)
  }
}
