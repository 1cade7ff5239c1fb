package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** A43 — session-catalog integration for the `graft` source: the DSv1
  * provider resolves by NAME through Spark's own DataSource machinery
  * (`CREATE TABLE … USING graft`, `spark.table`, `saveAsTable`,
  * `DESCRIBE`), reusing the manifest-planned HadoopFsRelation scan
  * unchanged — no DSv2 reimplementation of the scan path. The
  * SchemaRelationProvider overload makes the LOG the schema authority:
  * a catalog entry frozen before a widening commit keeps answering
  * under the live schema; an incompatible one refuses loudly.
  */
class CatalogSpec extends GraftSuite {

  private def freshDir(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cat").toString + "/t"
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "payload")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    dir
  }

  test("external table: CREATE TABLE USING graft, spark.table, SQL, DESCRIBE") {
    val dir = freshDir()
    Snapshots.init(spark, dir)
    spark.sql("DROP TABLE IF EXISTS cat_ext")
    spark.sql(s"CREATE TABLE cat_ext USING graft OPTIONS (path '$dir', keyCol 'k')")
    try {
      assert(spark.table("cat_ext").count() == 100)
      assert(spark.sql("SELECT count(*) FROM cat_ext").head().getLong(0) == 100)
      // DESCRIBE answers from the catalog entry
      val desc = spark.sql("DESCRIBE TABLE cat_ext").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(desc.get("k").contains("bigint") && desc.get("payload").contains("string"))
      // the scan is the SAME manifest-planned path as load-by-path:
      // stats pruning still applies through the name
      val pruned = spark.table("cat_ext").filter(col("k") <= 10L)
      pruned.collect()
      val scanned = pruned.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value }.sum
      assert(scanned == 1, s"expected 1 of 4 range files, scanned $scanned")
    } finally spark.sql("DROP TABLE IF EXISTS cat_ext")
  }

  test("append saveAsTable is a keyed merge via the STORED keyCol option") {
    import spark.implicits._
    val dir = freshDir()
    Snapshots.init(spark, dir) // v0
    spark.sql("DROP TABLE IF EXISTS cat_app")
    spark.sql(s"CREATE TABLE cat_app USING graft OPTIONS (path '$dir', keyCol 'k')")
    try {
      Seq((5L, "UP5"), (200L, "NEW")).toDF("k", "payload")
        .write.format("graft").mode("append").saveAsTable("cat_app")
      assert(Snapshots.currentVersion(dir) == 1) // a real commit, not files
      spark.catalog.refreshTable("cat_app")
      val t = spark.table("cat_app")
      assert(t.count() == 101)
      assert(t.filter(col("k") === 5L).head().getString(1) == "UP5")
      // and v0 stays time-travelable under the path API
      assert(Snapshots.read(spark, dir, 0).count() == 100)
    } finally spark.sql("DROP TABLE IF EXISTS cat_app")
  }

  test("managed CTAS: saveAsTable creates a VERSIONED table; overwrite is drop+recreate") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS cat_managed")
    Seq((1L, "a"), (2L, "b")).toDF("k", "payload")
      .write.format("graft").option("keyCol", "k").saveAsTable("cat_managed")
    try {
      val loc = Snapshots.canonical(
        spark.sql("DESCRIBE TABLE EXTENDED cat_managed")
          .filter(col("col_name") === "Location").head().getString(1))
      assert(Snapshots.currentVersion(loc) == 0, "managed table is not versioned")
      assert(spark.table("cat_managed").count() == 2)
      // overwrite saveAsTable follows SPARK's managed-table contract:
      // drop + recreate (fresh log at v0). History-preserving
      // overwrite is the PATH write (`.save(dir)`), which commits
      // INSERT OVERWRITE as a version — pinned in ConnectorSpec.
      Seq((3L, "c")).toDF("k", "payload")
        .write.format("graft").option("keyCol", "k")
        .mode("overwrite").saveAsTable("cat_managed")
      spark.catalog.refreshTable("cat_managed")
      assert(spark.table("cat_managed").collect().map(_.getLong(0)).toSeq == Seq(3L))
      val loc2 = Snapshots.canonical(
        spark.sql("DESCRIBE TABLE EXTENDED cat_managed")
          .filter(col("col_name") === "Location").head().getString(1))
      assert(Snapshots.currentVersion(loc2) == 0,
        "managed overwrite should recreate at v0 (Spark drop+recreate)")
    } finally spark.sql("DROP TABLE IF EXISTS cat_managed")
  }

  test("schema evolution: a widened table keeps answering by name; a wrong schema refuses") {
    import spark.implicits._
    val dir = freshDir()
    Snapshots.init(spark, dir)
    spark.sql("DROP TABLE IF EXISTS cat_evo")
    spark.sql(s"CREATE TABLE cat_evo USING graft OPTIONS (path '$dir', keyCol 'k')")
    try {
      Snapshots.mergeVersioned(spark, dir,
        Seq((200L, "NEW", 7L)).toDF("k", "payload", "extra"), "k")
      spark.catalog.refreshTable("cat_evo")
      val t = spark.table("cat_evo")
      assert(t.schema.fieldNames.toSeq == Seq("k", "payload", "extra"),
        "catalog read did not pick up the live (widened) schema")
      assert(t.count() == 101)
      assert(t.agg(sum(coalesce(col("extra"), lit(0L)))).head().getLong(0) == 7L)
    } finally spark.sql("DROP TABLE IF EXISTS cat_evo")

    // a catalog entry whose declared schema names a column the table
    // does not record refuses loudly with the fix (DROP + recreate)
    spark.sql("DROP TABLE IF EXISTS cat_bad")
    try {
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE cat_bad (k BIGINT, nope STRING) " +
          s"USING graft OPTIONS (path '$dir', keyCol 'k')")
        spark.table("cat_bad").collect()
      }
      assert(e.getMessage.contains("nope"), s"unhelpful refusal: ${e.getMessage}")
    } finally spark.sql("DROP TABLE IF EXISTS cat_bad")
  }

  test("A26×A43: partitioned table by NAME — directory pruning, stats pruning, version stability") {
    import spark.implicits._
    import graft.sources.PartitionedSnapshots
    val dir = Files.createTempDirectory("graft_cat_part").toString + "/t"
    val df = (1L to 1000L).map(k => (k, if (k % 2 == 0) "E" else "O", k % 7))
      .toDF("k", "st", "gen").repartitionByRange(4, col("k"))
    PartitionedSnapshots.init(spark, dir, df, "st")
    spark.sql("DROP TABLE IF EXISTS cat_part")
    spark.sql(s"CREATE TABLE cat_part USING graft " +
      s"OPTIONS (path '$dir', partitionCol 'st', keyCol 'k')")
    try {
      def scanned(q: org.apache.spark.sql.DataFrame): Long = {
        q.collect()
        q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numFiles").value }.sum
      }
      assert(spark.table("cat_part").count() == 1000)
      // NAME-form partition pruning: a partition predicate reads only
      // that partition's files — the same directory-level prune the
      // path form gets, through the catalog-resolved relation
      val allFiles = scanned(spark.table("cat_part"))
      val oneSide = scanned(spark.table("cat_part").filter(col("st") === "E"))
      assert(oneSide * 2 == allFiles,
        s"name-form partition pruning: $oneSide of $allFiles")
      // …then per-file manifest stats prune within the survivor
      val narrow = scanned(spark.table("cat_part")
        .filter(col("st") === "E" && col("k") <= 200L))
      assert(narrow < oneSide, s"name-form stats pruning: $narrow vs $oneSide")
      assert(spark.sql(
        "SELECT count(*) FROM cat_part WHERE st = 'E' AND k <= 200")
        .head().getLong(0) == 100)

      // a merge into ONE partition: the other partition's log keeps
      // its version (no cross-partition write amplification), and the
      // name answers fresh after a refresh
      val vO = Snapshots.currentVersion(PartitionedSnapshots.partitionDir(dir, "O"))
      PartitionedSnapshots.mergePartitioned(spark, dir,
        Seq((2L, "E", 99L)).toDF("k", "st", "gen"), "k", "st")
      assert(Snapshots.currentVersion(
        PartitionedSnapshots.partitionDir(dir, "O")) == vO,
        "untouched partition must not version-bump")
      spark.catalog.refreshTable("cat_part")
      assert(spark.sql("SELECT gen FROM cat_part WHERE k = 2")
        .head().getLong(0) == 99L)
    } finally spark.sql("DROP TABLE IF EXISTS cat_part")
  }

  test("INSERT INTO without the extensions fails loudly — never silent row loss") {
    val dir = freshDir()
    Snapshots.init(spark, dir)
    spark.sql("DROP TABLE IF EXISTS cat_guard")
    spark.sql(s"CREATE TABLE cat_guard USING graft OPTIONS (path '$dir', keyCol 'k')")
    try {
      // the shared session has NO graft extensions: Spark plans a raw
      // file insert that bypasses the snapshot log. The written rows
      // would be invisible to every read and reclaimed by vacuum —
      // the refresh() guard turns that silent loss into a hard error.
      val e = intercept[Exception] {
        spark.sql("INSERT INTO cat_guard VALUES (CAST(500 AS BIGINT), 'X')")
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
      assert(msgs(e).contains("snapshot log"), s"wrong failure: ${msgs(e)}")
      // nothing committed, reads unchanged
      assert(Snapshots.currentVersion(dir) == 0)
      assert(Snapshots.read(spark, dir).count() == 100)
      // the orphaned bytes the failed command left behind are exactly
      // what the vacuum sweep reclaims
      Snapshots.vacuum(dir, 0)
      assert(Snapshots.read(spark, dir).count() == 100)
    } finally spark.sql("DROP TABLE IF EXISTS cat_guard")
  }
}
