package graft

import org.apache.spark.sql.functions._
import graft.sources.{Merge, Sources}

/** Copy-on-write MERGE: correctness of the upsert AND physical
  * minimality of the rewrite (untouched files stay byte-identical).
  */
class MergeSpec extends GraftSuite {

  test("mergeInto: upsert semantics, file-pruned rewrite, untouched files intact") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_spec")
      .toString + "/t"
    // key-clustered layout: narrow per-file key ranges = prunable merge
    Sources.writeZOrdered(orders, dir, "o_orderkey", "o_orderkey", numFiles = 16)
    val before = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val filesBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap

    // 3 updates to existing adjacent keys + 2 brand-new keys
    val existing = before.keys.toSeq.sorted.take(3)
    val updates = (existing.map(k => (k, 999L, 1.5)) ++
      Seq((9000001L, 999L, 2.5), (9000002L, 999L, 3.5)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val stats = Merge.mergeInto(spark, dir, updates, "o_orderkey")

    // upsert semantics, checked row for row against a reference map
    val want = before ++ (existing.map(_ -> ((999L, 1.5))) ++
      Seq(9000001L -> ((999L, 2.5)), 9000002L -> ((999L, 3.5)))).toMap
    val got = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)

    // physical minimality: few files rewritten, the rest untouched on disk
    assert(stats.filesTotal == 16)
    assert(stats.filesRewritten < 8, stats.toString)
    assert(stats.rowsUpdated == 3 && stats.rowsInserted == 2)
    val filesAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val survivors = filesBefore.keySet.intersect(filesAfter.keySet)
    assert(survivors.size == 16 - stats.filesRewritten)
    for (f <- survivors)
      assert(filesAfter(f) == filesBefore(f), s"$f was rewritten in place")
  }

  test("streaming upsert sink: change stream merges into a current snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_spec")
      .toString + "/t"
    Sources.writeZOrdered(orders, dir, "o_orderkey", "o_orderkey", numFiles = 8)
    val before = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val k1 = before.keys.min

    // (key, cust, price, seq): seq orders changes within a batch
    val changes = MemoryStream[(Long, Long, Double, Long)]
    val q = graft.streaming.UpsertSink.start(
      changes.toDF().toDF("o_orderkey", "o_custkey", "o_totalprice", "seq")
        .select("o_orderkey", "o_custkey", "o_totalprice", "seq"),
      dir, "o_orderkey", "seq")
    try {
      // batch 1: two changes to the same key (later seq must win) + an insert
      changes.addData((k1, 1L, 10.0, 1L), (k1, 2L, 20.0, 2L), (8000001L, 3L, 30.0, 1L))
      q.processAllAvailable()
      // batch 2: update the row batch 1 inserted
      changes.addData((8000001L, 4L, 40.0, 2L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(dir)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = before + (k1 -> ((2L, 20.0))) + (8000001L -> ((4L, 40.0)))
    assert(got == want)
  }

  test("deleteWhere: predicate rows gone, file-pruned rewrite, untouched files intact") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_del_spec")
      .toString + "/t"
    Sources.writeZOrdered(orders, dir, "o_orderkey", "o_orderkey", numFiles = 16)
    val before = spark.read.parquet(dir).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val filesBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap

    // delete a narrow contiguous key band: on the key-clustered layout
    // only the files covering it are rewritten
    val keys = before.toSeq.sorted
    val (lo, hi) = (keys(keys.length / 4), keys(keys.length / 4 + keys.length / 20))
    val stats = Merge.deleteWhere(spark, dir,
      col("o_orderkey") >= lo && col("o_orderkey") <= hi)

    val expectGone = before.filter(k => k >= lo && k <= hi)
    val got = spark.read.parquet(dir).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    assert(got == before -- expectGone)
    assert(stats.rowsDeleted == expectGone.size && stats.rowsDeleted > 0)
    assert(stats.filesTotal == 16 && stats.filesRewritten < 8, stats.toString)
    val filesAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val survivors = filesBefore.keySet.intersect(filesAfter.keySet)
    assert(survivors.size == 16 - stats.filesRewritten)
    survivors.foreach(f => assert(filesBefore(f) == filesAfter(f), s"$f rewritten"))

    // a no-match predicate is a physical no-op
    val noop = Merge.deleteWhere(spark, dir, col("o_orderkey") === -1L)
    assert(noop.filesRewritten == 0 && noop.rowsDeleted == 0)
  }

  test("delete keeps NULL-predicate rows even in files holding a TRUE match") {
    import spark.implicits._
    // One file only, so every null-comment row shares a file with a
    // TRUE-match row — the layout where filter(!pred) used to silently
    // delete them (NOT(null) is null). SQL DELETE keeps them.
    val rows = Seq(
      (1L, Some("drop me")), (2L, Some("keep")),
      (3L, None: Option[String]), (4L, None: Option[String]))
      .toDF("k", "comment")
    val dir = java.nio.file.Files.createTempDirectory("graft_del_null")
      .toString + "/t"
    rows.repartition(1).write.parquet(dir)
    val stats = Merge.deleteWhere(spark, dir, col("comment") === "drop me")
    assert(stats.rowsDeleted == 1L, stats.toString)
    assert(spark.read.parquet(dir).select("k").as[Long].collect().toSet ==
      Set(2L, 3L, 4L))

    // same semantics through the versioned log
    val dir2 = java.nio.file.Files.createTempDirectory("graft_del_null_v")
      .toString + "/t"
    rows.repartition(1).write.parquet(dir2)
    graft.sources.Snapshots.init(spark, dir2)
    val v1 = graft.sources.Snapshots.deleteVersioned(spark, dir2,
      col("comment") === "drop me")
    assert(graft.sources.Snapshots.read(spark, dir2, v1)
      .select("k").as[Long].collect().toSet == Set(2L, 3L, 4L))
  }

  test("mergeInto with only-new keys touches zero files") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_spec2")
      .toString + "/t"
    Sources.writeZOrdered(orders, dir, "o_orderkey", "o_orderkey", numFiles = 8)
    val n0 = spark.read.parquet(dir).count()
    val updates = Seq((9100001L, 1L, 1.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val stats = Merge.mergeInto(spark, dir, updates, "o_orderkey")
    assert(stats.filesRewritten == 0)
    assert(stats.rowsUpdated == 0 && stats.rowsInserted == 1)
    assert(spark.read.parquet(dir).count() == n0 + 1)
  }
}
