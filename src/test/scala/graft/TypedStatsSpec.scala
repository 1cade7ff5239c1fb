package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** r12 — TYPED per-file manifest stats (timestamp / date / decimal /
  * string) across the whole consumer stack: file skipping, merge
  * key-range discovery, metadata-only aggregates, and the string
  * truncated-prefix encoding's soundness edges.
  */
class TypedStatsSpec extends GraftSuite {
  import spark.implicits._

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("string stat encoding: exact, truncated min/max, and the 0xFF sentinel") {
    // short strings round-trip exactly
    val enc = Snapshots.encodeStringStat("hello", isMax = true)
    assert(Snapshots.decodeStringStat(enc).exists { case (b, exact) =>
      exact && new String(b, "UTF-8") == "hello" })
    // a >64-byte MIN truncates to the raw prefix (≤ the original)
    val long = "a" * 100
    val mnB = Snapshots.decodeStringStat(
      Snapshots.encodeStringStat(long, isMax = false)).get
    assert(!mnB._2 && mnB._1.length == 64 &&
      new String(mnB._1, "UTF-8") == "a" * 64)
    // a >64-byte MAX increments its last byte: strictly greater than
    // EVERY string sharing the prefix
    val mxB = Snapshots.decodeStringStat(
      Snapshots.encodeStringStat(long, isMax = true)).get
    assert(!mxB._2 && mxB._1.length == 64 && mxB._1(63) == 'b'.toByte)
    // the '*' sentinel decodes as "no upper bound" (valid UTF-8 never
    // yields 0xFF bytes, so the encoder can't emit it from a real
    // string — it exists for defensive decode completeness)
    assert(Snapshots.decodeStringStat("*").isEmpty)
    // empty string is a legal exact bound
    assert(Snapshots.decodeStringStat(
      Snapshots.encodeStringStat("", isMax = false))
      .exists { case (b, exact) => exact && b.isEmpty })
  }

  test("timestamp stats skip files; the pruned file can be gone from disk") {
    val dir = Files.createTempDirectory("graft_tstats").toString + "/t"
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(
      base.getTime + d.toLong * 86400000L)
    // three EXPLICITLY disjoint one-file slices (range partitioning
    // samples; its boundaries are not day-exact)
    (0 until 30).map(d => (d.toLong, ts(d))).toDF("k", "ts")
      .coalesce(1).write.parquet(dir)
    (30 until 60).map(d => (d.toLong, ts(d))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    (60 until 90).map(d => (d.toLong, ts(d))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    Snapshots.init(spark, dir)
    // typed 'T' tags recorded as exact micros
    val st = Snapshots.fileStats(dir, 0)
    assert(st.values.forall(_.get("ts").exists(_._1 == "T")))
    // a ts >= cut predicate keeps only the late slice
    val cut = ts(60)
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("ts") >= lit(cut))) == 1)
    // delete the earliest file from disk: the filtered read still answers
    val doomed = Snapshots.liveFiles(dir, 0).map(Snapshots.canonical)
      .find(f => st(f).get("ts").exists(_._3.toLong <
        cut.getTime * 1000L)).get
    Files.delete(Paths.get(doomed))
    val n = spark.read.format("graft").load(dir)
      .filter(col("ts") >= lit(cut)).count()
    assert(n == 30, s"expected 30 late rows, got $n")
  }

  test("date and decimal stats prune through the compat planFiles path") {
    import org.apache.spark.sql.{sources => sfs}
    val dir = Files.createTempDirectory("graft_dstats").toString + "/t"
    // three explicitly disjoint one-file month slices
    (1 to 3).foreach { m =>
      (1 to 28).map { d =>
        (java.sql.Date.valueOf(f"2024-$m%02d-$d%02d"),
          new java.math.BigDecimal((m - 1) * 28 + d).movePointLeft(2))
      }.toDF("dt", "amt")
        .select(col("dt"), col("amt").cast("decimal(10,2)").as("amt"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    Snapshots.init(spark, dir)
    val st = Snapshots.fileStats(dir, 0)
    assert(st.values.forall(m => m.get("dt").exists(_._1 == "A") &&
      m.get("amt").exists(_._1 == "C")))
    val byDate = graft.sources.GraftCompatRelation.planFiles(dir, 0,
      Array(sfs.GreaterThanOrEqual("dt", java.sql.Date.valueOf("2024-03-01"))))
    assert(byDate.size == 1, s"date prune kept ${byDate.size} of 3")
    // amt < 0.35: only month 1 holds 0.01..0.28 (month 2 starts 0.29)
    val byDec = graft.sources.GraftCompatRelation.planFiles(dir, 0,
      Array(sfs.LessThan("amt", new java.math.BigDecimal("0.29"))))
    assert(byDec.size == 1, s"decimal prune kept ${byDec.size} of 3")
  }

  test("string stats prune equality and ranges; truncation never unsound") {
    val dir = Files.createTempDirectory("graft_sstats").toString + "/t"
    // three disjoint prefix slices, PLUS >64-byte strings in the last
    // slice so its max is truncated-incremented
    Seq(
      (1 to 30).map(i => f"alpha-$i%03d"),
      (1 to 30).map(i => f"mike-$i%03d"),
      (1 to 30).map(i => "zulu-" + ("z" * 80) + f"-$i%03d")
    ).foreach { slice =>
      slice.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("k", "s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    Snapshots.init(spark, dir)
    // equality probe opens one slice
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("s") === "mike-015")) == 1)
    // range probe: everything >= "n" is only the zulu slice
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("s") >= "n")) == 1)
    // soundness at the truncation horizon: every long string still found
    val z = spark.read.format("graft").load(dir)
      .filter(col("s") === ("zulu-" + ("z" * 80) + "-001"))
    assert(z.count() == 1)
    // and the truncated max still prunes strings ABOVE the widened
    // bound (the incremented 64-byte prefix starts "zulu-z…", < "zz")
    assert(spark.read.format("graft").load(dir)
      .filter(col("s") >= "zz").count() == 0)
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("s") >= "zz")) == 0)
    // r12: LIKE 'mike%' (StartsWith) prunes to the one prefix slice
    assert(scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("s").startsWith("mike"))) == 1)
    assert(spark.read.format("graft").load(dir)
      .filter(col("s").startsWith("mike")).count() == 30)
    // a prefix matching the TRUNCATED slice still finds every row
    assert(spark.read.format("graft").load(dir)
      .filter(col("s").startsWith("zulu-")).count() == 30)
  }

  test("metadata-only min/max/count of timestamp answers with a file gone") {
    val se = graft.plans.GraftSessions.withExtensions(spark)
    val dir = Files.createTempDirectory("graft_tmeta").toString + "/t"
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(base.getTime + d.toLong * 3600000L)
    (0 until 48).map(h => (h.toLong, ts(h))).toDF("k", "ts")
      .repartitionByRange(2, col("ts")).write.parquet(dir)
    Snapshots.init(se, dir)
    Files.delete(Paths.get(
      Snapshots.liveFiles(dir, 0).map(Snapshots.canonical).head))
    val r = se.read.format("graft").load(dir)
      .agg(count(lit(1)).as("n"), min("ts").as("mn"), max("ts").as("mx"))
      .head()
    assert(r.getLong(0) == 48)
    assert(r.getTimestamp(1) == ts(0) && r.getTimestamp(2) == ts(47))
  }

  test("metadata-only min/max of strings: exact serves, truncated bails") {
    val se = graft.plans.GraftSessions.withExtensions(spark)
    val dir = Files.createTempDirectory("graft_smeta").toString + "/t"
    Seq((1L, "apple"), (2L, "pear"), (3L, "kiwi")).toDF("k", "s")
      .coalesce(1).write.parquet(dir)
    Snapshots.init(se, dir)
    Files.delete(Paths.get(
      Snapshots.liveFiles(dir, 0).map(Snapshots.canonical).head))
    // exact bounds answer from the manifest (file is GONE — a scan dies)
    val r = se.read.format("graft").load(dir)
      .agg(min("s").as("mn"), max("s").as("mx")).head()
    assert(r.getString(0) == "apple" && r.getString(1) == "pear")
    // truncated bounds must NOT answer (the stored prefix is not the
    // true min): the rewrite bails to the scan, which fails loudly on
    // the missing file rather than serving a wrong prefix
    val dir2 = Files.createTempDirectory("graft_smeta2").toString + "/t"
    Seq((1L, "long-" + ("x" * 100))).toDF("k", "s")
      .coalesce(1).write.parquet(dir2)
    Snapshots.init(se, dir2)
    Files.delete(Paths.get(
      Snapshots.liveFiles(dir2, 0).map(Snapshots.canonical).head))
    intercept[Exception] {
      se.read.format("graft").load(dir2).agg(min("s")).head()
    }
  }

  test("merge and keyed delete discover files through typed key ranges") {
    // STRING key: three prefix slices; a merge touching only 'mike'
    // keys must rewrite only that file (exact short-string bounds)
    val dir = Files.createTempDirectory("graft_skey").toString + "/t"
    val rows = (1 to 20).map(i => (f"alpha-$i%03d", i.toLong)) ++
      (1 to 20).map(i => (f"mike-$i%03d", i.toLong)) ++
      (1 to 20).map(i => (f"zulu-$i%03d", i.toLong))
    rows.toDF("id", "v").repartitionByRange(3, col("id")).write.parquet(dir)
    Snapshots.init(spark, dir)
    val before = Snapshots.liveFiles(dir, 0).map(Snapshots.canonical).toSet
    Snapshots.mergeVersioned(spark, dir,
      Seq(("mike-005", 999L)).toDF("id", "v"), "id")
    val after = Snapshots.liveFiles(dir, 1).map(Snapshots.canonical).toSet
    // exactly one original file was rewritten
    assert((before -- after).size == 1,
      s"merge rewrote ${(before -- after).size} files, expected 1")
    val got = Snapshots.read(spark, dir)
    assert(got.filter(col("id") === "mike-005").head().getLong(1) == 999L)
    assert(got.count() == 60)

    // TIMESTAMP key: keyed DV delete probes via micros ranges
    val dir2 = Files.createTempDirectory("graft_tkey").toString + "/t"
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(base.getTime + d.toLong * 60000L)
    (0 until 30).map(m => (ts(m), m.toLong)).toDF("t", "v")
      .repartitionByRange(3, col("t")).write.parquet(dir2)
    Snapshots.init(spark, dir2)
    Snapshots.deleteVersionedKeysDV(spark, dir2,
      Seq(ts(7)).toDF("t"), "t")
    assert(Snapshots.read(spark, dir2).count() == 29)
    // only ONE file took a DV (the other slices were never touched)
    assert(Snapshots.read(spark, dir2)
      .filter(col("t") === lit(ts(7))).isEmpty)
  }

  test("zorder by (string, numeric): string-side equality prunes a slab") {
    val dir = Files.createTempDirectory("graft_zstr").toString + "/t"
    val cats = Seq("DE", "FR", "IT", "JP", "US")
    (1 to 5000).map(i => (cats(i % 5), i.toLong)).toDF("country", "k")
      .repartition(8).write.parquet(dir)
    Snapshots.init(spark, dir)
    Snapshots.compactZOrderCols(spark, dir, Seq("country", "k"), 16)
    // a single-country probe must open a minority of the 16 z-files —
    // Morton interleaving scatters one country value across ~sqrt of
    // the z-range, so the bar is "well under all", not the numeric
    // gates' 2% slab (5 categories × 10-bit interleave ≈ 9/16 measured)
    val opened = scannedFiles(spark.read.format("graft").load(dir)
      .filter(col("country") === "JP"))
    assert(opened <= 10, s"string z-dim pruned nothing: $opened of 16")
    assert(spark.read.format("graft").load(dir)
      .filter(col("country") === "JP").count() == 1000)
  }

  test("string bloom index: point probe opens at most 3 of 8 files") {
    val dir = Files.createTempDirectory("graft_sbloom").toString + "/t"
    (1L to 40000L).map(i => (i, s"user-${(i * 2654435761L) % 1000003L}"))
      .toDF("k", "uid")
      .repartitionByRange(8, col("k")).write.parquet(dir)
    Snapshots.init(spark, dir)
    Snapshots.addBloomIndex(spark, dir, "uid")
    val present = s"user-${(123L * 2654435761L) % 1000003L}"
    val looked = Snapshots.readPointLookup(spark, dir, "uid", present)
    assert(looked.count() >= 1)
    val scans = looked.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    val opened = scans.map(_.metrics("numFiles").value).sum
    assert(opened <= 3, s"string bloom skipped nothing: $opened of 8")
    // absent value: zero rows (usually zero files)
    assert(Snapshots.readPointLookup(spark, dir, "uid", "user-absent")
      .count() == 0)
  }

  test("CBO catalog stats survive string columns (no range, NDV-capable)") {
    // regression: columnStats used to BigDecimal-parse every recorded
    // range — a base64 'S' bound would throw and break stats for the
    // whole table; now strings contribute nullCount only
    val dir = Files.createTempDirectory("graft_scbo").toString + "/t"
    Seq((1L, "x"), (2L, "y"), (3L, null.asInstanceOf[String]))
      .toDF("k", "s").coalesce(1).write.parquet(dir)
    Snapshots.init(spark, dir)
    val cs = graft.sources.GraftStats.catalogStats(dir, 0)
    assert(cs.isDefined)
    assert(cs.get.rowCount.contains(BigInt(3)))
    val sStat = cs.get.colStats.get("s")
    assert(sStat.isDefined && sStat.get.min.isEmpty && sStat.get.max.isEmpty)
    assert(sStat.get.nullCount.contains(BigInt(1)))
    // the numeric column still carries its range
    val kStat = cs.get.colStats.get("k")
    assert(kStat.exists(st => st.min.contains("1") && st.max.contains("3")))
  }
}
