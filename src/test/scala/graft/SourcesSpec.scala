package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends GraftSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  test("csv and json round-trip the documents table losslessly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
    val dir = tmp()
    Sources.writeCsv(docs, s"$dir/csv")
    Sources.writeJson(docs, s"$dir/json")
    val csv = Sources.readCsv(spark, s"$dir/csv", docs.schema)
    val json = Sources.readJson(spark, s"$dir/json", docs.schema)
    val want = docs.collect().map(_.toSeq).toSet
    assert(csv.collect().map(_.toSeq).toSet == want)
    assert(json.collect().map(_.toSeq).toSet == want)
  }

  test("orc round-trips losslessly and pushes filters into the scan") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp()
    Sources.writeOrc(docs, s"$dir/orc")
    val back = Sources.readOrc(spark, s"$dir/orc")
    assert(back.collect().map(_.toSeq).toSet ==
      docs.collect().map(_.toSeq).toSet)
    // predicate pushdown + column pruning reach the ORC scan exactly
    // like parquet
    val q = back.filter(col("n_chars") > 500).select("doc_id", "n_chars")
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"), plan.take(800))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint"), plan.take(800))
  }

  test("partitioned parquet layout prunes partitions on read") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp()
    Sources.writePartitioned(docs, s"$dir/bylang", "lang")
    val one = Sources.readParquet(spark, s"$dir/bylang").filter(col("lang") === "en")
    assert(one.count() == docs.filter(col("lang") === "en").count())
    // the filter becomes a PartitionFilter on the scan (directory-level
    // pruning, no data files of other langs touched)
    val scanned = one.queryExecution.sparkPlan.toString
    assert(scanned.contains("PartitionFilters") && scanned.contains("lang"),
      scanned.take(800))
  }

  test("z_value matches a naive bit-interleave reference") {
    import graft.functions.Morton
    def naive(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (123456789L, 987654321L),
      (2147483646L, 2147483646L), (42L, 7L))
    for ((x, y) <- samples)
      assert(Morton.interleave(x, y) == naive(x, y), s"($x, $y)")
    assert(samples.forall { case (x, y) => Morton.interleave(x, y) >= 0 })
  }

  test("z-ordered layout clusters BOTH dimensions into narrow per-file ranges") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val dir = tmp() + "/zorder"
    Sources.writeZOrdered(orders, dir, "o_custkey", "o_orderkey", numFiles = 16)
    val back = Sources.readParquet(spark, dir)
    assert(back.count() == orders.count())
    // per-file spans: a z-range tile bounds both coordinates, so the
    // mean per-file span of EACH dimension must be well below the full
    // span (a single-column sort gives this for one dimension only)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 4, files.length.toString)
    def spans(colName: String): Seq[Long] = files.toSeq.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(colName).as("lo"), max(colName).as("hi")).head()
      r.getLong(1) - r.getLong(0)
    }
    def full(colName: String): Long = {
      val r = orders.agg(min(colName).as("lo"), max(colName).as("hi")).head()
      r.getLong(1) - r.getLong(0)
    }
    val custSpans = spans("o_custkey")
    val okeySpans = spans("o_orderkey")
    assert(custSpans.sum.toDouble / custSpans.length < 0.6 * full("o_custkey"),
      s"custkey spans $custSpans vs full ${full("o_custkey")}")
    assert(okeySpans.sum.toDouble / okeySpans.length < 0.6 * full("o_orderkey"),
      s"orderkey spans $okeySpans vs full ${full("o_orderkey")}")
  }

  test("file index + z-layout: range reads prune most files, results exact") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val dir = tmp() + "/zidx"
    Sources.writeZOrdered(orders, dir, "o_custkey", "o_orderkey", numFiles = 16)
    val idx = Sources.buildFileIndex(spark, dir, Seq("o_custkey", "o_orderkey"))
      .cache()
    val nFiles = idx.count()
    assert(nFiles >= 8)
    // narrow range query on EACH dimension: pruned result == full-scan
    // result, and the file list is a small fraction of the layout
    for (c <- Seq("o_custkey", "o_orderkey")) {
      val r = orders.agg(min(c), max(c)).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      // probe a narrow band away from the z-curve's half-way boundary
      // (file ranges cluster their endpoints exactly there)
      val qLo = lo + (hi - lo) * 11 / 20
      val qHi = qLo + (hi - lo) / 50
      val pruned = Sources.readPruned(spark, dir, idx, c, qLo, qHi)
      val full = spark.read.parquet(dir).filter(col(c) >= qLo && col(c) <= qHi)
      assert(pruned.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet)
      val touched = idx.filter(
        !(col(s"${c}_max") < qLo || col(s"${c}_min") > qHi)).count()
      assert(touched < nFiles / 2,
        s"$c: touched $touched of $nFiles files for a 2% range")
    }
    idx.unpersist()
  }

  test("schema evolution on read: widened files merge, old files null-fill (A19)") {
    import spark.implicits._
    val dir = tmp() + "/evolving"
    // generation 1: (k, a); generation 2 adds column b
    Seq((1L, "x"), (2L, "y")).toDF("k", "a")
      .write.parquet(dir)
    Seq((3L, "z", 30L), (4L, "w", 40L)).toDF("k", "a", "b")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    // unified schema, old rows null-filled in the new column
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "k"))
    val byK = merged.collect().map(r => r.getAs[Long]("k") ->
      (if (r.isNullAt(r.fieldIndex("b"))) None else Some(r.getAs[Long]("b")))).toMap
    assert(byK(1L).isEmpty && byK(2L).isEmpty)
    assert(byK(3L).contains(30L) && byK(4L).contains(40L))
    // predicates on the NEW column still push into the scan
    val plan = merged.filter(col("b") > 35).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(b,35)"),
      plan.take(400))
    assert(merged.filter(col("b") > 35).count() == 1)
  }

  test("layout sink: partition dirs, per-file row cap, in-file sort order") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val dir = tmp()
    Sources.writeLayout(docs, s"$dir/layout", "lang", Seq("n_chars", "doc_id"), 100L)
    val root = new java.io.File(s"$dir/layout")
    val partDirs = root.listFiles().filter(_.getName.startsWith("lang="))
    assert(partDirs.nonEmpty)
    // nothing lost, partition pruning intact
    val back = Sources.readParquet(spark, s"$dir/layout")
    assert(back.count() == docs.count())
    partDirs.foreach { pd =>
      pd.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val rows = spark.read.parquet(f.getAbsolutePath)
          .select("n_chars", "doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        // cap respected and rows arrive in (n_chars, doc_id) order —
        // the property parquet min/max row-group pruning feeds on
        assert(rows.length <= 100, s"${f.getName}: ${rows.length} rows")
        assert(rows.sameElements(rows.sorted), s"${f.getName} not sorted")
      }
    }
  }
}
