package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{MergeWhen, Snapshots}

/** A59 — type widening: `widenColumn` as a metadata-only commit,
  * widening reads over MIXED physical files, time travel serving the
  * pre-widening type, MERGE WITH SCHEMA EVOLUTION widening instead of
  * down-casting, pruning still sound after the widening, and the
  * refusal matrix (narrowing, incompatible, unknown column).
  */
class TypeWideningSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_widen").toString

  test("widenColumn is metadata-only; mixed files read wide; time " +
      "travel serves the old type") {
    import spark.implicits._
    val p = tmp()
    (1 to 100).map(k => (k.toLong, k * 10, k / 10.0f))
      .toDF("k", "qty", "ratio").write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p)
    assert(Snapshots.read(spark, p).schema("qty").dataType == IntegerType)
    val pre = Snapshots.liveFiles(p, 0).map(Snapshots.canonical)
    val v1 = Snapshots.widenColumn(spark, p, "qty", LongType)
    val v2 = Snapshots.widenColumn(spark, p, "ratio", DoubleType)
    // metadata-only: the live file set is IDENTICAL (no data movement)
    assert(Snapshots.liveFiles(p, v2).map(Snapshots.canonical) == pre)
    val widened = Snapshots.read(spark, p)
    assert(widened.schema("qty").dataType == LongType)
    assert(widened.schema("ratio").dataType == DoubleType)
    // values unchanged through the widening
    assert(widened.agg(sum("qty")).head.getLong(0) == 50500L)
    // append rows that cannot fit the OLD type → mixed physical files
    Snapshots.appendVersioned(spark, p,
      Seq((1000L, 8000000000L, 1.25)).toDF("k", "qty", "ratio"))
    val mixed = Snapshots.read(spark, p)
    assert(mixed.count() == 101)
    assert(mixed.agg(sum("qty")).head.getLong(0) == 50500L + 8000000000L)
    // time travel: the pre-widening version serves the OLD types
    val old = Snapshots.read(spark, p, 0)
    assert(old.schema("qty").dataType == IntegerType)
    assert(old.schema("ratio").dataType == FloatType)
    assert(old.count() == 100)
    // version v1 has qty wide but ratio still narrow
    assert(Snapshots.read(spark, p, v1).schema("ratio").dataType == FloatType)
  }

  test("refusals: narrowing, non-lattice, unknown column") {
    import spark.implicits._
    val p = tmp()
    Seq((1L, 10, "x")).toDF("k", "qty", "s").write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p)
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, p, "qty", ShortType) // narrowing
    }
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, p, "s", LongType) // string → long
    }
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, p, "nope", LongType)
    }
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, p, "k", DoubleType) // long → double: not served
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION widens instead of down-casting; " +
      "without evolution the SET still casts to the declared type") {
    import MergeWhen._
    import spark.implicits._
    val p = tmp()
    (1 to 50).map(k => (k.toLong, k)).toDF("k", "qty")
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p)
    // WITHOUT evolution: the long assignment casts down to int
    Snapshots.mergeVersionedClauses(spark, p,
      Seq((1L, 0L)).toDF("k", "ignored"), "k",
      Seq(MatchedUpdate(None, Seq("qty" -> lit(7L)))))
    assert(Snapshots.read(spark, p).schema("qty").dataType == IntegerType)
    // WITH evolution: the same shape widens the column, and the value
    // that cannot fit an int survives exactly
    Snapshots.mergeVersionedClauses(spark, p,
      Seq((2L, 0L), (999L, 0L)).toDF("k", "ignored"), "k",
      Seq(
        MatchedUpdate(None, Seq("qty" -> lit(9000000000L))),
        NotMatchedInsert(None, Seq("k" -> src("k"),
          "qty" -> lit(8000000000L)))),
      evolveSchema = true)
    val after = Snapshots.read(spark, p)
    assert(after.schema("qty").dataType == LongType)
    assert(after.filter(col("k") === 2L).head.getLong(1) == 9000000000L)
    assert(after.filter(col("k") === 999L).head.getLong(1) == 8000000000L)
    // untouched rows kept their values (read wide from narrow files)
    assert(after.filter(col("k") === 10L).head.getLong(1) == 10L)
    // time travel to the pre-widening merge still serves int
    assert(Snapshots.read(spark, p, 1).schema("qty").dataType == IntegerType)
  }

  test("widening merge on a CDF-enabled table: pre-images lift to the " +
      "widened type and the feed stays exact") {
    import MergeWhen._
    import spark.implicits._
    val p = tmp()
    (1 to 20).map(k => (k.toLong, k)).toDF("k", "qty")
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p, changeDataFeed = true)
    // the widening merge: pre-image rows carry the OLD int values —
    // they must lift to long or the __pre/__post struct compare (and
    // the stored-CDF union) breaks on mismatched field types
    Snapshots.mergeVersionedClauses(spark, p,
      Seq((2L, 0L), (999L, 0L)).toDF("k", "ignored"), "k",
      Seq(
        MatchedUpdate(None, Seq("qty" -> lit(9000000000L))),
        NotMatchedInsert(None, Seq("k" -> src("k"),
          "qty" -> lit(8000000000L)))),
      evolveSchema = true)
    val feed = Snapshots.changesCdf(spark, p, 0, 1, "k")
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L), s"got $byType")
    // the pre-image carries the OLD value, readable under the new type
    val pre = feed.filter(col("_change_type") === "update_preimage")
      .select("qty").head()
    assert(pre.getLong(0) == 2L)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select("qty").head().getLong(0) == 9000000000L)
  }

  test("stats pruning stays sound across the widening (filters on the " +
      "widened column over mixed files)") {
    import spark.implicits._
    val p = tmp()
    (1 to 1000).map(k => (k.toLong, k)).toDF("k", "qty")
      .repartitionByRange(4, col("qty"))
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p)
    Snapshots.widenColumn(spark, p, "qty", LongType)
    Snapshots.appendVersioned(spark, p,
      Seq((5000L, 9000000000L)).toDF("k", "qty"))
    val df = spark.read.format("graft").load(p)
    // a point beyond int range only the NEW file can hold
    assert(df.filter(col("qty") === 9000000000L).count() == 1)
    // an int-era point, pruned via stats written when qty was int
    assert(df.filter(col("qty") === 500L).count() == 1)
    assert(df.filter(col("qty") < 10L).count() == 9)
    assert(df.count() == 1001)
  }

  test("r12 ADD COLUMN: metadata-only, null-fill on read, time travel " +
      "serves the old schema, duplicate refuses") {
    import spark.implicits._
    val p = tmp()
    (1 to 10).map(k => (k.toLong, s"v$k")).toDF("k", "payload")
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p) // v0
    val before = Snapshots.liveFiles(p, 0)
    Snapshots.addColumn(spark, p, "score", DoubleType) // v1, zero movement
    assert(Snapshots.liveFiles(p, 1) == before, "ADD COLUMN moved data")
    val df = Snapshots.read(spark, p)
    assert(df.schema("score").dataType == DoubleType &&
      df.schema("score").nullable)
    assert(df.filter(col("score").isNull).count() == 10) // null-fill (A19)
    // post-ADD writes carry real values; old rows stay NULL
    Snapshots.mergeVersioned(spark, p,
      Seq((100L, "new", 0.9)).toDF("k", "payload", "score"), "k")
    val now = Snapshots.read(spark, p)
    assert(now.filter(col("score").isNotNull).count() == 1)
    assert(now.count() == 11)
    // time travel to v0 serves the OLD schema
    assert(!Snapshots.read(spark, p, version = 0)
      .schema.fieldNames.contains("score"))
    intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, p, "payload", DoubleType)
    }
  }

  test("r12 GRAFT ADD COLUMN over SQL, parameterized type") {
    import spark.implicits._
    val p = tmp()
    (1 to 5).map(k => (k.toLong, k)).toDF("k", "qty")
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p)
    val parsed = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser)
      .parsePlan(s"GRAFT ADD COLUMN price DECIMAL(10, 2) '$p'")
    org.apache.spark.sql.GraftSqlInternals.ofRows(spark, parsed).collect()
    assert(Snapshots.read(spark, p).schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
  }

  test("r12 GRAFT RENAME COLUMN / DROP COLUMN over SQL, metadata-only") {
    import spark.implicits._
    val p = tmp()
    (1 to 5).map(k => (k.toLong, s"v$k", k)).toDF("k", "payload", "qty")
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p) // v0
    val before = Snapshots.liveFiles(p, 0)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    def run(sql: String) = org.apache.spark.sql.GraftSqlInternals
      .ofRows(spark, parser.parsePlan(sql)).collect()
    run(s"GRAFT RENAME COLUMN payload TO body '$p'") // v1
    run(s"GRAFT DROP COLUMN qty '$p'")               // v2
    assert(Snapshots.liveFiles(p, 2) == before, "metadata verb moved data")
    val now = Snapshots.read(spark, p)
    assert(now.schema.fieldNames.toSeq == Seq("k", "body"))
    assert(now.filter(col("body") === "v3").count() == 1) // bytes served
    // time travel: v0 still shows the original names
    assert(Snapshots.read(spark, p, version = 0)
      .schema.fieldNames.toSeq == Seq("k", "payload", "qty"))
  }

  test("GRAFT WIDEN over SQL") {
    import spark.implicits._
    val p = tmp()
    (1 to 10).map(k => (k.toLong, k)).toDF("k", "qty")
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p)
    // the shared test session has no injected parser; route through a
    // parser instance directly (the LakeSqlSpec ext-session covers the
    // wired path)
    val parsed = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser)
      .parsePlan(s"GRAFT WIDEN '$p' COLUMN qty TO bigint")
    org.apache.spark.sql.GraftSqlInternals.ofRows(spark, parsed).collect()
    assert(Snapshots.read(spark, p).schema("qty").dataType == LongType)
  }
}
