package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{MergeWhen, Snapshots}
import graft.sources.MergeWhen._

/** A52 — full conditional MERGE ([[Snapshots.mergeVersionedClauses]]):
  * first-match-wins guarded clauses, partial SET with pre-image
  * semantics, conditional inserts, NOT MATCHED BY SOURCE update/
  * delete, exact CDF, stats-pruned touched sets, and the refusals.
  */
class MergeClausesSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_mclause").toString

  private def ordersDf = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  // source: the %4==0 slice (matched) with a bumped/dropped price,
  // plus fresh +90M keys (not matched)
  private def sourceDf = ordersDf.filter(col("o_orderkey") % 4 === 0)
    .select(col("o_orderkey"),
      (col("o_totalprice") + when(col("o_orderkey") % 8 === 0, 500.0)
        .otherwise(-500.0)).as("price2"))
    .unionByName(ordersDf.filter(col("o_orderkey") % 4 === 1)
      .select((col("o_orderkey") + 90000000L).as("o_orderkey"),
        col("o_totalprice").as("price2")))

  private val clauses = Seq(
    MatchedUpdate(Some(src("price2") > col("o_totalprice")),
      Seq("o_totalprice" -> src("price2"))),
    MatchedDelete(None),
    NotMatchedInsert(Some(src("price2") < lit(100000.0)),
      Seq("o_orderkey" -> src("o_orderkey"), "o_custkey" -> lit(-1L),
        "o_orderstatus" -> lit("N"), "o_totalprice" -> src("price2"))),
    BySourceUpdate(Some(col("o_totalprice") < 1000.0),
      Seq("o_orderstatus" -> lit("Z"))),
    BySourceDelete(Some(col("o_totalprice") > 500000.0)))

  /** The same semantics computed independently with plain DataFrame
    * ops over the base tables. */
  private def expected: DataFrame = {
    val matchedKeys = ordersDf.filter(col("o_orderkey") % 4 === 0)
    val updated = matchedKeys.filter(col("o_orderkey") % 8 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 500.0)
    // %8 != 0 matched rows: price2 < price → second clause deletes
    val tOnly = ordersDf.filter(col("o_orderkey") % 4 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_totalprice") < 1000.0, "Z").otherwise(col("o_orderstatus")))
      .filter(!(col("o_totalprice") >= 1000.0 &&
        col("o_totalprice") > 500000.0))
    val inserted = ordersDf.filter(col("o_orderkey") % 4 === 1)
      .filter(col("o_totalprice") < 100000.0)
      .select((col("o_orderkey") + 90000000L).as("o_orderkey"),
        lit(-1L).as("o_custkey"), lit("N").as("o_orderstatus"),
        col("o_totalprice"))
    updated.unionByName(tOnly).unionByName(inserted)
  }

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "row multiset mismatch:\n got-extra: " +
        got.exceptAll(want).take(5).mkString("; ") +
        "\n want-extra: " + want.exceptAll(got).take(5).mkString("; "))
  }

  test("all five clause kinds compose, first-match-wins, ANSI guards") {
    val p = tmp()
    Snapshots.overwriteVersioned(spark, p, ordersDf)
    val v = Snapshots.mergeVersionedClauses(spark, p, sourceDf,
      "o_orderkey", clauses)
    assert(v == 1)
    assertSame(spark.read.format("graft").load(p), expected)
    // version 0 untouched (time travel)
    assertSame(spark.read.format("graft")
      .option("versionAsOf", "0").load(p), ordersDf)
  }

  test("partial SET sees PRE-image values (swap semantics)") {
    val p = tmp()
    Snapshots.overwriteVersioned(spark, p,
      ordersDf.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), (col("o_totalprice") * 2).as("p2")))
    Snapshots.mergeVersionedClauses(spark, p,
      ordersDf.select("o_orderkey").filter(col("o_orderkey") % 3 === 0),
      "o_orderkey", Seq(
        MatchedUpdate(None, Seq(
          "o_totalprice" -> col("p2"), "p2" -> col("o_totalprice")))))
    val got = spark.read.format("graft").load(p)
      .filter(col("o_orderkey") % 3 === 0)
    assert(got.filter(col("o_totalprice") =!= col("p2") * 2).isEmpty,
      "swap must read both columns' PRE values")
    assert(got.count() > 0)
  }

  test("without BY SOURCE clauses only key-range files are rewritten") {
    val p = tmp()
    // range-partition so files have disjoint key ranges
    Snapshots.overwriteVersioned(spark, p,
      ordersDf.repartitionByRange(8, col("o_orderkey")))
    val live0 = Snapshots.liveFiles(p, 0).toSet
    val loKeys = ordersDf.orderBy("o_orderkey").limit(20)
      .select("o_orderkey")
    Snapshots.mergeVersionedClauses(spark, p, loKeys, "o_orderkey", Seq(
      MatchedUpdate(None, Seq("o_totalprice" -> lit(0.0)))))
    val live1 = Snapshots.liveFiles(p, 1).toSet
    val survivors = live0.intersect(live1)
    assert(survivors.nonEmpty,
      "files outside the 20 lowest keys' range must survive untouched")
    assert(live0.size - survivors.size <= 3,
      s"a 20-low-key merge must rewrite few of ${live0.size} files, " +
        s"rewrote ${live0.size - survivors.size}")
  }

  test("stored CDF records exactly the fired rows, 4-way") {
    val p2 = tmp()
    ordersDf.write.mode("overwrite").parquet(p2)
    Snapshots.init(spark, p2, changeDataFeed = true)
    Snapshots.mergeVersionedClauses(spark, p2, sourceDf, "o_orderkey",
      clauses)
    val cdf = Snapshots.changesCdf(spark, p2, 0, 1, "o_orderkey")
    val counts = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUpd = ordersDf
      .filter(col("o_orderkey") % 8 === 0).count()
    val nDel = ordersDf.filter(col("o_orderkey") % 4 === 0 &&
        col("o_orderkey") % 8 =!= 0).count() +
      ordersDf.filter(col("o_orderkey") % 4 =!= 0 &&
        col("o_totalprice") >= 1000.0 &&
        col("o_totalprice") > 500000.0).count()
    val nIns = ordersDf.filter(col("o_orderkey") % 4 === 1 &&
      col("o_totalprice") < 100000.0).count()
    val nZ = ordersDf.filter(col("o_orderkey") % 4 =!= 0 &&
      col("o_totalprice") < 1000.0).count()
    assert(counts.getOrElse("insert", 0L) == nIns, s"$counts")
    assert(counts.getOrElse("delete", 0L) == nDel, s"$counts")
    assert(counts.getOrElse("update_postimage", 0L) == nUpd + nZ, s"$counts")
    assert(counts.getOrElse("update_preimage", 0L) == nUpd + nZ, s"$counts")
  }

  /** [[LakeSqlSpec]]'s extension-session fixture, local copy. */
  private def withExtSession[A](body: org.apache.spark.sql.SparkSession => A): A = {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    try body(s)
    finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }

  test("SQL: conditional MERGE with guarded clauses routes to the log") {
    val p = tmp()
    Snapshots.overwriteVersioned(spark, p, ordersDf)
    val srcDir = tmp()
    sourceDf.write.mode("overwrite").parquet(srcDir)
    withExtSession { s =>
      s.read.parquet(srcDir).createOrReplaceTempView("mc_src")
      s.sql(
        s"""MERGE INTO graft.`$p` t USING mc_src s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s.price2 > t.o_totalprice
           |  THEN UPDATE SET o_totalprice = s.price2
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED AND s.price2 < 100000.0
           |  THEN INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
           |  VALUES (s.o_orderkey, CAST(-1 AS BIGINT), 'N', s.price2)
           |WHEN NOT MATCHED BY SOURCE AND t.o_totalprice < 1000.0
           |  THEN UPDATE SET o_orderstatus = 'Z'
           |WHEN NOT MATCHED BY SOURCE AND t.o_totalprice > 500000.0
           |  THEN DELETE""".stripMargin).collect()
    }
    assertSame(spark.read.format("graft").load(p), expected)
  }

  test("refusals: SET key, keyless INSERT, duplicate source keys") {
    val p = tmp()
    Snapshots.overwriteVersioned(spark, p, ordersDf)
    intercept[IllegalArgumentException] {
      Snapshots.mergeVersionedClauses(spark, p, sourceDf, "o_orderkey",
        Seq(MatchedUpdate(None, Seq("o_orderkey" -> lit(0L)))))
    }
    intercept[IllegalArgumentException] {
      Snapshots.mergeVersionedClauses(spark, p, sourceDf, "o_orderkey",
        Seq(NotMatchedInsert(None, Seq("o_totalprice" -> lit(1.0)))))
    }
    intercept[IllegalArgumentException] {
      Snapshots.mergeVersionedClauses(spark, p,
        sourceDf.unionByName(sourceDf.limit(5)), "o_orderkey",
        Seq(MatchedUpdate(None, Seq("o_totalprice" -> src("price2")))))
    }
  }

  test("A54: schema evolution adds the new column, null-fills the rest, " +
      "keeps old versions on the old schema, NULL pre-images in CDF") {
    val p = tmp()
    ordersDf.write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p, changeDataFeed = true)
    val evoClauses = Seq(
      MatchedUpdate(None, Seq("rebate" -> (src("price2") * 0.1))),
      NotMatchedInsert(None,
        Seq("o_orderkey" -> src("o_orderkey"), "o_custkey" -> lit(-1L),
          "o_orderstatus" -> lit("N"), "o_totalprice" -> src("price2"),
          "rebate" -> lit(0.0))))
    val v = Snapshots.mergeVersionedClauses(spark, p, sourceDf,
      "o_orderkey", evoClauses, evolveSchema = true)
    val got = Snapshots.read(spark, p)
    assert(got.schema.fieldNames.contains("rebate"))
    assert(got.schema("rebate").dataType.typeName == "double")
    // matched rows carry price2*0.1, inserts 0.0, everyone else NULL
    val nMatched = ordersDf.filter(col("o_orderkey") % 4 === 0).count()
    val nInserted = ordersDf.filter(col("o_orderkey") % 4 === 1).count()
    assert(got.filter(col("o_orderkey") < 90000000L &&
      col("o_orderkey") % 4 === 0 && col("rebate").isNotNull).count()
      == nMatched)
    assert(got.filter(col("o_orderkey") >= 90000000L &&
      col("rebate") === 0.0).count() == nInserted)
    assert(got.filter(col("rebate").isNull).count() ==
      got.count() - nMatched - nInserted)
    // pre-evolution version serves the OLD schema
    assert(!Snapshots.read(spark, p, v - 1)
      .schema.fieldNames.contains("rebate"))
    // CDF pre-images of updates predate the column: NULL there,
    // populated in the post-image
    val cdf = Snapshots.changesCdf(spark, p, v - 1, v, "o_orderkey")
    assert(cdf.filter(col("_change_type") === "update_preimage" &&
      col("rebate").isNotNull).isEmpty)
    assert(cdf.filter(col("_change_type") === "update_postimage" &&
      col("rebate").isNull).isEmpty)
  }

  test("A54: unknown SET/INSERT column refuses without evolveSchema") {
    val p = tmp()
    Snapshots.overwriteVersioned(spark, p, ordersDf)
    intercept[IllegalArgumentException] {
      Snapshots.mergeVersionedClauses(spark, p, sourceDf, "o_orderkey",
        Seq(MatchedUpdate(None, Seq("rebate" -> (src("price2") * 0.1)))))
    }
  }

  test("A54 SQL: MERGE WITH SCHEMA EVOLUTION, explicit columns, path form") {
    val p = tmp()
    Snapshots.overwriteVersioned(spark, p, ordersDf)
    val srcDir = tmp()
    sourceDf.write.mode("overwrite").parquet(srcDir)
    withExtSession { s =>
      s.read.parquet(srcDir).createOrReplaceTempView("mc_evo_src")
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$p` t USING mc_evo_src s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET rebate = s.price2 * 0.1
           |WHEN NOT MATCHED
           |  THEN INSERT (o_orderkey, o_custkey, o_orderstatus,
           |    o_totalprice, rebate)
           |  VALUES (s.o_orderkey, CAST(-1 AS BIGINT), 'N', s.price2,
           |    0.0)""".stripMargin).collect()
    }
    val got = spark.read.format("graft").load(p)
    assert(got.schema.fieldNames.contains("rebate"))
    assert(got.filter(col("rebate").isNotNull).count() ==
      ordersDf.filter(col("o_orderkey") % 4 === 0).count() +
        ordersDf.filter(col("o_orderkey") % 4 === 1).count())
  }

  test("A54 SQL: star actions under evolution expand source extras " +
      "(catalog-resolved source)") {
    val p = tmp()
    withExtSession { s =>
      Snapshots.overwriteVersioned(s, p,
        Tables.orders(s, sf).select("o_orderkey", "o_custkey",
          "o_orderstatus", "o_totalprice"))
      s.sql(s"CREATE TABLE evo_star_t USING graft " +
        s"OPTIONS (path '$p', keyCol 'o_orderkey')")
      try {
        val src = Tables.orders(s, sf)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("bonus", col("o_orderkey") * 2)
        src.createOrReplaceTempView("evo_star_src")
        s.sql(
          """MERGE WITH SCHEMA EVOLUTION INTO evo_star_t t
            |USING evo_star_src s ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
        val got = s.read.format("graft").load(p)
        assert(got.schema.fieldNames.contains("bonus"))
        val matched = got.filter(col("o_orderkey") % 10 === 0)
        assert(matched.filter(col("bonus") =!=
          col("o_orderkey") * 2).isEmpty)
        assert(got.filter(col("o_orderkey") % 10 =!= 0 &&
          col("bonus").isNotNull).isEmpty)
      } finally s.sql("DROP TABLE IF EXISTS evo_star_t")
    }
  }

  test("bucketed layout survives a conditional merge") {
    val p = tmp()
    Snapshots.writeBucketedVersioned(spark, p, ordersDf, "o_custkey", 4)
    Snapshots.mergeVersionedClauses(spark, p, sourceDf, "o_orderkey",
      clauses)
    assert(Snapshots.bucketSpecOf(p, Snapshots.currentVersion(p))
      .contains(("o_custkey", 4)))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = spark.read.format("graft").load(p)
        .groupBy("o_custkey").agg(count("*"))
      assert(!g.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }
}
