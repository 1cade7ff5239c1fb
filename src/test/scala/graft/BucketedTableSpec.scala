package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** A50 — hash-bucketed VERSIONED tables (storage-partitioned joins on
  * the lake): the manifest records `#bucketspec=col\tn`, every write
  * path routes its staged rows through Spark's own bucket-id hash and
  * tags the files, and the connector declares a real `BucketSpec` so
  * co-bucketed joins / groupBy on the bucket column run with ZERO
  * exchange. The pins below are the load-bearing claims: the hash
  * parity with Spark's native bucketBy (a drifted hash would silently
  * mis-join), layout survival across merge/delete/append/compact, the
  * graceful degrade when an untagged file lands, and the refusals.
  */
class BucketedTableSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_bktspec").toString

  private def ordersDf = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_totalprice")
  private def customerDf = Tables.customer(spark, sf)
    .select("c_custkey", "c_name", "c_acctbal")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def graftRead(path: String) =
    spark.read.format("graft").load(path)

  test("co-bucketed graft⋈graft join and groupBy run exchange-free") {
    val (po, pc) = (tmp(), tmp())
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 8)
    Snapshots.writeBucketedVersioned(spark, pc, customerDf, "c_custkey", 8)
    assert(Snapshots.bucketSpecOf(po, 0).contains(("o_custkey", 8)))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = graftRead(po).join(graftRead(pc),
        col("o_custkey") === col("c_custkey"))
      assert(!plan(j).contains("Exchange"), plan(j).take(1200))
      val expected = ordersDf.join(customerDf,
        col("o_custkey") === col("c_custkey")).count()
      assert(j.count() == expected)

      val g = graftRead(po).groupBy("o_custkey")
        .agg(sum("o_totalprice").as("s"))
      assert(!plan(g).contains("Exchange"), plan(g).take(1200))
      assert(g.count() ==
        ordersDf.select("o_custkey").distinct().count())
    }
  }

  test("hash parity: graft bucket routing matches Spark's native bucketBy") {
    val po = tmp()
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 4)
    spark.sql("DROP TABLE IF EXISTS bkt_native_cust")
    customerDf.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("bkt_native_cust")
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // if graft's file tags disagreed with Spark's hash, rows would
      // land in mismatched buckets and the exchange-free join would
      // silently DROP matches — the count equality is the real pin
      val j = graftRead(po).join(spark.table("bkt_native_cust"),
        col("o_custkey") === col("c_custkey"))
      assert(!plan(j).contains("Exchange"), plan(j).take(1200))
      val expected = ordersDf.join(customerDf,
        col("o_custkey") === col("c_custkey")).count()
      assert(j.count() == expected)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_native_cust")
  }

  test("point lookup prunes to one bucket (SelectedBucketsCount)") {
    val po = tmp()
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 8)
    val k = ordersDf.select("o_custkey").head().getLong(0)
    // DisableUnnecessaryBucketedScan hides the bucketed scan (and its
    // SelectedBucketsCount metadata) when no exchange is avoided —
    // pruning still happens; pin it with the rule off
    withConf(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val q = graftRead(po).filter(col("o_custkey") === lit(k))
      assert(plan(q).contains("SelectedBucketsCount: 1 out of 8"),
        plan(q).take(1200))
      assert(q.count() ==
        ordersDf.filter(col("o_custkey") === lit(k)).count())
    }
  }

  test("merge, keyed delete, append and compact all preserve the layout") {
    val po = tmp()
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 8)
    // merge: bump a slice's totalprice (key ≠ bucket column on purpose;
    // predicate-defined waves so every recomputation picks the same rows)
    val wave = ordersDf.filter(col("o_orderkey") % 20 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val v1 = Snapshots.mergeVersioned(spark, po, wave, "o_orderkey")
    assert(Snapshots.bucketSpecOf(po, v1).contains(("o_custkey", 8)))
    // keyed delete of a few orders
    val doomed = ordersDf.filter(col("o_orderkey") % 37 === 1)
      .select("o_orderkey")
    val v2 = Snapshots.deleteVersionedKeys(spark, po, doomed, "o_orderkey")
    // blind append of fresh keys
    val fresh = ordersDf.filter(col("o_orderkey") % 41 === 2)
      .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
    val v3 = Snapshots.appendVersioned(spark, po, fresh)
    // compact the accumulated per-commit files back to 8
    val v4 = Snapshots.compact(spark, po, targetBytes = 256L << 20,
      minFiles = 2)
    assert(v4 == v3 + 1, "compact should make progress past 8 files")
    assert(Snapshots.bucketSpecOf(po, v4).contains(("o_custkey", 8)))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = graftRead(po).groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"),
        "layout must survive merge+delete+append+compact\n" +
          plan(g).take(1200))
    }
    // value-level correctness of the whole wave sequence
    val expected = ordersDf
      .join(wave.select(col("o_orderkey").as("__k"),
        col("o_totalprice").as("__p")),
        col("o_orderkey") === col("__k"), "left_outer")
      .select(col("o_orderkey"), col("o_custkey"),
        coalesce(col("__p"), col("o_totalprice")).as("o_totalprice"))
      .join(doomed.withColumnRenamed("o_orderkey", "__d"),
        col("o_orderkey") === col("__d"), "left_anti")
      .unionByName(fresh)
    val got = graftRead(po)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("time travel keeps each version's own bucketed scan") {
    val po = tmp()
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 4)
    Snapshots.mergeVersioned(spark, po,
      ordersDf.limit(3).withColumn("o_totalprice", lit(0.0)), "o_orderkey")
    val v0 = spark.read.format("graft").option("versionAsOf", "0").load(po)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = v0.groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"), plan(g).take(1200))
    }
    assert(v0.count() == ordersDf.count())
  }

  test("an untagged live file degrades the read to a plain scan, correctly") {
    val po = tmp()
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 4)
    // land one untagged parquet beside the tagged files and commit it
    // live — the shape any future non-bucket-aware rewrite would have
    val extraDir = Files.createTempDirectory("graft_bkt_extra").toString
    val extra = ordersDf.filter(col("o_orderkey") % 53 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 80000000L)
    val extraN = extra.count()
    extra.coalesce(1).write.mode("overwrite").parquet(extraDir)
    import scala.jdk.CollectionConverters._
    val moved = Files.list(java.nio.file.Paths.get(extraDir)).iterator()
      .asScala.filter(_.toString.endsWith(".parquet")).toSeq.headOption
      .map { p =>
        val dst = java.nio.file.Paths.get(po, "v1_untagged.parquet")
        Files.move(p, dst)
        dst.toString
      }
    val live = spark.read.format("graft").option("metadata", "files")
      .load(po).select("file").collect().map(_.getString(0)).toSeq
    Snapshots.commit(po, live ++ moved.toSeq,
      Some(graftRead(po).schema))
    val g = graftRead(po).groupBy("o_custkey").agg(count("*").as("n"))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(plan(g).contains("Exchange"),
        "untagged file present: the scan must NOT claim the bucket layout")
    }
    assert(graftRead(po).count() == ordersDf.count() + extraN)
  }

  test("ZORDER refuses on a bucketed table; overwrite must keep the column") {
    val po = tmp()
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 4)
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.compactZOrder(spark, po, "o_orderkey", "o_custkey", 4)
    }
    assert(e1.getMessage.contains("bucket"))
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.overwriteVersioned(spark, po,
        ordersDf.drop("o_custkey"))
    }
    assert(e2.getMessage.contains("o_custkey"))
    // overwrite WITH the column keeps the layout
    val v = Snapshots.overwriteVersioned(spark, po, ordersDf.limit(100))
    assert(Snapshots.bucketSpecOf(po, v).contains(("o_custkey", 4)))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = graftRead(po).groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"), plan(g).take(1200))
    }
  }

  test("writer options create a bucketed table; mismatched spec refuses") {
    val po = tmp()
    ordersDf.write.format("graft")
      .option("bucketCol", "o_custkey").option("buckets", "4").save(po)
    assert(Snapshots.bucketSpecOf(po, 0).contains(("o_custkey", 4)))
    val e = intercept[IllegalArgumentException] {
      ordersDf.write.format("graft").mode("append")
        .option("keyCol", "o_orderkey")
        .option("bucketCol", "o_custkey").option("buckets", "8").save(po)
    }
    assert(e.getMessage.contains("fixed at creation"))
    // matching options are fine (merge path, layout preserved)
    ordersDf.limit(5).write.format("graft").mode("append")
      .option("keyCol", "o_orderkey")
      .option("bucketCol", "o_custkey").option("buckets", "4").save(po)
    assert(Snapshots.bucketSpecOf(po, 1).contains(("o_custkey", 4)))
  }

  test("shallow clone carries the bucket layout") {
    val (po, pd) = (tmp(), tmp())
    Snapshots.writeBucketedVersioned(spark, po, ordersDf, "o_custkey", 4)
    Snapshots.cloneShallow(po, pd)
    assert(Snapshots.bucketSpecOf(pd, 0).contains(("o_custkey", 4)))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val g = graftRead(pd).groupBy("o_custkey").agg(count("*").as("n"))
      assert(!plan(g).contains("Exchange"), plan(g).take(1200))
    }
  }
}
