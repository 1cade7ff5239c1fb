package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the shipped surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_bktbench").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // fact-fact simulation: disable broadcast so the join must either
    // shuffle (plain) or ride the bucket layout (bucketed)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    time("warmup") { l.agg(avg("l_tax")).count() }

    def shuffleJoin() = l.withColumnRenamed("l_orderkey", "k")
      .join(o.withColumnRenamed("o_orderkey", "k"), "k")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)), sum("l_quantity"))

    // one-time bucketed layout cost
    time("write bucketed (one-time)") {
      graft.sources.Bucketing.writeBucketed(
        l.withColumnRenamed("l_orderkey", "k"), "l_bkt", "k", 32)
      graft.sources.Bucketing.writeBucketed(
        o.withColumnRenamed("o_orderkey", "k"), "o_bkt", "k", 32)
      1L
    }
    def bucketedJoin() = graft.sources.Bucketing
      .bucketedJoin(spark, "l_bkt", "o_bkt", "k")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)), sum("l_quantity"))

    for (r <- 1 to 3) {
      time(s"r$r shuffle join") { shuffleJoin().count() }
      time(s"r$r bucketed join") { bucketedJoin().count() }
    }
    val planB = bucketedJoin().queryExecution.executedPlan.toString
    val planS = shuffleJoin().queryExecution.executedPlan.toString
    println("bucketed exchanges: " + "Exchange".r.findAllIn(planB).length)
    println("shuffle exchanges:  " + "Exchange".r.findAllIn(planS).length)
    spark.stop()
  }
}
