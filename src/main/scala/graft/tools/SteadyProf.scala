// Scratch profiler for q_lake_steady: replays the gate with per-phase
// wall timers so the 500-job wall can be attributed (staging / per-wave
// micro-batch / final fold / aggregates).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{PartitionedSnapshots, Snapshots}

object SteadyProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = spark
    // per-lap job counting + (opt-in) per-job timeline of the last laps
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val detail = sys.env.get("SPARK_GRAFT_STEADY_DETAIL").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    val runStart = System.nanoTime()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val sites = new java.util.concurrent.ConcurrentHashMap[Int, String]
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (detail) {
            val cs = j.stageInfos.headOption.map(_.details)
              .flatMap(_.split("\n").find(l =>
                l.contains("graft.") && !l.contains("graft.tools.")))
              .map(_.trim).getOrElse("?")
            sites.put(j.jobId, cs)
          }
          starts.put(j.jobId, System.nanoTime()); ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = starts.remove(j.jobId)
          if (detail && st != null)
            println(f"[steadyjob] job ${j.jobId}%4d " +
              f"start=${(st - runStart) / 1e9}%7.2f " +
              f"dur=${(System.nanoTime() - st) / 1e9}%6.3f s  " +
              sites.getOrDefault(j.jobId, "?"))
        }
      })
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t = System.nanoTime()
      println(f"[steadyprof] $tag%-22s ${(t - t0) / 1e9}%7.2f s  " +
        f"jobs=${jobs.getAndSet(0)}%4d")
      t0 = t
    }
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val root = java.nio.file.Files.createTempDirectory("sp_root").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("sp_src").toString + "/t"
    val dirC = java.nio.file.Files.createTempDirectory("sp_c").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sp_ck").toString
    def wave(i: Int) = {
      val upd = orders.filter(pmod(col("o_orderkey"), lit(3)) === i % 3)
        .withColumn("o_totalprice", col("o_totalprice") + i * 10.0)
      if (i == 3) upd.unionByName(
        orders.filter(col("o_orderkey") % 41 === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
          .withColumn("o_orderstatus", lit("X")))
      else upd
    }
    lap("setup")
    PartitionedSnapshots.init(s, root, orders, "o_orderstatus",
      bucketBy = Some(("o_custkey", 8)))
    lap("init root")
    Snapshots.writeBucketedVersioned(s, dirC, cust, "c_custkey", 8)
    lap("init cust")
    wave(1).write.parquet(srcDir)
    Snapshots.init(s, srcDir, changeDataFeed = true)
    lap("init src")
    val q = s.readStream.format("graft")
      .option("keyCol", "o_orderkey")
      .option("maxVersionsPerTrigger", "1").load(srcDir)
      .filter(col("change_type") =!= "delete")
      .drop("change_type", "_commit_version")
      .writeStream.format("graft")
      .option("keyCol", "o_orderkey")
      .option("morWrites", "true")
      .option("autoReconcileMaxDvFiles", "2")
      .option("checkpointLocation", ckpt)
      .partitionBy("o_orderstatus")
      .start(root)
    try {
      q.processAllAvailable()
      lap("batch v0")
      (2 to 6).foreach { i =>
        Snapshots.mergeVersioned(s, srcDir, wave(i), "o_orderkey")
        lap(s"src merge $i")
        q.processAllAvailable()
        lap(s"batch $i")
      }
    } finally q.stop()
    val parts = PartitionedSnapshots.partitions(root)
    graft.sources.Par.foreach(s, parts)(v => {
      PartitionedSnapshots.reconcilePartition(s, root, v); ()
    })
    lap("final reconcile")
    val fact = s.read.format("graft")
      .option("partitionCol", "o_orderstatus").load(root)
    val custT = s.read.format("graft").load(dirC)
    val joined = fact.join(custT.hint("merge"),
      col("o_custkey") === col("c_custkey"))
    val exchangeFree =
      !joined.queryExecution.executedPlan.toString.contains("Exchange")
    println(s"[steadyprof] exchangeFree=$exchangeFree")
    joined.groupBy("c_mktsegment").count().count()
    fact.groupBy("o_orderstatus").count().count()
    lap("aggregates")
    spark.stop()
  }
}
