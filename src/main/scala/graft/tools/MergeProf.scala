// Scratch: one CoW mergeVersioned on a steady-shaped source table with
// a per-job duration + callsite listener, to attribute the ~3s wall.
package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Snapshots

object MergeProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    @volatile var log = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val cs = j.stageInfos.headOption.map(_.details)
          .flatMap(_.split("\n").find(l =>
            l.contains("graft.") && !l.contains("graft.tools.")))
          .map(_.trim).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), cs))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (log && s != null)
          println(f"[mergeprof] job ${j.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%6.3f s  ${s._2}")
      }
    })
    val orders = Tables.orders(s = spark, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val srcDir = java.nio.file.Files.createTempDirectory("mp_src").toString + "/t"
    def wave(i: Int) = orders.filter(pmod(col("o_orderkey"), lit(3)) === i % 3)
      .withColumn("o_totalprice", col("o_totalprice") + i * 10.0)
    wave(1).write.parquet(srcDir)
    Snapshots.init(spark, srcDir, changeDataFeed = true)
    Snapshots.mergeVersioned(spark, srcDir, wave(2), "o_orderkey") // warm
    Thread.sleep(500)
    log = true
    val t0 = System.nanoTime()
    Snapshots.mergeVersioned(spark, srcDir, wave(3), "o_orderkey")
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[mergeprof] TOTAL merge $dt%6.3f s")
    spark.stop()
  }
}
