// Scratch: time consecutive MoR (DV) merges solo, with per-job
// attribution — isolates the r16 observe-rides-checkpoint path and the
// overlapped artifact writes from bench noise.
package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Snapshots

object DvProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val orders = Tables.orders(s = spark, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val srcDir = java.nio.file.Files.createTempDirectory("dvp").toString + "/t"
    def wave(i: Int) = orders.filter(pmod(col("o_orderkey"), lit(5)) === i % 5)
      .withColumn("o_totalprice", col("o_totalprice") + i * 10.0)
    wave(1).write.parquet(srcDir)
    Snapshots.init(spark, srcDir)
    Snapshots.mergeVersionedDV(spark, srcDir, wave(2), "o_orderkey") // warm
    (3 to 6).foreach { i =>
      Thread.sleep(300); jobs.set(0)
      val t0 = System.nanoTime()
      Snapshots.mergeVersionedDV(spark, srcDir, wave(i), "o_orderkey")
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[dvprof] merge $i  $dt%6.3f s  jobs=${jobs.get}%3d")
    }
    spark.stop()
  }
}
