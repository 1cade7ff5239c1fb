package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the shipped surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").agg(avg("l_tax")).count()
    }
    for (r <- 1 to 2) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      time(s"r$r stream_tumble HDFS-state") {
        val s = spark
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val dir = java.nio.file.Files.createTempDirectory("graft_stream_hdfs")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$sfDir/events.parquet").toAbsolutePath)
        val src = s.readStream.schema(graft.streaming.EventsStream.eventsSchema)
          .parquet(dir.toString)
        val q = graft.streaming.EventsStream.tumblingAgg(src).writeStream
          .outputMode("complete").format("memory")
          .queryName(s"hdfs_tumble_$r").start()
        try q.processAllAvailable() finally q.stop()
        s.table(s"hdfs_tumble_$r").count()
      }
      time(s"r$r stream_tumble RocksDB") {
        graft.streaming.EventsStream.qStreamTumble(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
