package graft

import org.apache.spark.sql.SparkSession

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
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.avg("l_tax")).count()
    }
    // dedup family in Bench order-independence check: run each twice
    for (round <- 1 to 2) {
      for (q <- Seq("q_jaccard_pairs", "q_dedup_pipeline", "q_dedup_cc",
        "q_minhash_lsh", "q_embed_dup", "q_stream_tumble", "q_knn_ivf", "q3_join")) {
        time(s"r$round $q") { SparkEntry.queries(q)(spark, sfDir).count() }
      }
    }
    spark.stop()
  }
}
