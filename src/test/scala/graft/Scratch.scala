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
        java.nio.file.Files.createTempDirectory("graft_scratch").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val li = Tables.lineitem(spark, sfDir)
    time("warmup") { li.agg(avg("l_tax")).count() }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_bpe_pairs", "q_bpe_merges", "q_bpe_tokenize",
        "q_decontam", "q_tfidf", "q_kmeans")
    for (r <- 1 to 2; n <- names)
      time(s"r$r $n") { SparkEntry.queries(n)(spark, sfDir).count() }
    spark.stop()
  }
}
