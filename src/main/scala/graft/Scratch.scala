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
    val docs = graft.Tables.documents(spark, sfDir)
    time("warmup lineitem") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").agg(avg("l_tax")).count()
    }
    time("shingles (new builder)") { operators.Dedup.shingles(docs).count() }
    time("shingles (cached)") { operators.Dedup.shingles(docs).count() }
    time("minhash") { operators.Dedup.minhash(docs).count() }
    time("lshCandidates") { operators.Dedup.lshCandidates(docs).count() }
    time("jaccardPairs") { operators.Dedup.qJaccardPairs(spark, sfDir).count() }
    time("embed_dup (LSH)") { operators.Dedup.qEmbedDup(spark, sfDir).count() }
    time("dedup_cc") { operators.Dedup.qDedupCc(spark, sfDir).count() }
    spark.stop()
  }
}
