// Scratch stage profiler for the dedup pipeline.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)
    time("docs.count")(docs.count())
    val sh = Dedup.shingles(docs)
    time("shingles.count")(sh.count())
    time("shingles.count again")(sh.count())
    val mh = Dedup.minhash(docs)
    time("minhash.count")(mh.count())
    time("lsh.count")(Dedup.qMinhashLsh(spark, d).count())
    time("jaccard.count")(Dedup.qJaccardPairs(spark, d).count())
    spark.stop()
  }
}
