// Stage-by-stage cost probe for the prefix-filtered Jaccard pipeline.
// Usage: runMain graft.tools.JaccardProbe <sfDir>
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.operators.Dedup

object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tau = 0.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    val sh = time("shingle index build+cache") {
      val s = Dedup.shingles(docs); s.count(); s
    }
    println(s"PROBE   sh rows = ${sh.count()}")
    val postings = sh.groupBy("h").agg(count(lit(1)).as("np"))
    val ranked = sh.join(postings, "h")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("np").asc, col("h").asc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefix = ranked
      .filter(col("r") <= col("n") - ceil(lit(tau) * col("n")) + 1)
      .select("doc_id", "h", "n").cache()
    time("prefix index")(println(s"PROBE   prefix rows = ${prefix.count()}"))
    val alpha = ceil(lit(tau / (1 + tau)) * (col("na") + col("nb")) - lit(1e-9))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("m"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .filter(col("m") +
        greatest(ceil(lit(tau) * col("na")), ceil(lit(tau) * col("nb"))) - 1 >= alpha)
      .select("doc_a", "doc_b").cache()
    time("candidates (positional)")(println(s"PROBE   cand rows = ${cand.count()}"))
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("n"))
    val out = cand
      .join(sets.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(sets.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("ca.hs"), col("cb.hs"))).cast("long"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= tau)
    time("verify join")(println(s"PROBE   result rows = ${out.count()}"))
    spark.stop()
  }
}
