package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    val tok = docs.selectExpr("doc_id", raw"filter(split(text, '\\s+'), x -> x <> '') AS w")
      .where("size(w) >= 3")
    time("tokenize(filter-HOF)") { tok.count() }
    val tok2 = docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .where("size(w) >= 3")
    time("tokenize(no filter)") { tok2.count() }
    val pe = tok.select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "w1")))
    time("posexplode") { pe.count() }
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val led = pe.withColumn("w2", lead("w1", 1).over(byDoc))
      .withColumn("w3", lead("w1", 2).over(byDoc))
      .where(col("w3").isNotNull)
    time("+window lead") { led.count() }
    val hashed = led.selectExpr("doc_id",
      "CAST(conv(substr(md5(concat_ws(' ', w1, w2, w3)), 1, 15), 16, 10) AS BIGINT) AS h")
    time("+md5") { hashed.count() }
    time("+distinct (full)") { hashed.distinct().count() }
    time("rerun full") { hashed.distinct().count() }
    time("rerun full 3") { hashed.distinct().count() }
    spark.stop()
  }
}
