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
    val docs = Tables.documents(spark, sfDir)

    def windowShingles() = {
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      docs
        .select(col("doc_id"), posexplode(split(col("text"), "\\s+")).as(Seq("pos", "w1")))
        .where(col("w1") =!= "")
        .withColumn("w2", lead("w1", 1).over(byDoc))
        .withColumn("w3", lead("w1", 2).over(byDoc))
        .where(col("w3").isNotNull)
        .selectExpr("doc_id",
          "CAST(conv(substr(md5(concat_ws(' ', w1, w2, w3)), 1, 15), 16, 10) AS BIGINT) AS h")
        .distinct()
    }

    def zipShingles() = {
      val n3 = size(col("w")) - 2
      docs
        .select(col("doc_id"), split(col("text"), "\\s+").as("w0"))
        .select(col("doc_id"),
          when(element_at(col("w0"), 1) === "",
            slice(col("w0"), lit(2), greatest(size(col("w0")) - 1, lit(0))))
            .otherwise(col("w0")).as("w"))
        .where(size(col("w")) >= 3)
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("w"), lit(1), n3).as("a"),
          slice(col("w"), lit(2), n3).as("b"),
          slice(col("w"), lit(3), n3).as("c"))).as("z"))
        .selectExpr("doc_id",
          "CAST(conv(substr(md5(concat_ws(' ', z.a, z.b, z.c)), 1, 15), 16, 10) AS BIGINT) AS h")
        .repartition(col("doc_id"))
        .distinct()
    }

    for (r <- 1 to 3) {
      time(s"r$r window shingles") { windowShingles().count() }
      time(s"r$r zip shingles") { zipShingles().count() }
    }
    // equality check
    val a = windowShingles()
    val b = zipShingles()
    time("diff a-b + b-a (want 0)") { a.exceptAll(b).count() + b.exceptAll(a).count() }
    spark.stop()
  }
}
