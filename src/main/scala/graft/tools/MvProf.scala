// Scratch: per-phase wall of the q_lake_mv shape (clone + create +
// three DML waves + refresh + read) to attribute MV staging cost.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{MaterializedView, Snapshots}

object MvProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = spark
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t = System.nanoTime()
      println(f"[mvprof] $tag%-16s ${(t - t0) / 1e9}%7.2f s")
      t0 = t
    }
    val b = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("mvp").toString + "/t"
    b.repartition(4).write.parquet(dir)
    Snapshots.init(s, dir, changeDataFeed = true)
    lap("base write+init")
    val mv0 = java.nio.file.Files.createTempDirectory("mvp_mv").toString + "/mv"
    MaterializedView.create(s, mv0, dir, "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    lap("mv create")
    Snapshots.mergeVersioned(s, dir,
      b.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("M"))
        .unionByName(b.filter(col("o_orderkey") % 7 === 1)
          .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
          .withColumn("o_orderstatus", lit("Q"))),
      "o_orderkey")
    lap("merge wave")
    Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 11 === 3)
    lap("delete wave")
    Snapshots.appendVersioned(s, dir,
      b.filter(col("o_orderkey") % 13 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 80000000L)
        .withColumn("o_orderstatus", lit("A")))
    lap("append wave")
    MaterializedView.refresh(s, mv0)
    lap("refresh")
    MaterializedView.read(s, mv0).write.format("noop").mode("overwrite").save()
    lap("read")
    spark.stop()
  }
}
