package graft

import org.apache.spark.sql.SparkSession

// temporary profiling harness — not part of the shipped surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.plans.Native.qAsofNative(spark, sfDir)
    println("=== analyzed ===")
    println(df.queryExecution.analyzed.treeString)
    println("=== optimized ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== physical ===")
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
