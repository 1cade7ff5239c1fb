package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    // r16 (r15 advice): the plans/<round> dir comes from the
    // environment like the suffix already did, instead of a hardcoded
    // round that silently overwrites a stale directory
    val dir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r16"))
    java.nio.file.Files.createDirectories(dir)
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        dir.resolve(s"${name}_$out.txt"), plan)
      graft.sources.LakehouseQueries.reclaim()
      println(s"[explain] wrote $name $out")
    }
    spark.stop()
  }
}
