package graft

import org.apache.spark.sql.SparkSession

/** Thread-scaling sweep — the Spark analog of the reference's committed
  * scaling study (omp_out_{2,4,8,16}.txt: one wall-clock per OpenMP
  * thread count on its fixed corpus). Runs a headline-query subset at
  * local[n] for n in 2,4,8,16,32, one fresh SparkSession per point
  * (stopped between points — getOrCreate would otherwise silently
  * reuse the first master), and prints one JSON line per point plus a
  * reference-style table to stderr.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BenchSweep
  */
object BenchSweep {

  val SweepQueries = Seq("wc_count", "q1_agg", "q3_join", "q_minhash_lsh")
  val Cpus = Seq(2, 4, 8, 16, 32)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val results = Cpus.map { n =>
      val spark = SparkSession.builder()
        .master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // neutral warm per session: codegen + file index
      try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => () }
      val times = SweepQueries.map { q =>
        System.gc()
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets the optimizer prune
        // output columns and bench a partial plan (see Bench.scala)
        val ok = try {
          SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save(); true
        } catch { case _: Throwable => false }
        q -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      // the dedup family's shingle index is cached per-session; release
      // it so the next session's executors start cold like a fresh run
      graft.operators.Dedup.unpersistShingleIndexes()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      n -> times
    }
    results.foreach { case (n, times) =>
      val qs = times.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      println(s"""{"metric":"sweep","cpus":$n,"queries":$qs,"total":${times.map(_._2).sum},"sf":"$sfDir"}""")
    }
    // reference-style table (omp_out_N.txt reports one wall time per N)
    System.err.println(f"${"cpus"}%6s ${SweepQueries.map(q => f"$q%14s").mkString} ${"total"}%10s")
    results.foreach { case (n, times) =>
      System.err.println(
        f"$n%6d ${times.map(t => f"${t._2}%14.3f").mkString} ${times.map(_._2).sum}%10.3f")
    }
  }
}
