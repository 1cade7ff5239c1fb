// Manifest-log cost probe: measures what the A18 delta-encoded
// commits buy — manifest BYTES WRITTEN per commit on a many-file
// table — against the full-snapshot encoding they replaced (SURVEY
// §6 evidence). Usage:
//   runMain graft.tools.LogCost [files] [commits]
package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stages a versioned table whose live set is `files` parquet files,
  * then lands `commits` single-key merges (the streaming-upsert shape:
  * each touches ~1 file) and reports, per version: bytes actually
  * stored vs bytes a full-snapshot manifest would cost (the resolved
  * line set). The ratio is the log-write amplification the delta
  * encoding removes — the quantity that decides whether minute-cadence
  * commits are viable on a 1M-file table.
  */
object LogCost {
  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(400)
    val commits = args.lift(1).map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .appName("graft-logcost").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft_logcost").toString + "/t"
    spark.range(nFiles.toLong * 1000)
      .select(col("id").as("k"), concat(lit("p"), col("id")).as("payload"),
        lit(0L).as("gen"))
      .repartitionByRange(nFiles, col("k"))
      .write.parquet(dir)
    graft.sources.Snapshots.init(spark, dir)
    (1 to commits).foreach { i =>
      graft.sources.Snapshots.mergeVersioned(spark, dir,
        Seq((i.toLong * 997, s"UP$i", i.toLong)).toDF("k", "payload", "gen"),
        "k")
    }
    val log = Paths.get(dir, "_graft_log")
    println(f"${"version"}%8s ${"stored(B)"}%10s ${"full(B)"}%10s ${"ratio"}%7s  encoding")
    var stored = 0L; var full = 0L
    (0 to commits).foreach { v =>
      val p = log.resolve(f"v$v%06d.manifest")
      val s = Files.size(p)
      val f = graft.sources.Snapshots.manifestLines(dir, v)
        .map(_.getBytes("UTF-8").length + 1L).sum
      val enc = if (graft.sources.Snapshots.isDeltaManifest(dir, v)) "delta"
        else "full"
      stored += s; full += f
      println(f"$v%8d $s%10d $f%10d ${s.toDouble / f}%7.3f  $enc")
    }
    println(f"${"TOTAL"}%8s $stored%10d $full%10d ${stored.toDouble / full}%7.3f")
    spark.stop()
  }
}
