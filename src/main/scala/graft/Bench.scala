package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the driver's local[32] so locally-iterated numbers
    // and the committed per-round artifact are like-for-like
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/JIT, codegen compiler, and file index with NEUTRAL
    // work (scan+agg+join+shuffle shapes that are not in the measured
    // set), so no measured query gets an unfair warm start over the
    // others.
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.agg(avg("l_tax"), countDistinct("l_linestatus")).count()
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderstatus").count().count()
    } catch { case _: Throwable => () }
    // deterministic name order: hash-map iteration order would hand the
    // shared shingle-index build cost to a DIFFERENT dedup-family query
    // each round, making per-query deltas incomparable across rounds
    // optional args: run only the named queries (local iteration aid;
    // the driver passes none and gets the full suite)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    // incremental per-query log: a crash or truncated stdout capture
    // partway through still leaves every completed timing on disk
    val logPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_LOG", "/tmp/bench_queries.jsonl"))
    java.nio.file.Files.deleteIfExists(logPath)
    // materialize the shared dedup-family registries (shingle index,
    // MinHash signatures, verified pair list) as an EXPLICIT entry:
    // they are one-time capital cost for the whole family, and without
    // this the alphabetically-first family query absorbs ~all of it,
    // misattributing seconds to whatever query sorts first that round
    val buildEntry: Seq[(String, Double)] = if (args.isEmpty) {
      System.gc()
      val t0 = System.nanoTime()
      val sec = try {
        val docs = Tables.documents(spark, sfDir)
        operators.Dedup.shingles(docs).count()
        operators.Dedup.minhash(docs).count()
        operators.Dedup.nearDupPairs(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
      java.nio.file.Files.writeString(logPath,
        s"""{"_build_dedup_family":$sec}""" + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      Seq("_build_dedup_family" -> sec)
    } else Seq.empty
    val results = buildEntry ++ selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // nudge the ContextCleaner so dead broadcasts/shuffles of prior
      // queries are released and a long run doesn't degrade into GC
      // thrash; live caches (the shared shingle index) are kept
      System.gc()
      sources.LakehouseQueries.drainStagingSeconds() // reset leftovers
      val t0 = System.nanoTime()
      // force through the noop sink, NOT count(): count() lets the
      // optimizer prune every column the row count doesn't need, so a
      // query whose cost lives in an output column (q_span_clean's
      // ordered reassembly + md5) would bench its plan MINUS the
      // expensive part; noop materializes all columns of every row
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      // -1 marks a failed query — never report a crash as a fast pass
      val wall = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // r12: heavy lake gates declare their history-fabrication setup
      // via LakehouseQueries.staged{}; report it as a SEPARATE
      // `_stage_<name>` entry so `<name>` is the operator's own cost —
      // totals still sum to wall, and a staging regression still shows
      // under its own key
      val stageSec = sources.LakehouseQueries.drainStagingSeconds()
      val sec = if (ok && stageSec > 0) wall - stageSec else wall
      // lake-query staging copies are drained by the noop force above;
      // reclaim them now (no-op for non-staging queries) so a 100x run
      // never pins tens of GB of /tmp until JVM exit
      sources.LakehouseQueries.reclaim()
      val entries = (name -> sec) +:
        (if (ok && stageSec > 0) Seq(s"_stage_$name" -> stageSec)
         else Seq.empty)
      entries.foreach { case (k, v) =>
        java.nio.file.Files.writeString(logPath, s"""{"$k":$v}""" + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
      entries
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total sums SUCCESSFUL queries only — summing the -1.0 failure
    // sentinels would let crashed queries shrink the reported total;
    // failures are called out explicitly instead
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","n_failed":${failed.size},"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // full JSON line to a file as well: the driver's tail-capture of
    // stdout truncated round 3's artifact to 72 of 118 queries
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")), line + "\n")
    // ...and the COMMITTED record: BENCH_FULL_rNN.json in the repo,
    // round-numbered after the driver's newest BENCH_rNN.json, so the
    // repo artifact always parses to the full per-query map even when
    // the driver's stdout capture truncates. r16 (r15 verdict item 8):
    // only written when SPARK_GRAFT_BENCH_COMMIT=1 — the driver's own
    // bench legs used to auto-number a stray BENCH_FULL_r(NN+1).json
    // into the repo, shadowing the next round's real artifact name.
    if (args.isEmpty &&
        sys.env.get("SPARK_GRAFT_BENCH_COMMIT").contains("1")) try {
      val repo = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
      val pat = "BENCH_r(\\d+)\\.json".r
      val s = java.nio.file.Files.list(repo)
      val latest =
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .collect { case pat(n) => n.toInt }.maxOption.getOrElse(0)
        } finally s.close()
      // Scale-sweep legs (SPARK_GRAFT_SWEEP_SUFFIX=sfx10 etc.) write
      // their OWN suffixed artifact; only a plain 1x run may touch the
      // round's canonical BENCH_FULL_rNN.json — a back-to-back sweep
      // used to clobber the 1x record with its last leg.
      val suffix = sys.env.get("SPARK_GRAFT_SWEEP_SUFFIX")
        .filter(_.nonEmpty).map("_" + _).getOrElse("")
      java.nio.file.Files.writeString(
        repo.resolve(f"BENCH_FULL_r${latest + 1}%02d$suffix%s.json"),
        line + "\n")
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
