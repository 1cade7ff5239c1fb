package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1 A10) beyond the reference's raw
  * text files: parquet (the warehouse format), CSV, JSON lines, and
  * `word:count` text. All splittable on read; all partitioned on write
  * (`coalesce(1)` only on explicit request — a single output file is a
  * driver-side convenience, not a cluster pattern).
  */
object Sources {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Schema-explicit CSV read: never pay the inference scan at scale. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip — the other columnar warehouse format Spark ships
    * natively; same pushdown/pruning machinery as parquet (predicate
    * pushdown via ORC searchable argument, column pruning via the
    * selected schema).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Partitioned-by-column parquet layout (partition pruning on read —
    * the physical design that makes `WHERE source = …` free at 100 TB).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Compaction/layout sink: partition directories, rows sorted WITHIN
    * each file on `sortCols`, files capped at `maxRecordsPerFile` rows.
    * This is the write-side half of scan performance at 100 TB:
    * in-file ordering gives parquet min/max row-group pruning on the
    * sort key (the poor man's Z-order), the per-file cap bounds task
    * memory and keeps file counts sane for the next reader, and
    * `sortWithinPartitions` is a LOCAL sort — no global exchange
    * beyond the partitionBy shuffle.
    */
  /** Z-ordered layout (A14): cluster the table on the Morton code of
    * two columns — range-partition on z (each output file owns a
    * contiguous z range ≈ a 2-D tile), sort by z within files. Row
    * groups then have narrow min/max on BOTH dimensions, so parquet
    * pruning works for predicates on either column — the lakehouse
    * OPTIMIZE ZORDER BY layout. The z column itself is dropped from
    * the files: it is a layout key, not data.
    *
    * Coordinates are first NORMALIZED onto a 1024×1024 grid via
    * min/max scaling — interleaving raw values lets whichever column
    * has the larger magnitude own all the high z bits, which degrades
    * to a single-column sort (measured: per-file spans of the small
    * column stayed at ~100% of full range). min/max is one aggregate
    * whose two scalars ship as literals; production z-ordering on
    * skewed columns swaps the linear scale for approx-quantile ranks,
    * same layout otherwise.
    */
  /** The z-clustering transform alone (no sink): rows range-partitioned
    * and in-partition sorted on the Morton code of (c1, c2), the code
    * itself dropped. Shared by [[writeZOrdered]] (plain dir) and
    * [[Snapshots.compactZOrder]] (rewrite-only commit on the log).
    */
  private[sources] def zClustered(
      df: DataFrame, c1: String, c2: String, numFiles: Int): DataFrame =
    zClusteredCols(df, Seq(c1, c2), numFiles)

  /** N-column z-clustering (r8): 10 normalization bits per dimension,
    * bit b of dim i interleaved to position b·N + i — for N=2 exactly
    * the native Morton kernel's layout (which that path still uses);
    * for N in 3..6 the same interleave composed from stock codegen'd
    * bit arithmetic (10·N ≤ 62 bits keeps z a positive BIGINT). */
  private[graft] def zClusteredCols(
      df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, conv, encode, hex, lit, max, min, rpad, shiftleft, shiftright, substring}
    import org.apache.spark.sql.types.{DecimalType, StringType}
    require(cols.size >= 2 && cols.size <= 6,
      s"z-order takes 2..6 columns (got ${cols.size})")
    // r12: STRING dimensions cluster on a PREFIX-ORDER key — the first
    // 8 UTF-8 bytes as an unsigned big-endian integer (hex → conv),
    // held in DECIMAL(20,0) because the unsigned range exceeds a
    // signed long. Byte-prefix order equals Spark's UTF8String binary
    // order, so min/max-ranging and the 1024-bucket normalization
    // carry over unchanged; bucket math runs in decimal (exact, no
    // long overflow on the 2^64-wide key space) and casts back to the
    // long the Morton kernel interleaves. Numeric dimensions keep the
    // proven long path bit-for-bit.
    def isStr(c: String) = df.schema(c).dataType == StringType
    def key(c: String): org.apache.spark.sql.Column =
      if (isStr(c))
        conv(rpad(hex(substring(encode(col(c), "UTF-8"), 1, 8)), 16, "0"),
          16, 10).cast(DecimalType(20, 0))
      else col(c).cast("long")
    val aggs = cols.flatMap(c => Seq(min(key(c)), max(key(c))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bucketed = cols.zipWithIndex.map { case (c, i) =>
      if (isStr(c)) {
        val lo = BigDecimal(r.getDecimal(2 * i))
        val hi = BigDecimal(r.getDecimal(2 * i + 1))
        ((key(c) - lit(lo.underlying)) * lit(1024L) /
          lit((hi - lo + 1).underlying)).cast("long")
      } else {
        val (lo, hi) = (r.getLong(2 * i), r.getLong(2 * i + 1))
        ((col(c).cast("long") - lo) * 1024L / (hi - lo + 1L)).cast("long")
      }
    }
    val n = cols.size
    val z =
      if (n == 2) graft.functions.z_value(bucketed(0), bucketed(1))
      else bucketed.zipWithIndex.flatMap { case (b, i) =>
        (0 until 10).map(bit =>
          shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)), bit * n + i))
      }.reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  def writeZOrdered(
      df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int): Unit =
    zClustered(df, c1, c2, numFiles)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** A15 — file-level data-skipping index: per-file min/max of the
    * given columns, built in ONE scan (group by input_file_name). This
    * is the external half of what A14's z-layout sets up: with files
    * clustered on z, per-file ranges are narrow on every z-ed
    * dimension, so a range predicate prunes most FILES before Spark
    * even plans the scan — the Delta/Iceberg stats-skipping pattern
    * without a table format. At 100 TB the index is a persisted table
    * maintained incrementally on write; here it is built on demand.
    */
  def buildFileIndex(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Range read through the index: keep only files whose [min, max]
    * intersects [lo, hi], hand exactly those paths to the reader, and
    * re-apply the row-level predicate on top. The driver action is the
    * pruned FILE LIST (bounded by file count, the same thing any
    * catalog hands a planner), never data.
    */
  def readPruned(
      spark: SparkSession, path: String, index: DataFrame,
      column: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val files = index
      .filter(!(col(s"${column}_max") < lo || col(s"${column}_min") > hi))
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      spark.read.parquet(path).filter(col(column) >= lo && col(column) <= hi)
        .limit(0)
    else
      spark.read.parquet(files.toIndexedSeq: _*)
        .filter(col(column) >= lo && col(column) <= hi)
  }

  def writeLayout(
      df: DataFrame,
      path: String,
      partitionCol: String,
      sortCols: Seq[String],
      maxRecordsPerFile: Long): Unit =
    df.repartition(org.apache.spark.sql.functions.col(partitionCol))
      .sortWithinPartitions(partitionCol, sortCols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
}
