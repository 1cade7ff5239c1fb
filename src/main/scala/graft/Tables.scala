package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator takes the scale-factor directory as a parameter so the
  * same plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+
  * (bench) — and, unchanged, against a cluster-sized warehouse: the
  * reads are plain splittable parquet FileScans, so Catalyst pushes
  * filters/projections down and partition-parallelism scales with input
  * size, not with anything hardcoded here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped in two on-disk encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as a raw long under the legacy conf) and plain
    * TIMESTAMP_MICROS. Adapt to whatever the files actually carry: a
    * LongType read means nanos — floor to micros; any timestamp flavor
    * (TIMESTAMP or TIMESTAMP_NTZ, depending on the writer's UTC flag)
    * is cast to session-TZ TimestampType so downstream plans and the
    * driver's schema hash see one stable dtype either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
