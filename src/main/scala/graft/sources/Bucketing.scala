package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout (SURVEY.md §5): pre-shuffle a fact table ONCE
  * into N buckets on its join/agg key so every later equi-join or
  * aggregation on that key runs exchange-free. At 100 TB this converts
  * the recurring per-query shuffle of the biggest table into a one-time
  * write cost — the standard physical design for fact-fact joins
  * (e.g. orders ⋈ lineitem on the order key).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge-join needs no sort either).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Exchange-free equi-join of two tables bucketed on the same key
    * with the same bucket count.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
