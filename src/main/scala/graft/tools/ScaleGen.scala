// Scale-up generator: replicates an sf directory by an integer factor
// for scaling studies (SURVEY §6). Usage:
//   runMain graft.tools.ScaleGen <srcSfDir> <destDir> <factor>
package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Each table is exploded into `factor` replicas with primary AND
  * foreign keys offset by a per-table stride (max key + 1), so join
  * cardinalities and selectivities scale linearly and referential
  * integrity holds across replicas — the TPC-H-style property that
  * makes per-query cost slopes meaningful.
  *
  * Text and embeddings are deterministically PERTURBED per replica
  * (suffix every 3rd word with a replica-unique token; jitter vector
  * components) so the scaled corpus does not degenerate into
  * pathological shingle postings: every 3-word shingle spans a
  * suffixed position, so replicas share ZERO trigrams cross-replica —
  * posting lists stay base-sized and the dedup family's candidate
  * volume scales linearly in the factor, while near-dup structure
  * WITHIN each replica mirrors the base corpus. (A sparser 1-in-7
  * suffix was measured to leave 4/7 of trigrams shared across ~4/7 of
  * all replicas — posting lists ~57x base at factor 100, candidate
  * pairs quadratic in the factor. Every-3rd is the correct density for
  * 3-shingles.) region/nation stay fixed, like TPC-H's constant
  * dimensions.
  */
object ScaleGen {

  private def maxKey(df: DataFrame, col: String): Long =
    df.agg(max(col)).head().getLong(0) + 1L

  /** Cross the table with replica ids 0..factor-1; replica 0 is the
    * untouched original. */
  private def reps(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("rep", explode(sequence(lit(0L), lit(factor - 1L))))

  def main(args: Array[String]): Unit = {
    val Array(src, dest, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode(SaveMode.Overwrite)
        .parquet(s"$dest/$t.parquet")

    // constant dimensions: plain copies
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    val strideC = maxKey(rd("customer"), "c_custkey")
    val strideS = maxKey(rd("supplier"), "s_suppkey")
    val strideP = maxKey(rd("part"), "p_partkey")
    val strideO = maxKey(rd("orders"), "o_orderkey")
    val strideU = maxKey(rd("events"), "user_id")
    val strideE = maxKey(rd("events"), "event_id")
    val strideD = maxKey(rd("documents"), "doc_id")
    val strideV = maxKey(rd("embeddings"), "vec_id")

    wr(reps(rd("customer"), factor)
      .withColumn("c_custkey", col("c_custkey") + col("rep") * strideC)
      .drop("rep"), "customer", 4)
    wr(reps(rd("supplier"), factor)
      .withColumn("s_suppkey", col("s_suppkey") + col("rep") * strideS)
      .drop("rep"), "supplier", 1)
    wr(reps(rd("part"), factor)
      .withColumn("p_partkey", col("p_partkey") + col("rep") * strideP)
      .drop("rep"), "part", 2)
    wr(reps(rd("orders"), factor)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * strideO)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * strideC)
      .drop("rep"), "orders", 8)
    wr(reps(rd("lineitem"), factor)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * strideO)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * strideP)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * strideS)
      .drop("rep"), "lineitem", 32)
    wr(reps(rd("events"), factor)
      .withColumn("event_id", col("event_id") + col("rep") * strideE)
      .withColumn("user_id", col("user_id") + col("rep") * strideU)
      .drop("rep"), "events", 16)
    wr(reps(rd("documents"), factor)
      .withColumn("doc_id", col("doc_id") + col("rep") * strideD)
      .withColumn("text", expr(
        """CASE WHEN rep = 0 THEN text ELSE
          |  array_join(transform(split(text, ' '),
          |    (w, i) -> CASE WHEN i % 3 = 2
          |              THEN concat(w, '_r', CAST(rep AS STRING)) ELSE w END), ' ')
          |END""".stripMargin))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep"), "documents", 16)
    wr(reps(rd("embeddings"), factor)
      .withColumn("embedding", expr(
        """CASE WHEN rep = 0 THEN embedding ELSE
          |  transform(embedding, (x, i) ->
          |    CAST(x + (((rep * 31 + i) % 17) - 8) * 0.001D AS FLOAT))
          |END""".stripMargin))
      .withColumn("vec_id", col("vec_id") + col("rep") * strideV)
      .drop("rep"), "embeddings", 8)

    println(s"scaled $src x$factor -> $dest")
    spark.stop()
  }
}
