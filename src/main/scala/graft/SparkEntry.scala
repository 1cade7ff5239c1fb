package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory)
  * and §7 (build plan). Each operator block contributes its queries and
  * DuckDB oracle SQL; keys are stable across rounds.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ WordCount.queries ++ Events.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ graft.streaming.EventsStream.queries ++
      GraftSql.queries ++ Skew.queries ++ graft.plans.Native.queries ++
      Tokenizer.queries ++ Decontam.queries ++ Clustering.queries ++
      Graph.queries ++ BloomJoin.queries ++ Incremental.queries ++
      Sketches.queries ++ Analytics.queries ++ TrainPrep.queries ++
      graft.sources.LakehouseQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approximate / stubbed ops)
    * get the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ WordCount.oracles ++ Events.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ graft.streaming.EventsStream.oracles ++
      GraftSql.oracles ++ Skew.oracles ++ graft.plans.Native.oracles ++
      Tokenizer.oracles ++ Decontam.oracles ++ Clustering.oracles ++
      Graph.oracles ++ BloomJoin.oracles ++ Incremental.oracles ++
      Sketches.oracles ++ Analytics.oracles ++ TrainPrep.oracles ++
      graft.sources.LakehouseQueries.oracles
}
