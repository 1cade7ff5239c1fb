package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into the one `private[sql]` constructor a plan-extension
  * library needs: wrapping a custom [[LogicalPlan]] node in a DataFrame
  * (`Dataset.ofRows`). Spark exposes extension POINTS publicly
  * (`SparkSessionExtensions`, `experimental.extraStrategies` /
  * `extraOptimizations`) but not plan CONSTRUCTION, so every
  * out-of-tree plan library ships exactly this shim. Nothing else in
  * graft reaches into `private[sql]` space.
  */
object GraftSqlInternals {

  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(session.asInstanceOf[ClassicSparkSession], plan)

  /** Post-hoc SQL function registration for sessions graft did not
    * build (the build-time path is `GraftExtensions.injectFunction`).
    */
  def registerTempFunction(
      session: SparkSession,
      name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    session.asInstanceOf[ClassicSparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
