package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose
  * graft's native Catalyst expressions as user-facing `Column`s on
  * Spark 4.x where `new Column(expr)` no longer exists.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A50 bridges into `private[sql]` `BucketingUtils`: the graft
    * bucketed layout must tag and parse data-file names with EXACTLY
    * Spark's own convention — a home-grown rendition that drifted from
    * `FileSourceScanExec`'s parser would silently mis-group buckets.
    */
  def bucketIdToString(id: Int): String =
    execution.datasources.BucketingUtils.bucketIdToString(id)
  def bucketIdOf(fileName: String): Option[Int] =
    execution.datasources.BucketingUtils.getBucketId(fileName)

  /** r16 — non-blocking read of an [[Observation]]'s metrics
    * (`getOrEmpty` is `private[spark]`): the merge paths ride their
    * emptiness/cardinality counts on the batch checkpoint job via
    * `observe()`, and the publishing listener is async — the caller
    * polls this briefly and falls back to a plain aggregate rather
    * than blocking forever on `get`. */
  def observedOrEmpty(obs: Observation): Map[String, Any] =
    obs.getOrEmpty
}
