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
}
