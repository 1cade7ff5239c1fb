package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL query surface: register the warehouse tables as temp views and
  * run ANSI SQL through Spark's own parser/Catalyst — the "switch your
  * queries over unchanged" path for users of the reference engine who
  * want declarative access instead of the operator API.
  */
object GraftSql {

  /** Register every warehouse table under its canonical name. events
    * goes through Tables.events so its timestamp column arrives as a
    * real TimestampType whatever the on-disk encoding. Registration is
    * per-table fault-isolated: one unreadable/unparseable table must not
    * take down SQL over the other nine (a plan-time failure here would
    * otherwise kill queries that never touch the broken table).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      try {
        val df =
          if (name == "events") Tables.events(spark, dir)
          else Tables.load(spark, dir, name)
        df.createOrReplaceTempView(name)
      } catch {
        // ONLY the expected load-failure classes (missing dir, corrupt
        // footer, schema mismatch — IOException / SparkException /
        // AnalysisException). A genuine code bug in table wiring must
        // fail loudly here with its root cause, not degrade to a WARN
        // plus TABLE_OR_VIEW_NOT_FOUND three queries later.
        case e @ (_: java.io.IOException
                | _: org.apache.spark.SparkException
                | _: org.apache.spark.sql.AnalysisException) =>
          // Leave the table unregistered; only queries referencing it
          // fail (TABLE_OR_VIEW_NOT_FOUND), with the root cause logged.
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"graft: skipping unreadable table '$name': ${e.getMessage}")
      }
    }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }

  // A9 — the SQL interface exercised end-to-end (TPC-H Q6 flavor):
  // identical text runs in Spark and the DuckDB oracle.
  val revenueSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 25""".stripMargin

  def qSqlInterface(s: SparkSession, d: String): DataFrame =
    sql(s, d, revenueSql)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_interface" -> qSqlInterface)

  def oracles: Map[String, String] = Map(
    "q_sql_interface" -> revenueSql)
}
