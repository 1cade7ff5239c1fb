package graft

import org.apache.spark.sql.functions._

import graft.plans.{NativeTopK, TopKPerKeyNode}

/** Native-plan block (SURVEY.md §2.2 B18): the custom
  * LogicalPlan/Rule/Strategy/SparkPlan top-k operator.
  */
class PlansSpec extends GraftSuite {

  test("native top-k matches the window row_number formulation") {
    val native = graft.plans.Native.qTopkNative(spark, sf)
    val orders = Tables.orders(spark, sf)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= 2 && col("o_custkey") % 10 === 0)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
    assert(native.columns.toSeq ===
      Seq("o_custkey", "rank", "o_orderkey", "o_totalprice"))
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
  }

  test("deterministic on score ties: lowest id wins, matches window form") {
    import spark.implicits._
    // 40 rows, 4 keys, every score identical -> pure id tiebreak
    val df = (0L until 40L).map(i => (i % 4, 1.0, i)).toDF("key", "score", "id")
    val native = NativeTopK.topKPerKey(df, Seq("key"), "score", "id", k = 3)
    val rows = native.orderBy("key", "rank").collect()
    assert(rows.length === 12)
    // key 0 holds ids 0,4,8,... -> top-3 by id asc = 0,4,8
    val key0 = rows.filter(_.getLong(0) == 0L).map(r => (r.getLong(1), r.getLong(2)))
    assert(key0.toSeq === Seq((1L, 0L), (2L, 4L), (3L, 8L)))
  }

  test("null scores and ids are dropped, never ranked") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Long)](
      (1L, 5.0, 10L), (1L, null, 11L), (1L, 4.0, null), (1L, 3.0, 12L))
      .toDF("key", "score", "id")
    val out = NativeTopK.topKPerKey(df, Seq("key"), "score", "id", k = 5)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(10L, 12L))
  }

  test("planner: partial below a single exchange, final above it") {
    val df = graft.plans.Native.qTopkNative(spark, sf)
    df.count() // materialize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly 1 exchange:\n$plan")
    // partial must be BELOW the exchange (runs map-side, pre-shuffle)
    assert(plan.indexOf("TopKPerKeyPartial") > plan.indexOf("Exchange"), plan)
    assert(plan.indexOf("TopKPerKeyFinal") < plan.indexOf("Exchange"), plan)
  }

  test("optimizer rule: key-only filter sinks through the node into the scan") {
    val base = NativeTopK.topKPerKey(
      Tables.orders(spark, sf), Seq("o_custkey"), "o_totalprice", "o_orderkey", 2)
      .filter(col("o_custkey") < 100)
    val optimized = base.queryExecution.optimizedPlan
    // after the rule the custom node is the plan root: no Filter above it
    assert(optimized.isInstanceOf[TopKPerKeyNode],
      s"filter should have sunk below TopKPerKeyNode:\n$optimized")
    // ...and the predicate reaches the parquet scan
    val physical = base.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("LessThan(o_custkey,100)"),
      s"expected o_custkey<100 pushed to the scan:\n$physical")
  }

  test("non-key filter stays above the node (rule must not fire)") {
    val base = NativeTopK.topKPerKey(
      Tables.orders(spark, sf), Seq("o_custkey"), "o_totalprice", "o_orderkey", 2)
      .filter(col("o_totalprice") > 0.0)
    val optimized = base.queryExecution.optimizedPlan
    assert(!optimized.isInstanceOf[TopKPerKeyNode],
      s"score filter must NOT sink below top-k:\n$optimized")
  }

  test("native expressions are callable from SQL text after registration") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  round(vec_cosine(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>),
        |                   CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)), 6) AS c,
        |  vec_norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS n,
        |  djb2('abc') AS d""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 5.0)
    // djb2: h = 5381, then h*33 + codepoint per char
    assert(r.getLong(2) === ((5381L * 33 + 'a') * 33 + 'b') * 33 + 'c')
  }

  test("empty input produces empty output") {
    val out = NativeTopK.topKPerKey(
      Tables.orders(spark, sf).filter(lit(false)),
      Seq("o_custkey"), "o_totalprice", "o_orderkey", 2)
    assert(out.count() === 0)
  }
}
