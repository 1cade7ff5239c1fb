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

  test("both top-k stages run inside whole-stage codegen, no fallback") {
    // fallback=false turns a generated-code compile failure into a hard
    // error instead of a silent interpreted re-run — so a pass here
    // proves the generated code actually compiled and executed
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = graft.plans.Native.qTopkNative(spark, sf)
      assert(df.collect().length > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) TopKPerKeyPartial""".r.findFirstIn(plan).isDefined, plan)
      assert("""\*\(\d+\) TopKPerKeyFinal""".r.findFirstIn(plan).isDefined, plan)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
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

  test("numeric inputs are widened: INT scores and ids work via cast projection") {
    import spark.implicits._
    val df = Seq((1, 5, 10), (1, 9, 11), (1, 7, 12), (2, 3, 20))
      .toDF("key", "score", "id") // all INT columns
    val out = NativeTopK.topKPerKey(df, Seq("key"), "score", "id", k = 2)
      .orderBy("key", "rank").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq ===
      Seq((1, 1L, 11L, 9.0), (1, 2L, 12L, 7.0), (2, 1L, 20L, 3.0)))
  }

  test("as-of join widens INT keys and tiebreaks via cast projection") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val purchases = Seq((100, 1, ts(10))).toDF("event_id", "user_id", "ts")
    val clicks = Seq((1, 1, ts(5), 2.5)).toDF("event_id", "user_id", "ts", "value")
    val out = graft.plans.NativeAsOfJoin.asofJoin(
      purchases, clicks, "user_id", "ts",
      Seq("event_id"), Seq("value"), Seq("click_value")).collect()
    assert(out.length == 1 && out.head.getDouble(3) == 2.5)
  }

  test("empty input produces empty output") {
    val out = NativeTopK.topKPerKey(
      Tables.orders(spark, sf).filter(lit(false)),
      Seq("o_custkey"), "o_totalprice", "o_orderkey", 2)
    assert(out.count() === 0)
  }

  test("native as-of join agrees with the window composition on click_ts") {
    val native = graft.plans.Native.qAsofNative(spark, sf)
    // C5's composition carries only the click timestamp; compare the
    // shared columns (purchase id -> whether a click matched) plus
    // count parity
    val composed = graft.operators.Events.qAsofJoin(spark, sf)
    val nRows = native.collect().map(r =>
      (r.getLong(0), r.isNullAt(3))).toMap
    val cRows = composed.collect().map(r =>
      (r.getLong(0), r.isNullAt(3))).toMap
    assert(nRows.keySet === cRows.keySet)
    // a purchase has a matched click in the native plan iff the window
    // composition found a last_click_ts
    assert(nRows === cRows)
  }

  test("native as-of join: merge semantics on a synthetic stream") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val purchases = Seq(
      (100L, 1L, ts(10)), (101L, 1L, ts(30)), (102L, 2L, ts(5)), (103L, 3L, ts(1)))
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (1L, 1L, ts(10), 1.0),  // same minute as purchase 100 (>= matches)
      (2L, 1L, ts(10), 2.0),  // tie: higher event_id must win
      (3L, 1L, ts(20), 3.0),  // latest before purchase 101
      (4L, 2L, ts(9), 4.0))   // AFTER purchase 102 -> no match for user 2
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.plans.NativeAsOfJoin.asofJoin(
      purchases, clicks, "user_id", "ts",
      Seq("event_id"), Seq("event_id", "value"), Seq("click_id", "click_value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
    assert(out.toSeq === Seq(
      (100L, 2L, 2.0),  // tie at ts(10): event 2 beats event 1
      (101L, 3L, 3.0),  // latest <= ts(30) is ts(20)
      (102L, -1L, -1.0), // user 2's only click is later
      (103L, -1L, -1.0))) // user 3 has no clicks
  }

  test("native as-of join plans as co-partitioned sorted merge, no window") {
    val df = graft.plans.Native.qAsofNative(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange".r.findAllIn(plan).length === 2, s"want 2 exchanges:\n$plan")
    assert(plan.contains("Sort "), plan)
    assert(!plan.contains("Window"), s"native path must not fall back to a window:\n$plan")
  }

  test("as-of merge pass runs inside whole-stage codegen, no fallback") {
    // fallback=false: a generated-code compile failure becomes a hard
    // error, so a pass proves the merge loop compiled and executed
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = graft.plans.Native.qAsofNative(spark, sf)
      assert(df.collect().length > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
        s"AsOfJoin not inside a WholeStageCodegen span:\n$plan")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
