package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends GraftSuite {

  test("co-bucketed join runs exchange-free and matches the plain join") {
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", buckets = 4)

    // force the fact-fact (non-broadcast) path: at sf0.001 both tables
    // fit the broadcast threshold, which would bypass bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, joined) =
      try {
        val j = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
        (j.queryExecution.executedPlan.toString, j)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // both sides pre-bucketed on the key: no shuffle in the join plan
    assert(!plan.contains("Exchange"), plan.take(800))

    val plain = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(joined.count() == plain)
  }
}
