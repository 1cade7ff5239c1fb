package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends GraftSuite {
  import spark.implicits._

  test("salted join equals plain join on a pathologically skewed key") {
    // 50k rows all on ONE key + a tail — the shape AQE sees too late
    // when the skew appears mid-pipeline.
    val big = (Seq.fill(50000)(1L) ++ (2L to 1000L)).toDF("k")
      .withColumn("v", col("k") * 2)
    val small = (1L to 1000L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k").groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(big, small, "k", factor = 8)
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("dim1") == 50000L)
  }

  test("AQE splits a skewed shuffle-join partition at runtime (the default defense)") {
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force a shuffle join (both the static planner's broadcast AND
      // AQE's runtime SMJ->BHJ conversion disabled) and make the skew
      // thresholds small enough that a local-scale hot key trips them
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val big = (Seq.fill(200000)(1L) ++ (2L to 2000L)).toDF("k")
        .withColumn("pay", concat(lit("x" * 32), col("k")))
      val dim = (1L to 2000L).map(i => (i, s"d$i")).toDF("k", "name")
      val joined = big.join(dim, "k")
      // collect through THIS DataFrame so its own QueryExecution is the
      // one AQE finalizes (count() would plan a separate query)
      assert(joined.collect().length == 200000 + 1999) // correctness unaffected
      // the finalized adaptive plan marks the skewed partition as split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.toLowerCase.contains("skewed"),
        s"no skew split in plan:\n${plan.take(1500)}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt column never leaks into the result schema") {
    val big = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, "k", factor = 4)
    assert(!out.columns.contains("__salt"))
    assert(out.count() == 2)
  }
}
