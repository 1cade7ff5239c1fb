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

  test("salt column never leaks into the result schema") {
    val big = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, "k", factor = 4)
    assert(!out.columns.contains("__salt"))
    assert(out.count() == 2)
  }
}
