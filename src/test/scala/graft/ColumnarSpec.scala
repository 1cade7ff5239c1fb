package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.vec_norm

/** The vectorized columnar exec: a projection appending vec_norm over
  * a parquet scan must execute on ColumnarBatches (no row transition
  * below the math) and produce results identical to the row/codegen
  * expression path.
  */
class ColumnarSpec extends GraftSuite {

  private def withColumnarSession[T](f: SparkSession => T): T = {
    val prev = spark // realize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftColumnarExtensions)
      .getOrCreate() // reuses the JVM's SparkContext, fresh session state
    try f(s)
    finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("vec_norm projection runs columnar and matches the row path") {
    val expected = Tables.embeddings(spark, sf)
      .select(col("vec_id"), vec_norm(col("embedding")).as("l2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    withColumnarSession { s =>
      val df = Tables.embeddings(s, sf)
        .select(col("vec_id"), vec_norm(col("embedding")).as("l2"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("VecKernelColumnar"), plan.take(1200))
      // the batch math happens BELOW the single row transition: the
      // columnar exec's child is the scan, not a ColumnarToRow
      assert(!plan.matches("(?s).*VecKernelColumnar.*ColumnarToRow.*FileScan.*"), plan.take(1200))
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected)
      assert(got.nonEmpty)
    }
  }

  test("k-means assignment shape (k dist columns vs literal centroids) runs columnar") {
    // the E4/E6 bulk-assignment projection: passthrough + k
    // vec_dist_sq columns against broadcast centroid literals — the
    // second consumer of the batch kernel path
    import graft.functions.vec_dist_sq
    val cents: Seq[Seq[Double]] = Tables.embeddings(spark, sf)
      .orderBy("vec_id").limit(3).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    def q(s: SparkSession) = Tables.embeddings(s, sf).select(
      col("vec_id") +: cents.zipWithIndex.map { case (c, j) =>
        vec_dist_sq(col("embedding"), typedLit(c)).as(s"d$j")
      }: _*)
    val expected = q(spark).collect()
      .map(r => r.getLong(0) -> (1 to 3).map(r.getDouble).toSeq).toMap
    withColumnarSession { s =>
      val df = q(s)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("VecKernelColumnar"), plan.take(1200))
      assert(!plan.matches("(?s).*VecKernelColumnar.*ColumnarToRow.*FileScan.*"), plan.take(1200))
      val got = df.collect()
        .map(r => r.getLong(0) -> (1 to 3).map(r.getDouble).toSeq).toMap
      assert(got == expected)
      assert(got.nonEmpty)
    }
  }

  test("columnar rule leaves non-matching projections alone") {
    withColumnarSession { s =>
      // arithmetic over the norm → not a pure append-norm projection;
      // must fall back to the standard row/codegen plan and still agree
      val df = Tables.embeddings(s, sf)
        .select(col("vec_id"), (vec_norm(col("embedding")) * 2.0).as("x"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("VecKernelColumnar"), plan.take(800))
      val expected = Tables.embeddings(spark, sf)
        .select(col("vec_id"), (vec_norm(col("embedding")) * 2.0).as("x"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    }
  }
}
