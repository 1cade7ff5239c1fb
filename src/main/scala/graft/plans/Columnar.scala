package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{ColumnarRule, FileSourceScanExec, ProjectExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.functions.{FloatVecDistSq, FloatVecNorm, VecOps}

/** Vectorized (columnar-batch) execution for the vector kernels — the
  * columnar extension path (SURVEY.md §7 round-3 candidate),
  * complementing the row-codegen path the same kernels already have.
  *
  * The parquet vectorized reader produces [[ColumnarBatch]]es; the
  * default plan inserts a ColumnarToRow transition and evaluates
  * expressions row-by-row above it. This rule recognizes a projection
  * that only passes columns through and appends vector-kernel columns
  * — `vec_norm(v)` (E3) and `vec_dist_sq(v, centroid-literal)` (the
  * E4/E6 bulk-assignment shape: k distance columns against a broadcast
  * model) — and replaces it with [[VecKernelColumnarExec]], which stays
  * ON THE BATCH: passthrough columns are the scan's own vectors
  * (zero copy), and each kernel column is computed in one tight loop
  * into a fresh double vector, with the centroid literal unpacked to a
  * flat double[] ONCE per task rather than boxed per row. The row
  * transition then happens above the exec — after the math, not before
  * — which is the entire point of columnar execution engines (and of
  * Spark's own Arrow/Photon-style accelerator hook, `injectColumnar`,
  * used here).
  */
object VecKernelColumnarExec {
  /** Serializable per-output-column program: which child column feeds
    * it and which kernel (if any) runs over it.
    */
  sealed trait ColSpec extends Serializable
  final case class Pass(i: Int) extends ColSpec
  final case class Norm(i: Int) extends ColSpec
  final case class DistSq(i: Int, centroid: Array[Double]) extends ColSpec
}

case class VecKernelColumnarExec(
    projectList: Seq[NamedExpression],
    child: SparkPlan)
  extends UnaryExecNode {

  import VecKernelColumnarExec._

  override def output: Seq[Attribute] = projectList.map(_.toAttribute)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def supportsColumnar: Boolean = true

  // the transition insertion pass guarantees executeColumnar is the
  // entry point (supportsColumnar == true and no row fallback path)
  override protected def doExecute(): RDD[InternalRow] =
    throw new IllegalStateException(
      "VecKernelColumnarExec is columnar-only; transitions were not inserted")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val childIdx = child.output.map(_.exprId).zipWithIndex.toMap
    val specs: Array[ColSpec] = projectList.map {
      case a: Attribute => Pass(childIdx(a.exprId))
      case Alias(FloatVecNorm(v: Attribute), _) => Norm(childIdx(v.exprId))
      case Alias(FloatVecDistSq(v: Attribute, Literal(c: ArrayData, ArrayType(DoubleType, _))), _) =>
        DistSq(childIdx(v.exprId), c.toDoubleArray())
      case other => throw new IllegalStateException(s"unexpected projection $other")
    }.toArray
    child.executeColumnar().mapPartitions { batches =>
      batches.map { batch =>
        val n = batch.numRows()
        val cols: Array[ColumnVector] = specs.map {
          case Pass(i) => batch.column(i)
          case Norm(i) =>
            val in = batch.column(i)
            val out = new OnHeapColumnVector(n, DoubleType)
            var r = 0
            while (r < n) {
              if (in.isNullAt(r)) out.putNull(r)
              else out.putDouble(r, VecOps.norm(in.getArray(r)))
              r += 1
            }
            out
          case DistSq(i, c) =>
            val in = batch.column(i)
            val out = new OnHeapColumnVector(n, DoubleType)
            var r = 0
            while (r < n) {
              if (in.isNullAt(r)) out.putNull(r)
              else out.putDouble(r, VecOps.distSq(in.getArray(r), c))
              r += 1
            }
            out
        }
        new ColumnarBatch(cols, n)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): VecKernelColumnarExec =
    copy(child = newChild)
}

/** Matches `Project[passthrough columns + alias(vec_norm(col)) +
  * alias(vec_dist_sq(col, literal))...]` directly over a columnar file
  * scan and keeps it on the batch.
  */
object VecKernelColumnarPush extends Rule[SparkPlan] {
  private def kernel(p: NamedExpression): Boolean = p match {
    case Alias(FloatVecNorm(_), _) => true
    case Alias(FloatVecDistSq(_, _), _) => true
    case _ => false
  }

  private def rewritable(p: NamedExpression, scanOut: Seq[Attribute]): Boolean = p match {
    case a: Attribute => scanOut.exists(_.exprId == a.exprId)
    case Alias(FloatVecNorm(v: Attribute), _) => scanOut.exists(_.exprId == v.exprId)
    case Alias(FloatVecDistSq(v: Attribute, Literal(_: ArrayData, ArrayType(DoubleType, _))), _) =>
      scanOut.exists(_.exprId == v.exprId)
    case _ => false
  }

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case ProjectExec(list, scan: FileSourceScanExec)
        if scan.supportsColumnar &&
          list.exists(kernel) &&
          list.forall(rewritable(_, scan.output)) =>
      VecKernelColumnarExec(list, scan)
  }
}

class VecKernelColumnarRule extends ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] = VecKernelColumnarPush
}

/** Session wiring: `.withExtensions(new GraftColumnarExtensions)` (or
  * the `spark.sql.extensions` conf) — columnar rules have no post-hoc
  * experimental hook, unlike strategies.
  */
class GraftColumnarExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectColumnar(_ => new VecKernelColumnarRule)
}
