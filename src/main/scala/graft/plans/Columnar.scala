package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, FileSourceScanExec, ProjectExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.functions.{FloatVecNorm, VecOps}

/** Vectorized (columnar-batch) execution for the vector-norm kernel —
  * the columnar extension path (SURVEY.md §7 round-3 candidate),
  * complementing the row-codegen path the same kernel already has.
  *
  * The parquet vectorized reader produces [[ColumnarBatch]]es; the
  * default plan inserts a ColumnarToRow transition and evaluates
  * expressions row-by-row above it. This rule recognizes a projection
  * that only passes columns through and appends `vec_norm(...)`
  * columns, and replaces it with [[VecNormColumnarExec]], which stays
  * ON THE BATCH: passthrough columns are the scan's own vectors
  * (zero copy), and each norm column is computed in one tight loop
  * into a fresh double vector. The row transition then happens above
  * the exec — after the math, not before — which is the entire point
  * of columnar execution engines (and of Spark's own Arrow/Photon-
  * style accelerator hook, `injectColumnar`, used here).
  */
case class VecNormColumnarExec(
    projectList: Seq[NamedExpression],
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = projectList.map(_.toAttribute)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def supportsColumnar: Boolean = true

  // the transition insertion pass guarantees executeColumnar is the
  // entry point (supportsColumnar == true and no row fallback path)
  override protected def doExecute(): RDD[InternalRow] =
    throw new IllegalStateException(
      "VecNormColumnarExec is columnar-only; transitions were not inserted")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    // resolve each output to a child column index: srcs(j) >= 0 passes
    // child column j through; srcs(j) = -(i+1) computes norm of child
    // column i (a flat Int encoding keeps the task closure trivially
    // serializable)
    val childIdx = child.output.map(_.exprId).zipWithIndex.toMap
    val srcs: Array[Int] = projectList.map {
      case a: Attribute => childIdx(a.exprId)
      case Alias(FloatVecNorm(v: Attribute), _) => -(childIdx(v.exprId) + 1)
      case other => throw new IllegalStateException(s"unexpected projection $other")
    }.toArray
    child.executeColumnar().mapPartitions { batches =>
      batches.map { batch =>
        val n = batch.numRows()
        val cols: Array[ColumnVector] = srcs.map { s =>
          if (s >= 0) batch.column(s)
          else {
            val in = batch.column(-s - 1)
            val out = new OnHeapColumnVector(n, DoubleType)
            var r = 0
            while (r < n) {
              if (in.isNullAt(r)) out.putNull(r)
              else out.putDouble(r, VecOps.norm(in.getArray(r)))
              r += 1
            }
            out
          }
        }
        new ColumnarBatch(cols, n)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): VecNormColumnarExec =
    copy(child = newChild)
}

/** Matches `Project[passthrough columns + alias(vec_norm(col))...]`
  * directly over a columnar file scan and keeps it on the batch.
  */
object VecNormColumnarPush extends Rule[SparkPlan] {
  private def rewritable(p: NamedExpression, scanOut: Seq[Attribute]): Boolean = p match {
    case a: Attribute => scanOut.exists(_.exprId == a.exprId)
    case Alias(FloatVecNorm(v: Attribute), _) => scanOut.exists(_.exprId == v.exprId)
    case _ => false
  }

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case ProjectExec(list, scan: FileSourceScanExec)
        if scan.supportsColumnar &&
          list.exists { case Alias(FloatVecNorm(_), _) => true; case _ => false } &&
          list.forall(rewritable(_, scan.output)) =>
      VecNormColumnarExec(list, scan)
  }
}

class VecNormColumnarRule extends ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] = VecNormColumnarPush
}

/** Session wiring: `.withExtensions(new GraftColumnarExtensions)` (or
  * the `spark.sql.extensions` conf) — columnar rules have no post-hoc
  * experimental hook, unlike strategies.
  */
class GraftColumnarExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectColumnar(_ => new VecNormColumnarRule)
}
