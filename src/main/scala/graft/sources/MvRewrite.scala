package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A58 — MV-AWARE QUERY REWRITE: the capability A55 materialized
  * views exist to serve. An injected optimizer rule matches a
  * `groupBy(g).agg(count/sum/avg)` — SQL or DataFrame, it runs on the
  * analyzed logical plan either way — over a graft base relation
  * against a REGISTERED A55 MV and substitutes the MV read, so the
  * warehouse pattern "query the base, pay the MV" works without the
  * user ever naming the MV (Oracle/BigQuery/Databricks MV rewrite
  * semantics). Two shapes rewrite:
  *
  *  - EXACT: the query groups by exactly the MV's group columns — the
  *    Aggregate is replaced by a PROJECTION over the MV (no shuffle at
  *    all; the plan's only scan is the MV).
  *  - ROLLUP: the query groups by a strict SUBSET of the MV's group
  *    columns — count/sum/avg re-aggregate from the MV's stored
  *    `cnt`/`s_c`/`nn_c` (count→Σcnt, sum→Σs_c with the NULL-iff-no-
  *    contributor rule from Σnn_c, avg→Σs_c/Σnn_c — all exact because
  *    count and sum are associative), shrinking the shuffle input from
  *    |base| rows to |MV groups|.
  *
  * FRESHNESS is exact, not ≥: the rewrite fires only when the MV's
  * consumed version EQUALS the version the base relation is pinned to.
  * A stale MV (consumed < pinned) must not serve — that is the
  * documented fallback — but an OVER-fresh MV (consumed > pinned, e.g.
  * the query time-travels, or the base moved after the DataFrame was
  * resolved) must not serve either: it would answer from a different
  * snapshot than the one the user's plan pinned. Snapshot semantics
  * beat staleness-window semantics; a user who wants "whatever is
  * newest" re-resolves and the versions match again.
  *
  * SOUNDNESS of the match: grouping expressions must be bare base
  * columns equal (as a set) to — or a subset of — the MV's group
  * columns; aggregates must be undistinct, unfiltered count(*)/
  * count(lit)/sum(c)/avg(c) with c among the MV's sum columns; a
  * Filter between the Aggregate and the scan rewrites ONLY when every
  * conjunct references MV GROUP columns alone (σ over group columns
  * commutes with γ, so the predicate applies to the MV read — the
  * `WHERE region = …` dashboard shape); any predicate touching a
  * non-group column disqualifies (the MV pre-aggregated those rows
  * away). The relation must not be DV-carrying or column-mapped
  * (those plan through GraftCompatRelation, which this rule
  * deliberately does not match).
  * sum/avg rewrite only for integral and double inputs: the MV stores
  * integral running sums widened to LONG (exactly SQL's sum widening)
  * and double sums as double; float/decimal inputs are refused because
  * the MV's storage type is narrower than SQL's sum result type, so a
  * rewrite could disagree with a recompute in the last bits.
  *
  * At 100 TB this is the difference between a dashboard aggregate
  * costing a full base scan per refresh and costing an |MV|-row read:
  * the base scan disappears from the plan entirely (the correctness
  * gate pins this by DELETING a live base data file before running
  * the rewritten query — only a genuinely scan-free plan survives).
  */
class GraftMvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRegistry.isEmpty ||
        spark.conf.get("spark.graft.mvRewrite.enabled", "true") != "true")
      return plan
    plan.transformUp {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case _: Exception => agg } // never fail a query over a rewrite
    }
  }

  /** The graft base (path, pinned version, filter conjuncts between
    * the aggregate and the scan) this plan scans — column-pruning
    * Projects and Filters allowed, nothing else. Whether the filters
    * permit a rewrite is decided per-MV in [[tryOne]] (a predicate
    * over GROUP columns commutes with the aggregation, so it can apply
    * to the MV read instead — the `WHERE region = …` dashboard shape). */
  private def scanOf(p: LogicalPlan)
      : Option[(String, Int, Seq[org.apache.spark.sql.catalyst.expressions.Expression])] =
    p match {
      case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
        scanOf(child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        scanOf(f.child).map { case (pth, v, cs) => (pth, v, f.condition +: cs) }
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: GraftFileIndex => Some((g.tablePath, g.tableVersion, Nil))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (path, pinned, filters) = scanOf(agg.child) match {
      case Some(t) => t
      case None => return None
    }
    val candidates = MvRegistry.candidates(norm(path))
    if (candidates.isEmpty) return None
    // grouping must be bare columns
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val groupNames = groupAttrs.map(_.name).toSet
    if (groupNames.size != groupAttrs.size) return None
    candidates.view.flatMap { mvRoot =>
      tryOne(mvRoot, agg, groupNames, pinned, filters)
    }.headOption
  }

  // how an original output answers from the MV: a group column riding
  // through, a constant riding through, or a genuine re-aggregate
  private sealed trait Kind
  private case object AsGroup extends Kind
  private case object AsConst extends Kind
  private case object AsAgg extends Kind

  private def tryOne(mvRoot: String, agg: Aggregate,
      groupNames: Set[String], pinned: Int,
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[LogicalPlan] = {
    val sp = MaterializedView.spec(mvRoot)
    val mvGroups = sp.groupCols.toSet
    if (!groupNames.subsetOf(mvGroups)) return None
    // a filter rewrites only when every conjunct is deterministic,
    // subquery-free, and references MV GROUP columns alone — whole
    // groups then pass or fail identically over base and MV (σ over
    // group columns commutes with γ). Anything else disqualifies the
    // whole rewrite, never a part of it.
    if (!filters.forall(f => f.deterministic &&
        f.references.forall(r => mvGroups.contains(r.name)) &&
        f.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.SubqueryExpression])
          .isEmpty))
      return None
    // exact freshness: the MV must reflect precisely the pinned version
    if (MaterializedView.consumedVersion(mvRoot) != pinned) return None
    val exact = groupNames == mvGroups
    val sums = sp.sumCols.toSet

    // one Column over the MV's raw shape per original output; None =
    // this output is not answerable from the MV
    def answer(ne: NamedExpression): Option[(Column, Kind)] = ne match {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some((col(s"`${a.name}`"), AsGroup))
      case Alias(a: AttributeReference, _) if groupNames.contains(a.name) =>
        Some((col(s"`${a.name}`"), AsGroup))
      case Alias(l: Literal, _) =>
        Some((org.apache.spark.sql.GraftSqlBridge.toColumn(l), AsConst))
      case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
        fn match {
          case Count(Seq(Literal(v, _))) if v != null =>
            // the rollup coalesces: a GLOBAL count over an empty MV is
            // sum-of-nothing = NULL, but count(*) of an empty base is 0
            Some((if (exact) col("cnt")
              else coalesce(sum(col("cnt")), lit(0L)), AsAgg))
          case Sum(a: AttributeReference, _)
              if sums.contains(a.name) && sumRewritable(a.dataType) =>
            val (s, nn) =
              if (exact) (col(s"`s_${a.name}`"), col(s"`nn_${a.name}`"))
              else (sum(col(s"`s_${a.name}`")), sum(col(s"`nn_${a.name}`")))
            Some((when(nn === 0L, lit(null)).otherwise(s)
              .cast(ne.dataType), AsAgg))
          case Average(a: AttributeReference, _)
              if sums.contains(a.name) && sumRewritable(a.dataType) &&
                !ne.dataType.isInstanceOf[DecimalType] =>
            val (s, nn) =
              if (exact) (col(s"`s_${a.name}`"), col(s"`nn_${a.name}`"))
              else (sum(col(s"`s_${a.name}`")), sum(col(s"`nn_${a.name}`")))
            Some((when(nn === 0L, lit(null))
              .otherwise(s.cast(DoubleType) / nn.cast(DoubleType))
              .cast(ne.dataType), AsAgg))
          case _ => None
        }
      case _ => None
    }

    val answers0 = agg.aggregateExpressions.map(answer)
    if (answers0.exists(_.isEmpty)) return None
    val answers = answers0.flatten

    // the commuted filters apply to the MV read, rebound by NAME onto
    // the MV plan's own attributes (the originals carry the base
    // scan's exprIds)
    val mvDf = filters.foldLeft(Snapshots.read(spark, mvRoot)) { (df, cond) =>
      val byName = df.queryExecution.analyzed.output.map(a => a.name -> a).toMap
      df.filter(org.apache.spark.sql.GraftSqlBridge.toColumn(cond.transform {
        case a: AttributeReference => byName(a.name)
      }))
    }
    val sub: DataFrame =
      if (exact)
        mvDf.select(answers.zipWithIndex.map { case ((c, _), i) =>
          c.as(s"__c$i") }: _*)
      else {
        // the rollup needs at least one genuine aggregate to hang the
        // re-aggregation on (a groups-only rollup is a DISTINCT — the
        // MV cannot distinguish it from its full key set, so refuse)
        val aggCols = answers.zipWithIndex.collect {
          case ((c, AsAgg), i) => c.as(s"__c$i")
        }
        if (aggCols.isEmpty) return None
        val grouped = mvDf
          .groupBy(groupNames.toSeq.sorted.map(g => col(s"`$g`")): _*)
          .agg(aggCols.head, aggCols.tail: _*)
        // restore original output order; group cols and constants ride
        // AFTER the aggregation (constants must not enter agg())
        grouped.select(answers.zipWithIndex.map {
          case ((c, AsAgg), i) => col(s"`__c$i`")
          case ((c, _), i) => c.as(s"__c$i")
        }: _*)
      }
    val subPlan = sub.queryExecution.analyzed
    // bind the substitute's outputs to the ORIGINAL Aggregate's output
    // attributes (name + exprId), so every parent reference resolves
    val proj = agg.output.zip(subPlan.output).map { case (o, a) =>
      Alias(a, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }
    Some(Project(proj, subPlan))
  }

  /** Inputs whose MV running-sum type equals SQL's sum result type:
    * integrals (both LONG) and double. Float sums widen to double and
    * decimal sums widen precision — the stored narrower sum could
    * disagree with a recompute, so those never rewrite. */
  private def sumRewritable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DoubleType => true
    case _ => false
  }
}

/** The session-shared registry the rewrite rule consults: normalized
  * base path → MV roots. Registration is EXPLICIT (`register`), the
  * same contract as Databricks' `CREATE MATERIALIZED VIEW` making the
  * MV visible to the optimizer — an unregistered MV is just a table.
  */
object MvRegistry {

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, List[String]]()

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  /** Make `mvRoot` visible to the rewrite rule (and attach the rule to
    * `spark` if this session never built with GraftExtensions). */
  def register(spark: SparkSession, mvRoot: String): Unit = {
    val sp = MaterializedView.spec(mvRoot) // refuses join MVs
    val root = norm(mvRoot)
    reg.compute(norm(sp.base), (_, old) =>
      root :: Option(old).getOrElse(Nil).filterNot(_ == root))
    ensureRegistered(spark)
  }

  def unregister(mvRoot: String): Unit = {
    val root = norm(mvRoot)
    reg.replaceAll((_, mvs) => mvs.filterNot(_ == root))
    reg.entrySet().removeIf(_.getValue.isEmpty)
  }

  def clear(): Unit = reg.clear()

  private[sources] def isEmpty: Boolean = reg.isEmpty

  private[sources] def candidates(base: String): Seq[String] =
    Option(reg.get(base)).getOrElse(Nil)

  /** Post-hoc rule attachment for sessions graft did not build (the
    * same pattern as NativeTopK.ensureRegistered). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.exists(_.isInstanceOf[GraftMvRewriteRule]))
      exp.extraOptimizations =
        exp.extraOptimizations :+ new GraftMvRewriteRule(spark)
  }
}
