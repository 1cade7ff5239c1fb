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
class GraftMvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRegistry.isEmpty ||
        spark.conf.get("spark.graft.mvRewrite.enabled", "true") != "true")
      return plan
    plan.transformUp {
      case agg: Aggregate =>
        // never fail a query over a rewrite — but a swallowed bug means
        // silently paying base scans forever, so make it visible
        try rewrite(agg).getOrElse(agg)
        catch {
          case e: Exception =>
            logWarning(s"graft MV rewrite skipped (falling back to the " +
              s"base scan): $e")
            agg
        }
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
        scanOf(f.child).map { case (pth, v, cs) =>
          (pth, v, splitConjunctivePredicates(f.condition) ++ cs) }
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: GraftFileIndex => Some((g.tablePath, g.tableVersion, Nil))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  /** A57→A58: the JOIN shape — `base_l ⋈_joinCol base_r` (inner
    * equi-join on exactly one column, the USING-join plan Spark builds
    * for `l.join(r, Seq(c))`) under the same Project/Filter skin.
    * Filters collected from ABOVE and BELOW the join alike: for an
    * inner join, σ over one side's columns commutes through the join,
    * and the group-columns-only check in [[substitute]] then makes it
    * commute with γ too. Returns (leftPath, leftPinned, rightPath,
    * rightPinned, joinCol, filters). */
  private def scanJoinOf(p: LogicalPlan)
      : Option[(String, Int, String, Int, String,
          Seq[org.apache.spark.sql.catalyst.expressions.Expression])] =
    p match {
      case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
        scanJoinOf(child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        scanJoinOf(f.child).map { case (lp, lv, rp, rv, j, cs) =>
          (lp, lv, rp, rv, j, splitConjunctivePredicates(f.condition) ++ cs) }
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        j.condition match {
          case Some(org.apache.spark.sql.catalyst.expressions.EqualTo(
              a: AttributeReference, b: AttributeReference))
              if a.name == b.name =>
            for {
              (lp, lv, lcs) <- scanOf(j.left)
              (rp, rv, rcs) <- scanOf(j.right)
              // the equality's two attrs must come one from each side
              if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) ||
                (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
            } yield (lp, lv, rp, rv, a.name, lcs ++ rcs)
          case _ => None
        }
      case _ => None
    }

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // grouping must be bare columns
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val groupNames = groupAttrs.map(_.name).toSet
    if (groupNames.size != groupAttrs.size) return None
    scanOf(agg.child) match {
      case Some((path, pinned, filters)) =>
        MvRegistry.candidates(norm(path)).view.flatMap { mvRoot =>
          tryOne(mvRoot, agg, groupNames, pinned, filters)
        }.headOption
      case None => scanJoinOf(agg.child) match {
        case Some((lp, lv, rp, rv, joinCol, filters0)) =>
          // `isnotnull(joinCol)` conjuncts (user-written or inferred by
          // InferFiltersFromConstraints under every inner equi-join)
          // are IMPLIED by the join itself — null keys never join — so
          // they are sound to drop, not commute
          val filters = filters0.filterNot {
            case org.apache.spark.sql.catalyst.expressions.IsNotNull(
              a: AttributeReference) => a.name == joinCol
            case _ => false
          }
          (MvRegistry.candidates(norm(lp)) ++ MvRegistry.candidates(norm(rp)))
            .distinct.view.flatMap { mvRoot =>
              tryOneJoin(mvRoot, agg, groupNames, norm(lp), lv, norm(rp), rv,
                joinCol, filters)
            }.headOption
        case None => None
      }
    }
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
    if (MaterializedView.kindOf(mvRoot) != "single") return None
    val sp = MaterializedView.spec(mvRoot)
    // exact freshness: the MV must reflect precisely the pinned version.
    // The MV's own version is captured ONCE and the read below pins to
    // it — checking the head's mark and then re-resolving the head
    // would let a refresh landing in between substitute an MV snapshot
    // newer than the one this equality approved. A pin the head does
    // NOT match may still be served by an OLDER retained MV version
    // whose mark equals it (r11): the MV's own history is an exact
    // snapshot store of the aggregate, so time travel on the base
    // time-travels the rewrite — only a pin no refresh ever consumed
    // (or one vacuumed away) falls back to the scan.
    val head = Snapshots.currentVersion(mvRoot)
    val mvV: Int =
      (if (MaterializedView.consumedVersionAt(mvRoot, head) == Some(pinned))
        Some(head)
      else MaterializedView.versionThatConsumed(mvRoot, pinned)) match {
        case Some(v) => v
        case None => return None
      }
    // r12 — PREDICATE SUBSUMPTION for FILTERED MVs: the MV stores rows
    // of `WHERE p`; a query rewrites iff its own conjuncts CONTAIN p
    // (v1: equality; v2: p's conjuncts are a subset of the query's).
    // Matched conjuncts are consumed (the MV already applied them);
    // the residual must then pass [[substitute]]'s group-columns-only
    // test and is re-applied above the MV read. Conjuncts are compared
    // name-normalized (attribute exprIds differ between the query's
    // resolution and the spec predicate's own), with the spec predicate
    // ANALYZED against the same pinned base so literals take identical
    // internal form.
    val residual: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      sp.filter match {
        case None => filters
        case Some(f) =>
          val mvConjs = {
            // resolve the spec predicate against the MANIFEST schema
            // only (an empty LocalRelation) — reading the base here
            // would list its files and die on exactly the vanished
            // file the scan-free rewrite exists to tolerate
            val schema = Snapshots.tableSchema(sp.base, pinned)
              .getOrElse(return None)
            val analyzed = spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](),
              schema).filter(expr(f)).queryExecution.analyzed
            analyzed.collectFirst {
              case flt: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                splitConjunctivePredicates(flt.condition)
            }.getOrElse(return None)
          }
          val qNorm = filters.map(nameOnly)
          val mvNorm = mvConjs.map(nameOnly)
          val matched = mvNorm.map(qNorm.indexOf)
          // (nameOnly folds constants first: the spec predicate comes
          // from ANALYSIS, where `price > 150000` still carries
          // cast(150000 as double), while the query conjunct arrives
          // optimizer-folded to the bare double literal)
          // r12 v3 — RANGE IMPLICATION: an MV conjunct with no exact
          // twin may instead be IMPLIED by a query conjunct on the
          // same column (`x > 10` over an MV stored `WHERE x > 5`):
          // every row the query wants is in the MV. The implying
          // conjunct is NOT consumed — it stays in the residual, so it
          // must commute onto the MV read like any leftover filter
          // (group columns only; on a non-group column the rewrite
          // correctly refuses — the MV has no such column to filter).
          if (matched.zip(mvNorm).exists { case (i, mn) =>
                i < 0 && !qNorm.exists(qn => impliesRange(qn, mn)) })
            return None
          val matchedCols = mvConjs.flatMap(_.references.map(_.name)).toSet
          filters.zipWithIndex.collect {
            case (c, i) if !matched.contains(i) &&
              // an inferred `isnotnull(c)` is IMPLIED by a consumed
              // null-rejecting comparison on c — drop, don't commute
              !(c.isInstanceOf[
                  org.apache.spark.sql.catalyst.expressions.IsNotNull] &&
                c.references.forall(r => matchedCols.contains(r.name)) &&
                mvConjs.exists(mc =>
                  mc.isInstanceOf[org.apache.spark.sql.catalyst
                    .expressions.BinaryComparison] &&
                  mc.references.map(_.name).toSet
                    .intersect(c.references.map(_.name).toSet).nonEmpty)) =>
              c
          }
      }
    substitute(mvRoot, mvV, agg, groupNames, sp.groupCols.toSet,
      sp.sumCols.toSet, sp.minMaxCols.toSet, sp.distinctCols.toSet,
      residual)
  }

  /** Attribute-exprId-free view of a predicate for cross-resolution
    * conjunct equality: every resolved attribute collapses to its bare
    * name (the MV spec predicate and the user's query resolve the same
    * base columns under different exprIds). */
  private def nameOnly(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    val folded = e.transformUp {
      case f if f.foldable && !f.isInstanceOf[Literal] =>
        Literal.create(f.eval(null), f.dataType)
    }
    folded.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
    }
  }

  /** A [[nameOnly]]-normalized conjunct viewed as `column ⊙ literal`
    * with the attribute on the left (literal-first comparisons flip);
    * None for anything that isn't a single-column/literal comparison. */
  private def cmpBounds(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[(String, String, Literal)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case GreaterThan(a: UnresolvedAttribute, l: Literal) => Some((a.name, "gt", l))
      case GreaterThan(l: Literal, a: UnresolvedAttribute) => Some((a.name, "lt", l))
      case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) => Some((a.name, "ge", l))
      case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) => Some((a.name, "le", l))
      case LessThan(a: UnresolvedAttribute, l: Literal) => Some((a.name, "lt", l))
      case LessThan(l: Literal, a: UnresolvedAttribute) => Some((a.name, "gt", l))
      case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) => Some((a.name, "le", l))
      case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) => Some((a.name, "ge", l))
      case EqualTo(a: UnresolvedAttribute, l: Literal) => Some((a.name, "eq", l))
      case EqualTo(l: Literal, a: UnresolvedAttribute) => Some((a.name, "eq", l))
      case _ => None
    }
  }

  /** Does query conjunct `q` IMPLY MV conjunct `m`? Both must be
    * single-column comparisons against a non-NULL literal of the SAME
    * type on the SAME column; then `x > 10` implies `x > 5`,
    * `x = 7` implies `x >= 7`, etc. Literal order is decided by the
    * type's own Catalyst comparison (evaluated once, on two literals —
    * no data touched). Conservative: any unmatched shape is `false`
    * (fall back to the scan), never a guess. */
  private def impliesRange(
      q: org.apache.spark.sql.catalyst.expressions.Expression,
      m: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    (cmpBounds(q), cmpBounds(m)) match {
      case (Some((qa, qop, ql)), Some((ma, mop, ml)))
          if qa == ma && ql.dataType == ml.dataType &&
            ql.value != null && ml.value != null =>
        def cmp(c: BinaryComparison): Boolean =
          try c.eval(null) == true catch { case _: Exception => false }
        (mop, qop) match {
          // lower bounds: q's cut must sit at or above m's
          case ("ge", "ge") | ("ge", "gt") | ("ge", "eq") | ("gt", "gt") =>
            cmp(GreaterThanOrEqual(ql, ml))
          case ("gt", "ge") | ("gt", "eq") => cmp(GreaterThan(ql, ml))
          // upper bounds: mirror
          case ("le", "le") | ("le", "lt") | ("le", "eq") | ("lt", "lt") =>
            cmp(LessThanOrEqual(ql, ml))
          case ("lt", "le") | ("lt", "eq") => cmp(LessThan(ql, ml))
          case _ => false // eq target needs the exact-match path
        }
      case _ => false
    }
  }

  /** The join shape's per-MV attempt: the scanned (path, version) pair
    * must equal the join MV's two bases IN EITHER ORDER (the user may
    * write `r.join(l, …)`), the join column must be the MV's, and BOTH
    * pinned versions must equal the MV's two consumed watermarks at one
    * captured MV version (the two marks ride one commit, so they are
    * mutually consistent by construction). */
  private def tryOneJoin(mvRoot: String, agg: Aggregate,
      groupNames: Set[String], lPath: String, lPinned: Int,
      rPath: String, rPinned: Int, joinCol: String,
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[LogicalPlan] = {
    if (MaterializedView.kindOf(mvRoot) != "join") return None
    val sp = MaterializedView.joinSpec(mvRoot)
    if (sp.joinCol != joinCol) return None
    val (specL, specR) = (norm(sp.left), norm(sp.right))
    // a self-join (both scan sides the same path) would silently drop
    // lPinned in the map below and could pass the freshness check with
    // the two sides pinned at DIFFERENT versions — refuse outright
    // (createJoin's schema-overlap require makes this near-unreachable,
    // but the guard keeps the soundness local)
    if (lPath == rPath) return None
    val pins: Map[String, Int] = Map(lPath -> lPinned, rPath -> rPinned)
    if (pins.keySet != Set(specL, specR)) return None
    val head = Snapshots.currentVersion(mvRoot)
    val mvV: Int =
      (if (MaterializedView.consumedJoinVersionsAt(mvRoot, head) ==
          Some((pins(specL), pins(specR)))) Some(head)
      else MaterializedView.versionThatConsumedJoin(mvRoot,
        pins(specL), pins(specR))) match {
        case Some(v) => v
        case None => return None
      }
    substitute(mvRoot, mvV, agg, groupNames, sp.groupCols.toSet,
      sp.sumCols.toSet, sp.minMaxCols.toSet,
      Set.empty, // join MVs carry no sketch columns
      filters)
  }

  /** The shared tail of both shapes: decide answerability and build the
    * substitute plan over the MV read pinned at `mvV`. */
  private def substitute(mvRoot: String, mvV: Int, agg: Aggregate,
      groupNames: Set[String], mvGroups: Set[String],
      sums: Set[String], mms: Set[String], dist: Set[String],
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[LogicalPlan] = {
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
    val exact = groupNames == mvGroups

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
          // count(c) IS the stored non-null count the NULL-correct sum
          // already needs — served for every sum column, exactly
          case Count(Seq(a: AttributeReference)) if sums.contains(a.name) =>
            Some((if (exact) col(s"`nn_${a.name}`")
              else coalesce(sum(col(s"`nn_${a.name}`")), lit(0L)), AsAgg))
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
          // min/max serve from the A63 stored extrema (single-table and
          // join MVs alike): exact is a projection, the rollup
          // re-aggregates (min/max are associative, and the stored
          // extremum is the column's own type — no widening to
          // disagree over). An all-NULL group stores NULL, which both
          // the projection and the NULL-skipping re-aggregate preserve.
          case Min(a: AttributeReference) if mms.contains(a.name) =>
            Some(((if (exact) col(s"`mn_${a.name}`")
              else min(col(s"`mn_${a.name}`"))).cast(ne.dataType), AsAgg))
          case Max(a: AttributeReference) if mms.contains(a.name) =>
            Some(((if (exact) col(s"`mx_${a.name}`")
              else max(col(s"`mx_${a.name}`"))).cast(ne.dataType), AsAgg))
          case _ => None
        }
      // r13 — the APPROX-DISTINCT dashboard shape:
      // `hll_sketch_estimate(hll_sketch_agg(c))` over the base serves
      // from the MV's stored per-group sketch. Sound and BIT-EXACT
      // (not merely approximately equal): at a fixed lgConfigK the HLL
      // register state is a deterministic function of the value SET,
      // and register-wise union is lossless — so estimate(union(group
      // sketches)) equals estimate(sketch(all rows)). The query's own
      // lgConfigK must equal the MV's stored parameter or the rewrite
      // refuses; plain approx_count_distinct deliberately does NOT
      // rewrite (different algorithm — a substitution would change
      // the estimate).
      case Alias(org.apache.spark.sql.catalyst.expressions
          .HllSketchEstimate(AggregateExpression(
            hs: HllSketchAgg, Complete, false, None, _)), _)
          if hs.lgConfigK == MaterializedView.SketchLgK &&
            (hs.children.headOption.exists {
              case a: AttributeReference => dist.contains(a.name)
              case _ => false
            }) =>
        val name = hs.children.head.asInstanceOf[AttributeReference].name
        Some(((if (exact) hll_sketch_estimate(col(s"`sk_$name`"))
          else hll_sketch_estimate(hll_union_agg(col(s"`sk_$name`"))))
          .cast(ne.dataType), AsAgg))
      case _ => None
    }

    val answers0 = agg.aggregateExpressions.map(answer)
    if (answers0.exists(_.isEmpty)) return None
    val answers = answers0.flatten

    // the commuted filters apply to the MV read, rebound by NAME onto
    // the MV plan's own attributes (the originals carry the base
    // scan's exprIds)
    val mvDf = filters.foldLeft(Snapshots.read(spark, mvRoot, mvV)) { (df, cond) =>
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

/** The registry the rewrite rule consults: normalized base path → MV
  * roots. Registration is EXPLICIT (`register`), the same contract as
  * Databricks' `CREATE MATERIALIZED VIEW` making the MV visible to the
  * optimizer — an unregistered MV is just a table. SCOPE: the registry
  * is JVM-GLOBAL (like the snapshot log itself — an MV is a durable
  * on-disk object, not session state): registering an MV in any
  * session makes the rewrite available to every session in the JVM
  * whose optimizer carries the rule, and the per-query freshness pin
  * keeps that sound regardless of which session asks.
  */
object MvRegistry {

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, List[String]]()

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  /** Make `mvRoot` visible to the rewrite rule (and attach the rule to
    * `spark` if this session never built with GraftExtensions). A join
    * MV registers under BOTH base paths, so a query scanning either
    * base finds it as a candidate. */
  def register(spark: SparkSession, mvRoot: String): Unit = {
    val root = norm(mvRoot)
    val bases = MaterializedView.kindOf(mvRoot) match {
      case "join" =>
        val sp = MaterializedView.joinSpec(mvRoot)
        Seq(sp.left, sp.right)
      case _ => Seq(MaterializedView.spec(mvRoot).base)
    }
    bases.foreach(b => reg.compute(norm(b), (_, old) =>
      root :: Option(old).getOrElse(Nil).filterNot(_ == root)))
    ensureRegistered(spark)
  }

  /** r13 — A43 composition: register against a CATALOG TABLE NAME.
    * The rewrite rule keys on the RESOLVED path inside the relation
    * (`spark.table("t")` and `load(path)` produce the same
    * GraftFileIndex), so this resolves the table's storage location,
    * checks it IS one of the MV's bases, and registers as usual —
    * after which by-name dashboards rewrite exactly like path ones. */
  def registerByName(spark: SparkSession, table: String,
      mvRoot: String): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val ct = spark.sessionState.catalog.getTableMetadata(ident)
    val loc = ct.storage.properties.get("path")
      .orElse(ct.storage.locationUri.map(u => Paths.get(u).toString))
      .getOrElse(throw new IllegalArgumentException(
        s"graft: table $table has no storage path"))
    val path = norm(Snapshots.canonical(loc))
    val bases = (MaterializedView.kindOf(mvRoot) match {
      case "join" =>
        val sp = MaterializedView.joinSpec(mvRoot)
        Seq(sp.left, sp.right)
      case _ => Seq(MaterializedView.spec(mvRoot).base)
    }).map(b => norm(Snapshots.canonical(b)))
    require(bases.contains(path),
      s"graft: $table resolves to $path, which is not a base of $mvRoot " +
        s"(bases: ${bases.mkString(", ")})")
    register(spark, mvRoot)
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
    * same pattern as NativeTopK.ensureRegistered). A session built with
    * GraftExtensions already carries the injected rule in its optimizer
    * — adding an experimental copy there would double the optimizer
    * work (idempotent, but wasted), so it is skipped. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val injected =
      try spark.sessionState.optimizer.extendedOperatorOptimizationRules
        .exists(_.isInstanceOf[GraftMvRewriteRule])
      catch { case _: Exception => false }
    if (injected) return
    val exp = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.exists(_.isInstanceOf[GraftMvRewriteRule]))
      exp.extraOptimizations =
        exp.extraOptimizations :+ new GraftMvRewriteRule(spark)
  }
}
