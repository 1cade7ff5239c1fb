package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Snapshots

/** SQL-text surface for the lakehouse maintenance operations (the
  * Delta-parity DDL a warehouse operator types, not codes): an
  * injected ParserInterface intercepts `GRAFT <verb> …` statements and
  * plans them as driver-side runnable commands; EVERYTHING else
  * delegates to Spark's own parser untouched. This is the same
  * `SparkSessionExtensions.injectParser` hook the real table formats
  * use for `VACUUM`/`OPTIMIZE`; the `GRAFT` prefix keeps the grammar
  * trivially non-colliding with ANSI SQL (one `startsWith` decides the
  * route, so the hot SQL path pays nothing).
  *
  * Grammar (paths single-quoted; case-insensitive):
  * {{{
  *   GRAFT VACUUM '<path>' KEEP <version>
  *   GRAFT VACUUM '<path>' KEEP <version> DRY RUN      -- A40 plan only
  *   GRAFT VACUUM '<path>' BEFORE <epochMillis>        -- A40 retention
  *   GRAFT RESTORE '<path>' TO VERSION <version>
  *   GRAFT OPTIMIZE '<path>'
  *   GRAFT OPTIMIZE '<path>' ZORDER BY (<c1>, <c2>) INTO <n> FILES
  *   GRAFT OPTIMIZE '<path>' ZORDER INCREMENTAL      -- A39 tail-only
  *   GRAFT RECONCILE '<path>'                      -- fold DVs (A30)
  *   GRAFT CLONE '<src>' TO '<dst>'                -- shallow (A29)
  *   GRAFT ENABLE CHANGE DATA FEED '<path>'        -- A31 property
  *   GRAFT ADD CONSTRAINT <name> '<path>' CHECK (<expr>)   -- A34
  *   GRAFT DROP CONSTRAINT <name> '<path>'
  *   GRAFT UPDATE '<path>' SET <c> = <expr> [, …] WHERE <pred>  -- A35
  *   GRAFT ADD BLOOM INDEX <col> '<path>'              -- A41 skipping
  *   GRAFT REINDEX BLOOM '<path>'
  *   GRAFT TAG <name> '<path>' [AT VERSION <n>]            -- A37 refs
  *   GRAFT DROP TAG <name> '<path>'
  *   GRAFT BRANCH <name> '<path>'
  *   GRAFT PUBLISH BRANCH <name> '<path>'
  *   GRAFT DROP BRANCH <name> '<path>'
  *   GRAFT DESCRIBE HISTORY '<path>'
  * }}}
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    if (!looksGraft(sqlText))
      ResolveGraftPath.rewrite(delegate.parsePlan(sqlText))
    else sqlText match {
      case ZorderInc(p) => LakeMaintenanceCommand("version",
        s => Snapshots.compactZOrderIncremental(s, p).toLong)
      case Zorder(p, c1, c2, n) => LakeMaintenanceCommand("version",
        s => Snapshots.compactZOrder(s, p, c1, c2, n.toInt).toLong)
      case Optimize(p) => LakeMaintenanceCommand("version",
        s => Snapshots.compact(s, p).toLong)
      case VacuumDry(p, keep) => LakeVacuumDryRunCommand(p, keep.toInt)
      case VacuumBefore(p, ts) => LakeMaintenanceCommand("reclaimed",
        _ => Snapshots.vacuumBefore(p, ts.toLong).toLong)
      case Vacuum(p, keep) => LakeMaintenanceCommand("reclaimed",
        _ => Snapshots.vacuum(p, keep.toInt).toLong)
      case Restore(p, v) => LakeMaintenanceCommand("version",
        _ => Snapshots.restore(p, v.toInt).toLong)
      case Reconcile(p) => LakeMaintenanceCommand("version",
        s => Snapshots.reconcileDV(s, p).toLong)
      case CloneTo(src, dst) => LakeMaintenanceCommand("version",
        _ => Snapshots.cloneShallow(src, dst).toLong)
      case EnableCdf(p) => LakeMaintenanceCommand("version",
        _ => Snapshots.enableChangeDataFeed(p).toLong)
      case AddCons(n, p, e) => LakeMaintenanceCommand("version",
        s => Snapshots.addConstraint(s, p, n, e).toLong)
      case DropCons(n, p) => LakeMaintenanceCommand("version",
        _ => Snapshots.dropConstraint(p, n).toLong)
      case Update(p, setClause, pred) =>
        // assignments parse NOW (a malformed SET fails at parse time,
        // like any SQL); expression COLUMNS build at run time via the
        // session in hand
        val assigns = splitAssignments(setClause).map { a =>
          a.split("=", 2) match {
            case Array(n, e) if n.trim.matches("\\w+") && e.trim.nonEmpty =>
              (n.trim, e.trim)
            case _ => throw new org.apache.spark.sql.catalyst.parser.ParseException(
              Option(sqlText), org.apache.spark.sql.catalyst.trees.Origin(),
              "PARSE_SYNTAX_ERROR",
              Map("error" -> s"malformed SET assignment '$a'",
                "hint" -> "expected <column> = <expression>"))
          }
        }
        LakeMaintenanceCommand("version", s =>
          Snapshots.updateVersioned(s, p,
            org.apache.spark.sql.functions.expr(pred),
            assigns.map { case (n, e) =>
              n -> org.apache.spark.sql.functions.expr(e) }).toLong)
      case AddBloom(c, p) => LakeMaintenanceCommand("version",
        s => Snapshots.addBloomIndex(s, p, c).toLong)
      case ReindexBloom(p) => LakeMaintenanceCommand("version",
        s => Snapshots.reindexBloom(s, p).toLong)
      case TagAt(n, p, v) => LakeMaintenanceCommand("version",
        _ => graft.sources.Refs.tag(p, n, v.toInt).toLong)
      case Tag(n, p) => LakeMaintenanceCommand("version",
        _ => graft.sources.Refs.tag(p, n).toLong)
      case DropTag(n, p) => LakeMaintenanceCommand("version",
        _ => { graft.sources.Refs.dropTag(p, n); 0L })
      case PublishBranch(n, p) => LakeMaintenanceCommand("version",
        s => graft.sources.Refs.publish(s, p, n).toLong)
      case Branch(n, p) => LakeMaintenanceCommand("version",
        s => { graft.sources.Refs.createBranch(s, p, n); 0L })
      case DropBranch(n, p) => LakeMaintenanceCommand("version",
        _ => { graft.sources.Refs.dropBranch(p, n); 0L })
      case History(p) => LakeHistoryCommand(p)
      // a GRAFT-prefixed statement that matches no rule must FAIL as
      // graft grammar (the delegate would emit a useless ANSI error)
      case _ => throw new org.apache.spark.sql.catalyst.parser.ParseException(
        Option(sqlText), org.apache.spark.sql.catalyst.trees.Origin(),
        "PARSE_SYNTAX_ERROR",
        Map("error" -> "malformed GRAFT statement", "hint" ->
          "see graft.plans.GraftSqlParser for the GRAFT grammar"))
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private def looksGraft(s: String): Boolean =
    s.trim.regionMatches(true, 0, "GRAFT", 0, 5)

  // whole-string regexes (Scala's Regex.unapplySeq anchors both ends)
  private val Vacuum =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s+KEEP\s+(\d+)\s*;?\s*""".r
  private val VacuumDry =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s+KEEP\s+(\d+)\s+DRY\s+RUN\s*;?\s*""".r
  private val VacuumBefore =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s+BEFORE\s+(\d+)\s*;?\s*""".r
  private val Restore =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s*;?\s*""".r
  private val Zorder =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s+INTO\s+(\d+)\s+FILES\s*;?\s*""".r
  private val ZorderInc =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+ZORDER\s+INCREMENTAL\s*;?\s*""".r
  private val Reconcile =
    """(?is)\s*GRAFT\s+RECONCILE\s+'([^']+)'\s*;?\s*""".r
  private val CloneTo =
    """(?is)\s*GRAFT\s+CLONE\s+'([^']+)'\s+TO\s+'([^']+)'\s*;?\s*""".r
  private val EnableCdf =
    """(?is)\s*GRAFT\s+ENABLE\s+CHANGE\s+DATA\s+FEED\s+'([^']+)'\s*;?\s*""".r
  private val AddCons =
    """(?is)\s*GRAFT\s+ADD\s+CONSTRAINT\s+(\w+)\s+'([^']+)'\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropCons =
    """(?is)\s*GRAFT\s+DROP\s+CONSTRAINT\s+(\w+)\s+'([^']+)'\s*;?\s*""".r
  private val Update =
    """(?is)\s*GRAFT\s+UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val AddBloom =
    """(?is)\s*GRAFT\s+ADD\s+BLOOM\s+INDEX\s+(\w+)\s+'([^']+)'\s*;?\s*""".r
  private val ReindexBloom =
    """(?is)\s*GRAFT\s+REINDEX\s+BLOOM\s+'([^']+)'\s*;?\s*""".r
  private val TagAt =
    """(?is)\s*GRAFT\s+TAG\s+([\w.-]+)\s+'([^']+)'\s+AT\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val Tag =
    """(?is)\s*GRAFT\s+TAG\s+([\w.-]+)\s+'([^']+)'\s*;?\s*""".r
  private val DropTag =
    """(?is)\s*GRAFT\s+DROP\s+TAG\s+([\w.-]+)\s+'([^']+)'\s*;?\s*""".r
  private val Branch =
    """(?is)\s*GRAFT\s+BRANCH\s+([\w.-]+)\s+'([^']+)'\s*;?\s*""".r
  private val PublishBranch =
    """(?is)\s*GRAFT\s+PUBLISH\s+BRANCH\s+([\w.-]+)\s+'([^']+)'\s*;?\s*""".r
  private val DropBranch =
    """(?is)\s*GRAFT\s+DROP\s+BRANCH\s+([\w.-]+)\s+'([^']+)'\s*;?\s*""".r
  private val History =
    """(?is)\s*GRAFT\s+DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r

  /** Split a SET clause on TOP-LEVEL commas only — `f(a, b)` in an
    * assignment expression must not split (paren depth + string
    * literals tracked; no regex can do this). */
  private def splitAssignments(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case c if inStr => cur += c
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

/** A36 — SQL-text access to versioned tables by format-qualified path:
  * `SELECT … FROM graft.`/path/to/table`` (the `delta.`path``
  * ergonomics). Spark's own ResolveSQLOnFile admits only FILE formats
  * and THROWS for any other registered source before an injected
  * resolution rule could act (extended rules append to the same
  * fixed-point batch, and the exception aborts the pass) — so the
  * rewrite runs at PARSE time instead, inside the already-injected
  * [[GraftSqlParser]], where the plan is still ours to shape. Guarded
  * on the path actually being a versioned table, so a genuine catalog
  * table named `graft` is never hijacked.
  */
object ResolveGraftPath {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  def rewrite(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          graft.sources.Snapshots.currentVersion(u.multipartIdentifier(1)) >= 0 =>
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        new graft.sources.GraftDataSource().createRelation(
          SparkSession.active.sqlContext, Map("path" -> u.multipartIdentifier(1))),
        isStreaming = false)
  }
}

/** One-row maintenance result (`version` / `reclaimed`). The closure
  * runs on the DRIVER at execution time — these are metadata
  * operations; any distributed work they start (a compaction rewrite)
  * is its own Spark job, like every RunnableCommand.
  */
case class LakeMaintenanceCommand(resultName: String,
    fn: SparkSession => Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference(resultName, LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = Seq(Row(fn(spark)))
}

/** `GRAFT VACUUM … DRY RUN`: one row per file the real vacuum would
  * reclaim — nothing is touched. */
case class LakeVacuumDryRunCommand(path: String, keepFrom: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("file", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Snapshots.vacuumDryRun(path, keepFrom).map(Row(_))
}

/** `GRAFT DESCRIBE HISTORY`: one row per retained version — live file
  * count, DV file count, whether the commit recorded change data —
  * all from manifests alone (no data file opens).
  */
case class LakeHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("live_files", LongType, nullable = false)(),
    AttributeReference("dv_files", LongType, nullable = false)(),
    AttributeReference("change_data", StringType, nullable = false)(),
    AttributeReference("timestamp", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    (Snapshots.earliestVersion(path) to Snapshots.currentVersion(path)).map { v =>
      Row(v.toLong, Snapshots.liveFiles(path, v).size.toLong,
        Snapshots.dvFiles(path, v).size.toLong,
        if (Snapshots.cdfRecorded(path, v)) "recorded" else "none",
        Snapshots.commitTime(path, v).getOrElse(-1L))
    }
}
