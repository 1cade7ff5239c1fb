package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.{PartitionedSnapshots, Snapshots}

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
  *   GRAFT OPTIMIZE '<path>' WHERE <col> BETWEEN <lo> AND <hi>  -- scoped
  *     r13: a plain OPTIMIZE on a hidden/partitioned ROOT sweeps every dir
  *   GRAFT RECONCILE '<path>'                      -- fold DVs (A30);
  *     r13: on a hidden/partitioned ROOT folds every DV-carrying dir
  *   GRAFT CLONE '<src>' TO '<dst>'                -- shallow (A29)
  *   GRAFT DEEP CLONE '<src>' TO '<dst>'  -- share-nothing copy (r11)
  *   GRAFT ENABLE CHANGE DATA FEED '<path>'        -- A31 property
  *   GRAFT ADD CONSTRAINT <name> '<path>' CHECK (<expr>)   -- A34
  *   GRAFT DROP CONSTRAINT <name> '<path>'
  *   GRAFT UPDATE '<path>' SET <c> = <expr> [, …] WHERE <pred>  -- A35
  *   GRAFT UPDATE MOR '<path>' SET … WHERE …  -- A71 merge-on-read:
  *     DV-mark + append, zero file rewrites
  *   GRAFT DELETE MOR '<path>' WHERE …  -- A30 merge-on-read delete:
  *     positions only, zero data files written
  *   GRAFT ADD BLOOM INDEX <col> '<path>'              -- A41 skipping
  *   GRAFT REINDEX BLOOM '<path>'
  *   GRAFT TAG <name> '<path>' [AT VERSION <n>]            -- A37 refs
  *   GRAFT DROP TAG <name> '<path>'
  *   GRAFT BRANCH <name> '<path>'
  *   GRAFT PUBLISH BRANCH <name> '<path>'
  *   GRAFT DROP BRANCH <name> '<path>'
  *   GRAFT DESCRIBE HISTORY '<path>'
  *   GRAFT DESCRIBE DETAIL '<path>'
  *   GRAFT CHECKPOINT '<path>'         -- materialize head as full
  *   GRAFT ANALYZE '<path>'       -- r9: versioned NDV for the CBO
  *   GRAFT ANALYZE '<path>' WITH HISTOGRAM  -- + equi-height bins
  *   GRAFT CREATE MATERIALIZED VIEW '<mv>' ON '<base>' KEY <k>  -- r11:
  *     … [MINMAX (<m1>[, …])] adds A63 stored per-group extrema;
  *     … [DISTINCT (<c1>[, …])] adds A82 per-group HLL sketches (r13);
  *     … [WHERE <pred>] stores the A69 filtered-MV predicate (r13)
  *     GROUP BY (<c1>[, …]) [SUM (<s1>[, …])]          -- A55
  *   GRAFT CREATE MATERIALIZED VIEW '<mv>' ON '<left>' KEY <lk>
  *     JOIN '<right>' KEY <rk> ON <joinCol>
  *     GROUP BY (<c1>[, …]) [SUM (<s1>[, …])]          -- A57
  *   GRAFT REFRESH MATERIALIZED VIEW '<mv>'   -- incremental, via CDF
  *   GRAFT DROP MATERIALIZED VIEW '<mv>'  -- releases the vacuum lease
  *   GRAFT WIDEN '<path>' COLUMN <col> TO <type>  -- A59 metadata-only
  *   GRAFT ADD COLUMN <col> <type> '<path>'  -- r12 metadata-only;
  *     existing rows read NULL (A19), time travel serves the old schema
  *   GRAFT RENAME COLUMN <from> TO <to> '<path>'  -- r12 metadata-only
  *     via the A24 physical-name mapping; zero files move
  *   GRAFT DROP COLUMN <col> '<path>'  -- r12 metadata-only; bytes stay
  *     for time travel, the head schema loses the field
  *   GRAFT REGISTER MATERIALIZED VIEW '<mv>'    -- A58 rewrite opt-in
  *   GRAFT REGISTER MATERIALIZED VIEW '<mv>' ON TABLE <name>  -- r13:
  *     validates the catalog table's path IS the MV's base (A43)
  *   GRAFT UNREGISTER MATERIALIZED VIEW '<mv>'
  *   GRAFT BEGIN TRANSACTION '<id>' AT '<coord>' ON ('<t1>', '<t2>')
  *     -- A56: returns (table, branch) staging rows
  *   GRAFT COMMIT TRANSACTION '<id>'     -- DECIDE + idempotent redo
  *   GRAFT ABORT TRANSACTION '<id>'      -- pre-DECIDE only
  *   GRAFT RECOVER '<coord>'        -- finish/abort crashed txns
  *   GRAFT PIN CONSISTENT AT '<coord>' ON ('<t1>', '<t2>')
  *     -- (table, version) pins that never straddle a transaction
  *   GRAFT DESCRIBE MATERIALIZED VIEW '<mv>'  -- one row per base:
  *     consumed vs current version, lag, lease, group/sum columns
  * }}}
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    if (!looksGraft(sqlText))
      ResolveGraftPath.rewrite(GraftDmlRules.rewrite(delegate.parsePlan(sqlText)))
    else resolveNameForm(sqlText) match {
      case OptimizeWhere(p0, c, lo, hi) => LakeMaintenanceCommand("version",
        s => Snapshots.compactWhere(s, runPath(p0), c,
          lo.toLong, hi.toLong).toLong)
      case ZorderInc(p0) => LakeMaintenanceCommand("version",
        s => {
          val p = runPath(p0)
          // r14: hidden/partitioned ROOTS sweep each dir's unclustered
          // tail (returns dirs advanced); flat keeps the version form
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.zorderIncremental(s, p)
              .size.toLong
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).count { v =>
              val d = graft.sources.PartitionedSnapshots.partitionDir(p, v)
              val cur = Snapshots.currentVersion(d)
              cur >= 0 && Snapshots.compactZOrderIncremental(s, d) > cur
            }.toLong
          else Snapshots.compactZOrderIncremental(s, p).toLong
        })
      case Zorder(p0, colList, n) => LakeMaintenanceCommand("version",
        s => {
          val p = runPath(p0)
          val cols = colList.split(",").map(_.trim).toSeq
          // r14 (the r13 verdict's item 5): the root-level OPTIMIZE
          // sweep accepts ZORDER BY — every dir re-clusters with its
          // own state in its own log (returns dirs re-clustered)
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.zorder(s, p, cols, n.toInt)
              .size.toLong
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).count { v =>
              val d = graft.sources.PartitionedSnapshots.partitionDir(p, v)
              val cur = Snapshots.currentVersion(d)
              cur >= 0 &&
                Snapshots.compactZOrderCols(s, d, cols, n.toInt) > cur
            }.toLong
          else Snapshots.compactZOrderCols(s, p, cols, n.toInt).toLong
        })
      case Optimize(p0) => LakeMaintenanceCommand("version",
        s => {
          val p = runPath(p0)
          // r13: like RECONCILE, a hidden/partitioned ROOT compacts
          // every directory in one sweep (returns dirs compacted); a
          // flat table keeps the single-log behavior (new version)
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.epochGroups(p).flatMap(_._3)
              .count { case (_, d) =>
                val cur = Snapshots.currentVersion(d)
                cur >= 0 && Snapshots.compact(s, d) > cur
              }.toLong
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).count { v =>
              val d = graft.sources.PartitionedSnapshots.partitionDir(p, v)
              val cur = Snapshots.currentVersion(d)
              cur >= 0 && Snapshots.compact(s, d) > cur
            }.toLong
          else Snapshots.compact(s, p).toLong
        })
      case VecCreate(idx, corpus, trained, cells) =>
        LakeMaintenanceCommand("version", s =>
          graft.operators.Similarity.createVectorIndex(s, corpus, idx,
            Option(cells).map(_.toInt).getOrElse(16),
            trained != null).toLong)
      case VecRefresh(idx) => LakeMaintenanceCommand("version", s =>
        graft.operators.Similarity.refreshVectorIndex(s, idx).toLong)
      case VecProbe(idx, keyList, k, nprobe) =>
        LakeVectorProbeCommand(idx,
          keyList.split(",").map(_.trim.toLong).toIndexedSeq, k.toInt,
          Option(nprobe).map(_.toInt).getOrElse(4))
      case VacuumDry(p, keep) => LakeVacuumDryRunCommand(p, keep.toInt)
      case VacuumBefore(p0, ts) => LakeMaintenanceCommand("reclaimed",
        _ => {
          val p = runPath(p0)
          // r14: a TIME cutoff is well-posed per dir (unlike KEEP's
          // version number against a version VECTOR) — hidden and
          // partitioned ROOTS sweep every dir, summing reclaimed files
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.epochGroups(p).flatMap(_._3)
              .map { case (_, d) =>
                Snapshots.vacuumBefore(d, ts.toLong).toLong }.sum
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).map { v =>
              Snapshots.vacuumBefore(graft.sources.PartitionedSnapshots
                .partitionDir(p, v), ts.toLong).toLong
            }.sum
          else Snapshots.vacuumBefore(p, ts.toLong).toLong
        })
      case Vacuum(p0, keep) => LakeMaintenanceCommand("reclaimed",
        _ => {
          val p = runPath(p0)
          // a KEEP version number names ONE log's history — it cannot
          // address a root whose partitions each hold their own
          // version vector; point the operator at the sound form
          require(graft.sources.HiddenPartitions.specOf(p).isEmpty &&
            !(Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty),
            s"graft: VACUUM KEEP <version> is ill-posed on the " +
              s"multi-dir root $p (each dir has its own versions) — " +
              "use GRAFT VACUUM '<path>' BEFORE <epochMillis>")
          Snapshots.vacuum(p, keep.toInt).toLong
        })
      case Restore(p, v) => LakeMaintenanceCommand("version",
        _ => Snapshots.restore(p, v.toInt).toLong)
      case Reconcile(p0) => LakeMaintenanceCommand("version",
        s => {
          val p = runPath(p0)
          // r13: on a hidden-transform or partitioned ROOT, fold every
          // directory that carries DVs (the whole-table maintenance
          // sweep the A77/A26 MoR routes accumulate toward); the
          // result is the number of directories reconciled. A flat
          // table keeps the single-log behavior (new head version).
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.reconcile(s, p).size.toLong
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).count { v =>
              val d = graft.sources.PartitionedSnapshots.partitionDir(p, v)
              val cur = Snapshots.currentVersion(d)
              Snapshots.dvFiles(d, cur).nonEmpty &&
                Snapshots.reconcileDV(s, d) > cur
            }.toLong
          else Snapshots.reconcileDV(s, p).toLong
        })
      case DeepCloneTo(src, dst) => LakeMaintenanceCommand("version",
        _ => Snapshots.cloneDeep(src, dst).toLong)
      case CloneTo(src, dst) => LakeMaintenanceCommand("version",
        _ => Snapshots.cloneShallow(src, dst).toLong)
      case EnableCdf(p) => LakeMaintenanceCommand("version",
        _ => Snapshots.enableChangeDataFeed(p).toLong)
      case AddCons(n, p, e) => LakeMaintenanceCommand("version",
        s => Snapshots.addConstraint(s, p, n, e).toLong)
      case DropCons(n, p) => LakeMaintenanceCommand("version",
        _ => Snapshots.dropConstraint(p, n).toLong)
      case DeleteMor(p, pred) => LakeMaintenanceCommand("version", s =>
        Snapshots.deleteVersionedDV(s, p,
          org.apache.spark.sql.functions.expr(pred)).toLong)
      case UpdateMor(p, setClause, pred) =>
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
          Snapshots.updateVersionedDV(s, p,
            org.apache.spark.sql.functions.expr(pred),
            assigns.map { case (n, e) =>
              n -> org.apache.spark.sql.functions.expr(e) }).toLong)
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
      case AddBloom(c, p0) => LakeMaintenanceCommand("version",
        s => {
          val p = runPath(p0)
          // r14: hidden/partitioned ROOTS index every dir in one sweep
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.addBloomIndex(s, p, c).size.toLong
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).count { v =>
              Snapshots.addBloomIndex(s, graft.sources.PartitionedSnapshots
                .partitionDir(p, v), c) >= 0
            }.toLong
          else Snapshots.addBloomIndex(s, p, c).toLong
        })
      case ReindexBloom(p0) => LakeMaintenanceCommand("version",
        s => {
          val p = runPath(p0)
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.reindexBloom(s, p).size.toLong
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).count { v =>
              val d = graft.sources.PartitionedSnapshots.partitionDir(p, v)
              Snapshots.bloomColsOf(d, Snapshots.currentVersion(d)).nonEmpty &&
                Snapshots.reindexBloom(s, d) >= 0
            }.toLong
          else Snapshots.reindexBloom(s, p).toLong
        })
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
      case Checkpoint(p0) => LakeMaintenanceCommand("materialized",
        _ => {
          val p = runPath(p0)
          // r14: roots sweep every dir (count materialized)
          if (graft.sources.HiddenPartitions.specOf(p).nonEmpty)
            graft.sources.HiddenPartitions.epochGroups(p).flatMap(_._3)
              .count { case (_, d) => Snapshots.checkpoint(d) }.toLong
          else if (Snapshots.currentVersion(p) < 0 &&
              graft.sources.PartitionedSnapshots.partitions(p).nonEmpty)
            graft.sources.PartitionedSnapshots.partitions(p).count { v =>
              Snapshots.checkpoint(graft.sources.PartitionedSnapshots
                .partitionDir(p, v))
            }.toLong
          else if (Snapshots.checkpoint(p)) 1L else 0L
        })
      // ANALYZE: flat table → the version analyzed; a PARTITIONED or
      // HIDDEN root (no log of its own) → every dir analyzed, returns
      // the dir count. r14: the hidden branch must come first — a
      // hidden root's epoch-0 dirs LOOK like `part=` dirs, and the
      // partitioned branch alone would silently skip later epochs.
      case AnalyzeHist(p) => LakeMaintenanceCommand("analyzed", s =>
        Snapshots.analyzeTable(s, p, histogram = true).toLong)
      case Analyze(p0) => LakeMaintenanceCommand("analyzed", s => {
        val p = runPath(p0)
        if (graft.sources.HiddenPartitions.specOf(p).nonEmpty) {
          val dirs = graft.sources.HiddenPartitions.epochGroups(p)
            .flatMap(_._3).map(_._2)
          dirs.foreach(d => Snapshots.analyzeTable(s, d))
          dirs.size.toLong
        } else if (Snapshots.currentVersion(p) >= 0)
          Snapshots.analyzeTable(s, p).toLong
        else {
          val parts = PartitionedSnapshots.partitions(p)
          require(parts.nonEmpty, s"$p is neither a graft table nor a partitioned root")
          parts.foreach(v => Snapshots.analyzeTable(s,
            PartitionedSnapshots.partitionDir(p, v)))
          parts.size.toLong
        }
      })
      case MvCreate(mv, base, key, groups, sums, minmax, dist, where) =>
        // r13: … [DISTINCT (<c1>[, …])] adds A82 per-group HLL
        // sketches; … [WHERE <pred>] stores the A69 filtered-MV
        // predicate (subsumption rewrite serves queries implying it)
        LakeMaintenanceCommand("version", s =>
          graft.sources.MaterializedView.create(s, mv, base, key,
            groups.split(",").map(_.trim).toIndexedSeq,
            Option(sums).map(_.split(",").map(_.trim).toIndexedSeq)
              .getOrElse(Seq.empty),
            Option(minmax).map(_.split(",").map(_.trim).toIndexedSeq)
              .getOrElse(Seq.empty),
            Option(dist).map(_.split(",").map(_.trim).toIndexedSeq)
              .getOrElse(Seq.empty),
            Option(where).map(_.trim).filter(_.nonEmpty)).toLong)
      case MvCreateJoin(mv, left, lk, right, rk, j, groups, sums, minmax) =>
        LakeMaintenanceCommand("version", s =>
          graft.sources.MaterializedView.createJoin(s, mv, left, lk,
            right, rk, j, groups.split(",").map(_.trim).toIndexedSeq,
            Option(sums).map(_.split(",").map(_.trim).toIndexedSeq)
              .getOrElse(Seq.empty),
            Option(minmax).map(_.split(",").map(_.trim).toIndexedSeq)
              .getOrElse(Seq.empty)).toLong)
      case MvRefresh(mv) => LakeMaintenanceCommand("version", s =>
        graft.sources.MaterializedView.refreshAny(s, mv).toLong)
      case MvDrop(mv) => LakeMaintenanceCommand("version", _ =>
        { graft.sources.MaterializedView.drop(mv); 0L })
      case MvDescribe(mv) => LakeMvDetailCommand(mv)
      case Widen(p, c, t) => LakeMaintenanceCommand("version", s =>
        Snapshots.widenColumn(s, p, c,
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseDataType(t)).toLong)
      case AddColumn(c, t, p) => LakeMaintenanceCommand("version", s =>
        Snapshots.addColumn(s, p, c,
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseDataType(t.trim)).toLong)
      case RenameColumn(from, to, p) => LakeMaintenanceCommand("version",
        s => Snapshots.renameColumn(s, p, from, to).toLong)
      case DropColumn(c, p) => LakeMaintenanceCommand("version",
        s => Snapshots.dropColumn(s, p, c).toLong)
      case MvRegisterByName(mv, table) =>
        LakeMaintenanceCommand("registered", s =>
          { graft.sources.MvRegistry.registerByName(s, table, mv); 1L })
      case MvRegister(mv) => LakeMaintenanceCommand("registered", s =>
        { graft.sources.MvRegistry.register(s, mv); 1L })
      case MvUnregister(mv) => LakeMaintenanceCommand("unregistered", _ =>
        { graft.sources.MvRegistry.unregister(mv); 1L })
      // A56 over SQL: the multi-table transaction protocol end-to-end —
      // BEGIN returns the per-table staging branches (write to those
      // with ordinary DML/DataFrame writes), COMMIT/ABORT act on the
      // session-held handle, RECOVER finishes or aborts crashed ones,
      // PIN CONSISTENT returns a never-straddles version set to read
      // with versionAsOf
      case TxnBegin(id, coord, list) =>
        LakeTxnBeginCommand(coord, quotedList(list), id)
      case TxnCommit(id) => LakeMaintenanceCommand("committed", s =>
        { graft.sources.GraftTxn.commitSql(s, id); 1L })
      case TxnAbort(id) => LakeMaintenanceCommand("aborted", s =>
        { graft.sources.GraftTxn.abortSql(s, id); 1L })
      case TxnRecover(coord) => LakeMaintenanceCommand("recovered", s =>
        graft.sources.GraftTxn.recover(s, coord).toLong)
      case PinConsistent(coord, list) =>
        LakeTxnPinCommand(coord, quotedList(list))
      case Detail(p) => LakeDetailCommand(p)
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

  // ── r14 (the r13 verdict's item 2): NAME-form maintenance verbs ──
  // `GRAFT OPTIMIZE orders_t` / `VACUUM t KEEP 3` / `ANALYZE t` /
  // `RECONCILE t` / `CHECKPOINT t` / `REINDEX BLOOM t` /
  // `ADD BLOOM INDEX c t` — Delta's `OPTIMIZE <table>` parity. ONE
  // resolution step: the identifier resolves through the session
  // catalog (A43's stored `path` option) and the statement re-enters
  // the path-form grammar verbatim, so every verb variant (ZORDER BY,
  // DRY RUN, WITH HISTOGRAM, …) gets the name form for free and the
  // command wiring stays single-sourced.
  private val NameForm =
    ("""(?is)^(\s*GRAFT\s+(?:OPTIMIZE|VACUUM|ANALYZE|RECONCILE|""" +
      """CHECKPOINT|REINDEX\s+BLOOM|ADD\s+BLOOM\s+INDEX\s+\w+|""" +
      """DESCRIBE\s+DETAIL)\s+)""" +
      """([A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)?)(\s.*|;?\s*)$""").r

  /** The stored path of a catalog-registered graft table (A43's
    * `OPTIONS (path …)` or the location URI). Loud on a missing table
    * or a non-graft provider — a maintenance verb must never fall
    * through to a path that happens to share the name. */
  private[plans] def catalogPathOf(name: String): String = {
    val parts = name.split("\\.").toSeq
    val t =
      try SparkSession.active.sessionState.catalog.getTableMetadata(
        TableIdentifier(parts.last,
          if (parts.length == 2) Some(parts.head) else None))
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"graft: no catalog table '$name' to resolve for the " +
              s"maintenance verb (${e.getMessage})")
      }
    require(t.provider.exists(_.equalsIgnoreCase("graft")),
      s"graft: catalog table '$name' is not a graft table " +
        s"(provider ${t.provider.getOrElse("none")})")
    t.storage.properties.get("path")
      .orElse(t.storage.locationUri.map(uri =>
        java.nio.file.Paths.get(uri).toString))
      .getOrElse(throw new IllegalArgumentException(
        s"graft: catalog table '$name' records no storage path"))
  }

  /** r15 (advice fix): name-form statements are rewritten with an
    * `@name:<tbl>` MARKER in the path slot instead of the resolved
    * path — [[runPath]] resolves it inside each command's run(spark),
    * with the EXECUTING session, so parsing needs no session catalog
    * and a cached/re-executed plan follows the catalog entry's
    * CURRENT storage path instead of a parse-time snapshot. */
  private def resolveNameForm(sql: String): String = sql match {
    case NameForm(head, name, tail) =>
      head + "'@name:" + name + "'" + tail
    case _ => sql
  }

  /** Resolve a possibly name-marked path at EXECUTION time. */
  private[plans] def runPath(p: String): String =
    if (p.startsWith("@name:")) catalogPathOf(p.stripPrefix("@name:"))
    else p

  // whole-string regexes (Scala's Regex.unapplySeq anchors both ends)
  // r14 (the r13 verdict's item 6): the vector index family
  private val VecCreate =
    ("""(?is)\s*GRAFT\s+CREATE\s+VECTOR\s+INDEX\s+'([^']+)'\s+ON\s+""" +
      """'([^']+)'(\s+TRAINED)?(?:\s+CELLS\s+(\d+))?\s*;?\s*""").r
  private val VecRefresh =
    """(?is)\s*GRAFT\s+REFRESH\s+VECTOR\s+INDEX\s+'([^']+)'\s*;?\s*""".r
  private val VecProbe =
    ("""(?is)\s*GRAFT\s+PROBE\s+VECTOR\s+INDEX\s+'([^']+)'\s+FOR\s+KEYS""" +
      """\s*\(([-\d\s,]+)\)\s+TOP\s+(\d+)(?:\s+NPROBE\s+(\d+))?\s*;?\s*""").r
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
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)+)\s*\)\s+INTO\s+(\d+)\s+FILES\s*;?\s*""".r
  private val ZorderInc =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+ZORDER\s+INCREMENTAL\s*;?\s*""".r
  private val OptimizeWhere =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+WHERE\s+(\w+)\s+BETWEEN\s+(-?\d+)\s+AND\s+(-?\d+)\s*;?\s*""".r
  private val Reconcile =
    """(?is)\s*GRAFT\s+RECONCILE\s+'([^']+)'\s*;?\s*""".r
  private val CloneTo =
    """(?is)\s*GRAFT\s+CLONE\s+'([^']+)'\s+TO\s+'([^']+)'\s*;?\s*""".r
  private val DeepCloneTo =
    """(?is)\s*GRAFT\s+DEEP\s+CLONE\s+'([^']+)'\s+TO\s+'([^']+)'\s*;?\s*""".r
  private val EnableCdf =
    """(?is)\s*GRAFT\s+ENABLE\s+CHANGE\s+DATA\s+FEED\s+'([^']+)'\s*;?\s*""".r
  private val AddCons =
    """(?is)\s*GRAFT\s+ADD\s+CONSTRAINT\s+(\w+)\s+'([^']+)'\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropCons =
    """(?is)\s*GRAFT\s+DROP\s+CONSTRAINT\s+(\w+)\s+'([^']+)'\s*;?\s*""".r
  private val Update =
    """(?is)\s*GRAFT\s+UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  // r12 (A71): merge-on-read UPDATE — DV-mark + append, no file rewrite
  private val UpdateMor =
    """(?is)\s*GRAFT\s+UPDATE\s+MOR\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  // r12 (A30): merge-on-read DELETE — positions only, no file rewrite
  private val DeleteMor =
    """(?is)\s*GRAFT\s+DELETE\s+MOR\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r
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
  private val Detail =
    """(?is)\s*GRAFT\s+DESCRIBE\s+DETAIL\s+'([^']+)'\s*;?\s*""".r
  private val Checkpoint =
    """(?is)\s*GRAFT\s+CHECKPOINT\s+'([^']+)'\s*;?\s*""".r
  private val Analyze =
    """(?is)\s*GRAFT\s+ANALYZE\s+'([^']+)'\s*;?\s*""".r
  private val Widen =
    """(?is)\s*GRAFT\s+WIDEN\s+'([^']+)'\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  // r12: type may carry parameters — DECIMAL(10,2) — so the capture is
  // broader than \w+ and hands the text to CatalystSqlParser
  private val AddColumn =
    """(?is)\s*GRAFT\s+ADD\s+COLUMN\s+(\w+)\s+([\w()\s,]+?)\s+'([^']+)'\s*;?\s*""".r
  // r12: the other two metadata-only evolution verbs (A24 machinery)
  private val RenameColumn =
    """(?is)\s*GRAFT\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s+'([^']+)'\s*;?\s*""".r
  private val DropColumn =
    """(?is)\s*GRAFT\s+DROP\s+COLUMN\s+(\w+)\s+'([^']+)'\s*;?\s*""".r
  private val MvRegister =
    """(?is)\s*GRAFT\s+REGISTER\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s*;?\s*""".r
  // r13 — A43 composition: register against a catalog TABLE NAME
  private val MvRegisterByName =
    """(?is)\s*GRAFT\s+REGISTER\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s+ON\s+TABLE\s+([\w.]+)\s*;?\s*""".r
  private val MvUnregister =
    """(?is)\s*GRAFT\s+UNREGISTER\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s*;?\s*""".r
  private val TxnBegin =
    """(?is)\s*GRAFT\s+BEGIN\s+TRANSACTION\s+'([^']+)'\s+AT\s+'([^']+)'\s+ON\s*\(\s*('[^']+'(?:\s*,\s*'[^']+')*)\s*\)\s*;?\s*""".r
  private val TxnCommit =
    """(?is)\s*GRAFT\s+COMMIT\s+TRANSACTION\s+'([^']+)'\s*;?\s*""".r
  private val TxnAbort =
    """(?is)\s*GRAFT\s+ABORT\s+TRANSACTION\s+'([^']+)'\s*;?\s*""".r
  private val TxnRecover =
    """(?is)\s*GRAFT\s+RECOVER\s+'([^']+)'\s*;?\s*""".r
  private val PinConsistent =
    """(?is)\s*GRAFT\s+PIN\s+CONSISTENT\s+AT\s+'([^']+)'\s+ON\s*\(\s*('[^']+'(?:\s*,\s*'[^']+')*)\s*\)\s*;?\s*""".r

  /** `'a', 'b', 'c'` → Seq(a, b, c) (the ON (…) table lists). */
  private def quotedList(s: String): Seq[String] =
    "'([^']+)'".r.findAllMatchIn(s).map(_.group(1)).toIndexedSeq
  private val AnalyzeHist =
    """(?is)\s*GRAFT\s+ANALYZE\s+'([^']+)'\s+WITH\s+HISTOGRAM\s*;?\s*""".r
  private val MvCreate =
    ("""(?is)\s*GRAFT\s+CREATE\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s+ON\s+""" +
      """'([^']+)'\s+KEY\s+(\w+)\s+GROUP\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)*)""" +
      """\s*\)(?:\s+SUM\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+MINMAX\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+DISTINCT\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r
  private val MvCreateJoin =
    ("""(?is)\s*GRAFT\s+CREATE\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s+ON\s+""" +
      """'([^']+)'\s+KEY\s+(\w+)\s+JOIN\s+'([^']+)'\s+KEY\s+(\w+)\s+ON\s+""" +
      """(\w+)\s+GROUP\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)*)""" +
      """\s*\)(?:\s+SUM\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+MINMAX\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?\s*;?\s*""").r
  private val MvRefresh =
    """(?is)\s*GRAFT\s+REFRESH\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s*;?\s*""".r
  private val MvDrop =
    """(?is)\s*GRAFT\s+DROP\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s*;?\s*""".r
  private val MvDescribe =
    """(?is)\s*GRAFT\s+DESCRIBE\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s*;?\s*""".r

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
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}

  /** The versioned-table path a relation reference names: the
    * `graft.`/dir`` path form, or a session-catalog table whose
    * provider is graft (A43) — resolved HERE because SQL time travel
    * must be intercepted at parse time (Spark's own resolution throws
    * "time travel unsupported" for v1 relations before any injected
    * rule could act, the same order problem ResolveSQLOnFile poses). */
  private def graftPathOf(u: UnresolvedRelation): Option[String] = {
    val parts = u.multipartIdentifier
    if (parts.length == 2 && parts.head.equalsIgnoreCase("graft") &&
        Snapshots.currentVersion(parts(1)) >= 0) Some(parts(1))
    else if (parts.length <= 2) try {
      val cat = SparkSession.active.sessionState.catalog
      val id = TableIdentifier(parts.last,
        if (parts.length == 2) Some(parts.head) else None)
      val t = cat.getTableMetadata(id)
      if (t.provider.exists(_.equalsIgnoreCase("graft")))
        t.storage.properties.get("path")
          .orElse(t.storage.locationUri.map(uri =>
            java.nio.file.Paths.get(uri).toString))
      else None
    } catch { case _: Exception => None }
    else None
  }

  /** Render a `TIMESTAMP AS OF <expr>` operand to the connector's
    * `timestampAsOf` option: string literals pass through (ISO/JDBC
    * forms), TIMESTAMP literals convert micros→millis. Non-foldable
    * expressions refuse — time travel pins a snapshot; it cannot vary
    * per row. */
  private def tsOption(e: Expression): String = {
    require(e.foldable, "graft: TIMESTAMP AS OF must be a literal")
    (e.eval(), e.dataType) match {
      case (u: org.apache.spark.unsafe.types.UTF8String, _) => u.toString
      case (micros: Long, _: org.apache.spark.sql.types.TimestampType) =>
        (micros / 1000L).toString
      case (millis: Long, _) => millis.toString
      case (other, dt) => throw new IllegalArgumentException(
        s"graft: cannot interpret TIMESTAMP AS OF value $other of type $dt")
    }
  }

  private def relationFor(path: String, opts: Map[String, String]): LogicalPlan =
    org.apache.spark.sql.execution.datasources.LogicalRelation(
      new graft.sources.GraftDataSource().createRelation(
        SparkSession.active.sqlContext, Map("path" -> path) ++ opts),
      isStreaming = false)

  def rewrite(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // SQL time travel (the Delta `VERSION AS OF` / `TIMESTAMP AS OF`
    // ergonomics) on either the path form or a catalog-named graft
    // table — mapped onto the connector's reader options, so SQL and
    // DataFrame time travel share one resolution path
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
      graftPathOf(u) match { // resolved once: it may hit the catalog
        case Some(p) =>
          val opts = ver.map(v => Map("versionAsOf" -> v))
            .getOrElse(Map("timestampAsOf" -> tsOption(ts.get)))
          relationFor(p, opts)
        case None => tt
      }
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          Snapshots.currentVersion(u.multipartIdentifier(1)) >= 0 =>
      relationFor(u.multipartIdentifier(1), Map.empty)
  }
}

/** A44 — ANSI DML routed to the lake: `MERGE INTO` / `UPDATE` /
  * `DELETE FROM` / `INSERT INTO|OVERWRITE` on graft tables plan as
  * snapshot-log commits instead of failing ("only supported with v2
  * tables") or — worst — writing raw files the log never sees. Two
  * interception points share this object:
  *
  *  - PARSE time (inside [[GraftSqlParser]]): targets named by path,
  *    `graft.`/dir``, are still [[UnresolvedRelation]]s — the Delta
  *    `delta.`path`` DML ergonomics.
  *  - POST-HOC resolution (injected rule): targets named through the
  *    session CATALOG resolve to a [[LogicalRelation]] over the
  *    connector's [[graft.sources.GraftFileIndex]] — matched AFTER
  *    Spark's own DataSourceAnalysis, so `INSERT INTO <name>` is
  *    caught as the already-planned InsertIntoHadoopFsRelationCommand
  *    and re-routed before it can write unregistered files.
  *
  * Supported MERGE forms are the two the keyed log has exact semantics
  * for (the Delta-workhorse shapes): `WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *` → keyed upsert, `WHEN MATCHED
  * THEN DELETE` (alone) → keyed delete, and `WHEN NOT MATCHED BY
  * SOURCE THEN DELETE` (alone) → anti-keyed delete (the CDC
  * reconcile). Anything else refuses loudly —
  * pointing at the library API — rather than approximating. Conditions
  * and SET values re-render to SQL with qualifiers stripped (the
  * command re-resolves them against the bare table read; the DML
  * target has exactly one relation, so bare names are unambiguous).
  */
object GraftDmlRules {
  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo}
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InsertIntoHadoopFsRelationCommand, LogicalRelation}
  import org.apache.spark.sql.functions.expr
  import graft.sources.GraftFileIndex

  /** The graft table a DML target names, through either interception
    * point (alias wrappers stripped). */
  private def pathOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => pathOf(child)
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          Snapshots.currentVersion(u.multipartIdentifier(1)) >= 0 =>
      Some(u.multipartIdentifier(1))
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some(g.tablePath)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** Table/source aliases in scope for a DML target — ONLY these may
    * qualify a column reference; a multi-part name whose head is NOT a
    * known alias is a struct-field path and must keep its shape (the
    * old last-part collapse silently retargeted `addr.city` to a
    * top-level `city`). */
  private def aliasesOf(plan: LogicalPlan): Set[String] = plan match {
    case SubqueryAlias(id, child) => aliasesOf(child) + id.name
    case _ => Set.empty
  }

  private def nameOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
      aliases: Set[String]): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => u.nameParts match {
      case Seq(n) => Some(n)
      case Seq(q, n) if aliases.contains(q) => Some(n)
      case _ => None // struct path or unknown qualifier
    }
    case _ => None
  }

  /** Re-render an expression as SQL with KNOWN-ALIAS qualifiers
    * stripped so it re-resolves against the command's own table read;
    * struct-field paths pass through untouched and resolve as struct
    * access there. */
  private def bareSql(e: org.apache.spark.sql.catalyst.expressions.Expression,
      aliases: Set[String]): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
      case u: UnresolvedAttribute
          if u.nameParts.length == 2 && aliases.contains(u.nameParts.head) =>
        UnresolvedAttribute(Seq(u.nameParts.last))
    }.sql

  private def refuse(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"graft: $msg (the GRAFT dialect and the Snapshots API cover the general forms)")

  /** The resolved target's column names (None pre-resolution). */
  private def outputCols(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case SubqueryAlias(_, child) => outputCols(child)
    case lr: LogicalRelation => Some(lr.output.map(_.name))
    case _ => None
  }

  /** Assignments equivalent to the post-resolution expansion of
    * `UPDATE SET *` / `INSERT *`: every pair `col = col` by matching
    * name AND the set covers EVERY target column — a PARTIAL
    * same-named list (`SET price = src.price`) is the user asking for
    * a partial update, which the keyed full-row merge cannot honor and
    * must refuse, not approximate. Pre-resolution (targetCols None)
    * only the literal star actions qualify. */
  /** The analyzer wraps a star expansion's values in AssertNotNull
    * when the target column is non-nullable — semantics-neutral for
    * name matching (r15: the DDL-created tables surfaced this). */
  private def unwrapAssign(e: Expression): Expression = e match {
    case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
      unwrapAssign(a.child)
    case other => other
  }

  private def isStarAssignments(as: Seq[Assignment],
      targetCols: Option[Seq[String]], aliases: Set[String]): Boolean =
    as.nonEmpty && as.forall(a => nameOf(a.key, aliases).isDefined &&
      nameOf(a.key, aliases) == nameOf(unwrapAssign(a.value), aliases)) &&
      targetCols.exists(tc =>
        as.flatMap(a => nameOf(a.key, aliases)).toSet == tc.toSet)

  private def isUpdateStar(as: Seq[MergeAction],
      targetCols: Option[Seq[String]], aliases: Set[String]): Boolean = as match {
    case Seq(UpdateStarAction(None)) => true
    case Seq(UpdateAction(None, assigns, _)) =>
      isStarAssignments(assigns, targetCols, aliases)
    case _ => false
  }

  private def isInsertStar(as: Seq[MergeAction],
      targetCols: Option[Seq[String]], aliases: Set[String]): Boolean = as match {
    case Seq(InsertStarAction(None)) => true
    case Seq(InsertAction(None, assigns)) =>
      isStarAssignments(assigns, targetCols, aliases)
    case _ => false
  }

  /** The MERGE ON condition: one same-named equality, or an AND of
    * several — the COMPOSITE-key shape `ON t.a = s.a AND t.b = s.b`
    * (r15, the r14 verdict's item 3). Returns the key columns in
    * written order (the leading one drives file pruning). */
  private def mergeKeyCols(cond: Expression,
      aliases: Set[String]): Seq[String] = {
    def eqKey(e: Expression): String = e match {
      case EqualTo(l, r) => (nameOf(l, aliases), nameOf(r, aliases)) match {
        case (Some(a), Some(b)) if a == b => a
        case _ => refuse("MERGE condition must be t.<key> = s.<key> " +
          "equalities on same-named columns")
      }
      case _ => refuse("MERGE condition must be an equality " +
        "t.<key> = s.<key>, or an AND of several (composite key)")
    }
    def split(e: Expression): Seq[String] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(eqKey(other))
    }
    val ks = split(cond)
    if (ks.distinct.size != ks.size)
      refuse(s"MERGE condition repeats key columns: ${ks.mkString(", ")}")
    ks
  }

  private def planMerge(path: String, m: MergeIntoTable): LogicalPlan = {
    val aliases = aliasesOf(m.targetTable) ++ aliasesOf(m.sourceTable)
    val targetCols = outputCols(m.targetTable)
    val keyCols = mergeKeyCols(m.mergeCondition, aliases)
    // a path-form source may itself read graft.`dir`
    val source = ResolveGraftPath.rewrite(m.sourceTable)
    // A54: WITH SCHEMA EVOLUTION routes through the general clause
    // path (star actions must expand over SOURCE columns too)
    val upsert = !m.withSchemaEvolution &&
      isUpdateStar(m.matchedActions, targetCols, aliases) &&
      isInsertStar(m.notMatchedActions, targetCols, aliases) &&
      m.notMatchedBySourceActions.isEmpty
    val keyedDelete = m.matchedActions == Seq(DeleteAction(None)) &&
      m.notMatchedActions.isEmpty && m.notMatchedBySourceActions.isEmpty
    // the CDC reconcile shape: delete target keys ABSENT from the
    // source — an anti join computes the keys, then the same
    // stats-pruned keyed delete applies them (one commit, exact CDF)
    val antiDelete = m.matchedActions.isEmpty && m.notMatchedActions.isEmpty &&
      m.notMatchedBySourceActions == Seq(DeleteAction(None))
    if (upsert)
      LakeMaintenanceCommand("version", s => Snapshots.mergeVersioned(
        s, path, org.apache.spark.sql.GraftSqlInternals.ofRows(s, source),
        keyCols).toLong)
    else if (keyedDelete)
      LakeMaintenanceCommand("version", s => Snapshots.deleteVersionedKeys(
        s, path, org.apache.spark.sql.GraftSqlInternals.ofRows(s, source)
          .select(keyCols.map(k => s"`$k`").head,
            keyCols.map(k => s"`$k`").tail: _*), keyCols).toLong)
    else if (antiDelete)
      LakeMaintenanceCommand("version", s => {
        val kSel = keyCols.map(k => s"`$k`")
        val targetKeys = Snapshots.read(s, path)
          .select(kSel.head, kSel.tail: _*)
        // ANSI: a NULL-key target row never equi-matches any source row,
        // so BY SOURCE semantics demand deleting it — which a keyed
        // equality delete cannot express. Refuse loudly rather than
        // silently retaining the row (the repo-wide no-approximation
        // rule); keyed tables have non-null keys by construction.
        val nullPred = keyCols.map(k => s"`$k` IS NULL").mkString(" OR ")
        require(targetKeys.filter(expr(nullPred)).isEmpty,
          s"graft: MERGE … NOT MATCHED BY SOURCE DELETE needs non-NULL " +
            s"'${keyCols.mkString(", ")}' keys (a NULL key never " +
            "equi-matches, so ANSI would delete it; the keyed delete " +
            "cannot — delete NULL-key rows first: DELETE FROM … WHERE " +
            s"$nullPred)")
        Snapshots.deleteVersionedKeys(s, path, targetKeys
          .except(org.apache.spark.sql.GraftSqlInternals.ofRows(s, source)
            .select(kSel.head, kSel.tail: _*)), keyCols).toLong
      })
    else planMergeGeneral(path, m, keyCols, source, aliases, targetCols)
  }

  /** A52 — the GENERAL conditional MERGE (everything beyond the three
    * exact fast-path shapes above): every action list translates to
    * ordered [[graft.sources.MergeWhen]] clauses and runs through
    * [[Snapshots.mergeVersionedClauses]] — first-match-wins, guarded
    * updates/deletes/inserts, partial SET, NOT MATCHED BY SOURCE
    * updates. Column references resolve by SIDE: a target-alias
    * qualifier (or an unqualified name that is a target column) binds
    * bare; a source-alias qualifier (or any other unqualified name)
    * binds to the `__src_`-prefixed source frame; resolved attributes
    * (the post-hoc catalog route) bind by exprId. BY SOURCE clauses
    * may reference only target columns (ANSI).
    */
  private def planMergeGeneral(path: String, m: MergeIntoTable,
      keyCols: Seq[String], source: LogicalPlan, aliases: Set[String],
      targetCols: Option[Seq[String]]): LogicalPlan = {
    import graft.sources.MergeWhen
    import org.apache.spark.sql.catalyst.expressions.Expression
    val tAliases = aliasesOf(m.targetTable)
    val sAliases = aliasesOf(m.sourceTable)
    // .output THROWS on an unresolved plan (a parse-time subquery
    // source is a Project over UnresolvedAttributes) — exprId binding
    // only exists on the resolved (post-hoc) route anyway
    def outputOf(p: LogicalPlan) = if (p.resolved) p.output else Nil
    val tIds = outputOf(m.targetTable).map(_.exprId).toSet
    val sIds = outputOf(m.sourceTable).map(_.exprId).toSet
    val tCols: Seq[String] = targetCols
      .orElse(Snapshots.tableSchema(path, Snapshots.currentVersion(path))
        .map(_.fieldNames.toSeq))
      .getOrElse(refuse("MERGE target schema unavailable"))
    val tColSet = tCols.toSet
    // A54: star actions under WITH SCHEMA EVOLUTION cover the source's
    // extra columns too (Delta's star-evolution contract) — which
    // needs the source RESOLVED; the path-form parse-time route sees
    // an unresolved source and refuses star+evolution (explicit
    // assignment lists evolve on both routes)
    val evo = m.withSchemaEvolution
    lazy val evoExtra: Seq[String] = {
      val sCols = outputOf(m.sourceTable).map(_.name)
      if (sCols.isEmpty) refuse(
        "MERGE WITH SCHEMA EVOLUTION star actions need a catalog-" +
          "resolved source (or list the new columns explicitly)")
      sCols.filterNot(tColSet)
    }

    def sideCol(e: Expression, allowSource: Boolean): org.apache.spark.sql.Column = {
      val rewritten = e.transform {
        case a: AttributeReference if sIds.contains(a.exprId) =>
          if (!allowSource) refuse(
            "NOT MATCHED BY SOURCE clauses may reference only target columns")
          UnresolvedAttribute(Seq(MergeWhen.srcName(a.name)))
        case a: AttributeReference if tIds.contains(a.exprId) =>
          UnresolvedAttribute(Seq(a.name))
        case u: UnresolvedAttribute => u.nameParts match {
          case Seq(q, n) if tAliases.contains(q) => UnresolvedAttribute(Seq(n))
          case Seq(q, n) if sAliases.contains(q) =>
            if (!allowSource) refuse(
              "NOT MATCHED BY SOURCE clauses may reference only target columns")
            UnresolvedAttribute(Seq(MergeWhen.srcName(n)))
          case Seq(n) if tColSet.contains(n) => UnresolvedAttribute(Seq(n))
          case Seq(n) =>
            if (!allowSource) refuse(
              "NOT MATCHED BY SOURCE clauses may reference only target columns")
            UnresolvedAttribute(Seq(MergeWhen.srcName(n)))
          case _ => refuse(
            "struct-field paths are not supported in MERGE clauses")
        }
      }
      org.apache.spark.sql.GraftSqlBridge.toColumn(rewritten)
    }
    def assignName(a: Assignment): String =
      nameOf(a.key, tAliases ++ aliases).getOrElse(
        refuse(s"MERGE SET/INSERT target must be a plain target column, " +
          s"got ${a.key.sql}"))
    def starSet(allow: Boolean): Seq[(String, org.apache.spark.sql.Column)] =
      ((if (evo) tCols ++ evoExtra else tCols): Seq[String])
        .filterNot(keyCols.contains).map(c => c -> MergeWhen.src(c))
    // the analyzer expands `UPDATE SET *` to explicit assignments that
    // INCLUDE the key; `key = s.key` is an identity under the ON
    // equality — drop it instead of refusing (a non-identity key SET
    // still refuses downstream)
    def keyIdentity(a: Assignment): Boolean = keyCols.exists(k =>
      nameOf(a.key, tAliases ++ aliases).contains(k) &&
        nameOf(a.value, aliases ++ sAliases).contains(k))
    // A54: the post-hoc route sees star actions ALREADY expanded over
    // the target columns (the v1 analyzer never adds source extras) —
    // an identity name-for-name expansion covering every target column
    // IS the star form, so under WITH SCHEMA EVOLUTION re-append the
    // source-only columns the expansion dropped
    def evoAppend(assigns: Seq[Assignment])
        : Seq[(String, org.apache.spark.sql.Column)] =
      if (evo && isStarAssignments(assigns, Some(tCols),
          tAliases ++ sAliases ++ aliases))
        evoExtra.map(c => c -> MergeWhen.src(c))
      else Seq.empty
    val matched: Seq[MergeWhen] = m.matchedActions.map {
      case UpdateAction(cond, assigns, _) =>
        MergeWhen.MatchedUpdate(cond.map(sideCol(_, allowSource = true)),
          assigns.filterNot(keyIdentity).map(a =>
            assignName(a) -> sideCol(a.value, allowSource = true)) ++
            evoAppend(assigns))
      case UpdateStarAction(cond) =>
        MergeWhen.MatchedUpdate(
          cond.map(sideCol(_, allowSource = true)), starSet(true))
      case DeleteAction(cond) =>
        MergeWhen.MatchedDelete(cond.map(sideCol(_, allowSource = true)))
      case other => refuse(s"unsupported MATCHED action $other")
    }
    val notMatched: Seq[MergeWhen] = m.notMatchedActions.map {
      case InsertAction(cond, assigns) =>
        MergeWhen.NotMatchedInsert(cond.map(sideCol(_, allowSource = true)),
          assigns.map(a =>
            assignName(a) -> sideCol(a.value, allowSource = true)) ++
            evoAppend(assigns))
      case InsertStarAction(cond) =>
        MergeWhen.NotMatchedInsert(cond.map(sideCol(_, allowSource = true)),
          (if (evo) tCols ++ evoExtra else tCols)
            .map(c => c -> MergeWhen.src(c)))
      case other => refuse(s"unsupported NOT MATCHED action $other")
    }
    val bySource: Seq[MergeWhen] = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, assigns, _) =>
        MergeWhen.BySourceUpdate(cond.map(sideCol(_, allowSource = false)),
          assigns.map(a =>
            assignName(a) -> sideCol(a.value, allowSource = false)))
      case DeleteAction(cond) =>
        MergeWhen.BySourceDelete(cond.map(sideCol(_, allowSource = false)))
      case other => refuse(s"unsupported NOT MATCHED BY SOURCE action $other")
    }
    val clauses = matched ++ notMatched ++ bySource
    LakeMaintenanceCommand("version", s => Snapshots.mergeVersionedClauses(
      s, path, org.apache.spark.sql.GraftSqlInternals.ofRows(s, source),
      keyCols, clauses, evolveSchema = evo, txn = None,
      txnMulti = Seq.empty).toLong)
  }

  /** A26 partitioned tables resolve to their own FileIndex: (table
    * path, partition column, (value, partition dir) list). */
  private def partInfo(plan: LogicalPlan): Option[(String, String, Seq[(String, String)])] =
    plan match {
      case SubqueryAlias(_, child) => partInfo(child)
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: graft.sources.GraftPartitionedFileIndex =>
            Some((g.tablePath, g.partitionCol, g.partitionDirs))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  private def refusePartitioned(): Nothing =
    refuse("this DML form on a PARTITIONED graft table is per-partition " +
      "by design — write through PartitionedSnapshots (merge/compact/" +
      "zorder take the partition value) or target one partition's own dir")

  /** A49/A53 hidden-partitioned tables: (root, per-epoch
    * (transform, (value, dir)) groups). */
  private def hiddenInfo(plan: LogicalPlan): Option[(String,
      Seq[(graft.sources.GraftTransform, Seq[(String, String)])])] =
    plan match {
      case SubqueryAlias(_, child) => hiddenInfo(child)
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: graft.sources.GraftHiddenPartitionedIndex =>
            Some((g.tablePath, g.partitionGroups))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  private def refuseHidden(): Nothing =
    refuse("this DML form on a HIDDEN-partitioned graft table routes " +
      "through the transform — use HiddenPartitions.merge, or target " +
      "one partition's own dir")

  private def conjunctsOf(e: org.apache.spark.sql.catalyst.expressions.Expression):
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }

  /** The column names a conjunct references, or None if any reference
    * is not a plain (possibly alias-qualified) column. */
  private def refsOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
      aliases: Set[String]): Option[Set[String]] = {
    val leaves = e.collect {
      case a: AttributeReference => nameOf(a, aliases)
      case u: UnresolvedAttribute => nameOf(u, aliases)
    }
    if (leaves.forall(_.isDefined)) Some(leaves.flatten.toSet) else None
  }

  /** Bind the partition column to `value` inside an expression (the
    * per-partition form of a predicate over a hive-partitioned table —
    * partition files do not store the column; its value is the dir). */
  private def bindPart(e: org.apache.spark.sql.catalyst.expressions.Expression,
      partCol: String, value: String, aliases: Set[String]) =
    e.transform {
      case a: AttributeReference if a.name == partCol =>
        org.apache.spark.sql.catalyst.expressions.Literal(value)
      case u: UnresolvedAttribute if nameOf(u, aliases).contains(partCol) =>
        org.apache.spark.sql.catalyst.expressions.Literal(value)
    }

  /** Partition values surviving the predicate's partition-column-only
    * conjuncts (directory-level pruning: a skipped partition gets NO
    * commit, not a no-op version bump). Conjuncts referencing data
    * columns cannot prune — every partition may hold matching rows. */
  private def prunedParts(s: SparkSession,
      parts: Seq[(String, String)], partCol: String,
      cs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      aliases: Set[String]): Seq[(String, String)] = {
    val pcOnly = cs.filter(c =>
      refsOf(c, aliases).exists(r => r.nonEmpty && r == Set(partCol)))
    if (pcOnly.isEmpty) parts
    else {
      // the conjuncts reference ONLY the partition column, so they
      // resolve directly against a |partitions|-row local frame — ONE
      // tiny job for the whole prune, not a job per partition
      import s.implicits._
      val predSql = pcOnly.map(c => "(" + bareSql(c, aliases) + ")")
        .mkString(" AND ")
      val kept = parts.map(_._1).toDF(partCol)
        .filter(expr(predSql)).collect().map(_.getString(0)).toSet
      parts.filter(p => kept.contains(p._1))
    }
  }

  def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    // A26 + A44 (r8): DELETE / UPDATE / MERGE-upsert on a PARTITIONED
    // graft table route per partition — the predicate's partition
    // conjuncts prune at the directory level, the partition column is
    // bound to each surviving partition's value (hive layout: the
    // column lives in the dir name, not the files), and each partition
    // commits through its own log. INSERT still refuses (row routing
    // by value is mergePartitioned's job — use MERGE).
    // A49 hidden roots: the transform prunes directories from the
    // predicate's RESOLVED conjuncts; each surviving partition runs
    // the predicate UNCHANGED through its own log (the source column
    // lives in the data files — no value binding needed). SET of the
    // transform column refuses (row movement); MERGE star-upsert
    // routes through HiddenPartitions.merge.
    case DeleteFromTable(t, cond) if hiddenInfo(t).isDefined =>
      val (_, groups) = hiddenInfo(t).get
      val aliases = aliasesOf(t)
      val cs = conjunctsOf(cond)
      val predSql = bareSql(cond, aliases)
      LakeMaintenanceCommand("partitions", s => {
        // A53: each epoch's directories prune through its own transform
        val keep = groups.flatMap { case (transform, parts) =>
          parts.filter { case (value, _) =>
            cs.forall(transform.mayContain(value, _)) } }
        keep.foreach { case (_, dir) =>
          Snapshots.deleteVersioned(s, dir, expr(predSql)) }
        keep.size.toLong
      })
    case UpdateTable(t, assignments, cond) if hiddenInfo(t).isDefined =>
      val (_, groups) = hiddenInfo(t).get
      val aliases = aliasesOf(t)
      val transformCols = groups.map(_._1.col).toSet
      val assigns = assignments.map { a =>
        val n = nameOf(a.key, aliases).getOrElse(
          refuse("UPDATE assignment target must be a bare (top-level) column"))
        if (transformCols.contains(n)) refuse("UPDATE may not SET a hidden " +
          "partition transform's source column (row movement between " +
          "partitions) — use HiddenPartitions.merge")
        n -> bareSql(a.value, aliases)
      }
      val cs = cond.map(conjunctsOf).getOrElse(Seq.empty)
      val predSql = cond.map(bareSql(_, aliases)).getOrElse("true")
      LakeMaintenanceCommand("partitions", s => {
        val keep = groups.flatMap { case (transform, parts) =>
          parts.filter { case (value, _) =>
            cs.forall(transform.mayContain(value, _)) } }
        keep.foreach { case (_, dir) =>
          Snapshots.updateVersioned(s, dir, expr(predSql),
            assigns.map { case (n, v) => n -> expr(v) }) }
        keep.size.toLong
      })
    case m: MergeIntoTable if hiddenInfo(m.targetTable).isDefined =>
      val (path, _) = hiddenInfo(m.targetTable).get
      val aliases = aliasesOf(m.targetTable) ++ aliasesOf(m.sourceTable)
      val targetCols = outputCols(m.targetTable)
      val keyCols =
        try mergeKeyCols(m.mergeCondition, aliases)
        catch { case _: Exception => refuseHidden() }
      if (isUpdateStar(m.matchedActions, targetCols, aliases) &&
          isInsertStar(m.notMatchedActions, targetCols, aliases) &&
          m.notMatchedBySourceActions.isEmpty) {
        val source = ResolveGraftPath.rewrite(m.sourceTable)
        LakeMaintenanceCommand("partitions", s =>
          graft.sources.HiddenPartitions.merge(s, path,
            org.apache.spark.sql.GraftSqlInternals.ofRows(s, source),
            keyCols).size.toLong)
      } else refuseHidden()
    case i: InsertIntoStatement if hiddenInfo(i.table).isDefined =>
      refuseHidden()
    // the catalog-name INSERT on a hidden root arrives PLANNED: with
    // an empty partitionSchema it would write raw parquet into the
    // ROOT — invisible to every read. Refuse before it writes.
    case i: InsertIntoHadoopFsRelationCommand
        if i.fileIndex.exists(
          _.isInstanceOf[graft.sources.GraftHiddenPartitionedIndex]) =>
      refuseHidden()
    case DeleteFromTable(t, cond) if partInfo(t).isDefined =>
      val (_, partCol, parts) = partInfo(t).get
      val aliases = aliasesOf(t)
      val cs = conjunctsOf(cond)
      LakeMaintenanceCommand("partitions", s => {
        val keep = prunedParts(s, parts, partCol, cs, aliases)
        keep.foreach { case (value, dir) =>
          val predSql = cs.map(c =>
            "(" + bareSql(bindPart(c, partCol, value, aliases), aliases) + ")")
            .mkString(" AND ")
          Snapshots.deleteVersioned(s, dir, expr(predSql))
        }
        keep.size.toLong
      })
    case UpdateTable(t, assignments, cond) if partInfo(t).isDefined =>
      val (_, partCol, parts) = partInfo(t).get
      val aliases = aliasesOf(t)
      val assigns = assignments.map { a =>
        val n = nameOf(a.key, aliases).getOrElse(
          refuse("UPDATE assignment target must be a bare (top-level) column"))
        if (n == partCol) refuse("UPDATE may not SET the partition column " +
          "(row movement between partitions) — use MERGE")
        n -> a.value
      }
      val cs = cond.map(conjunctsOf).getOrElse(Seq.empty)
      LakeMaintenanceCommand("partitions", s => {
        val keep = prunedParts(s, parts, partCol, cs, aliases)
        keep.foreach { case (value, dir) =>
          val predSql =
            if (cs.isEmpty) "true"
            else cs.map(c =>
              "(" + bareSql(bindPart(c, partCol, value, aliases), aliases) + ")")
              .mkString(" AND ")
          Snapshots.updateVersioned(s, dir, expr(predSql),
            assigns.map { case (n, v) =>
              n -> expr(bareSql(bindPart(v, partCol, value, aliases), aliases)) })
        }
        keep.size.toLong
      })
    case m: MergeIntoTable if partInfo(m.targetTable).isDefined =>
      val (path, partCol, _) = partInfo(m.targetTable).get
      val aliases = aliasesOf(m.targetTable) ++ aliasesOf(m.sourceTable)
      val targetCols = outputCols(m.targetTable)
      val keyCols =
        try mergeKeyCols(m.mergeCondition, aliases)
        catch { case _: Exception => refusePartitioned() }
      if (isUpdateStar(m.matchedActions, targetCols, aliases) &&
          isInsertStar(m.notMatchedActions, targetCols, aliases) &&
          m.notMatchedBySourceActions.isEmpty) {
        val source = ResolveGraftPath.rewrite(m.sourceTable)
        LakeMaintenanceCommand("partitions", s =>
          graft.sources.PartitionedSnapshots.mergePartitioned(s, path,
            org.apache.spark.sql.GraftSqlInternals.ofRows(s, source),
            keyCols, partCol).size.toLong)
      } else refusePartitioned()
    case i: InsertIntoStatement if partInfo(i.table).isDefined =>
      refusePartitioned()
    case DeleteFromTable(t, cond) if pathOf(t).isDefined =>
      val p = pathOf(t).get
      val pred = bareSql(cond, aliasesOf(t))
      LakeMaintenanceCommand("version", s =>
        Snapshots.deleteVersioned(s, p, expr(pred)).toLong)
    case UpdateTable(t, assignments, cond) if pathOf(t).isDefined =>
      val p = pathOf(t).get
      val aliases = aliasesOf(t)
      val pred = cond.map(bareSql(_, aliases)).getOrElse("true")
      val assigns = assignments.map { a =>
        nameOf(a.key, aliases).getOrElse(
          refuse("UPDATE assignment target must be a bare (top-level) column")) ->
          bareSql(a.value, aliases)
      }
      LakeMaintenanceCommand("version", s =>
        Snapshots.updateVersioned(s, p, expr(pred),
          assigns.map { case (n, v) => n -> expr(v) }).toLong)
    case m: MergeIntoTable if pathOf(m.targetTable).isDefined =>
      planMerge(pathOf(m.targetTable).get, m)
    case i: InsertIntoStatement if pathOf(i.table).isDefined =>
      if (i.partitionSpec.nonEmpty)
        refuse("INSERT with a PARTITION spec targets the A26 partitioned " +
          "layout; write via PartitionedSnapshots")
      if (i.userSpecifiedCols.nonEmpty)
        refuse("INSERT with an explicit column list is unsupported; " +
          "project in the SELECT instead")
      val p = pathOf(i.table).get
      val q = ResolveGraftPath.rewrite(i.query)
      val overwrite = i.overwrite
      val byName = i.byName
      LakeMaintenanceCommand("version", s => {
        val df0 = org.apache.spark.sql.GraftSqlInternals.ofRows(s, q)
        // ANSI INSERT is POSITIONAL (unless BY NAME): align the query's
        // output to the table schema by position, casting per column
        val df =
          if (byName) df0
          else {
            val target = Snapshots.read(s, p).schema
            if (df0.columns.length != target.length) refuse(
              s"INSERT provides ${df0.columns.length} columns but the " +
                s"table has ${target.length}")
            df0.toDF(target.fieldNames.toIndexedSeq: _*)
              .select(target.fields.toIndexedSeq.map(f =>
                org.apache.spark.sql.functions.col(s"`${f.name}`")
                  .cast(f.dataType).as(f.name)): _*)
          }
        (if (overwrite) Snapshots.overwriteVersioned(s, p, df)
         else Snapshots.appendVersioned(s, p, df)).toLong
      })
    // the catalog-name INSERT arrives already planned by Spark's own
    // DataSourceAnalysis — re-route it before it writes raw files
    case i: InsertIntoHadoopFsRelationCommand
        if i.fileIndex.exists(_.isInstanceOf[GraftFileIndex]) =>
      val p = i.fileIndex.get.asInstanceOf[GraftFileIndex].tablePath
      val q = i.query
      val overwrite = i.mode == org.apache.spark.sql.SaveMode.Overwrite
      LakeMaintenanceCommand("version", s => {
        val df = org.apache.spark.sql.GraftSqlInternals.ofRows(s, q)
        (if (overwrite) Snapshots.overwriteVersioned(s, p, df)
         else Snapshots.appendVersioned(s, p, df)).toLong
      })
    // r15 (the r14 verdict's item 4) — SQL DDL FOR LAYOUTS:
    // `CREATE TABLE t (…) USING graft PARTITIONED BY (<transforms>)`
    // maps Spark's parsed transform list onto graft's own layout
    // metadata instead of failing ("transforms require a v2 catalog"):
    // day/hour/month/year(col), mod(n, col), truncate(w, col) become
    // the HIDDEN transform (_graft_part_spec, A49); a bare column
    // (identity) becomes the hive layout (recorded as the catalog
    // entry's partitionCol option, A26); bucket(n, col) becomes the
    // A50 bucket spec — alone a flat bucketed table, under a
    // transform/identity the COMPOSED layout. The table starts EMPTY;
    // the first merge/stream bootstraps its directories.
    case ct: CreateTable if isGraftLayoutDdl(ct) => planCreateLayout(ct)
    case other => other
  }

  private def isGraftLayoutDdl(ct: CreateTable): Boolean =
    ct.partitioning.nonEmpty && (ct.tableSpec match {
      case u: UnresolvedTableSpec =>
        u.provider.exists(_.equalsIgnoreCase("graft"))
      case _ => false
    })

  private def planCreateLayout(ct: CreateTable): LogicalPlan = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Literal => VLit}
    import org.apache.spark.sql.types.{StructField, StructType}
    val name = ct.name match {
      case ui: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
        ui.nameParts
      case other => refuse(s"graft DDL: unsupported table identifier $other")
    }
    require(name.length <= 2,
      s"graft DDL: at most db.table names (got ${name.mkString(".")})")
    val spec = ct.tableSpec match {
      case u: UnresolvedTableSpec => u
      case other => refuse(s"graft DDL: unsupported table spec $other")
    }
    val optMap: Map[String, String] = spec.optionExpression.options.collect {
      case (k, l: org.apache.spark.sql.catalyst.expressions.Literal) =>
        k -> String.valueOf(l.value)
    }.toMap
    val path = Snapshots.canonical(optMap.get("path")
      .orElse(spec.location).getOrElse(refuse(
        "graft DDL with PARTITIONED BY needs LOCATION '<dir>' or " +
          "OPTIONS (path '<dir>') — graft tables are path-addressed")))
    val schema = StructType(ct.columns.map(c =>
      StructField(c.name, c.dataType, c.nullable)))
    def refOf(t: Transform): String = t.arguments.collectFirst {
      case r: NamedReference => r.fieldNames.mkString(".") }.getOrElse(
      refuse(s"graft DDL: transform ${t.name} needs a column argument"))
    def litOf(t: Transform): Int = t.arguments.collectFirst {
      case l: VLit[_] => l.value.toString.toInt }.getOrElse(
      refuse(s"graft DDL: transform ${t.name} needs a numeric argument"))
    var identityCol: Option[String] = None
    var hidden: Option[graft.sources.GraftTransform] = None
    var bucket: Option[(String, Int)] = None
    def setHidden(g: graft.sources.GraftTransform): Unit = {
      if (hidden.nonEmpty) refuse("graft DDL: at most ONE transform " +
        "partition (evolve later with PARTITION-SPEC EVOLUTION)")
      hidden = Some(g)
    }
    ct.partitioning.foreach { t =>
      t.name.toLowerCase(java.util.Locale.ROOT) match {
        case "identity" =>
          if (identityCol.nonEmpty)
            refuse("graft DDL: at most one identity partition column")
          identityCol = Some(refOf(t))
        case "day" | "days" =>
          setHidden(graft.sources.DayTransform(refOf(t)))
        case "hour" | "hours" =>
          setHidden(graft.sources.HourTransform(refOf(t)))
        case "month" | "months" =>
          setHidden(graft.sources.MonthTransform(refOf(t)))
        case "year" | "years" =>
          setHidden(graft.sources.YearTransform(refOf(t)))
        case "mod" => setHidden(graft.sources.ModTransform(refOf(t), litOf(t)))
        case "truncate" =>
          setHidden(graft.sources.TruncateTransform(refOf(t), litOf(t)))
        case "bucket" =>
          if (bucket.nonEmpty) refuse("graft DDL: at most one bucket spec")
          bucket = Some((refOf(t), litOf(t)))
        case other => refuse(s"graft DDL: unsupported partition " +
          s"transform '$other' (identity column, day, hour, month, " +
          "year, mod, truncate, bucket)")
      }
    }
    if (identityCol.nonEmpty && hidden.nonEmpty)
      refuse("graft DDL: identity (hive) and hidden-transform " +
        "partitioning cannot compose — pick one; bucket(n, col) " +
        "composes with either")
    (identityCol.toSeq ++ hidden.map(_.col) ++ bucket.map(_._1)).foreach(c =>
      if (!schema.fieldNames.contains(c))
        refuse(s"graft DDL: partition column '$c' not in the table schema"))
    val ignoreIfExists = ct.ignoreIfExists
    LakeMaintenanceCommand("created", s => {
      val cat = s.sessionState.catalog
      val ident = TableIdentifier(name.last,
        if (name.length == 2) Some(name.head) else None)
      if (cat.tableExists(ident)) {
        require(ignoreIfExists,
          s"graft DDL: table ${name.mkString(".")} already exists")
        0L
      } else {
        hidden match {
          case Some(h) =>
            graft.sources.HiddenPartitions.initEmpty(path, h, bucket,
              Some(schema))
          case None if identityCol.nonEmpty =>
            java.nio.file.Files.createDirectories(
              java.nio.file.Paths.get(path))
            bucket.foreach { case (c, n) =>
              require(identityCol.get != c, "graft DDL: the bucket " +
                "column IS the partition column")
              graft.sources.PartitionedSnapshots.recordBucketSpec(path, c, n)
            }
          case None =>
            // flat bucketed table: a ZERO-FILE v0 commit carrying the
            // schema + `#bucketspec` — the manifest line self-preserves
            // (stageData routes every later write through the bucket
            // hash), so the first merge lands tagged
            val (c, n) = bucket.get
            require(Snapshots.currentVersion(path) < 0,
              s"graft DDL: $path is already a versioned table")
            java.nio.file.Files.createDirectories(
              java.nio.file.Paths.get(path))
            Snapshots.commit(path, Seq.empty, Some(schema),
              bucketOverride = Some((c, n)))
            ()
        }
        val storageProps = Map("path" -> path) ++
          identityCol.map("partitionCol" -> _)
        cat.createTable(org.apache.spark.sql.catalyst.catalog.CatalogTable(
          identifier = ident,
          tableType =
            org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
          storage = org.apache.spark.sql.catalyst.catalog
            .CatalogStorageFormat.empty.copy(
              locationUri =
                Some(java.nio.file.Paths.get(path).toAbsolutePath.toUri),
              properties = storageProps),
          schema = schema,
          provider = Some("graft")), ignoreIfExists = false)
        1L
      }
    })
  }
}

/** The post-hoc analyzer form of [[GraftDmlRules]] (catalog-named
  * targets — see that object's doc). */
class GraftDmlRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = GraftDmlRules.rewrite(plan)
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

/** `GRAFT DESCRIBE MATERIALIZED VIEW`: one row per base — the
  * freshness/lag view (consumed vs current version) an operator
  * watches, plus the lease and the aggregate shape; manifests only. */
case class LakeMvDetailCommand(mv: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("base", StringType, nullable = false)(),
    AttributeReference("role", StringType, nullable = false)(),
    AttributeReference("consumed_version", LongType, nullable = false)(),
    AttributeReference("base_version", LongType, nullable = false)(),
    AttributeReference("lag", LongType, nullable = false)(),
    AttributeReference("lease", StringType, nullable = false)(),
    AttributeReference("group_cols", StringType, nullable = false)(),
    AttributeReference("sum_cols", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.sources.MaterializedView.describe(mv)
      .map(t => Row(t.productIterator.toSeq: _*))
}

/** `GRAFT BEGIN TRANSACTION`: cuts the A56 WAP branches and returns
  * one row per table — (table, branch). The caller stages its writes
  * on the branch paths with ordinary DML, then `GRAFT COMMIT
  * TRANSACTION '<id>'`. */
case class LakeTxnBeginCommand(coordDir: String, tables: Seq[String],
    id: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("branch", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val h = graft.sources.GraftTxn.beginSql(spark, coordDir, tables, id)
    h.tables.map(t => Row(t, h.branchOf(t)))
  }
}

/** `GRAFT PIN CONSISTENT`: one row per table — (table, version) — such
  * that the version set never straddles a multi-table transaction;
  * read each with `versionAsOf` for a cross-table-consistent view. */
case class LakeTxnPinCommand(coordDir: String, tables: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.sources.GraftTxn.pinConsistent(spark, coordDir, tables)
      .toSeq.sortBy(_._1).map { case (t, v) => Row(t, v.toLong) }
}

/** `GRAFT VACUUM … DRY RUN`: one row per file the real vacuum would
  * reclaim — nothing is touched. */
case class LakeVacuumDryRunCommand(path: String, keepFrom: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("file", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Snapshots.vacuumDryRun(GraftSqlParser.runPath(path), keepFrom).map(Row(_))
}

/** `GRAFT PROBE VECTOR INDEX` (r14): ANN serving from SQL — top-k
  * neighbors for the named corpus keys, read off the STORED posting
  * lists against the pinned codebook ([[graft.operators.Similarity
  * .probeVectorIndex]]). Row-returning so the result composes with
  * plain SQL; the bounded probe (|keys| × k rows) is the serving
  * shape, never a corpus scan.
  */
case class LakeVectorProbeCommand(indexDir: String, keys: Seq[Long],
    k: Int, nprobe: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("neighbor_id", LongType, nullable = false)(),
    AttributeReference("cos_sim",
      org.apache.spark.sql.types.DoubleType, nullable = true)(),
    AttributeReference("rank", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.operators.Similarity
      .probeVectorIndex(spark, indexDir, keys, k, nprobe)
      .collect().toSeq // bounded: |keys| × k
}

/** `GRAFT DESCRIBE DETAIL` (the Delta DESCRIBE DETAIL shape): ONE row
  * of head-version table facts — version, live file count, total
  * bytes, row count when the manifest stats are complete, clustering
  * columns, bloom-indexed columns, CHECK constraint count, CDF flag —
  * every field from manifests alone; zero data files opened on a
  * 100 TB table.
  */
case class LakeDetailCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("clustering_cols", StringType, nullable = false)(),
    AttributeReference("bloom_cols", StringType, nullable = false)(),
    AttributeReference("num_constraints", LongType, nullable = false)(),
    AttributeReference("change_data_feed", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.runPath(this.path)
    val v = Snapshots.currentVersion(path)
    require(v >= 0, s"graft: $path is not a versioned table")
    val live = Snapshots.liveFiles(path, v).map(Snapshots.canonical)
    val bytes = live.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
    Seq(Row(v.toLong, live.size.toLong, bytes,
      Snapshots.rowCount(spark, path, v).map(Long.box).orNull,
      Snapshots.clusterOf(path, v).map(_.mkString(",")).getOrElse(""),
      Snapshots.bloomColsOf(path, v).map(_._1).mkString(","),
      Snapshots.constraintsOf(path, v).size.toLong,
      if (Snapshots.cdfEnabled(path, v)) "enabled" else "disabled"))
  }
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
