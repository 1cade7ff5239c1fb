package graft.sources

import org.apache.spark.sql.Column

/** A52 — the FULL conditional MERGE surface (the Delta/ANSI workhorse
  * beyond the three exact shapes A44 already routes): an ordered list
  * of WHEN clauses, each optionally guarded, applied first-match-wins
  * per row:
  *
  *   WHEN MATCHED [AND c] THEN UPDATE SET col = expr, …   (partial SET)
  *   WHEN MATCHED [AND c] THEN DELETE
  *   WHEN NOT MATCHED [AND c] THEN INSERT (cols) VALUES (exprs)
  *   WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … / DELETE
  *
  * Conditions and value expressions are ordinary Columns over a joined
  * frame in which TARGET columns keep their names and SOURCE columns
  * are reachable through [[MergeWhen.src]] (`src("c")`); the SQL
  * parser route builds the same Columns from the statement's aliases.
  * Semantics follow ANSI/Delta: a guarded clause whose condition is
  * NULL does not fire; a matched row no clause fires on is kept
  * unchanged; a source row no NOT MATCHED clause fires on is not
  * inserted; NOT MATCHED BY SOURCE sees only target columns. Source
  * keys must be unique — on a keyed table a duplicate-key source is a
  * cardinality violation (checked, refused loudly).
  */
sealed trait MergeWhen

object MergeWhen {
  /** Source column reference inside clause conditions/values. */
  def src(c: String): Column =
    org.apache.spark.sql.functions.col(s"`__src_$c`")

  private[graft] def srcName(c: String): String = s"__src_$c"

  case class MatchedUpdate(cond: Option[Column],
      set: Seq[(String, Column)]) extends MergeWhen
  case class MatchedDelete(cond: Option[Column]) extends MergeWhen
  case class NotMatchedInsert(cond: Option[Column],
      values: Seq[(String, Column)]) extends MergeWhen
  case class BySourceUpdate(cond: Option[Column],
      set: Seq[(String, Column)]) extends MergeWhen
  case class BySourceDelete(cond: Option[Column]) extends MergeWhen
}
