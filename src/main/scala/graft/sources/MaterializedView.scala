package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A55 — INCREMENTAL MATERIALIZED VIEW maintenance on the lake: a
  * group-by aggregate (`count(*)`, `sum`, and the `avg` they derive)
  * over a CDF-enabled versioned base table, materialized as its own
  * versioned graft table and REFRESHED from the A45/A31 change feed —
  * never by re-scanning the base. This is the bronze→silver step a
  * lake user builds first: the base takes merge/delete/update/append
  * waves, the MV follows with cost proportional to the CHANGE VOLUME.
  *
  * Why this is exact (the counting-algebra argument): every feed row
  * contributes a signed delta — `insert`/`update_postimage` +1,
  * `delete`/`update_preimage` −1 — so per group
  * `Δcnt = Σ sign`, `Δsum_c = Σ sign·c`, `Δnn_c = Σ sign·[c≠NULL]`.
  * count/sum are associative and commutative, so applying net deltas
  * equals recomputation in ANY interleaving, including the netted
  * multi-version window `changesCdf` serves. NULL-skipping SQL sums
  * need the non-null count too (`sum` of an all-NULL group is NULL,
  * not 0): the MV stores `s_c` (0-based running sum) and `nn_c`
  * alongside, and [[read]] derives `sum_c = nn_c = 0 ? NULL : s_c` and
  * `avg_c = s_c / nn_c` — exact ANSI semantics, maintained from
  * deltas alone. min/max are deliberately NOT offered: they are not
  * self-maintainable under deletes (a deleted max forces a rescan),
  * and this module refuses to approximate.
  *
  * The refresh itself is ONE A52 clause-merge on the MV keyed by the
  * encoded group key: groups whose count reaches zero DELETE, touched
  * groups UPDATE in place, unseen groups INSERT — and the A51
  * transaction mark `(mv@<base>, baseVersion)` rides the SAME commit
  * CAS, so the consumed-watermark and the data are atomic: a crashed
  * or replayed refresh is exactly-once by construction (the mark IS
  * the watermark; no sidecar window). Two racing refreshes of one MV:
  * one commits, the loser sees the winner's mark and no-ops.
  *
  * At 100 TB: refresh reads the stored change data (cost ∝ changed
  * rows — the base is never scanned; spec-pinned by deleting an
  * untouched base data file from disk before refreshing), aggregates
  * it to per-group deltas (one shuffle of the delta rows), and merges
  * into the MV through the A15/A27 stats-pruned key-range path (cost
  * ∝ touched groups). Integer sums are bit-exact; double sums are
  * deterministic but may differ from a recompute by float
  * reassociation — callers needing hash-stable doubles round on read.
  */
object MaterializedView {

  private val SpecFile = "_graft_mv_spec"

  final case class MvSpec(base: String, baseKey: String,
      groupCols: Seq[String], sumCols: Seq[String])

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  private[graft] def appId(base: String): String = "mv@" + norm(base)

  /** The MV's synthetic row key: the group tuple, NULL-safely encoded
    * (a NULL group value and the string "null" must not collide). */
  private def keyExpr(groupCols: Seq[String]): Column =
    concat_ws("", groupCols.map(g =>
      coalesce(col(s"`$g`").cast("string"), lit("NULL"))): _*)

  /** `cnt` plus, per sum column, the 0-based running sum `s_c` (its
    * input's own type) and the non-null count `nn_c` — signed, so the
    * same expressions build the full aggregate (sign ≡ 1) and the
    * feed deltas (sign ±1). */
  private def aggExprs(df: DataFrame, sumCols: Seq[String], sign: Column,
      cntName: String, prefix: String): Seq[Column] = {
    val types = df.schema
    sum(sign).as(cntName) +: sumCols.flatMap { c =>
      val dt = types(c).dataType
      Seq(
        coalesce(sum(sign * col(s"`$c`")), lit(0).cast(dt))
          .cast(dt).as(s"${prefix}s_$c"),
        sum(when(col(s"`$c`").isNotNull, sign).otherwise(lit(0L)))
          .as(s"${prefix}nn_$c"))
    }
  }

  /** Build the MV at the base's CURRENT version: one full aggregate
    * scan (the only full scan the MV ever pays), committed as the MV
    * table's v0 WITH the consumed-version mark. */
  def create(spark: SparkSession, mvRoot: String, base: String,
      baseKey: String, groupCols: Seq[String],
      sumCols: Seq[String] = Seq.empty): Int = {
    require(groupCols.nonEmpty, "materialized view: no group columns")
    require((groupCols ++ sumCols).forall(c => !c.contains(",")),
      "materialized view: ',' in a column name")
    val bv = Snapshots.currentVersion(base)
    require(bv >= 0, s"$base not initialized (call init)")
    require(Snapshots.currentVersion(mvRoot) < 0,
      s"$mvRoot already holds a table")
    val snap = Snapshots.read(spark, base)
    val aggs = aggExprs(snap, sumCols, lit(1L), "cnt", "")
    val full = snap.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__mv_key", keyExpr(groupCols))
    Files.createDirectories(Paths.get(mvRoot))
    Files.writeString(Paths.get(mvRoot, SpecFile),
      s"base=${norm(base)}\nkey=$baseKey\ngroup=${groupCols.mkString(",")}\n" +
        s"sum=${sumCols.mkString(",")}\n")
    Snapshots.appendVersionedIdempotent(spark, mvRoot, full,
      appId(base), bv.toLong)
  }

  def spec(mvRoot: String): MvSpec = {
    val lines = Files.readAllLines(Paths.get(mvRoot, SpecFile))
    def get(k: String): String = {
      val p = s"$k="
      lines.stream.filter(_.startsWith(p)).findFirst
        .orElseThrow(() => new IllegalStateException(
          s"$mvRoot/$SpecFile: missing '$k'"))
        .stripPrefix(p)
    }
    def split(s: String): Seq[String] =
      if (s.isEmpty) Seq.empty else s.split(",").toIndexedSeq
    MvSpec(get("base"), get("key"), split(get("group")), split(get("sum")))
  }

  /** The base version the MV currently reflects (the A51 mark). */
  def consumedVersion(mvRoot: String): Int = {
    val sp = spec(mvRoot)
    Snapshots.txnVersionOf(mvRoot, appId(sp.base)).getOrElse(
      throw new IllegalStateException(
        s"$mvRoot carries no consumed-version mark — not an MV?")).toInt
  }

  /** Advance the MV to the base's current version by applying the
    * change feed's net per-group deltas — one clause-merge commit,
    * exactly-once under the A51 mark. Returns the MV version (which
    * is unchanged when the base hasn't moved). */
  def refresh(spark: SparkSession, mvRoot: String): Int = {
    import MergeWhen._
    val sp = spec(mvRoot)
    val mvV = Snapshots.currentVersion(mvRoot)
    require(mvV >= 0, s"$mvRoot not initialized (call create)")
    val from = consumedVersion(mvRoot)
    val to = Snapshots.currentVersion(sp.base)
    require(to >= from, s"$mvRoot consumed v$from but ${sp.base} is at " +
      s"v$to — was the base RESTOREd? Recreate the MV")
    if (to == from) return mvV

    val cdf = Snapshots.changesCdf(spark, sp.base, from, to, sp.baseKey)
    val sign = when(col("_change_type")
      .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
    val dAggs = aggExprs(cdf, sp.sumCols, sign, "d_cnt", "d")
    val deltas0 = cdf.groupBy(sp.groupCols.map(c => col(s"`$c`")): _*)
      .agg(dAggs.head, dAggs.tail: _*)
    // groups whose net delta is zero everywhere need no rewrite
    val nonZero = (col("d_cnt") =!= 0L) +: sp.sumCols.flatMap(c => Seq(
      col(s"`ds_$c`") =!= lit(0), col(s"`dnn_$c`") =!= 0L))
    val deltas = deltas0.filter(nonZero.reduce(_ || _))
      .withColumn("__mv_key", keyExpr(sp.groupCols))

    val updateSet: Seq[(String, Column)] =
      ("cnt" -> (col("cnt") + src("d_cnt"))) +: sp.sumCols.flatMap(c => Seq(
        s"s_$c" -> (col(s"`s_$c`") + src(s"ds_$c")),
        s"nn_$c" -> (col(s"`nn_$c`") + src(s"dnn_$c"))))
    val insertVals: Seq[(String, Column)] =
      ("__mv_key" -> src("__mv_key")) +:
        ("cnt" -> src("d_cnt")) +:
        (sp.groupCols.map(g => g -> src(g)) ++
          sp.sumCols.flatMap(c => Seq(
            s"s_$c" -> src(s"ds_$c"), s"nn_$c" -> src(s"dnn_$c"))))
    Snapshots.mergeVersionedClauses(spark, mvRoot, deltas, "__mv_key", Seq(
      // a group whose count reaches zero disappears, as a recompute's
      // would; first-match-wins puts the death test before the update
      MatchedDelete(Some(col("cnt") + src("d_cnt") === 0L)),
      MatchedUpdate(None, updateSet),
      // only genuinely new groups insert (a pure-delete delta for an
      // unseen group cannot arise from a consistent feed)
      NotMatchedInsert(Some(src("d_cnt") > 0L), insertVals)),
      txn = Some((appId(sp.base), to.toLong)))
  }

  /** The MV's user-facing shape: group columns, `cnt`, and per sum
    * column the ANSI `sum_c` (NULL when no non-null contributor — the
    * stored 0-based running sum is an internal detail) and `avg_c`. */
  def read(spark: SparkSession, mvRoot: String): DataFrame = {
    val sp = spec(mvRoot)
    val mv = Snapshots.read(spark, mvRoot)
    val cols = sp.groupCols.map(c => col(s"`$c`")) ++
      Seq(col("cnt")) ++ sp.sumCols.flatMap(c => Seq(
        when(col(s"`nn_$c`") === 0L, lit(null))
          .otherwise(col(s"`s_$c`")).as(s"sum_$c"),
        when(col(s"`nn_$c`") === 0L, lit(null))
          .otherwise(col(s"`s_$c`") / col(s"`nn_$c`")).as(s"avg_$c")))
    mv.select(cols: _*)
  }
}
