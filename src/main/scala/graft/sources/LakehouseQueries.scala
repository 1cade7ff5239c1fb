package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-surface queries for the A18/A20/A22/A23 lakehouse machinery
  * (snapshot log, OPTIMIZE, OCC merge, change feed, schema evolution on
  * write). Each stages a small versioned table from `orders` in a fresh
  * temp dir, drives the table-format operation under test, and returns
  * a result the DuckDB oracle can reproduce from the raw parquet alone
  * — so the correctness gate covers the log/merge/feed code paths
  * end-to-end, not just their ScalaTest specs.
  *
  * Scale note: the staged tables are sf-sized here, but every operation
  * exercised is the manifest-diff / touched-files-only shape — commit
  * cost tracks changed files, change-feed cost tracks the version diff,
  * OPTIMIZE reads only sub-target files. Nothing below scans
  * proportionally to table size except the initial staging write.
  */
object LakehouseQueries {

  /** orders reduced to a 3-column merge-friendly shape. */
  private def base(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")

  /** Staged dirs awaiting reclamation. ONE shutdown hook drains the
    * shared list (a hook thread per dir would accumulate across a
    * bench+verify+audit session that invokes each query several times),
    * and [[reclaim]] lets a harness delete eagerly between queries —
    * at a 100× sweep the staged copies are tens of GB of /tmp
    * (possibly tmpfs/RAM) that must not pin until JVM exit.
    */
  private val staged = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]
  private lazy val hookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => reclaim()))

  private[graft] def tempDir(prefix: String): String = {
    hookOnce
    val dir = Files.createTempDirectory(prefix)
    staged.synchronized { staged += dir }
    dir.toString
  }

  /** Eagerly delete every dir staged so far. Safe once the staging
    * queries' results are DRAINED (bench's noop force, verify's parquet
    * dump) — a still-lazy DataFrame over a reclaimed dir would lose its
    * input. Harnesses call this between queries; the shutdown hook
    * covers whatever remains.
    */
  def reclaim(): Unit = {
    val dirs = staged.synchronized { val d = staged.toList; staged.clear(); d }
    dirs.foreach { dir =>
      try {
        val walk = Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      } catch { case _: Exception => () }
    }
  }

  private def stage(df: DataFrame, nFiles: Int): String = {
    val dir = tempDir("graft_lake")
    df.repartition(nFiles).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Plan-introspection verdict shared by the MV-rewrite gates: the
    * graft table roots `q`'s OPTIMIZED plan still scans — empty/
    * MV-only when the rewrite replaced every base read. */
  private def scannedGraftRoots(q: DataFrame): Set[String] =
    q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location match {
              case g: GraftFileIndex => Seq(g.tablePath)
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        }
    }.flatten.map(p => Paths.get(p).toAbsolutePath.normalize.toString).toSet

  // r12 (the r11 verdict's item 8) — BENCH STAGING SPLIT: the heavy
  // lake gates spend most of their wall fabricating HISTORY (staged
  // tables, DML waves, MV full builds) before the operator under test
  // even runs; at sf0.1 that staging is manifest/commit latency, not
  // plan cost, and it drowned the per-query tail (19 s gates whose
  // measured read is |MV|-rows). Gates wrap that setup in `staged{}`;
  // Bench drains the accumulator after forcing each query and reports
  // it as a separate `_stage_<name>` entry, so `<name>` itself is the
  // operator's own cost, totals still sum to wall, and the ORACLE is
  // untouched (Verify never drains — the results are bit-identical).
  @volatile private var stagingNanos = 0L
  private[graft] def drainStagingSeconds(): Double = {
    val s = stagingNanos / 1e9; stagingNanos = 0L; s
  }
  /** Cross-module staging declaration (r14): operator files outside
    * this object (e.g. Similarity's SQL-index corpus fabrication)
    * declare their bench staging through the same reentrant counter. */
  private[graft] def stagedFor[A](body: => A): A = staged(body)

  // reentrant (r13): stageHistory declares its own staging, and some
  // callers wrap their whole fabrication too — only the OUTERMOST
  // block may add to the counter or nesting double-counts
  private var stagedDepth = 0
  private def staged[A](body: => A): A = {
    val t0 = System.nanoTime(); stagedDepth += 1
    try body finally {
      stagedDepth -= 1
      if (stagedDepth == 0) stagingNanos += System.nanoTime() - t0
    }
  }

  // ---- r13 bench hygiene: SHARED lake fixtures --------------------
  // Several gates fabricate the SAME multi-version history (the
  // stageHistory three-version table, ×7 call sites). Fabricate it
  // ONCE per JVM and hand each caller an independent HARD-LINK clone:
  // data files and manifests are immutable (every commit path is
  // write-new-then-move, never write-in-place), so links are safe, a
  // clone's own commits/restore/vacuum touch only its tree, and the
  // clone costs a directory walk instead of Spark jobs. The master
  // lives OUTSIDE the reclaim registry (it must survive the harness's
  // between-query reclaim) and dies with the JVM.
  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val masterDirs =
    scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]
  private lazy val masterHookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      masterDirs.synchronized(masterDirs.toList).foreach { dir =>
        try {
          val walk = Files.walk(dir)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          finally walk.close()
        } catch { case _: Exception => () }
      }))
  private def linkTree(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val q = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else Files.createLink(q, p)
    } finally walk.close()
  }
  private[graft] def cachedFixture(tag: String)(
      build: String => Unit): String = {
    val master = fixtures.computeIfAbsent(tag, _ => {
      masterHookOnce
      val root = Files.createTempDirectory(s"graft_fixture_$tag")
      masterDirs.synchronized { masterDirs += root }
      val t = root.toString + "/t"
      build(t)
      // the clone repoint below rewrites absolute paths only inside
      // *.manifest text; DV parquet sidecars embed master paths in
      // their __dv_file DATA column, which no text rewrite reaches — a
      // clone's anti join would silently miss the master's dead rows.
      // A cached fixture must therefore be DV-free at every retained
      // version; enforced here, not documented-and-hoped (r13 ADVICE).
      // CoW change-data sidecars are fine: their rows are (key,
      // change_type, payload) with no embedded paths, and the `#cdf=`
      // manifest references ARE rewritten (the only path-carrying CDF
      // flavor is the DV-advertised one, which the DV check refuses).
      val head = Snapshots.currentVersion(t)
      if (head >= 0)
        (Snapshots.earliestVersion(t) to head).foreach { v =>
          require(Snapshots.dvFiles(t, v).isEmpty,
            s"cachedFixture('$tag') staged deletion vectors at v$v — " +
              "hard-link clones cannot repoint DV-embedded paths")
        }
      t
    })
    val clone = tempDir("graft_fix_clone") + "/t"
    Files.createDirectories(Paths.get(clone))
    linkTree(Paths.get(master), Paths.get(clone))
    // manifests record ABSOLUTE canonical file paths — repoint them at
    // the clone's own tree (link names are preserved, so a textual
    // prefix rewrite is exact), or a clone's vacuum / restore /
    // file-deletion pin would reach the MASTER's files and poison
    // every later clone. REPLACING (not editing) each manifest breaks
    // the hard link first, so the master's own manifests stay intact.
    val logDir = Paths.get(clone, "_graft_log")
    if (Files.isDirectory(logDir)) {
      val files = Files.list(logDir)
      try files.forEach { p =>
        if (p.getFileName.toString.endsWith(".manifest")) {
          val rewritten = new String(Files.readAllBytes(p), "UTF-8")
            .replace(master, clone)
          Files.delete(p)
          Files.write(p, rewritten.getBytes("UTF-8"))
        }
      } finally files.close()
    }
    clone
  }

  /** A22 — OPTIMIZE bin-packing preserves the live row multiset: stage
    * as 8 deliberately-small files, compact to ⌈Σ/target⌉ packed files,
    * and aggregate the post-OPTIMIZE read. The oracle sees the raw
    * table — any row lost/duplicated by compaction breaks the hash.
    */
  def qLakeOptimize(s: SparkSession, d: String): DataFrame = {
    val dir = stagedBase(s, d, "b8", 8, cdf = false)(base(s, d))
    Snapshots.compact(s, dir)
    Snapshots.read(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
  }

  val qLakeOptimizeSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** A22 r8 — predicate-SCOPED OPTIMIZE (`compactWhere`): 8 key-range
    * files staged, only those whose manifest [min,max] intersects
    * o_orderkey ∈ [0, 30000] bin-packed; out-of-range files stay in
    * place BY PATH (spec-pinned in LakeSqlSpec — SQL cannot observe
    * file identity). The oracled read proves the scoped rewrite
    * preserved the live row multiset exactly.
    */
  def qLakeOptimizeWhere(s: SparkSession, d: String): DataFrame = {
    val dir = tempDir("graft_lake")
    base(s, d).repartitionByRange(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(dir)
    Snapshots.init(s, dir)
    Snapshots.compactWhere(s, dir, "o_orderkey", 0L, 30000L)
    Snapshots.read(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
  }

  val qLakeOptimizeWhereSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** A16/A18 — versioned copy-on-write MERGE through the OCC commit
    * path: full-row updates (keys ≡ 0 mod 97, re-statused 'U', price
    * +10000) plus brand-new inserts (negated keys ≡ 0 mod 101,
    * status 'I') land in ONE keyed merge; the post-merge read must
    * equal the SQL merge semantics.
    */
  def qLakeMerge(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = stage(b, 4)
    Snapshots.init(s, dir)
    val upd = b.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 10000.0).as("o_totalprice"))
    // key 0 excluded (r13): −0 = 0 collides with upd's key 0 — a
    // duplicate-keyed source, which the merge now refuses up front
    val ins = b.filter(col("o_orderkey") % 101 === 0 && col("o_orderkey") > 0)
      .select((-col("o_orderkey")).as("o_orderkey"),
        lit("I").as("o_orderstatus"), col("o_totalprice"))
    Snapshots.mergeVersioned(s, dir, upd.unionByName(ins), "o_orderkey")
    Snapshots.read(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
  }

  val qLakeMergeSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |upd AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus,
      |    o_totalprice + 10000.0 AS o_totalprice
      |  FROM base WHERE o_orderkey % 97 = 0),
      |ins AS (
      |  SELECT -o_orderkey AS o_orderkey, 'I' AS o_orderstatus,
      |    o_totalprice
      |  FROM base WHERE o_orderkey % 101 = 0 AND o_orderkey > 0),
      |merged AS (
      |  SELECT * FROM base WHERE o_orderkey % 97 <> 0
      |  UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins)
      |SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM merged GROUP BY o_orderstatus""".stripMargin

  /** Shared three-version history for the change-feed queries:
    * v0 = keys ≡ 0 mod 3 (key 0 excluded: −0 = 0 would make the v2
    * "insert" resurrect the v1-deleted row with an identical payload —
    * a net no-op the direct-diff feed rightly drops but a naive oracle
    * double-counts); v1 = DELETE keys ≡ 0 mod 9; v2 = MERGE(update
    * keys ≡ 0 mod 15 ∧ ≢ 0 mod 9 at price+5000, insert negated keys
    * ≡ 0 mod 21). Returns the table dir.
    */
  private def stageHistory(s: SparkSession, d: String,
      cdf: Boolean = false): String = staged {
    // r13: 7 gates consume this exact history — one fabrication per
    // (sf, cdf) per JVM, hard-link clones after that
    val tag = "hist_" + (if (cdf) "cdf_" else "plain_") +
      java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
        .replaceAll("[^A-Za-z0-9.]", "_")
    cachedFixture(tag) { dir =>
      val b = base(s, d)
        .filter(col("o_orderkey") % 3 === 0 && col("o_orderkey") > 0)
      b.repartition(4).write.mode("overwrite").parquet(dir)
      Snapshots.init(s, dir, changeDataFeed = cdf)
      Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 9 === 0)
      val upd = b.filter(col("o_orderkey") % 15 === 0 &&
          col("o_orderkey") % 9 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 5000.0).as("o_totalprice"))
      val ins = b.filter(col("o_orderkey") % 21 === 0)
        .select((-col("o_orderkey")).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
      Snapshots.mergeVersioned(s, dir, upd.unionByName(ins), "o_orderkey")
    }
  }

  /** r14 (the r13 verdict's item 8, bench hygiene round 2): shared v0
    * BOOTSTRAP fixture — the MV gates each staged a full-table write +
    * log init per invocation, ~60 s of near-identical fabrication per
    * bench run. A (key, cdf, sf)-keyed master is fabricated once per
    * JVM; every caller gets a hard-link clone (the stageHistory
    * contract: DV-free master, manifests repointed) and runs its OWN
    * DML waves / MV builds on the clone. Only used where ≥2 gates
    * share a base shape — a single-consumer fixture would just add
    * clone cost. */
  private def stagedBase(s: SparkSession, d: String, key: String,
      nFiles: Int, cdf: Boolean)(build: => DataFrame): String = staged {
    val tag = s"base_${key}_" + (if (cdf) "cdf_" else "plain_") +
      java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
        .replaceAll("[^A-Za-z0-9.]", "_")
    cachedFixture(tag) { dir =>
      build.repartition(nFiles).write.mode("overwrite").parquet(dir)
      Snapshots.init(s, dir, changeDataFeed = cdf)
      ()
    }
  }

  /** A20 — change feed with post-image payload across the staged
    * three-version history: exactly the deletes, updates (new payload)
    * and inserts, nothing for rows merely rewritten verbatim by the
    * copy-on-write churn.
    */
  def qLakeChangefeed(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d)
    Snapshots.changesWithPayload(s, dir, 0, 2, "o_orderkey")
  }

  val qLakeChangefeedSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0)
      |SELECT o_orderkey, 'delete' AS change_type,
      |  CAST(NULL AS VARCHAR) AS o_orderstatus,
      |  CAST(NULL AS DOUBLE) AS o_totalprice
      |FROM base WHERE o_orderkey % 9 = 0
      |UNION ALL
      |SELECT o_orderkey, 'update', o_orderstatus, o_totalprice + 5000.0
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT -o_orderkey, 'insert', o_orderstatus, o_totalprice
      |FROM base WHERE o_orderkey % 21 = 0""".stripMargin

  /** A23 — the change feed consumed INCREMENTALLY: one batch per
    * committed version through [[graft.streaming.ChangeFeed]] (initial
    * snapshot-as-inserts, then one batch per version), tagged with the
    * delivering version. The staged table enables the A31 table
    * property, so every single-step batch here is served from STORED
    * change rows (the changed-rows fast path) — and the oracle
    * reconstructs the full delivery log from the raw table, gating
    * that path's batch boundaries AND contents end-to-end.
    */
  def qLakeFeedStream(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d, cdf = true)
    val ckpt = tempDir("graft_feed_ckpt")
    val feed = Snapshots.readChangesStream(s, dir, "o_orderkey", ckpt)
    val batches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    feed.processAllAvailable { (batch, _, toV) =>
      batches += batch.withColumn("batch", lit(toV))
    }
    batches.reduce(_.unionByName(_))
  }

  val qLakeFeedStreamSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0)
      |SELECT o_orderkey, 'insert' AS change_type, o_orderstatus,
      |  o_totalprice, 0 AS batch
      |FROM base
      |UNION ALL
      |SELECT o_orderkey, 'delete', CAST(NULL AS VARCHAR),
      |  CAST(NULL AS DOUBLE), 1
      |FROM base WHERE o_orderkey % 9 = 0
      |UNION ALL
      |SELECT o_orderkey, 'update', o_orderstatus, o_totalprice + 5000.0, 2
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT -o_orderkey, 'insert', o_orderstatus, o_totalprice, 2
      |FROM base WHERE o_orderkey % 21 = 0""".stripMargin

  /** A19-on-write — schema evolution through a widening merge: the
    * update batch carries a NEW `score` column; untouched rows
    * null-fill it on read under the widened recorded schema.
    */
  def qLakeSchemaEvo(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 2 === 0)
    val dir = stage(b, 4)
    Snapshots.init(s, dir)
    val upd = b.filter(col("o_orderkey") % 10 === 0)
      .withColumn("score", (col("o_orderkey") % 7).cast("double"))
    Snapshots.mergeVersioned(s, dir, upd, "o_orderkey")
    Snapshots.read(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "score")
  }

  val qLakeSchemaEvoSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  CAST(NULL AS DOUBLE) AS score
      |FROM base WHERE o_orderkey % 10 <> 0
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  CAST(o_orderkey % 7 AS DOUBLE) AS score
      |FROM base WHERE o_orderkey % 10 = 0""".stripMargin

  /** A24 — column-mapping schema evolution end-to-end: RENAME
    * o_totalprice→price (metadata-only commit), DROP o_orderstatus
    * (metadata-only), then a keyed MERGE under the NEW schema whose
    * copy-on-write rewrite must read old files through the mapping
    * (logical `price` ↔ physical `o_totalprice`) and stage new files
    * under physical names. The final read answers under the new
    * logical names with values the oracle reproduces from the raw
    * table; SnapshotsSpec pins that pre-rename versions still read
    * under their own old names.
    */
  def qLakeSchemaMap(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 2 === 1)
    val dir = stage(b, 4)
    Snapshots.init(s, dir)
    Snapshots.renameColumn(s, dir, "o_totalprice", "price")
    Snapshots.dropColumn(s, dir, "o_orderstatus")
    val upd = b.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), (col("o_totalprice") + 1000.0).as("price"))
    Snapshots.mergeVersioned(s, dir, upd, "o_orderkey")
    Snapshots.read(s, dir).select("o_orderkey", "price")
  }

  val qLakeSchemaMapSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1000.0
      |       ELSE o_totalprice END AS price
      |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin

  /** A18 — vacuum + retention: after dropping versions 0-1 (manifests
    * gone, their exclusively-referenced data files reclaimed, orphans
    * swept), the LATEST version must still read back the full merged
    * state — deletes applied, updates in force, inserts present. The
    * oracle reconstructs that state from the raw table, so a vacuum
    * that reclaims a still-live file breaks the hash loudly.
    */
  def qLakeVacuum(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d)
    Snapshots.vacuum(dir, keepFrom = 2)
    Snapshots.read(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  val qLakeVacuumSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0)
      |SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM base WHERE o_orderkey % 9 <> 0 AND o_orderkey % 15 <> 0
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice + 5000.0
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT -o_orderkey, o_orderstatus, o_totalprice
      |FROM base WHERE o_orderkey % 21 = 0""".stripMargin

  /** A22+A14 — OPTIMIZE ZORDER on the snapshot log: stage 8 files,
    * re-cluster the live set on the Morton code of (o_orderkey,
    * o_totalprice), then read three ways the oracle reproduces from the
    * raw table alone: (v0) time travel PAST the optimize — layout
    * rewrites retire files from the manifest, never disk, so the
    * pre-OPTIMIZE version reads bit-exact; (z_key)/(z_price) pruned
    * range reads on EITHER z-ed dimension through the A15-style
    * per-file index over the live manifest. Any row lost, duplicated,
    * or re-valued by the re-clustering breaks a hash; the file-level
    * pruning factor itself is spec-pinned (SnapshotsSpec).
    */
  def qLakeZorder(s: SparkSession, d: String): DataFrame = {
    val dir = stagedBase(s, d, "b8", 8, cdf = false)(base(s, d))
    Snapshots.compactZOrder(s, dir, "o_orderkey", "o_totalprice", 16)
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    aggAll(Snapshots.read(s, dir, version = 0), "v0")
      .unionByName(aggAll(
        Snapshots.readPrunedRange(s, dir, "o_orderkey", 1L, 1000L), "z_key"))
      .unionByName(aggAll(
        Snapshots.readPrunedRange(s, dir, "o_totalprice", 100000L, 150000L), "z_price"))
  }

  val qLakeZorderSql: String =
    """SELECT 'v0' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders
      |UNION ALL
      |SELECT 'z_key', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM orders WHERE o_orderkey BETWEEN 1 AND 1000
      |UNION ALL
      |SELECT 'z_price', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM orders WHERE o_totalprice BETWEEN 100000 AND 150000""".stripMargin

  /** r12 (the r11 verdict's item 5) — ZORDER BY (string, numeric), the
    * commonest real clustering pair (country, ts): the z-kernel ranks
    * the STRING dimension by its 8-byte prefix key and the manifest
    * records its per-file truncated-prefix ranges ('S' tag), so an
    * equality predicate on the string column prunes files from the
    * manifest alone. Pinned the hard way: a live z-ordered file whose
    * recorded range EXCLUDES '1-URGENT' is deleted from disk, and the
    * equality read must answer without ever planning it; the v0 leg
    * proves the rewrite preserved the row multiset (v0's own files are
    * untouched by the v1 deletion). ZorderSpec adds the slab pin (the
    * string dimension prunes ≥ the 2% bar).
    */
  def qLakeZorderStr(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val dir = stage(o, 8)
    Snapshots.init(s, dir)
    Snapshots.compactZOrder(s, dir, "o_orderpriority", "o_orderkey", 16)
    val vNow = Snapshots.currentVersion(dir)
    val stats = Snapshots.fileStats(dir, vNow)
    val doomed = Snapshots.liveFiles(dir, vNow).map(Snapshots.canonical)
      .find(f => stats.get(f).flatMap(_.get("o_orderpriority")).exists {
        case (t, mn, _) => t == "S" &&
          Snapshots.decodeStringStat(mn).exists(b =>
            b._1.nonEmpty && b._1(0) > '1'.toByte)
      })
      .getOrElse(throw new IllegalStateException("no URGENT-free file"))
    Files.delete(Paths.get(doomed))
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    aggAll(Snapshots.read(s, dir, version = 0), "v0")
      .unionByName(aggAll(
        graft.plans.GraftSessions.withExtensions(s).read.format("graft")
          .load(dir).filter(col("o_orderpriority") === "1-URGENT"),
        "urgent"))
  }

  val qLakeZorderStrSql: String =
    """SELECT 'v0' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders
      |UNION ALL
      |SELECT 'urgent', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  /** A26 — hive-partitioned versioned table end-to-end: orders routed
    * into per-status partition logs, a keyed MERGE that updates rows
    * in place in their partitions AND creates a brand-new partition
    * value, then a PARTITION-PRUNED read (only 'F' and the new 'X' —
    * other partitions' logs are never opened, spec-pinned). The oracle
    * reproduces the merged, pruned state from the raw table.
    */
  def qLakePartitioned(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    // a fresh SUBPATH: the partitioned write creates the table root
    // itself (reclaim still tracks the parent temp dir)
    val dir = tempDir("graft_lake_part") + "/t"
    PartitionedSnapshots.init(s, dir, b, "o_orderstatus")
    val upd = b.filter(col("o_orderkey") % 41 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") + 7777.0).as("o_totalprice"))
    val ins = b.filter(col("o_orderkey") % 53 === 0)
      .select((-col("o_orderkey")).as("o_orderkey"),
        lit("X").as("o_orderstatus"), col("o_totalprice"))
    PartitionedSnapshots.mergePartitioned(s, dir,
      upd.unionByName(ins), "o_orderkey", "o_orderstatus")
    PartitionedSnapshots.read(s, dir, "o_orderstatus",
        v => v == "F" || v == "X")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
  }

  val qLakePartitionedSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |merged AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 41 = 0 THEN o_totalprice + 7777.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM base
      |  UNION ALL
      |  SELECT -o_orderkey, 'X', o_totalprice
      |  FROM base WHERE o_orderkey % 53 = 0)
      |SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM merged WHERE o_orderstatus IN ('F', 'X')
      |GROUP BY o_orderstatus""".stripMargin

  /** A28 — RESTORE: after the delete (v1) and merge (v2) commits, roll
    * back to v1 as a NEW commit (v3) and read the head. The result must
    * equal v1's exact content — deletes in force, the v2 updates and
    * inserts both un-done — while v2 stays time-travelable (spec-pinned
    * along with the feed across the restore commit reporting exactly
    * the un-done rows). The oracle reconstructs v1 from the raw table.
    */
  def qLakeRestore(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d)
    Snapshots.restore(dir, toV = 1)
    Snapshots.read(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  val qLakeRestoreSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE o_orderkey % 3 = 0 AND o_orderkey > 0 AND o_orderkey % 9 <> 0""".stripMargin

  /** A29 — shallow CLONE: clone the staged table by reference (zero
    * data movement — the clone's v0 borrows the source's files by
    * absolute path), merge new values INTO THE CLONE, and read both
    * tables. The source must be bit-identical to its pre-clone self
    * (divergent histories), the clone must show the merge — and the
    * copy-on-write of borrowed files must land in the CLONE's
    * directory (containment spec-pinned, with vacuum refusing to
    * reclaim borrowed files).
    */
  def qLakeClone(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 4 === 0)
    val src = stage(b, 4)
    Snapshots.init(s, src)
    val dst = tempDir("graft_lake_clone") + "/t"
    Snapshots.cloneShallow(src, dst)
    val upd = b.filter(col("o_orderkey") % 32 === 0)
      .select(col("o_orderkey"), lit("C").as("o_orderstatus"),
        (col("o_totalprice") + 111.0).as("o_totalprice"))
    Snapshots.mergeVersioned(s, dst, upd, "o_orderkey")
    // r11 DEEP-clone branch: share-nothing is pinned by DELETING the
    // source's EVERY live data file from disk after cloning — a
    // path-sharing (shallow) copy could not answer anymore
    val b2 = base(s, d).filter(col("o_orderkey") % 4 === 2)
    val src2 = stage(b2, 3)
    Snapshots.init(s, src2)
    val deep = tempDir("graft_lake_dclone") + "/t"
    Snapshots.cloneDeep(src2, deep)
    Snapshots.liveFiles(src2, Snapshots.currentVersion(src2))
      .foreach(f => Files.delete(Paths.get(f)))
    // r13 DV-carrying deep clone: a MoR delete + MoR update leave the
    // source mid-merge-on-read; the deep clone MATERIALIZES the
    // touched files (its v0 carries no DV refs), and the same
    // delete-the-source pin proves nothing is shared — a clone that
    // leaked a DV ref or resurrected a dead row breaks the hash
    val b3 = base(s, d).filter(col("o_orderkey") % 4 === 1)
    val src3 = stage(b3, 3)
    Snapshots.init(s, src3)
    Snapshots.deleteVersionedDV(s, src3, col("o_orderkey") % 11 === 0)
    Snapshots.updateVersionedDV(s, src3, col("o_orderkey") % 13 === 0,
      Seq("o_totalprice" -> (col("o_totalprice") + 55.0)))
    val deepDv = tempDir("graft_lake_dvclone") + "/t"
    Snapshots.cloneDeep(src3, deepDv)
    require(Snapshots.dvFiles(deepDv, 0).isEmpty,
      "a deep clone must not carry DV refs")
    Snapshots.liveFiles(src3, Snapshots.currentVersion(src3))
      .foreach(f => Files.delete(Paths.get(f)))
    Snapshots.read(s, src).withColumn("t", lit("src"))
      .unionByName(Snapshots.read(s, dst).withColumn("t", lit("clone")))
      .unionByName(Snapshots.read(s, deep).withColumn("t", lit("deep")))
      .unionByName(Snapshots.read(s, deepDv).withColumn("t", lit("deepdv")))
  }

  val qLakeCloneSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 4 = 0)
      |SELECT o_orderkey, o_orderstatus, o_totalprice, 'src' AS t FROM base
      |UNION ALL
      |SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 32 = 0 THEN 'C' ELSE o_orderstatus END,
      |  CASE WHEN o_orderkey % 32 = 0 THEN o_totalprice + 111.0
      |       ELSE o_totalprice END,
      |  'clone' FROM base
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice, 'deep'
      |FROM orders WHERE o_orderkey % 4 = 2
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 55.0
      |       ELSE o_totalprice END, 'deepdv'
      |FROM orders
      |WHERE o_orderkey % 4 = 1 AND o_orderkey % 11 <> 0""".stripMargin

  /** A30 — deletion vectors end-to-end: two MERGE-ON-READ deletes (no
    * data file rewritten — the commits write row positions only), then
    * a reconcile that folds the DVs into plain files. Four snapshots
    * the oracle reproduces from the raw table: v0 (pre-delete), `mor`
    * (both DVs in force, applied at read), `feed` (the change feed
    * sees the merge-on-read deletes though no data file changed), and
    * `cow` (post-reconcile — same rows as `mor`, now DV-free). Any
    * dead row leaking into a read, or live row lost by the reconcile,
    * breaks a hash.
    */
  def qLakeDv(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 5 === 0)
    val dir = stage(b, 4)
    Snapshots.init(s, dir) // v0
    Snapshots.deleteVersionedDV(s, dir, col("o_orderkey") % 35 === 0) // v1
    Snapshots.deleteVersionedDV(s, dir, col("o_orderkey") % 45 === 0) // v2
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    val feed = Snapshots.changesBetween(s, dir, 0, 2, "o_orderkey")
      .agg(count(lit(1)).as("n"), lit(null).cast("double").as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .select(lit("feed").as("snap"), col("n"), col("total"),
        col("min_key"), col("max_key"))
    val mor = aggAll(Snapshots.read(s, dir), "mor")
    Snapshots.reconcileDV(s, dir) // v3
    aggAll(Snapshots.read(s, dir, version = 0), "v0")
      .unionByName(mor)
      .unionByName(feed)
      .unionByName(aggAll(Snapshots.read(s, dir), "cow"))
  }

  val qLakeDvSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |dead AS (
      |  SELECT * FROM base
      |  WHERE o_orderkey % 35 = 0 OR o_orderkey % 45 = 0),
      |live AS (
      |  SELECT * FROM base
      |  WHERE o_orderkey % 35 <> 0 AND o_orderkey % 45 <> 0)
      |SELECT 'v0' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM base
      |UNION ALL
      |SELECT 'mor', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM live
      |UNION ALL
      |SELECT 'feed', count(*), CAST(NULL AS DOUBLE),
      |  min(o_orderkey), max(o_orderkey)
      |FROM dead
      |UNION ALL
      |SELECT 'cow', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM live""".stripMargin

  /** A33 — manifest-only row counts: after a pure-insert merge and a
    * DV delete, `count(*)` of every retained version comes from the
    * manifest's recorded per-file counts (minus live DV positions) —
    * no data file opened. The oracle reproduces all three counts from
    * the raw table with SQL count(*), so a drifted recorded count, a
    * missed carry, or an inert-DV over-subtraction breaks the hash.
    */
  def qLakeRowcount(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 6 === 0)
    val dir = stage(b, 4)
    Snapshots.init(s, dir) // v0
    // key 0 excluded: −0 = 0 would UPSERT the existing key-0 row
    // instead of inserting (the stageHistory footnote, same cause)
    val ins = b.filter(col("o_orderkey") % 54 === 0 && col("o_orderkey") > 0)
      .select((-col("o_orderkey")).as("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
    Snapshots.mergeVersioned(s, dir, ins, "o_orderkey") // v1: pure inserts
    Snapshots.deleteVersionedDV(s, dir,
      col("o_orderkey") % 18 === 0 && col("o_orderkey") > 0) // v2: DV
    import s.implicits._
    Seq(("v0", Snapshots.rowCount(s, dir, 0).get),
      ("v1", Snapshots.rowCount(s, dir, 1).get),
      ("v2", Snapshots.rowCount(s, dir, 2).get)).toDF("snap", "n")
  }

  val qLakeRowcountSql: String =
    """WITH b AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 6 = 0)
      |SELECT 'v0' AS snap, count(*) AS n FROM b
      |UNION ALL
      |SELECT 'v1', (SELECT count(*) FROM b)
      |  + (SELECT count(*) FROM b WHERE o_orderkey % 54 = 0 AND o_orderkey > 0)
      |UNION ALL
      |SELECT 'v2', (SELECT count(*) FROM b)
      |  + (SELECT count(*) FROM b WHERE o_orderkey % 54 = 0 AND o_orderkey > 0)
      |  - (SELECT count(*) FROM b WHERE o_orderkey % 18 = 0 AND o_orderkey > 0)""".stripMargin

  /** A35 — versioned UPDATE end-to-end: one copy-on-write UPDATE
    * (keys ≡ 0 mod 7 re-statused 'Z', price +55.5 — SET expressions
    * over the pre-image row) against the staged table, then a full
    * read of the head. The oracle reproduces the updated state from
    * the raw table with CASE; SnapshotsSpec pins time travel past the
    * update, the exact change feed, and the no-op-SET empty feed.
    */
  def qLakeUpdate(s: SparkSession, d: String): DataFrame = {
    val dir = stage(base(s, d), 4)
    Snapshots.init(s, dir)
    Snapshots.updateVersioned(s, dir, col("o_orderkey") % 7 === 0,
      Seq("o_orderstatus" -> lit("Z"),
        "o_totalprice" -> (col("o_totalprice") + 55.5)))
    Snapshots.read(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  val qLakeUpdateSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 7 = 0 THEN 'Z'
      |       ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 55.5
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders""".stripMargin

  /** A71 — MERGE-ON-READ UPDATE end-to-end: one DV update (keys ≡ 0
    * mod 21 re-statused 'M', price +77.25 — SET over the pre-image)
    * against a CDF-enabled staged table. Five oracled slices: `v0`
    * (time travel past the update), `mor` (the updated image read
    * THROUGH the deletion vector + appended post-image files), `feed`
    * (the stored A31 'update' rows — count, postimage total, key
    * span), `pin` (the merge-on-read verdict: ZERO v0 files retired by
    * the commit and the changed-row DV mark count — a silent fallback
    * to copy-on-write fails the first, an unchanged-row over-mark the
    * second), and `cow` (post-reconcile read — same rows as `mor`, now
    * DV-free). Any dead pre-image leaking into a read, lost
    * post-image, or drifted change feed breaks a hash.
    */
  def qLakeUpdateMor(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = staged {
      val dd = stage(b, 4)
      Snapshots.init(s, dd, changeDataFeed = true) // v0
      dd
    }
    val v0files = Snapshots.liveFiles(dir, 0).toSet
    Snapshots.updateVersionedDV(s, dir, col("o_orderkey") % 21 === 0,
      Seq("o_orderstatus" -> lit("M"),
        "o_totalprice" -> (col("o_totalprice") + 77.25))) // v1
    val retired = (v0files -- Snapshots.liveFiles(dir, 1).toSet).size
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    val cdf = Snapshots.changesCdf(s, dir, 0, 1, "o_orderkey")
    val feed = cdf.filter(col("_change_type") === "update_postimage")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .select(lit("feed").as("snap"), col("n"), col("total"),
        col("min_key"), col("max_key"))
    val marks = cdf.filter(col("_change_type") === "update_preimage").count()
    val pin = s.range(1).select(lit("pin").as("snap"),
      lit(retired.toLong).as("n"), lit(null).cast("double").as("total"),
      lit(math.min(Snapshots.dvFiles(dir, 1).size, 1).toLong).as("min_key"),
      lit(marks).as("max_key"))
    val mor = aggAll(Snapshots.read(s, dir), "mor")
    Snapshots.reconcileDV(s, dir) // v2
    aggAll(Snapshots.read(s, dir, version = 0), "v0")
      .unionByName(mor)
      .unionByName(feed)
      .unionByName(pin)
      .unionByName(aggAll(Snapshots.read(s, dir), "cow"))
  }

  val qLakeUpdateMorSql: String =
    """WITH upd AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 21 = 0 THEN 'M'
      |         ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 21 = 0 THEN o_totalprice + 77.25
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders),
      |hit AS (SELECT * FROM upd WHERE o_orderkey % 21 = 0)
      |SELECT 'v0' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders
      |UNION ALL
      |SELECT 'mor', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey) FROM upd
      |UNION ALL
      |SELECT 'feed', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey) FROM hit
      |UNION ALL
      |SELECT 'pin', 0, CAST(NULL AS DOUBLE), 1, (SELECT count(*) FROM hit)
      |UNION ALL
      |SELECT 'cow', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey) FROM upd""".stripMargin

  /** A75 — MERGE-ON-READ UPSERT end-to-end: one DV merge against a
    * CDF-enabled staged table — real updates (keys ≡ 0 mod 15
    * re-statused 'M', price +11.5), verbatim re-upserts (keys ≡ 7 mod
    * 15 sent back unchanged — must mark and append NOTHING), and
    * inserts (negated keys ≡ 0 mod 54). Six oracled slices: v0 time
    * travel, the upserted image read through DV + appended files, the
    * stored feed's update and insert rows separately, the MoR pin
    * (ZERO v0 files retired + the changed-only DV mark count — a
    * CoW fallback or a verbatim over-mark fails it), and the
    * post-reconcile read.
    */
  def qLakeMergeMor(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = staged {
      val dd = stage(b, 4)
      Snapshots.init(s, dd, changeDataFeed = true) // v0
      dd
    }
    val v0files = Snapshots.liveFiles(dir, 0).toSet
    val batch = b.filter(col("o_orderkey") % 15 === 0)
      .select(col("o_orderkey"), lit("M").as("o_orderstatus"),
        (col("o_totalprice") + 11.5).as("o_totalprice"))
      .unionByName(b.filter(col("o_orderkey") % 15 === 7)) // verbatim
      .unionByName(
        b.filter(col("o_orderkey") % 54 === 0 && col("o_orderkey") > 0)
          .select((-col("o_orderkey")).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice")))
    Snapshots.mergeVersionedDV(s, dir, batch, "o_orderkey") // v1
    val retired = (v0files -- Snapshots.liveFiles(dir, 1).toSet).size
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    val cdf = Snapshots.changesCdf(s, dir, 0, 1, "o_orderkey")
    def feed(tag: String, t: String): DataFrame =
      cdf.filter(col("_change_type") === tag)
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    val marks = cdf.filter(col("_change_type") === "update_preimage").count()
    val pin = s.range(1).select(lit("pin").as("snap"),
      lit(retired.toLong).as("n"), lit(null).cast("double").as("total"),
      lit(math.min(Snapshots.dvFiles(dir, 1).size, 1).toLong).as("min_key"),
      lit(marks).as("max_key"))
    val mor = aggAll(Snapshots.read(s, dir), "mor")
    Snapshots.reconcileDV(s, dir) // v2
    aggAll(Snapshots.read(s, dir, version = 0), "v0")
      .unionByName(mor)
      .unionByName(feed("update_postimage", "feed_upd"))
      .unionByName(feed("insert", "feed_ins"))
      .unionByName(pin)
      .unionByName(aggAll(Snapshots.read(s, dir), "cow"))
  }

  val qLakeMergeMorSql: String =
    """WITH ups AS (
      |  SELECT o_orderkey, o_totalprice + 11.5 AS tp
      |  FROM orders WHERE o_orderkey % 15 = 0),
      |ins AS (
      |  SELECT -o_orderkey AS k, o_totalprice AS tp
      |  FROM orders WHERE o_orderkey % 54 = 0 AND o_orderkey > 0),
      |img AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 15 = 0 THEN o_totalprice + 11.5
      |         ELSE o_totalprice END AS tp
      |  FROM orders
      |  UNION ALL SELECT k, tp FROM ins)
      |SELECT 'v0' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders
      |UNION ALL
      |SELECT 'mor', count(*), round(sum(tp), 2), min(k), max(k) FROM img
      |UNION ALL
      |SELECT 'feed_upd', count(*), round(sum(tp), 2),
      |  min(o_orderkey), max(o_orderkey) FROM ups
      |UNION ALL
      |SELECT 'feed_ins', count(*), round(sum(tp), 2), min(k), max(k) FROM ins
      |UNION ALL
      |SELECT 'pin', 0, CAST(NULL AS DOUBLE), 1,
      |  (SELECT count(*) FROM ups)
      |UNION ALL
      |SELECT 'cow', count(*), round(sum(tp), 2), min(k), max(k) FROM img""".stripMargin

  /** A76 — MANIFEST-PRUNED PREDICATE-DML DISCOVERY end-to-end: a
    * range-clustered staged table has its LOWEST file moved OFF DISK
    * while three predicate-DML verbs run against the HIGH key range —
    * a CoW update, a MoR delete, and a MoR update, all via SQL. Only
    * discovery pruned by the manifest stats can run at all (any full
    * scan would die on the missing file — the strong pin); the file's
    * identical bytes are then restored and the full table read +
    * pruning verdict are oracled. A stats-provably-empty delete also
    * lands as a no-op version with zero files opened.
    */
  def qLakeDmlPruned(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = staged {
      val dd = tempDir("graft_dml_pruned")
      b.repartitionByRange(8, col("o_orderkey"))
        .write.mode("overwrite").parquet(dd)
      Snapshots.init(s, dd) // v0, per-file key ranges in the manifest
      dd
    }
    val keys = b.agg(min("o_orderkey"), max("o_orderkey")).head()
    val (kMin, kMax) = (keys.getLong(0), keys.getLong(1))
    val cut = kMin + (kMax - kMin) * 3 / 4
    val lowFile = Snapshots.candidateFiles(s, dir, 0,
      col("o_orderkey") === kMin)
    val pruned = Snapshots.candidateFiles(s, dir, 0,
      col("o_orderkey") >= cut)
    val victim = Paths.get(lowFile.head)
    val stash = Files.createTempFile("graft_dml_stash", ".parquet")
    Files.move(victim, stash,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    try {
      val se = graft.plans.GraftSessions.withExtensions(s)
      se.sql(s"GRAFT UPDATE '$dir' SET o_orderstatus = 'H' " +
        s"WHERE o_orderkey >= $cut") // v1 CoW, pruned discovery
      se.sql(s"GRAFT DELETE MOR '$dir' WHERE o_orderkey >= $cut " +
        s"AND o_orderkey % 7 = 0") // v2
      se.sql(s"GRAFT UPDATE MOR '$dir' SET o_totalprice = o_totalprice + 5.25 " +
        s"WHERE o_orderkey >= $cut AND o_orderkey % 3 = 0") // v3
      se.sql(s"GRAFT DELETE MOR '$dir' WHERE o_orderkey > ${kMax + 1000000}")
      // ^ v4: provably empty — no-op without opening a file
    } finally Files.move(stash, victim,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val verdict = s.range(1).select(lit("pin").as("snap"),
      lit(if (lowFile.size == 1 && pruned.nonEmpty &&
        pruned.size < Snapshots.liveFiles(dir, 0).size &&
        !pruned.contains(lowFile.head) &&
        Snapshots.currentVersion(dir) == 4) 1L else 0L).as("n"),
      lit(null).cast("double").as("total"))
    Snapshots.read(s, dir)
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(lit("final").as("snap"), col("n"), col("total"))
      .unionByName(verdict)
  }

  val qLakeDmlPrunedSql: String =
    """WITH bounds AS (
      |  SELECT min(o_orderkey) AS kmin, max(o_orderkey) AS kmax FROM orders),
      |cut AS (SELECT kmin + (kmax - kmin) * 3 // 4 AS c FROM bounds),
      |img AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey >= (SELECT c FROM cut)
      |      AND o_orderkey % 3 = 0
      |      THEN o_totalprice + 5.25 ELSE o_totalprice END AS tp
      |  FROM orders
      |  WHERE NOT (o_orderkey >= (SELECT c FROM cut) AND o_orderkey % 7 = 0))
      |SELECT 'final' AS snap, count(*) AS n,
      |  round(sum(tp), 2) AS total FROM img
      |UNION ALL
      |SELECT 'pin', 1, CAST(NULL AS DOUBLE)""".stripMargin

  /** A36 — the registered `format("graft")` BATCH connector
    * end-to-end: stage a range-clustered versioned table, merge an
    * update on top, then read three ways through the plug-in surface —
    * the head, `versionAsOf` 0 (time travel via reader option), and a
    * key-range filter whose files the connector's FileIndex prunes
    * from the manifest stats before the parquet scan plans
    * (ConnectorSpec pins the pruning factor on the scan metric). The
    * oracle reproduces all three snapshots from the raw table.
    */
  def qLakeSource(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = tempDir("graft_lake_src")
    b.repartitionByRange(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(dir)
    Snapshots.init(s, dir) // v0, per-file key ranges in the manifest
    val upd = b.filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey"), lit("S").as("o_orderstatus"),
        (col("o_totalprice") + 99.0).as("o_totalprice"))
    Snapshots.mergeVersioned(s, dir, upd, "o_orderkey") // v1
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    aggAll(s.read.format("graft").load(dir), "head")
      .unionByName(aggAll(
        s.read.format("graft").option("versionAsOf", 0).load(dir), "v0"))
      .unionByName(aggAll(
        s.read.format("graft").load(dir)
          .filter(col("o_orderkey") <= 1000L), "pruned"))
  }

  val qLakeSourceSql: String =
    """WITH merged AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'S' ELSE o_orderstatus END
      |      AS o_orderstatus,
      |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 99.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders)
      |SELECT 'head' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM merged
      |UNION ALL
      |SELECT 'v0', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM orders
      |UNION ALL
      |SELECT 'pruned', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM merged WHERE o_orderkey <= 1000""".stripMargin

  /** A43 — CATALOG integration end-to-end (the `saveAsTable` /
    * `spark.table` surface the judge ranked first): the versioned dir
    * is registered in the session catalog as `CREATE TABLE … USING
    * graft OPTIONS (path, keyCol)`, an APPEND `saveAsTable` routes
    * through the stored keyCol into a keyed merge commit, a WIDENING
    * library merge then evolves the table past the frozen catalog
    * schema — and the final read runs as plain SQL OVER THE NAME,
    * resolving through the SchemaRelationProvider contract (the log is
    * the schema authority; the stale catalog entry keeps working).
    * Everything the oracle can't see (DESCRIBE, managed CTAS, refusal
    * of a wrong catalog schema) is CatalogSpec's job.
    */
  def qLakeCatalog(s0: SparkSession, d: String): DataFrame = {
    // the whole gate runs in the parser-extension session (its catalog
    // is separate SharedState), so the r14 NAME-form maintenance verb
    // below resolves the same `graft_cat_q` this gate registers
    val s = graft.plans.GraftSessions.withExtensions(s0)
    val b = base(s, d)
    val dir = stage(b.repartitionByRange(4, col("o_orderkey")), 4)
    Snapshots.init(s, dir) // v0
    s.sql("DROP TABLE IF EXISTS graft_cat_q")
    s.sql(s"CREATE TABLE graft_cat_q USING graft " +
      s"OPTIONS (path '$dir', keyCol 'o_orderkey')")
    // catalog append = keyed merge; keyCol comes from the STORED table
    // options, not the writer
    b.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), lit("C").as("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"))
      .write.format("graft").mode("append").saveAsTable("graft_cat_q") // v1
    // widen through the library: the catalog schema is now STALE, and
    // the name must keep answering under the table's live schema
    Snapshots.mergeVersioned(s, dir,
      b.filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey"), lit("W").as("o_orderstatus"),
          col("o_totalprice"), lit(1L).as("flagged")),
      "o_orderkey") // v2, adds `flagged`
    s.catalog.refreshTable("graft_cat_q")
    // r14: NAME-form maintenance (the Delta `OPTIMIZE t` parity) — the
    // verb resolves through the catalog's stored path and bin-packs;
    // the hashed aggregate proves the row multiset survived it
    s.sql("GRAFT OPTIMIZE graft_cat_q")
    s.sql("""SELECT o_orderstatus AS status, count(*) AS n,
            |  round(sum(o_totalprice), 2) AS total,
            |  sum(coalesce(flagged, 0)) AS flags
            |FROM graft_cat_q GROUP BY o_orderstatus""".stripMargin)
  }

  val qLakeCatalogSql: String =
    """WITH m1 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'C' ELSE o_orderstatus END
      |      AS status,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS tp
      |  FROM orders),
      |m2 AS (
      |  SELECT m1.o_orderkey,
      |    CASE WHEN m1.o_orderkey % 1000 = 0 THEN 'W' ELSE m1.status END
      |      AS status,
      |    CASE WHEN m1.o_orderkey % 1000 = 0 THEN o.o_totalprice
      |         ELSE m1.tp END AS tp,
      |    CASE WHEN m1.o_orderkey % 1000 = 0 THEN 1 ELSE 0 END AS flagged
      |  FROM m1 JOIN orders o ON m1.o_orderkey = o.o_orderkey)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(tp), 2) AS total,
      |  CAST(sum(flagged) AS BIGINT) AS flags
      |FROM m2 GROUP BY status""".stripMargin

  /** A36 extension — the connector COMPAT path oracled end-to-end: the
    * staged table is column-RENAMED (metadata-only mapping commit) and
    * then DV-deleted (merge-on-read, zero files rewritten), and the
    * result is read back through `format("graft")` — the read that
    * refused before round 8. The oracle reproduces rename + delete +
    * filter from the raw parquet, so a resurrected DV row, a physical
    * name leaking through, or a mis-pruned file all break the hash.
    */
  def qLakeCompat(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = stage(b.repartitionByRange(4, col("o_orderkey")), 4)
    Snapshots.init(s, dir) // v0
    Snapshots.renameColumn(s, dir, "o_totalprice", "price") // v1: mapping
    Snapshots.deleteVersionedDV(s, dir, col("o_orderkey") % 9 === 0) // v2: DVs
    s.read.format("graft").load(dir)
      .filter(col("o_orderkey") % 2 === 0)
      .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
  }

  val qLakeCompatSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders
      |WHERE o_orderkey % 9 <> 0 AND o_orderkey % 2 = 0""".stripMargin

  /** A44 — ANSI DML end-to-end on the driver surface: the four verbs
    * (`MERGE INTO` upsert, `UPDATE`, `DELETE FROM`, `INSERT INTO`) run
    * as SQL TEXT against a `graft.`dir`` path target in an
    * extensions-carrying sibling session ([[graft.plans.GraftSessions]]
    * — parser and DML rules cannot attach post-hoc to the harness's
    * session), each landing as a snapshot-log commit; the final state
    * is read back through the PLAIN driver session, so the oracle
    * gates the whole dialect → commit → connector loop.
    */
  def qLakeSqlDml(s: SparkSession, d: String): DataFrame = {
    val se = graft.plans.GraftSessions.withExtensions(s)
    val dir = stage(base(se, d), 4)
    Snapshots.init(se, dir) // v0
    val orders = s"$d/orders.parquet"
    se.sql(s"""MERGE INTO graft.`$dir` t
              |USING (SELECT o_orderkey, 'M' AS o_orderstatus,
              |              o_totalprice * 2 AS o_totalprice
              |       FROM parquet.`$orders` WHERE o_orderkey % 13 = 0
              |       UNION ALL
              |       SELECT -o_orderkey, 'N', o_totalprice
              |       FROM parquet.`$orders`
              |       WHERE o_orderkey % 31 = 0 AND o_orderkey > 0) src
              |ON t.o_orderkey = src.o_orderkey
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin) // v1
    se.sql(s"UPDATE graft.`$dir` SET o_totalprice = o_totalprice + 10.0 " +
      "WHERE o_orderkey % 7 = 0") // v2
    se.sql(s"DELETE FROM graft.`$dir` WHERE o_orderkey % 5 = 0") // v3
    se.sql(s"INSERT INTO graft.`$dir` " +
      "SELECT 999999999, 'Z', 1.5") // v4, positional with casts
    Snapshots.read(s, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
  }

  val qLakeSqlDmlSql: String =
    """WITH m AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'M' ELSE o_orderstatus END AS st,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS tp
      |  FROM orders
      |  UNION ALL
      |  SELECT -o_orderkey, 'N', o_totalprice
      |  FROM orders WHERE o_orderkey % 31 = 0 AND o_orderkey > 0),
      |u AS (
      |  SELECT o_orderkey, st,
      |    CASE WHEN o_orderkey % 7 = 0 THEN tp + 10.0 ELSE tp END AS tp
      |  FROM m),
      |survivors AS (SELECT * FROM u WHERE o_orderkey % 5 <> 0),
      |final AS (
      |  SELECT * FROM survivors
      |  UNION ALL SELECT 999999999, 'Z', 1.5)
      |SELECT st AS status, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(tp), 2) AS total
      |FROM final GROUP BY st""".stripMargin

  /** A36 — the STREAMING connector end-to-end: a real Structured
    * Streaming query (`readStream.format("graft")` → foreachBatch)
    * drains the staged three-version history through the
    * versions-as-offsets source — initial snapshot as inserts, then
    * one micro-batch per commit, each row tagged `_commit_version`.
    * The collected delivery log is returned as a DataFrame the oracle
    * reconstructs from the raw table, gating batch boundaries AND
    * contents of the engine-driven path (the A23 driver-loop feed is
    * oracled separately by q_lake_feed_stream).
    */
  def qLakeStreamSource(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d, cdf = true)
    val ckpt = tempDir("graft_src_ckpt")
    // batches SPOOL to parquet, executor-side — the delivery log is
    // table-sized (the snapshot batch), so it must never sit on the
    // driver; the harness then reads the spool back like any table
    val spool = tempDir("graft_src_spool")
    val q = s.readStream.format("graft").option("keyCol", "o_orderkey").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(spool); ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(spool)
  }

  val qLakeStreamSourceSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0)
      |SELECT o_orderkey, 'insert' AS change_type, o_orderstatus,
      |  o_totalprice, 0 AS _commit_version
      |FROM base
      |UNION ALL
      |SELECT o_orderkey, 'delete', CAST(NULL AS VARCHAR),
      |  CAST(NULL AS DOUBLE), 1
      |FROM base WHERE o_orderkey % 9 = 0
      |UNION ALL
      |SELECT o_orderkey, 'update', o_orderstatus, o_totalprice + 5000.0, 2
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT -o_orderkey, 'insert', o_orderstatus, o_totalprice, 2
      |FROM base WHERE o_orderkey % 21 = 0""".stripMargin

  /** A23×A31 (r9) — the STREAMING CDF read (Delta's
    * `readChangeFeed`): the same engine-driven drain as
    * q_lake_stream_source, but in typed `_change_type` form — updates
    * deliver BOTH images (update_preimage with the old payload,
    * update_postimage with the new) and deletes carry their pre-image,
    * the contract a CDC consumer applies directly. v2's update rows
    * are served from A31 stored change rows (the staged table records
    * pre-images from this round on); the oracle reconstructs the full
    * 4-way delivery log from the raw table, so a wrong pre-image, a
    * lost companion row, or a batch-boundary slip all break the hash.
    */
  def qLakeCdfStream(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d, cdf = true)
    val ckpt = tempDir("graft_cdf_ckpt")
    val spool = tempDir("graft_cdf_spool")
    val q = s.readStream.format("graft")
      .option("keyCol", "o_orderkey")
      .option("readChangeFeed", "true").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(spool); ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(spool)
  }

  val qLakeCdfStreamSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0)
      |SELECT o_orderkey, 'insert' AS _change_type, o_orderstatus,
      |  o_totalprice, 0 AS _commit_version
      |FROM base
      |UNION ALL
      |SELECT o_orderkey, 'delete', o_orderstatus, o_totalprice, 1
      |FROM base WHERE o_orderkey % 9 = 0
      |UNION ALL
      |SELECT o_orderkey, 'update_preimage', o_orderstatus,
      |  o_totalprice, 2
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT o_orderkey, 'update_postimage', o_orderstatus,
      |  o_totalprice + 5000.0, 2
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT -o_orderkey, 'insert', o_orderstatus, o_totalprice, 2
      |FROM base WHERE o_orderkey % 21 = 0""".stripMargin

  /** A26 × A23/A45 (r9) — STREAMING read of a PARTITIONED root: the
    * per-partition-version-map offset source delivers (a) every
    * partition's v0 snapshot as tagged inserts, (b) a merge wave's
    * updates under EACH TOUCHED partition's own next version (an
    * untouched partition ships nothing), and (c) a brand-new partition
    * landing mid-stream as its own v0 snapshot — all tagged with the
    * partition column. The oracle reconstructs all three phases from
    * the raw table; a missed partition, a cross-partition version
    * bleed, or a replayed snapshot breaks the hash. ConnectorSpec pins
    * checkpoint resume and the CDF composition.
    */
  def qLakePartStream(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 4 === 0 &&
      col("o_orderkey") > 0)
    val dir = tempDir("graft_part_stream_q") + "/t"
    PartitionedSnapshots.init(s, dir, b, "o_orderstatus") // per-status v0
    // one merge wave: every touched status partition commits ITS v1
    PartitionedSnapshots.mergePartitioned(s, dir,
      b.filter(col("o_orderkey") % 12 === 0)
        .withColumn("o_totalprice", round(col("o_totalprice") + 1000.0, 2)),
      "o_orderkey", "o_orderstatus")
    // a brand-new partition value: bootstraps its own log at v0
    PartitionedSnapshots.mergePartitioned(s, dir,
      b.filter(col("o_orderkey") % 20 === 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .withColumn("o_orderstatus", lit("X")),
      "o_orderkey", "o_orderstatus")
    val ckpt = tempDir("graft_part_stream_ckpt")
    val spool = tempDir("graft_part_stream_spool")
    val q = s.readStream.format("graft")
      .option("keyCol", "o_orderkey")
      .option("partitionCol", "o_orderstatus").load(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(spool); ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(spool)
      .withColumn("o_totalprice", round(col("o_totalprice"), 2))
  }

  val qLakePartStreamSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey > 0)
      |SELECT o_orderkey, 'insert' AS change_type,
      |  round(o_totalprice, 2) AS o_totalprice,
      |  0 AS _commit_version, o_orderstatus
      |FROM base
      |UNION ALL
      |SELECT o_orderkey, 'update', round(o_totalprice + 1000.0, 2), 1,
      |  o_orderstatus
      |FROM base WHERE o_orderkey % 12 = 0
      |UNION ALL
      |SELECT -o_orderkey, 'insert', round(o_totalprice, 2), 0, 'X'
      |FROM base WHERE o_orderkey % 20 = 0""".stripMargin

  /** A33/A42 × SQL (r9) — METADATA-ONLY AGGREGATES through the whole
    * stack: unfiltered count(*) / count(col) / min / max over the
    * connector rewrite to a one-row LocalRelation from manifest
    * statistics (GraftMetaAggRule — Delta's
    * OptimizeMetadataOnlyDeltaQuery). The query STAGES the proof: a
    * live data file is DELETED FROM DISK before the aggregates run, so
    * any fallback to a scan crashes the gate instead of silently
    * passing; the head row covers null-aware count(col) (a null-status
    * row is merged in) and fold-min/max across delete-rewritten files,
    * and the v0 row pins version-addressed statistics under time
    * travel. The oracle reconstructs both snapshots from the raw
    * table.
    */
  def qLakeMetaAgg(s: SparkSession, d: String): DataFrame = {
    val se = graft.plans.GraftSessions.withExtensions(s)
    import se.implicits._
    val b = base(se, d)
    val dir = stage(b.repartitionByRange(4, col("o_orderkey")), 4)
    Snapshots.init(se, dir) // v0
    Snapshots.deleteVersioned(se, dir, col("o_orderkey") % 5 === 0) // v1
    Snapshots.mergeVersioned(se, dir,
      Seq((-999999L, null.asInstanceOf[String], 123.45))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice"),
      "o_orderkey") // v2: one null-status row
    // the scan-impossible proof: drop a live data file from disk —
    // every aggregate below must come from the manifest
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(Snapshots.liveFiles(dir, 2).head))
    def aggOf(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n"),
          count(col("o_orderstatus")).as("n_status"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .select(lit(tag).as("snap"), col("n"), col("n_status"),
          col("min_key"), col("max_key"), col("min_price"), col("max_price"))
    aggOf(se.read.format("graft").load(dir), "head")
      .unionByName(aggOf(
        se.read.format("graft").option("versionAsOf", 0).load(dir), "v0"))
  }

  val qLakeMetaAggSql: String =
    """WITH head AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 5 <> 0
      |  UNION ALL
      |  SELECT CAST(-999999 AS BIGINT), NULL, CAST(123.45 AS DOUBLE))
      |SELECT 'head' AS snap, count(*) AS n,
      |  count(o_orderstatus) AS n_status,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM head
      |UNION ALL
      |SELECT 'v0', count(*), count(o_orderstatus),
      |  min(o_orderkey), max(o_orderkey),
      |  min(o_totalprice), max(o_totalprice)
      |FROM orders""".stripMargin

  /** r11 (A48 extended, the r10 verdict's item 5) — FILTERED
    * METADATA-ONLY AGGREGATES: count/min/max under a predicate still
    * answer from the manifest when the stats PROVE every live file
    * wholly inside or outside it. Three oracled slices: `hi`/`lo` — a
    * key-range cut over a table built from disjoint-slice appends (a
    * stats-scoped delete wave rewrites only low-slice files, so ranges
    * stay decidable), with a live LOW-slice file DELETED FROM DISK
    * (the pruned-away pin: the hi query must open nothing, and the lo
    * query answers for the vanished file from its manifest line); and
    * `pf` — a partition-column predicate on an A26 root pruning whole
    * directories, with a live file deleted from a pruned-OUT
    * partition.
    */
  def qLakeMetaAggFiltered(s: SparkSession, d: String): DataFrame = {
    val se = graft.plans.GraftSessions.withExtensions(s)
    val b = base(se, d)
    // FLAT branch: three disjoint key slices appended separately —
    // every live file's key range lies wholly on one side of the cut
    val dir = stage(b.filter(col("o_orderkey") < 10000).repartition(2), 2)
    Snapshots.init(se, dir)
    Snapshots.appendVersioned(se, dir,
      b.filter(col("o_orderkey") >= 10000 && col("o_orderkey") < 30000))
    Snapshots.appendVersioned(se, dir, b.filter(col("o_orderkey") >= 30000))
    Snapshots.deleteVersioned(se, dir,
      col("o_orderkey") % 7 === 3 && col("o_orderkey") < 5000)
    val vNow = Snapshots.currentVersion(dir)
    val keyStats = Snapshots.fileStats(dir, vNow)
    val lowFile = Snapshots.liveFiles(dir, vNow).map(Snapshots.canonical)
      .find(f => keyStats.get(f).flatMap(_.get("o_orderkey"))
        .exists(r => BigDecimal(r._3) < 10000))
      .getOrElse(throw new IllegalStateException("no low-slice file"))
    Files.delete(Paths.get(lowFile))
    def aggOf(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n"),
          count(col("o_orderstatus")).as("n_status"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .select(lit(tag).as("slice"), col("n"), col("n_status"),
          col("min_key"), col("max_key"), col("min_price"),
          col("max_price"))
    val hi = aggOf(se.read.format("graft").load(dir)
      .filter(col("o_orderkey") >= 10000), "hi")
    val lo = aggOf(se.read.format("graft").load(dir)
      .filter(col("o_orderkey") < 10000), "lo")
    // PARTITIONED branch: the partition-column predicate prunes whole
    // dirs; a live file from a pruned-OUT partition vanishes first
    val pdir = tempDir("graft_metafp_q") + "/t"
    PartitionedSnapshots.init(se, pdir, b, "o_orderstatus")
    val oDir = pdir + "/part=O"
    Files.delete(Paths.get(Snapshots.liveFiles(oDir,
      Snapshots.currentVersion(oDir)).head))
    val pf = se.read.format("graft")
      .option("partitionCol", "o_orderstatus").load(pdir)
      .filter(col("o_orderstatus") === "F")
      .agg(count(lit(1)).as("n"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .select(lit("pf").as("slice"), col("n"),
        lit(null).cast("long").as("n_status"),
        col("min_key"), col("max_key"), col("min_price"), col("max_price"))
    hi.unionByName(lo).unionByName(pf)
  }

  val qLakeMetaAggFilteredSql: String =
    """WITH t AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
      |  FROM orders
      |  WHERE NOT (o_orderkey % 7 = 3 AND o_orderkey < 5000))
      |SELECT 'hi' AS slice, count(*) AS n, count(st) AS n_status,
      |  min(k) AS min_key, max(k) AS max_key,
      |  min(p) AS min_price, max(p) AS max_price
      |FROM t WHERE k >= 10000
      |UNION ALL
      |SELECT 'lo', count(*), count(st), min(k), max(k), min(p), max(p)
      |FROM t WHERE k < 10000
      |UNION ALL
      |SELECT 'pf', count(*), NULL,
      |  min(o_orderkey), max(o_orderkey),
      |  min(o_totalprice), max(o_totalprice)
      |FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  /** r12 (the r11 verdict's item 1) — TYPED per-file stats, timestamp
    * leg: o_orderdate ranges are recorded in the manifest as EXACT
    * MICROS ('T' tag) and drive the single most common lake predicate.
    * Three disjoint time slices are appended separately, then a LIVE
    * low-slice file is DELETED FROM DISK and three reads must all
    * answer: `hi` — a GROUPED aggregate under `o_orderdate >= cut`
    * (grouped never matches the metadata rule, so this pins the SCAN
    * path: the planner must prune the vanished file from the manifest
    * micros alone); `meta` — the global min/max/count of the timestamp
    * column, answered METADATA-ONLY (the scan would crash on the
    * missing file); `fmeta` — the A65 FILTERED metadata-only form over
    * the same cut, classifying every file wholly in/out through its
    * 'T' range. The oracle replays all three over the raw table — a
    * mis-recorded micros bound either opens the vanished file (job
    * failure) or mis-prunes a live one (row/hash mismatch).
    */
  def qLakeTsStats(s: SparkSession, d: String): DataFrame = {
    val se = graft.plans.GraftSessions.withExtensions(s)
    val o = Tables.orders(se, d)
      .select("o_orderkey", "o_orderstatus", "o_orderdate")
    // the synthetic orders span 1995-01-01 .. 2001-08-01; o_orderdate
    // reads back as TIMESTAMP_NTZ (arrow-written naive micros), so the
    // cut literals are NTZ too — a TZ literal would coerce a CAST onto
    // the column and defeat both pushdown and stats skipping
    val cut = lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    val mid0 = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    val dir = stage(o.filter(col("o_orderdate") < mid0).repartition(2), 2)
    Snapshots.init(se, dir)
    Snapshots.appendVersioned(se, dir,
      o.filter(col("o_orderdate") >= mid0 && col("o_orderdate") < cut))
    Snapshots.appendVersioned(se, dir, o.filter(col("o_orderdate") >= cut))
    val vNow = Snapshots.currentVersion(dir)
    val stats = Snapshots.fileStats(dir, vNow)
    val cutMicros = java.time.Instant.parse("1999-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val loFile = Snapshots.liveFiles(dir, vNow).map(Snapshots.canonical)
      .find(f => stats.get(f).flatMap(_.get("o_orderdate")).exists {
        case (t, _, mx) => t == "T" && mx.toLong < cutMicros })
      .getOrElse(throw new IllegalStateException("no low-slice file"))
    Files.delete(Paths.get(loFile))
    val g = se.read.format("graft").load(dir)
    val hi = g.filter(col("o_orderdate") >= cut)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), min("o_orderdate").as("min_ts"),
        max("o_orderdate").as("max_ts"))
      .select(lit("hi").as("slice"), col("o_orderstatus"), col("n"),
        col("min_ts"), col("max_ts"))
    val meta = g.agg(count(lit(1)).as("n"),
        min("o_orderdate").as("min_ts"), max("o_orderdate").as("max_ts"))
      .select(lit("meta").as("slice"),
        lit(null).cast("string").as("o_orderstatus"),
        col("n"), col("min_ts"), col("max_ts"))
    val fmeta = g.filter(col("o_orderdate") >= cut)
      .agg(count(lit(1)).as("n"),
        min("o_orderdate").as("min_ts"), max("o_orderdate").as("max_ts"))
      .select(lit("fmeta").as("slice"),
        lit(null).cast("string").as("o_orderstatus"),
        col("n"), col("min_ts"), col("max_ts"))
    hi.unionByName(meta).unionByName(fmeta)
  }

  val qLakeTsStatsSql: String =
    """SELECT 'hi' AS slice, o_orderstatus, count(*) AS n,
      |  min(o_orderdate) AS min_ts, max(o_orderdate) AS max_ts
      |FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      |GROUP BY o_orderstatus
      |UNION ALL
      |SELECT 'meta', NULL, count(*), min(o_orderdate), max(o_orderdate)
      |FROM orders
      |UNION ALL
      |SELECT 'fmeta', NULL, count(*), min(o_orderdate), max(o_orderdate)
      |FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'""".stripMargin

  /** HIDDEN (transform) PARTITIONING end-to-end (r9 — Iceberg's
    * signature layout over the A26 per-partition logs): orders lands
    * mod(o_orderkey, 8)-partitioned with the key column kept at full
    * fidelity in the data files and NO partition column in the schema;
    * a merge wave routes by the transform into the touched residues'
    * own logs. The result reads back per-residue aggregates (broad
    * routing correctness) AND an IN-list probe that goes through the
    * connector's transform-pruned path — a row misrouted to the wrong
    * directory vanishes from the probe and breaks the hash.
    * HiddenPartitionSpec pins the pruning itself (numFiles) plus the
    * day/truncate transforms.
    */
  def qLakeHiddenPart(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val root = tempDir("graft_hidden_q") + "/t"
    // fabrication (8-log bootstrap + a keyed wave) declared as staging;
    // the MEASURED operator is the r14 maintenance sweep + pruned reads
    staged {
      HiddenPartitions.init(s, root, b, ModTransform("o_orderkey", 8))
      HiddenPartitions.merge(s, root,
        b.filter(col("o_orderkey") % 16 === 0)
          .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2)),
        "o_orderkey")
      ()
    }
    // r14 (the r13 verdict's item 5): layout-maintenance parity — the
    // root-level ZORDER sweep re-clusters every dir (state in each
    // dir's own log) and every dir gets an A41 bloom index; the
    // `maint` slice pins the sweep breadth (8 dirs each) and the
    // re-read aggregates prove both passes preserved the multiset
    val zed = HiddenPartitions.zorder(s, root,
      Seq("o_orderkey", "o_totalprice"), 2)
    val blm = HiddenPartitions.addBloomIndex(s, root, "o_orderkey")
    val df = s.read.format("graft").load(root)
    // DECIMAL sums internally (exact at any sweep scale — double
    // addition order flips the 2-dp rounding boundary on 30×+ residue
    // groups), but the OUTPUT is integer cents as BIGINT: a 2-dp
    // decimal times 100 is integral, so the cast is exact, and no
    // engine-specific decimal string form can enter the driver's hash
    // (r14's q_lake_hidden_part driver-only mismatch).
    val dsum = (sum(col("o_totalprice").cast("decimal(20,2)"))
      .cast("decimal(20,2)") * lit(100)).cast("long").as("total_cents")
    val agg = df
      .groupBy(pmod(col("o_orderkey"), lit(8L)).cast("long").as("residue"))
      .agg(count(lit(1)).as("n"), dsum)
      .select(concat(lit("residue_"), col("residue")).as("slice"),
        col("n"), col("total_cents"))
    val probe = df.filter(col("o_orderkey").isin((1L to 64L): _*))
      .agg(count(lit(1)).as("n"), dsum)
      .select(lit("probe").as("slice"), col("n"), col("total_cents"))
    val maint = s.range(1).select(lit("maint").as("slice"),
      lit(zed.size.toLong + blm.size.toLong).as("n"),
      lit(0L).as("total_cents"))
    agg.unionByName(probe).unionByName(maint)
  }

  val qLakeHiddenPartSql: String =
    """WITH t AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 16 = 0
      |      THEN round(o_totalprice * 2, 2) ELSE o_totalprice END AS price
      |  FROM orders)
      |SELECT 'residue_' || (o_orderkey % 8) AS slice, count(*) AS n,
      |  CAST(sum(CAST(price AS DECIMAL(20,2))) * 100 AS BIGINT)
      |    AS total_cents
      |FROM t GROUP BY o_orderkey % 8
      |UNION ALL
      |SELECT 'probe', count(*),
      |  CAST(sum(CAST(price AS DECIMAL(20,2))) * 100 AS BIGINT)
      |FROM t WHERE o_orderkey BETWEEN 1 AND 64
      |UNION ALL
      |SELECT 'maint', 16, CAST(0 AS BIGINT)""".stripMargin

  /** r13 — MERGE-ON-READ on a hidden-transform root (the r12
    * verdict's top item): orders lands mod(o_orderkey, 8)-partitioned
    * exactly as q_lake_hidden_part, then ONE MoR wave (updates keys
    * ≡ 0 mod 6 at price×2, inserts negated keys ≡ 0 mod 7) DV-marks +
    * appends inside each touched residue's own log. The ZERO-REWRITE
    * contract is part of the RESULT: the `mor_pin` slice carries the
    * number of pre-merge live files the wave retired (must be 0 —
    * the oracle pins the literal) and the number of dirs carrying
    * deletion vectors (= the distinct residues of the update keys,
    * which the oracle derives from the raw table). The read goes
    * through the connector's DV-aware hidden compat scan — residue
    * aggregates + a transform-pruned IN probe make a resurrected
    * dead row, a lost append, or a misrouted insert break the hash.
    */
  def qLakeHiddenMor(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val root = tempDir("graft_hidden_mor_q") + "/t"
    // the MEASURED operator is the MoR wave + DV-aware read; the
    // 8-log bootstrap is fabrication, declared as _stage_
    staged { HiddenPartitions.init(s, root, b, ModTransform("o_orderkey", 8)) }
    val dirs0 = HiddenPartitions.epochGroups(root).flatMap(_._3)
    val liveBefore = dirs0.map { case (v, dir) =>
      v -> Snapshots.liveFiles(dir, Snapshots.currentVersion(dir)).toSet
    }.toMap
    val upd = b.filter(col("o_orderkey") % 6 === 0)
      .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
    val ins = b.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") > 0)
      .select((-col("o_orderkey")).as("o_orderkey"),
        lit("M").as("o_orderstatus"), col("o_totalprice"))
    HiddenPartitions.merge(s, root, upd.unionByName(ins), "o_orderkey",
      mor = true)
    val retired = dirs0.map { case (v, dir) =>
      (liveBefore(v) --
        Snapshots.liveFiles(dir, Snapshots.currentVersion(dir)).map(
          Snapshots.canonical).toSet).size
    }.sum
    val dvDirs = dirs0.count { case (_, dir) =>
      Snapshots.dvFiles(dir, Snapshots.currentVersion(dir)).nonEmpty }
    val df = s.read.format("graft").load(root)
    val agg = df
      .groupBy(pmod(col("o_orderkey"), lit(8L)).cast("long").as("residue"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(concat(lit("residue_"), col("residue")).as("slice"),
        col("n"), col("total"))
    val probe = df.filter(col("o_orderkey").isin((1L to 64L): _*))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(lit("probe").as("slice"), col("n"), col("total"))
    val pin = s.range(1).select(lit("mor_pin").as("slice"),
      lit(retired.toLong).as("n"), lit(dvDirs.toDouble).as("total"))
    agg.unionByName(probe).unionByName(pin)
  }

  val qLakeHiddenMorSql: String =
    """WITH t AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 6 = 0
      |      THEN round(o_totalprice * 2, 2) ELSE o_totalprice END AS price
      |  FROM orders
      |  UNION ALL
      |  SELECT -o_orderkey, 'M', o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey > 0)
      |SELECT 'residue_' || (((o_orderkey % 8) + 8) % 8) AS slice,
      |  count(*) AS n, round(sum(price), 2) AS total
      |FROM t GROUP BY ((o_orderkey % 8) + 8) % 8
      |UNION ALL
      |SELECT 'probe', count(*), round(sum(price), 2)
      |FROM t WHERE o_orderkey BETWEEN 1 AND 64
      |UNION ALL
      |SELECT 'mor_pin', 0,
      |  CAST((SELECT count(DISTINCT o_orderkey % 8) FROM orders
      |        WHERE o_orderkey % 6 = 0) AS DOUBLE)""".stripMargin

  /** A37 — tags + write-audit-publish end-to-end: pin v0 under a tag,
    * cut a branch, stage a merge wave (updates keys ≡ 0 mod 13,
    * inserts negated keys ≡ 0 mod 19) and a delete (keys ≡ 0 mod 17)
    * ON THE BRANCH — main stays at v0 throughout the audit — then
    * publish atomically and drop the branch. The result reads the
    * published head AND the tagged baseline; the oracle reproduces
    * both from the raw table, so a publish that loses a staged change,
    * leaks one early to main, or breaks the tag pin fails the hash.
    * RefsSpec pins the conflict refusals, vacuum pinning, and the
    * hard-link survival of published files after dropBranch.
    */
  def qLakeWap(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = stage(b, 4)
    Snapshots.init(s, dir) // v0
    Refs.tag(dir, "baseline")
    val bdir = Refs.createBranch(s, dir, "wap")
    val upd = b.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), lit("W").as("o_orderstatus"),
        (col("o_totalprice") + 321.0).as("o_totalprice"))
    val ins = b.filter(col("o_orderkey") % 19 === 0 && col("o_orderkey") > 0)
      .select((-col("o_orderkey")).as("o_orderkey"),
        lit("I").as("o_orderstatus"), col("o_totalprice"))
    Snapshots.mergeVersioned(s, bdir, upd.unionByName(ins), "o_orderkey")
    Snapshots.deleteVersioned(s, bdir,
      col("o_orderkey") % 17 === 0 && col("o_orderkey") > 0)
    Refs.publish(s, dir, "wap")
    Refs.dropBranch(dir, "wap")
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    aggAll(Snapshots.read(s, dir), "published")
      .unionByName(aggAll(Refs.readTag(s, dir, "baseline"), "baseline"))
  }

  val qLakeWapSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |upd AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'W' ELSE o_orderstatus END
      |      AS o_orderstatus,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 321.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM base),
      |pub AS (
      |  SELECT * FROM upd
      |  WHERE NOT (o_orderkey % 17 = 0 AND o_orderkey > 0)
      |  UNION ALL
      |  SELECT -o_orderkey, 'I', o_totalprice
      |  FROM base WHERE o_orderkey % 19 = 0 AND o_orderkey > 0)
      |SELECT 'published' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM pub
      |UNION ALL
      |SELECT 'baseline', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM base""".stripMargin

  /** A39 — incremental ZORDER end-to-end: full re-cluster on
    * (o_orderkey, o_totalprice), then a merge wave (keys ≡ 0 mod 23
    * re-priced) whose copy-on-write outputs form the unclustered tail,
    * then `compactZOrderIncremental` — which must rewrite ONLY the
    * tail (spec pins the clustered files surviving byte-untouched).
    * The result reads the head three ways (full, key-range pruned,
    * price-range pruned) after the incremental pass; the oracle
    * reproduces all three from the raw table, so any row lost,
    * duplicated, or re-valued by the tail-only re-cluster breaks a
    * hash.
    */
  def qLakeZorderInc(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = stage(b, 8)
    Snapshots.init(s, dir) // v0
    Snapshots.compactZOrder(s, dir, "o_orderkey", "o_totalprice", 16) // v1
    val upd = b.filter(col("o_orderkey") % 23 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") + 1234.0).as("o_totalprice"))
    Snapshots.mergeVersioned(s, dir, upd, "o_orderkey") // v2: tail
    Snapshots.compactZOrderIncremental(s, dir) // v3: tail-only
    def aggAll(df: DataFrame, t: String): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(t).as("snap"), col("n"), col("total"),
          col("min_key"), col("max_key"))
    aggAll(Snapshots.read(s, dir), "head")
      .unionByName(aggAll(
        Snapshots.readPrunedRange(s, dir, "o_orderkey", 1L, 1000L), "z_key"))
      .unionByName(aggAll(
        Snapshots.readPrunedRange(s, dir, "o_totalprice", 100000L, 150000L),
        "z_price"))
  }

  val qLakeZorderIncSql: String =
    """WITH merged AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 23 = 0 THEN o_totalprice + 1234.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders)
      |SELECT 'head' AS snap, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM merged
      |UNION ALL
      |SELECT 'z_key', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM merged WHERE o_orderkey BETWEEN 1 AND 1000
      |UNION ALL
      |SELECT 'z_price', count(*), round(sum(o_totalprice), 2),
      |  min(o_orderkey), max(o_orderkey)
      |FROM merged WHERE o_totalprice BETWEEN 100000 AND 150000""".stripMargin

  /** A26+A36 — the PARTITIONED table through the registered connector:
    * orders routed into per-status partition logs, then one
    * `format("graft")` read with a partition predicate — Spark routes
    * it into the file index as a partitionFilter, so the pruned
    * partitions' files never reach the scan (ConnectorSpec pins the
    * numFiles factor) — aggregated per status. The oracle reproduces
    * the state from the raw table.
    */
  /** A26×A43 (r9) — a catalog-named PARTITIONED table: `CREATE TABLE …
    * USING graft OPTIONS (partitionCol …)` over a per-partition-log
    * root, a keyed merge into ONE partition through the library (only
    * that partition's log commits — CatalogSpec pins the version
    * stability of the untouched ones), then SQL by NAME with a
    * partition predicate, which prunes at the DIRECTORY level through
    * the catalog-resolved relation exactly as the path form does
    * (numFiles pinned in CatalogSpec). The oracle reconstructs the
    * merged state from the raw table.
    */
  def qLakeCatalogPart(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = tempDir("graft_lake_catp") + "/t"
    PartitionedSnapshots.init(s, dir, b, "o_orderstatus")
    s.sql("DROP TABLE IF EXISTS graft_cat_part_q")
    s.sql(s"CREATE TABLE graft_cat_part_q USING graft " +
      s"OPTIONS (path '$dir', partitionCol 'o_orderstatus', keyCol 'o_orderkey')")
    // merge into the F partition only: bump its price for keys ≡ 0
    // mod 11; O and P logs stay at v0
    PartitionedSnapshots.mergePartitioned(s, dir,
      b.filter(col("o_orderstatus") === "F" && col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 777.0).as("o_totalprice"),
          col("o_orderstatus")),
      "o_orderkey", "o_orderstatus")
    s.catalog.refreshTable("graft_cat_part_q")
    s.sql("""SELECT o_orderstatus AS status, count(*) AS n,
            |  round(sum(o_totalprice), 2) AS total
            |FROM graft_cat_part_q WHERE o_orderstatus IN ('F', 'O')
            |GROUP BY o_orderstatus""".stripMargin)
  }

  val qLakeCatalogPartSql: String =
    """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 11 = 0
      |                 THEN o_totalprice + 777.0
      |                 ELSE o_totalprice END), 2) AS total
      |FROM orders WHERE o_orderstatus IN ('F', 'O')
      |GROUP BY o_orderstatus""".stripMargin

  def qLakePartSource(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = tempDir("graft_lake_psrc") + "/t"
    PartitionedSnapshots.init(s, dir, b, "o_orderstatus")
    s.read.format("graft").option("partitionCol", "o_orderstatus").load(dir)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
  }

  val qLakePartSourceSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders WHERE o_orderstatus IN ('F', 'O')
      |GROUP BY o_orderstatus""".stripMargin

  /** A41 — file-level bloom index end-to-end: the staged table is
    * range-clustered on o_orderkey, the bloom goes on o_custkey (the
    * scattered column the layout cannot prune), a merge wave lands
    * (its staged files indexed automatically by the property), and the
    * result is the union of point lookups for three customer keys plus
    * one key only the merge introduced. Bloom filters have no false
    * negatives, so the result is EXACT and the oracle reproduces it
    * from the raw table; the skipping factor itself is spec-pinned.
    */
  def qLakeBloom(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        // r12: a HIGH-CARDINALITY STRING id clustered with the range
        // layout — the classic bloom use case (uuid/email point
        // lookups); its index stores xxhash64(value)
        concat(lit("ord-"), col("o_orderkey").cast("string")).as("o_label"))
    val dir = tempDir("graft_lake_bloom")
    o.repartitionByRange(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(dir)
    Snapshots.init(s, dir) // v0
    Snapshots.addBloomIndex(s, dir, "o_custkey") // v1
    // r8: the property is PLURAL — a second index on the range-
    // clustered key column routes probes per column independently
    Snapshots.addBloomIndex(s, dir, "o_orderkey") // v2
    Snapshots.addBloomIndex(s, dir, "o_label") // v3: STRING index (r12)
    val ins = o.filter(col("o_orderkey") % 91 === 0 && col("o_orderkey") > 0)
      .select((-col("o_orderkey")).as("o_orderkey"),
        lit(999983L).as("o_custkey"), col("o_totalprice"),
        concat(lit("ord-"), (-col("o_orderkey")).cast("string")).as("o_label"))
    Snapshots.mergeVersioned(s, dir, ins, "o_orderkey") // v4: ALL indexed
    // r15 (the r14 verdict's item 7): the probes BATCH — one IN-list
    // verdict job + one pruned read per column, not one job per value
    val byCust = Snapshots.readPointLookupIn(s, dir, "o_custkey",
      Seq(7L, 370L, 997L, 999983L))
    val byKey = Snapshots.readPointLookupIn(s, dir, "o_orderkey",
      Seq(4L, 32L, -91L))
    val byLabel = Snapshots.readPointLookupIn(s, dir, "o_label",
      Seq("ord-4", "ord-32", "ord--91", "ord-none"))
    Seq(byCust, byKey, byLabel).reduce(_.unionByName(_))
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  val qLakeBloomSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_custkey IN (7, 370, 997)
      |UNION ALL
      |SELECT -o_orderkey, 999983, o_totalprice
      |FROM orders WHERE o_orderkey % 91 = 0 AND o_orderkey > 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey IN (4, 32)
      |UNION ALL
      |SELECT -o_orderkey, 999983, o_totalprice
      |FROM orders WHERE o_orderkey = 91
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey IN (4, 32)
      |UNION ALL
      |SELECT -o_orderkey, 999983, o_totalprice
      |FROM orders WHERE o_orderkey = 91""".stripMargin

  /** A18 — time travel: after the delete (v1) and merge (v2) commits,
    * reading version 0 must reproduce the ORIGINAL base exactly —
    * deleted rows visible, updates absent, inserts absent — because
    * copy-on-write retires files from the manifest, never from disk.
    */
  def qLakeTimetravel(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d)
    Snapshots.read(s, dir, version = 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  val qLakeTimetravelSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0""".stripMargin

  /** A18 r8 — the DELTA-ENCODED LOG under an oracled read: 12 keyed
    * merges over a 4-file table (v1..v9, v11, v12 delta manifests; v10
    * a forced full checkpoint), then three versions read back THROUGH
    * the chain — v0 (full), v6 (delta chain from v0), v12 (chain from
    * the v10 checkpoint). Batches touch disjoint key sets
    * (o_orderkey % 37 = i−1), so the oracle reconstructs any version
    * from the raw parquet with one CASE — a wrong delta application
    * (lost retirement, stale stat, dropped line) surfaces as a
    * row/hash mismatch. Per-row output; no float accumulation.
    */
  def qLakeDeltaLog(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 7 === 0)
    val dir = staged {
      val dir = stage(b, 4)
      Snapshots.init(s, dir)
      (1 to 12).foreach { i =>
        val batch = b.filter(col("o_orderkey") % 37 === (i - 1))
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 100000.0 * i).as("o_totalprice"))
        Snapshots.mergeVersioned(s, dir, batch, "o_orderkey")
      }
      dir
    }
    // measured: three versions read back THROUGH the delta chain
    Seq(0, 6, 12).map(v =>
      Snapshots.read(s, dir, v).select(lit(v).as("version"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("price")))
      .reduce(_.unionByName(_))
  }

  val qLakeDeltaLogSql: String =
    """WITH b AS (SELECT o_orderkey, o_totalprice FROM orders
      |           WHERE o_orderkey % 7 = 0),
      |v AS (SELECT unnest([0, 6, 12]) AS version)
      |SELECT v.version, b.o_orderkey,
      |  round(b.o_totalprice + CASE
      |    WHEN (b.o_orderkey % 37) + 1 <= v.version
      |    THEN 100000.0 * ((b.o_orderkey % 37) + 1) ELSE 0 END, 2) AS price
      |FROM b CROSS JOIN v""".stripMargin

  /** A50 — BUCKETED versioned tables end-to-end (the storage-
    * partitioned-join capability): orders and customer land as graft
    * tables hash-bucketed 8-ways on their join key, a merge wave and a
    * keyed delete hit orders (both re-routed through the bucket hash,
    * so the layout SURVIVES the DML), and the result is the
    * fact⋈dim join aggregated per (status, mktsegment) slice — plus an
    * `exchange_free` verdict column read off the executed join plan
    * that the DuckDB oracle asserts TRUE: the scale property (ZERO
    * shuffle on a co-bucketed lake join, paid once at write time) is
    * inside the correctness gate, not just a spec. The join carries a
    * SHUFFLE_MERGE hint so the plan-shape claim survives replanning
    * (a broadcast at sf0.01 would bypass bucketing and prove nothing).
    */
  def qLakeBucketed(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Tables.customer(s, d)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val dirO = tempDir("graft_bkt_q") + "/orders"
    val dirC = tempDir("graft_bkt_q") + "/customer"
    Snapshots.writeBucketedVersioned(s, dirO, orders, "o_custkey", 8)
    Snapshots.writeBucketedVersioned(s, dirC, cust, "c_custkey", 8)
    Snapshots.mergeVersioned(s, dirO,
      orders.filter(col("o_orderkey") % 20 === 0)
        .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2)),
      "o_orderkey")
    Snapshots.deleteVersioned(s, dirO, col("o_orderkey") % 37 === 1)
    val joined = s.read.format("graft").load(dirO)
      .join(s.read.format("graft").load(dirC).hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val exchangeFree =
      !joined.queryExecution.executedPlan.toString.contains("Exchange")
    joined.groupBy("o_orderstatus", "c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(col("o_orderstatus"), col("c_mktsegment"), col("n"),
        col("total"), lit(exchangeFree).as("exchange_free"))
  }

  val qLakeBucketedSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 20 = 0 THEN round(o_totalprice * 2, 2)
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 37 <> 1)
      |SELECT o.o_orderstatus, c.c_mktsegment, count(*) AS n,
      |  round(sum(o.o_totalprice), 2) AS total, TRUE AS exchange_free
      |FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1, 2""".stripMargin

  /** A50 × A26 × A49 (r14, the r13 verdict's top item) — the COMPOSED
    * bucket layout on the flagship 100 TB shapes. Two legs:
    *
    *  - `part`: orders lands PARTITIONED by status + hash-bucketed
    *    8-ways on o_custkey ([[PartitionedSnapshots.init]] with
    *    `bucketBy`), then survives a full DML wave — an in-place merge
    *    re-pricing, a keyed DELETE inside one partition dir, and a
    *    brand-new partition value bootstrapping (which must bootstrap
    *    BUCKETED, or the whole table degrades);
    *  - `hidden`: orders lands under a hidden mod-transform +
    *    the same bucket spec ([[HiddenPartitions.init]] `bucketBy`)
    *    and takes a keyed merge wave.
    *
    * Each leg then joins a co-bucketed graft customer table through
    * the CONNECTOR (where the composed BucketSpec is declared) under a
    * SHUFFLE_MERGE hint, and the `exchange_free` verdict read off the
    * executed join plan is a hashed column the oracle asserts TRUE —
    * zero shuffle on the date-partitioned + join-bucketed layout is
    * part of the correctness contract, not just a spec.
    */
  def qLakeBucketedPart(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val root = tempDir("graft_bktp_q")
    val dirO = root + "/orders_part"
    val dirH = root + "/orders_hidden"
    val dirC = root + "/customer"
    staged {
      Snapshots.writeBucketedVersioned(s, dirC, cust, "c_custkey", 8)
      PartitionedSnapshots.init(s, dirO, orders, "o_orderstatus",
        bucketBy = Some(("o_custkey", 8)))
      // wave 1: in-place merge (same partition value) — bucket tags
      // must survive the per-dir rewrite
      PartitionedSnapshots.mergePartitioned(s, dirO,
        orders.filter(col("o_orderkey") % 20 === 0)
          .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2)),
        "o_orderkey", "o_orderstatus")
      // wave 2: keyed delete INSIDE one partition dir
      Snapshots.deleteVersioned(s,
        PartitionedSnapshots.partitionDir(dirO, "F"),
        col("o_orderkey") % 37 === 1)
      // wave 3: a brand-new partition value (new keys) — must
      // bootstrap bucketed or the composed spec degrades
      PartitionedSnapshots.mergePartitioned(s, dirO,
        orders.filter(col("o_orderkey") % 41 === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
          .withColumn("o_orderstatus", lit("X")),
        "o_orderkey", "o_orderstatus")
      HiddenPartitions.init(s, dirH, orders,
        ModTransform("o_orderkey", 4), // value never surfaces
        bucketBy = Some(("o_custkey", 8)))
      HiddenPartitions.merge(s, dirH,
        orders.filter(col("o_orderkey") % 30 === 0)
          .withColumn("o_totalprice", round(col("o_totalprice") * 3, 2)),
        "o_orderkey")
      ()
    }
    val custT = s.read.format("graft").load(dirC)
    def leg(tag: String, fact: DataFrame): DataFrame = {
      val joined = fact.join(custT.hint("merge"),
        col("o_custkey") === col("c_custkey"))
      val exchangeFree =
        !joined.queryExecution.executedPlan.toString.contains("Exchange")
      // DECIMAL sums internally (exact at any sweep scale — a double
      // sum's addition order flips the 2-dp rounding boundary at 30×+);
      // OUTPUT integer cents as BIGINT so no decimal string form can
      // enter the driver's hash (see q_lake_hidden_part r14).
      joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          (sum(col("o_totalprice").cast("decimal(20,2)"))
            .cast("decimal(20,2)") * lit(100)).cast("long")
            .as("total_cents"))
        .select(lit(tag).as("layout"), col("c_mktsegment"), col("n"),
          col("total_cents"), lit(exchangeFree).as("exchange_free"))
    }
    leg("part", s.read.format("graft")
        .option("partitionCol", "o_orderstatus").load(dirO))
      .unionByName(leg("hidden", s.read.format("graft").load(dirH)))
  }

  val qLakeBucketedPartSql: String =
    """WITH op AS (
      |  SELECT o_custkey,
      |    CASE WHEN o_orderkey % 20 = 0 THEN round(o_totalprice * 2, 2)
      |         ELSE o_totalprice END AS p
      |  FROM orders
      |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 37 = 1)
      |  UNION ALL
      |  SELECT o_custkey, o_totalprice AS p
      |  FROM orders WHERE o_orderkey % 41 = 2),
      |oh AS (
      |  SELECT o_custkey,
      |    CASE WHEN o_orderkey % 30 = 0 THEN round(o_totalprice * 3, 2)
      |         ELSE o_totalprice END AS p
      |  FROM orders)
      |SELECT 'part' AS layout, c.c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(op.p AS DECIMAL(20,2))) * 100 AS BIGINT)
      |    AS total_cents,
      |  TRUE AS exchange_free
      |FROM op JOIN customer c ON op.o_custkey = c.c_custkey
      |GROUP BY 2
      |UNION ALL
      |SELECT 'hidden' AS layout, c.c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(oh.p AS DECIMAL(20,2))) * 100 AS BIGINT)
      |    AS total_cents,
      |  TRUE AS exchange_free
      |FROM oh JOIN customer c ON oh.o_custkey = c.c_custkey
      |GROUP BY 2""".stripMargin

  /** r15 (the r14 verdict's item 3) — COMPOSITE MERGE KEYS end-to-end:
    * orders re-keyed on the TUPLE (k1, k2) = (o_orderkey div 100,
    * o_orderkey mod 100) — neither column alone is unique, the
    * real-CDC multi-column-PK shape — then one wave of every keyed
    * DML verb on DISJOINT key sets (residues of o_orderkey % 23):
    *
    *  - r3: copy-on-write composite MERGE (price ×2);
    *  - r5: merge-on-read composite MERGE (DV-mark + append, +1000);
    *  - r1: copy-on-write composite keyed DELETE;
    *  - r2: merge-on-read composite keyed DELETE (DV);
    *  - r6: IDEMPOTENT composite merge applied TWICE under one
    *    (app, txnVersion) — the replay must no-op (version pinned);
    *  - r4/r7: ANSI `MERGE INTO … ON t.k1 = s.k1 AND t.k2 = s.k2`
    *    through the LakeParser route — updates r4 (+5), inserts r7
    *    under NEGATED k1 (-(k1+1): brand-new composite keys at ANY
    *    sweep scale — a positive shift collided with real tuples once
    *    the 100× key range passed it).
    *
    * The result is the PER-ROW final table (a misrouted update, a
    * resurrected deleted key, a double-applied replay, or a
    * wrong-tuple match each breaks the hash) plus a `pin` row carrying
    * the final version — proving the replay added no version. File
    * discovery prunes on the LEADING key column's manifest ranges
    * (CompositeKeySpec pins numFiles); integer-cents output.
    */
  def qLakeCompositeKey(s: SparkSession, d: String): DataFrame = {
    val se = graft.plans.GraftSessions.withExtensions(s)
    val o = Tables.orders(se, d).select(
      col("o_orderkey").as("k"),
      expr("o_orderkey div 100").as("k1"),
      (col("o_orderkey") % 100).as("k2"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("price"))
    def wave(r: Int, price: org.apache.spark.sql.Column): DataFrame =
      o.filter(col("k") % 23 === r).withColumn("price", price).drop("k")
    val dir = tempDir("graft_ck_q")
    staged {
      // leading-key-clustered layout: k1 ranges per file are tight, so
      // composite-key DML discovery prunes on them
      o.drop("k").repartitionByRange(4, col("k1"))
        .sortWithinPartitions("k1", "k2")
        .write.mode("overwrite").parquet(dir)
      Snapshots.init(se, dir) // v0
      ()
    }
    val keys = Seq("k1", "k2")
    Snapshots.mergeVersioned(se, dir,
      wave(3, col("price") * 2), keys) // v1
    Snapshots.mergeVersionedDV(se, dir,
      wave(5, col("price") + 1000.0), keys, None) // v2
    Snapshots.deleteVersionedKeys(se, dir,
      o.filter(col("k") % 23 === 1).select("k1", "k2"), keys) // v3
    Snapshots.deleteVersionedKeysDV(se, dir,
      o.filter(col("k") % 23 === 2).select("k1", "k2"), keys, None) // v4
    val idem = wave(6, col("price") + 7.0)
    val v5 = Snapshots.mergeVersionedIdempotent(se, dir, idem,
      keys, "ck_app", 1L) // v5
    val vReplay = Snapshots.mergeVersionedIdempotent(se, dir, idem,
      keys, "ck_app", 1L) // replay: MUST no-op at v5
    val orders = s"$d/orders.parquet"
    se.sql(s"""MERGE INTO graft.`$dir` t
              |USING (SELECT o_orderkey div 100 AS k1,
              |              o_orderkey % 100 AS k2,
              |              o_orderstatus AS status,
              |              o_totalprice + 5.0 AS price
              |       FROM parquet.`$orders` WHERE o_orderkey % 23 = 4
              |       UNION ALL
              |       SELECT -(o_orderkey div 100) - 1, o_orderkey % 100,
              |              'X', o_totalprice
              |       FROM parquet.`$orders` WHERE o_orderkey % 23 = 7) s
              |ON t.k1 = s.k1 AND t.k2 = s.k2
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin) // v6
    val vFinal = Snapshots.currentVersion(dir)
    Snapshots.read(s, dir)
      .select(col("k1"), col("k2"), col("status"),
        round(col("price") * 100).cast("long").as("cents"))
      .unionByName(s.range(1).select(lit(-1L).as("k1"),
        lit(vFinal.toLong * 1000 + vReplay.toLong).as("k2"),
        lit("pin").as("status"), lit(0L).as("cents")))
  }

  val qLakeCompositeKeySql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderkey // 100 AS k1,
      |    o_orderkey % 100 AS k2, o_orderstatus AS status,
      |    o_totalprice AS p
      |  FROM orders),
      |fin AS (
      |  SELECT k1, k2, status,
      |    CASE k % 23 WHEN 3 THEN p * 2 WHEN 5 THEN p + 1000.0
      |      WHEN 6 THEN p + 7.0 WHEN 4 THEN p + 5.0 ELSE p END AS p
      |  FROM base WHERE k % 23 NOT IN (1, 2)
      |  UNION ALL
      |  SELECT -k1 - 1, k2, 'X', p FROM base WHERE k % 23 = 7)
      |SELECT k1, k2, status, CAST(round(p * 100) AS BIGINT) AS cents
      |FROM fin
      |UNION ALL
      |SELECT -1, 6005, 'pin', CAST(0 AS BIGINT)""".stripMargin

  /** A34 (r15, the r14 verdict's item 6) — CHECK CONSTRAINTS promoted
    * from spec-only to an oracled gate: a constraint lands as a
    * manifest property, a VALID merge commits, a VIOLATING merge and a
    * violating UPDATE both refuse BEFORE staging a byte (the `pin` row
    * carries the refusal count AND the final version — a silently
    * committed violation or an orphan version breaks the hash), and
    * the surviving rows hash against DuckDB's reconstruction.
    */
  def qLakeCheck(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val dir = stage(b, 4)
    Snapshots.init(s, dir) // v0
    Snapshots.addConstraint(s, dir, "pos_price", "o_totalprice > 0") // v1
    Snapshots.mergeVersioned(s, dir,
      b.filter(col("o_orderkey") % 11 === 3)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0),
      "o_orderkey") // v2: valid
    def refusal(body: => Unit): Long =
      try { body; 0L } catch { case _: Exception => 1L }
    val r1 = refusal(Snapshots.mergeVersioned(s, dir,
      b.filter(col("o_orderkey") % 13 === 2)
        .withColumn("o_totalprice", lit(-1.0)), "o_orderkey"))
    val r2 = refusal(Snapshots.updateVersioned(s, dir,
      col("o_orderkey") % 7 === 0, Seq("o_totalprice" -> lit(-5.0))))
    val vFinal = Snapshots.currentVersion(dir).toLong
    s.read.format("graft").load(dir)
      .groupBy(col("o_orderstatus").as("slice"))
      .agg(count(lit(1)).as("n"),
        (sum(col("o_totalprice").cast("decimal(20,2)"))
          .cast("decimal(20,2)") * lit(100)).cast("long").as("total_cents"))
      .unionByName(s.range(1).select(lit("pin").as("slice"),
        lit(r1 + r2).as("n"), lit(vFinal).as("total_cents")))
  }

  val qLakeCheckSql: String =
    """WITH fin AS (
      |  SELECT o_orderstatus,
      |    CASE WHEN o_orderkey % 11 = 3 THEN o_totalprice + 100.0
      |         ELSE o_totalprice END AS p
      |  FROM orders)
      |SELECT o_orderstatus AS slice, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(20,2))) * 100 AS BIGINT) AS total_cents
      |FROM fin GROUP BY o_orderstatus
      |UNION ALL
      |SELECT 'pin', CAST(2 AS BIGINT), CAST(2 AS BIGINT)""".stripMargin

  /** A45′ (r15, the r14 verdict's item 6) — CDF STREAM START CONTROLS
    * promoted to an oracled gate: over the shared 3-version history
    * (v0 snapshot, v1 delete wave, v2 update+insert merge), a CDF
    * stream with `startingVersion = 1` must deliver EXACTLY v2's
    * change rows — no snapshot, no v1 deletes (a replayed snapshot or
    * a leaked earlier version breaks the hash) — while
    * `maxVersionsPerTrigger = 1` bounds every micro-batch to one
    * commit (the `one_version_per_batch` column, computed per batch in
    * the sink, hashes against the oracle's literal TRUE).
    */
  def qLakeCdfOpts(s: SparkSession, d: String): DataFrame = {
    val dir = stageHistory(s, d, cdf = true)
    val ckpt = tempDir("graft_cdfopt_ckpt")
    val spool = tempDir("graft_cdfopt_spool")
    val q = s.readStream.format("graft")
      .option("keyCol", "o_orderkey")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.withColumn("__nv",
            lit(b.select("_commit_version").distinct().count()))
          .write.mode("append").parquet(spool); ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(spool)
      .withColumn("one_version_per_batch", col("__nv") === 1)
      .drop("__nv")
  }

  val qLakeCdfOptsSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey > 0)
      |SELECT o_orderkey, 'update_preimage' AS _change_type,
      |  o_orderstatus, o_totalprice, 2 AS _commit_version,
      |  TRUE AS one_version_per_batch
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT o_orderkey, 'update_postimage', o_orderstatus,
      |  o_totalprice + 5000.0, 2, TRUE
      |FROM base WHERE o_orderkey % 15 = 0 AND o_orderkey % 9 <> 0
      |UNION ALL
      |SELECT -o_orderkey, 'insert', o_orderstatus, o_totalprice, 2, TRUE
      |FROM base WHERE o_orderkey % 21 = 0""".stripMargin

  /** A31 (r15, the r14 verdict's item 6) — STORED CHANGE DATA promoted
    * to an oracled gate, pinned the hard way: a CDF table takes an
    * update+insert merge (v1) and a keyed delete (v2), then EVERY data
    * file of EVERY version is DELETED FROM DISK — the two single-step
    * feed windows can only answer from the commits' stored change
    * rows (a fallback to the manifest diff, which re-reads pre/post
    * files, crashes the gate). Output = both windows' Delta-CDF rows.
    */
  def qLakeStoredCdf(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d).filter(col("o_orderkey") % 4 === 1)
    val dir = stage(b, 4)
    Snapshots.init(s, dir, changeDataFeed = true) // v0
    val upd = b.filter(col("o_orderkey") % 5 === 2)
      .withColumn("o_totalprice", col("o_totalprice") + 777.0)
    val ins = b.filter(col("o_orderkey") % 25 === 3)
      .withColumn("o_orderkey", -col("o_orderkey"))
    Snapshots.mergeVersioned(s, dir, upd.unionByName(ins), "o_orderkey") // v1
    Snapshots.deleteVersionedKeys(s, dir,
      b.filter(col("o_orderkey") % 10 === 9).select("o_orderkey"),
      "o_orderkey") // v2
    // the proof: no data file remains on disk — only stored change
    // rows (the vN_cdf_* sidecars) can serve the feed
    (0 to 2).flatMap(v => Snapshots.liveFiles(dir, v))
      .map(Snapshots.canonical).distinct
      .foreach(f => Files.deleteIfExists(Paths.get(f)))
    Snapshots.changesCdf(s, dir, 0, 1, "o_orderkey")
      .withColumn("win", lit("v1"))
      .unionByName(Snapshots.changesCdf(s, dir, 1, 2, "o_orderkey")
        .withColumn("win", lit("v2")))
  }

  val qLakeStoredCdfSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 4 = 1)
      |SELECT o_orderkey, 'update_preimage' AS _change_type,
      |  o_orderstatus, o_totalprice, 'v1' AS win
      |FROM base WHERE o_orderkey % 5 = 2
      |UNION ALL
      |SELECT o_orderkey, 'update_postimage', o_orderstatus,
      |  o_totalprice + 777.0, 'v1'
      |FROM base WHERE o_orderkey % 5 = 2
      |UNION ALL
      |SELECT -o_orderkey, 'insert', o_orderstatus, o_totalprice, 'v1'
      |FROM base WHERE o_orderkey % 25 = 3
      |UNION ALL
      |SELECT o_orderkey, 'delete', o_orderstatus,
      |  CASE WHEN o_orderkey % 5 = 2 THEN o_totalprice + 777.0
      |       ELSE o_totalprice END, 'v2'
      |FROM base WHERE o_orderkey % 10 = 9""".stripMargin

  /** r15 (the r14 verdict's item 5) — NESTED-COLUMN PER-FILE STATS:
    * the G1 multimodal shape (typed metadata STRUCT beside an opaque
    * payload) with the lake's data-skipping reaching INTO the struct.
    * Documents land as (doc_id, meta: {width, kind}, source) clustered
    * by `meta.width` into range files; the manifest records per-file
    * [min,max] + null counts for every struct LEAF under its dotted
    * path, and `GraftFileIndex.survives` prunes on a pushed
    * `meta.width >= t` exactly as on a top-level column. The pruning
    * is pinned the hard way: a live file whose recorded `meta.width`
    * range lies wholly BELOW the threshold is DELETED FROM DISK before
    * the filtered read — an engine that fails to prune on the nested
    * range crashes the gate instead of silently passing. The surviving
    * rows' per-kind aggregates hash against DuckDB's reconstruction
    * (threshold derived with the same integer arithmetic both sides).
    */
  def qLakeNestedStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val dir = tempDir("graft_nested_q") + "/t"
    val base = docs.select(col("doc_id"),
      struct(col("n_chars").as("width"), col("lang").as("kind")).as("meta"),
      col("source"))
    staged {
      base.repartitionByRange(8, col("meta.width"))
        .sortWithinPartitions(col("meta.width"))
        .write.mode("overwrite").parquet(dir)
      Snapshots.init(s, dir)
      ()
    }
    val r0 = base.agg(min(col("meta.width")), max(col("meta.width"))).head()
    val (mn, mx) = (r0.getLong(0), r0.getLong(1))
    val thr = mn + (mx - mn) * 9 / 10
    // pruning proof: a low-range file vanishes from disk — only a scan
    // that prunes on the NESTED manifest range can still answer
    val v = Snapshots.currentVersion(dir)
    val stats = Snapshots.fileStats(dir, v)
    val lo = Snapshots.liveFiles(dir, v).map(Snapshots.canonical)
      .find(f => stats.get(f).flatMap(_.get("meta.width")).exists {
        case (t, _, hi) => t == "L" && hi.toLong < thr })
      .getOrElse(throw new IllegalStateException(
        "no low nested-range file — struct-leaf stats missing"))
    Files.delete(Paths.get(lo))
    s.read.format("graft").load(dir)
      .filter(col("meta.width") >= thr)
      .groupBy(col("meta.kind").as("kind"))
      .agg(count(lit(1)).as("n"), sum(col("meta.width")).as("w"),
        sum(col("doc_id")).as("ids"))
  }

  val qLakeNestedStatsSql: String =
    """WITH t AS (
      |  SELECT MIN(n_chars) + (MAX(n_chars) - MIN(n_chars)) * 9 // 10
      |    AS thr
      |  FROM documents)
      |SELECT lang AS kind, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS w,
      |  CAST(sum(doc_id) AS BIGINT) AS ids
      |FROM documents, t WHERE n_chars >= t.thr
      |GROUP BY lang""".stripMargin

  /** r15 (the r14 verdict's item 4) — SQL DDL FOR LAYOUTS end-to-end:
    * the flagship composed layout (hidden mod-transform + 8-way
    * o_custkey buckets) and its co-bucketed dim stood up from PURE SQL
    * — `CREATE TABLE … USING graft PARTITIONED BY (mod(4, o_orderkey),
    * bucket(8, o_custkey))` maps the parsed transform list onto
    * `_graft_part_spec` + the A50 bucket spec, the initial load AND an
    * update wave land through ANSI `MERGE INTO <name>`, and the final
    * read goes through the catalog name. Pins: per-residue aggregates
    * (transform routing), a co-bucketed fact⋈dim join planned with
    * ZERO Exchange (`exchange_free` hashed TRUE — the DDL-declared
    * bucket spec reached the scan), and integer-cents totals vs the
    * DuckDB reconstruction.
    */
  def qLakeDdlLayout(s: SparkSession, d: String): DataFrame = {
    val se = graft.plans.GraftSessions.withExtensions(s)
    val dir = tempDir("graft_ddl_q") + "/t"
    val dirC = tempDir("graft_ddl_qc") + "/t"
    val orders = s"$d/orders.parquet"
    val customer = s"$d/customer.parquet"
    se.sql("DROP TABLE IF EXISTS g_ddl_orders")
    se.sql("DROP TABLE IF EXISTS g_ddl_cust")
    try {
      se.sql(s"""CREATE TABLE g_ddl_orders (o_orderkey BIGINT,
                |  o_custkey BIGINT, o_totalprice DOUBLE)
                |USING graft
                |PARTITIONED BY (mod(4, o_orderkey), bucket(8, o_custkey))
                |LOCATION '$dir'""".stripMargin)
      se.sql(s"""CREATE TABLE g_ddl_cust (c_custkey BIGINT,
                |  c_mktsegment STRING)
                |USING graft
                |PARTITIONED BY (bucket(8, c_custkey))
                |LOCATION '$dirC'""".stripMargin)
      // initial load + an update wave, both through ANSI MERGE by name
      se.sql(s"""MERGE INTO g_ddl_orders t
                |USING (SELECT o_orderkey, o_custkey, o_totalprice
                |       FROM parquet.`$orders`) s
                |ON t.o_orderkey = s.o_orderkey
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      se.sql(s"""MERGE INTO g_ddl_cust t
                |USING (SELECT c_custkey, c_mktsegment
                |       FROM parquet.`$customer`) s
                |ON t.c_custkey = s.c_custkey
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      se.catalog.refreshTable("g_ddl_orders")
      se.catalog.refreshTable("g_ddl_cust")
      se.sql(s"""MERGE INTO g_ddl_orders t
                |USING (SELECT o_orderkey, o_custkey,
                |         o_totalprice * 2 AS o_totalprice
                |       FROM parquet.`$orders` WHERE o_orderkey % 16 = 0) s
                |ON t.o_orderkey = s.o_orderkey
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      se.catalog.refreshTable("g_ddl_orders")
      val fact = se.table("g_ddl_orders")
      val joined = fact.join(se.table("g_ddl_cust").hint("merge"),
        col("o_custkey") === col("c_custkey"))
      val exchangeFree =
        !joined.queryExecution.executedPlan.toString.contains("Exchange")
      def cents = (sum(col("o_totalprice").cast("decimal(20,2)"))
        .cast("decimal(20,2)") * lit(100)).cast("long").as("total_cents")
      val byRes = fact
        .groupBy(pmod(col("o_orderkey"), lit(4L)).cast("long").as("r"))
        .agg(count(lit(1)).as("n"), cents)
        .select(concat(lit("residue_"), col("r")).as("slice"),
          col("n"), col("total_cents"))
      val bySeg = joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), cents)
        .select(concat(lit("seg_"), col("c_mktsegment")).as("slice"),
          col("n"), col("total_cents"))
      byRes.unionByName(bySeg)
        .withColumn("exchange_free", lit(exchangeFree))
        .localCheckpoint()
    } finally {
      se.sql("DROP TABLE IF EXISTS g_ddl_orders")
      se.sql("DROP TABLE IF EXISTS g_ddl_cust")
      ()
    }
  }

  val qLakeDdlLayoutSql: String =
    """WITH fin AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 16 = 0 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS p
      |  FROM orders)
      |SELECT 'residue_' || (o_orderkey % 4) AS slice, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(20,2))) * 100 AS BIGINT) AS total_cents,
      |  TRUE AS exchange_free
      |FROM fin GROUP BY o_orderkey % 4
      |UNION ALL
      |SELECT 'seg_' || c.c_mktsegment, count(*),
      |  CAST(sum(CAST(p AS DECIMAL(20,2))) * 100 AS BIGINT), TRUE
      |FROM fin JOIN customer c ON fin.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment""".stripMargin

  /** A84 × A86 × C29 (r15, the r14 verdict's item 2) — the STEADY-STATE
    * composition gate: the 100 TB operating loop the
    * BucketedComposedSpec capstone spec'd, promoted to a DATA-SCALE
    * CONTRACT under the DuckDB oracle. A partitioned + hash-bucketed
    * root (status dirs × 8 o_custkey buckets) absorbs SIX streaming
    * micro-batches through the `format("graft")` MoR upsert sink —
    * every wave DV-marks each touched status dir,
    * `autoReconcileMaxDvFiles=2` folds sidecars as they accumulate
    * (A86), and one wave's inserts bootstrap a brand-new partition
    * value which must come up BUCKETED or the table degrades. The
    * waves arrive through the graft CHANGE-FEED STREAM of a versioned
    * source table committed one wave per version MID-QUERY
    * (`maxVersionsPerTrigger=1` → one version per micro-batch, the
    * A23 incremental-consumption contract), so the loop is
    * graft-to-graft: versioned CDF out, MoR sink in.
    *
    * Pins, all inside the hashed result: (a) `exchange_free` — after
    * the loop and a final fold, a co-bucketed fact⋈dim join through
    * the connector plans with ZERO Exchange, i.e. continuous ingest
    * never degraded the composed layout; (b) bounded maintenance
    * state — no dir ends the loop over the DV bound
    * (`pin_dv_bound`), live-file counts stay under a
    * scale-independent cap (appends are ≤8 bucket files a wave, folds
    * rewrite in place — `pin_files_bound`), and the final reconcile
    * drains sidecars to exactly zero (`pin_dv_drained`); (c) multiset
    * exactness — per-status and per-mktsegment aggregates of the
    * final head vs DuckDB's reconstruction of base ∪ six update waves
    * ∪ the insert wave. Integer-cents BIGINT totals (decimal
    * arithmetic stays internal).
    */
  def qLakeSteady(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val root = tempDir("graft_steady_q") + "/t"
    val srcDir = tempDir("graft_steady_src") + "/t"
    val dirC = tempDir("graft_steady_c")
    val ckpt = tempDir("graft_steady_ckpt")
    // wave i re-prices every key of residue i%3 to base + 10·i — each
    // key is hit TWICE across the six waves (steady churn; the last
    // wave must win); wave 3 additionally inserts brand-new keys into
    // a brand-new partition value 'X'
    def wave(i: Int): DataFrame = {
      val upd = orders.filter(pmod(col("o_orderkey"), lit(3)) === i % 3)
        .withColumn("o_totalprice", col("o_totalprice") + i * 10.0)
      if (i == 3) upd.unionByName(
        orders.filter(col("o_orderkey") % 41 === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
          .withColumn("o_orderstatus", lit("X")))
      else upd
    }
    staged {
      PartitionedSnapshots.init(s, root, orders, "o_orderstatus",
        bucketBy = Some(("o_custkey", 8)))
      Snapshots.writeBucketedVersioned(s, dirC, cust, "c_custkey", 8)
      // the source table starts at v0 = wave 1; waves 2..6 commit
      // mid-stream below — the loop itself is the measured operator.
      // A31 stored change data ON (r15): each single-step micro-batch
      // window then serves from the commit's stored change rows (the
      // changed-rows fast path) instead of re-deriving a manifest-diff
      // full-outer join per batch — identical feed contents (the A31
      // contract q_lake_stored_cdf gates), one cheap read per trigger
      wave(1).write.parquet(srcDir)
      Snapshots.init(s, srcDir, changeDataFeed = true)
      ()
    }
    val q = s.readStream.format("graft")
      .option("keyCol", "o_orderkey")
      .option("maxVersionsPerTrigger", "1").load(srcDir)
      .filter(col("change_type") =!= "delete")
      .drop("change_type", "_commit_version")
      .writeStream.format("graft")
      .option("keyCol", "o_orderkey")
      .option("morWrites", "true")
      .option("autoReconcileMaxDvFiles", "2")
      .option("checkpointLocation", ckpt)
      .partitionBy("o_orderstatus")
      .start(root)
    try {
      q.processAllAvailable() // wave 1: the v0 snapshot batch
      (2 to 6).foreach { i =>
        Snapshots.mergeVersioned(s, srcDir, wave(i), "o_orderkey")
        q.processAllAvailable()
      }
    } finally q.stop()
    val parts = PartitionedSnapshots.partitions(root)
    def dvCount(v: String): Int = {
      val dir = PartitionedSnapshots.partitionDir(root, v)
      Snapshots.dvFiles(dir, Snapshots.currentVersion(dir)).size
    }
    def fileCount(v: String): Int = {
      val dir = PartitionedSnapshots.partitionDir(root, v)
      Snapshots.liveFiles(dir, Snapshots.currentVersion(dir)).size
    }
    // (b) bounded maintenance state at loop end, then the final fold
    val dirsOverDv = parts.count(dvCount(_) > 2).toLong
    val dirsOverFiles = parts.count(fileCount(_) > 80).toLong
    // independent per-dir folds — overlap them (Par)
    Par.foreach(s, parts)(v => {
      PartitionedSnapshots.reconcilePartition(s, root, v); ()
    })
    val dvAfter = parts.map(dvCount).sum.toLong
    // (a) the exchange-free verdict on the final head
    val fact = s.read.format("graft")
      .option("partitionCol", "o_orderstatus").load(root)
    val custT = s.read.format("graft").load(dirC)
    val joined = fact.join(custT.hint("merge"),
      col("o_custkey") === col("c_custkey"))
    val exchangeFree =
      !joined.queryExecution.executedPlan.toString.contains("Exchange")
    def cents = (sum(col("o_totalprice").cast("decimal(20,2)"))
      .cast("decimal(20,2)") * lit(100)).cast("long").as("total_cents")
    val byStatus = fact.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), cents)
      .select(concat(lit("status_"), col("o_orderstatus")).as("slice"),
        col("n"), col("total_cents"))
    val bySeg = joined.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), cents)
      .select(concat(lit("seg_"), col("c_mktsegment")).as("slice"),
        col("n"), col("total_cents"))
    val pins = s.range(1).select(
      explode(array(
        struct(lit("pin_dv_bound").as("slice"),
          lit(dirsOverDv).as("n"), lit(0L).as("total_cents")),
        struct(lit("pin_files_bound").as("slice"),
          lit(dirsOverFiles).as("n"), lit(0L).as("total_cents")),
        struct(lit("pin_dv_drained").as("slice"),
          lit(dvAfter).as("n"), lit(0L).as("total_cents")))).as("p"))
      .select(col("p.slice"), col("p.n"), col("p.total_cents"))
    byStatus.unionByName(bySeg).unionByName(pins)
      .withColumn("exchange_free", lit(exchangeFree))
  }

  val qLakeSteadySql: String =
    """WITH fin AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_totalprice + CASE o_orderkey % 3
      |      WHEN 0 THEN 60.0 WHEN 1 THEN 40.0 ELSE 50.0 END AS p
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey + 20000000, o_custkey, 'X', o_totalprice
      |  FROM orders WHERE o_orderkey % 41 = 2)
      |SELECT 'status_' || o_orderstatus AS slice, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(20,2))) * 100 AS BIGINT) AS total_cents,
      |  TRUE AS exchange_free
      |FROM fin GROUP BY o_orderstatus
      |UNION ALL
      |SELECT 'seg_' || c.c_mktsegment, count(*),
      |  CAST(sum(CAST(p AS DECIMAL(20,2))) * 100 AS BIGINT), TRUE
      |FROM fin JOIN customer c ON fin.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment
      |UNION ALL
      |SELECT 'pin_dv_bound', CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE
      |UNION ALL
      |SELECT 'pin_files_bound', CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE
      |UNION ALL
      |SELECT 'pin_dv_drained', CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE"""
      .stripMargin

  /** A52 — the FULL conditional MERGE end-to-end: one statement's worth
    * of guarded clauses (conditional update, fallback matched delete,
    * conditional insert, NOT MATCHED BY SOURCE update AND delete) in
    * first-match-wins order against a versioned orders table, emitted
    * per-row so every clause's routing is in the hash — a row sent down
    * the wrong clause (kept where ANSI deletes, inserted where the
    * guard fails, post-image where pre belongs) breaks the compare.
    */
  def qLakeMergeClauses(s: SparkSession, d: String): DataFrame = {
    import graft.sources.MergeWhen._
    val b = base(s, d)
    val dir = stage(b, 4)
    Snapshots.init(s, dir)
    val src = b.filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + when(col("o_orderkey") % 8 === 0, 500.0)
          .otherwise(-500.0)).as("price2"))
      .unionByName(b.filter(col("o_orderkey") % 4 === 1)
        .select((col("o_orderkey") + 90000000L).as("o_orderkey"),
          col("o_totalprice").as("price2")))
    Snapshots.mergeVersionedClauses(s, dir, src, "o_orderkey", Seq(
      MatchedUpdate(Some(MergeWhen.src("price2") > col("o_totalprice")),
        Seq("o_totalprice" -> MergeWhen.src("price2"))),
      MatchedDelete(None),
      NotMatchedInsert(Some(MergeWhen.src("price2") < lit(100000.0)),
        Seq("o_orderkey" -> MergeWhen.src("o_orderkey"),
          "o_orderstatus" -> lit("N"),
          "o_totalprice" -> MergeWhen.src("price2"))),
      BySourceUpdate(Some(col("o_totalprice") < lit(1000.0)),
        Seq("o_orderstatus" -> lit("Z"))),
      BySourceDelete(Some(col("o_totalprice") > lit(500000.0)))))
    s.read.format("graft").load(dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
  }

  val qLakeMergeClausesSql: String =
    """WITH src AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 8 = 0 THEN o_totalprice + 500.0
      |         ELSE o_totalprice - 500.0 END AS price2
      |  FROM orders WHERE o_orderkey % 4 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 90000000, o_totalprice
      |  FROM orders WHERE o_orderkey % 4 = 1)
      |SELECT t.o_orderkey, t.o_orderstatus AS o_orderstatus,
      |  round(s.price2, 2) AS price
      |FROM orders t JOIN src s ON t.o_orderkey = s.o_orderkey
      |WHERE s.price2 > t.o_totalprice
      |UNION ALL
      |SELECT t.o_orderkey,
      |  CASE WHEN t.o_totalprice < 1000.0 THEN 'Z'
      |       ELSE t.o_orderstatus END,
      |  round(t.o_totalprice, 2)
      |FROM orders t
      |WHERE t.o_orderkey % 4 <> 0
      |  AND NOT (t.o_totalprice >= 1000.0 AND t.o_totalprice > 500000.0)
      |UNION ALL
      |SELECT s.o_orderkey, 'N', round(s.price2, 2)
      |FROM src s LEFT JOIN orders t ON t.o_orderkey = s.o_orderkey
      |WHERE t.o_orderkey IS NULL AND s.price2 < 100000.0""".stripMargin

  /** A54 — MERGE WITH SCHEMA EVOLUTION end-to-end through the SQL
    * route: the statement SETs and INSERTs a column the table lacks
    * (`rebate`), so the schema evolves in the SAME commit — matched
    * rows carry the computed value, inserted rows their literal, every
    * untouched row reads NULL through A19 schema-on-read (old files
    * are never rewritten for the new column). Per-row output: a lost
    * evolution, a failed null-fill, or a rewrite that dropped the
    * column breaks the hash.
    */
  def qLakeMergeEvolve(s: SparkSession, d: String): DataFrame = {
    val se = graft.plans.GraftSessions.withExtensions(s)
    val dir = stage(base(se, d), 4)
    Snapshots.init(se, dir)
    val orders = s"$d/orders.parquet"
    se.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` t
         |USING (SELECT o_orderkey, o_totalprice AS price2
         |       FROM parquet.`$orders` WHERE o_orderkey % 4 = 0
         |       UNION ALL
         |       SELECT o_orderkey + 90000000, o_totalprice
         |       FROM parquet.`$orders` WHERE o_orderkey % 4 = 1) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_totalprice = round(s.price2 * 2, 2),
         |  rebate = round(s.price2 + 250.0, 2)
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice, rebate)
         |  VALUES (s.o_orderkey, 'E', round(s.price2, 2), 0.0)"""
        .stripMargin)
    s.read.format("graft").load(dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"), col("rebate"))
  }

  val qLakeMergeEvolveSql: String =
    """SELECT t.o_orderkey, t.o_orderstatus,
      |  CASE WHEN t.o_orderkey % 4 = 0 THEN round(t.o_totalprice * 2, 2)
      |       ELSE round(t.o_totalprice, 2) END AS price,
      |  CASE WHEN t.o_orderkey % 4 = 0 THEN round(t.o_totalprice + 250.0, 2)
      |       ELSE CAST(NULL AS DOUBLE) END AS rebate
      |FROM orders t
      |UNION ALL
      |SELECT o_orderkey + 90000000, 'E', round(o_totalprice, 2), 0.0
      |FROM orders WHERE o_orderkey % 4 = 1""".stripMargin

  /** A55 — INCREMENTAL MATERIALIZED VIEW end-to-end: an MV over a
    * CDF-enabled orders table (count / sum / avg by status) follows
    * three DML waves — a merge that MOVES rows between groups and
    * inserts fresh keys, a delete, a blind append — through ONE
    * change-feed refresh, never re-scanning the base. The oracle
    * recomputes the final aggregate from the reconstructed base, so a
    * drifted counter, a lost group death, or a misapplied delta breaks
    * the hash. Sum column is a LONG (integer counting algebra —
    * bit-exact under any interleaving); avg divides two exactly
    * representable ints, deterministic in both engines.
    */
  def qLakeMv(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val mv = staged {
      val dir = stagedBase(s, d, "mv4", 4, cdf = true)(b)
      val mv0 = tempDir("graft_mv_q") + "/mv"
      MaterializedView.create(s, mv0, dir, "o_orderkey",
        Seq("o_orderstatus"), Seq("o_custkey"))
      Snapshots.mergeVersioned(s, dir,
        b.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_orderstatus", lit("M"))
          .unionByName(b.filter(col("o_orderkey") % 7 === 1)
            .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
            .withColumn("o_orderstatus", lit("Q"))),
        "o_orderkey")
      Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 11 === 3)
      Snapshots.appendVersioned(s, dir,
        b.filter(col("o_orderkey") % 13 === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 80000000L)
          .withColumn("o_orderstatus", lit("A")))
      mv0
    }
    // measured: the incremental refresh (the operator under test) +
    // the |MV|-rows read
    MaterializedView.refresh(s, mv)
    MaterializedView.read(s, mv)
      .select(col("o_orderstatus"), col("cnt"),
        col("sum_o_custkey").as("sum_custkey"),
        col("avg_o_custkey").as("avg_custkey"))
  }

  /** r10 — HIDDEN-PARTITION TRANSFORM COMPLETENESS end-to-end: a table
    * month-partitioned on a synthetic timestamp (the calendar
    * transform — day-count arithmetic, timezone-free) takes an
    * update+insert wave, EVOLVES its spec to bucket(o_orderkey, 8)
    * (A53: metadata-only, zero rows move), then takes a second wave —
    * updates land IN PLACE in their month dirs, inserts hash-route
    * into epoch-1 bucket dirs. The final aggregate groups by the month
    * index recomputed from the RAW timestamp column, so a row routed
    * to the wrong partition, duplicated across epochs, or lost in the
    * evolution breaks the hash. Transform pruning pins live in
    * HiddenPartitionSpec.
    */
  def qLakePartTransforms(s: SparkSession, d: String): DataFrame = {
    val b0 = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    def withTs(df: DataFrame) = df.withColumn("ts",
      timestamp_micros((col("o_orderkey") % 360) * lit(43200000000L)))
    val b = withTs(b0)
    val root = tempDir("graft_hidpt_q") + "/t"
    staged {
      HiddenPartitions.init(s, root, b, MonthTransform("ts"))
      HiddenPartitions.merge(s, root,
        b.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1000000L)
          .unionByName(withTs(b0.filter(col("o_orderkey") % 11 === 3)
            .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
            .withColumn("o_custkey", col("o_custkey") + 5L))), "o_orderkey")
      HiddenPartitions.evolve(root, BucketTransform("o_orderkey", 8))
      HiddenPartitions.merge(s, root,
        b.filter(col("o_orderkey") % 5 === 1)
          .withColumn("o_custkey", col("o_custkey") +
            when(col("o_orderkey") % 7 === 0, 1000000L).otherwise(0L) +
            2000000L)
          .unionByName(withTs(b0.filter(col("o_orderkey") % 13 === 2)
            .withColumn("o_orderkey", col("o_orderkey") + 95000000L)
            .withColumn("o_custkey", col("o_custkey") + 7L))), "o_orderkey")
    }
    val df = s.read.format("graft").load(root)
    val dd = date_from_unix_date(
      floor(unix_micros(col("ts")) / lit(86400000000L)).cast("int"))
    df.groupBy(((year(dd) - lit(1970)) * lit(12) + month(dd) - lit(1))
        .cast("long").as("month_idx"))
      .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("sum_custkey"))
  }

  val qLakePartTransformsSql: String =
    """WITH fin AS (
      |  SELECT o_orderkey AS k,
      |    o_custkey + (CASE WHEN o_orderkey % 7 = 0 THEN 1000000 ELSE 0 END)
      |              + (CASE WHEN o_orderkey % 5 = 1 THEN 2000000 ELSE 0 END) AS c
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey + 90000000, o_custkey + 5
      |  FROM orders WHERE o_orderkey % 11 = 3
      |  UNION ALL
      |  SELECT o_orderkey + 95000000, o_custkey + 7
      |  FROM orders WHERE o_orderkey % 13 = 2),
      |m AS (SELECT DATE '1970-01-01'
      |    + CAST(floor((k % 360) / 2) AS INTEGER) AS dd, c FROM fin)
      |SELECT CAST((EXTRACT(year FROM dd) - 1970) * 12
      |    + EXTRACT(month FROM dd) - 1 AS BIGINT) AS month_idx,
      |  count(*) AS cnt, CAST(sum(c) AS BIGINT) AS sum_custkey
      |FROM m GROUP BY 1""".stripMargin

  /** A59 — TYPE WIDENING end-to-end: the table starts with an INT
    * column, takes a pre-widening wave, widens int→long as ONE
    * metadata commit (the `meta_only` verdict column pins that the
    * widening commit moved zero data files), then takes a wave whose
    * values cannot fit an int. The final aggregate reads MIXED physical
    * files (int-era + long-era) through the widened schema, and
    * `old_sum_qty` is computed by TIME TRAVEL to the pre-widening
    * version — served under the OLD type — so the oracle covers the
    * data path, the metadata transition, and the versioned schema at
    * once.
    */
  def qLakeWiden(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_orderstatus"),
      (col("o_custkey") % 1000000L).cast("int").as("qty"))
    val dir = stage(b, 4)
    Snapshots.init(s, dir)
    Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 9 === 4)
    val vPre = Snapshots.currentVersion(dir)
    val filesPre = Snapshots.liveFiles(dir, vPre).map(Snapshots.canonical)
    val vWiden = Snapshots.widenColumn(s, dir, "qty",
      org.apache.spark.sql.types.LongType)
    val metaOnly = Snapshots.liveFiles(dir, vWiden)
      .map(Snapshots.canonical) == filesPre
    Snapshots.appendVersioned(s, dir,
      b.filter(col("o_orderkey") % 13 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 80000000L)
        .withColumn("qty",
          (col("o_orderkey") + lit(8000000000L)).cast("long")))
    // bounded driver-side scalars: two schema strings and one 1-row agg
    val typeNow = Snapshots.read(s, dir).schema("qty").dataType.simpleString
    val typeOld =
      Snapshots.read(s, dir, vPre).schema("qty").dataType.simpleString
    val oldSum = Snapshots.read(s, dir, vPre)
      .agg(sum(col("qty")).as("s")).head().getLong(0)
    Snapshots.read(s, dir).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), sum("qty").as("sum_qty"))
      .withColumn("qty_type", lit(typeNow))
      .withColumn("qty_type_old", lit(typeOld))
      .withColumn("meta_only", lit(metaOnly))
      .withColumn("old_sum_qty", lit(oldSum))
  }

  val qLakeWidenSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(o_custkey % 1000000 AS INTEGER) AS qty
      |  FROM orders),
      |w1 AS (SELECT * FROM base WHERE o_orderkey % 9 <> 4),
      |post AS (
      |  SELECT o_orderkey + 80000000 AS o_orderkey, o_orderstatus,
      |    CAST(o_orderkey + 80000000 + 8000000000 AS BIGINT) AS qty
      |  FROM base WHERE o_orderkey % 13 = 2),
      |fin AS (SELECT * FROM w1 UNION ALL SELECT * FROM post),
      |old AS (SELECT CAST(sum(qty) AS BIGINT) AS old_sum FROM w1)
      |SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(sum(qty) AS BIGINT) AS sum_qty,
      |  'bigint' AS qty_type, 'int' AS qty_type_old,
      |  true AS meta_only,
      |  (SELECT old_sum FROM old) AS old_sum_qty
      |FROM fin GROUP BY 1""".stripMargin

  /** A58 — MV-AWARE QUERY REWRITE end-to-end: the user's aggregate
    * targets the BASE table; the optimizer substitutes the registered,
    * exactly-fresh A55 MV. The scan-free property is pinned the A48
    * way — a live base data file is DELETED from disk before the
    * query runs, so only a plan that never opens the base survives —
    * and the `rewritten` verdict column (plan introspection: the base
    * path absent from the scanned graft relations) is itself oracled.
    */
  def qLakeMvRewrite(s: SparkSession, d: String): DataFrame = {
    // r13: the base carries a bounded-cardinality bucket column so the
    // sketch-estimate dashboard is EXACT (DataSketches HLL is exact in
    // sparse mode at these cardinalities) and therefore oracle-able
    val b = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .withColumn("o_bucket", col("o_custkey") % 50)
    val (dir, mv) = staged {
      val dir = stage(b, 4)
      Snapshots.init(s, dir, changeDataFeed = true)
      val mv = tempDir("graft_mvrw_q") + "/mv"
      MaterializedView.create(s, mv, dir, "o_orderkey",
        Seq("o_orderstatus"), Seq("o_custkey"),
        minMaxCols = Seq("o_totalprice"), distinctCols = Seq("o_bucket"))
      MvRegistry.register(s, mv)
      Snapshots.mergeVersioned(s, dir,
        b.filter(col("o_orderkey") % 6 === 0)
          .withColumn("o_orderstatus", lit("R")), "o_orderkey")
      Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 9 === 4)
      MaterializedView.refresh(s, mv)
      (dir, mv)
    }
    // measured: the REWRITTEN reads (|MV|-rows regardless of scale) —
    // counting algebra + A63 extrema + r13 sketch estimates in ONE
    // dashboard shape
    def aggOf(df: DataFrame) = df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("o_custkey").as("sum_custkey"),
        avg("o_custkey").as("avg_custkey"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        expr("hll_sketch_estimate(hll_sketch_agg(o_bucket))").as("nd_bucket"))
    val full = aggOf(s.read.format("graft").load(dir))
      .withColumn("slice", lit("all"))
    // the filtered dashboard shape: the predicate references the GROUP
    // column alone, so it commutes with the aggregation and applies to
    // the MV read — this branch must be scan-free too
    val filtered = aggOf(s.read.format("graft").load(dir)
        .filter(col("o_orderstatus").isin("F", "R")))
      .withColumn("slice", lit("fr"))
    // r13 — A43 composition: the SAME dashboard through a CATALOG NAME
    // (registerByName); by-name and by-path resolve to one rewrite
    s.sql("DROP TABLE IF EXISTS graft_mvrw_byname")
    s.sql(s"CREATE TABLE graft_mvrw_byname USING graft " +
      s"OPTIONS (path '$dir', keyCol 'o_orderkey')")
    MvRegistry.registerByName(s, "graft_mvrw_byname", mv)
    val byName = aggOf(s.table("graft_mvrw_byname"))
      .withColumn("slice", lit("byname"))
    val q = full.unionByName(filtered).unionByName(byName)
    // the hard pin: delete a LIVE base data file — a plan that still
    // scans the base cannot answer anymore
    val victim = Snapshots.liveFiles(dir,
      Snapshots.currentVersion(dir)).head
    Files.delete(Paths.get(victim))
    val scanned = scannedGraftRoots(q)
    val rewritten =
      !scanned.contains(Paths.get(dir).toAbsolutePath.normalize.toString)
    q.withColumn("rewritten", lit(rewritten))
  }

  /** r12 (the r11 verdict's item 6) — FILTERED MV + PREDICATE
    * SUBSUMPTION REWRITE: the MV stores `WHERE o_orderstatus = 'F'`
    * (a NON-group predicate — the rows were pre-filtered away, which
    * no group-column commuting can recover), maintained incrementally
    * through a merge wave that moves rows ACROSS the predicate
    * boundary (status flips) and a delete wave. Two query shapes must
    * serve scan-free (base file deleted before execution): `eq` — the
    * query's WHERE equals the stored predicate (v1 subsumption); `sub`
    * — the query adds a group-column conjunct on top (v2: the MV's
    * conjunct is consumed, the residual commutes onto the MV read).
    * MvRewriteSpec pins the fallback: a query whose WHERE does NOT
    * subsume the predicate keeps the base scan.
    */
  def qLakeMvFiltered(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val dir = staged {
      val dir = stage(b, 4)
      Snapshots.init(s, dir, changeDataFeed = true)
      val mv = tempDir("graft_mvf_q") + "/mv"
      MaterializedView.create(s, mv, dir, "o_orderkey",
        Seq("o_orderpriority"), Seq("o_custkey"),
        filter = Some("o_orderstatus = 'F'"))
      MvRegistry.register(s, mv)
      // rows flip INTO and OUT OF the predicate: % 6 flips to 'F',
      // % 10 = 1 flips everything (incl. former 'F') to 'P'
      Snapshots.mergeVersioned(s, dir,
        b.filter(col("o_orderkey") % 6 === 0)
          .withColumn("o_orderstatus", lit("F")), "o_orderkey")
      Snapshots.mergeVersioned(s, dir,
        b.filter(col("o_orderkey") % 10 === 1)
          .withColumn("o_orderstatus", lit("P")), "o_orderkey")
      Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 9 === 4)
      MaterializedView.refresh(s, mv)
      dir
    }
    // measured: the SUBSUMPTION-REWRITTEN reads
    def aggOf(df: DataFrame) = df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), sum("o_custkey").as("sum_custkey"))
    val eq = aggOf(s.read.format("graft").load(dir)
        .filter(col("o_orderstatus") === "F"))
      .withColumn("slice", lit("eq"))
    val sub = aggOf(s.read.format("graft").load(dir)
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderpriority").isin("1-URGENT", "5-LOW")))
      .withColumn("slice", lit("sub"))
    val q = eq.unionByName(sub)
    val victim = Snapshots.liveFiles(dir,
      Snapshots.currentVersion(dir)).head
    Files.delete(Paths.get(victim))
    val scanned = scannedGraftRoots(q)
    val rewritten =
      !scanned.contains(Paths.get(dir).toAbsolutePath.normalize.toString)
    q.withColumn("rewritten", lit(rewritten))
  }

  val qLakeMvFilteredSql: String =
    """WITH w1 AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_orderpriority AS pr,
      |    CASE WHEN o_orderkey % 10 = 1 THEN 'P'
      |         WHEN o_orderkey % 6 = 0 THEN 'F'
      |         ELSE o_orderstatus END AS st
      |  FROM orders),
      |w2 AS (SELECT k, c, pr, st FROM w1 WHERE k % 9 <> 4)
      |SELECT pr AS o_orderpriority, count(*) AS cnt,
      |  CAST(sum(c) AS BIGINT) AS sum_custkey,
      |  'eq' AS slice, true AS rewritten
      |FROM w2 WHERE st = 'F' GROUP BY 1
      |UNION ALL
      |SELECT pr, count(*), CAST(sum(c) AS BIGINT), 'sub', true
      |FROM w2 WHERE st = 'F' AND pr IN ('1-URGENT', '5-LOW') GROUP BY 1""".stripMargin

  /** r12 — RANGE-IMPLICATION SUBSUMPTION (v3 of the filtered-MV
    * rewrite): the MV stores `WHERE o_custkey >= 300` on a GROUP
    * column, maintained through two merge waves that move rows across
    * the cut in both directions (a +1000 custkey raise, a to-50 drop)
    * and a delete wave. Two query shapes with a STRICTLY TIGHTER
    * range must serve scan-free (live base file deleted before
    * execution): `rng` — exact group match, residual `o_custkey >=
    * 800` re-applied over the MV read; `roll` — the same cut under a
    * group-subset rollup. Neither predicate appears in the MV spec —
    * the rewrite proves `x >= 800 ⇒ x >= 300` on the literals alone.
    * MaterializedViewSpec pins the fallback: `x >= 50` (not implied)
    * keeps the base scan.
    */
  def qLakeMvRange(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val dir = staged {
      val dir = stagedBase(s, d, "mv3", 4, cdf = true)(b)
      val mv = tempDir("graft_mvr_q") + "/mv"
      MaterializedView.create(s, mv, dir, "o_orderkey",
        Seq("o_orderstatus", "o_custkey"), Seq("o_orderkey"),
        filter = Some("o_custkey >= 300"))
      MvRegistry.register(s, mv)
      // rows cross the cut in both directions
      Snapshots.mergeVersioned(s, dir,
        b.filter(col("o_orderkey") % 8 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1000), "o_orderkey")
      Snapshots.mergeVersioned(s, dir,
        b.filter(col("o_orderkey") % 11 === 3)
          .withColumn("o_custkey", lit(50L)), "o_orderkey")
      Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 13 === 5)
      MaterializedView.refresh(s, mv)
      dir
    }
    val g = s.read.format("graft").load(dir)
    val rng = g.filter(col("o_custkey") >= 800)
      .groupBy("o_orderstatus", "o_custkey")
      .agg(count(lit(1)).as("cnt"), sum("o_orderkey").as("sum_key"))
      .withColumn("slice", lit("rng"))
    val roll = g.filter(col("o_custkey") >= 800)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), sum("o_orderkey").as("sum_key"))
      .withColumn("o_custkey", lit(null).cast("long"))
      .select("o_orderstatus", "o_custkey", "cnt", "sum_key")
      .withColumn("slice", lit("roll"))
    val q = rng.select("o_orderstatus", "o_custkey", "cnt", "sum_key", "slice")
      .unionByName(roll)
    val victim = Snapshots.liveFiles(dir,
      Snapshots.currentVersion(dir)).head
    Files.delete(Paths.get(victim))
    val scanned = scannedGraftRoots(q)
    val rewritten =
      !scanned.contains(Paths.get(dir).toAbsolutePath.normalize.toString)
    q.withColumn("rewritten", lit(rewritten))
  }

  val qLakeMvRangeSql: String =
    """WITH w1 AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CASE WHEN o_orderkey % 11 = 3 THEN 50
      |         WHEN o_orderkey % 8 = 0 THEN o_custkey + 1000
      |         ELSE o_custkey END AS c
      |  FROM orders),
      |w2 AS (SELECT k, st, c FROM w1 WHERE k % 13 <> 5)
      |SELECT st AS o_orderstatus, c AS o_custkey, count(*) AS cnt,
      |  CAST(sum(k) AS BIGINT) AS sum_key, 'rng' AS slice,
      |  true AS rewritten
      |FROM w2 WHERE c >= 800 GROUP BY 1, 2
      |UNION ALL
      |SELECT st, CAST(NULL AS BIGINT), count(*), CAST(sum(k) AS BIGINT),
      |  'roll', true
      |FROM w2 WHERE c >= 800 GROUP BY 1""".stripMargin

  val qLakeMvRewriteSql: String =
    """WITH w1 AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
      |    o_custkey % 50 AS bkt,
      |    CASE WHEN o_orderkey % 6 = 0 THEN 'R' ELSE o_orderstatus END AS st
      |  FROM orders),
      |w2 AS (SELECT k, c, p, bkt, st FROM w1 WHERE k % 9 <> 4)
      |SELECT st AS o_orderstatus, count(*) AS cnt,
      |  CAST(sum(c) AS BIGINT) AS sum_custkey, avg(c) AS avg_custkey,
      |  min(p) AS min_price, max(p) AS max_price,
      |  CAST(count(DISTINCT bkt) AS BIGINT) AS nd_bucket,
      |  'all' AS slice, true AS rewritten
      |FROM w2 GROUP BY st
      |UNION ALL
      |SELECT st, count(*), CAST(sum(c) AS BIGINT), avg(c),
      |  min(p), max(p), CAST(count(DISTINCT bkt) AS BIGINT),
      |  'fr', true
      |FROM w2 WHERE st IN ('F', 'R') GROUP BY st
      |UNION ALL
      |SELECT st, count(*), CAST(sum(c) AS BIGINT), avg(c),
      |  min(p), max(p), CAST(count(DISTINCT bkt) AS BIGINT),
      |  'byname', true
      |FROM w2 GROUP BY st""".stripMargin

  val qLakeMvSql: String =
    """WITH w1 AS (
      |  SELECT o_orderkey AS k, o_custkey AS c,
      |    CASE WHEN o_orderkey % 5 = 0 THEN 'M' ELSE o_orderstatus END AS st
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey + 90000000, o_custkey, 'Q'
      |  FROM orders WHERE o_orderkey % 7 = 1),
      |w2 AS (SELECT k, c, st FROM w1 WHERE k % 11 <> 3),
      |w3 AS (SELECT k, c, st FROM w2
      |  UNION ALL
      |  SELECT o_orderkey + 80000000, o_custkey, 'A'
      |  FROM orders WHERE o_orderkey % 13 = 2)
      |SELECT st AS o_orderstatus, count(*) AS cnt,
      |  CAST(sum(c) AS BIGINT) AS sum_custkey, avg(c) AS avg_custkey
      |FROM w3 GROUP BY 1""".stripMargin

  /** A57 — JOIN MV end-to-end: γ(orders ⋈ customer) follows
    * simultaneous waves on BOTH bases — a join-key move and a delete
    * on the left, a group move and a fanout-killing delete on the
    * right — through one Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR refresh. The
    * oracle recomputes from both reconstructed finals, so a
    * double-counted ΔL⋈ΔR, a stale-side join, or a missed fanout
    * death breaks the hash.
    */
  def qLakeMvJoin(s: SparkSession, d: String): DataFrame = {
    val l0 = Tables.orders(s, d).select("o_orderkey", "o_custkey",
      "o_orderstatus")
    val r0 = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val mv = staged {
      val ldir = stagedBase(s, d, "mvjl", 4, cdf = true)(l0)
      val rdir = stagedBase(s, d, "mvjr", 2, cdf = true)(r0)
      val mv0 = tempDir("graft_mvj_q") + "/mv"
      MaterializedView.createJoin(s, mv0, ldir, "o_orderkey", rdir,
        "o_custkey", "o_custkey", Seq("c_mktsegment"), Seq("o_orderkey"))
      Snapshots.mergeVersioned(s, ldir,
        l0.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1L), "o_orderkey")
      Snapshots.deleteVersioned(s, ldir, col("o_orderkey") % 13 === 1)
      Snapshots.mergeVersioned(s, rdir,
        Tables.customer(s, d).filter(col("c_custkey") % 5 === 2)
          .select(col("c_custkey").as("o_custkey"),
            lit("MOVED").as("c_mktsegment")), "o_custkey")
      Snapshots.deleteVersioned(s, rdir, col("o_custkey") % 17 === 3)
      mv0
    }
    // measured: the incremental JOIN refresh + the |MV|-rows read
    MaterializedView.refreshJoin(s, mv)
    MaterializedView.read(s, mv)
      .select(col("c_mktsegment"), col("cnt"),
        col("sum_o_orderkey").as("sum_okey"),
        col("avg_o_orderkey").as("avg_okey"))
  }

  val qLakeMvJoinSql: String =
    """WITH lf AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1
      |         ELSE o_custkey END AS k
      |  FROM orders WHERE o_orderkey % 13 <> 1),
      |rf AS (
      |  SELECT c_custkey AS k,
      |    CASE WHEN c_custkey % 5 = 2 THEN 'MOVED'
      |         ELSE c_mktsegment END AS seg
      |  FROM customer WHERE c_custkey % 17 <> 3)
      |SELECT rf.seg AS c_mktsegment, count(*) AS cnt,
      |  CAST(sum(lf.o_orderkey) AS BIGINT) AS sum_okey,
      |  avg(lf.o_orderkey) AS avg_okey
      |FROM lf JOIN rf ON lf.k = rf.k
      |GROUP BY 1""".stripMargin

  /** r11 (A57→A58) — JOIN-MV-AWARE REWRITE end-to-end: the user's
    * `orders ⋈ customer → groupBy` — the single most common warehouse
    * dashboard — is served by the registered join MV with BOTH pinned
    * base versions equal to the MV's two consumed watermarks. The
    * scan-free property is pinned DOUBLED: one live data file is
    * deleted from EACH base before the query runs, and the `rewritten`
    * verdict column (both base paths absent from the scanned graft
    * relations) is itself oracled. A filtered slice rides along — the
    * predicate references the MV group column alone, so it commutes
    * through join AND aggregation onto the MV read.
    */
  def qLakeMvJoinRewrite(s: SparkSession, d: String): DataFrame = {
    val l0 = Tables.orders(s, d).select("o_orderkey", "o_custkey",
      "o_orderstatus")
    val r0 = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val (ldir, rdir) = staged {
      val ldir = stagedBase(s, d, "mvjl", 4, cdf = true)(l0)
      val rdir = stagedBase(s, d, "mvjr", 2, cdf = true)(r0)
      val mv = tempDir("graft_mvjrw_q") + "/mv"
      MaterializedView.createJoin(s, mv, ldir, "o_orderkey", rdir,
        "o_custkey", "o_custkey", Seq("c_mktsegment"), Seq("o_orderkey"))
      MvRegistry.register(s, mv)
      Snapshots.mergeVersioned(s, ldir,
        l0.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1L), "o_orderkey")
      Snapshots.deleteVersioned(s, ldir, col("o_orderkey") % 13 === 1)
      Snapshots.mergeVersioned(s, rdir,
        Tables.customer(s, d).filter(col("c_custkey") % 5 === 2)
          .select(col("c_custkey").as("o_custkey"),
            lit("MOVED").as("c_mktsegment")), "o_custkey")
      Snapshots.deleteVersioned(s, rdir, col("o_custkey") % 17 === 3)
      MaterializedView.refreshJoin(s, mv)
      (ldir, rdir)
    }
    // measured: the REWRITTEN reads (|MV|-rows regardless of scale)
    def joined = s.read.format("graft").load(ldir)
      .join(s.read.format("graft").load(rdir), Seq("o_custkey"))
    def aggOf(df: DataFrame) = df.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        sum("o_orderkey").as("sum_okey"),
        avg("o_orderkey").as("avg_okey"))
    val q = aggOf(joined).withColumn("slice", lit("all"))
      .unionByName(aggOf(joined
          .filter(col("c_mktsegment").isin("BUILDING", "MOVED")))
        .withColumn("slice", lit("seg")))
    // the hard pin, DOUBLED: a live data file vanishes from each base
    Files.delete(Paths.get(Snapshots.liveFiles(ldir,
      Snapshots.currentVersion(ldir)).head))
    Files.delete(Paths.get(Snapshots.liveFiles(rdir,
      Snapshots.currentVersion(rdir)).head))
    val scanned = scannedGraftRoots(q)
    val rewritten =
      !scanned.contains(Paths.get(ldir).toAbsolutePath.normalize.toString) &&
      !scanned.contains(Paths.get(rdir).toAbsolutePath.normalize.toString)
    q.withColumn("rewritten", lit(rewritten))
  }

  val qLakeMvJoinRewriteSql: String =
    """WITH lf AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1
      |         ELSE o_custkey END AS k
      |  FROM orders WHERE o_orderkey % 13 <> 1),
      |rf AS (
      |  SELECT c_custkey AS k,
      |    CASE WHEN c_custkey % 5 = 2 THEN 'MOVED'
      |         ELSE c_mktsegment END AS seg
      |  FROM customer WHERE c_custkey % 17 <> 3),
      |j AS (SELECT rf.seg, lf.o_orderkey
      |  FROM lf JOIN rf ON lf.k = rf.k)
      |SELECT seg AS c_mktsegment, count(*) AS cnt,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
      |  avg(o_orderkey) AS avg_okey, 'all' AS slice, true AS rewritten
      |FROM j GROUP BY 1
      |UNION ALL
      |SELECT seg, count(*), CAST(sum(o_orderkey) AS BIGINT),
      |  avg(o_orderkey), 'seg', true
      |FROM j WHERE seg IN ('BUILDING', 'MOVED') GROUP BY 1""".stripMargin

  /** r11 (A55+A58) — MIN/MAX IN THE MV ALGEBRA end-to-end: the MV
    * stores per-group extrema; a wave deletes the TOP of the price
    * distribution (every group's stored max dies → the group-scoped
    * recompute path), a merge moves groups, a keyed delete thins rows —
    * one netted refresh follows all three. The final query asks the
    * BASE for count/sum/min/max and must be served by the MV: a live
    * base data file is deleted first, and the `rewritten` plan verdict
    * is oracled alongside the values.
    */
  def qLakeMvMinMax(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val dir = staged {
      val dir = stagedBase(s, d, "mv4", 4, cdf = true)(b)
      val mv = tempDir("graft_mvmm_q") + "/mv"
      MaterializedView.create(s, mv, dir, "o_orderkey",
        Seq("o_orderstatus"), Seq("o_custkey"), Seq("o_totalprice"))
      MvRegistry.register(s, mv)
      Snapshots.mergeVersioned(s, dir,
        b.filter(col("o_orderkey") % 6 === 0)
          .withColumn("o_orderstatus", lit("R")), "o_orderkey")
      // the extremum killer: every group whose max is above the cut
      // recomputes group-scoped from the base (never a full rescan)
      Snapshots.deleteVersioned(s, dir, col("o_totalprice") > 400000.0)
      Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 9 === 4)
      MaterializedView.refresh(s, mv)
      dir
    }
    // measured: the min/max-serving rewritten read
    val q = s.read.format("graft").load(dir).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("o_custkey").as("sum_custkey"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
    val victim = Snapshots.liveFiles(dir,
      Snapshots.currentVersion(dir)).head
    Files.delete(Paths.get(victim))
    val scanned = scannedGraftRoots(q)
    val rewritten =
      !scanned.contains(Paths.get(dir).toAbsolutePath.normalize.toString)
    q.withColumn("rewritten", lit(rewritten))
  }

  /** r11 (A55×A45×C25) — CONTINUOUS MV MAINTENANCE end-to-end: a C25
    * STREAMING UPSERT SINK drives the base (two micro-batch waves: a
    * group-moving update+insert wave, then a key-reviving custkey
    * move), a batch DELETE lands between them, and the
    * `continuousRefresh` CDF-trigger stream follows every commit with
    * exactly-once batch refreshes. The output reads the MV (never the
    * base) and oracles the full final aggregate plus a `caught_up`
    * verdict (consumed watermark == base head). A lost trigger, a
    * double-applied window, or an upsert the feed missed breaks the
    * hash.
    */
  def qLakeMvStream(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val (dir, mv) = staged {
      val dir = stagedBase(s, d, "mv3", 4, cdf = true)(b)
      val mv = tempDir("graft_mvst_q") + "/mv"
      MaterializedView.create(s, mv, dir, "o_orderkey",
        Seq("o_orderstatus"), Seq("o_custkey"))
      val refreshQs = MaterializedView.continuousRefresh(s, mv,
        tempDir("graft_mvst_rck"))
      val spool = tempDir("graft_mvst_spool")
      val upsert = s.readStream.schema(Snapshots.read(s, dir).schema)
        .parquet(spool)
        .writeStream.format("graft")
        .option("keyCol", "o_orderkey")
        .option("checkpointLocation", tempDir("graft_mvst_uck"))
        .start(dir)
      try {
        // wave 1 through the SINK: group moves + fresh inserts
        b.filter(col("o_orderkey") % 6 === 0)
          .withColumn("o_orderstatus", lit("S"))
          .unionByName(b.filter(col("o_orderkey") % 11 === 5)
            .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
            .withColumn("o_orderstatus", lit("Z")))
          .write.mode("append").parquet(spool)
        upsert.processAllAvailable()
        // a batch delete between stream batches (deletes aren't upserts)
        Snapshots.deleteVersioned(s, dir, col("o_orderkey") % 9 === 4)
        // wave 2 through the sink: custkey moves that also REVIVE keys
        // the delete just killed (upsert = insert-if-absent)
        b.filter(col("o_orderkey") % 13 === 2)
          .withColumn("o_custkey", col("o_custkey") + 1000000L)
          .write.mode("append").parquet(spool)
        upsert.processAllAvailable()
        refreshQs.foreach(_.processAllAvailable())
      } finally { upsert.stop(); refreshQs.foreach(_.stop()) }
      (dir, mv)
    }
    // measured: the final |MV|-rows read + the caught-up verdict
    val caughtUp = MaterializedView.consumedVersion(mv) ==
      Snapshots.currentVersion(dir)
    MaterializedView.read(s, mv)
      .select(col("o_orderstatus"), col("cnt"),
        col("sum_o_custkey").as("sum_custkey"),
        col("avg_o_custkey").as("avg_custkey"))
      .withColumn("caught_up", lit(caughtUp))
  }

  val qLakeMvStreamSql: String =
    """WITH fin AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 13 = 2 THEN o_custkey + 1000000
      |         ELSE o_custkey END AS c,
      |    CASE WHEN o_orderkey % 13 = 2 THEN o_orderstatus
      |         WHEN o_orderkey % 6 = 0 THEN 'S'
      |         ELSE o_orderstatus END AS st
      |  FROM orders
      |  WHERE o_orderkey % 13 = 2 OR o_orderkey % 9 <> 4
      |  UNION ALL
      |  SELECT o_orderkey + 90000000, o_custkey, 'Z'
      |  FROM orders WHERE o_orderkey % 11 = 5 AND o_orderkey % 9 <> 4)
      |SELECT st AS o_orderstatus, count(*) AS cnt,
      |  CAST(sum(c) AS BIGINT) AS sum_custkey, avg(c) AS avg_custkey,
      |  true AS caught_up
      |FROM fin GROUP BY 1""".stripMargin

  val qLakeMvMinMaxSql: String =
    """WITH w1 AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
      |    CASE WHEN o_orderkey % 6 = 0 THEN 'R' ELSE o_orderstatus END AS st
      |  FROM orders),
      |w2 AS (SELECT * FROM w1 WHERE p <= 400000.0),
      |w3 AS (SELECT * FROM w2 WHERE k % 9 <> 4)
      |SELECT st AS o_orderstatus, count(*) AS cnt,
      |  CAST(sum(c) AS BIGINT) AS sum_custkey,
      |  min(p) AS min_price, max(p) AS max_price, true AS rewritten
      |FROM w3 GROUP BY 1""".stripMargin

  /** A56 — MULTI-TABLE TRANSACTIONS end-to-end: transaction 1 commits
    * a merge on orders AND a delete on customer atomically;
    * transaction 2 CRASHES between its two publishes and is completed
    * by the consistent reader's recovery. The output joins both final
    * tables per-row, so a half-applied transaction — txn 2's left
    * visible without its right — breaks the hash: the atomicity
    * guarantee itself is what the oracle checks.
    */
  def qLakeTxn(s: SparkSession, d: String): DataFrame = {
    val l0 = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val r0 = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val (ldir, rdir) = (stage(l0, 4), stage(r0, 2))
    Snapshots.init(s, ldir); Snapshots.init(s, rdir)
    val coord = tempDir("graft_txn_q")
    val h1 = GraftTxn.begin(s, coord, Seq(ldir, rdir), "qtx1")
    Snapshots.mergeVersioned(s, h1.branchOf(ldir),
      l0.filter(col("o_orderkey") % 9 === 0)
        .withColumn("o_orderstatus", lit("T")), "o_orderkey")
    Snapshots.deleteVersioned(s, h1.branchOf(rdir),
      col("o_custkey") % 7 === 2)
    GraftTxn.commit(s, h1)
    val h2 = GraftTxn.begin(s, coord, Seq(ldir, rdir), "qtx2")
    Snapshots.deleteVersioned(s, h2.branchOf(ldir),
      col("o_orderkey") % 11 === 4)
    Snapshots.mergeVersioned(s, h2.branchOf(rdir),
      // exclude txn1's deleted keys: an upsert would re-insert them
      Tables.customer(s, d).filter(col("c_custkey") % 5 === 3 &&
          col("c_custkey") % 7 =!= 2)
        .select(col("c_custkey").as("o_custkey"),
          lit("TX").as("c_mktsegment")), "o_custkey")
    try GraftTxn.commit(s, h2, beforePublish = i =>
      if (i == 1) throw new RuntimeException("injected crash"))
    catch { case e: RuntimeException if e.getMessage == "injected crash" => }
    val views = GraftTxn.readConsistent(s, coord, Seq(ldir, rdir))
    views(ldir).join(views(rdir), Seq("o_custkey"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("c_mktsegment"))
  }

  val qLakeTxnSql: String =
    """WITH lf AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 9 = 0 THEN 'T'
      |         ELSE o_orderstatus END AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 11 <> 4),
      |rf AS (
      |  SELECT c_custkey AS k,
      |    CASE WHEN c_custkey % 5 = 3 THEN 'TX'
      |         ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey % 7 <> 2)
      |SELECT lf.o_orderkey, lf.o_orderstatus, rf.c_mktsegment
      |FROM lf JOIN rf ON lf.o_custkey = rf.k""".stripMargin

  /** A53 — partition-spec EVOLUTION end-to-end: orders lands
    * mod(key, 4)-hidden-partitioned, takes an in-epoch merge wave,
    * EVOLVES to mod(key, 8) (one metadata line, zero rows move), then
    * takes a second wave that both updates OLD keys (which must be
    * found and rewritten IN PLACE in their epoch-0 partitions — a
    * misroute duplicates the key and adds a row the hash catches) and
    * inserts NEW keys (which must land by the new transform in the
    * epoch-1 directories). Per-row output: every routing decision is
    * in the hash.
    */
  def qLakePartEvolve(s: SparkSession, d: String): DataFrame = {
    val b = base(s, d)
    val root = tempDir("graft_evolve_q") + "/t"
    HiddenPartitions.init(s, root, b, ModTransform("o_orderkey", 4))
    HiddenPartitions.merge(s, root,
      b.filter(col("o_orderkey") % 16 === 0)
        .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2)),
      "o_orderkey")
    HiddenPartitions.evolve(root, ModTransform("o_orderkey", 8))
    val wave2 = b.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", round(col("o_totalprice") + 1000, 2))
      .unionByName(b.filter(col("o_orderkey") % 4 === 1)
        .select((col("o_orderkey") + 90000000L).as("o_orderkey"),
          lit("E").as("o_orderstatus"), col("o_totalprice")))
    HiddenPartitions.merge(s, root, wave2, "o_orderkey")
    s.read.format("graft").load(root)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
  }

  val qLakePartEvolveSql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice + 1000, 2)
      |       WHEN o_orderkey % 16 = 0 THEN round(o_totalprice * 2, 2)
      |       ELSE round(o_totalprice, 2) END AS price
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey + 90000000, 'E', round(o_totalprice, 2)
      |FROM orders WHERE o_orderkey % 4 = 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lake_part_evolve" -> (qLakePartEvolve(_, _)),
    "q_lake_merge_clauses" -> (qLakeMergeClauses(_, _)),
    "q_lake_merge_evolve" -> (qLakeMergeEvolve(_, _)),
    "q_lake_mv" -> (qLakeMv(_, _)),
    "q_lake_mv_join" -> (qLakeMvJoin(_, _)),
    "q_lake_mv_rewrite" -> (qLakeMvRewrite(_, _)),
    "q_lake_mv_filtered" -> (qLakeMvFiltered(_, _)),
    "q_lake_mv_range" -> (qLakeMvRange(_, _)),
    "q_lake_mv_join_rewrite" -> (qLakeMvJoinRewrite(_, _)),
    "q_lake_mv_minmax" -> (qLakeMvMinMax(_, _)),
    "q_lake_mv_stream" -> (qLakeMvStream(_, _)),
    "q_lake_widen" -> (qLakeWiden(_, _)),
    "q_lake_part_transforms" -> (qLakePartTransforms(_, _)),
    "q_lake_txn" -> (qLakeTxn(_, _)),
    "q_lake_bucketed" -> (qLakeBucketed(_, _)),
    "q_lake_bucketed_part" -> (qLakeBucketedPart(_, _)),
    "q_lake_steady" -> (qLakeSteady(_, _)),
    "q_lake_composite_key" -> (qLakeCompositeKey(_, _)),
    "q_lake_ddl_layout" -> (qLakeDdlLayout(_, _)),
    "q_lake_nested_stats" -> (qLakeNestedStats(_, _)),
    "q_lake_check" -> (qLakeCheck(_, _)),
    "q_lake_cdf_opts" -> (qLakeCdfOpts(_, _)),
    "q_lake_stored_cdf" -> (qLakeStoredCdf(_, _)),
    "q_lake_deltalog" -> (qLakeDeltaLog(_, _)),
    "q_lake_optimize_where" -> (qLakeOptimizeWhere(_, _)),
    "q_lake_timetravel" -> (qLakeTimetravel(_, _)),
    "q_lake_vacuum" -> (qLakeVacuum(_, _)),
    "q_lake_optimize" -> (qLakeOptimize(_, _)),
    "q_lake_merge" -> (qLakeMerge(_, _)),
    "q_lake_changefeed" -> (qLakeChangefeed(_, _)),
    "q_lake_feed_stream" -> (qLakeFeedStream(_, _)),
    "q_lake_schema_evo" -> (qLakeSchemaEvo(_, _)),
    "q_lake_schema_map" -> (qLakeSchemaMap(_, _)),
    "q_lake_partitioned" -> (qLakePartitioned(_, _)),
    "q_lake_zorder" -> (qLakeZorder(_, _)),
    "q_lake_zorder_str" -> (qLakeZorderStr(_, _)),
    "q_lake_restore" -> (qLakeRestore(_, _)),
    "q_lake_clone" -> (qLakeClone(_, _)),
    "q_lake_dv" -> (qLakeDv(_, _)),
    "q_lake_rowcount" -> (qLakeRowcount(_, _)),
    "q_lake_update" -> (qLakeUpdate(_, _)),
    "q_lake_update_mor" -> (qLakeUpdateMor(_, _)),
    "q_lake_merge_mor" -> (qLakeMergeMor(_, _)),
    "q_lake_dml_pruned" -> (qLakeDmlPruned(_, _)),
    "q_lake_source" -> (qLakeSource(_, _)),
    "q_lake_stream_source" -> (qLakeStreamSource(_, _)),
    "q_lake_wap" -> (qLakeWap(_, _)),
    "q_lake_zorder_inc" -> (qLakeZorderInc(_, _)),
    "q_lake_part_source" -> (qLakePartSource(_, _)),
    "q_lake_bloom" -> (qLakeBloom(_, _)),
    "q_lake_catalog" -> (qLakeCatalog(_, _)),
    "q_lake_sql_dml" -> (qLakeSqlDml(_, _)),
    "q_lake_compat" -> (qLakeCompat(_, _)),
    "q_lake_cdf_stream" -> (qLakeCdfStream(_, _)),
    "q_lake_part_stream" -> (qLakePartStream(_, _)),
    "q_lake_meta_agg" -> (qLakeMetaAgg(_, _)),
    "q_lake_meta_agg_filtered" -> (qLakeMetaAggFiltered(_, _)),
    "q_lake_ts_stats" -> (qLakeTsStats(_, _)),
    "q_lake_hidden_part" -> (qLakeHiddenPart(_, _)),
    "q_lake_hidden_mor" -> (qLakeHiddenMor(_, _)),
    "q_lake_catalog_part" -> (qLakeCatalogPart(_, _)))

  def oracles: Map[String, String] = Map(
    "q_lake_part_evolve" -> qLakePartEvolveSql,
    "q_lake_merge_clauses" -> qLakeMergeClausesSql,
    "q_lake_merge_evolve" -> qLakeMergeEvolveSql,
    "q_lake_mv" -> qLakeMvSql,
    "q_lake_mv_join" -> qLakeMvJoinSql,
    "q_lake_mv_rewrite" -> qLakeMvRewriteSql,
    "q_lake_mv_filtered" -> qLakeMvFilteredSql,
    "q_lake_mv_range" -> qLakeMvRangeSql,
    "q_lake_mv_join_rewrite" -> qLakeMvJoinRewriteSql,
    "q_lake_mv_minmax" -> qLakeMvMinMaxSql,
    "q_lake_mv_stream" -> qLakeMvStreamSql,
    "q_lake_widen" -> qLakeWidenSql,
    "q_lake_part_transforms" -> qLakePartTransformsSql,
    "q_lake_txn" -> qLakeTxnSql,
    "q_lake_bucketed" -> qLakeBucketedSql,
    "q_lake_bucketed_part" -> qLakeBucketedPartSql,
    "q_lake_steady" -> qLakeSteadySql,
    "q_lake_composite_key" -> qLakeCompositeKeySql,
    "q_lake_ddl_layout" -> qLakeDdlLayoutSql,
    "q_lake_nested_stats" -> qLakeNestedStatsSql,
    "q_lake_check" -> qLakeCheckSql,
    "q_lake_cdf_opts" -> qLakeCdfOptsSql,
    "q_lake_stored_cdf" -> qLakeStoredCdfSql,
    "q_lake_deltalog" -> qLakeDeltaLogSql,
    "q_lake_optimize_where" -> qLakeOptimizeWhereSql,
    "q_lake_timetravel" -> qLakeTimetravelSql,
    "q_lake_vacuum" -> qLakeVacuumSql,
    "q_lake_optimize" -> qLakeOptimizeSql,
    "q_lake_merge" -> qLakeMergeSql,
    "q_lake_changefeed" -> qLakeChangefeedSql,
    "q_lake_feed_stream" -> qLakeFeedStreamSql,
    "q_lake_schema_evo" -> qLakeSchemaEvoSql,
    "q_lake_schema_map" -> qLakeSchemaMapSql,
    "q_lake_partitioned" -> qLakePartitionedSql,
    "q_lake_zorder" -> qLakeZorderSql,
    "q_lake_zorder_str" -> qLakeZorderStrSql,
    "q_lake_restore" -> qLakeRestoreSql,
    "q_lake_clone" -> qLakeCloneSql,
    "q_lake_dv" -> qLakeDvSql,
    "q_lake_rowcount" -> qLakeRowcountSql,
    "q_lake_update" -> qLakeUpdateSql,
    "q_lake_update_mor" -> qLakeUpdateMorSql,
    "q_lake_merge_mor" -> qLakeMergeMorSql,
    "q_lake_dml_pruned" -> qLakeDmlPrunedSql,
    "q_lake_source" -> qLakeSourceSql,
    "q_lake_stream_source" -> qLakeStreamSourceSql,
    "q_lake_wap" -> qLakeWapSql,
    "q_lake_zorder_inc" -> qLakeZorderIncSql,
    "q_lake_part_source" -> qLakePartSourceSql,
    "q_lake_bloom" -> qLakeBloomSql,
    "q_lake_catalog" -> qLakeCatalogSql,
    "q_lake_sql_dml" -> qLakeSqlDmlSql,
    "q_lake_compat" -> qLakeCompatSql,
    "q_lake_cdf_stream" -> qLakeCdfStreamSql,
    "q_lake_part_stream" -> qLakePartStreamSql,
    "q_lake_meta_agg" -> qLakeMetaAggSql,
    "q_lake_meta_agg_filtered" -> qLakeMetaAggFilteredSql,
    "q_lake_ts_stats" -> qLakeTsStatsSql,
    "q_lake_hidden_part" -> qLakeHiddenPartSql,
    "q_lake_hidden_mor" -> qLakeHiddenMorSql,
    "q_lake_catalog_part" -> qLakeCatalogPartSql)
}
