package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** A56 — MULTI-TABLE ATOMIC TRANSACTIONS, the lakehouse capability
  * neither Delta nor Iceberg ships (both are single-table): commit
  * related changes to N versioned tables so that EVERY observer — live
  * writer, crashed-and-recovered reader, replayed coordinator — sees
  * all of them or none of them.
  *
  * The protocol composes three primitives this engine already has:
  *
  *  1. PREPARE — [[begin]] cuts a WAP branch (A37) per table; the
  *     caller stages arbitrary [[Snapshots]] writes on the branch
  *     paths. Branches are zero-copy and disposable: a transaction
  *     abandoned here costs nothing and fences nothing beyond a TTL.
  *  2. DECIDE — [[commit]] acquires a publish FENCE per table (every
  *     other committer on the table throws, retryably, while it is
  *     live), verifies under the fence that no table's main moved past
  *     its branch base (the OCC check — conflicts refuse BEFORE the
  *     point of no return), HARDENS the fences (no expiry), and then
  *     writes the coordinator's COMMIT record with an atomic rename.
  *     That single rename IS the transaction's serialization point.
  *  3. REDO — each branch publishes onto its main as a fast-forward
  *     commit CARRYING THE TRANSACTION's A51 mark. The mark makes the
  *     redo idempotent: [[recover]] re-publishes only tables whose
  *     mark is absent, so a coordinator crash anywhere between the
  *     COMMIT record and the last publish completes to the SAME state
  *     on replay — and the hardened fence guarantees no independent
  *     commit can invade the half-published window, so the redo's
  *     fast-forward precondition cannot be lost. A `.done` record,
  *     fence release, and branch cleanup close the transaction.
  *
  * Readers: each table alone is always a consistent snapshot (its own
  * log). Cross-table, [[readConsistent]] first completes any pending
  * redo and then resolves all heads inside a double-checked
  * coordinator fingerprint — if any transaction commits or finalizes
  * between the two checks it retries, so the returned set of versions
  * never straddles a transaction. At 100 TB the whole protocol is
  * metadata: fences and records are single tiny files, publishes are
  * hard-link fast-forwards, and the staged data bytes were already
  * written on the branches before DECIDE.
  */
object GraftTxn {

  final case class Handle(id: String, coordDir: String,
      tables: Seq[String], branches: Map[String, String],
      bases: Map[String, Int]) {
    /** The path to stage this transaction's writes for `table`. */
    def branchOf(table: String): String = branches(table)
  }

  private def appOf(id: String): String = s"graft-txn@$id"
  private def branchName(id: String): String = s"txn_$id"
  private def commitRecord(coordDir: String, id: String): Path =
    Paths.get(coordDir, s"$id.commit")
  private def doneRecord(coordDir: String, id: String): Path =
    Paths.get(coordDir, s"$id.done")
  // Intent record written BEFORE the fences are hardened. DECIDE is the
  // atomic rename prepare→commit, so a coordinator that crashes between
  // hardening and deciding leaves a .prepare with no .commit —
  // recover() can then ABORT it (claim the .prepare by renaming it to
  // .aborted, release the hardened fences, drop the branches). Exactly
  // one of {coordinator decide, recover abort} wins the rename race on
  // the same file, so a live coordinator can never be half-aborted.
  private def prepareRecord(coordDir: String, id: String): Path =
    Paths.get(coordDir, s"$id.prepare")
  private def abortedRecord(coordDir: String, id: String): Path =
    Paths.get(coordDir, s"$id.aborted")

  /** Cut a branch per table at its current head. `id` must be unique
    * per transaction (and a valid branch name: word chars, dots,
    * dashes). */
  def begin(spark: SparkSession, coordDir: String, tables: Seq[String],
      id: String): Handle = {
    require(tables.nonEmpty, "txn: no tables")
    require(tables.distinct.size == tables.size, "txn: duplicate table")
    require(!id.contains("\t") && !id.contains("\n") && id.nonEmpty,
      s"txn: bad id '$id'")
    Files.createDirectories(Paths.get(coordDir))
    require(!Files.exists(commitRecord(coordDir, id)) &&
      !Files.exists(doneRecord(coordDir, id)), s"txn '$id' already used")
    val branches = tables.map { t =>
      t -> Refs.createBranch(spark, t, branchName(id))
    }.toMap
    // bases from the branches' OWN recorded cut points — reading
    // main's head separately would race a commit landing between the
    // cut and the read, making the OCC check pass while the publish
    // precondition is already lost (a permanent post-DECIDE wedge)
    val bases = tables.map(t =>
      t -> Refs.branchBase(t, branchName(id))).toMap
    Handle(id, coordDir, tables, branches, bases)
  }

  /** DECIDE + REDO. `fenceTtlMillis` bounds how long a crash BEFORE
    * the COMMIT record can block other writers; after the record the
    * fences are hardened and only [[recover]] clears them.
    * `beforePublish` is a crash-test seam invoked with each table's
    * index just before its publish. Throws (and releases every fence)
    * if any table's main advanced past its branch base — the caller
    * aborts or replays on fresh branches. */
  def commit(spark: SparkSession, h: Handle,
      fenceTtlMillis: Long = 60000L,
      beforePublish: Int => Unit = _ => ()): Unit = {
    val app = appOf(h.id)
    // fences in sorted order (no deadlock between concurrent txns)
    val ordered = h.tables.sorted
    val acquired = scala.collection.mutable.ListBuffer.empty[String]
    try {
      ordered.foreach { t =>
        Snapshots.acquireFence(t, app, fenceTtlMillis); acquired += t
      }
      // OCC under the fence: every main must still be at its base, and
      // every branch must be publishable (no DVs) — refuse BEFORE the
      // point of no return
      h.tables.foreach { t =>
        val now = Snapshots.currentVersion(t)
        if (now != h.bases(t)) throw new java.util.ConcurrentModificationException(
          s"txn '${h.id}': $t advanced v${h.bases(t)} -> v$now since " +
            "begin; abort and replay on fresh branches")
        val b = h.branches(t)
        val bv = Snapshots.currentVersion(b)
        require(Snapshots.dvFiles(b, bv).isEmpty,
          s"txn '${h.id}': branch of $t carries deletion vectors; " +
            "reconcile on the branch first")
      }
      // intent record BEFORE hardening: without it, a crash between
      // hardenFence (expiry = ∞) and the COMMIT-record rename would
      // fence every table forever — recover() had nothing to find
      val ptmp = Files.createTempFile(Paths.get(h.coordDir), h.id, ".tmp")
      Files.write(ptmp, h.tables.map(t =>
        s"${Paths.get(t).toAbsolutePath.normalize}\t${branchName(h.id)}\t${h.bases(t)}")
        .mkString("\n").getBytes("UTF-8"))
      Files.move(ptmp, prepareRecord(h.coordDir, h.id),
        StandardCopyOption.ATOMIC_MOVE)
      ordered.foreach(t => Snapshots.hardenFence(t, app))
    } catch { case e: Throwable =>
      acquired.foreach(t => Snapshots.releaseFence(t, app))
      Files.deleteIfExists(prepareRecord(h.coordDir, h.id))
      throw e
    }
    // the serialization point: one atomic rename of the SAME file a
    // concurrent recover() would claim to abort us — exactly one wins
    try Files.move(prepareRecord(h.coordDir, h.id),
      commitRecord(h.coordDir, h.id), StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.NoSuchFileException =>
      // a recover() judged this coordinator dead and aborted the txn:
      // fences are (being) released and branches dropped over there —
      // surface it as the retryable refusal it is
      throw new java.util.ConcurrentModificationException(
        s"txn '${h.id}' was aborted by recover() before it decided " +
          "(prepare record claimed); replay on fresh branches")
    }
    redo(spark, h.coordDir, h.id,
      h.tables.map(t => Paths.get(t).toAbsolutePath.normalize.toString),
      beforePublish)
  }

  /** The idempotent redo: publish every table whose head does not yet
    * carry the transaction's mark, then finalize and clean up. */
  private def redo(spark: SparkSession, coordDir: String, id: String,
      tables: Seq[String], beforePublish: Int => Unit): Unit = {
    val app = appOf(id)
    tables.zipWithIndex.foreach { case (t, i) =>
      // a crashed earlier attempt may have lost its fence to the TTL
      // only BEFORE hardening; post-COMMIT fences are hardened, so
      // re-acquiring here is a no-op refresh for the same owner
      Snapshots.acquireFence(t, app, Long.MaxValue / 2)
      Snapshots.hardenFence(t, app)
      if (Snapshots.txnVersionOf(t, app).isEmpty) {
        beforePublish(i)
        Refs.publish(spark, t, branchName(id), txnSet = Some((app, 1L)))
      }
    }
    val tmp = Files.createTempFile(Paths.get(coordDir), id, ".tmp")
    Files.write(tmp, "done".getBytes("UTF-8"))
    try Files.move(tmp, doneRecord(coordDir, id),
      StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp) } // a racing recover finalized first
    tables.foreach { t =>
      Snapshots.releaseFence(t, appOf(id))
      try Refs.dropBranch(t, branchName(id))
      catch { case _: Exception => () } // already dropped by a racer
    }
    // retire the record (the .done stub stays: audit + id-reuse guard)
    Files.deleteIfExists(commitRecord(coordDir, id))
  }

  /** Abandon a transaction that has NOT reached its COMMIT record:
    * drop the branches, release any pre-COMMIT fences. (A transaction
    * whose COMMIT record exists cannot abort — complete it with
    * [[recover]]; that is what the record means.) */
  def abort(spark: SparkSession, h: Handle): Unit = {
    require(!Files.exists(commitRecord(h.coordDir, h.id)),
      s"txn '${h.id}' already decided COMMIT — run recover(), not abort")
    Files.deleteIfExists(prepareRecord(h.coordDir, h.id))
    h.tables.foreach { t =>
      Snapshots.releaseFence(t, appOf(h.id))
      try Refs.dropBranch(t, branchName(h.id))
      catch { case _: Exception => () }
    }
  }

  private def listNames(dir: String): IndexedSeq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return IndexedSeq.empty
    val s = Files.list(d)
    try s.iterator.asScala.map(_.getFileName.toString).toIndexedSeq
    finally s.close()
  }

  /** Transactions with a COMMIT record but no `.done`. */
  def pending(coordDir: String): Seq[String] = {
    val names = listNames(coordDir)
    names.filter(_.endsWith(".commit")).map(_.stripSuffix(".commit"))
      .filterNot(id => names.contains(s"$id.done")).sorted
  }

  /** Complete every pending transaction's redo (idempotent — safe to
    * run from any process at any time), and HEAL finalized-but-unclean
    * ones: a crash between the `.done` rename and the fence-release
    * loop leaves hardened fences no pending record points at — without
    * this sweep those tables would be fenced forever (the one wedge
    * the redo alone cannot clear). Returns how many redos finished. */
  def recover(spark: SparkSession, coordDir: String,
      prepareGraceMillis: Long = 60000L): Int = {
    def tablesOf(id: String): Seq[String] =
      Files.readAllLines(commitRecord(coordDir, id)).asScala
        .filter(_.nonEmpty).map(_.split("\t")(0)).toIndexedSeq
    // ABORT sweep for prepared-but-undecided transactions: a .prepare
    // with no .commit means the coordinator died (or is about to
    // decide) between hardening its fences and the decide rename —
    // without this sweep those hardened fences never expire and the
    // tables are wedged forever. The grace period keeps a LIVE
    // coordinator (prepare→decide is milliseconds) out of reach, and
    // the claim itself is the same atomic rename the coordinator's
    // decide uses, so even a mistimed sweep loses the race cleanly.
    val now = System.currentTimeMillis()
    listNames(coordDir).filter(_.endsWith(".prepare"))
      .map(_.stripSuffix(".prepare"))
      .foreach { id =>
        val p = prepareRecord(coordDir, id)
        val stale =
          try Files.getLastModifiedTime(p).toMillis + prepareGraceMillis < now
          catch { case _: Exception => false } // decided while listing
        if (stale) {
          val tables =
            try Files.readAllLines(p).asScala.filter(_.nonEmpty)
              .map(_.split("\t")(0)).toIndexedSeq
            catch { case _: Exception => IndexedSeq.empty[String] }
          val claimed =
            try { Files.move(p, abortedRecord(coordDir, id),
              StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING); true }
            catch { case _: Exception => false } // coordinator decided
          if (claimed) tables.foreach { t =>
            Snapshots.releaseFence(t, appOf(id))
            try Refs.dropBranch(t, branchName(id))
            catch { case _: Exception => () }
          }
        }
      }
    val ids = pending(coordDir)
    ids.foreach(id => redo(spark, coordDir, id, tablesOf(id), _ => ()))
    // finalized sweep: release any fence still owned by a done txn,
    // drop any branch its crash left behind (both idempotent) — then
    // retire the `.commit` record so the sweep stays O(unswept), not
    // O(coordinator history); the `.done` stub remains as the audit
    // trail and keeps begin() refusing id reuse
    val names = listNames(coordDir)
    names.filter(_.endsWith(".done")).map(_.stripSuffix(".done"))
      .filter(id => names.contains(s"$id.commit"))
      .foreach { id =>
        tablesOf(id).foreach { t =>
          Snapshots.releaseFence(t, appOf(id))
          try Refs.dropBranch(t, branchName(id))
          catch { case _: Exception => () }
        }
        Files.deleteIfExists(commitRecord(coordDir, id))
      }
    ids.size
  }

  /** Pin one version per table such that the pinned set never
    * straddles a transaction: completes pending redos, then resolves
    * all heads inside a double-checked coordinator fingerprint. The
    * SQL surface (`GRAFT PIN CONSISTENT`) returns these pins for the
    * caller to read with `versionAsOf`; [[readConsistent]] wraps them
    * as DataFrames directly. */
  def pinConsistent(spark: SparkSession, coordDir: String,
      tables: Seq[String]): Map[String, Int] = {
    def fingerprint(): Set[String] =
      listNames(coordDir).filterNot(_.endsWith(".tmp")).toSet
    var attempts = 0
    while (attempts < 20) {
      recover(spark, coordDir)
      val before = fingerprint()
      val vs = tables.map(t => t -> Snapshots.currentVersion(t))
      if (fingerprint() == before && pending(coordDir).isEmpty)
        return vs.toMap
      attempts += 1
    }
    throw new IllegalStateException(
      s"pinConsistent: coordinator $coordDir would not quiesce")
  }

  /** Cross-table consistent read: [[pinConsistent]], materialized. */
  def readConsistent(spark: SparkSession, coordDir: String,
      tables: Seq[String]): Map[String, DataFrame] =
    pinConsistent(spark, coordDir, tables).map { case (t, v) =>
      t -> Snapshots.read(spark, t, v)
    }

  // ── SQL surface (A32 parser routes here): BEGIN/COMMIT/ABORT need a
  // live Handle between statements, so the session's JVM keeps them —
  // the same lifetime as the in-memory Handle the API caller holds. A
  // txn begun over SQL and lost to a crash is exactly an API txn lost
  // to a crash: fences TTL out pre-DECIDE, recover() finishes or
  // aborts the rest.
  private val sqlHandles =
    new java.util.concurrent.ConcurrentHashMap[String, Handle]()

  /** `GRAFT BEGIN TRANSACTION '<id>' AT '<coord>' ON (…)`. Returns the
    * per-table staging branches. */
  def beginSql(spark: SparkSession, coordDir: String,
      tables: Seq[String], id: String): Handle = {
    require(!sqlHandles.containsKey(id),
      s"txn '$id' is already open in this session")
    val h = begin(spark, coordDir, tables, id)
    sqlHandles.put(id, h)
    h
  }

  private def takeHandle(id: String): Handle = {
    val h = sqlHandles.remove(id)
    require(h != null, s"txn '$id' is not open in this session — a " +
      "crashed transaction is finished (or aborted) by GRAFT RECOVER " +
      "on its coordinator, not by COMMIT/ABORT")
    h
  }

  def commitSql(spark: SparkSession, id: String): Unit = {
    val h = takeHandle(id)
    try commit(spark, h)
    catch { case e: Throwable => sqlHandles.put(id, h); throw e }
  }

  def abortSql(spark: SparkSession, id: String): Unit =
    abort(spark, takeHandle(id))

  /** The open handle (SQL-session registry), if any — `GRAFT DESCRIBE
    * TRANSACTION` reads it. */
  def openHandle(id: String): Option[Handle] = Option(sqlHandles.get(id))
}
