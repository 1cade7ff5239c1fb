package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.{GraftTxn, Snapshots}

/** A56 — multi-table atomic transactions: all-or-nothing visibility,
  * crash-recovery via the idempotent redo, the hardened publish fence,
  * OCC refusal before the point of no return, and the consistent
  * cross-table reader.
  */
class TxnMultiSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_txn").toString

  private def mkTable(n: Int): String = {
    import spark.implicits._
    val p = tmp()
    (1L to n).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "gen")
      .write.mode("overwrite").parquet(p)
    Snapshots.init(spark, p)
    p
  }

  private def stage(h: GraftTxn.Handle, t1: String, t2: String): Unit = {
    import spark.implicits._
    Snapshots.mergeVersioned(spark, h.branchOf(t1),
      Seq((1L, "UPDATED", 1L), (1000L, "NEW", 1L)).toDF("k", "payload", "gen"),
      "k")
    Snapshots.deleteVersioned(spark, h.branchOf(t2), col("k") <= 3L)
  }

  private def applied(t: String, dropped: Boolean): Boolean = {
    val df = Snapshots.read(spark, t)
    if (dropped) df.filter(col("k") <= 3L).isEmpty
    else df.filter(col("k") === 1000L).count() == 1 &&
      df.filter(col("k") === 1L && col("payload") === "UPDATED").count() == 1
  }

  test("happy path: both tables move in one transaction, then clean up") {
    val (t1, t2) = (mkTable(50), mkTable(50))
    val coord = tmp()
    val h = GraftTxn.begin(spark, coord, Seq(t1, t2), "tx-happy")
    stage(h, t1, t2)
    // staged but undecided: neither main sees anything
    assert(!applied(t1, dropped = false) && !applied(t2, dropped = true))
    GraftTxn.commit(spark, h)
    assert(applied(t1, dropped = false) && applied(t2, dropped = true))
    assert(GraftTxn.pending(coord).isEmpty)
    // fences released: an independent writer commits freely
    import spark.implicits._
    Snapshots.appendVersioned(spark, t1,
      Seq((2000L, "after", 2L)).toDF("k", "payload", "gen"))
    // branches dropped
    assert(!Files.isDirectory(
      Paths.get(graft.sources.Refs.branchPath(t1, "txn_tx-happy"))))
  }

  test("crash between publishes: fence holds, recover completes, " +
      "reader never sees a straddle") {
    val (t1, t2) = (mkTable(50), mkTable(50))
    val coord = tmp()
    val h = GraftTxn.begin(spark, coord, Seq(t1, t2), "tx-crash")
    stage(h, t1, t2)
    val boom = intercept[RuntimeException] {
      GraftTxn.commit(spark, h, beforePublish = i =>
        if (i == 1) throw new RuntimeException("crash before 2nd publish"))
    }
    assert(boom.getMessage.contains("crash"))
    // half-published: t1 moved, t2 not — the COMMIT record is pending
    assert(applied(t1, dropped = false) && !applied(t2, dropped = true))
    assert(GraftTxn.pending(coord) == Seq("tx-crash"))
    // the hardened fence blocks every independent commit on t2
    import spark.implicits._
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.appendVersioned(spark, t2,
        Seq((3000L, "invader", 9L)).toDF("k", "payload", "gen"))
    }
    // the consistent reader completes the redo and returns BOTH
    val views = GraftTxn.readConsistent(spark, coord, Seq(t1, t2))
    assert(views(t1).filter(col("k") === 1000L).count() == 1)
    assert(views(t2).filter(col("k") <= 3L).isEmpty)
    // recover is idempotent and everything is released
    assert(GraftTxn.recover(spark, coord) == 0)
    assert(GraftTxn.pending(coord).isEmpty)
    Snapshots.appendVersioned(spark, t2,
      Seq((3000L, "free", 9L)).toDF("k", "payload", "gen"))
  }

  test("abort before DECIDE leaves no trace and frees the tables") {
    val (t1, t2) = (mkTable(20), mkTable(20))
    val coord = tmp()
    val h = GraftTxn.begin(spark, coord, Seq(t1, t2), "tx-abort")
    stage(h, t1, t2)
    GraftTxn.abort(spark, h)
    assert(!applied(t1, dropped = false) && !applied(t2, dropped = true))
    assert(GraftTxn.pending(coord).isEmpty)
    // the same tables take a NEW transaction cleanly
    val h2 = GraftTxn.begin(spark, coord, Seq(t1, t2), "tx-after-abort")
    stage(h2, t1, t2)
    GraftTxn.commit(spark, h2)
    assert(applied(t1, dropped = false) && applied(t2, dropped = true))
  }

  test("OCC: an independent commit after begin() refuses the txn " +
      "BEFORE the point of no return, fences released") {
    import spark.implicits._
    val (t1, t2) = (mkTable(20), mkTable(20))
    val coord = tmp()
    val h = GraftTxn.begin(spark, coord, Seq(t1, t2), "tx-conflict")
    stage(h, t1, t2)
    Snapshots.appendVersioned(spark, t1,
      Seq((500L, "winner", 5L)).toDF("k", "payload", "gen"))
    intercept[java.util.ConcurrentModificationException] {
      GraftTxn.commit(spark, h)
    }
    // nothing decided, nothing published, nothing fenced
    assert(GraftTxn.pending(coord).isEmpty)
    assert(!applied(t2, dropped = true))
    Snapshots.appendVersioned(spark, t2,
      Seq((501L, "free", 5L)).toDF("k", "payload", "gen"))
    GraftTxn.abort(spark, h)
  }

  test("a pre-DECIDE fence EXPIRES: an abandoned begin frees the table") {
    import spark.implicits._
    val t1 = mkTable(10)
    // simulate an abandoned transaction that fenced but never decided
    Snapshots.acquireFence(t1, "graft-txn@tx-abandoned", ttlMillis = 60000L)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.appendVersioned(spark, t1,
        Seq((11L, "blocked", 1L)).toDF("k", "payload", "gen"))
    }
    // fast-forward the clock: the owner refreshes its own fence with a
    // negative TTL, leaving exactly what a lapsed TTL leaves
    Snapshots.acquireFence(t1, "graft-txn@tx-abandoned", ttlMillis = -1L)
    // expired: the next writer clears the stale fence and commits
    Snapshots.appendVersioned(spark, t1,
      Seq((11L, "free", 1L)).toDF("k", "payload", "gen"))
    assert(Snapshots.read(spark, t1).filter(col("k") === 11L).count() == 1)
  }

  test("recover() heals the done-but-unreleased wedge: hardened fence " +
      "with no pending record") {
    import spark.implicits._
    val t1 = mkTable(10)
    val coord = tmp()
    // simulate a crash BETWEEN the .done rename and the fence release:
    // hardened fence + both coordinator records, nothing pending
    Snapshots.acquireFence(t1, "graft-txn@tx-wedge", ttlMillis = 1000L)
    Snapshots.hardenFence(t1, "graft-txn@tx-wedge")
    Files.write(Paths.get(coord, "tx-wedge.commit"),
      s"$t1\ttxn_tx-wedge\t0".getBytes("UTF-8"))
    Files.write(Paths.get(coord, "tx-wedge.done"), "done".getBytes("UTF-8"))
    assert(GraftTxn.pending(coord).isEmpty) // the redo alone won't act
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.appendVersioned(spark, t1,
        Seq((11L, "blocked", 1L)).toDF("k", "payload", "gen"))
    }
    GraftTxn.recover(spark, coord) // the finalized sweep releases it
    Snapshots.appendVersioned(spark, t1,
      Seq((11L, "healed", 1L)).toDF("k", "payload", "gen"))
    assert(Snapshots.read(spark, t1).filter(col("k") === 11L).count() == 1)
  }

  test("crash between hardening and DECIDE: recover() aborts the " +
      "prepared-but-undecided txn and frees the hardened fences") {
    import spark.implicits._
    val (t1, t2) = (mkTable(20), mkTable(20))
    val coord = tmp()
    val h = GraftTxn.begin(spark, coord, Seq(t1, t2), "tx-prep")
    stage(h, t1, t2)
    // simulate the coordinator dying right after hardening: prepare
    // record on disk, fences hardened (expiry = ∞), NO commit record —
    // before the prepare-record fix this state was wedged forever
    // (recover() only looked at .commit/.done ids)
    val app = "graft-txn@tx-prep"
    Seq(t1, t2).foreach(t =>
      Snapshots.acquireFence(t, app, ttlMillis = 60000L))
    Files.write(Paths.get(coord, "tx-prep.prepare"),
      Seq(t1, t2).map(t =>
        s"${Paths.get(t).toAbsolutePath.normalize}\ttxn_tx-prep\t0")
        .mkString("\n").getBytes("UTF-8"))
    Seq(t1, t2).foreach(t => Snapshots.hardenFence(t, app))
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.appendVersioned(spark, t1,
        Seq((900L, "blocked", 9L)).toDF("k", "payload", "gen"))
    }
    assert(GraftTxn.pending(coord).isEmpty) // the redo alone cannot act
    // inside the grace period the sweep must NOT touch a possibly-live
    // coordinator about to decide
    GraftTxn.recover(spark, coord)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.appendVersioned(spark, t1,
        Seq((900L, "blocked", 9L)).toDF("k", "payload", "gen"))
    }
    assert(Files.exists(Paths.get(coord, "tx-prep.prepare")))
    // past the grace period: the sweep claims the prepare (= the abort
    // decision), releases the hardened fences, drops the branches
    GraftTxn.recover(spark, coord, prepareGraceMillis = -10000L)
    Snapshots.appendVersioned(spark, t1,
      Seq((900L, "free", 9L)).toDF("k", "payload", "gen"))
    Snapshots.appendVersioned(spark, t2,
      Seq((901L, "free", 9L)).toDF("k", "payload", "gen"))
    // aborted means aborted: the staged changes never became visible
    assert(!applied(t1, dropped = false) && !applied(t2, dropped = true))
    assert(Files.exists(Paths.get(coord, "tx-prep.aborted")))
    assert(!Files.exists(Paths.get(coord, "tx-prep.prepare")))
    // a late coordinator that wakes up and tries to decide is refused
    intercept[java.util.ConcurrentModificationException] {
      GraftTxn.commit(spark, h)
    }
  }

  test("the fence blocks independent writers DURING the redo window") {
    import spark.implicits._
    val (t1, t2) = (mkTable(20), mkTable(20))
    val coord = tmp()
    val h = GraftTxn.begin(spark, coord, Seq(t1, t2), "tx-fence")
    stage(h, t1, t2)
    var blocked = false
    GraftTxn.commit(spark, h, beforePublish = i => if (i == 0) {
      blocked = try {
        Snapshots.appendVersioned(spark, t2,
          Seq((700L, "mid", 7L)).toDF("k", "payload", "gen"))
        false
      } catch { case _: java.util.ConcurrentModificationException => true }
    })
    assert(blocked, "an independent append slipped inside the redo window")
    // after commit the same append is free
    Snapshots.appendVersioned(spark, t2,
      Seq((700L, "post", 7L)).toDF("k", "payload", "gen"))
    assert(applied(t1, dropped = false) && applied(t2, dropped = true))
  }
}
