package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{CommitStore, CommitStores, LocalCommitStore, Snapshots}

/** r13 — the pluggable commit store (the S3 story): every OCC property
  * the lake relies on must derive ONLY from the two CommitStore
  * contracts (putIfAbsent CAS + atomic replace), never from POSIX
  * specifics. Proven by running the DML surface and an OCC race over a
  * deliberately primitive store (lock + exists + plain write) and by
  * injecting spurious CAS losses.
  */
class CommitStoreSpec extends GraftSuite {

  /** Honors ONLY the contract — a coordinator-style store (what an
    * S3+DynamoDB LogStore reduces to): mutual exclusion via one global
    * lock, no hard links, no atomic rename for the CAS path. */
  private object PrimitiveStore extends CommitStore {
    val putCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    private val lock = new Object
    override def putIfAbsent(t: Path, c: Array[Byte]): Boolean =
      lock.synchronized {
        putCalls.incrementAndGet()
        if (Files.exists(t)) false
        else { Files.write(t, c); true }
      }
    override def replace(t: Path, c: Array[Byte]): Unit =
      lock.synchronized {
        val tmp = Files.createTempFile(t.getParent, "prim", ".tmp")
        Files.write(tmp, c)
        Files.move(tmp, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    override def delete(t: Path): Unit =
      lock.synchronized { Files.deleteIfExists(t); () }
  }

  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cstore").toString + "/t"
    (1L to 100L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "gen")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    dir
  }

  test("whole DML surface over a contract-only store: merge, delete, " +
      "MoR upsert, checkpoint, reconcile, compact, time travel") {
    import spark.implicits._
    CommitStores.withStore(PrimitiveStore) {
      val before = PrimitiveStore.putCalls.get()
      val dir = freshTable()
      Snapshots.init(spark, dir) // v0
      Snapshots.mergeVersioned(spark, dir,
        Seq((10L, "U10", 1L), (200L, "N200", 1L)).toDF("k", "payload", "gen"),
        "k") // v1
      Snapshots.deleteVersioned(spark, dir, col("k") === 5L) // v2
      Snapshots.mergeVersionedDV(spark, dir,
        Seq((20L, "U20", 2L)).toDF("k", "payload", "gen"), "k") // v3 MoR
      assert(Snapshots.dvFiles(dir, 3).nonEmpty)
      val v4 = Snapshots.reconcileDV(spark, dir)
      assert(v4 == 4 && Snapshots.dvFiles(dir, 4).isEmpty)
      Snapshots.compact(spark, dir, targetBytes = 1L << 20) // v5 (layout)
      Snapshots.checkpoint(dir) // materialize through replace()
      val now = Snapshots.read(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(now.size == 100) // 100 - 1 delete + 1 insert
      assert(now(10L) == "U10" && now(20L) == "U20" && now(200L) == "N200")
      assert(!now.contains(5L))
      // time travel unaffected: v0 still serves the original content
      assert(Snapshots.read(spark, dir, 0).count() == 100)
      assert(Snapshots.read(spark, dir, 0).filter(col("k") === 5L).count() == 1)
      // every manifest in this block was in fact published by the
      // injected store, not by a leaked POSIX path
      assert(PrimitiveStore.putCalls.get() - before >= 6,
        "the injected store saw fewer CAS publishes than versions committed")
    }
  }

  test("spurious CAS losses: the OCC merge retries through the store " +
      "and lands exactly one version") {
    import spark.implicits._
    class FlakyStore(loseFirst: Int) extends CommitStore {
      private val losses = new java.util.concurrent.atomic.AtomicInteger(0)
      override def putIfAbsent(t: Path, c: Array[Byte]): Boolean =
        if (t.getFileName.toString.endsWith(".manifest") &&
            losses.getAndIncrement() < loseFirst) false
        else LocalCommitStore.putIfAbsent(t, c)
      override def replace(t: Path, c: Array[Byte]): Unit =
        LocalCommitStore.replace(t, c)
      override def delete(t: Path): Unit = LocalCommitStore.delete(t)
    }
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0, real store
    CommitStores.withStore(new FlakyStore(3)) {
      val v = Snapshots.mergeVersioned(spark, dir,
        Seq((10L, "X", 9L)).toDF("k", "payload", "gen"), "k")
      assert(v == 1, s"expected exactly one committed version, got $v")
    }
    assert(Snapshots.currentVersion(dir) == 1)
    assert(Snapshots.read(spark, dir).filter(col("k") === 10L)
      .head().getString(1) == "X")
    // losses beyond the retry budget surface loudly, nothing committed
    CommitStores.withStore(new FlakyStore(100)) {
      intercept[java.util.ConcurrentModificationException] {
        Snapshots.mergeVersioned(spark, dir,
          Seq((11L, "Y", 9L)).toDF("k", "payload", "gen"), "k")
      }
    }
    assert(Snapshots.currentVersion(dir) == 1,
      "a refused merge must not leave a committed version")
  }

  test("OCC stress over the contract-only store: racing merges of " +
      "disjoint keys all land, exactly once each") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir)
    CommitStores.withStore(PrimitiveStore) {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          try Snapshots.mergeVersionedOCC(spark, dir,
            Seq((1000L + i, s"W$i", 9L)).toDF("k", "payload", "gen"), Seq("k"),
            maxRetries = 20, beforeCommit = () => ())
          catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(180000))
      if (!errs.isEmpty) {
        errs.forEach(_.printStackTrace())
        fail(s"${errs.size} racing merges failed; first: ${errs.peek}")
      }
    }
    // one version per winner, no lost updates, no duplicates
    assert(Snapshots.currentVersion(dir) == 4)
    val rows = Snapshots.read(spark, dir).filter(col("k") >= 1000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == (0 until 4).map(i => (1000L + i) -> s"W$i").toMap)
    assert(Snapshots.read(spark, dir).count() == 104)
  }
}
