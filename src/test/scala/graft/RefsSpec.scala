package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{Refs, Snapshots}

/** A37 — tags and write-audit-publish branches over the snapshot log. */
class RefsSpec extends GraftSuite {

  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_refs_spec").toString + "/t"
    (1L to 100L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "gen")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    dir
  }

  test("tags: immutable named versions that vacuum pins until dropped") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Snapshots.deleteVersioned(spark, dir, col("k") <= 10L) // v1
    Refs.tag(dir, "release-1") // pins v1
    Snapshots.mergeVersioned(spark, dir,
      Seq((200L, "NEW", 1L)).toDF("k", "payload", "gen"), "k") // v2
    Snapshots.mergeVersioned(spark, dir,
      Seq((201L, "NEW2", 1L)).toDF("k", "payload", "gen"), "k") // v3

    // immutability + ergonomics
    intercept[IllegalArgumentException] { Refs.tag(dir, "release-1", 3) }
    assert(Refs.tags(dir) == Map("release-1" -> 1))
    assert(Refs.readTag(spark, dir, "release-1").count() == 90)

    // vacuum keeps only [3..] — EXCEPT the tagged v1, which survives
    // with its files; untagged v0 and v2 manifests are gone
    Snapshots.vacuum(dir, keepFrom = 3)
    assert(!Snapshots.hasVersion(dir, 0) && !Snapshots.hasVersion(dir, 2))
    assert(Snapshots.hasVersion(dir, 1))
    assert(Refs.readTag(spark, dir, "release-1").count() == 90)
    assert(Snapshots.read(spark, dir).count() == 92)

    // dropping the tag releases the pin: the next vacuum reclaims v1
    Refs.dropTag(dir, "release-1")
    Snapshots.vacuum(dir, keepFrom = 3)
    assert(!Snapshots.hasVersion(dir, 1))
    assert(Snapshots.read(spark, dir).count() == 92)
  }

  test("branch WAP: stage on a branch, audit, publish atomically, drop safely") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir) // main v0
    val bdir = Refs.createBranch(spark, dir, "backfill")

    // stage two commits ON THE BRANCH: an upsert wave and a delete
    Snapshots.mergeVersioned(spark, bdir,
      Seq((5L, "B5", 9L), (500L, "B500", 9L)).toDF("k", "payload", "gen"), "k")
    Snapshots.deleteVersioned(spark, bdir, col("k") === 60L)

    // audit: the branch read shows the staged state; MAIN is untouched
    assert(Snapshots.read(spark, bdir).count() == 100) // 100 +1 -1
    assert(Snapshots.read(spark, dir).count() == 100)
    assert(Snapshots.read(spark, dir).filter(col("k") === 5L)
      .select("payload").head().getString(0) == "v5")
    assert(Snapshots.currentVersion(dir) == 0)

    // publish: one main commit, bit-identical to the branch head
    val v1 = Refs.publish(spark, dir, "backfill")
    assert(v1 == 1)
    val main = Snapshots.read(spark, dir)
    assert(main.count() == 100)
    assert(main.filter(col("k") === 5L).select("payload").head().getString(0) == "B5")
    assert(main.filter(col("k") === 500L).count() == 1)
    assert(main.filter(col("k") === 60L).isEmpty)
    // time travel past the publish is intact
    assert(Snapshots.read(spark, dir, 0).filter(col("k") === 60L).count() == 1)
    // the feed across the publish is exactly the branch's net changes
    val ch = Snapshots.changesBetween(spark, dir, 0, 1, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ch == Map(5L -> "update", 500L -> "insert", 60L -> "delete"), s"feed: $ch")
    // manifest stats carried under the linked paths: metadata-only
    // count and a stats-pruned range read both work on the new head
    assert(Snapshots.rowCount(spark, dir).contains(100L))
    assert(Snapshots.readPrunedRange(spark, dir, "k", 1L, 10L).count() == 10)

    // dropping the branch deletes its tree; main keeps every byte
    // (published files were hard-linked under main's root)
    Refs.dropBranch(dir, "backfill")
    assert(!Files.isDirectory(Paths.get(bdir)))
    assert(Refs.tags(dir).isEmpty) // the auto base tag is released
    assert(Snapshots.read(spark, dir).count() == 100)
    assert(Snapshots.read(spark, dir).filter(col("k") === 500L).count() == 1)
  }

  test("branch WAP: conflicts refuse — main advanced, or DVs on the branch head") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir)
    Refs.createBranch(spark, dir, "risky")
    Snapshots.mergeVersioned(spark, Refs.branchPath(dir, "risky"),
      Seq((7L, "B7", 9L)).toDF("k", "payload", "gen"), "k")

    // a main commit after the cut: publish must refuse, not clobber
    Snapshots.mergeVersioned(spark, dir,
      Seq((300L, "MAIN", 1L)).toDF("k", "payload", "gen"), "k") // main v1
    val e = intercept[IllegalArgumentException] { Refs.publish(spark, dir, "risky") }
    assert(e.getMessage.contains("publish conflict"))
    assert(Snapshots.read(spark, dir).filter(col("k") === 300L).count() == 1)
    Refs.dropBranch(dir, "risky")

    // DVs on the branch head refuse until reconciled on the branch
    val b2 = Refs.createBranch(spark, dir, "dv")
    Snapshots.deleteVersionedDV(spark, b2, col("k") === 3L)
    val e2 = intercept[IllegalArgumentException] { Refs.publish(spark, dir, "dv") }
    assert(e2.getMessage.contains("deletion vectors"))
    Snapshots.reconcileDV(spark, b2)
    val v = Refs.publish(spark, dir, "dv")
    assert(Snapshots.read(spark, dir, v).filter(col("k") === 3L).isEmpty)
    assert(Snapshots.read(spark, dir, v).count() == 100) // 101 - 1
  }

  test("branch base is vacuum-pinned while the branch lives") {
    import spark.implicits._
    val dir = freshTable()
    Snapshots.init(spark, dir) // v0
    Refs.createBranch(spark, dir, "slow") // base v0, auto tag branch.slow
    Snapshots.mergeVersioned(spark, dir,
      Seq((400L, "M", 1L)).toDF("k", "payload", "gen"), "k") // v1
    Snapshots.deleteVersioned(spark, dir, col("k") <= 50L) // v2

    // vacuum to the head only: v0's manifest AND its files must
    // survive (the branch borrows them), so the branch still audits
    Snapshots.vacuum(dir, keepFrom = 2)
    assert(Snapshots.hasVersion(dir, 0))
    assert(Snapshots.read(spark, Refs.branchPath(dir, "slow")).count() == 100)

    // dropping the branch releases the pin; the next vacuum reclaims
    Refs.dropBranch(dir, "slow")
    Snapshots.vacuum(dir, keepFrom = 2)
    assert(!Snapshots.hasVersion(dir, 0))
    assert(Snapshots.read(spark, dir).count() == 51)
  }

  test("publish remaps bloom sidecars and cluster markers — skipping survives WAP") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_refs_skip").toString + "/t"
    // u is scattered vs the k-range layout — the bloom's case
    spark.range(20000)
      .selectExpr("id AS k", "(id * 2654435761) % 1000003 AS u", "id % 7 AS gen")
      .repartitionByRange(8, col("k")).write.parquet(dir)
    Snapshots.init(spark, dir) // v0
    Snapshots.addBloomIndex(spark, dir, "u") // v1
    Snapshots.compactZOrder(spark, dir, "k", "gen", 8) // v2: clustered
    Snapshots.reindexBloom(spark, dir) // v3: zorder outputs re-indexed
    val clusteredBefore = Snapshots.clusterStateOf(dir, 3).get._2.size
    assert(clusteredBefore > 0)

    // branch: stage new rows (auto-indexed on the branch — the clone
    // carries the bloom property), then publish
    Refs.createBranch(spark, dir, "ingest")
    val bdir = Refs.branchPath(dir, "ingest")
    Snapshots.mergeVersioned(spark, bdir,
      Seq((70000L, 424243L, 1L), (70001L, 525253L, 2L)).toDF("k", "u", "gen"),
      "k")
    assert(Snapshots.bloomIdxFiles(bdir, Snapshots.currentVersion(bdir))
      .exists(r => Snapshots.canonical(r).contains("_graft_branches")),
      "branch merge did not auto-index its staged files")
    val vPub = Refs.publish(spark, dir, "ingest")
    Refs.dropBranch(dir, "ingest")

    // THE pin: post-publish point lookups still SKIP files — including
    // for a value that lives only in the published (remapped) files
    def lookupFiles(value: Long): (Long, Long) = {
      val res = Snapshots.readPointLookup(spark, dir, "u", value)
      (res.count(), res.select(input_file_name()).distinct().count())
    }
    val total = Snapshots.liveFiles(dir, vPub).size
    val present = (123L * 2654435761L) % 1000003L
    val (n1, f1) = lookupFiles(present)
    assert(n1 >= 1 && f1 < total.toLong,
      s"pre-existing value: $f1 of $total files scanned (no skipping)")
    val (n2, f2) = lookupFiles(424243L)
    assert(n2 == 1 && f2 <= 2,
      s"published value: $f2 files scanned — branch sidecar went inert")
    assert(lookupFiles(999999937L)._1 == 0)

    // cluster markers survived the remap: the still-live clustered set
    // is intact, so incremental ZORDER re-clusters ONLY the published
    // tail instead of the whole table
    val (cols, clustered) = Snapshots.clusterStateOf(dir, vPub).get
    assert(cols == Seq("k", "gen"))
    assert(clustered.size == clusteredBefore,
      s"publish lost cluster markers: $clusteredBefore -> ${clustered.size}")
    val before = Snapshots.liveFiles(dir, vPub).map(Snapshots.canonical).toSet
    Snapshots.compactZOrderIncremental(spark, dir)
    val after = Snapshots.liveFiles(dir, Snapshots.currentVersion(dir))
      .map(Snapshots.canonical).toSet
    assert(clustered.forall(after.contains),
      "incremental ZORDER rewrote already-clustered files after publish")
    assert((before -- after).nonEmpty, "the published tail was not re-clustered")
  }
}
