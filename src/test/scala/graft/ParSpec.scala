package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Par, Snapshots}

/** r15 optimization internals: the bounded-pool overlap helper and the
  * fused merge probes must preserve the sequential semantics they
  * replaced — result order, exception transparency, and the
  * duplicate-key refusal that now rides the counts aggregate. */
class ParSpec extends GraftSuite {

  test("Par.map returns results in item order, not completion order") {
    val items = (1 to 20).toVector
    val out = Par.map(spark, items) { i =>
      // later items finish first
      Thread.sleep((21 - i) * 2L); i * 10
    }
    assert(out == items.map(_ * 10))
  }

  test("Par.map rethrows the body's own exception unwrapped") {
    val e = intercept[IllegalArgumentException] {
      Par.map(spark, Seq(1, 2, 3)) { i =>
        require(i != 2, s"refused item $i"); i
      }
    }
    assert(e.getMessage.contains("refused item 2"))
  }

  test("Par.map degenerates to sequential map for single items") {
    assert(Par.map(spark, Seq(7))(_ + 1) == Seq(8))
    assert(Par.map(spark, Seq.empty[Int])(_ + 1).isEmpty)
  }

  test("MoR merge still refuses a duplicate-keyed source (fused probe)") {
    val dir =
      java.nio.file.Files.createTempDirectory("par_dup").toString + "/t"
    import spark.implicits._
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "p")
      .write.parquet(dir)
    Snapshots.init(spark, dir)
    val dup = Seq((1L, "x", 9.0), (1L, "y", 8.0)).toDF("k", "s", "p")
    val e = intercept[IllegalArgumentException] {
      Snapshots.mergeVersionedDV(spark, dir, dup, Seq("k"), None)
    }
    assert(e.getMessage.contains("duplicate 'k' keys"))
    // and the refusal staged nothing: the table is still at v0
    assert(Snapshots.currentVersion(dir) == 0)
  }
}
