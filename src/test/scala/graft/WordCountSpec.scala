package graft

import org.apache.spark.sql.functions._
import graft.operators.WordCount
import graft.functions.djb2

class WordCountSpec extends GraftSuite {
  import spark.implicits._

  test("tokenize matches istringstream semantics (runs of whitespace, no empties)") {
    val df = Seq("  a b\t\tc  ", "", "d  e").toDF("text")
    val words = WordCount.tokenize(df, "text").as[String].collect().sorted
    assert(words.sameElements(Array("a", "b", "c", "d", "e")))
  }

  test("wc_count total equals token count; counts are per-word exact") {
    val counts = WordCount.wcCount(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = WordCount.tokenize(Tables.documents(spark, sf), "text")
      .as[String].collect()
    assert(counts.values.sum == toks.length)
    val manual = toks.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    assert(counts == manual)
  }

  test("djb2 expression reproduces the reference recurrence (h*33+c, 64-bit wrap)") {
    // the reference folds `char` = SIGNED UTF-8 bytes — non-ASCII
    // words pin that (a code-point fold diverges on 'étape')
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(5381L)((h, b) => h * 33L + b)
    val words = Seq("hello", "a", "the", "zygote", "Zz9",
      "étape", "naïve", "日本語", "𝄞clef").toDF("w")
    val got = words.select(col("w"), djb2(col("w")).as("h")).collect()
    got.foreach(r => assert(r.getLong(1) == ref(r.getString(0)), r.getString(0)))
  }

  test("wc_partitions covers all words across <=16 reducer partitions") {
    val parts = WordCount.wcPartitions(spark, sf).collect()
    assert(parts.forall { r => val p = r.getAs[Long]("pid"); p >= 0 && p < 16 })
    val totalWords = parts.map(_.getAs[Long]("n_words")).sum
    assert(totalWords == WordCount.wcCount(spark, sf).count())
  }

  test("fromTextFiles reproduces the reference CLI surface on raw .txt files") {
    val dir = java.nio.file.Files.createTempDirectory("wc_txt")
    java.nio.file.Files.writeString(dir.resolve("1.txt"), "the cat sat\non the mat\n")
    java.nio.file.Files.writeString(dir.resolve("2.txt"), "the dog  ran\n")
    val counts = WordCount.fromTextFiles(spark,
      Seq(s"$dir/1.txt", s"$dir/2.txt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("the" -> 3L, "cat" -> 1L, "sat" -> 1L, "on" -> 1L,
      "mat" -> 1L, "dog" -> 1L, "ran" -> 1L))
  }

  test("writeCounts emits word:count lines, single-file and partitioned") {
    val dir = java.nio.file.Files.createTempDirectory("wc_sink").toString
    val counts = WordCount.wcCount(spark, sf)
    WordCount.writeCounts(counts, s"$dir/combined", numPartitions = 1)
    WordCount.writeCounts(counts, s"$dir/sharded", numPartitions = 4)
    val combined = spark.read.text(s"$dir/combined").as[String].collect()
    // the sharded sink is pid=N partition dirs; keep only the payload
    val sharded = spark.read.text(s"$dir/sharded").select("value").as[String].collect()
    assert(combined.sorted.sameElements(sharded.sorted))
    assert(combined.forall(_.matches("[^:]+:\\d+")))
    assert(combined.length == counts.count())
  }
}
