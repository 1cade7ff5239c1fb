package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.WordCount

/** Drop-in-replacement parity against the reference's OWN corpus and
  * committed ground truth: the .txt corpus under `/root/reference/files`
  * counted by the
  * reference engine into `combined_omp_wc.txt`
  * (omp_count_words.cpp:133-165 — one `word:count` line per distinct
  * word, unordered_map iteration order, so parity is MAP equality, not
  * line order). This is the first thing a real user of the reference
  * would check before switching engines.
  */
class ReferenceParitySpec extends GraftSuite {
  import spark.implicits._

  private val refDir = Paths.get("/root/reference")

  /** `word:count` lines where the word itself may contain ':' (the
    * corpus has tokens like "patter;:" ) — split on the LAST colon. */
  private def parseCounts(p: Path): Map[String, Long] =
    Files.readAllLines(p).asScala.iterator.filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf(':')
      line.substring(0, i) -> line.substring(i + 1).toLong
    }.toMap

  /** The reference engine reads raw bytes, so the UTF-8 BOM at the head
    * of 8 corpus files becomes part of the first word ("﻿Project",
    * "﻿The" — 8 occurrences total in combined_omp_wc.txt). Spark's
    * text source strips a leading BOM (the correct reading), so parity
    * is asserted against the ground truth with BOM-prefixed keys merged
    * into their plain forms. Every other word must match bit-for-bit.
    */
  private def mergeBom(m: Map[String, Long]): Map[String, Long] =
    m.groupMapReduce { case (w, _) => w.stripPrefix("﻿") } { case (_, c) => c }(_ + _)

  private lazy val expected: Map[String, Long] =
    mergeBom(parseCounts(refDir.resolve("combined_omp_wc.txt")))

  /** The exact corpus the committed ground truths were produced from
    * (c_omp.sub / c_serial.sub): files 1-9 and 11-16 — NOT the
    * small_test*.txt fixtures that also live in files/. */
  private lazy val refTxtFiles: Seq[String] =
    ((1 to 9) ++ (11 to 16)).map(i => refDir.resolve(s"files/$i.txt").toString)

  private def available: Boolean = Files.isDirectory(refDir.resolve("files"))

  test("fromTextFiles(reference corpus) == combined_omp_wc.txt exactly") {
    assume(available, "reference corpus not mounted")
    val got = WordCount.fromTextFiles(spark, refTxtFiles)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size,
      s"distinct words: got ${got.size}, reference ${expected.size}")
    // Compare maps, reporting the first few diffs rather than a blob.
    val diffs = (expected.keySet ++ got.keySet).iterator
      .filter(w => expected.get(w) != got.get(w)).take(5).toSeq
    assert(diffs.isEmpty, diffs.map(w =>
      s"'$w': ref=${expected.get(w)} got=${got.get(w)}").mkString("; "))
  }

  test("serial and OpenMP ground truths agree (sanity on the oracle itself)") {
    assume(available, "reference corpus not mounted")
    assert(mergeBom(parseCounts(refDir.resolve("serial_wc.txt"))) == expected)
  }

  test("writeCounts round-trips the reference corpus in both sink modes") {
    assume(available, "reference corpus not mounted")
    val counts = WordCount.fromTextFiles(spark, refTxtFiles)
    val dir = Files.createTempDirectory("wc_ref_sink").toString
    // combined sink (reference: combined_omp_wc.txt) and per-reducer
    // sink (reference: output_files/output{i}.txt, 16 reducers)
    WordCount.writeCounts(counts, s"$dir/combined", numPartitions = 1)
    WordCount.writeCounts(counts, s"$dir/sharded", numPartitions = 16)
    def parse(line: String): (String, Long) = {
      val i = line.lastIndexOf(':')
      line.substring(0, i) -> line.substring(i + 1).toLong
    }
    def reread(p: String): Map[String, Long] =
      spark.read.text(p).select("value").as[String].collect()
        .iterator.map(parse).toMap
    assert(reread(s"$dir/combined") == expected)
    assert(reread(s"$dir/sharded") == expected)
    val combinedFiles = Files.list(Paths.get(s"$dir/combined")).iterator.asScala
      .count(_.toString.endsWith(".txt"))
    assert(combinedFiles == 1, "combined sink must be a single file")
  }

  /** Independent replay of the reference's reducer hash
    * (omp_count_words.cpp:291-303): unsigned 64-bit h = h·33 + c,
    * then % 16 — NOT the graft Column expression, so the sink's
    * routing is checked against the recurrence itself. The reference
    * folds `char` — SIGNED UTF-8 bytes, sign-extended — so the replay
    * folds getBytes(UTF_8) the same way: for non-ASCII words this
    * differs from a code-point fold, and the parity assertion would
    * surface that divergence instead of masking it. */
  private def refPid(word: String, r: Int): Int = {
    var h = 5381L
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .foreach(b => h = h * 33L + b) // signed char fold, like the reference
    java.lang.Long.remainderUnsigned(h, r.toLong).toInt
  }

  test("sharded sink routes every word to the reference's djb2 % 16 reducer") {
    assume(available, "reference corpus not mounted")
    val counts = WordCount.fromTextFiles(spark, refTxtFiles)
    val dir = Files.createTempDirectory("wc_ref_route").toString
    WordCount.writeCounts(counts, dir, numPartitions = 16)
    val pidDirs = Files.list(Paths.get(dir)).iterator.asScala
      .filter(p => p.getFileName.toString.startsWith("pid=")).toSeq
    assert(pidDirs.nonEmpty, "expected pid=N reducer directories")
    var checked = 0L
    for (pd <- pidDirs) {
      val pid = pd.getFileName.toString.stripPrefix("pid=").toInt
      val words = spark.read.text(pd.toString).as[String].collect()
        .map(l => l.substring(0, l.lastIndexOf(':')))
      for (w <- words) {
        assert(refPid(w, 16) == pid,
          s"'$w' landed in pid=$pid, reference routes it to ${refPid(w, 16)}")
        checked += 1
      }
    }
    assert(checked == expected.size, s"routed $checked of ${expected.size} words")
  }
}
