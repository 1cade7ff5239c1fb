package graft

import graft.operators.Decontam

/** Brute-force cross-check of the decontamination operator on sf0.001:
  * recompute the train/holdout 8-gram overlap from raw text in plain
  * Scala and compare counts exactly.
  */
class DecontamSpec extends GraftSuite {

  test("q_decontam matches a brute-force recompute of the 8-gram overlap") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      md(0) & 0xff
    }
    def grams(text: String): Set[String] =
      text.split("\\s+").filter(_.nonEmpty).sliding(8)
        .filter(_.length == 8).map(_.mkString(" ")).toSet
    val train = docs.filter { case (id, _) => bucket(id) < 216 }
    val holdoutGrams = docs.collect {
      case (id, t) if bucket(id) >= 216 => grams(t)
    }.foldLeft(Set.empty[String])(_ ++ _)
    val want = train.flatMap { case (id, t) =>
      val g = grams(t)
      val hits = g.intersect(holdoutGrams).size
      if (hits > 0) Some(id -> ((g.size.toLong, hits.toLong))) else None
    }.toMap
    val got = Decontam.qDecontam(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    info(s"${got.size} contaminated train docs at sf0.001")
  }
}
