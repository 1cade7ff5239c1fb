package graft

import graft.operators.Multimodal

class MultimodalSpec extends GraftSuite {

  test("decode stub is deterministic and bounded") {
    val payload = "hello world".getBytes("UTF-8")
    val (m1, r1, h1) = Multimodal.decodeStub(payload)
    val (m2, r2, h2) = Multimodal.decodeStub(payload)
    assert(m1 == m2 && r1 == r2 && h1.sameElements(h2))
    assert(m1 > 0 && m1 < 256)
    assert(math.abs(h1.sum - 1.0) < 1e-9) // histogram normalized
    assert(Multimodal.decodeStub(Array.emptyByteArray)._3.forall(_ == 0.0))
  }

  test("feature extraction preserves row count and carries typed metadata") {
    val feats = Multimodal.qMultimodalFeat(spark, sf).collect()
    assert(feats.length == Tables.documents(spark, sf).count())
    feats.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("decoder") == "stub-v1")
    }
    val meta = Multimodal.qMultimodalMeta(spark, sf).collect()
    assert(meta.forall(_.getAs[String]("mime") == "text/plain"))
  }
}
