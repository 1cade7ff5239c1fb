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

  test("resize kernel decimates 1-in-4 with stable checksums") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, Array.tabulate[Byte](10)(_.toByte)))
      .toDS()
    val out = Multimodal.resizeMedia(media).collect().head
    // bytes 0..9, keep positions 0,4,8 -> values 0,4,8
    assert(out.n_resized == 3L)
    assert(out.mean_byte == 4.0)
    val again = Multimodal.resizeMedia(media).collect().head
    assert(out.checksum == again.checksum && out.checksum.length == 32)
  }

  test("frame sampler keeps every 2nd complete frame, drops short docs") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Array.fill[Byte](200)(7)), // 3 frames of 64 -> keep 0,2
      Multimodal.MediaRow(2L, Array.fill[Byte](10)(7))   // < 1 frame -> no row
    ).toDS()
    val rows = Multimodal.sampleFrames(media).collect()
    assert(rows.length == 1)
    assert(rows.head.doc_id == 1L)
    assert(rows.head.n_frames == 3L && rows.head.n_sampled == 2L)
    assert(rows.head.mean_byte == 7.0)
  }
}
