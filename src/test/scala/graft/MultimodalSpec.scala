package graft

import org.apache.spark.sql.functions.{col, length, lit}

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

  test("ImageIoKernel: G2/G3 over REAL encoded images through the pluggable seam") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // encode real PNG and BMP images via the JDK codec itself
    def encode(fmt: String, w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val gray128Png = encode("png", 8, 4, (_, _) => 0x808080)    // uniform luma 128
    val gradientBmp = encode("bmp", 16, 1, (x, _) => {
      val v = x * 16; (v << 16) | (v << 8) | v                   // luma = x*16
    })
    val media = Seq(
      Multimodal.MediaRow(1L, gray128Png),
      Multimodal.MediaRow(2L, gradientBmp),
      Multimodal.MediaRow(3L, Array.fill[Byte](64)(42))          // NOT an image
    ).toDS()

    val kernel = new Multimodal.ImageIoKernel()
    val feats = Multimodal.extractFeatures(media, kernel)
      .collect().map(f => f.doc_id -> f).toMap
    // the undecodable payload DROPS (row-level skip), never fails
    assert(feats.keySet == Set(1L, 2L))
    val uni = feats(1L)
    // uniform gray: every luma byte is 128 → mean 128, run = w*h
    assert(uni.mean_byte == 128.0 && uni.max_run == 32L)
    assert(uni.decoder == "imageio-v1")
    assert(uni.n_bytes == gray128Png.length.toLong) // stored size, not decoded
    val grad = feats(2L)
    // luma = 0,16,…,240 → mean 120; all distinct → max_run 1
    assert(grad.mean_byte == 120.0 && grad.max_run == 1L)

    // G3 through the same kernel: decimate the LUMA plane, not the
    // encoded bytes — gradient row keeps x = 0,4,8,12 → 0,64,128,192
    val rz = Multimodal.resizeMedia(media, k = 4, kernel = kernel)
      .collect().map(r => r.doc_id -> r).toMap
    assert(rz.keySet == Set(1L, 2L))
    assert(rz(2L).n_resized == 4L && rz(2L).mean_byte == 96.0)

    // G4: the gray image's 32 luma bytes < one 64-byte frame → no row;
    // a wider image yields complete frames
    val widePng = Multimodal.MediaRow(4L, encode("png", 64, 3, (_, _) => 0x404040))
    val fr = Multimodal.sampleFrames(Seq(widePng).toDS(), kernel = kernel).collect()
    assert(fr.length == 1 && fr.head.n_frames == 3L && fr.head.n_sampled == 2L)
    assert(fr.head.mean_byte == 64.0)

    // determinism: the integer luma path is bit-stable across runs
    val again = Multimodal.extractFeatures(media, kernel).collect()
      .map(f => f.doc_id -> f).toMap
    assert(again(2L).feat.sameElements(grad.feat))

    // the CI stub is untouched by the seam: identity decode, same tag
    val stub = Multimodal.extractFeatures(media).collect()
    assert(stub.length == 3 && stub.forall(_.decoder == "stub-v1"))
  }

  test("WavKernel: G2/G4 over REAL encoded audio through the pluggable seam") {
    import spark.implicits._
    import javax.sound.sampled._
    // encode real WAV payloads via the JDK codec itself
    def wav(fmt: AudioFormat, frames: Array[Byte]): Array[Byte] = {
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(frames), fmt,
        frames.length / fmt.getFrameSize)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // mono 16-bit LE: sample i = i<<8, so the decoded high byte is i
    val ramp16 = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      wav(fmt, Array.tabulate[Byte](128 * 2)(j =>
        if (j % 2 == 0) 0 else (j / 2).toByte))
    }
    // stereo 16-bit LE: L = 100<<8, R = 50<<8 → mono average 75
    val stereo16 = {
      val fmt = new AudioFormat(8000f, 16, 2, true, false)
      wav(fmt, Array.tabulate[Byte](200 * 4)(j => (j % 4: @unchecked) match {
        case 0 => 0; case 1 => 100; case 2 => 0; case 3 => 50
      }))
    }
    // mono UNSIGNED 8-bit (the classic WAV form): constant 192 → 64
    val u8 = {
      val fmt = new AudioFormat(8000f, 8, 1, false, false)
      wav(fmt, Array.fill[Byte](96)(192.toByte))
    }
    val media = Seq(
      Multimodal.MediaRow(1L, ramp16),
      Multimodal.MediaRow(2L, stereo16),
      Multimodal.MediaRow(3L, u8),
      Multimodal.MediaRow(4L, Array.fill[Byte](64)(42))   // NOT audio
    ).toDS()

    val kernel = new Multimodal.WavKernel()
    val feats = Multimodal.extractFeatures(media, kernel)
      .collect().map(f => f.doc_id -> f).toMap
    // the undecodable payload DROPS (row-level skip), never fails
    assert(feats.keySet == Set(1L, 2L, 3L))
    // ramp 0..127 → mean 63.5, all distinct → run 1
    assert(feats(1L).mean_byte == 63.5 && feats(1L).max_run == 1L)
    assert(feats(1L).decoder == "javasound-v1")
    // stereo downmix: constant 75 level, run = 200 frames
    assert(feats(2L).mean_byte == 75.0 && feats(2L).max_run == 200L)
    // unsigned recentre: 192 - 128 = 64 constant
    assert(feats(3L).mean_byte == 64.0 && feats(3L).max_run == 96L)

    // G4 through the same kernel: fixed 64-sample frames over the
    // DECODED stream — ramp has 2 complete frames, stride keeps 1
    val fr = Multimodal.sampleFrames(media, kernel = kernel)
      .collect().map(r => r.doc_id -> r).toMap
    assert(fr(1L).n_frames == 2L && fr(1L).n_sampled == 1L)
    assert(fr(2L).n_frames == 3L && fr(2L).n_sampled == 2L)

    // determinism: the integer downmix path is bit-stable across runs
    val again = Multimodal.extractFeatures(media, kernel).collect()
      .map(f => f.doc_id -> f).toMap
    assert(again(2L).feat.sameElements(feats(2L).feat))
  }

  test("G6 segmentation: hand-computed windows, islands, partial tail") {
    import spark.implicits._
    // 16-byte windows of |b-128|: 'a'..'z' sit at 6..31 (quiet),
    // spaces at 96 (loud) — craft a payload whose window activity is
    // known: 16 spaces (active), 16 'a's (quiet), 16 spaces (active),
    // then an 8-byte partial tail of spaces (active on ITS OWN length)
    val payload = (" " * 16) + ("a" * 16) + (" " * 16) + (" " * 8)
    val media = Seq(Multimodal.MediaRow(1L, payload.getBytes("UTF-8"))).toDS()
    val out = Multimodal.segmentMedia(media).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.n_windows == 4)
    assert(r.n_active == 3)
    assert(r.n_segments == 2) // [active] [quiet] [active, active-tail]
    assert(r.longest_seg == 2)
    // empty payload drops, never a zero row
    val empty = Seq(Multimodal.MediaRow(2L, Array.emptyByteArray)).toDS()
    assert(Multimodal.segmentMedia(empty).isEmpty)
    // the corpus query emits one row per doc with consistent bounds
    val all = Multimodal.qMediaSegments(spark, sf).collect()
    assert(all.nonEmpty)
    all.foreach { row =>
      val (nw, na, ns, ls) = (row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4))
      assert(na <= nw && ns <= na && ls <= na && (ns == 0) == (na == 0))
    }
  }

  test("G7 cross-modal retrieval: English-only neighbors with metadata") {
    val out = graft.operators.Multimodal.qCrossmodal(spark, sf).collect()
    assert(out.nonEmpty)
    val langOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getAs[String]("lang") == "en")
      assert(langOf(r.getAs[Long]("neighbor_id")) == "en",
        "metadata join drifted from the documents table")
      assert(r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 3)
    }
    // ranks dense per query, sims descending
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).sameElements(1L to sorted.length))
      val sims = sorted.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("phash near-dup: banding complete for hamming<=3, sound up to 12") {
    import spark.implicits._
    // controlled corpus: doc 0 repeated with light/medium/heavy edits
    // (brightness edits move cell means, flipping aHash bits)
    val base = (1 to 300).map(i => ('a' + i % 20).toChar).mkString
    def edit(s: String, step: Int, ch: Char): String =
      s.zipWithIndex.map { case (c, i) => if (step > 0 && i % step == 0) ch else c }.mkString
    val docs = Seq(
      0L -> base,
      1L -> base,                  // exact copy: hamming 0
      2L -> edit(base, 150, 'z'),  // light edit
      3L -> edit(base, 40, 'z'),   // medium edit
      4L -> edit(base, 10, 'z'),   // heavy edit
      5L -> (1 to 300).map(i => ('A' + i % 23).toChar).mkString // unrelated
    ).toDF("doc_id", "text")
    val ph = graft.operators.Multimodal.phashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph.size == 6)
    assert(ph(0L) == ph(1L), "identical payloads must hash identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ids = ph.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
    } yield (a, b, ham(ph(a), ph(b)))).toSeq
    val got = {
      val tmp = java.nio.file.Files.createTempDirectory("phash").toString
      docs.withColumn("source", lit("s")).withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      graft.operators.Multimodal.qPhashDup(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    // complete for <=3 (pigeonhole over 4 bands)
    for ((a, b, h) <- brute if h <= 3)
      assert(got.exists(t => t._1 == a && t._2 == b && t._3 == h),
        s"missed guaranteed pair ($a,$b) hamming $h")
    // sound: every reported pair matches brute-force hamming and <=12
    for ((a, b, h) <- got) {
      assert(h <= 12)
      assert(brute.contains((a, b, h.toInt)), s"bogus pair ($a,$b,$h)")
    }
  }
}
