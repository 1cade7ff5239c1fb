package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column block (SURVEY.md §2.7).
  *
  * Pattern: media travels as an opaque `binary` column next to a typed
  * metadata struct; decode / feature-extraction runs batched per
  * partition so a real decoder (JNI image lib, ffmpeg pipe, ONNX
  * session) is initialized once per partition, not per row — the Scala
  * analog of `mapInPandas`. The decode KERNEL here is a deterministic
  * STUB (this container has no image/audio libraries); everything
  * around it — schema, encoders, partition batching, feature shape —
  * is the real plumbing a production decoder drops into.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** The pluggable decode seam (r9): G2/G3/G4 run their byte
    * arithmetic over `decode(payload)` instead of the raw payload, so
    * a REAL codec drops in without touching the Spark plumbing
    * (schema, per-partition batching, feature shape all unchanged).
    * Implementations must be Serializable — one instance ships to
    * every executor; heavy state (JNI handles, ONNX sessions) belongs
    * in `@transient lazy val`s, initialized once per executor JVM, not
    * per row. `decode` returns None for undecodable payloads, which
    * the operators drop (the corrupt-file row-level skip a 100 TB
    * media crawl needs — one bad blob must not fail the stage).
    */
  trait MediaKernel extends Serializable {
    /** Tag recorded in the output's `decoder` column. */
    def name: String
    /** Payload bytes → decoded sample stream (e.g. row-major 8-bit
      * luma for images, PCM for audio), or None if undecodable. */
    def decode(payload: Array[Byte]): Option[Array[Byte]]
  }

  /** The deterministic CI kernel: decode = identity, so features are
    * byte arithmetic over the payload itself — exactly replayable by
    * the DuckDB oracle (the container ships no media libraries). */
  object IdentityKernel extends MediaKernel {
    override def name: String = "stub-v1"
    override def decode(payload: Array[Byte]): Option[Array[Byte]] =
      Some(payload)
  }

  /** A REAL decoder behind the same seam: JDK-native `javax.imageio`
    * (PNG/BMP/GIF/JPEG readers ship with the JRE — no external
    * dependency). Decodes to row-major 8-bit luma via the integer
    * ITU-R 601 weights (299/587/114, exact integer division — no
    * float, so the luma bytes are bit-stable across JVMs). Proves the
    * seam takes a production codec: ImageIoKernelSpec runs G2/G3
    * arithmetic over real encoded images through this kernel.
    */
  class ImageIoKernel extends MediaKernel {
    override def name: String = "imageio-v1"
    // per-executor init demo: disk cache off before the first decode
    @transient private lazy val ready: Boolean = {
      javax.imageio.ImageIO.setUseCache(false); true
    }
    override def decode(payload: Array[Byte]): Option[Array[Byte]] = {
      if (!ready || payload.isEmpty) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            out(y * w + x) = lum.toByte
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    }
  }
  /** The AUDIO twin of [[ImageIoKernel]] behind the same seam:
    * JDK-native `javax.sound.sampled` (the WAV/AIFF/AU readers ship
    * with the JRE). Decodes PCM to a MONO 8-BIT sample stream —
    * channels downmixed by integer average, 16-bit samples reduced to
    * their high byte, unsigned 8-bit recentred to signed — all
    * integer arithmetic, so the sample bytes are bit-stable across
    * JVMs. G2 features become audio features (mean level, longest
    * constant-level run = silence/clipping detection), G4's frame
    * sampler becomes fixed-window audio frame extraction. Compressed
    * codecs (MP3/AAC) have no JRE decoder and return None — the
    * row-level skip, not a stage failure.
    */
  class WavKernel extends MediaKernel {
    override def name: String = "javasound-v1"
    override def decode(payload: Array[Byte]): Option[Array[Byte]] = {
      if (payload.isEmpty) return None
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (in == null) return None
      try {
        val f = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val bits = f.getSampleSizeInBits
        val ch = f.getChannels
        if (!(f.getEncoding == PCM_SIGNED || f.getEncoding == PCM_UNSIGNED) ||
            (bits != 8 && bits != 16) || ch < 1 || f.getFrameSize <= 0)
          return None
        val raw = in.readAllBytes()
        val frames = raw.length / f.getFrameSize
        val bytesPer = bits / 8
        val out = new Array[Byte](frames)
        var i = 0
        while (i < frames) {
          var acc = 0
          var c = 0
          while (c < ch) {
            val off = i * f.getFrameSize + c * bytesPer
            acc += (if (bits == 8) {
              val b = raw(off).toInt
              if (f.getEncoding == PCM_UNSIGNED) (b & 0xff) - 128 else b
            } else {
              val hi = if (f.isBigEndian) off else off + 1
              val s = (raw(hi).toInt << 8) | (raw(off + (if (f.isBigEndian) 1 else 0)) & 0xff)
              (if (f.getEncoding == PCM_UNSIGNED) (s & 0xffff) - 32768
               else s.toShort.toInt) >> 8
            })
            c += 1
          }
          out(i) = (acc / ch).toByte
          i += 1
        }
        Some(out)
      } catch { case _: java.io.IOException => None }
      finally in.close()
    }
  }

  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      mean_byte: Double,
      max_run: Long,
      feat: Array[Double],
      decoder: String)

  // G1 — payload + typed metadata plumbing: binary column, byte length,
  // content checksum, mime tag. (The synthetic corpus has no real media,
  // so payloads are the utf-8 bytes of `text` — the schema/partition
  // path is identical for jpeg/wav bytes.)
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("checksum")).as("meta"))

  def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    withPayload(Tables.documents(s, d))
      .select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.checksum").as("checksum"))

  val qMultimodalMetaSql: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS checksum
      |FROM documents""".stripMargin

  /** The STUBBED decode kernel: stands in for image decode + feature
    * extraction. Deterministic in the payload bytes so runs are
    * reproducible; swap this body for the real decoder.
    */
  private[graft] def decodeStub(payload: Array[Byte]): (Double, Long, Array[Double]) = {
    if (payload.isEmpty) return (0.0, 0L, Array.fill(4)(0.0))
    var sum = 0L
    var maxRun = 1L
    var run = 1L
    var i = 0
    while (i < payload.length) {
      sum += payload(i) & 0xff
      if (i > 0 && payload(i) == payload(i - 1)) { run += 1; if (run > maxRun) maxRun = run }
      else run = 1
      i += 1
    }
    val mean = sum.toDouble / payload.length
    // 4-bucket byte histogram as the stand-in "embedding".
    val hist = new Array[Double](4)
    payload.foreach(b => hist((b & 0xff) / 64) += 1.0)
    (mean, maxRun, hist.map(_ / payload.length))
  }

  // G2 — per-partition batched decode: one "decoder init" per partition,
  // rows streamed through it. Narrow transformation — no shuffle; at
  // 100 TB this scales with input splits. The kernel is the pluggable
  // seam: features are computed over kernel.decode(payload) (the luma
  // plane for a real image codec; the payload itself for the CI stub);
  // n_bytes stays the STORED payload size either way (the column a
  // storage audit wants). Undecodable rows drop, never fail the stage.
  def extractFeatures(media: Dataset[MediaRow],
      kernel: MediaKernel = IdentityKernel): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        kernel.decode(r.payload).map { decoded =>
          val (mean, maxRun, hist) = decodeStub(decoded)
          MediaFeatures(r.doc_id, r.payload.length.toLong, mean, maxRun,
            hist, kernel.name)
        }
      }
    }
  }

  def qMultimodalFeat(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = withPayload(Tables.documents(s, d))
      .select(col("doc_id"), col("payload"))
      .as[MediaRow]
    extractFeatures(media)
      .select(
        col("doc_id"), col("n_bytes"),
        round(col("mean_byte"), 4).as("mean_byte"),
        col("max_run"),
        round(element_at(col("feat"), 1), 4).as("f0"),
        round(element_at(col("feat"), 2), 4).as("f1"),
        col("decoder"))
  }

  /** Full oracle for the stubbed decode kernel: the stub is plain byte
    * arithmetic, so DuckDB replays it over hex(encode(text)) — one row
    * per byte, mean/histogram by aggregation, max_run by
    * gaps-and-islands (i - row_number within equal-byte groups). */
  val qMultimodalFeatSql: String =
    """WITH bytes AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS n
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, n, i,
      |    CAST(('0x' || substr(hx, CAST(2 * i - 1 AS BIGINT), 2)) AS INT) AS byte
      |  FROM bytes, unnest(range(1, n + 1)) AS t(i)),
      |runs AS (
      |  SELECT doc_id, byte,
      |    i - row_number() OVER (PARTITION BY doc_id, byte ORDER BY i) AS grp
      |  FROM b),
      |runlen AS (SELECT doc_id, count(*) AS rl FROM runs GROUP BY doc_id, byte, grp),
      |stats AS (
      |  SELECT doc_id,
      |    CAST(any_value(n) AS BIGINT) AS n_bytes,
      |    round(sum(byte)::DOUBLE / any_value(n), 4) AS mean_byte,
      |    round(count(*) FILTER (WHERE byte < 64)::DOUBLE / any_value(n), 4) AS f0,
      |    round(count(*) FILTER (WHERE byte >= 64 AND byte < 128)::DOUBLE / any_value(n), 4) AS f1
      |  FROM b GROUP BY doc_id),
      |mr AS (SELECT doc_id, CAST(max(rl) AS BIGINT) AS max_run FROM runlen GROUP BY doc_id)
      |SELECT s.doc_id, s.n_bytes, s.mean_byte, mr.max_run, s.f0, s.f1,
      |  'stub-v1' AS decoder
      |FROM stats s JOIN mr USING (doc_id)""".stripMargin

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hexUpper(b: Array[Byte]): String =
    b.map("%02X".format(_)).mkString

  case class ResizedMedia(doc_id: Long, n_resized: Long, mean_byte: Double, checksum: String)

  /** G3 — "resize" kernel (stub): deterministic 1-in-k byte decimation,
    * standing in for image downscale / audio resample. Same batched
    * per-partition shape as G2; emits the resized length, mean, and an
    * md5 over the decimated bytes' hex — the cross-engine content
    * check (DuckDB's md5 only takes VARCHAR, so both engines hash the
    * uppercase hex string). Empty payloads produce no row, mirroring
    * the oracle's empty byte expansion.
    */
  def resizeMedia(media: Dataset[MediaRow], k: Int = 4,
      kernel: MediaKernel = IdentityKernel): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        kernel.decode(r.payload).filter(_.nonEmpty).map { sample =>
          val dec = Array.range(0, sample.length, k).map(sample)
          val mean = dec.map(_ & 0xff).map(_.toLong).sum.toDouble / dec.length
          ResizedMedia(r.doc_id, dec.length.toLong, mean,
            md5Hex(hexUpper(dec)))
        }
      }
    }
  }

  def qMediaResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    resizeMedia(withPayload(Tables.documents(s, d))
      .select(col("doc_id"), col("payload")).as[MediaRow]).toDF()
      // round in the PLAN, not the kernel: Spark/DuckDB round() agree
      // (half-away-from-zero) where JVM rint (half-even) would not
      .withColumn("mean_byte", round(col("mean_byte"), 4))
  }

  val qMediaResizeSql: String =
    """WITH bytes AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, n, i,
      |    CAST(('0x' || substr(hx, CAST(2*i - 1 AS BIGINT), 2)) AS INT) AS byte,
      |    substr(hx, CAST(2*i - 1 AS BIGINT), 2) AS bh
      |  FROM bytes, unnest(range(1, n + 1)) AS t(i)
      |  WHERE (i - 1) % 4 = 0)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_resized,
      |  round(sum(byte)::DOUBLE / count(*), 4) AS mean_byte,
      |  md5(string_agg(bh, '' ORDER BY i)) AS checksum
      |FROM b GROUP BY doc_id""".stripMargin

  case class SampledFrames(
      doc_id: Long, n_frames: Long, n_sampled: Long, mean_byte: Double, checksum: String)

  /** G4 — frame-sampling kernel (stub): payload viewed as fixed 64-byte
    * frames (video-frame stand-in), complete frames only, keep every
    * 2nd frame. Docs shorter than one frame produce no row (nothing to
    * sample), as in the oracle.
    */
  def sampleFrames(media: Dataset[MediaRow], frameLen: Int = 64,
      stride: Int = 2, kernel: MediaKernel = IdentityKernel): Dataset[SampledFrames] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        kernel.decode(r.payload).flatMap { sample =>
          val nFrames = sample.length / frameLen
          if (nFrames == 0) None
          else {
            val keptFrames = (0 until nFrames).filter(_ % stride == 0)
            val kept = keptFrames.toArray.flatMap(f =>
              sample.slice(f * frameLen, (f + 1) * frameLen))
            val mean = kept.map(_ & 0xff).map(_.toLong).sum.toDouble / kept.length
            Some(SampledFrames(r.doc_id, nFrames.toLong, keptFrames.length.toLong,
              mean, md5Hex(hexUpper(kept))))
          }
        }
      }
    }
  }

  def qFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sampleFrames(withPayload(Tables.documents(s, d))
      .select(col("doc_id"), col("payload")).as[MediaRow]).toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 4))
  }

  val qFrameSampleSql: String =
    """WITH bytes AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, n, i,
      |    CAST((i - 1) // 64 AS BIGINT) AS frame,
      |    CAST(('0x' || substr(hx, CAST(2*i - 1 AS BIGINT), 2)) AS INT) AS byte,
      |    substr(hx, CAST(2*i - 1 AS BIGINT), 2) AS bh
      |  FROM bytes, unnest(range(1, n + 1)) AS t(i)
      |  WHERE i <= (n // 64) * 64 AND CAST((i - 1) // 64 AS BIGINT) % 2 = 0)
      |SELECT doc_id,
      |  CAST(any_value(n // 64) AS BIGINT) AS n_frames,
      |  CAST(count(DISTINCT frame) AS BIGINT) AS n_sampled,
      |  round(sum(byte)::DOUBLE / count(*), 4) AS mean_byte,
      |  md5(string_agg(bh, '' ORDER BY i)) AS checksum
      |FROM b GROUP BY doc_id""".stripMargin

  /** G5 — perceptual-hash near-dup over the decoded media (the image-
    * dedup path: re-encoded/resized copies of one image hash close in
    * Hamming space where the byte checksum G1 sees different files).
    *
    * The "decoded image" is the stub's 60-cell luma grid (cell =
    * payload slice mean — a real decoder drops its resize-to-grid
    * here); the hash is aHash: bit c = cell c brighter than the whole
    * image. Comparisons are INTEGER-EXACT (cell_sum·doc_n >
    * doc_sum·cell_n — no float means), so the hash is bit-identical
    * across engines and runs.
    *
    * Scale shape: candidate pairs come from a band join — 4 bands of
    * 15 bits; a pair is a candidate iff SOME band matches exactly, so
    * the join is equi on (band, value), never all-pairs — then exact
    * verification via xor popcount. By pigeonhole the candidate set is
    * COMPLETE for Hamming ≤ 3 (4 bands, ≤ 3 flipped bits → one band
    * untouched); pairs up to `maxHamming` are surfaced best-effort
    * when a band happens to agree — the D4 LSH S-curve semantics, and
    * the oracle replays the banding so parity is still bit-exact. The
    * same index-then-verify layout as D2/D4, on the multimodal column.
    */
  def phashes(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    // n = size of the char array BEFORE exploding: identical by
    // construction to counting the exploded rows, but free per input
    // row — the count-over-window it replaces forced an exchange +
    // window pass over the char-exploded relation (the operator's
    // largest), roughly doubling its shuffle volume
    withPayload(docs)
      .select(col("doc_id"), expr("split(CAST(payload AS STRING), '')").as("cs"))
      .select(col("doc_id"), size(col("cs")).cast("long").as("n"),
        posexplode(col("cs")).as(Seq("pos", "ch")))
      .select(col("doc_id"), col("n"), col("pos"), ascii(col("ch")).cast("long").as("v"))
      .withColumn("cell", expr("CAST(pos * 60 div n AS BIGINT)"))
      .groupBy("doc_id", "cell")
      .agg(sum("v").as("cell_sum"), count(lit(1)).as("cell_n"))
      .withColumn("doc_sum", sum("cell_sum").over(w))
      .withColumn("doc_n", sum("cell_n").over(w))
      .groupBy("doc_id")
      .agg(sum(when(col("cell_sum") * col("doc_n") > col("doc_sum") * col("cell_n"),
        expr("CAST(1 AS BIGINT) << CAST(cell AS INT)")).otherwise(lit(0L))).as("phash"))
  }

  def qPhashDup(s: SparkSession, d: String, maxHamming: Int = 12): DataFrame = {
    val ph = phashes(Tables.documents(s, d))
    val bands = (0 until 4).map(b =>
      struct(lit(b).as("band"), (shiftright(col("phash"), b * 15) % 32768).as("bv")))
    val banded = ph
      .select(col("doc_id"), col("phash"), explode(array(bands.toIndexedSeq: _*)).as("tb"))
      .select(col("doc_id"), col("phash"),
        col("tb.band").as("band"), col("tb.bv").as("bv"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.phash ^ b.phash) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  val qPhashDupSql: String =
    """WITH cp AS (
      |  SELECT doc_id,
      |    unnest(list_transform(regexp_split_to_array(text, ''), c -> ord(c))) AS v,
      |    generate_subscripts(regexp_split_to_array(text, ''), 1) - 1 AS pos,
      |    len(regexp_split_to_array(text, '')) AS n
      |  FROM documents),
      |cell AS (
      |  SELECT doc_id, (pos * 60) // n AS cell,
      |    CAST(sum(v) AS BIGINT) AS cell_sum, count(*) AS cell_n
      |  FROM cp GROUP BY 1, 2),
      |tot AS (
      |  SELECT doc_id, cell, cell_sum, cell_n,
      |    CAST(sum(cell_sum) OVER (PARTITION BY doc_id) AS BIGINT) AS doc_sum,
      |    CAST(sum(cell_n) OVER (PARTITION BY doc_id) AS BIGINT) AS doc_n
      |  FROM cell),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN cell_sum * doc_n > doc_sum * cell_n
      |      THEN 1::BIGINT << CAST(cell AS INT) ELSE 0 END) AS BIGINT) AS phash
      |  FROM tot GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, phash, b.band, (phash >> (b.band * 15)) % 32768 AS bv
      |  FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 12""".stripMargin

  case class MediaSegments(
      doc_id: Long, n_windows: Long, n_active: Long,
      n_segments: Long, longest_seg: Long)

  /** G6 — ENERGY-WINDOW SEGMENTATION (the VAD / scene-cut shape): the
    * decoded sample stream is cut into fixed windows (16 samples, the
    * trailing partial window scored over its own length), each window
    * scores mean amplitude |s − 128| (distance from the unsigned-PCM /
    * mid-gray center), and a window is ACTIVE when its mean clears
    * τ = 40. Segments are maximal runs of active windows — audio VAD,
    * silence trimming, video scene detection, and blank-media triage
    * are all this operator with a different kernel behind the seam.
    * Batched per partition like G2: narrow, zero shuffle, one row out
    * per doc — at 100 TB cost is exactly one pass over the media
    * bytes. Undecodable/empty payloads drop (the row-level skip).
    */
  def segmentMedia(media: Dataset[MediaRow], window: Int = 16,
      tau: Double = 40.0,
      kernel: MediaKernel = IdentityKernel): Dataset[MediaSegments] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        kernel.decode(r.payload).filter(_.nonEmpty).map { sample =>
          val nW = (sample.length + window - 1) / window
          var w = 0
          var nActive = 0L; var nSeg = 0L; var longest = 0L; var run = 0L
          while (w < nW) {
            val from = w * window
            val to = math.min(from + window, sample.length)
            var sum = 0L
            var i = from
            while (i < to) { sum += math.abs((sample(i) & 0xff) - 128); i += 1 }
            if (sum.toDouble / (to - from) >= tau) {
              nActive += 1
              run += 1
              if (run == 1) nSeg += 1
              if (run > longest) longest = run
            } else run = 0
            w += 1
          }
          MediaSegments(r.doc_id, nW.toLong, nActive, nSeg, longest)
        }
      }
    }
  }

  def qMediaSegments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    segmentMedia(withPayload(Tables.documents(s, d))
      .select(col("doc_id"), col("payload")).as[MediaRow]).toDF()
  }

  /** Full oracle: byte expansion via hex, per-window mean amplitude,
    * gaps-and-islands over the active windows. */
  val qMediaSegmentsSql: String =
    """WITH bytes AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, n, i,
      |    CAST(('0x' || substr(hx, CAST(2*i - 1 AS BIGINT), 2)) AS INT) AS byte
      |  FROM bytes, unnest(range(1, n + 1)) AS t(i)),
      |w AS (
      |  SELECT doc_id, CAST((i - 1) // 16 AS BIGINT) AS wnd,
      |    CASE WHEN sum(abs(byte - 128))::DOUBLE / count(*) >= 40
      |         THEN 1 ELSE 0 END AS active
      |  FROM b GROUP BY doc_id, (i - 1) // 16),
      |isl AS (
      |  SELECT doc_id, wnd, active,
      |    wnd - row_number() OVER (PARTITION BY doc_id, active ORDER BY wnd) AS grp
      |  FROM w),
      |seg AS (
      |  SELECT doc_id, count(*) AS seg_len
      |  FROM isl WHERE active = 1 GROUP BY doc_id, grp),
      |base AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
      |    CAST(sum(active) AS BIGINT) AS n_active
      |  FROM w GROUP BY doc_id),
      |segs AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
      |    CAST(max(seg_len) AS BIGINT) AS longest_seg
      |  FROM seg GROUP BY doc_id)
      |SELECT b.doc_id, b.n_windows, b.n_active,
      |  coalesce(s.n_segments, 0) AS n_segments,
      |  coalesce(s.longest_seg, 0) AS longest_seg
      |FROM base b LEFT JOIN segs s USING (doc_id)""".stripMargin

  /** G7 — CROSS-MODAL RETRIEVAL (the CLIP-serving shape: query with
    * one modality, filter and return through the other): vectors live
    * in `embeddings`, document metadata in `documents`, joined by id.
    * For each query vector the exact top-3 cosine neighbors among
    * vectors whose DOCUMENT is English, each hit carrying the
    * neighbor's metadata (lang, source). The filter is a JOIN, not a
    * vector-table column — the realistic 100 TB layout (vectors and
    * metadata evolve independently): filter the metadata side,
    * BROADCAST it into the vector scan (a semi-join that prunes the
    * corpus before any distance math), then one E1 broadcast-query
    * pass — no shuffle proportional to corpus size anywhere.
    */
  def qCrossmodal(s: SparkSession, d: String): DataFrame = {
    import graft.functions.vec_cosine
    val docs = Tables.documents(s, d).select("doc_id", "lang", "source")
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    // join condition built from the FILTERED frame itself (r13 advice
    // fix): referencing the pre-filter `docs` columns resolved only via
    // attribute-id preservation — brittle self-join style
    val en = docs.filter(col("lang") === "en")
    val filtered = emb.join(broadcast(en), emb("vec_id") === en("doc_id"))
      .select(col("vec_id"), col("embedding"), col("lang"), col("source"))
    val queries = emb.filter(col("vec_id") < 12)
    val scored = filtered.as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (round(vec_cosine(col("q.embedding"), col("c.embedding")), 4) + lit(0.0))
          .as("cos_sim"),
        col("c.lang").as("lang"), col("c.source").as("source"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
  }

  val qCrossmodalSql: String =
    """WITH n AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings),
      |en AS (
      |  SELECT n.vec_id, n.embedding, n.nrm, d.lang, d.source
      |  FROM n JOIN documents d ON n.vec_id = d.doc_id
      |  WHERE d.lang = 'en'),
      |q AS (SELECT vec_id, embedding, nrm FROM n WHERE vec_id < 12),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_sum(list_transform(range(1, len(q.embedding) + 1),
      |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (q.nrm * c.nrm), 4) + 0.0 AS cos_sim,
      |    c.lang, c.source
      |  FROM q JOIN en c ON q.vec_id <> c.vec_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos_sim, lang, source,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, lang, source, rank
      |FROM r WHERE rank <= 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_feat" -> qMultimodalFeat,
    "q_media_resize" -> qMediaResize,
    "q_frame_sample" -> qFrameSample,
    "q_media_segments" -> qMediaSegments,
    "q_crossmodal" -> qCrossmodal,
    "q_phash_dup" -> ((s, d) => qPhashDup(s, d)))

  def oracles: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaSql,
    "q_multimodal_feat" -> qMultimodalFeatSql,
    "q_media_resize" -> qMediaResizeSql,
    "q_frame_sample" -> qFrameSampleSql,
    "q_media_segments" -> qMediaSegmentsSql,
    "q_crossmodal" -> qCrossmodalSql,
    "q_phash_dup" -> qPhashDupSql)
}
