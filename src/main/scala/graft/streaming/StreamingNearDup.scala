package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** C13 — STREAMING MinHash-LSH near-dup detection (SURVEY.md §2.3):
  * the continuous twin of the batch D3/D4 pipeline. Each arriving doc
  * is signed (shingle → k universal min-hashes, same parameters as
  * graft.operators.Dedup so batch and stream agree on signatures),
  * exploded into band keys, and routed by band key into
  * flatMapGroupsWithState; the per-bucket state holds the docs seen in
  * that bucket (capped, like the batch maxBucket guard) and every new
  * arrival emits candidate pairs against them — so near-dups are
  * detected ACROSS micro-batches, which a per-batch join cannot do.
  *
  * Scale shape: signature computation is a compiled per-doc map (no
  * shuffle, no interpreted lambda), the only exchange is the band-key
  * shuffle into the state store (RocksDB via EventsStream's session
  * conf), and state is bounded by cap × |buckets seen|. Pair dedup
  * across bands is the consumer's choice (e.g. dropDuplicates with a
  * watermark) — kept out of this operator so its output is append-only.
  */
object StreamingNearDup {

  import graft.operators.Dedup.{NumBands, NumHashes, P31}

  case class StreamDoc(doc_id: Long, text: String)
  case class BandedDoc(bucket: String, doc_id: Long)
  case class CandidatePair(doc_a: Long, doc_b: Long, bucket: String)
  case class BucketState(docIds: List[Long])

  /** Per-doc MinHash signature in plain compiled Scala — identical
    * arithmetic to the batch pipeline: 3-shingles hashed to the
    * leading-60-bit md5 prefix, then k universal hashes
    * (a_i*(h mod p) + b_i) mod p, min per hash.
    */
  private[graft] def signature(text: String): Array[Long] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    if (toks.length < 3) return sig
    val md = java.security.MessageDigest.getInstance("MD5")
    val params = (0 until NumHashes).map(graft.operators.Dedup.uhParam)
    var i = 0
    while (i + 2 < toks.length) {
      val shingle = s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"
      md.reset()
      val d = md.digest(shingle.getBytes("UTF-8"))
      // leading 15 hex chars = top 60 bits of the digest
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = h >>> 4 // 64 -> 60 bits, matching conv(substr(md5, 1, 15))
      var k = 0
      while (k < NumHashes) {
        val (a, b) = params(k)
        val v = (a * (h % P31) + b) % P31
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  /** Band keys: the tuple of the band's row min-hashes, rendered as a
    * string bucket id (band index prefixed so bands never collide).
    */
  private[graft] def bandKeys(sig: Array[Long]): Seq[String] = {
    val rows = NumHashes / NumBands
    (0 until NumBands).map { b =>
      (0 until rows).map(j => sig(b * rows + j)).mkString(s"$b|", "|", "")
    }
  }

  def updateBucket(maxBucket: Int)(
      bucket: String,
      docs: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    val seen = state.getOption.map(_.docIds).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
    var current = seen
    // deterministic intra-batch order
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      if (!current.contains(d.doc_id)) {
        current.iterator.take(maxBucket).foreach { other =>
          out += CandidatePair(math.min(other, d.doc_id), math.max(other, d.doc_id), bucket)
        }
        current = (d.doc_id :: current).take(maxBucket)
      }
    }
    state.update(BucketState(current))
    out.iterator
  }

  /** The streaming plan: docs → signatures (compiled map) → band keys
    * → stateful bucket join emitting cross-batch candidate pairs.
    */
  def candidates(docs: Dataset[StreamDoc], maxBucket: Int = 1000): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => bandKeys(signature(d.text)).map(BandedDoc(_, d.doc_id)))
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateBucket(maxBucket))
  }

  case class TsStreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class TsBandedDoc(bucket: String, doc_id: Long, ts: java.sql.Timestamp)

  def updateBucketTtl(maxBucket: Int, ttlMs: Long)(
      bucket: String,
      docs: Iterator[TsBandedDoc],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    if (state.hasTimedOut) {
      // bucket went quiet past the TTL: evict — unbounded dedup
      // history is exactly what this variant exists to prevent
      state.remove()
      return Iterator.empty
    }
    val seen = state.getOption.map(_.docIds).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
    var current = seen
    var maxMs = Long.MinValue
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      maxMs = math.max(maxMs, d.ts.getTime)
      if (!current.contains(d.doc_id)) {
        current.iterator.take(maxBucket).foreach { other =>
          out += CandidatePair(math.min(other, d.doc_id), math.max(other, d.doc_id), bucket)
        }
        current = (d.doc_id :: current).take(maxBucket)
      }
    }
    state.update(BucketState(current))
    if (maxMs != Long.MinValue) state.setTimeoutTimestamp(maxMs + ttlMs)
    out.iterator
  }

  /** TTL variant: bucket state is evicted once the event-time
    * watermark passes `lastArrival + ttl` — docs only near-dup-match
    * within the TTL horizon, and state stays bounded by
    * cap × |buckets active in the horizon| regardless of stream age.
    * The NoTimeout variant above is the full-history mode for bounded
    * backfills; this is the always-on ingest mode.
    */
  def candidatesWithTtl(
      docs: Dataset[TsStreamDoc],
      ttlMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "5 minutes",
      maxBucket: Int = 1000): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => bandKeys(signature(d.text)).map(TsBandedDoc(_, d.doc_id, d.ts)))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateBucketTtl(maxBucket, ttlMs))
  }
}
