package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature
  * extraction runs batched per partition.
  *
  * The byte→media boundary is the [[MediaCodec]] trait: every operator
  * that interprets payload bytes takes one as a parameter. The
  * container has no image/audio codecs, so the default [[StubCodec]]
  * is a clearly-marked deterministic stand-in — it parses nothing, it
  * derives plausible metadata/samples from the bytes (codepoints stand
  * in for pixels). A production build injects a real JPEG/PNG/PCM
  * codec at the call site WITHOUT editing any operator; everything
  * around the trait (schema, batching, partition-level iteration,
  * metadata projection, fingerprint algebra) is the real Spark
  * plumbing a production decoder drops into, and is what the oracle
  * rows gate.
  *
  * Scale notes: payload columns are only ever passed through
  * `mapPartitions` (no per-row UDF setup cost, codec state amortized
  * across a partition) and metadata-only queries never touch the
  * payload column — parquet column pruning keeps the bytes on disk.
  */
object Multimodal {

  /** Decoded-media metadata schema — the typed face of the opaque blob.
    * Nullable: a null payload decodes to null metadata (matching the
    * SQL twin, where every expression over a null input is null).
    */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = true),
    StructField("magic_hex", StringType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true)))

  /** The codec boundary: bytes in, decoded media out. Implementations
    * MUST be cheap to construct / serializable (instances ship inside
    * `mapPartitions` closures) and deterministic per input — the dedup
    * and fingerprint operators rely on rerun-stable output.
    */
  trait MediaCodec extends Serializable {
    /** `(n_bytes, magic_hex, width, height)` of the decoded media. */
    def decode(payload: Array[Byte]): (Long, String, Long, Long)

    /** Number of extractable frames (video) / windows (audio). */
    def frameCount(payload: Array[Byte]): Long

    /** Decoded scalar samples (pixels row-major / PCM), as exact
      * integers — feeds the perceptual fingerprint.
      */
    def samples(payload: Array[Byte]): Iterator[Long]
  }

  /** STUB — the deterministic fake codec (the container ships no real
    * image/audio libraries). Metadata derives from byte length and
    * leading codepoint; "samples" are the payload's UTF-8 codepoints.
    * Deliberately SQL-expressible so every operator built on it stays
    * oracle-checkable end to end; also the test implementation proving
    * the trait seam carries everything the operators need.
    */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte]): (Long, String, Long, Long) = {
      val n = payload.length.toLong
      val magic = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
      val w = 32L + (n % 480L)
      // first CODEPOINT (payloads are UTF-8 text in the fixture path),
      // matching the SQL twin's ascii(substring(text,1,1)) — using the
      // raw first BYTE would diverge for any non-ASCII leading char
      val first =
        if (n > 0)
          new String(payload, 0, math.min(4, payload.length), java.nio.charset.StandardCharsets.UTF_8)
            .codePointAt(0).toLong
        else 0L
      val h = 32L + (first % 224L)
      (n, magic, w, h)
    }

    def frameCount(payload: Array[Byte]): Long =
      8L + (payload.length.toLong % 120L)

    def samples(payload: Array[Byte]): Iterator[Long] =
      codePoints(new String(payload, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Attach a synthetic binary payload column (UTF-8 bytes of a text
    * column) — the fixture path; real pipelines read binary parquet.
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Batched decode over partitions: the production shape
    * (`mapPartitions`, codec state per partition, typed Row out).
    */
  def decodeMeta(withPayloadDf: DataFrame, idCol: String = "doc_id",
      codec: MediaCodec = StubCodec): DataFrame = {
    val spark = withPayloadDf.sparkSession
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: mediaMetaSchema.fields.toSeq)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloadDf.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, buffers)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Row(id, null, null, null, null) // SQL-twin parity
          else {
            val (n, magic, w, h) = codec.decode(payload)
            Row(id, n, magic, w, h)
          }
        }
      }(encoder)
  }

  /** Pure-SQL metadata projection (no decoder) — byte length + magic
    * prefix + the [[StubCodec]] dimension formulas as Catalyst
    * expressions. Engine-portable; used by the oracle-checked query.
    */
  def metaSql(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val payload = col(textCol).cast("binary")
    val nBytes = octet_length(payload).cast("long")
    docs.select(
      col(idCol),
      nBytes.as("n_bytes"),
      lower(hex(substring(payload, 1, 4))).as("magic_hex"),
      (lit(32L) + nBytes % 480).as("width"),
      (lit(32L) + ascii(substring(col(textCol), 1, 1)) % 224).as("height"))
  }

  /** Fit-into-box resize planning: integer fixed-point (e3) scale so
    * the plan is exact and portable. A real build hands (w, h, rw, rh)
    * to the codec; the arithmetic IS the production resize plan.
    */
  object FakeResizer {
    def plan(w: Long, h: Long, maxW: Long, maxH: Long): (Long, Long) = {
      // degenerate dims map to (0, 0) instead of dividing by zero — a
      // real decoder can emit 0×0 for corrupt frames; one bad row must
      // not kill the partition task
      if (w <= 0 || h <= 0) (0L, 0L)
      else {
        val scaleE3 = math.min(1000L, math.min(maxW * 1000 / w, maxH * 1000 / h))
        (w * scaleE3 / 1000, h * scaleE3 / 1000)
      }
    }
  }

  /** Resize metadata over partitions: decode dims (stub codec) + the
    * integer fit-into-box plan, batched per partition like a real
    * image pipeline (codec/scaler state amortized across the batch).
    */
  def resizeMeta(withPayloadDf: DataFrame, maxW: Long, maxH: Long,
      idCol: String = "doc_id", codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("out_w", LongType, nullable = true),
      StructField("out_h", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloadDf.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Row(id, null, null, null, null) // SQL-twin parity
          else {
            val (_, _, w, h) = codec.decode(payload)
            val (rw, rh) = FakeResizer.plan(w, h, maxW, maxH)
            Row(id, w, h, rw, rh)
          }
        }
      }(encoder)
  }

  /** Frame sampling over a (stub) video payload: one output row per
    * sampled frame index — the generator shape (`Iterator.flatMap`)
    * a real frame extractor drops into. Frame count derives
    * deterministically from the payload size.
    */
  def frameSample(withPayloadDf: DataFrame, stride: Int,
      idCol: String = "doc_id", codec: MediaCodec = StubCodec): DataFrame = {
    require(stride >= 1)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloadDf.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Iterator.empty // SQL twin: range over null is empty
          else {
            val nFrames = codec.frameCount(payload)
            (0L until nFrames by stride.toLong).iterator.map(i => Row(id, i, nFrames))
          }
        }
      }(encoder)
  }

  /** Audio fingerprint over the codec sample stream (Haitsma & Kalker
    * 2002, "A Highly Robust Audio Fingerprinting System" — the
    * single-band energy-delta-sign form): samples group into
    * consecutive `win`-sample windows (trailing partial window
    * dropped), each window's ENERGY is the exact integer sample sum,
    * and fingerprint bit `i` is `energy(i+1) > energy(i)` for the
    * first 60 deltas. Sign-of-derivative bits survive volume scaling
    * and constant offset (both shift every window energy equally),
    * which is what makes the fingerprint robust; 60 bits keeps the
    * packed BIGINT positive on every engine AND 4-band-divisible, so
    * `fp.as("simhash")` drops straight into
    * `Dedup.simhashPairs(_, bits = 60)` for banded Hamming near-dup.
    * Emits `(doc_id, n_windows, fp)`; a null payload emits null
    * fingerprint columns (the [[decodeMeta]] null convention — the
    * SQL twin CASEs on null text to match).
    *
    * Scale shape: batched per partition over the [[MediaCodec]] sample
    * ITERATOR — one window of samples in memory at a time, codec state
    * amortized across the partition, and payload bytes never shuffle
    * (the fingerprint row is ~24 bytes/doc).
    */
  def audioFingerprint(withPayloadDf: DataFrame, win: Int = 4,
      idCol: String = "doc_id", codec: MediaCodec = StubCodec): DataFrame = {
    require(win >= 1, s"win must be >= 1, got $win")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_windows", LongType, nullable = true),
      StructField("fp", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloadDf.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          // null payload -> null fingerprint (decodeMeta convention;
          // the SQL twin CASEs on null text to agree)
          if (payload == null) Row(id, null, null)
          else {
            var n = 0L
            var fp = 0L
            var prev = 0L
            codec.samples(payload).grouped(win).foreach { g =>
              if (g.size == win) { // full windows only
                val e = g.sum
                if (n > 0 && n - 1 < 60 && e > prev) fp |= 1L << (n - 1).toInt
                prev = e
                n += 1
              }
            }
            Row(id, n, fp)
          }
        }
      }(encoder)
  }

  /** Feature extraction: per-block codepoint statistics (block =
    * `blockSize` consecutive codepoints) — the batched per-partition
    * loop a real embedding/feature extractor uses, with exact integer
    * outputs so the whole pipeline is oracle-checkable.
    */
  def blockStats(docs: DataFrame, blockSize: Int = 64, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(blockSize >= 1)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("block_no", LongType, nullable = false),
      StructField("n_cp", LongType, nullable = false),
      StructField("sum_cp", LongType, nullable = false),
      StructField("min_cp", LongType, nullable = false),
      StructField("max_cp", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col(idCol), col(textCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val s = r.getString(1)
          if (s == null) Iterator.empty
          else blockRows(id, s, blockSize)
        }
      }(encoder)
  }

  private def blockRows(id: Long, s: String, blockSize: Int): Iterator[Row] =
    sampleBlockRows(id, codePoints(s), blockSize)

  /** Scene-cut / change-point detection over the block-feature stream:
    * flag block boundaries where the mean feature value jumps by more
    * than `thresholdE3` (e3-scaled) — the shot-boundary detector a
    * video pipeline runs over real frame features (histogram/embedding
    * deltas), here over the same deterministic [[blockStats]] features
    * the rest of the multimodal tier uses, so the whole chain stays
    * oracle-checkable. Output: one row per ADJACENT block pair,
    * `(doc_id, block_no, mean_e3, prev_mean_e3, delta_e3, is_cut)`
    * (`block_no` ≥ 1 — the first block has no predecessor).
    *
    * Scale shape: [[blockStats]]'s per-partition streaming pass, then
    * ONE window keyed (doc, block order) — partitions are
    * payload/blockSize rows, never corpus-sized; all integers.
    */
  def sceneCuts(
      docs: DataFrame,
      blockSize: Int = 64,
      thresholdE3: Long = 2000,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    sceneCutsFrom(blockStats(docs, blockSize, textCol, idCol), thresholdE3, idCol)
  }

  /** [[sceneCuts]] over CODEC-DECODED payload samples — the real-media
    * entry point: with a multi-frame codec
    * ([[graft.operators.MultiFrameImageCodec]]) and `blockSize` =
    * pixels per frame, one block = one frame and the mean-delta rule
    * is a true inter-frame scene-change detector. Same output schema
    * as the text form; the window rule is shared code so the two
    * paths cannot drift.
    */
  def sceneCutsPayload(withPayloadDf: DataFrame, blockSize: Int = 64,
      thresholdE3: Long = 2000, idCol: String = "doc_id",
      codec: MediaCodec = StubCodec): DataFrame =
    sceneCutsFrom(payloadBlockStats(withPayloadDf, blockSize, idCol, codec),
      thresholdE3, idCol)

  /** The shared block-mean-delta window rule of [[sceneCuts]] /
    * [[sceneCutsPayload]].
    */
  private def sceneCutsFrom(stats: DataFrame, thresholdE3: Long,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("block_no"))
    stats
      .withColumn("mean_e3", expr("(sum_cp * 1000) div n_cp"))
      .withColumn("prev_mean_e3", lag(col("mean_e3"), 1).over(w))
      .filter(col("prev_mean_e3").isNotNull)
      .select(
        col(idCol), col("block_no"), col("mean_e3"), col("prev_mean_e3"),
        abs(col("mean_e3") - col("prev_mean_e3")).as("delta_e3"))
      .withColumn("is_cut", col("delta_e3") > thresholdE3)
  }

  /** Codepoint iterator over a string (surrogate-pair aware). */
  private[operators] def codePoints(s: String): Iterator[Long] = new Iterator[Long] {
    private var i = 0 // UTF-16 offset
    def hasNext: Boolean = i < s.length
    def next(): Long = {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      cp.toLong
    }
  }

  /** Streaming per-block (n, sum, min, max) over any sample iterator —
    * shared by the text path and the codec path; O(1) state.
    */
  private def sampleBlockRows(id: Long, samples: Iterator[Long], blockSize: Int): Iterator[Row] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var idx = 0L     // sample index
    var bNo = 0L; var n = 0L; var sum = 0L
    var mn = Long.MaxValue; var mx = Long.MinValue
    def flush(): Unit = if (n > 0) { out += Row(id, bNo, n, sum, mn, mx) }
    while (samples.hasNext) {
      val cp = samples.next()
      val b = idx / blockSize
      if (b != bNo) { flush(); bNo = b; n = 0; sum = 0; mn = Long.MaxValue; mx = Long.MinValue }
      n += 1; sum += cp; mn = math.min(mn, cp); mx = math.max(mx, cp)
      idx += 1
    }
    flush()
    out.iterator
  }

  /** [[blockStats]] over CODEC-DECODED samples of a binary payload —
    * the media-side block statistics feeding [[perceptualHash]]. Same
    * output schema as the text form; the sample source is the
    * [[MediaCodec]] seam.
    */
  def payloadBlockStats(withPayloadDf: DataFrame, blockSize: Int,
      idCol: String = "doc_id", codec: MediaCodec = StubCodec): DataFrame = {
    require(blockSize >= 1)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("block_no", LongType, nullable = false),
      StructField("n_cp", LongType, nullable = false),
      StructField("sum_cp", LongType, nullable = false),
      StructField("min_cp", LongType, nullable = false),
      StructField("max_cp", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloadDf.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Iterator.empty
          else sampleBlockRows(id, codec.samples(payload), blockSize)
        }
      }(encoder)
  }

  /** Exact media dedup: canonical (minimum) id per identical binary
    * payload — the asset-level twin of
    * [[graft.operators.Dedup.exactDedup]], for image/audio/video
    * columns where re-crawled bytes repeat. Groups on
    * `(xxhash64(payload), xxhash64(42, payload), byte length)` — three
    * LongType shuffle keys, so the (potentially huge) payload bytes
    * never cross the shuffle; the 128-bit double-hash collision
    * assumption is the same content-addressed-storage contract as
    * exactDedup. Null payloads group together (SQL GROUP BY null
    * semantics).
    */
  def payloadDedup(withPayloadDf: DataFrame, idCol: String = "doc_id"): DataFrame =
    withPayloadDf.select(
      xxhash64(col("payload")).as("h"),
      xxhash64(lit(42L), col("payload")).as("h2"),
      length(col("payload")).cast("long").as("n_bytes"),
      col(idCol).as("gid"))
      .groupBy(col("h"), col("h2"), col("n_bytes"))
      .agg(min(col("gid")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"), col("n_bytes"))

  /** Perceptual fingerprint of the (stubbed) media content — the aHash
    * recipe (average-hash, the classic perceptual image hash) over
    * [[blockStats]] blocks: bit `b` is set iff block `b`'s mean sample
    * exceeds the whole-payload mean. Exact integers only: the mean
    * comparison is the cross-multiplication
    * `sum_b · n_total > sum_total · n_b` (no division, no floats), so
    * every engine agrees bit-for-bit. 32 bits from the first 32
    * blocks; shorter payloads leave high bits 0.
    *
    * Output `(doc_id, simhash)` plugs straight into
    * [[Dedup.simhashPairs]]'s banded Hamming join (pass `bits = 32` —
    * the aHash is 32-bit) — media near-dup
    * (re-encoded/lightly-edited copies) with the same pigeonhole
    * blocking as text SimHash. The byte→sample decode is the `codec`
    * parameter ([[StubCodec]] by default: codepoints stand in for
    * pixels); the fingerprint algebra, banding, and plan shape are
    * codec-independent and real.
    */
  def perceptualHash(docs: DataFrame, blockSize: Int = 16,
      textCol: String = "text", idCol: String = "doc_id",
      codec: MediaCodec = StubCodec): DataFrame =
    perceptualHashPayload(withPayload(docs, textCol), blockSize, idCol, codec)

  /** [[perceptualHash]] over a frame that already carries a binary
    * `payload` column — the real-media entry point (parquet binary
    * columns + [[graft.operators.ImageIoCodec]]), where no text cast
    * exists. The text form above is the fixture path delegating here.
    */
  def perceptualHashPayload(withPayloadDf: DataFrame, blockSize: Int = 16,
      idCol: String = "doc_id", codec: MediaCodec = StubCodec): DataFrame = {
    val bs = payloadBlockStats(withPayloadDf, blockSize, idCol, codec)
    val tot = bs.groupBy(col(idCol)).agg(
      sum(col("sum_cp")).as("tot_sum"), sum(col("n_cp")).as("tot_n"))
    bs.join(tot, Seq(idCol))
      .filter(col("block_no") < 32)
      .groupBy(col(idCol).as("doc_id"))
      .agg(sum(expr(
        "CASE WHEN sum_cp * tot_n > tot_sum * n_cp " +
          "THEN shiftleft(CAST(1 AS BIGINT), CAST(block_no AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END")).as("simhash"))
  }
}
