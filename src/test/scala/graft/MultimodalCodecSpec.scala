package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.{ImageIoCodec, Multimodal}

/** [[graft.operators.ImageIoCodec]] against real checked-in media
  * bytes — the proof the [[Multimodal.MediaCodec]] seam carries an
  * actual decoder, not just the deterministic stub.
  *
  * Fixtures (src/test/resources, generated with pinned pixel values):
  *  - `tiny4x4.png`: 4×4 RGB PNG, 79 bytes. Row-major grayscale rows
  *    (10,10,10)/(50,50,50)/(100,100,100)/(200,200,200) → integer
  *    Rec.601 lumas 10/50/100/200 per row.
  *  - `tiny2x2.bmp`: 2×2 24-bit BMP, 70 bytes. Pixels (row-major,
  *    top-down) red/green/blue/white → lumas 76/149/29/255.
  *  - `tiny4x4.jpg`: 4×4 JPEG (quality 0.9), 648 bytes, same grayscale
  *    rows as the PNG. Lossy: this JRE's reader yields 10/51/99/201 —
  *    pinned as JRE-reader values, not format-pinned truth (the
  *    scaladoc's determinism scope).
  *  - `anim2x2.gif`: 2×2 two-frame animated GIF, 71 bytes. Frame 1
  *    red/green/blue/black as written through the JRE's GIF writer
  *    (whose palette quantized blue to black at generation time);
  *    frame 2 all black.
  *  - `near8a.png` / `near8b.png`: 8×8 alternating dark(30)/bright(220)
  *    rows; `b` differs by ONE pixel ((3,2): 30 → 255). With
  *    blockSize=2 their 32-bit aHashes differ in exactly 1 bit — the
  *    real-bytes fixture for the perceptual near-dup chain.
  *  - `scene4f2x2.gif`: 2×2 FOUR-frame animated GIF, 108 bytes —
  *    frames 1-2 uniform gray 30, frames 3-4 uniform gray 220 (gray
  *    survives GIF palettization exactly): the video fixture with a
  *    hard scene cut at frame 3, for
  *    [[graft.operators.MultiFrameImageCodec]].
  */
class MultimodalCodecSpec extends SparkSpec {

  private val codec = new ImageIoCodec

  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    try in.readAllBytes() finally in.close()
  }

  private lazy val png = resourceBytes("/tiny4x4.png")
  private lazy val bmp = resourceBytes("/tiny2x2.bmp")
  private lazy val jpg = resourceBytes("/tiny4x4.jpg")
  private lazy val gif = resourceBytes("/anim2x2.gif")
  private lazy val nearA = resourceBytes("/near8a.png")
  private lazy val nearB = resourceBytes("/near8b.png")

  private def payloadDf(rows: (Long, Array[Byte])*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, p) => Row(id, p) }, 2),
      schema)
  }

  test("decodes a real PNG: container magic + raster dimensions") {
    assert(codec.decode(png) === ((79L, "89504e47", 4L, 4L)))
  }

  test("decodes a real BMP: second registered format through the same seam") {
    assert(codec.decode(bmp) === ((70L, "424d4600", 2L, 2L)))
  }

  test("PNG pixel samples are the exact integer Rec.601 lumas, row-major") {
    assert(codec.samples(png).toSeq ===
      Seq(10L, 10L, 10L, 10L, 50L, 50L, 50L, 50L,
        100L, 100L, 100L, 100L, 200L, 200L, 200L, 200L))
    assert(codec.samples(bmp).toSeq === Seq(76L, 149L, 29L, 255L))
  }

  test("undecodable bytes degrade to 0x0 / no frames / no samples, not a task failure") {
    val junk = "not an image at all".getBytes("UTF-8")
    val (n, magic, w, h) = codec.decode(junk)
    assert(n === junk.length.toLong && w === 0L && h === 0L)
    assert(magic === "6e6f7420")
    assert(codec.frameCount(junk) === 0L)
    assert(codec.samples(junk).isEmpty)
    // truncated PNG: a claiming reader that then fails must also degrade
    val truncated = png.take(30)
    assert(codec.decode(truncated)._3 === 0L)
    assert(codec.samples(truncated).isEmpty)
  }

  test("frameCount: single-frame containers report exactly 1") {
    assert(codec.frameCount(png) === 1L)
    assert(codec.frameCount(bmp) === 1L)
    assert(codec.frameCount(jpg) === 1L)
  }

  test("JPEG decodes through the same seam: dims, magic, repeat-call determinism") {
    assert(codec.decode(jpg) === ((648L, "ffd8ffe0", 4L, 4L)))
    // lossy format, JRE-reader-pinned lumas (scaladoc determinism
    // scope): the source rows 10/50/100/200 round-trip to 10/51/99/201
    // under this JRE's JPEG codec — within the ±1–2-step band a lossy
    // decode may sit, and stable on every call
    val expected = Seq(10L, 10L, 10L, 10L, 51L, 51L, 51L, 51L,
      99L, 99L, 99L, 99L, 201L, 201L, 201L, 201L)
    assert(codec.samples(jpg).toSeq === expected)
    assert(codec.samples(jpg).toSeq === expected) // fresh decode, same bits
  }

  test("animated GIF: frameCount scans the container, decode/samples use frame 1") {
    assert(codec.frameCount(gif) === 2L)
    assert(codec.decode(gif) === ((71L, "47494638", 2L, 2L)))
    // frame 1 as stored (the generating writer's palette quantized blue
    // to black — GIF decode itself is lossless on the stored palette)
    assert(codec.samples(gif).toSeq === Seq(76L, 149L, 0L, 0L))
  }

  test("one-pixel-edited real PNGs survive the perceptual near-dup chain end-to-end") {
    // the multimodal dedup story on REAL bytes: decode → 32-bit aHash →
    // banded simhash pair join at maxHamming=3, plus an unrelated image
    // (the checkerboard fixtures vs the graded-rows PNG) that must NOT pair
    val df = payloadDf(1L -> nearA, 2L -> nearB, 3L -> png)
    val hashes = Multimodal.perceptualHashPayload(df, blockSize = 2, codec = codec)
    val pairs = graft.operators.Dedup.simhashPairs(hashes, maxHamming = 3, bits = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1L)),
      s"expected exactly the edited pair at hamming 1, got ${pairs.toSeq}")
  }

  test("decodeMeta over a binary payload column with the real codec") {
    val df = payloadDf(1L -> png, 2L -> bmp, 3L -> null)
    assert(rowSet(Multimodal.decodeMeta(df, codec = codec)) === Set(
      Seq(1L, 79L, "89504e47", 4L, 4L),
      Seq(2L, 70L, "424d4600", 2L, 2L),
      Seq(3L, null, null, null, null)))
  }

  test("resizeMeta plans the integer fit-into-box from real decoded dims") {
    val df = payloadDf(1L -> png)
    // 4x4 into 2x2: scaleE3 = min(1000, 2000/4, 2000/4) = 500 -> 2x2
    assert(rowSet(Multimodal.resizeMeta(df, 2, 2, codec = codec)) ===
      Set(Seq(1L, 4L, 4L, 2L, 2L)))
  }

  test("perceptualHash over real pixels matches the hand-computed aHash") {
    // blockSize=4 over the 4x4 PNG: block b = pixel row b.
    //   block sums 40/200/400/800, total (sum=1440, n=16) -> mean 90.
    //   bit b set iff sum_b*16 > 1440*4 (=5760): rows 100 (6400) and
    //   200 (12800) only -> bits 2,3 -> aHash = 0b1100 = 12.
    val df = payloadDf(1L -> png)
    val out = Multimodal.perceptualHashPayload(df, blockSize = 4, codec = codec)
    assert(rowSet(out) === Set(Seq(1L, 12L)))
  }

  test("payloadBlockStats streams real decoded samples in blocks") {
    val df = payloadDf(1L -> png)
    assert(rowSet(Multimodal.payloadBlockStats(df, 4, codec = codec)) === Set(
      Seq(1L, 0L, 4L, 40L, 10L, 10L),
      Seq(1L, 1L, 4L, 200L, 50L, 50L),
      Seq(1L, 2L, 4L, 400L, 100L, 100L),
      Seq(1L, 3L, 4L, 800L, 200L, 200L)))
  }

  test("frameSample emits one row per frame index from the real container") {
    val df = payloadDf(1L -> png)
    assert(rowSet(Multimodal.frameSample(df, 1, codec = codec)) ===
      Set(Seq(1L, 0L, 1L)))
  }

  // ---- the audio half of the seam: graft.operators.WavCodec --------
  // Fixtures (src/test/resources, generated with pinned PCM values):
  //  - tone16.wav: mono 16-bit signed LE, 8000 Hz, 16 samples
  //    0,100,200,300, 1000x4, -500x4, 3,1,4,1 (76 bytes).
  //  - stereo8.wav: stereo 8-bit UNSIGNED, 8000 Hz, 4 frames, bytes
  //    0,255,128,127,10,20,30,40 interleaved L/R (52 bytes).

  private val wav = new graft.operators.WavCodec
  private lazy val tone16 = resourceBytes("/tone16.wav")
  private lazy val stereo8 = resourceBytes("/stereo8.wav")

  test("WAV decode: RIFF magic, (sample rate, channels) in the dim slots") {
    assert(wav.decode(tone16) === ((76L, "52494646", 8000L, 1L)))
    assert(wav.decode(stereo8) === ((52L, "52494646", 8000L, 2L)))
  }

  test("WAV samples are the exact PCM integers: 16-bit signed and 8-bit unsigned") {
    assert(wav.samples(tone16).toSeq === Seq(0L, 100L, 200L, 300L,
      1000L, 1000L, 1000L, 1000L, -500L, -500L, -500L, -500L, 3L, 1L, 4L, 1L))
    // unsigned 8-bit stays 0..255, channels interleaved in file order
    assert(wav.samples(stereo8).toSeq ===
      Seq(0L, 255L, 128L, 127L, 10L, 20L, 30L, 40L))
    assert(wav.frameCount(tone16) === 16L)
    assert(wav.frameCount(stereo8) === 4L) // 8 bytes / 2-byte frames
  }

  test("undecodable or truncated audio degrades, never fails the task") {
    val junk = "definitely not audio".getBytes("UTF-8")
    assert(wav.decode(junk) === ((20L, "64656669", 0L, 0L)))
    assert(wav.frameCount(junk) === 0L)
    assert(wav.samples(junk).isEmpty)
    // truncated header: a claiming reader that then fails also degrades
    val truncated = tone16.take(10)
    assert(wav.decode(truncated)._3 === 0L)
    assert(wav.samples(truncated).isEmpty)
    // an IMAGE through the audio codec degrades (and vice versa the
    // image codec rejects WAV) — the two seams don't cross-claim
    assert(wav.decode(png)._3 === 0L)
    assert(codec.decode(tone16)._3 === 0L)
  }

  test("audioFingerprint over the real WAV codec matches hand-computed window energies") {
    // win=4 over tone16: energies 600, 4000, -2000, 9 ->
    // delta signs up(1), down(0), up(1) -> fp = 1 | 4 = 5, 4 windows.
    // The operator is UNCHANGED — only the codec is injected (the
    // ImageIoCodec precedent: real decode, zero operator edits).
    val df = payloadDf(1L -> tone16, 2L -> null)
    assert(rowSet(Multimodal.audioFingerprint(df, win = 4, codec = wav)) ===
      Set(Seq(1L, 4L, 5L), Seq(2L, null, null)))
    // volume robustness on real PCM: doubling every sample doubles
    // every window energy - the delta SIGNS (the fingerprint) survive
    val doubled = {
      import java.io.ByteArrayInputStream
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(tone16))
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      val out = new java.io.ByteArrayOutputStream()
      val scaled = new Array[Byte](data.length)
      var i = 0
      while (i < data.length / 2) {
        val v = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
        val d = (v * 2).toShort
        scaled(2 * i) = (d & 0xff).toByte
        scaled(2 * i + 1) = ((d >> 8) & 0xff).toByte
        i += 1
      }
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new ByteArrayInputStream(scaled), fmt, scaled.length / fmt.getFrameSize),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val fps = Multimodal.audioFingerprint(
      payloadDf(1L -> tone16, 2L -> doubled), win = 4, codec = wav)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fps(1L) === fps(2L), "fingerprint must survive volume scaling")
  }

  // ---- the video half of the seam: graft.operators.MultiFrameImageCodec ----
  // scene4f2x2.gif: 2×2 four-frame animated GIF (generated through the
  // JRE's GIF sequence writer with pinned gray values): frames 1-2
  // uniform gray 30, frames 3-4 uniform gray 220 — a hard scene cut at
  // frame 3. Gray survives GIF palettization exactly, so lumas are
  // format-pinned (lossless) across conforming JVMs.

  private val video = new graft.operators.MultiFrameImageCodec
  private lazy val scene = resourceBytes("/scene4f2x2.gif")

  test("multi-frame codec: container decode, exact frame count, per-frame lumas") {
    assert(video.decode(scene) === ((108L, "47494638", 2L, 2L)))
    assert(video.frameCount(scene) === 4L)
    // frames concatenated in presentation order, 4 lumas per frame
    assert(video.samples(scene).toSeq ===
      (Seq.fill(8)(30L) ++ Seq.fill(8)(220L)))
    // stills are the single-frame degenerate case: identical sample
    // stream to the stills codec — the strict-superset claim
    assert(video.frameCount(png) === 1L)
    assert(video.samples(png).toSeq === codec.samples(png).toSeq)
    // non-media bytes degrade: 0 frames, empty samples, 0×0 decode
    val junk = "not an image at all".getBytes("UTF-8")
    assert(video.frameCount(junk) === 0L)
    assert(video.samples(junk).isEmpty)
    assert(video.decode(junk)._3 === 0L)
  }

  test("frameSample + sceneCutsPayload run REAL video frames through unchanged operators") {
    val df = payloadDf(1L -> scene, 2L -> null)
    // frameSample with stride 2 over the real 4-frame count
    assert(rowSet(Multimodal.frameSample(df, stride = 2, codec = video)) ===
      Set(Seq(1L, 0L, 4L), Seq(1L, 2L, 4L)))
    // blockSize = 4 pixels = one frame per block: the block-mean-delta
    // rule becomes a real scene-change detector — exactly one cut, at
    // the frame-3 boundary (deltas 0, 190000e-3, 0)
    val cuts = Multimodal.sceneCutsPayload(
        df, blockSize = 4, thresholdE3 = 2000, codec = video)
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(cuts === Map(
      1L -> ((0L, false)), 2L -> ((190000L, true)), 3L -> ((0L, false))))
    // the aHash fingerprint also composes over the frame stream:
    // 4 blocks, dark-dark-bright-bright -> bits 2,3 set
    val ah = Multimodal.perceptualHashPayload(
        payloadDf(1L -> scene), blockSize = 4, codec = video)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ah(1L) === 12L)
  }
}
