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
  */
class MultimodalCodecSpec extends SparkSpec {

  private val codec = new ImageIoCodec

  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    try in.readAllBytes() finally in.close()
  }

  private lazy val png = resourceBytes("/tiny4x4.png")
  private lazy val bmp = resourceBytes("/tiny2x2.bmp")

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
}
