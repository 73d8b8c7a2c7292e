package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal.MediaCodec

/** Real [[Multimodal.MediaCodec]] over `javax.imageio` — pure JVM, no
  * native libraries, so it ships anywhere the engine does. Decodes
  * every format the JRE registers readers for (PNG, BMP, GIF, JPEG,
  * WBMP on a stock JRE 17).
  *
  * Contract mapping:
  *  - `decode` → container byte length, 4-byte magic prefix (format
  *    sniffing, same shape as [[Multimodal.StubCodec]]), and the
  *    decoded raster's width×height. Undecodable payloads yield 0×0 —
  *    the degenerate-dimension convention [[Multimodal.FakeResizer]]
  *    and downstream operators already treat as "corrupt frame, keep
  *    the row, don't kill the task".
  *  - `frameCount` → number of images in the container
  *    (`ImageReader.getNumImages`): 1 for PNG/BMP/JPEG, n for animated
  *    GIF, 0 when no registered reader claims the bytes.
  *  - `samples` → row-major integer luma per pixel, the Rec.601 weights
  *    in exact fixed-point: `(299·R + 587·G + 114·B) div 1000`. Integer
  *    math end to end, so [[Multimodal.perceptualHash]]'s
  *    cross-multiplied aHash is bit-for-bit deterministic in the
  *    decoded samples — the property the dedup operators rely on.
  *
  * Determinism scope: for LOSSLESS formats (PNG, BMP, GIF) the decoded
  * samples are pinned by the format itself, so hashes agree across any
  * conforming JVM. JPEG is lossy: decoding is deterministic for a
  * given JRE's registered reader (same bytes → same lumas, every
  * call), but different JPEG decoder implementations may legitimately
  * differ by ±1–2 luma steps, so cross-JVM hash equality is NOT
  * guaranteed for JPEG — hash and dedup JPEG corpora on one runtime
  * image (the normal cluster deployment), or re-encode losslessly
  * first. `javax.imageio` is stills-only: video and audio containers
  * have no registered readers and degrade to 0×0 / 0 frames / empty
  * samples like any undecodable payload.
  *
  * Instances are stateless and serializable (the class carries no
  * fields; `ImageIO` is called per payload inside the partition task),
  * satisfying the codec seam's ship-inside-`mapPartitions` requirement.
  */
final class ImageIoCodec extends MediaCodec {

  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    // ImageIO.read returns null (not throws) for "no reader claims
    // this"; IO/format errors from a claiming reader surface as
    // exceptions — both mean "not decodable media", not "fail the task"
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  def decode(payload: Array[Byte]): (Long, String, Long, Long) = {
    val n = payload.length.toLong
    val magic = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
    readImage(payload) match {
      case Some(img) => (n, magic, img.getWidth.toLong, img.getHeight.toLong)
      case None      => (n, magic, 0L, 0L)
    }
  }

  def frameCount(payload: Array[Byte]): Long =
    // the whole body is degrade-don't-fail, matching decode/samples:
    // createImageInputStream and close() throw IOException outside any
    // inner catch (e.g. unwritable ImageIO cache dir), and that must
    // yield 0 frames, not a dead Spark task
    try {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      if (in == null) 0L
      else
        try {
          val readers = ImageIO.getImageReaders(in)
          if (!readers.hasNext) 0L
          else {
            val reader = readers.next()
            try {
              reader.setInput(in)
              // allowSearch=true: scan the container for the exact count
              // (animated GIF) instead of returning -1 "unknown"
              reader.getNumImages(true).toLong
            } finally reader.dispose()
          }
        } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => 0L }

  def samples(payload: Array[Byte]): Iterator[Long] =
    readImage(payload) match {
      case None => Iterator.empty
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        for {
          y <- (0 until h).iterator
          x <- (0 until w).iterator
          // sRGB regardless of raster layout
        } yield ImageSamples.luma(img.getRGB(x, y))
    }
}

/** The one Rec.601 luma formula both image codecs share
  * ([[ImageIoCodec]], [[MultiFrameImageCodec]]) — exact fixed-point
  * `(299·R + 587·G + 114·B) div 1000`, so perceptual hashes computed
  * through either codec agree bit-for-bit on the same pixels. A
  * single definition: a future luma change cannot silently diverge
  * the codecs' fingerprints.
  */
private[operators] object ImageSamples {
  def luma(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299L * r + 587L * g + 114L * b) / 1000L
  }
}
