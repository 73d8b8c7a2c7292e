package graft.operators

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

import graft.operators.Multimodal.MediaCodec

/** Real audio [[Multimodal.MediaCodec]] over `javax.sound.sampled` —
  * the audio half of the codec seam, pure JVM like [[ImageIoCodec]]
  * (stock JRE 17 registers WAV/AIFF/AU readers; PCM 8-bit
  * unsigned / 16-bit+ signed, mono or multichannel). Zero operator
  * edits: [[Multimodal.audioFingerprint]] and the payload-dedup chain
  * consume it through the same trait the stub and the image codec
  * already satisfy.
  *
  * Contract mapping (the trait's image-shaped metadata re-read for
  * audio, pinned):
  *  - `decode` → container byte length, 4-byte magic prefix
  *    (`52494646` = "RIFF" for WAV), and `(width, height)` =
  *    `(sample rate in Hz, channel count)` — the two axes an audio
  *    curation filter screens on, in the slots a video frame would
  *    use. Undecodable or non-PCM payloads yield 0×0, the
  *    corrupt-frame convention.
  *  - `frameCount` → PCM FRAMES (one sample per channel):
  *    `data bytes / frame size`. The fingerprint's `win`-sample
  *    windows are cut downstream from the sample stream itself.
  *  - `samples` → the decoded PCM stream in file order (frames
  *    interleave channels), each sample an exact integer: signed
  *    values sign-extended from their declared bit width, 8-bit
  *    unsigned PCM kept 0..255 as decoded. No normalization, no
  *    floats — [[Multimodal.audioFingerprint]]'s window-energy
  *    deltas are bit-deterministic in these integers, and its
  *    volume-robustness comes from the delta SIGNS, not from any
  *    scaling here.
  *
  * Determinism scope: PCM WAV is a lossless container — the sample
  * bytes ARE the payload, so fingerprints agree across any conforming
  * JVM (stronger than the JPEG caveat on the image side). Compressed
  * encodings (μ-law, MP3) have no stock-JRE decoder and degrade to
  * the undecodable path rather than silently resampling.
  *
  * Instances are stateless and serializable (no fields; decoding
  * happens per payload inside the partition task) — the codec seam's
  * ship-inside-`mapPartitions` requirement.
  */
final class WavCodec extends MediaCodec {

  /** Integer-PCM gate shared by the header and full-decode paths. */
  private def isIntPcm(fmt: AudioFormat): Boolean = {
    val enc = fmt.getEncoding
    (enc == AudioFormat.Encoding.PCM_SIGNED ||
      enc == AudioFormat.Encoding.PCM_UNSIGNED) &&
      fmt.getSampleSizeInBits % 8 == 0 &&
      fmt.getSampleSizeInBits >= 8 && fmt.getSampleSizeInBits <= 32
  }

  /** HEADER-ONLY parse — `getAudioFileFormat` reads the container
    * header without draining the PCM stream, so the metadata methods
    * ([[decode]], [[frameCount]]) never copy sample bytes (a
    * metadata-only corpus pass stays O(header), not O(payload)).
    */
  private def header(payload: Array[Byte]): Option[javax.sound.sampled.AudioFileFormat] =
    try {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
      if (isIntPcm(aff.getFormat)) Some(aff) else None
    } catch {
      case _: UnsupportedAudioFileException => None
      case scala.util.control.NonFatal(_)   => None
    }

  /** Decoded `(format, pcmBytes)`, or None for anything a stock
    * reader does not claim or that is not integer PCM. IO/format
    * errors mean "not decodable audio", never "fail the task".
    */
  private def pcm(payload: Array[Byte]): Option[(AudioFormat, Array[Byte])] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        if ((enc == AudioFormat.Encoding.PCM_SIGNED ||
            enc == AudioFormat.Encoding.PCM_UNSIGNED) &&
            fmt.getSampleSizeInBits % 8 == 0 &&
            fmt.getSampleSizeInBits >= 8 && fmt.getSampleSizeInBits <= 32)
          Some((fmt, ais.readAllBytes()))
        else None
      } finally ais.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case scala.util.control.NonFatal(_)   => None
    }

  def decode(payload: Array[Byte]): (Long, String, Long, Long) = {
    val n = payload.length.toLong
    val magic = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
    header(payload) match {
      case Some(aff) =>
        val fmt = aff.getFormat
        (n, magic, fmt.getSampleRate.toLong, fmt.getChannels.toLong)
      case None => (n, magic, 0L, 0L)
    }
  }

  /** Header frame length when the container declares one (WAV always
    * does); the full-decode byte count is the fallback. Pinned: for a
    * data-truncated file whose header still parses, this reports the
    * DECLARED length while [[samples]] streams what is actually there
    * — metadata describes the container, samples describe the bytes.
    */
  def frameCount(payload: Array[Byte]): Long =
    header(payload) match {
      case Some(aff) if aff.getFrameLength >= 0 => aff.getFrameLength.toLong
      case Some(_) =>
        pcm(payload) match {
          case Some((fmt, bytes)) if fmt.getFrameSize > 0 =>
            bytes.length.toLong / fmt.getFrameSize
          case _ => 0L
        }
      case None => 0L
    }

  def samples(payload: Array[Byte]): Iterator[Long] =
    pcm(payload) match {
      case None => Iterator.empty
      case Some((fmt, bytes)) =>
        val bps = fmt.getSampleSizeInBits / 8
        val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val big = fmt.isBigEndian
        val n = bytes.length / bps
        (0 until n).iterator.map { i =>
          var v = 0L
          var k = 0
          while (k < bps) {
            // assemble most-significant-first regardless of file order
            val idx = i * bps + (if (big) k else bps - 1 - k)
            v = (v << 8) | (bytes(idx) & 0xffL)
            k += 1
          }
          if (signed) { val shift = 64 - bps * 8; (v << shift) >> shift }
          else v
        }
    }
}
