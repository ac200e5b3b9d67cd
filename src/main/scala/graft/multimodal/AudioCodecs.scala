package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

/** Pluggable audio codec boundary, mirroring [[ImageCodec]]: the
  * distributed plumbing in [[Multimodal]] is codec-agnostic and this
  * trait is the swap point. [[WavCodec]] is a real implementation for
  * RIFF/WAV PCM built on the JDK's `javax.sound.sampled` (no external
  * deps) — it replaces the deterministic stub for the audio modality.
  * Compressed formats (mp3/ogg/flac) would slot in behind the same
  * trait once a codec library is available.
  */
trait AudioCodec extends Serializable {

  /** Decode a payload; None if the bytes are not decodable audio. */
  def decode(payload: Array[Byte]): Option[AudioCodec.Decoded]

  /** Re-encode at sampleRate / factor by integer decimation (keep
    * every factor-th frame); None if not decodable. The audio analog
    * of [[ImageCodec.resize]]. */
  def decimate(payload: Array[Byte], factor: Int): Option[Array[Byte]]
}

object AudioCodec {

  /** What decode extracts: stream parameters plus the two amplitude
    * features (RMS, peak) a real pipeline would feed to filtering /
    * quality scoring. `nFrames` counts sample frames (one sample per
    * channel); `durationMs` = nFrames / sampleRate. */
  final case class Decoded(
      sampleRate: Int,
      channels: Int,
      bitDepth: Int,
      nFrames: Long,
      durationMs: Double,
      rms: Double,
      peak: Int,
  )
}

/** Real WAV (RIFF PCM) codec on `javax.sound.sampled`. Supports the
  * 16-bit signed PCM profile that synthesized fixtures and the
  * overwhelming majority of real WAV corpora use; anything the JDK
  * parser rejects (or non-16-bit streams) returns None and flows to
  * the caller's stub fallback.
  */
final class WavCodec extends AudioCodec {

  override def decode(payload: Array[Byte]): Option[AudioCodec.Decoded] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
        else {
          val channels = fmt.getChannels
          val frameSize = fmt.getFrameSize // = channels * 2 for 16-bit
          val bytes = ais.readAllBytes()
          val nSamples = bytes.length / 2
          val big = fmt.isBigEndian
          var i = 0
          var sumSq = 0.0
          var peak = 0
          while (i < nSamples) {
            val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
            val hi = bytes(2 * i + (if (big) 0 else 1))
            val v = (hi << 8) | lo // sign-extended via hi byte
            sumSq += v.toDouble * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          val nFrames = (bytes.length / frameSize).toLong
          val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
          Some(AudioCodec.Decoded(
            sampleRate = fmt.getSampleRate.toInt,
            channels = channels,
            bitDepth = 16,
            nFrames = nFrames,
            durationMs = nFrames * 1000.0 / fmt.getSampleRate,
            rms = rms,
            peak = peak,
          ))
        }
      } finally ais.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: java.io.IOException           => None
    }

  override def decimate(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor > 0, s"decimation factor must be positive: $factor")
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val channels = fmt.getChannels
          val frameSize = fmt.getFrameSize
          val bytes = ais.readAllBytes()
          val nFrames = bytes.length / frameSize
          val kept = (nFrames + factor - 1) / factor
          val outRate = fmt.getSampleRate.toInt / factor
          Some(WavCodec.writeWav(outRate, channels, kept, (f, buf, off) =>
            System.arraycopy(bytes, f * factor * frameSize, buf, off, frameSize)))
        }
      } finally ais.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: java.io.IOException           => None
    }
  }
}

object WavCodec {

  private val SampleRate = 8000

  /** Deterministic WAV synthesis for tests/oracles: an 8 kHz 16-bit
    * PCM square wave whose parameters derive from `id` by arithmetic
    * an external SQL oracle can reproduce — decode(synthWav(id)) must
    * yield exactly:
    *
    *   channels    = 1 + id % 2
    *   n_frames    = 400 + 2 * (id % 50)          (always even)
    *   duration_ms = n_frames / 8.0               (exact: /2^3)
    *   amplitude   = ((id % 1000) + 1) * 16       (≤ 16016 < 2^15)
    *   rms  = amplitude  (square wave: every sample is ±amplitude, and
    *          with an even frame count sum(v²)/n = amplitude² exactly
    *          in double — all intermediates < 2^53 — so IEEE sqrt
    *          returns the integer amplitude exactly)
    *   peak = amplitude
    *
    * This turns the audio decode path into an oracle-checkable query
    * instead of a rows-only check, the same trick as
    * [[ImageIoCodec.synthPng]].
    */
  def synthWav(id: Long): Array[Byte] = {
    val channels = (1 + id % 2).toInt
    val nFrames = (400 + 2 * (id % 50)).toInt
    val amp = (((id % 1000) + 1) * 16).toInt
    writeWav(SampleRate, channels, nFrames, (f, buf, off) => {
      val v = if (f % 2 == 0) amp else -amp
      var c = 0
      while (c < channels) {
        buf(off + 2 * c) = (v & 0xff).toByte
        buf(off + 2 * c + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
    })
  }

  /** Canonical 44-byte-header little-endian 16-bit PCM writer;
    * `frameWriter(frameIndex, buf, byteOffset)` fills one frame
    * (channels × 2 bytes). */
  private[multimodal] def writeWav(
      sampleRate: Int,
      channels: Int,
      nFrames: Int,
      frameWriter: (Int, Array[Byte], Int) => Unit,
  ): Array[Byte] = {
    val frameSize = channels * 2
    val dataLen = nFrames * frameSize
    val out = new Array[Byte](44 + dataLen)
    def w32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); w32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1 /* PCM */)
    w16(22, channels); w32(24, sampleRate)
    w32(28, sampleRate * frameSize); w16(32, frameSize); w16(34, 16)
    tag(36, "data"); w32(40, dataLen)
    var f = 0
    while (f < nFrames) {
      frameWriter(f, out, 44 + f * frameSize)
      f += 1
    }
    out
  }
}
