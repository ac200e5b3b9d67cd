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

/** Real WAV (RIFF PCM) codec. The hot path is a direct RIFF chunk
  * parse ([[RiffPcm]]) for the 16-bit little-endian PCM profile that
  * synthesized fixtures and the overwhelming majority of real WAV
  * corpora use: `javax.sound`'s `AudioSystem.getAudioInputStream`
  * costs ~110 µs/record in SPI provider lookup alone (measured,
  * ARCHITECTURE.md scale appendix) — 5× the image path's entire
  * per-record decode — which dominates any real audio corpus. The
  * javax path remains as the fallback for everything the fast parser
  * declines (AIFF/AU containers, big-endian or non-16-bit streams),
  * so the accepted format set only grows. Payloads neither parser
  * accepts return None and flow to the caller's stub fallback.
  */
final class WavCodec extends AudioCodec {

  override def decode(payload: Array[Byte]): Option[AudioCodec.Decoded] =
    RiffPcm.parse(payload) match {
      case Some(c) =>
        // Identical arithmetic to the javax path below: the "bytes"
        // there are exactly this data chunk, so rms/peak/nFrames agree
        // bit-for-bit and the DuckDB oracle replay is unaffected.
        val frameSize = c.channels * 2
        val nSamples = c.dataLen / 2
        var i = 0
        var sumSq = 0.0
        var peak = 0
        while (i < nSamples) {
          val lo = payload(c.dataOff + 2 * i) & 0xff
          val hi = payload(c.dataOff + 2 * i + 1)
          val v = (hi << 8) | lo // sign-extended via hi byte
          sumSq += v.toDouble * v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += 1
        }
        val nFrames = (c.dataLen / frameSize).toLong
        val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
        Some(AudioCodec.Decoded(
          sampleRate = c.sampleRate,
          channels = c.channels,
          bitDepth = 16,
          nFrames = nFrames,
          durationMs = nFrames * 1000.0 / c.sampleRate,
          rms = rms,
          peak = peak,
        ))
      case None => decodeJavax(payload)
    }

  private def decodeJavax(payload: Array[Byte]): Option[AudioCodec.Decoded] =
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
    RiffPcm.parse(payload) match {
      case Some(c) =>
        val frameSize = c.channels * 2
        val nFrames = c.dataLen / frameSize
        val kept = (nFrames + factor - 1) / factor
        val outRate = c.sampleRate / factor
        Some(WavCodec.writeWav(outRate, c.channels, kept, (f, buf, off) =>
          System.arraycopy(payload, c.dataOff + f * factor * frameSize, buf, off, frameSize)))
      case None => decimateJavax(payload, factor)
    }
  }

  private def decimateJavax(payload: Array[Byte], factor: Int): Option[Array[Byte]] =
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

/** Direct RIFF/WAVE chunk walker for the 16-bit little-endian signed
  * PCM profile — the zero-allocation replacement for the per-record
  * `AudioSystem` SPI provider lookup. Anything outside that profile
  * (non-RIFF container, compressed/extensible format codes, other bit
  * depths, malformed or truncated headers) returns None and the caller
  * falls back to javax, so this parser only ever needs to be RIGHT,
  * never complete. */
private[multimodal] object RiffPcm {

  /** fmt + data chunk facts needed to decode in place: the data chunk
    * is payload(dataOff until dataOff + dataLen). */
  final case class Chunks(sampleRate: Int, channels: Int, dataOff: Int, dataLen: Int)

  def parse(b: Array[Byte]): Option[Chunks] = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int, s: String): Boolean =
      b(o) == s.charAt(0) && b(o + 1) == s.charAt(1) &&
        b(o + 2) == s.charAt(2) && b(o + 3) == s.charAt(3)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var sampleRate = 0
    var channels = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    // Chunks are word-aligned: an odd-sized chunk carries a pad byte.
    while (off + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val size = u32(off + 4)
      if (size > Int.MaxValue - 8 || off + 8 + size > b.length) return None
      if (tag(off, "fmt ")) {
        if (size < 16) return None
        val formatCode = u16(off + 8)
        channels = u16(off + 10)
        sampleRate = u32(off + 12).toInt
        val bits = u16(off + 22)
        // format code 1 = integer PCM; 0xFFFE (extensible) and
        // compressed codes go to javax, as do non-16-bit streams.
        fmtOk = formatCode == 1 && bits == 16 && channels > 0 && sampleRate > 0
        if (!fmtOk) return None
      } else if (tag(off, "data")) {
        dataOff = off + 8
        dataLen = size.toInt
      }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    if (fmtOk && dataOff >= 0) Some(Chunks(sampleRate, channels, dataOff, dataLen))
    else None
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
