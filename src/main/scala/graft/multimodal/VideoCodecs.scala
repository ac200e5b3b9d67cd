package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** Pluggable frame-sequence codec boundary — the "video" analog of
  * [[ImageCodec]]/[[AudioCodec]]. [[GifFrameCodec]] is a real
  * implementation on the JDK's multi-frame GIF reader/writer (no
  * external deps): animated GIF is the one motion format the sandbox
  * can genuinely decode, so frame sampling over it exercises a real
  * demux→decode loop. A true video codec (mp4/h264 via FFI) would slot
  * in behind the same trait.
  */
trait FrameCodec extends Serializable {

  /** Decode a payload into its frame sequence (dimensions + channel
    * means per frame); None if the bytes are not a decodable
    * multi-frame stream. */
  def frames(payload: Array[Byte]): Option[Vector[ImageCodec.Decoded]]
}

/** Magic-byte dispatch over the sandbox's two REAL motion formats:
  * `RIFF…AVI ` payloads go to the MJPEG demuxer, everything else to
  * the multi-frame GIF reader. The default codec of
  * [[Multimodal.sampleFrameFeatures]], so mixed media tables demux
  * per-row without caller dispatch. */
final class AutoFrameCodec extends FrameCodec {
  private val gif = new GifFrameCodec
  private val avi = new AviMjpegFrameCodec

  override def frames(payload: Array[Byte]): Option[Vector[ImageCodec.Decoded]] =
    if (payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F')
      avi.frames(payload)
    else gif.frames(payload)
}

/** Real MJPEG-in-AVI video codec on the JDK alone: the RIFF chunk walk
  * (same parser discipline as WavCodec's RIFF walk over WAVE) finds
  * the `movi` LIST, every `##dc`/`##db` frame chunk inside it is a
  * standalone baseline JPEG, and each decodes via `javax.imageio`'s
  * JPEG reader. This replaces the byte-chunk stub as the honest video
  * path: a genuine container demux feeding a genuine image decode,
  * per frame. (An mp4/h264 codec would need native FFI the sandbox
  * lacks; it would slot in behind the same [[FrameCodec]] trait.) */
final class AviMjpegFrameCodec extends FrameCodec {
  ImageIO.setUseCache(false)

  override def frames(payload: Array[Byte]): Option[Vector[ImageCodec.Decoded]] =
    AviMjpeg.demux(payload).flatMap { jpegs =>
      val decoded = jpegs.map { j =>
        try Option(ImageIO.read(new ByteArrayInputStream(j)))
        catch { case _: java.io.IOException => None }
      }
      // one undecodable frame chunk ⇒ not a stream we can vouch for:
      // fall back (None) rather than silently dropping frames
      if (decoded.exists(_.isEmpty)) None
      else Some(decoded.map(d => GifFrameCodec.channelMeans(d.get)))
    }
}

/** RIFF-AVI demux/synthesis helpers (pure byte-level, no Spark). */
object AviMjpeg {

  /** Frame payloads (JPEG bytes) of an MJPEG AVI, in stream order:
    * walks the top-level RIFF chunks, descends into `movi` (and the
    * `rec ` grouping LISTs some muxers emit), and collects every
    * `##dc`/`##db` chunk. None when the container is not RIFF/AVI,
    * is structurally broken (chunk overruns its parent), or carries
    * no frame chunks. */
  def demux(payload: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (payload.length < 12) return None
    def str4(off: Int) = new String(payload, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    if (str4(0) != "RIFF" || str4(8) != "AVI ") return None
    val end = math.min(payload.length.toLong, 8L + u32(4))
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Long, to: Long): Boolean = {
      var off = from
      while (off + 8 <= to) {
        val id = str4(off.toInt)
        val sz = u32(off.toInt + 4)
        val dataStart = off + 8
        if (dataStart + sz > to) return false // truncated/corrupt chunk
        if (id == "LIST") {
          if (sz < 4) return false
          val listType = str4(dataStart.toInt)
          if (listType == "movi" || listType == "rec ")
            if (!walk(dataStart + 4, dataStart + sz)) return false
        } else if (id.substring(0, 2).forall(_.isDigit) &&
          (id.endsWith("dc") || id.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(
            payload, dataStart.toInt, (dataStart + sz).toInt)
        }
        off = dataStart + sz + (sz & 1L) // chunks pad to even offsets
      }
      true
    }
    if (!walk(12L, end)) None
    else {
      val fs = frames.result()
      if (fs.isEmpty) None else Some(fs)
    }
  }

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
    cc(id) ++ u32le(data.length.toLong) ++ data ++ pad
  }
  private def list(listType: String, children: Array[Byte]*): Array[Byte] =
    chunk("LIST", cc(listType) ++ children.flatten)

  /** Deterministic MJPEG-AVI synthesis for tests/oracles: a
    * structurally complete AVI (avih + strl with an MJPG stream header
    * and BITMAPINFOHEADER, then the movi frame list) whose GEOMETRY
    * derives from `id` by arithmetic an external SQL oracle can
    * reproduce — demuxing + decoding synthAvi(id) yields exactly:
    *
    *   width    = 16 + id % 8
    *   height   = 16 + (id / 8) % 8
    *   n_frames = 3 + id % 4
    *   frame f  : solid gray g = (id + 41·f) % 256
    *
    * Geometry and frame count round-trip EXACTLY (they live in the
    * container and the JPEG headers). The gray level does NOT — JPEG
    * is lossy (DC quantization + fixed-point YCbCr round-trip), so
    * decoded channel means land within a small tolerance of g; specs
    * assert the tolerance, and oracle-compared queries expose only the
    * exact columns. That split is the honest contract of a lossy
    * codec, vs the GIF path where indexed pixels round-trip exactly. */
  def synthAvi(id: Long): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
    val w = (16 + id % 8).toInt
    val h = (16 + (id / 8) % 8).toInt
    val nFrames = (3 + id % 4).toInt
    val jpegs = (0 until nFrames).map { f =>
      val gray = ((id + 41L * f) % 256).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, w, h)
      g2.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih",
      u32le(40000L) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++ // usec/frame, maxbps, padding, flags
        u32le(nFrames.toLong) ++ u32le(0) ++ u32le(1) ++ u32le(0) ++ // totalframes, initial, streams, sugbuf
        u32le(w.toLong) ++ u32le(h.toLong) ++
        u32le(0) ++ u32le(0) ++ u32le(0) ++ u32le(0)) // reserved[4]
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ u32le(0) ++ u16le(0) ++ u16le(0) ++ // type, handler, flags, prio, lang
        u32le(0) ++ u32le(1) ++ u32le(25) ++ u32le(0) ++ // initial, scale, rate, start
        u32le(nFrames.toLong) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++ // length, sugbuf, quality, samplesize
        u16le(0) ++ u16le(0) ++ u16le(w) ++ u16le(h)) // rcFrame
    val strf = chunk("strf",
      u32le(40) ++ u32le(w.toLong) ++ u32le(h.toLong) ++ u16le(1) ++ u16le(24) ++
        cc("MJPG") ++ u32le(w.toLong * h * 3) ++
        u32le(0) ++ u32le(0) ++ u32le(0) ++ u32le(0))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)): _*)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ u32le(body.length.toLong) ++ body
  }
}

/** Real multi-frame GIF codec on `javax.imageio`. */
final class GifFrameCodec extends FrameCodec {
  ImageIO.setUseCache(false)

  override def frames(payload: Array[Byte]): Option[Vector[ImageCodec.Decoded]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            Some((0 until n).map(i => GifFrameCodec.channelMeans(reader.read(i))).toVector)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: java.io.IOException => None }
}

object GifFrameCodec {

  private[multimodal] def channelMeans(img: BufferedImage): ImageCodec.Decoded = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageCodec.Decoded(w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** 256-level grayscale palette: indexed frames round-trip exactly
    * through the GIF writer (no quantization), which is what keeps the
    * synthetic fixtures oracle-reproducible. */
  private val grayPalette: IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Deterministic animated-GIF synthesis for tests/oracles: solid
    * gray frames whose geometry and fill derive from `id` by
    * arithmetic an external SQL oracle can reproduce —
    * frames(synthGif(id)) must yield exactly:
    *
    *   width    = 8 + id % 8
    *   height   = 8 + (id / 8) % 8
    *   n_frames = 4 + id % 4
    *   frame f  : solid gray  g = (id + 37 * f) % 256
    *              → mean_r = mean_g = mean_b = g
    *
    * GIF stores indexed pixels losslessly against the explicit gray
    * palette, so the round-trip is exact. */
  def synthGif(id: Long): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
    val w = (8 + id % 8).toInt
    val h = (8 + (id / 8) % 8).toInt
    val nFrames = (4 + id % 4).toInt
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val gray = ((id + 37L * f) % 256).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gray); x += 1 }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }
}
