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
