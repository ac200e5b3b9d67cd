package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque
  * `binary` columns plus typed metadata, with decode / feature-extract
  * implemented as partition-local batch transforms.
  *
  * The Spark-side plumbing — schema, binary payload column,
  * partition-batched processing, typed output — is real. Each modality
  * sits behind a pluggable codec trait with a real JDK-built-in
  * implementation: IMAGE = [[ImageIoCodec]] (`javax.imageio` PNG/JPEG
  * decode + rescale), AUDIO = [[WavCodec]] (`javax.sound.sampled`
  * RIFF/WAV PCM), FRAMES = [[GifFrameCodec]] (multi-frame GIF demux).
  * Only compressed audio/video (mp3/mp4/h264) remains on the
  * deterministic stub fallback — no such codec libraries exist in this
  * environment; swap one in (JNI/FFI per partition) without touching
  * any other layer.
  *
  * Scale notes: payloads stay distributed (no collect); decode runs
  * once per partition batch via `mapPartitions` so per-record library
  * init cost amortizes — the Scala analog of `mapInPandas` batch
  * shape. Metadata-only queries never touch the payload column thanks
  * to Parquet column pruning, which is the whole point of the
  * opaque-binary + typed-metadata split.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      n_bytes: Long,
  )

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int, // STUB: derived deterministically from payload
      height: Int, // STUB
      checksum: Long, // real: sum of first 64 payload bytes
      features: Array[Float], // STUB: 8-dim deterministic fake embedding
  )

  /** Decoded-image features from the real codec path. `decoded` is
    * false when the payload was not a decodable image and the
    * deterministic stub supplied the values instead (audio/video, or
    * corrupt bytes). */
  final case class ImageFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
  )

  /** Wrap any table with a string column as a media table (test/demo
    * path: text bytes play the payload role). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
    )

  /** Media table of REAL PNG payloads synthesized deterministically
    * from the id column ([[ImageIoCodec.synthPng]]) — the image-path
    * demo input where decode exercises an actual codec and the outputs
    * are still oracle-reproducible by arithmetic on the id. */
  def asSyntheticImageTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val png = ImageIoCodec.synthPng(id)
          MediaRecord(id, "image", png, png.length.toLong)
        }
      }
      .toDF()
  }

  /** Real decode / feature-extract: partition-batched, one codec
    * instance per partition (library init amortized), stub fallback
    * for non-image payloads so mixed-modality tables still flow. */
  def extractImageFeatures(
      spark: SparkSession,
      media: DataFrame,
      codecFactory: () => ImageCodec = () => new ImageIoCodec,
  ): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val codec = codecFactory()
      it.map { r =>
        codec.decode(r.payload) match {
          case Some(d) =>
            ImageFeatures(r.media_id, r.media_type, r.n_bytes,
              decoded = true, d.width, d.height, d.meanR, d.meanG, d.meanB)
          case None =>
            val s = decodeStub(r)
            ImageFeatures(r.media_id, r.media_type, r.n_bytes,
              decoded = false, s.width, s.height,
              s.features(0).toDouble, s.features(1).toDouble, s.features(2).toDouble)
        }
      }
    }.toDF()
  }

  /** Decoded-audio features from the real codec path. `decoded` is
    * false when the payload was not decodable audio and the
    * deterministic stub supplied placeholder values instead. */
  final case class AudioFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      decoded: Boolean,
      sample_rate: Int,
      channels: Int,
      bit_depth: Int,
      n_frames: Long,
      duration_ms: Double,
      rms: Double,
      peak: Int,
  )

  /** Media table of REAL WAV payloads synthesized deterministically
    * from the id column ([[WavCodec.synthWav]]) — decode exercises the
    * actual `javax.sound.sampled` parser and the outputs remain
    * oracle-reproducible by arithmetic on the id. */
  def asSyntheticAudioTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wav = WavCodec.synthWav(id)
          MediaRecord(id, "audio", wav, wav.length.toLong)
        }
      }
      .toDF()
  }

  /** Real audio decode / feature-extract: partition-batched, one codec
    * instance per partition, stub fallback for non-audio payloads so
    * mixed-modality tables still flow. */
  def extractAudioFeatures(
      spark: SparkSession,
      media: DataFrame,
      codecFactory: () => AudioCodec = () => new WavCodec,
  ): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val codec = codecFactory()
      it.map { r =>
        codec.decode(r.payload) match {
          case Some(d) =>
            AudioFeatures(r.media_id, r.media_type, r.n_bytes,
              decoded = true, d.sampleRate, d.channels, d.bitDepth,
              d.nFrames, d.durationMs, d.rms, d.peak)
          case None =>
            val s = decodeStub(r)
            AudioFeatures(r.media_id, r.media_type, r.n_bytes,
              decoded = false, 0, 0, 0, s.checksum, 0.0, 0.0, 0)
        }
      }
    }.toDF()
  }

  /** Real audio resample (integer decimation): decode → keep every
    * factor-th frame → re-encode, the audio analog of
    * [[resizeImages]]. Non-audio payloads fall back to the
    * deterministic byte resample. */
  def resampleAudio(
      spark: SparkSession,
      media: DataFrame,
      factor: Int,
      codecFactory: () => AudioCodec = () => new WavCodec,
  ): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val codec = codecFactory()
      it.map { r =>
        val out = codec.decimate(r.payload, factor)
          .getOrElse(resampleStub(r.payload, math.max(1, r.payload.length / factor)))
        r.copy(payload = out, n_bytes = out.length.toLong)
      }
    }.toDF()
  }

  /** One sampled frame with its decoded features. `decoded` is false
    * for the stub fallback (payload chunks standing in for frames). */
  final case class FrameFeatures(
      media_id: Long,
      frame_no: Int,
      decoded: Boolean,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
  )

  /** Media table of REAL animated-GIF payloads synthesized
    * deterministically from the id column ([[GifFrameCodec.synthGif]]).
    */
  def asSyntheticVideoTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val gif = GifFrameCodec.synthGif(id)
          MediaRecord(id, "video", gif, gif.length.toLong)
        }
      }
      .toDF()
  }

  /** Media table of REAL MJPEG-in-AVI payloads synthesized
    * deterministically from the id column ([[AviMjpeg.synthAvi]]) —
    * the video analog of [[asSyntheticVideoTable]]'s animated GIFs,
    * exercising the RIFF demux → per-frame JPEG decode path. */
  def asSyntheticAviTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val avi = AviMjpeg.synthAvi(id)
          MediaRecord(id, "video", avi, avi.length.toLong)
        }
      }
      .toDF()
  }

  /** Real frame sampling: demux + decode every frame via the codec,
    * keep every Nth, one output row per kept frame (the
    * generator/explode shape). Payloads that don't decode fall back to
    * fixed-size payload chunks so mixed tables still flow — flagged
    * `decoded = false`. */
  def sampleFrameFeatures(
      spark: SparkSession,
      media: DataFrame,
      every: Int = 2,
      codecFactory: () => FrameCodec = () => new AutoFrameCodec,
  ): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val codec = codecFactory()
      it.flatMap { r =>
        codec.frames(r.payload) match {
          case Some(fs) =>
            fs.zipWithIndex.collect {
              case (d, i) if i % every == 0 =>
                FrameFeatures(r.media_id, i, decoded = true,
                  d.width, d.height, d.meanR, d.meanG, d.meanB)
            }
          case None =>
            r.payload.grouped(32).zipWithIndex.collect {
              case (chunk, i) if i % every == 0 =>
                val s = chunk.foldLeft(0L)((a, b) => a + (b & 0xff))
                FrameFeatures(r.media_id, i, decoded = false,
                  chunk.length, 1, (s % 256).toDouble, 0.0, 0.0)
            }
        }
      }
    }.toDF()
  }

  /** Stub byte-resample shared by [[resize]] and the [[resizeImages]]
    * fallback: output size scales like a w×h thumbnail. Empty payloads
    * stay empty (indexing into a zero-length array would fail the
    * task). */
  private def resampleStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.isEmpty) payload
    else Array.tabulate(math.min(targetBytes, payload.length)) { i =>
      payload(i * math.max(1, payload.length / targetBytes) % payload.length)
    }

  /** Real thumbnail: decode + rescale + re-encode via the codec;
    * payloads that don't decode fall back to the deterministic stub
    * resample. Same payload-in/payload-out contract as [[resize]]. */
  def resizeImages(
      spark: SparkSession,
      media: DataFrame,
      w: Int,
      h: Int,
      codecFactory: () => ImageCodec = () => new ImageIoCodec,
  ): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val codec = codecFactory()
      val targetBytes = math.max(1, w * h / 64)
      it.map { r =>
        val out = codec.resize(r.payload, w, h)
          .getOrElse(resampleStub(r.payload, targetBytes))
        r.copy(payload = out, n_bytes = out.length.toLong)
      }
    }.toDF()
  }

  /** Deterministic fake decode — the documented FALLBACK for payloads
    * the real codecs cannot parse (see [[extractImageFeatures]], which
    * marks such rows `decoded = false`). Never a public entry point:
    * since round 11 every public feature path is codec-first, and the
    * stub is reachable only through the undecodable-payload branch (or
    * the package-private test seams below). */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val head = r.payload.take(64)
    val checksum = head.foldLeft(0L)((a, b) => a + (b & 0xff))
    val w = 16 + (checksum % 16).toInt
    val h = 16 + ((checksum / 16) % 16).toInt
    val feats = Array.tabulate(8)(i =>
      ((head.lift(i).getOrElse(0: Byte) & 0xff) / 255.0f))
    MediaFeatures(r.media_id, r.media_type, r.n_bytes, w, h, checksum, feats)
  }

  /** Stub-only decode over a partition batch — the test seam that pins
    * [[decodeStub]]'s determinism (MultimodalSpec). Package-private:
    * users reach features through [[extractImageFeatures]] /
    * [[extractAudioFeatures]], where the real codec decodes and the
    * stub is only the undecodable-payload fallback. */
  private[multimodal] def extractFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(decodeStub)
    }
  }

  /** DataFrame face of the [[extractFeatures]] test seam. */
  private[multimodal] def extractFeaturesDf(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(media.as[MediaRecord])(spark).toDF()
  }

  /** Stub-only resize — deterministically resamples the payload bytes
    * to w*h/64 bytes so output size scales like a real thumbnail.
    * Package-private test seam for the [[resampleStub]] fallback;
    * users resize through [[resizeImages]], where the real codec
    * re-encodes and this resample only handles undecodable payloads. */
  private[multimodal] def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real codec init once per partition batch
      val targetBytes = math.max(1, w * h / 64)
      it.map { r =>
        val out = resampleStub(r.payload, targetBytes)
        r.copy(payload = out, n_bytes = out.length.toLong)
      }
    }.toDF()
  }

  /** Stub-only frame sampling — splits the payload into fixed-size
    * chunks and keeps every Nth, one output row per kept frame (the
    * generator/explode shape of frame sampling). Package-private test
    * seam; users sample frames through [[sampleFrameFeatures]], where
    * the real GIF/MJPEG-AVI container parsers walk actual frames and
    * the byte-chunk shape only covers unparseable payloads. */
  final case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  private[multimodal] def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      frameBytes: Int = 32,
      every: Int = 2,
  ): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % every == 0 => Frame(r.media_id, i, chunk)
      }
    }.toDF()
  }
}
