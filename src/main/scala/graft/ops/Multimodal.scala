package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded per-partition in batches.
  *
  * Image decode is REAL: image/... media types payloads go through `javax.imageio`
  * (in the JDK — PNG/JPEG/GIF/BMP), yielding actual pixel dimensions.
  * Video/audio decode remains a clearly marked deterministic STUB
  * (`fakeDecode`): the container has no AV codecs. Swapping
  * `fakeDecode` for a real decoder (JavaCV, ffmpeg-cli per partition)
  * keeps every other line unchanged.
  *
  * Scale notes: decode runs as a narrow map (no shuffle) and inherits
  * scan partitioning; binary payloads never pass through a wide
  * transform, so executor memory holds one partition of blobs at a
  * time. Frame sampling emits rows (explode), still narrow.
  */
object Multimodal {

  case class MediaBlob(id: Long, payload: Array[Byte], mediaType: String)
  case class MediaMeta(id: Long, byte_len: Long, width: Int, height: Int,
                       n_frames: Int, media_type: String)
  case class Frame(id: Long, frame_idx: Int, feature: Array[Float])

  /** STUB decoder for non-image media — deterministic fake dimensions
    * derived from the payload. Replace with a real AV codec; the
    * signature (bytes in, metadata out) is the real contract.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length
    (len % 640, (len * 7) % 480, len % 16)
  }

  /** Real image decode via javax.imageio: (width, height). Throws on
    * undecodable bytes — corrupt media should fail loudly, not emit
    * garbage dimensions into a 100 TB pipeline (wrap the source with a
    * quarantine filter if bad rows are expected).
    */
  def imageDecode(payload: Array[Byte]): (Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload (${payload.length} bytes)")
    (img.getWidth, img.getHeight)
  }

  /** Binary blobs + typed metadata via per-partition batch decode:
    * real pixel dimensions for image/... media types, stub for other media. */
  def decodeMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        if (b.mediaType.startsWith("image/")) {
          val (w, h) = imageDecode(b.payload)
          MediaMeta(b.id, b.payload.length.toLong, w, h, 1, b.mediaType)
        } else {
          val (w, h, f) = fakeDecode(b.payload)
          MediaMeta(b.id, b.payload.length.toLong, w, h, f, b.mediaType)
        }
      }
    }
  }

  /** Deterministic synthetic PNGs (one per input row): width
    * 1 + id % 16, height 1 + (id·3) % 16, gradient pixels. Real bytes
    * through a real encoder — the decode side of the pipeline gets
    * exercised for real, and an external oracle can verify dimensions
    * from the generation rule alone.
    */
  def syntheticImages(docs: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 1 + (id % 16).toInt
        val h = 1 + ((id * 3) % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (x * 31 + y * 17 + id.toInt * 7) & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaBlob(id, bos.toByteArray, "image/png")
      }
    }
  }

  /** Frame sampling: one row per sampled frame with a (stubbed) feature
    * vector — the shape a video/image feature-extraction stage emits. */
  def sampleFrames(blobs: Dataset[MediaBlob], everyN: Int): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      val (_, _, frames) = fakeDecode(b.payload)
      (0 until frames by math.max(1, everyN)).map { i =>
        // STUB feature: deterministic from (id, frame); a real extractor
        // would decode the frame and run the vision model here
        Frame(b.id, i, Array.tabulate(8)(j => ((b.id * 31 + i * 7 + j) % 97).toFloat))
      }
    }
  }

  /** "Resize" stage: re-encode each blob to a bounded payload
    * (deterministic STUB — truncation stands in for a real scaler; the
    * partition-preserving byte-transform plumbing is the contract). */
  def resize(blobs: Dataset[MediaBlob], maxBytes: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b =>
      if (b.payload.length <= maxBytes) b
      else MediaBlob(b.id, java.util.Arrays.copyOf(b.payload, maxBytes), b.mediaType)))
  }

  /** Wrap a text table as fake media blobs (UTF-8 payloads) — gives the
    * pipeline real bytes to move without codecs in the container. */
  def textAsBlobs(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"),
        lit("text/plain"))
      .as[(Long, Array[Byte], String)]
      .map { case (i, p, m) => MediaBlob(i, p, m) }
  }
}
