package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded per-partition in batches.
  *
  * Image decode AND resize are REAL: image media types go through
  * `javax.imageio` (in the JDK — PNG/JPEG/GIF/BMP), yielding actual
  * pixel dimensions; [[resizeImages]] scales with `Graphics2D` and
  * re-encodes. Audio decode is REAL: `javax.sound.sampled` (also in the
  * JDK) parses WAV/AIFF/AU containers — header parsing only, no audio
  * device needed, headless-safe. Video decode is REAL for three
  * codec-free container families: multi-frame containers ImageIO can
  * read (animated GIF in this environment — [[videoDecode]] walks the
  * container for true width/height/frame count and
  * [[sampleVideoFrames]] decodes actual frame pixels), Y4M
  * (YUV4MPEG2: uncompressed planar YCbCr behind a pure-ASCII header —
  * [[y4mDecode]] parses the header and walks FRAME markers by plane
  * arithmetic alone, [[sampleY4mFrames]] reads actual plane bytes),
  * and MJPEG-in-AVI ([[aviDecode]] walks the RIFF chunk tree,
  * [[sampleAviFrames]] ImageIO-decodes the per-frame JPEGs).
  * Only codec-backed formats (H.264/VP9/…) stay behind the clearly
  * marked deterministic STUB (`fakeDecode`) — the JDK ships no video
  * codecs; swapping `fakeDecode` for JavaCV or ffmpeg-cli per
  * partition keeps every other line unchanged.
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
  case class AudioMeta(id: Long, byte_len: Long, sample_rate: Int,
                       channels: Int, n_samples: Long)
  case class MediaMetaLenient(id: Long, ok: Boolean, width: Int, height: Int,
                              err: String)
  case class Frame(id: Long, frame_idx: Int, feature: Array[Float])
  case class AudioWindowFeatures(id: Long, win: Int, n: Int, energy: Long,
                                 zc: Int, peak: Int)

  /** STUB decoder for video/unknown media — deterministic fake
    * dimensions derived from the payload. Replace with a real video
    * codec; the signature (bytes in, metadata out) is the real contract.
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

  /** Real audio decode via javax.sound.sampled (in the JDK — WAV/AIFF/AU
    * readers): (sampleRate, channels, frames). Container parsing only;
    * works headless. Throws on undecodable bytes, same contract as
    * [[imageDecode]].
    */
  def audioDecode(payload: Array[Byte]): (Int, Int, Long) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val f = in.getFormat
      (f.getSampleRate.toInt, f.getChannels, in.getFrameLength)
    } finally in.close()
  }

  /** Binary blobs + typed metadata via per-partition batch decode:
    * real pixel dimensions for image media, stub for video/unknown
    * (audio goes through [[decodeAudioMeta]] — its metadata shape is
    * sample-oriented, not pixel-oriented). */
  def decodeMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // ImageIO's default scratch cache is a temp FILE per image —
      // per-blob disk churn that dominates decode; keep it in memory
      javax.imageio.ImageIO.setUseCache(false)
      it.map { b =>
        if (b.mediaType.startsWith("image/")) {
          val (w, h) = imageDecode(b.payload)
          MediaMeta(b.id, b.payload.length.toLong, w, h, 1, b.mediaType)
        } else if (b.mediaType == "video/gif") {
          val (w, h, f) = videoDecode(b.payload) // REAL frame-container decode
          MediaMeta(b.id, b.payload.length.toLong, w, h, f, b.mediaType)
        } else if (b.mediaType == "video/y4m") {
          val (w, h, f) = y4mDecode(b.payload) // REAL plane-arithmetic decode
          MediaMeta(b.id, b.payload.length.toLong, w, h, f, b.mediaType)
        } else if (b.mediaType == "video/avi") {
          val (w, h, f) = aviDecode(b.payload) // REAL RIFF walk (MJPEG)
          MediaMeta(b.id, b.payload.length.toLong, w, h, f, b.mediaType)
        } else {
          val (w, h, f) = fakeDecode(b.payload)
          MediaMeta(b.id, b.payload.length.toLong, w, h, f, b.mediaType)
        }
      }
    }
  }

  /** Quarantine-style lenient decode: corrupt blobs become
    * `(ok=false, -1, -1, errClass)` rows instead of failing the job —
    * the dead-letter pattern for ingest at scale, where a handful of
    * bad objects must not kill a 100 TB pass. Strict [[decodeMeta]]
    * stays the default (silent data loss is worse than a loud failure
    * when corruption is NOT expected); route through this when it is,
    * then split on `ok` into the clean path and the quarantine sink.
    */
  def decodeMetaLenient(blobs: Dataset[MediaBlob]): Dataset[MediaMetaLenient] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { b =>
        try {
          val (w, h) = imageDecode(b.payload)
          MediaMetaLenient(b.id, ok = true, w, h, null)
        } catch {
          case e: Exception =>
            MediaMetaLenient(b.id, ok = false, -1, -1, e.getClass.getSimpleName)
        }
      }
    }
  }

  /** Audio blobs → sample-oriented metadata, REAL decode (javax.sound).
    * Narrow map, partition-preserving, same shape as [[decodeMeta]]. */
  def decodeAudioMeta(blobs: Dataset[MediaBlob]): Dataset[AudioMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val (rate, ch, frames) = audioDecode(b.payload)
        AudioMeta(b.id, b.payload.length.toLong, rate, ch, frames)
      }
    }
  }

  /** Windowed audio feature extraction over REAL decoded PCM — the
    * signal-level features a speech-data pipeline filters on (voice
    * activity, clipping, silence): per window of `window` samples,
    *   - `energy`: Σ v² (RMS energy numerator — silence detection),
    *   - `zc`: zero crossings (sign changes between consecutive
    *     in-window samples — the classic cheap voicing/noise signal),
    *   - `peak`: max |v| (clipping detection).
    * All three are INTEGER functions of the samples, so the features
    * replay bit-exactly from the generation rule in an external oracle
    * with no float math anywhere.
    *
    * Decode is real: javax.sound parses the container and the PCM
    * frames are read through the format's own endianness. 16-bit
    * signed PCM only (the universal interchange format) — anything
    * else fails loudly. The final window may be short (n < window);
    * dropping tail samples silently is the chunking bug all over
    * again.
    *
    * Scale shape: narrow mapPartitions flatMap (no shuffle, partition-
    * inherited); output rows ≈ samples/window per blob.
    */
  def audioFeatures(blobs: Dataset[MediaBlob],
                    window: Int): Dataset[AudioWindowFeatures] = {
    require(window > 0, "window must be positive")
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b.payload))
        val f = in.getFormat
        require(f.getSampleSizeInBits == 16 &&
          f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getChannels == 1,
          s"audioFeatures expects 16-bit signed mono PCM, got $f")
        val bytes =
          try in.readAllBytes()
          finally in.close()
        val n = bytes.length / 2
        val big = f.isBigEndian
        def sample(i: Int): Int = {
          val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
          val hi = bytes(2 * i + (if (big) 0 else 1))
          (hi << 8) | lo
        }
        (0 until (n + window - 1) / window).iterator.map { w =>
          val start = w * window
          val end = math.min(start + window, n)
          var energy = 0L
          var zc = 0
          var peak = 0
          var i = start
          while (i < end) {
            val v = sample(i)
            energy += v.toLong * v
            if (i > start && ((sample(i - 1) < 0) != (v < 0))) zc += 1
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          AudioWindowFeatures(b.id, w, end - start, energy, zc, peak)
        }
      }
    }
  }

  /** Deterministic synthetic PNGs (one per input row): width
    * 1 + id % 16, height 1 + (id·3) % 16, gradient pixels. Real bytes
    * through a real encoder — the decode side of the pipeline gets
    * exercised for real, and an external oracle can verify dimensions
    * from the generation rule alone. The ids are repartitioned across
    * the session's cores first: PNG encoding is CPU-bound and the
    * source is typically one small parquet split.
    */
  def syntheticImages(docs: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).cast("long")).as[Long]
      .repartition(par).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp file per encode
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

  /** Canonical 44-byte-header RIFF/WAV container around raw PCM bytes. */
  private def wavBytes(pcm: Array[Byte], rate: Int, channels: Int,
                       bits: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(pcm.length).put(pcm)
    bb.array()
  }

  /** Deterministic synthetic WAVs (one per input row): PCM16 mono 8 kHz,
    * 16 + id % 64 samples, sample i = ((id·31 + i·7) mod 251) − 125.
    * Real RIFF bytes through the canonical 44-byte header, so
    * [[audioDecode]]'s javax.sound path parses a genuine container and
    * an external oracle can verify byte length and sample count from
    * the generation rule alone.
    */
  def syntheticWavs(docs: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    graft.ops.Text.fanOut(docs.select(col(idCol).cast("long")))
      .as[Long].mapPartitions { it =>
      it.map { id =>
        val n = 16 + (id % 64).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = (((id * 31 + i * 7) % 251) - 125).toShort
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        MediaBlob(id, wavBytes(pcm, 8000, 1, 16), "audio/wav")
      }
    }
  }

  /** The 8-color palette synthetic video frames draw from. Every color
    * appears verbatim in each frame's GIF palette, so encode→decode is
    * bit-exact (GIF is lossless for images already ≤256 colors). */
  val VideoPalette: Array[Int] = Array(
    0x000000, 0xFF0000, 0x00FF00, 0x0000FF,
    0xFFFF00, 0x00FFFF, 0xFF00FF, 0xFFFFFF)

  /** Deterministic synthetic videos as REAL animated GIFs (ImageIO's
    * multi-frame GIF writer — container and codec both in the JDK):
    * 2 + id % 6 frames of w = 1 + id % 16, h = 1 + (id·3) % 16, frame f
    * solid color `VideoPalette[(id + f) % 8]`. Solid fixed-palette
    * frames survive GIF quantization exactly, so the decode side reads
    * REAL pixels whose values an external oracle derives from the
    * generation rule alone. Same repartition-then-encode shape as
    * [[syntheticImages]] (codec work is CPU-bound).
    */
  def syntheticGifs(docs: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).cast("long")).as[Long]
      .repartition(par).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val icm = {
        val r = VideoPalette.map(c => ((c >> 16) & 0xff).toByte)
        val g = VideoPalette.map(c => ((c >> 8) & 0xff).toByte)
        val b = VideoPalette.map(c => (c & 0xff).toByte)
        new java.awt.image.IndexColorModel(8, VideoPalette.length, r, g, b)
      }
      it.map { id =>
        val w = 1 + (id % 16).toInt
        val h = 1 + ((id * 3) % 16).toInt
        val n = 2 + (id % 6).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < n) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val rgb = VideoPalette(((id + f) % 8).toInt)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        MediaBlob(id, bos.toByteArray, "video/gif")
      }
    }
  }

  // --------------------------------------------------------------------
  // Y4M (YUV4MPEG2): uncompressed planar YCbCr video. The container is
  // an ASCII stream header ("YUV4MPEG2 W.. H.. F.. ..\n") followed by
  // frames, each a "FRAME...\n" marker line plus raw plane bytes whose
  // size is pure header arithmetic (C420: w·h + 2·(w/2)·(h/2)). No
  // codec anywhere — decode is header parsing + plane offsets, all JDK.
  // Reference format: mjpegtools yuv4mpeg(5), public spec.
  // --------------------------------------------------------------------

  /** Bytes per frame for a Y4M colorspace tag at (w, h). */
  private def y4mFrameBytes(w: Int, h: Int, c: String): Int =
    if (c.startsWith("C444")) 3 * w * h
    else if (c.startsWith("C422")) 2 * w * h
    else if (c.startsWith("Cmono")) w * h
    else w * h + 2 * ((w / 2) * (h / 2)) // C420 and variants (default)

  /** Parse the Y4M stream header: (width, height, colorspace tag,
    * offset of the first FRAME marker). Throws on malformed bytes —
    * same loud contract as [[imageDecode]]. */
  private def y4mHeader(payload: Array[Byte]): (Int, Int, String, Int) = {
    val nl = payload.indexOf('\n'.toByte)
    require(nl > 0, s"no Y4M stream header (${payload.length} bytes)")
    val header = new String(payload, 0, nl, "US-ASCII")
    val toks = header.split(" ")
    require(toks.head == "YUV4MPEG2", s"not a YUV4MPEG2 stream: $header")
    def tok(p: Char): Option[String] =
      toks.tail.find(t => t.nonEmpty && t.head == p).map(_.tail)
    val w = tok('W').map(_.toInt).getOrElse(
      throw new IllegalArgumentException(s"Y4M header missing W: $header"))
    val h = tok('H').map(_.toInt).getOrElse(
      throw new IllegalArgumentException(s"Y4M header missing H: $header"))
    require(w > 0 && h > 0, s"bad Y4M dimensions ${w}x$h")
    val c = toks.tail.find(_.startsWith("C")).getOrElse("C420")
    (w, h, c, nl + 1)
  }

  /** REAL Y4M decode: (width, height, frameCount) by walking FRAME
    * markers — each frame's payload size is plane arithmetic from the
    * header, so the walk is exact with no codec. Throws on truncated
    * or malformed streams. */
  def y4mDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val (w, h, c, start) = y4mHeader(payload)
    val fb = y4mFrameBytes(w, h, c)
    var pos = start
    var frames = 0
    while (pos < payload.length) {
      // FRAME marker line (may carry parameters up to the newline)
      require(payload.length >= pos + 5 &&
        new String(payload, pos, 5, "US-ASCII") == "FRAME",
        s"expected FRAME marker at byte $pos")
      var nl = pos + 5
      while (nl < payload.length && payload(nl) != '\n'.toByte) nl += 1
      require(nl < payload.length, "unterminated FRAME marker line")
      pos = nl + 1 + fb
      require(pos <= payload.length,
        s"truncated Y4M frame $frames (need ${nl + 1 + fb}, have ${payload.length})")
      frames += 1
    }
    (w, h, frames)
  }

  /** REAL per-frame sampling over a Y4M stream: every Nth frame's
    * top-left plane bytes are read straight out of the payload —
    * feature = [Y(0,0), Cb(0,0), Cr(0,0), w, h] (Cb/Cr = -1 for mono).
    * Narrow flatMap, same shape as [[sampleVideoFrames]]. */
  def sampleY4mFrames(blobs: Dataset[MediaBlob], everyN: Int): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val (w, h, c, start) = y4mHeader(b.payload)
        val fb = y4mFrameBytes(w, h, c)
        val mono = c.startsWith("Cmono")
        val uOff = w * h // Cb plane follows Y; Cr follows Cb
        val vOff = uOff + (if (c.startsWith("C444")) w * h
          else if (c.startsWith("C422")) w * h / 2 else (w / 2) * (h / 2))
        var pos = start
        var idx = 0
        val out = scala.collection.mutable.ListBuffer.empty[Frame]
        while (pos < b.payload.length) {
          require(b.payload.length >= pos + 5 &&
            new String(b.payload, pos, 5, "US-ASCII") == "FRAME",
            s"expected FRAME marker at byte $pos")
          var nl = pos + 5
          while (nl < b.payload.length && b.payload(nl) != '\n'.toByte) nl += 1
          require(nl < b.payload.length, "unterminated FRAME marker line")
          val data = nl + 1
          require(data + fb <= b.payload.length, s"truncated Y4M frame $idx")
          if (idx % math.max(1, everyN) == 0) {
            val y = b.payload(data) & 0xff
            val u = if (mono) -1 else b.payload(data + uOff) & 0xff
            val v = if (mono) -1 else b.payload(data + vOff) & 0xff
            out += Frame(b.id, idx, Array(y.toFloat, u.toFloat, v.toFloat,
              w.toFloat, h.toFloat))
          }
          pos = data + fb
          idx += 1
        }
        out.toList
      }
    }
  }

  /** Deterministic synthetic Y4M streams (one per input row):
    * w = 2·(1 + id mod 8), h = 2·(1 + 3·id mod 8) (even — C420 chroma
    * halves them), 2 + id mod 6 frames; frame f's planes are constant
    * bytes Y = (7·id + 13·f) mod 211 + 20, Cb = (5·id + 11·f) mod 199
    * + 30, Cr = (3·id + 17·f) mod 223 + 16. Raw planes are stored
    * verbatim (no codec), so decode must reproduce the rule exactly —
    * an external oracle derives every value from the id alone. Same
    * repartition-then-encode shape as [[syntheticImages]]. */
  def syntheticY4ms(docs: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).cast("long")).as[Long]
      .repartition(par).mapPartitions { it =>
      it.map { id =>
        val w = 2 * (1 + (id % 8).toInt)
        val h = 2 * (1 + ((id * 3) % 8).toInt)
        val n = 2 + (id % 6).toInt
        val fb = w * h + 2 * ((w / 2) * (h / 2))
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
        var f = 0
        while (f < n) {
          bos.write("FRAME\n".getBytes("US-ASCII"))
          val frame = new Array[Byte](fb)
          val yv = ((7 * id + 13 * f) % 211 + 20).toByte
          val uv = ((5 * id + 11 * f) % 199 + 30).toByte
          val vv = ((3 * id + 17 * f) % 223 + 16).toByte
          java.util.Arrays.fill(frame, 0, w * h, yv)
          java.util.Arrays.fill(frame, w * h, w * h + (w / 2) * (h / 2), uv)
          java.util.Arrays.fill(frame, w * h + (w / 2) * (h / 2), fb, vv)
          bos.write(frame)
          f += 1
        }
        MediaBlob(id, bos.toByteArray, "video/y4m")
      }
    }
  }

  // --------------------------------------------------------------------
  // MJPEG-in-AVI: a RIFF container ('RIFF' size 'AVI ' + nested LIST
  // chunks) whose 'movi' list carries one complete JPEG image per
  // '00dc' chunk. The container walk is pure chunk arithmetic (fourcc +
  // little-endian u32 size, even-padded) and each frame decodes with
  // the JDK's ImageIO JPEG reader — a third codec-free REAL video
  // family after GIF and Y4M. Reference format: Microsoft AVI RIFF
  // spec (public).
  // --------------------------------------------------------------------

  private def leU32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String = {
    require(p + 4 <= b.length, s"truncated fourcc at byte $p")
    new String(b, p, 4, "US-ASCII")
  }

  /** Walk an AVI payload: returns (width, height, list of (offset,
    * length) of the '00dc' frame chunks inside the 'movi' list).
    * Dimensions come from the 'avih' main header and are required to
    * agree with the 'strf' BITMAPINFOHEADER — inconsistent containers
    * fail loudly. */
  private def aviWalk(b: Array[Byte]): (Int, Int, Seq[(Int, Int)]) = {
    require(b.length >= 12 && fourcc(b, 0) == "RIFF" &&
      fourcc(b, 8) == "AVI ", s"not a RIFF AVI payload (${b.length} bytes)")
    val riffEnd = math.min(b.length.toLong, 8 + leU32(b, 4)).toInt
    var w = -1; var h = -1; var sw = -1; var sh = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val cc = fourcc(b, pos)
        val size = leU32(b, pos + 4).toInt
        val data = pos + 8
        require(data + size <= to, s"truncated '$cc' chunk at byte $pos")
        if (cc == "LIST") {
          // list type consumes the first 4 payload bytes
          walk(data + 4, data + size)
        } else if (cc == "avih") {
          require(size >= 40, s"avih too short ($size bytes)")
          w = leU32(b, data + 32).toInt; h = leU32(b, data + 36).toInt
        } else if (cc == "strf" && size >= 40 && leU32(b, data) == 40L) {
          sw = leU32(b, data + 4).toInt; sh = leU32(b, data + 8).toInt
        } else if (cc == "00dc") {
          frames += ((data, size))
        }
        pos = data + size + (size & 1) // chunks are even-padded
      }
    }
    walk(12, riffEnd)
    require(w > 0 && h > 0, "AVI missing avih dimensions")
    require(sw == -1 || (sw == w && math.abs(sh) == h),
      s"avih ${w}x$h disagrees with strf ${sw}x${math.abs(sh)}")
    (w, h, frames.toSeq)
  }

  /** REAL MJPEG-in-AVI decode: (width, height, frameCount) from the
    * RIFF chunk walk — frames are COUNTED from the '00dc' chunks
    * actually present, not trusted from the header. */
  def aviDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val (w, h, frames) = aviWalk(payload)
    (w, h, frames.length)
  }

  /** REAL per-frame sampling over an MJPEG AVI: every Nth '00dc'
    * chunk's JPEG decodes through ImageIO and yields feature =
    * [R(0,0), G(0,0), B(0,0), w, h] with w/h from the DECODED frame
    * (not the container header). Narrow flatMap, the
    * [[sampleY4mFrames]] shape. */
  def sampleAviFrames(blobs: Dataset[MediaBlob], everyN: Int): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { b =>
        val (_, _, chunks) = aviWalk(b.payload)
        chunks.zipWithIndex.collect {
          case ((off, len), idx) if idx % math.max(1, everyN) == 0 =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b.payload, off, len))
            require(img != null, s"undecodable MJPEG frame $idx of blob ${b.id}")
            val px = img.getRGB(0, 0)
            Frame(b.id, idx, Array(((px >> 16) & 0xff).toFloat,
              ((px >> 8) & 0xff).toFloat, (px & 0xff).toFloat,
              img.getWidth.toFloat, img.getHeight.toFloat))
        }
      }
    }
  }

  /** Deterministic synthetic MJPEG AVIs: w = 8 + id mod 9, h = 6 +
    * 5·id mod 11, 2 + id mod 5 frames; frame f is a solid GRAYSCALE
    * JPEG of value (11·id + 29·f) mod 256 — grayscale because solid
    * gray survives ImageIO's JPEG round-trip bit-exactly at quality
    * 1.0 (verified over all 256 values), so an external oracle can
    * derive every sampled pixel from the id alone; chroma'd colors
    * drift ±1 under 4:2:0 quantization. Same repartition-then-encode
    * shape as [[syntheticY4ms]]. */
  def syntheticAvis(docs: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).cast("long")).as[Long]
      .repartition(par).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = 8 + (id % 9).toInt
        val h = 6 + ((id * 5) % 11).toInt
        val n = 2 + (id % 5).toInt
        val jpegs = (0 until n).map { f =>
          val g = ((11 * id + 29 * f) % 256).toInt
          solidJpeg(w, h, g)
        }
        MediaBlob(id, aviBytes(w, h, jpegs), "video/avi")
      }
    }
  }

  /** A solid-gray JPEG at quality 1.0 (DC-only blocks round-trip
    * exactly for r=g=b). */
  private def solidJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Minimal spec-conformant AVI wrapper: RIFF('AVI '){ LIST('hdrl'){
    * avih, LIST('strl'){ strh 'vids'/'MJPG', strf BITMAPINFOHEADER } },
    * LIST('movi'){ '00dc' JPEG chunks, even-padded } }. */
  private def aviBytes(w: Int, h: Int, jpegs: Seq[Array[Byte]]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val avih = Array.concat(u32(40000), u32(0), u32(0), u32(0),
      u32(jpegs.length), u32(0), u32(1), u32(0), u32(w), u32(h),
      u32(0), u32(0), u32(0), u32(0))
    val strh = Array.concat(cc("vids"), cc("MJPG"), u32(0), u16(0), u16(0),
      u32(0), u32(1), u32(25), u32(0), u32(jpegs.length), u32(0), u32(0),
      u16(0), u16(0), u16(w), u16(h))
    val strf = Array.concat(u32(40), u32(w), u32(h), u16(1), u16(24),
      cc("MJPG"), u32(3L * w * h), u32(0), u32(0), u32(0), u32(0))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      Array.concat(cc(id), u32(body.length), body, pad)
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      Array.concat(cc("LIST"), u32(4L + body.length), cc(typ), body)
    val strl = list("strl", Array.concat(chunk("strh", strh), chunk("strf", strf)))
    val hdrl = list("hdrl", Array.concat(chunk("avih", avih), strl))
    val movi = list("movi",
      Array.concat(jpegs.map(j => chunk("00dc", j)): _*))
    val body = Array.concat(cc("AVI "), hdrl, movi)
    bb.write(cc("RIFF")); bb.write(u32(body.length.toLong))
    bb.write(body)
    bb.toByteArray
  }

  /** REAL video-container decode (ImageIO frame reader — GIF in this
    * environment): (width, height, frameCount). `getNumImages(true)`
    * walks the whole container, the honest frame count. Throws on
    * undecodable bytes, same loud contract as [[imageDecode]].
    */
  def videoDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) {
      iis.close()
      throw new IllegalArgumentException(
        s"undecodable video payload (${payload.length} bytes)")
    }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      (reader.getWidth(0), reader.getHeight(0), reader.getNumImages(true))
    } finally { reader.dispose(); iis.close() }
  }

  /** REAL frame sampling over a decodable video container: every Nth
    * frame is actually decoded and its feature is read from the pixels
    * — [r, g, b] of the top-left pixel plus [w, h]. Narrow flatMap; a
    * production extractor swaps the feature body for a vision model,
    * the decode loop stays.
    */
  def sampleVideoFrames(blobs: Dataset[MediaBlob], everyN: Int): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { b =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b.payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { // same loud contract as videoDecode
          iis.close()
          throw new IllegalArgumentException(
            s"undecodable video payload (${b.payload.length} bytes)")
        }
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n by math.max(1, everyN)).map { i =>
            val img = reader.read(i)
            val p = img.getRGB(0, 0)
            Frame(b.id, i, Array(
              ((p >> 16) & 0xff).toFloat, ((p >> 8) & 0xff).toFloat,
              (p & 0xff).toFloat, img.getWidth.toFloat, img.getHeight.toFloat))
          }.toList
        } finally { reader.dispose(); iis.close() }
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

  /** Deterministic integer fit rule: scale (w, h) to fit maxDim × maxDim
    * preserving aspect ratio, floor division, min 1 px. Pure integer
    * arithmetic so an external SQL oracle derives output dimensions
    * exactly (no float rounding ambiguity).
    */
  def fitDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
  }

  /** REAL image resize: decode (javax.imageio), scale to [[fitDims]]
    * with Graphics2D bilinear interpolation, re-encode PNG. Already-fit
    * images pass through untouched (no pointless re-encode). Non-image
    * payloads pass through unchanged — byte-bounding for those is
    * [[resize]]. Narrow map, partition-preserving.
    */
  def resizeImages(blobs: Dataset[MediaBlob], maxDim: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp file per codec call
      it.map { b =>
        if (!b.mediaType.startsWith("image/")) b
        else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b.payload))
          require(img != null, s"undecodable image payload (${b.payload.length} bytes)")
          val (w, h) = fitDims(img.getWidth, img.getHeight, maxDim)
          if (w == img.getWidth && h == img.getHeight) b
          else {
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            MediaBlob(b.id, bos.toByteArray, b.mediaType)
          }
        }
      }
    }
  }

  /** Byte-bounding stage for NON-image payloads: clamp each blob to
    * maxBytes by truncation (partition-preserving byte transform).
    * Image payloads pass through untouched — truncating an encoded
    * image corrupts the container; size-bounding images is
    * [[resizeImages]]'s job. */
  def resize(blobs: Dataset[MediaBlob], maxBytes: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b =>
      if (b.mediaType.startsWith("image/") || b.payload.length <= maxBytes) b
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
