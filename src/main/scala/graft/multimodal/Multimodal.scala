package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-streaming typed transforms (the Scala
  * analog of `mapInPandas` batches — one iterator pass per partition, no
  * driver materialization, constant memory).
  *
  * IMAGE decode is real: pure-JVM `javax.imageio` (PNG/JPEG/GIF/BMP), no
  * native deps — [[decodeImageFeatures]] yields dimensions + pixel stats,
  * [[resizeImages]] re-encodes a bilinear-scaled PNG. AUDIO decode is
  * real for PCM containers: pure-JVM `javax.sound.sampled` (WAV/AIFF/AU)
  * — [[decodeAudioFeatures]] yields format facts + waveform statistics
  * from decoded samples. Undecodable payloads are dropped, counted per
  * partition by the caller if needed (a corrupt media file must never
  * fail a 100 TB sweep). VIDEO frame sampling is real for MJPEG-in-AVI
  * ([[decodeVideoFrameFeatures]]: RIFF chunk walk + per-frame JPEG
  * decode). Compressed audio (MP3/Opus) and inter-frame video codecs
  * (H.264 …) don't exist in the JVM: [[sampleFrames]] keeps the
  * byte-window iterator shape as the documented production slot for a
  * codec call, and [[extractFeatures]] computes codec-independent
  * content signatures (byte histogram + folded signature) useful for
  * binary near-dup on any modality.
  */
object Multimodal {

  // decode must never touch a display; Spark executors have no X server
  System.setProperty("java.awt.headless", "true")

  /** Typed media record: id + opaque payload. */
  case class Media(media_id: Long, payload: Array[Byte])

  /** Extracted features: byte length, 8-bin byte histogram (normalized),
    * and an embedding-like signature derived from the payload.
    */
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      histogram: Array[Float],
      signature: Array[Float])

  /** Codec-independent content signature: 8-bin byte histogram + 16-lane
    * folded signature, pure functions of the payload bytes. Not a decode —
    * the modality-agnostic cheap feature (binary near-dup, corruption
    * screening) that runs before any codec is invoked.
    */
  def byteSignature(payload: Array[Byte]): (Array[Float], Array[Float]) = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >>> 5) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < 8) { hist(j) /= n; j += 1 }
    val sig = new Array[Float](16)
    i = 0
    while (i < payload.length) {
      sig(i % 16) += ((payload(i) & 0xff) - 128) / 128f
      i += 1
    }
    (hist, sig)
  }

  /** Attach a binary payload column to any DataFrame (here: the document
    * text bytes as a stand-in payload; in production the bytes come from the
    * source system).
    */
  def withPayload(df: DataFrame, sourceCol: String, idCol: String): Dataset[Media] = {
    implicit val enc = Encoders.product[Media]
    df.select(col(idCol).cast(LongType).as("media_id"),
        col(sourceCol).cast(BinaryType).as("payload"))
      .as[Media]
  }

  /** Distributed feature extraction: one streaming pass per partition.
    * The partition count (not the row count) bounds peak memory — exactly
    * the contract a 100 TB media pipeline needs.
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.map { m =>
        val (hist, sig) = byteSignature(m.payload)
        MediaFeatures(m.media_id, m.payload.length, hist, sig)
      }
    }
  }

  /** Decoded image facts + pixel statistics: dimensions, channel count,
    * mean/stddev of 8-bit luma (ITU-R BT.601 weights), and an 8-bin luma
    * histogram (normalized). Everything derives from REAL decoded pixels.
    */
  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Int,
      mean_luma: Double,
      std_luma: Double,
      luma_hist: Array[Float])

  /** Ceiling on DECLARED image pixels (default 64 M ≈ a 256 MB ARGB
    * raster): a decompression bomb — a tiny payload whose header declares
    * huge dimensions — makes ImageIO pre-allocate the full raster before
    * any pixel data is validated, and the resulting OutOfMemoryError is a
    * VirtualMachineError that escapes every Exception handler and kills
    * the executor. The header probe below is the only way to honor the
    * drop-not-fail contract against such payloads. A deliberate knob
    * (same shape as Pillow's MAX_IMAGE_PIXELS): corpora of legitimately
    * huge images — medium-format photos, stitched panoramas — RAISE it
    * on the driver; the Dataset-level transforms capture the value at
    * plan time so it reaches executors through the task closure.
    */
  @volatile var MaxImagePixels: Long = 64L * 1024 * 1024

  /** Decode one payload with `javax.imageio`. None for anything ImageIO
    * can't parse — corrupt bytes, truncated files, unknown formats — and
    * for payloads whose header DECLARES more than `maxPixels`
    * (probed header-only, before any raster allocation).
    */
  def decodeImage(payload: Array[Byte],
      maxPixels: Long = MaxImagePixels): Option[BufferedImage] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val (w, h) = (r.getWidth(0).toLong, r.getHeight(0).toLong)
            if (w <= 0 || h <= 0 || w * h > maxPixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Real distributed image decode: one `javax.imageio` decode per row in
    * a streaming partition pass. Undecodable payloads are dropped (never
    * fail the sweep); the survivor set is exactly the decodable corpus.
    */
  def decodeImageFeatures(media: Dataset[Media]): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    val maxPx = MaxImagePixels // captured at plan time, ships in the closure
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeImage(m.payload, maxPx).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val hist = new Array[Float](8)
          var sum = 0.0; var sumSq = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val luma = 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              sum += luma; sumSq += luma * luma
              // round-to-nearest before binning: the weighted sum for a pure
              // gray v lands an ulp below v, and truncation would misbin
              // every bin-boundary level
              hist(math.min((luma + 0.5).toInt, 255) >>> 5) += 1f
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          var b = 0
          while (b < 8) { hist(b) /= n.toFloat; b += 1 }
          val mean = sum / n
          val variance = math.max(sumSq / n - mean * mean, 0.0)
          ImageFeatures(m.media_id, w, h, img.getColorModel.getNumComponents,
            m.payload.length, mean, math.sqrt(variance), hist)
        }
      }
    }
  }

  /** Real distributed image resize: decode, bilinear-scale the long side
    * to `maxDim` (never upscale), re-encode as PNG. Undecodable payloads
    * are dropped. Same Dataset[Media] -> Dataset[Media] streaming contract
    * as every other media transform.
    */
  def resizeImages(media: Dataset[Media], maxDim: Int): Dataset[Media] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    implicit val enc = Encoders.product[Media]
    val maxPx = MaxImagePixels // captured at plan time, ships in the closure
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeImage(m.payload, maxPx).map { img =>
          val longSide = math.max(img.getWidth, img.getHeight)
          if (longSide <= maxDim) m
          else {
            val scale = maxDim.toDouble / longSide
            val (w, h) = (math.max((img.getWidth * scale).round.toInt, 1),
              math.max((img.getHeight * scale).round.toInt, 1))
            val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            Media(m.media_id, bos.toByteArray)
          }
        }
      }
    }
  }

  /** Decoded audio facts + waveform statistics, all from REAL decoded
    * PCM samples: stream format (rate/channels/bits), duration, and
    * channel-0 RMS / peak / zero-crossing rate — the standard cheap
    * audio-quality screens (silence, clipping, tone-vs-noise).
    */
  case class AudioFeatures(
      media_id: Long,
      sample_rate: Double,
      channels: Int,
      n_frames: Long,
      duration_s: Double,
      rms: Double,
      peak: Double,
      zero_cross_rate: Double)

  /** Decode one audio payload with `javax.sound.sampled` (pure JVM:
    * WAV/AIFF/AU containers, PCM and converted-to-PCM encodings) into
    * 16-bit signed little-endian samples. None for anything the JDK
    * can't parse. Compressed codecs (MP3/AAC/Opus) have no JVM decoder —
    * they remain the documented production slot; their containers fail
    * here and are dropped, never fatal.
    */
  def decodeAudio(payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Short])] =
    try {
      val in0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val f0 = in0.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels, 2 * f0.getChannels, f0.getSampleRate, false)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in0)
      val bytes = in.readAllBytes()
      in.close()
      val samples = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
        i += 1
      }
      Some((target, samples))
    } catch { case _: Exception => None }

  /** Real distributed audio decode: one JDK decode per row in a streaming
    * partition pass, undecodable payloads dropped — the audio sibling of
    * [[decodeImageFeatures]] with the identical iterator contract.
    */
  def decodeAudioFeatures(media: Dataset[Media]): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeAudio(m.payload).flatMap { case (fmt, samples) =>
          val ch = fmt.getChannels
          val nFrames = samples.length / math.max(ch, 1)
          if (nFrames == 0) None
          else {
            // channel-0 walk: RMS, peak, signed zero crossings
            var sumSq = 0.0; var peak = 0.0; var crossings = 0L
            var prevSign = 0
            var i = 0
            while (i < nFrames) {
              val s = samples(i * ch) / 32768.0
              sumSq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              val sign = if (s > 0) 1 else if (s < 0) -1 else 0
              if (sign != 0) {
                if (prevSign != 0 && sign != prevSign) crossings += 1
                prevSign = sign
              }
              i += 1
            }
            Some(AudioFeatures(m.media_id, fmt.getSampleRate.toDouble, ch, nFrames.toLong,
              nFrames / fmt.getSampleRate.toDouble, math.sqrt(sumSq / nFrames), peak,
              crossings.toDouble / nFrames))
          }
        }
      }
    }
  }

  /** Resize (byte-stride variant): stride-downsample the payload bytes —
    * the codec-independent sibling of [[resizeImages]] for payloads with
    * no JVM codec (audio PCM thinning, raw tensors).
    */
  def resize(media: Dataset[Media], factor: Int): Dataset[Media] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    implicit val enc = Encoders.product[Media]
    media.mapPartitions { it =>
      it.map { m =>
        val out = new Array[Byte]((m.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = m.payload(i * factor); i += 1 }
        Media(m.media_id, out)
      }
    }
  }

  /** One decoded video frame's facts: index within the stream, decoded
    * dimensions, and mean 8-bit luma (BT.601) — the per-frame screen a
    * sampling pipeline thresholds before any heavy model sees the frame.
    */
  case class VideoFrameFeatures(
      media_id: Long, frame_no: Int, width: Int, height: Int, mean_luma: Double)

  /** Extract the JPEG frame payloads of an MJPEG-in-AVI video: walk the
    * RIFF chunk tree (FourCC + little-endian size, word-aligned) into the
    * `movi` LIST and collect every `..dc` (compressed video) chunk. Pure
    * byte-walking — no codec; the frames themselves are JPEGs that
    * [[decodeImage]] handles. Nil for anything that is not a RIFF/AVI.
    * Inter-frame-coded formats (H.264 etc.) have no JVM decoder and
    * remain the documented production slot.
    */
  def mjpegFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | (payload(off + 1) & 0xffL) << 8 |
        (payload(off + 2) & 0xffL) << 16 | (payload(off + 3) & 0xffL) << 24
    def fourcc(off: Int): String = new String(payload, off, 4, "US-ASCII")
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    // EXPLICIT stack, not recursion: nesting depth is attacker-controlled
    // (12 bytes of payload buy one level, so ~600 KB buys ~50k levels) and
    // a StackOverflowError is a VirtualMachineError that NonFatal does NOT
    // catch — a recursive walk would fail the task despite the
    // drop-not-fail contract below. Child ranges are processed before the
    // parent's continuation, so frame order matches the recursive walk.
    def walkAll(): Unit = {
      val stack = scala.collection.mutable.Stack[(Int, Int, Boolean)]((0, payload.length, false))
      while (stack.nonEmpty) {
        var (off, until, inMovi) = stack.pop()
        var live = true
        while (live && off + 8 <= until) {
          val id = fourcc(off)
          val size = u32(off + 4)
          val body = off + 8
          // Bounds math in Long: a declared size near 2^31 would wrap an Int
          // `body + size` negative and bypass the truncation guard.
          val end = body.toLong + size
          if (size < 0 || end > until) live = false // truncated/corrupt: stop this range
          else {
            val next = (end + (size & 1)).toInt // chunks are word-aligned
            if (id == "RIFF" || id == "LIST") {
              if (body + 4 <= until) {
                val listType = fourcc(body)
                stack.push((next, until, inMovi)) // resume here after the child
                stack.push((body + 4, end.toInt, inMovi || listType == "movi"))
                live = false
              } else off = next
            } else {
              if (inMovi && id.length == 4 && id.endsWith("dc") && size > 0)
                out += java.util.Arrays.copyOfRange(payload, body, end.toInt)
              off = next
            }
          }
        }
      }
    }
    // Drop-not-fail: no malformed container may ever fail a task, so any
    // escape from the walk (however the bytes were crafted) yields Nil.
    try {
      if (payload.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
        walkAll()
      out.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Real distributed video frame sampling for MJPEG-in-AVI payloads:
    * every `everyNth` frame is decoded with `javax.imageio` and reduced
    * to per-frame facts — the same streaming partition pass and
    * drop-not-fail contract as the image and audio decoders. Non-AVI or
    * non-MJPEG payloads yield no rows.
    */
  def decodeVideoFrameFeatures(media: Dataset[Media], everyNth: Int = 1)
      : Dataset[VideoFrameFeatures] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    implicit val enc = Encoders.product[VideoFrameFeatures]
    val maxPx = MaxImagePixels // captured at plan time, ships in the closure
    media.mapPartitions { it =>
      it.flatMap { m =>
        mjpegFrames(m.payload).zipWithIndex
          .collect { case (bytes, no) if no % everyNth == 0 => (bytes, no) }
          .flatMap { case (bytes, no) =>
            decodeImage(bytes, maxPx).map { img =>
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              VideoFrameFeatures(m.media_id, no, w, h, sum / (w.toLong * h))
            }
          }.iterator
      }
    }
  }

  /** Frame sampling: every `stride`-th byte window as a "frame" (the
    * codec-independent byte-window slot for formats with no JVM decoder;
    * MJPEG/AVI has the real path above).
    */
  case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[Media], frameSize: Int, stride: Int): Dataset[Frame] = {
    // validate on the DRIVER like every sibling transform: a zero stride
    // would otherwise surface as a lazy per-task IllegalArgumentException
    // (Iterator.range step) with an opaque executor stack trace
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    implicit val enc = Encoders.product[Frame]
    media.mapPartitions { it =>
      it.flatMap { m =>
        Iterator.range(0, math.max(m.payload.length - frameSize + 1, 0), stride)
          .zipWithIndex
          .map { case (off, no) =>
            Frame(m.media_id, no, java.util.Arrays.copyOfRange(m.payload, off, off + frameSize))
          }
      }
    }
  }
}
