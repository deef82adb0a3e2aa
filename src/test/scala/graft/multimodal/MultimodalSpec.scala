package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSuite

/** The multimodal contract: schema, partition-streaming transform shape,
  * codec-independent byte signatures, and REAL `javax.imageio` decode —
  * the image tests synthesize PNGs in-memory and assert decoded
  * dimensions and pixel statistics.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, "abc"), (3L, "")
  ).toDF("doc_id", "text")

  /** In-memory PNG with pixel (x, y) = gray level `f(x, y)`. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("payload column carries bytes with typed metadata") {
    val media = Multimodal.withPayload(docs, "text", "doc_id")
    val m = media.collect().map(x => x.media_id -> x.payload.length).toMap
    assert(m == Map(1L -> 11, 2L -> 3, 3L -> 0))
  }

  test("byte signatures are deterministic and partition-streaming") {
    val media = Multimodal.withPayload(docs, "text", "doc_id").repartition(2)
    val f = Multimodal.extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 11)
    assert(f(1L).histogram.length == 8 && f(1L).signature.length == 16)
    assert(math.abs(f(1L).histogram.sum - 1.0f) < 1e-6)
    // deterministic: extracting twice gives identical features
    val f2 = Multimodal.extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(2L).signature.toSeq == f2(2L).signature.toSeq)
  }

  test("real PNG decode yields exact dimensions and pixel statistics") {
    val white = png(50, 40)((_, _) => 255) // solid white
    val ramp = png(256, 2)((x, _) => x)    // every gray level twice
    val corrupt = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val media = Seq(
      Multimodal.Media(1L, white),
      Multimodal.Media(2L, ramp),
      Multimodal.Media(3L, corrupt)
    ).toDS().repartition(2)
    val got = Multimodal.decodeImageFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    // corrupt payload dropped, never fails the job
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L).width == 50 && got(1L).height == 40 && got(1L).channels == 3)
    assert(math.abs(got(1L).mean_luma - 255.0) < 1e-6 && got(1L).std_luma < 1e-6)
    // white = luma 255 -> all mass in the top histogram bin
    assert(math.abs(got(1L).luma_hist(7) - 1.0f) < 1e-6)
    // uniform 0..255 ramp: mean 127.5, each of the 8 bins holds exactly 1/8
    assert(got(2L).width == 256 && got(2L).height == 2)
    assert(math.abs(got(2L).mean_luma - 127.5) < 1e-6)
    got(2L).luma_hist.foreach(b => assert(math.abs(b - 0.125f) < 1e-6))
  }

  test("real image resize scales the long side and re-encodes decodably") {
    val media = Seq(
      Multimodal.Media(1L, png(64, 32)((x, y) => x + y)),
      Multimodal.Media(2L, png(8, 4)((_, _) => 9)), // already small: untouched
      Multimodal.Media(3L, "not an image".getBytes)
    ).toDS()
    val out = Multimodal.resizeImages(media, maxDim = 16)
      .collect().map(m => m.media_id -> m.payload).toMap
    assert(out.keySet == Set(1L, 2L))
    val r1 = ImageIO.read(new java.io.ByteArrayInputStream(out(1L)))
    assert(r1.getWidth == 16 && r1.getHeight == 8)
    // under maxDim: bytes pass through bit-identical (no decode/re-encode loss)
    assert(out(2L).toSeq == png(8, 4)((_, _) => 9).toSeq)
  }

  test("real audio decode extracts format facts and waveform statistics") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // synthesize a 16-bit mono PCM WAV: 440 Hz sine, amplitude 0.5, 0.5 s
    def sineWav(freq: Double, rate: Float, seconds: Double, amp: Double): Array[Byte] = {
      val n = (rate * seconds).toInt
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = (amp * math.sin(2 * math.Pi * freq * i / rate) * 32767).toInt.toShort
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.Media(1L, sineWav(440.0, 8000f, 0.5, 0.5)),
      Multimodal.Media(2L, "definitely not audio".getBytes)
    ).toDS()
    val got = Multimodal.decodeAudioFeatures(media).collect().map(f => f.media_id -> f).toMap
    // corrupt payload dropped, never fails the job
    assert(got.keySet == Set(1L))
    val f = got(1L)
    assert(f.sample_rate == 8000.0 && f.channels == 1 && f.n_frames == 4000L)
    assert(math.abs(f.duration_s - 0.5) < 1e-9)
    // sine of amplitude a: RMS = a/sqrt(2), peak = a, ZCR = 2f/rate
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f.rms}")
    assert(math.abs(f.peak - 0.5) < 0.01, s"peak ${f.peak}")
    assert(math.abs(f.zero_cross_rate - 2 * 440.0 / 8000.0) < 0.005, s"zcr ${f.zero_cross_rate}")
  }

  test("resize stride-downsamples payloads") {
    val media = Multimodal.withPayload(Seq((1L, "abcdefgh"), (2L, "xy")).toDF("doc_id", "text"), "text", "doc_id")
    val out = Multimodal.resize(media, factor = 3).collect().map(m => m.media_id -> new String(m.payload)).toMap
    assert(out == Map(1L -> "adg", 2L -> "x"))
  }

  test("real MJPEG/AVI video frame sampling decodes every Nth frame") {
    // build a minimal RIFF/AVI: LIST('movi') holding JPEG '00dc' chunks
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def jpegGray(level: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val frames = Seq(40, 128, 220).map(l => chunk("00dc", jpegGray(l, 20, 10)))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++ frames.flatten)
    val avi = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
    val media = Seq(
      Multimodal.Media(1L, avi),
      Multimodal.Media(2L, "not a video at all".getBytes)
    ).toDS()
    val all = Multimodal.decodeVideoFrameFeatures(media).collect().sortBy(_.frame_no)
    assert(all.map(_.media_id).forall(_ == 1L) && all.length == 3)
    assert(all.forall(f => f.width == 20 && f.height == 10))
    // solid-gray JPEGs decode near their level; ordering must hold
    assert(all.map(_.mean_luma).sliding(2).forall(w => w(0) < w(1)))
    assert(math.abs(all(1).mean_luma - 128.0) < 3.0, s"mid frame luma ${all(1).mean_luma}")
    // every-2nd sampling keeps frames 0 and 2
    val sampled = Multimodal.decodeVideoFrameFeatures(media, everyNth = 2).collect()
    assert(sampled.map(_.frame_no).sorted.toSeq == Seq(0, 2))
  }

  test("corrupt AVI containers drop to zero frames instead of failing the task") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // an inner frame chunk declaring a size near 2^31 inside a
    // well-formed RIFF/LIST shell: Int math wraps `body + size` negative,
    // bypasses the truncation guard, and copyOfRange throws out of the
    // task — the walk must drop the container instead
    val dc = "00dc".getBytes("US-ASCII") ++ le32(0x7ffffff0L) ++ Array.fill(16)(0.toByte)
    val list = "LIST".getBytes("US-ASCII") ++ le32(4L + dc.length) ++
      "movi".getBytes("US-ASCII") ++ dc
    val overflow = "RIFF".getBytes("US-ASCII") ++ le32(4L + list.length) ++
      "AVI ".getBytes("US-ASCII") ++ list
    assert(Multimodal.mjpegFrames(overflow) == Nil)
    // size bytes reading as u32 max (declared size 4294967295)
    val maxSize = "RIFF".getBytes("US-ASCII") ++ le32(0xffffffffL) ++
      "AVI ".getBytes("US-ASCII") ++ Array.fill(8)(0xff.toByte)
    assert(Multimodal.mjpegFrames(maxSize) == Nil)
    // truncated mid-header
    assert(Multimodal.mjpegFrames("RIFF    AVI ".getBytes("US-ASCII")) == Nil)
  }

  test("a deeply nested LIST tree walks iteratively — no StackOverflowError") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // 60k nesting levels (12 bytes each): a recursive walk overflows the
    // JVM stack, and StackOverflowError is a VirtualMachineError that
    // NonFatal does NOT catch — it would fail the task. Innermost level
    // is a movi LIST holding one dc frame, so the walk must also still
    // REACH it (order and reachability preserved by the explicit stack).
    val levels = 60000
    val dc = "00dc".getBytes("US-ASCII") ++ le32(4L) ++ "JPEG".getBytes("US-ASCII")
    val movi = "LIST".getBytes("US-ASCII") ++ le32(4L + dc.length) ++
      "movi".getBytes("US-ASCII") ++ dc
    var body = movi
    (1 to levels).foreach { _ =>
      body = "LIST".getBytes("US-ASCII") ++ le32(4L + body.length) ++
        "hdrl".getBytes("US-ASCII") ++ body
    }
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(4L + body.length) ++
      "AVI ".getBytes("US-ASCII") ++ body
    val frames = Multimodal.mjpegFrames(avi)
    assert(frames.size == 1 && new String(frames.head, "US-ASCII") == "JPEG",
      "the innermost movi frame must still be reached")
  }

  test("a decompression-bomb image header is dropped before raster allocation") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // hand-built PNG signature + IHDR declaring 50000x50000 (2.5 G pixels;
    // a real decode would pre-allocate a ~10 GB raster and die with an
    // OutOfMemoryError no Exception handler catches). The probe must
    // reject it from the DECLARED dimensions alone.
    val ihdrBody = be32(50000L) ++ be32(50000L) ++
      Array[Byte](8, 6, 0, 0, 0) // bit depth 8, RGBA
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrBody)
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13L) ++ "IHDR".getBytes("US-ASCII") ++ ihdrBody ++ be32(crc.getValue)
    assert(Multimodal.decodeImage(png).isEmpty, "bomb header must be dropped")
    // …and a legitimate image still decodes through the probed path
    assert(Multimodal.decodeImage(this.png(8, 8)((x, y) => x * y)).isDefined)
  }

  test("frame sampling validates its parameters on the driver") {
    val media = Multimodal.withPayload(Seq((1L, "abcdefgh")).toDF("doc_id", "text"), "text", "doc_id")
    intercept[IllegalArgumentException] { Multimodal.sampleFrames(media, 4, 0) }
    intercept[IllegalArgumentException] { Multimodal.sampleFrames(media, 0, 2) }
  }

  test("RIFF walk never throws on seeded random bytes (drop-not-fail fuzz)") {
    // 100 TB sweeps see arbitrary garbage; the walk's contract is Nil or
    // frames, never an exception out of the task. Seeded, so failures
    // reproduce. Half the cases get a valid RIFF/AVI preamble so the
    // walk actually enters the chunk loop on attacker-shaped bytes.
    val rng = new scala.util.Random(20260813)
    (0 until 300).foreach { i =>
      val n = rng.nextInt(512)
      val bytes = Array.fill(n)(rng.nextInt().toByte)
      if (i % 2 == 0 && n >= 12) {
        "RIFF".getBytes("US-ASCII").copyToArray(bytes, 0)
        "AVI ".getBytes("US-ASCII").copyToArray(bytes, 8)
      }
      Multimodal.mjpegFrames(bytes): Unit // must not throw
    }
  }

  test("frame sampling yields strided windows") {
    val media = Multimodal.withPayload(Seq((1L, "abcdefgh")).toDF("doc_id", "text"), "text", "doc_id")
    val frames = Multimodal.sampleFrames(media, frameSize = 4, stride = 2).collect()
    assert(frames.map(_.frame_no).sorted.toSeq == Seq(0, 1, 2))
    assert(new String(frames.sortBy(_.frame_no).head.frame) == "abcd")
  }
}
