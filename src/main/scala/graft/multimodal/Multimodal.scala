package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-streaming typed transforms (the Scala
  * analog of `mapInPandas` batches — one iterator pass per partition, no
  * driver materialization, constant memory).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`): it derives features
  * purely from the payload bytes. The Spark-side plumbing — schema,
  * partitioning, batch iteration, feature shape — is real and tested; swap
  * `fakeDecode` for a JNI/codec call in production.
  */
object Multimodal {

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

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (no codec libraries in this environment). Features are pure
    * functions of the bytes so tests are reproducible.
    */
  def fakeDecode(payload: Array[Byte]): (Array[Float], Array[Float]) = {
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
        val (hist, sig) = fakeDecode(m.payload)
        MediaFeatures(m.media_id, m.payload.length, hist, sig)
      }
    }
  }

  /** Resize: stride-downsample the payload bytes (stub for an image
    * resize — a real implementation swaps the byte loop for a codec call;
    * the per-partition streaming shape and the Dataset[Media] -> Dataset
    * [Media] contract are the production plumbing).
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

  /** Frame sampling: every `stride`-th byte window as a "frame" (stub for
    * video frame extraction — same iterator shape, real plumbing).
    */
  case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[Media], frameSize: Int, stride: Int): Dataset[Frame] = {
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
