package graft.multimodal

import graft.SparkSuite

/** The multimodal plumbing contract: schema, partition-streaming transform
  * shape, deterministic stub features (see Multimodal scaladoc — decode is
  * a deterministic STUB; the Spark plumbing is real).
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, "abc"), (3L, "")
  ).toDF("doc_id", "text")

  test("payload column carries bytes with typed metadata") {
    val media = Multimodal.withPayload(docs, "text", "doc_id")
    val m = media.collect().map(x => x.media_id -> x.payload.length).toMap
    assert(m == Map(1L -> 11, 2L -> 3, 3L -> 0))
  }

  test("feature extraction is deterministic and partition-streaming") {
    val media = Multimodal.withPayload(docs, "text", "doc_id").repartition(2)
    val f = Multimodal.extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 11)
    assert(f(1L).histogram.length == 8 && f(1L).signature.length == 16)
    assert(math.abs(f(1L).histogram.sum - 1.0f) < 1e-6)
    // deterministic: extracting twice gives identical features
    val f2 = Multimodal.extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(2L).signature.toSeq == f2(2L).signature.toSeq)
  }

  test("resize stride-downsamples payloads") {
    val media = Multimodal.withPayload(Seq((1L, "abcdefgh"), (2L, "xy")).toDF("doc_id", "text"), "text", "doc_id")
    val out = Multimodal.resize(media, factor = 3).collect().map(m => m.media_id -> new String(m.payload)).toMap
    assert(out == Map(1L -> "adg", 2L -> "x"))
  }

  test("frame sampling yields strided windows") {
    val media = Multimodal.withPayload(Seq((1L, "abcdefgh")).toDF("doc_id", "text"), "text", "doc_id")
    val frames = Multimodal.sampleFrames(media, frameSize = 4, stride = 2).collect()
    assert(frames.map(_.frame_no).sorted.toSeq == Seq(0, 1, 2))
    assert(new String(frames.sortBy(_.frame_no).head.frame) == "abcd")
  }
}
