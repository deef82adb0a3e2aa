package graft.streaming

import graft.SparkSuite

/** Streaming near-dup contract: same-bucket arrivals within the horizon
  * emit candidate hits with the signature-agreement estimate; novel docs
  * emit nothing; bucket state evicts at the horizon (at-least-once
  * beyond it); band keys agree with the batch minhash pipeline.
  */
class StreamNearDupSpec extends SparkSuite {
  import spark.implicits._

  private val sec = 1000000L
  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  // one trailing token differs from textA -> most shingles shared
  private val textANear = "the quick brown fox jumps over the lazy dog again and once"
  private val textB = "completely different content about distributed query engines at scale"

  private def run(batches: Seq[Seq[(Long, String, Long)]], horizonUs: Long,
      name: String): Map[Long, Seq[(Long, Double)]] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val stream = ms.toDF().toDF("doc_id", "text", "ts_us")
    val q = StreamNearDup.candidates(stream, horizonUs)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.map(h => (h._2, h._3)).toSeq).toMap
  }

  test("near-dup within the horizon hits; novel docs emit nothing") {
    val got = run(Seq(
      Seq((1L, textA, 10 * sec), (2L, textB, 11 * sec)),
      Seq((3L, textANear, 20 * sec))
    ), horizonUs = 600 * sec, name = "snd1")
    // doc 3 collides with doc 1's buckets on at least one band, high est
    assert(got.contains(3L), s"expected hits for doc 3, got $got")
    assert(got(3L).forall(_._1 == 1L))
    assert(got(3L).exists(_._2 >= 0.5))
    // docs 1 and 2 are first occupants everywhere: no hits
    assert(!got.contains(1L) && !got.contains(2L))
  }

  test("a null doc_id/ts_us row is dropped instead of wedging the query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Option[Long], String, Option[Long])]
    val stream = ms.toDF().toDF("doc_id", "text", "ts_us")
    val q = StreamNearDup.candidates(stream, 600 * sec)
      .writeStream.outputMode("append").format("memory").queryName("snd_null").start()
    // pre-fix the null rows were poison pills: the typed BandRow encoder
    // NPEs on its non-nullable Longs, the query dies, and the checkpoint
    // replays the same offsets forever
    ms.addData((Some(1L), textA, Some(10 * sec)),
      (None, textA, Some(11 * sec)), (Some(2L), textA, None))
    q.processAllAvailable()
    ms.addData((Some(3L), textA, Some(20 * sec)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("snd_null").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && got.forall(_ == (3L, 1L)),
      s"doc 3 must hit doc 1 (null rows dropped, occupancy undisturbed): ${got.toSeq}")
    assert(got.length == graft.functions.TextFns.MinhashBands.size,
      "the exact duplicate hits on every band")
  }

  test("an exact duplicate hits on every band with est_sim 1.0") {
    val got = run(Seq(
      Seq((1L, textA, 10 * sec)),
      Seq((2L, textA, 20 * sec))
    ), horizonUs = 600 * sec, name = "snd2")
    assert(got(2L).size == graft.functions.TextFns.MinhashBands.size)
    assert(got(2L).forall { case (fd, est) => fd == 1L && est == 1.0 })
  }

  test("beyond the horizon, bucket state evicts and a duplicate re-occupies silently") {
    val got = run(Seq(
      Seq((1L, textA, 10 * sec)),
      // advance the watermark far past doc 1's buckets' timeout
      Seq((9L, textB, 100000 * sec)),
      Seq((2L, textA, 100001 * sec))
    ), horizonUs = 60 * sec, name = "snd3")
    // doc 1's buckets evicted -> doc 2 is a fresh occupant, no hits
    assert(!got.contains(2L), s"expected no hits after eviction, got $got")
  }

  test("batch twin agrees with the stream across multiple horizon lapses") {
    // arrivals 40s apart under a 60s horizon: buckets re-occupy repeatedly
    // over the replay, the regime a single-first-occupant cut gets wrong
    val data = Seq(
      (1L, textA, 10 * sec), (2L, textANear, 50 * sec), (3L, textB, 60 * sec),
      (4L, textA, 130 * sec), (5L, textA, 170 * sec), (6L, textB, 200 * sec),
      (7L, textANear, 260 * sec))
    val got = run(data.map(Seq(_)), horizonUs = 60 * sec, name = "snd5")
    val gotPairs = got.flatMap { case (d, hs) => hs.map(h => (d, h._1, h._2)) }.toSet
    val batch = StreamNearDup.batchTwin(
        spark.createDataset(data).toDF("doc_id", "text", "ts_us"), horizonUs = 60 * sec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(gotPairs == batch,
      s"stream/batch divergence:\n only-stream=${gotPairs -- batch}\n only-batch=${batch -- gotPairs}")
    assert(gotPairs.nonEmpty)
  }

  test("continuous same-bucket traffic still honors the horizon (inline re-occupancy)") {
    // The bucket receives data every batch, so the timed-out path never
    // runs; the handler must expire the occupant inline. doc 2 hits
    // doc 1 (within horizon); doc 3 arrives past doc 1's horizon in a
    // bucket that never drained -> it RE-OCCUPIES (no hit against the
    // stale occupant); doc 4 then hits doc 3, the fresh occupant.
    val got = run(Seq(
      Seq((1L, textA, 10 * sec)),
      Seq((2L, textA, 30 * sec)),
      Seq((3L, textA, 100 * sec)),
      Seq((4L, textA, 110 * sec))
    ), horizonUs = 60 * sec, name = "snd4")
    assert(got(2L).forall(_._1 == 1L), s"doc 2 should hit doc 1: $got")
    assert(!got.contains(3L), s"doc 3 is past doc 1's horizon and must re-occupy, got $got")
    assert(got(4L).forall(_._1 == 3L), s"doc 4 should hit the fresh occupant doc 3: $got")
  }
}
