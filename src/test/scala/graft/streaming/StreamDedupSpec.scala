package graft.streaming

import graft.SparkSuite

/** Dedup-within-horizon contract: duplicates inside the watermark horizon
  * collapse to one emission; a duplicate arriving after state eviction
  * re-emits (documented at-least-once beyond the horizon).
  */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  test("duplicates within the watermark horizon collapse to one row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)] // (content_hash, ts_us)
    val stream = ms.toDF().select($"_1".as("content_hash"), $"_2".as("ts_us"))
    val q = StreamDedup.byKey(stream, Seq("content_hash"), "ts_us", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sdd").start()

    val sec = 1000000L
    def emitted() = spark.table("sdd").groupBy("content_hash").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // same-batch and cross-batch duplicates inside the horizon
    ms.addData(("a", 10 * sec), ("a", 11 * sec), ("b", 12 * sec))
    q.processAllAvailable()
    ms.addData(("a", 20 * sec))
    q.processAllAvailable()
    assert(emitted() == Map("a" -> 1L, "b" -> 1L), s"got ${emitted()}")

    // advance far past the horizon -> state for a/b evicts; a re-sent
    // duplicate is a NEW emission (the documented at-least-once edge)
    ms.addData(("c", 100000 * sec))
    q.processAllAvailable()
    ms.addData(("a", 100001 * sec))
    q.processAllAvailable()
    q.stop()
    assert(emitted() == Map("a" -> 2L, "b" -> 1L, "c" -> 1L), s"got ${emitted()}")
  }
}
