package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Stream-stream interval join parity: replaying both event streams
  * through file sources yields exactly the batch interval-join rows
  * (inner interval joins emit matches as they arrive; the watermark +
  * range bound only governs state eviction).
  */
class StreamJoinSpec extends SparkSuite {

  private val horizonUs = 1800000000L // 30 min

  private lazy val events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
  }

  test("streamed interval join equals the batch interval join") {
    val viewDir = scratch("sj-views")
    val buyDir = scratch("sj-buys")
    events.filter(col("event_type") === "view").write.parquet(viewDir)
    events.filter(col("event_type") === "purchase").write.parquet(buyDir)

    val schema = "user_id LONG, event_id LONG, event_type STRING, ts_us LONG"
    val views = spark.readStream.schema(schema).parquet(viewDir)
    val buys = spark.readStream.schema(schema).parquet(buyDir)

    val q = StreamJoin.correlate(views, buys, horizonUs).writeStream
      .outputMode("append").format("memory").queryName("sj_out").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sj_out")
    val batch = StreamJoin.correlate(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"), horizonUs)
    assert(batch.count() > 0)
    assertSameRows(streamed.orderBy("a_id", "b_id"), batch.orderBy("a_id", "b_id"))
  }

  test("left-outer: matches emit immediately, unmatched only after the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sec = 1000000L
    val trig = MemoryStream[(Long, Long, Long)] // (user_id, ts_us, event_id)
    val resp = MemoryStream[(Long, Long, Long)]
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select($"_1".as("user_id"), $"_2".as("ts_us"), $"_3".as("event_id"))
    val out = StreamJoin.correlateOuter(shape(trig.toDF()), shape(resp.toDF()), horizonUs)
    val q = out.writeStream.outputMode("append").format("memory").queryName("sjo").start()

    def rows() = spark.table("sjo").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    // b1: user 1 trigger+response inside the horizon (match), user 2
    // trigger with no response. Times sit at hour 2, NOT epoch 0 — the
    // query starts with watermark 0 and rows at event-time 0 are dropped
    // as late before they reach join state.
    trig.addData((1L, 7200 * sec, 1L), (2L, 7200 * sec, 2L))
    resp.addData((1L, 7800 * sec, 101L))
    q.processAllAvailable()
    assert(rows().contains((1L, 101L)), "in-horizon match must emit immediately")
    assert(!rows().contains((2L, -1L)),
      "unmatched trigger must NOT emit while a response could still arrive")

    // b2: advance BOTH watermarks (global wm = min of sides) far past
    // trigger 2's horizon; the null row emits on the state-eviction batch
    trig.addData((9L, 21600 * sec, 9L))
    resp.addData((9L, 21600 * sec, 909L))
    q.processAllAvailable()
    q.stop()
    assert(rows().contains((2L, -1L)),
      s"watermark-expired trigger must emit with null response, got ${rows()}")
    assert(!rows().contains((1L, -1L)), "matched trigger must not also emit a null row")
  }
}
