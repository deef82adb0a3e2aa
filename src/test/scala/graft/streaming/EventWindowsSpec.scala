package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming tumbling windows: complete-mode output equals the batch
  * aggregate exactly; append mode emits only watermark-closed windows.
  */
class EventWindowsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type", $"value", expr("ts div 1000").as("ts_us"))
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDecimal(3))

  test("complete-mode streaming windows equal the batch aggregate") {
    val srcDir = scratch("evw-src")
    events.write.parquet(srcDir)
    val stream = spark.readStream
      .schema("event_type STRING, value DOUBLE, ts_us LONG")
      .parquet(srcDir)
    val q = EventWindows.hourly(stream).writeStream
      .outputMode("complete").format("memory").queryName("evw_c").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("evw_c").collect().map(key).toMap
    val batch = EventWindows.hourly(events).collect().map(key).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("append mode emits exactly the watermark-closed windows") {
    val srcDir = scratch("evw-app-src")
    events.write.parquet(srcDir)
    val stream = spark.readStream
      .schema("event_type STRING, value DOUBLE, ts_us LONG")
      .parquet(srcDir)
    val q = EventWindows.hourly(stream, watermarkDelay = "0 seconds").writeStream
      .outputMode("append").format("memory").queryName("evw_a").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("evw_a").collect().map(key).toMap
    val batch = EventWindows.hourly(events).collect().map(key).toMap
    // every emitted window matches the batch value...
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"window $k differs") }
    // ...and only windows whose end precedes the final watermark (max ts)
    // may emit; the trailing open window per type must be withheld
    val maxTs = events.agg(max($"ts_us")).as[Long].head()
    assert(streamed.keys.forall { case (hourUs, _) => hourUs + 3600000000L <= maxTs })
    assert(streamed.nonEmpty && streamed.size < batch.size)
  }
}
