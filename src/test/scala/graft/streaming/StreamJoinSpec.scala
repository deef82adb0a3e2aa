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
        expr("ts div 1000").as("ts_us"))
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
}
