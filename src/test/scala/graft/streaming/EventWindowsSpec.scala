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
      .select($"event_type", $"value", expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))

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

  test("sliding streaming windows equal the batch grid (q_sliding_window twin)") {
    val srcDir = scratch("evw-slide-src")
    events.write.parquet(srcDir)
    def grid(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", timestamp_micros($"ts_us"))
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .count()
      .select(unix_micros(col("w.start")).as("s"), col("event_type"), col("count"))
    val stream = spark.readStream
      .schema("event_type STRING, value DOUBLE, ts_us LONG")
      .parquet(srcDir)
    val q = grid(stream).writeStream
      .outputMode("complete").format("memory").queryName("evw_sl").start()
    q.processAllAvailable()
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = keyed(spark.table("evw_sl").collect())
    val batch = keyed(grid(events).collect())
    assert(streamed == batch)
    // each event lands in exactly size/slide = 4 overlapping windows
    assert(batch.values.sum == events.count() * 4)
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

  test("watermark closes windows incrementally across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Double, Long)] // (event_type, value, ts_us)
    val stream = ms.toDF()
      .select($"_1".as("event_type"), $"_2".as("value"), $"_3".as("ts_us"))
    val q = EventWindows.hourly(stream).writeStream // 10 min watermark delay
      .outputMode("append").format("memory").queryName("evw_mb").start()

    def emitted() = spark.table("evw_mb").collect().map(key).toMap
    val sec = 1000000L
    val all = scala.collection.mutable.ArrayBuffer[(String, Double, Long)]()
    def add(rows: (String, Double, Long)*): Unit = {
      all ++= rows; ms.addData(rows: _*); q.processAllAvailable()
    }

    // b1: hour 0 (types a+b) and early hour 1 — nothing closeable yet
    add(("a", 1.0, 100 * sec), ("a", 2.0, 200 * sec), ("b", 9.0, 300 * sec),
      ("a", 3.0, 3700 * sec))
    assert(emitted().isEmpty, "no window end is past the watermark yet")
    // b2: a LATE hour-0 event still above the watermark (wm = 3700s-10min)
    // must merge into the open hour-0 window, not be dropped; the hour-2
    // event advances the watermark (to 6700s) past hour 0's end, so hour 0
    // closes in b2's follow-up emission batch — hour 1 (ends 7200s) stays
    // open
    add(("a", 4.0, 3200 * sec), ("a", 5.0, 7300 * sec))
    val afterH0 = emitted()
    assert(afterH0.keySet == Set((0L, "a"), (0L, "b")),
      s"exactly hour 0 should have closed, got ${afterH0.keySet}")
    // b3: watermark (19400s) closes hours 1 and 2; hour 5 stays open
    add(("a", 6.0, 20000 * sec))
    val fin = emitted()
    assert(fin.size > afterH0.size, "emission must span multiple micro-batches")

    // every closed window equals the batch aggregate over the full feed
    val batch = EventWindows.hourly(all.toSeq.toDF("event_type", "value", "ts_us"))
      .collect().map(key).toMap
    val horizonUs = (20000 - 600) * sec // final watermark: b3 max ts - delay
    val closable = batch.filter { case ((h, _), _) => h + 3600 * sec <= horizonUs }
    assert(fin == closable, s"streamed $fin\nbatch-closable $closable")
    q.stop()
  }
}
