package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Stateful sessionization: the flatMapGroups batch fold equals the
  * window-function batch query (q_sessionize), and the
  * flatMapGroupsWithState streaming form emits the same closed sessions.
  */
class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"event_id", expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      .as[Sessionize.Event]
  }

  test("batch fold matches the window-function sessionization") {
    val got = Sessionize.closeAll(events).collect()
      .map(s => (s.user_id, s.t_start) -> (s.t_end, s.n_events)).toMap

    // oracle: the same lag/running-sum construction as q_sessionize
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val exp = events.toDF()
      .withColumn("brk", when(lag($"ts_us", 1).over(w).isNull ||
        $"ts_us" - lag($"ts_us", 1).over(w) > Sessionize.DefaultGapUs, 1).otherwise(0))
      .withColumn("sid", sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts_us").as("t_start"), max($"ts_us").as("t_end"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getLong(4))).toMap

    assert(got == exp)
  }

  test("streaming flatMapGroupsWithState emits the same closed sessions") {
    val srcDir = scratch("sess-src")
    events.toDF().write.parquet(srcDir)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts_us LONG")
      .parquet(srcDir)
      .as[Sessionize.Event]
    val q = Sessionize.sessions(stream).writeStream
      .outputMode("append").format("memory").queryName("sess").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess").as[Sessionize.Session].collect()
      .map(s => (s.user_id, s.t_start) -> (s.t_end, s.n_events)).toMap
    val batch = Sessionize.closeAll(events).collect()
      .map(s => (s.user_id, s.t_start) -> (s.t_end, s.n_events)).toMap
    // the streaming run holds each user's trailing session open (state, no
    // timeout fired in a single batch) — closed sessions must agree
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"session $k differs") }
    assert(streamed.size == batch.size - batch.keys.map(_._1).toSet.size)
  }

  test("cross-batch out-of-order events merge without rewinding the open session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)] // (user_id, event_id, ts_us)
    val min = 60L * 1000000L
    val gap = 5 * min
    val stream = ms.toDF()
      .withColumn("ts", timestamp_micros($"_3"))
      .withWatermark("ts", "30 minutes") // delay > 0 admits below-lastUs events
      .select($"_1".as("user_id"), $"_2".as("event_id"), $"_3".as("ts_us"), $"ts")
      .as[Sessionize.Event]
    val q = Sessionize.sessions(stream, gap).writeStream
      .outputMode("append").format("memory").queryName("sess_ooo").start()
    // batch 1: open sessions for users 1, 2, and 4
    ms.addData((1L, 1L, 100 * min), (1L, 2L, 102 * min),
      (2L, 3L, 100 * min), (2L, 4L, 101 * min),
      (4L, 7L, 100 * min), (4L, 8L, 101 * min))
    q.processAllAvailable()
    // batch 2: on-time (within the 30 min watermark delay) but BELOW each
    // open session's lastUs — a naive lastUs = e.ts would emit
    // t_end < t_start and re-arm the timeout early
    ms.addData(
      (1L, 5L, 98 * min), // within gap of user 1's session: merge, extend start down
      (2L, 6L, 80 * min), // > gap before user 2's start: its own singleton
      // user 4: a CHAIN of late events — 93 is beyond gap of the session
      // start on its own, but chains through 97 into it; an
      // ascending-order event-at-a-time merge would emit 93 as a
      // spurious singleton before 97 extends the session's reach
      (4L, 9L, 93 * min), (4L, 10L, 97 * min))
    q.processAllAvailable()
    // push the watermark past every horizon, then fire the timeouts
    ms.addData((9L, 7L, 100000 * min)); q.processAllAvailable()
    ms.addData((9L, 8L, 100001 * min)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_ooo").as[Sessionize.Session].collect()
      .map(s => (s.user_id, s.t_start, s.t_end, s.n_events)).toSet
    assert(got.contains((1L, 98 * min, 102 * min, 3L)),
      s"out-of-order merge must extend start down and never rewind end: $got")
    assert(got.contains((2L, 80 * min, 80 * min, 1L)),
      s"an event > gap before the open session closes as its own singleton: $got")
    assert(got.contains((2L, 100 * min, 101 * min, 2L)),
      s"the open session must survive the ancient event untouched: $got")
    assert(got.contains((4L, 93 * min, 101 * min, 4L)),
      s"a late chain must merge as one session, exactly like the sorted batch: $got")
  }

  test("watermark closes a trailing open session via event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)] // (user_id, event_id, ts_us)
    val stream = ms.toDF()
      .withColumn("ts", timestamp_micros($"_3"))
      .withWatermark("ts", "0 seconds")
      // the watermarked column must SURVIVE the projection — Spark requires
      // an event-time attribute in the grouped input for EventTimeTimeout
      .select($"_1".as("user_id"), $"_2".as("event_id"), $"_3".as("ts_us"), $"ts")
      .as[Sessionize.Event]
    val q = Sessionize.sessions(stream).writeStream
      .outputMode("append").format("memory").queryName("sess_wm").start()

    val sec = 1000000L
    // user 1: two events 1 s apart -> one open session, horizon = 2 s + 30 min
    ms.addData((1L, 1L, 1 * sec), (1L, 2L, 2 * sec))
    q.processAllAvailable()
    assert(spark.table("sess_wm").count() == 0, "session must still be open")
    // user 2 far in the future pushes the watermark past user 1's horizon;
    // the timeout fires in the watermark-advance batch that follows
    ms.addData((2L, 3L, 10000 * sec))
    q.processAllAvailable()
    ms.addData((2L, 4L, 10001 * sec))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_wm").as[Sessionize.Session].collect()
      .map(s => (s.user_id, s.t_start, s.t_end, s.n_events)).toSet
    assert(sessions.contains((1L, 1 * sec, 2 * sec, 2L)),
      s"user 1's session should have been closed by the watermark, got $sessions")
  }
}
