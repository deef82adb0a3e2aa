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
      .select($"user_id", $"event_id", expr("ts div 1000").as("ts_us"))
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
}
