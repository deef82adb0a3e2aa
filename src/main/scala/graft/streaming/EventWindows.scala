package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Watermarked tumbling-window aggregation — the Structured Streaming twin
  * of the batch `q_event_window` query (B5). The same hour × event_type
  * grid, built on the engine's `window()` + watermark machinery instead of
  * the batch µs-arithmetic projection, so late events are handled and
  * windows emit exactly once (append mode) when the watermark passes their
  * end.
  *
  * Scale: the only state is the open windows per (window, event_type) —
  * bounded by watermark horizon × type cardinality; the shuffle key is the
  * same (window, type) pair the batch plan groups on.
  */
object EventWindows {

  /** Attach to a (streaming or batch) events DataFrame with a `ts_us`
    * microsecond column. Emits `hour_us, event_type, n_events, sum_value`
    * — the batch query's schema — so downstream consumers are agnostic to
    * which engine produced the rows.
    */
  def hourly(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame = {
    val dec = DecimalType(18, 2)
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // exact scale-2 decimal sum, emitted as DOUBLE — decimal columns
        // must never reach a query output (verify-harness read paths
        // represent them differently; see q_pricing_summary note)
        sum(col("value").cast(dec)).cast(DoubleType).as("sum_value"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
        col("n_events"), col("sum_value"))
  }
}
