package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join: correlate each trigger event
  * with the same user's response events inside a bounded horizon.
  *
  * The range condition on BOTH event-time columns is what makes this
  * viable at scale: with both sides watermarked, the engine derives a
  * state-eviction bound from `b_ts <= a_ts + horizon` — each side buffers
  * only (watermark delay + horizon) of history per user, so state is
  * O(active users x horizon rate), never the stream so far. Without the
  * range bound a stream-stream inner join must buffer forever.
  *
  * `withWatermark` is a no-op on batch inputs, so the same function is
  * the batch interval join — `q_event_join` runs this very code against
  * the DuckDB oracle, and `StreamJoinSpec` replays the events through a
  * file stream asserting streamed == batch.
  */
object StreamJoin {

  /** Pairs of (trigger, response) for one user within `horizonUs` after
    * the trigger. Inputs need (user_id, ts_us, event_id) plus an
    * event_type to pre-split on; both sides carry event-time as a real
    * TimestampType column (micros precision) so watermarks apply.
    */
  def correlate(trigger: DataFrame, response: DataFrame, horizonUs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame =
    correlateImpl(trigger, response, horizonUs, watermarkDelay, "inner")

  /** One implementation for both join flavors: the interval condition,
    * watermark wiring, and output projection are tie-break- and
    * state-bound-sensitive — two hand-synchronized copies could silently
    * drift on a boundary (`>=` vs `>`) or horizon change.
    */
  private def correlateImpl(trigger: DataFrame, response: DataFrame, horizonUs: Long,
      watermarkDelay: String, joinType: String): DataFrame = {
    val a = trigger
      .select(col("user_id"), col("ts_us").as("a_ts_us"), col("event_id").as("a_id"),
        timestamp_micros(col("ts_us")).as("a_ts"))
      .withWatermark("a_ts", watermarkDelay)
    val b = response
      .select(col("user_id").as("b_user"), col("ts_us").as("b_ts_us"), col("event_id").as("b_id"),
        timestamp_micros(col("ts_us")).as("b_ts"))
      .withWatermark("b_ts", watermarkDelay)
    a.join(b,
        col("user_id") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizonUs MICROSECOND"),
        joinType)
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_ts_us"), col("b_ts_us"))
  }

  /** Left-outer form: every trigger appears exactly once with a null
    * response if nothing matched inside the horizon. In streaming this is
    * the semantically hard case — "no match" is only knowable once the
    * watermark proves no in-horizon response can still arrive, so
    * unmatched rows emit with watermark latency while matches emit
    * immediately. Same state bound as the inner form. Batch: a plain
    * left outer interval join, same code.
    */
  def correlateOuter(trigger: DataFrame, response: DataFrame, horizonUs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame =
    correlateImpl(trigger, response, horizonUs, watermarkDelay, "left_outer")
}
