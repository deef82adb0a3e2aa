package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the continuous form of the batch `q_dedup_exact`
  * operator. At 100 TB/day a dedup cannot hold every key ever seen; the
  * production contract is dedup-within-horizon: a duplicate arriving within
  * `horizon` of the original is dropped, one arriving after state eviction
  * may re-emit (at-least-once beyond the horizon). Downstream, the batch
  * dedup (`q_dedup_exact` / keyed upsert) remains the exactly-once backstop
  * — the standard lambda split.
  *
  * State is keyed by `keys` and evicted by the watermark, so memory is
  * O(distinct keys per horizon), not O(stream length).
  */
object StreamDedup {

  /** Drop rows whose key was already seen within the watermark horizon.
    * `tsUsCol` is an integer-microseconds event-time column (the engine's
    * event-time convention; see Queries.scala class doc).
    */
  def byKey(df: DataFrame, keys: Seq[String], tsUsCol: String, horizon: String): DataFrame =
    df.withColumn("__graft_ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("__graft_ts", horizon)
      .dropDuplicatesWithinWatermark(keys)
      .drop("__graft_ts")
}
