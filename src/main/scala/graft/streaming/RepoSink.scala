package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.repo.TableRepo

/** Structured Streaming sink writing micro-batches into a [[TableRepo]] —
  * the cluster-scale analog of the reference's buffered writers
  * (/root/reference/parquetranger/core.py:458-523): same flush semantics
  * (append or keyed upsert per batch), but batches are driven by the
  * streaming engine with checkpointed exactly-once progress instead of a
  * driver-side row buffer.
  */
object RepoSink {

  /** Attach a streaming DataFrame to a repo via `foreachBatch`. Each
    * micro-batch goes through the repo's schema-harmonized append (or
    * upsert when `replace = true`), so the batch and streaming paths share
    * one write implementation.
    */
  def start(
      stream: DataFrame,
      repo: TableRepo,
      checkpointDir: String,
      replace: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val writer: DataStreamWriter[org.apache.spark.sql.Row] = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (replace) repo.replaceRecords(batch) else repo.extend(batch)
      }
    writer.start()
  }
}
