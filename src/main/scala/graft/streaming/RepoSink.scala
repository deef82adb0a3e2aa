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
    *
    * Delivery: the upsert path is replay-idempotent by construction
    * (replaying a batch replaces the same keys again). The append path is
    * at-least-once by default — a crash between the batch write and the
    * checkpoint commit replays the batch and lands it twice; pass
    * `exactlyOnce = true` to route appends through the repo's
    * per-(writer, batch) commit ledger ([[TableRepo.extendExactlyOnce]]),
    * which makes the replay a no-op. `writerId` names the ledger; it
    * defaults to the checkpoint dir's leaf name and must be stable across
    * restarts (it is the identity the ledger dedupes on).
    */
  def start(
      stream: DataFrame,
      repo: TableRepo,
      checkpointDir: String,
      replace: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow(),
      exactlyOnce: Boolean = false,
      writerId: String = ""): StreamingQuery = {
    val wid = if (writerId.nonEmpty) writerId else new java.io.File(checkpointDir).getName
    val writer: DataStreamWriter[org.apache.spark.sql.Row] = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (replace) repo.replaceRecords(batch)
        else if (exactlyOnce) { repo.extendExactlyOnce(batch, wid, batchId): Unit }
        else repo.extend(batch)
      }
    writer.start()
  }
}
