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
    * defaults to the checkpoint dir's leaf name plus a hash of the FULL
    * normalized path — two streams whose checkpoint paths merely share a
    * leaf (`a/ckpt`, `b/ckpt`) must not share a ledger, or the second
    * stream's batches would be dropped as replays. It must be stable
    * across restarts (it is the identity the ledger dedupes on).
    */
  /** `compactEvery > 0` compacts the repo every that-many micro-batches
    * (after the batch's write lands — for the exactly-once path, after
    * the ledger commit): per-batch appends otherwise accrete one small
    * file per batch at streaming cadence. Snapshot-isolated, so a
    * compaction that crashes is invisible and simply retried later.
    */
  def start(
      stream: DataFrame,
      repo: TableRepo,
      checkpointDir: String,
      replace: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow(),
      exactlyOnce: Boolean = false,
      writerId: String = "",
      compactEvery: Int = 0,
      compactTargetRecords: Long = 1000000L): StreamingQuery = {
    val wid =
      if (writerId.nonEmpty) writerId
      else {
        val norm = new java.io.File(checkpointDir).getCanonicalPath
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(norm.getBytes("UTF-8"))
        val h = md.take(4).map(b => f"$b%02x").mkString
        s"${new java.io.File(norm).getName}-$h"
      }
    val writer: DataStreamWriter[org.apache.spark.sql.Row] = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (replace) repo.replaceRecords(batch)
        else if (exactlyOnce) { repo.extendExactlyOnce(batch, wid, batchId): Unit }
        else repo.extend(batch)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          repo.compact(compactTargetRecords)
      }
    writer.start()
  }
}
