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
    *
    * MIGRATION (bare-leaf default, pre leaf+hash): if the repo already
    * holds a ledger under the BARE leaf name, that identity is kept —
    * switching a resuming stream to a new ledger id would replay the
    * exact crash-window batch the ledger exists to dedupe (committed to
    * the old ledger, not yet in the streaming checkpoint → lands twice)
    * and orphan the old `_graft_ledger/<leaf>` dir. New streams (no
    * bare-leaf ledger on disk) get the collision-safe leaf+hash id.
    * Streams needing a specific identity should pass `writerId`
    * explicitly.
    */
  /** `compactEvery > 0` compacts the repo every that-many micro-batches
    * (after the batch's write lands — for the exactly-once path, after
    * the ledger commit): per-batch appends otherwise accrete one small
    * file per batch at streaming cadence. Snapshot-isolated, so a
    * compaction that crashes is invisible and simply retried later.
    * `onCompact` runs (on the driver, inside `foreachBatch`) right after
    * each successful compaction — the hook index-level wrappers use to
    * re-pin version manifests that would otherwise lag the compacted
    * table ([[graft.ops.IvfIndex]]'s streamed ingestion).
    *
    * `onBatch` runs FIRST in every `foreachBatch`, before the transform
    * and before any write or ledger commit — the pre-batch fence slot.
    * A hook that throws fails the micro-batch (and so the stream, as a
    * `StreamingQueryException`) with nothing landed: index-level wrappers
    * use it to re-check an invariant the stream was started under (e.g.
    * [[graft.ops.IvfIndex]] failing the stream when a k-changing rebuild
    * re-pinned its manifest mid-stream) instead of silently ingesting
    * into a generation the stream was never keyed to.
    */
  /** Ledger-identity resolution (scaladoc above): explicit id wins; else
    * an existing bare-leaf ledger on the repo is resumed (migration);
    * else leaf + 4-byte path hash (collision-safe default).
    */
  private[streaming] def resolveWriterId(repo: TableRepo, checkpointDir: String,
      explicit: String, exactlyOnce: Boolean = true): String =
    if (explicit.nonEmpty) explicit
    else {
      val norm = new java.io.File(checkpointDir).getCanonicalPath
      val leaf = new java.io.File(norm).getName
      if (exactlyOnce && repo.hasLedger(leaf)) leaf
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(norm.getBytes("UTF-8"))
        val h = md.take(4).map(b => f"$b%02x").mkString
        s"$leaf-$h"
      }
    }

  /** `transform` runs on each micro-batch INSIDE `foreachBatch`, where the
    * batch is a plain DataFrame — so per-batch logic the streaming planner
    * would reject (window argmax, repo reads resolved at batch time) is
    * fair game. It must be deterministic w.r.t. the batch for the
    * exactly-once contract to mean anything (a replayed batch is dropped,
    * not re-transformed).
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
      compactTargetRecords: Long = 1000000L,
      transform: DataFrame => DataFrame = identity,
      onCompact: () => Unit = () => (),
      onBatch: () => Unit = () => (),
      around: (() => Unit) => Unit = f => f()): StreamingQuery = {
    val wid = resolveWriterId(repo, checkpointDir, writerId, exactlyOnce)
    val writer: DataStreamWriter[org.apache.spark.sql.Row] = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (raw: DataFrame, batchId: Long) =>
        // `around` brackets the WHOLE batch body (fence, transform, land,
        // in-batch compaction) — the hook a sink owner uses to hold a
        // shared lock across the batch so a concurrent exclusive swap
        // (e.g. IvfIndex.rebuild's table flip) can never interleave with
        // an executing batch. Default is a plain call.
        around { () =>
          onBatch()
          val batch = transform(raw)
          if (replace) repo.replaceRecords(batch)
          else if (exactlyOnce) { repo.extendExactlyOnce(batch, wid, batchId): Unit }
          else repo.extend(batch)
          if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1)) {
            repo.compact(compactTargetRecords)
            onCompact()
          }
        }
      }
    writer.start()
  }
}
