package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.repo.TableRepo

/** Stream-static enrichment: join a stream against a [[TableRepo]]
  * dimension. Two refresh contracts:
  *
  *   - [[joined]]: the engine's native stream-static join. The static
  *     side's FILE LISTING is resolved once at query start, so dimension
  *     rows appended to the repo after the stream starts are NOT seen —
  *     a snapshot join. Right for slowly-changing dims restarted with the
  *     job.
  *   - [[perBatch]]: `foreachBatch` re-builds the repo scan every
  *     micro-batch, so dimension updates land at batch granularity. This
  *     is the pattern for dims mutated by concurrent upserts; the repo
  *     read is one partition-pruned scan per batch, and the join inside
  *     the batch is a plain (broadcast-eligible) batch join.
  */
object StreamEnrich {

  /** Snapshot stream-static left join on `keys`. */
  def joined(stream: DataFrame, repo: TableRepo, keys: Seq[String]): DataFrame =
    stream.join(repo.getFullDf, keys, "left")

  /** Per-micro-batch refreshed enrichment: `handle` receives each enriched
    * batch (e.g. to append into another repo via the same write path
    * [[RepoSink]] uses).
    */
  def perBatch(
      stream: DataFrame,
      repo: TableRepo,
      keys: Seq[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow())(
      handle: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        handle(batch.join(repo.getFullDf, keys, "left"))
      }
      .start()
}
