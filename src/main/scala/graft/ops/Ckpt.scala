package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager checkpoint barrier for the multi-consumer query pipelines,
  * bypassable for PLAN AUDITS: `localCheckpoint` truncates lineage, so a
  * checkpoint-ending query explains as one `Scan ExistingRDD` line — the
  * executed plan is honest, but the pipeline feeding the barrier becomes
  * invisible to `.explain`. [[graft.Explain]] re-builds the plans inside
  * [[withDisabled]] to dump the full pre-checkpoint pipeline alongside
  * the executed shape. Only query pipelines route through this; the
  * repo WRITE paths keep their unconditional checkpoints (overwrite
  * legality depends on them).
  */
object Ckpt {
  @volatile private var disabled = false

  def apply(df: DataFrame): DataFrame =
    if (disabled) df else df.localCheckpoint(eager = true)

  /** Run `body` with checkpoint barriers off — plan construction only;
    * executing multi-consumer plans built this way recomputes shared
    * stages per consumer (the exact tax the barriers exist to prevent).
    */
  private[graft] def withDisabled[T](body: => T): T = {
    disabled = true
    try body
    finally disabled = false
  }
}
