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

  private val tracker =
    new ThreadLocal[java.util.ArrayList[org.apache.spark.rdd.RDD[_]]]

  def apply(df: DataFrame): DataFrame =
    if (disabled) df
    else {
      val ck = df.localCheckpoint(eager = true)
      Option(tracker.get()).foreach { buf =>
        ck.queryExecution.analyzed.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }.foreach(buf.add)
      }
      ck
    }

  /** Run `body` recording every checkpoint block it creates on THIS
    * thread, then unpersist exactly those — never a concurrent query's
    * cached RDDs, which a global `getPersistentRDDs` before/after diff
    * would sweep up (the hazard [[graft.repo.TableRepo]]'s own staged-RDD
    * comment rules out). The streaming micro-batch drivers wrap each
    * batch in this so the per-batch barriers (batch fingerprints, index
    * snapshot, verdict) are reclaimed EAGERLY once the batch's writes are
    * durable, instead of bleeding executor storage until driver GC.
    * Reentrant: an inner scope releases only its own blocks.
    *
    * ESCAPE HAZARD: every block created inside the scope is unpersisted
    * on exit, so any DataFrame checkpointed in here must be fully
    * materialized (written/collected/counted-to-completion) BEFORE the
    * scope closes and must not escape it — a lazily-consumed frame
    * returned from the body would recompute (or fail) against
    * unpersisted blocks. Today's callers return Booleans/Units; keep it
    * that way or materialize first.
    */
  private[graft] def scoped[T](body: => T): T = {
    val prev = tracker.get()
    val buf = new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]
    tracker.set(buf)
    try body
    finally {
      if (prev == null) tracker.remove() else tracker.set(prev)
      buf.forEach(r => { r.unpersist(blocking = false): Unit })
    }
  }

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
