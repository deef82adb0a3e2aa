package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

import graft.functions.VectorFns

/** Streaming SEMANTIC near-dup detection — the ingest-time twin of the
  * batch `q_emb_dup_clusters` pipeline, completing the stream dedup
  * story: [[StreamDedup]] = exact keys, [[StreamNearDup]] = token LSH,
  * this = embedding SRP-LSH.
  *
  * Shape mirrors StreamNearDup with the minhash bands swapped for the
  * multi-table sign-random-projection buckets of the batch pipeline
  * (same [[VectorFns.srpBucket]] hyperplanes, so stream-time bucket ids
  * are bit-identical to batch): each vector explodes to one row per SRP
  * table, and state lives per (table, bucket) via
  * `flatMapGroupsWithState` — the first vector to occupy a bucket within
  * the horizon is remembered (id + embedding + norm); every later
  * same-bucket arrival emits a candidate hit carrying the EXACT cosine
  * against the occupant (embeddings are at hand, so unlike the minhash
  * estimate no verify pass is needed — downstream just thresholds sim).
  *
  * State is evicted by event-time timeout at occupant-ts + horizon;
  * because Spark only runs the timed-out path for groups with no data in
  * a batch, the horizon is also enforced inline — an arrival more than
  * `horizonUs` after the occupant re-occupies the bucket instead of
  * hitting against a stale occupant (the StreamNearDup contract).
  * Memory is O(occupied buckets per horizon) × (dim floats + a long) —
  * bounded; with occupancy-scaled `bits` ([[VectorFns.srpBitsFor]]) the
  * per-bucket hit fan-out stays bounded too. Beyond-horizon recall is
  * at-least-once; the batch cluster pipeline is the exactly-once
  * backstop.
  */
object StreamEmbDedup {

  /** One exploded row: vector + one SRP table's bucket. */
  case class VecRow(vec_id: Long, ts_us: Long, embedding: Array[Float], nrm: Double,
      table: Int, bucket: Long, event_time: java.sql.Timestamp)

  /** Bucket state: the first occupant within the horizon. */
  case class Occupant(first_vec: Long, embedding: Array[Float], nrm: Double, ts_us: Long)

  /** `vec_id` collided with `first_vec` in `table`; `sim` is their exact
    * cosine.
    */
  case class Hit(vec_id: Long, first_vec: Long, table: Int, sim: Double, ts_us: Long)

  /** In-order double-precision dot — the scala twin of
    * [[graft.functions.FloatVecDot.dot]], so stream-side cosines equal
    * batch-side ones bitwise.
    */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** ONE exploded-bucket frame both the stream and its batch twin read:
    * posexplode of the per-table bucket array (pos == table index) — a
    * per-table union would re-read a streaming source once per table.
    */
  private def explodeBuckets(vecs: DataFrame, bits: Int, tables: Int, dim: Int): DataFrame = {
    // null vec_id/ts_us would be poison pills (the typed VecRow encoder
    // NPEs on non-nullable fields and the checkpoint replays the batch
    // forever); a null or all-zero embedding has no cosine — every hit
    // against it would be a silent NaN — so both are dropped at ingest,
    // on the stream and its batch twin alike (this frame is shared)
    val base = vecs
      .filter(col("vec_id").isNotNull && col("ts_us").isNotNull &&
        col("embedding").isNotNull)
      .select(col("vec_id").cast(LongType).as("vec_id"),
        col("ts_us").cast(LongType).as("ts_us"), col("embedding"),
        VectorFns.norm2(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    val bucketArr = array((0 until tables).map(tb =>
      VectorFns.srpBucket(col("embedding"), bits, dim, tb)): _*)
    base.select(col("vec_id"), col("ts_us"), col("embedding"), col("nrm"),
        posexplode(bucketArr).as(Seq("table", "bucket")))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
  }

  /** THE occupancy rule, shared verbatim by the stream and [[batchTwin]]:
    * replay a bucket's event-time-sorted arrivals against one remembered
    * occupant — first arrival occupies, an arrival more than `horizonUs`
    * after the current occupant re-occupies (no hit), anything else hits
    * with its exact cosine against the occupant. Returns the hits and the
    * occupant left standing (the stream persists it as bucket state).
    */
  private def occupancyFold(sorted: Seq[VecRow], start: Option[Occupant],
      horizonUs: Long): (Seq[Hit], Option[Occupant]) = {
    val out = mutable.ArrayBuffer[Hit]()
    var occ = start
    sorted.foreach { r =>
      occ match {
        case None => occ = Some(Occupant(r.vec_id, r.embedding, r.nrm, r.ts_us))
        case Some(o) if r.ts_us - o.ts_us > horizonUs =>
          // inline horizon: continuous traffic never triggers the
          // timed-out path, so the row re-occupies past it
          occ = Some(Occupant(r.vec_id, r.embedding, r.nrm, r.ts_us))
        case Some(o) if o.first_vec != r.vec_id =>
          out += Hit(r.vec_id, o.first_vec, r.table,
            dot(o.embedding, r.embedding) / (o.nrm * r.nrm), r.ts_us)
        case _ => () // the occupant's own re-sent rows
      }
    }
    (out.toSeq, occ)
  }

  /** Candidate hits for a stream of `(vec_id, embedding, ts_us)` rows.
    * `bits`/`tables` default to the batch pipeline's oracled layout; pass
    * [[VectorFns.srpBitsFor]] of the expected per-horizon volume for
    * production streams.
    */
  def candidates(vecs: DataFrame, horizonUs: Long, bits: Int = 8, tables: Int = 4,
      dim: Int = 64): DataFrame = {
    val rows = explodeBuckets(vecs, bits, tables, dim)
      .withWatermark("event_time", s"$horizonUs microseconds")
    val horizonMs = horizonUs / 1000L
    implicit val rowEnc = Encoders.product[VecRow]
    implicit val occEnc = Encoders.product[Occupant]
    implicit val hitEnc = Encoders.product[Hit]
    implicit val strEnc = Encoders.STRING
    rows.as[VecRow]
      .groupByKey(r => s"${r.table}_${r.bucket}")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[VecRow], state: GroupState[Occupant]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (out, occ) =
              occupancyFold(it.toSeq.sortBy(r => (r.ts_us, r.vec_id)), state.getOption, horizonUs)
            occ.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(
                math.max(o.ts_us / 1000L + horizonMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
      .toDF()
  }

  /** The TRUE backfill twin of [[candidates]]: the identical
    * [[occupancyFold]] run per bucket over an event-time-sorted batch
    * replay, so stream/batch agreement holds across ANY number of horizon
    * lapses — each lapse re-occupies the bucket in both engines, not just
    * within the first horizon. Agreement assumes the stream saw arrivals
    * in event-time order (the stream sorts within each micro-batch only;
    * a late arrival crossing micro-batches can still reorder there).
    *
    * Scale: one shuffle on (table, bucket); each group materializes one
    * bucket's arrivals, bounded by per-bucket occupancy — which
    * [[VectorFns.srpBitsFor]]-scaled `bits` keeps bounded by design.
    */
  def batchTwin(vecs: DataFrame, horizonUs: Long, bits: Int = 8, tables: Int = 4,
      dim: Int = 64): DataFrame = {
    implicit val rowEnc = Encoders.product[VecRow]
    implicit val hitEnc = Encoders.product[Hit]
    implicit val strEnc = Encoders.STRING
    explodeBuckets(vecs, bits, tables, dim).as[VecRow]
      .groupByKey(r => s"${r.table}_${r.bucket}")
      .flatMapGroups { (_: String, it: Iterator[VecRow]) =>
        occupancyFold(it.toSeq.sortBy(r => (r.ts_us, r.vec_id)), None, horizonUs)._1.iterator
      }
      .toDF()
  }
}
