package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

import graft.functions.TextFns

/** Streaming NEAR-dup detection — the continuous form of the batch
  * `q_lsh_near_dup` pipeline, and the ingest-time primitive of a
  * training-data pipeline (flag near-duplicate documents as they arrive,
  * against everything seen within a horizon).
  *
  * Shape: the minhash signature is computed PER ROW with column functions
  * (array_min over the shingle-hash array per permutation — no stateful
  * aggregation, stays in codegen), rows explode to one row per LSH band,
  * and state lives per (band, band-hash) BUCKET via
  * `flatMapGroupsWithState`: the first document to occupy a bucket within
  * the horizon is remembered (id + full signature); every later arrival
  * in the same bucket emits a candidate hit carrying the
  * signature-agreement estimate (the `q_minhash_est` statistic, exact
  * eighths). Downstream decides what "near-dup" means by thresholding
  * est_sim / counting hit bands — same contract split as the batch
  * LSH-then-verify pipeline.
  *
  * State is evicted by event-time timeout at occupant-ts + horizon, so
  * memory is O(occupied buckets per horizon), never the stream so far —
  * the same bounded-state contract as [[StreamDedup]]. Because Spark only
  * runs the timed-out path for groups that received NO data in a batch, a
  * bucket under continuous traffic also enforces the horizon inline: an
  * arrival more than `horizonUs` after the occupant re-occupies the
  * bucket (no hit) rather than matching against a stale first_doc. Like
  * StreamDedup,
  * beyond-horizon recall is at-least-once: a duplicate arriving after its
  * bucket evicted re-occupies silently, and the batch pair family
  * (SetSimJoin / q_lsh_verified) is the exactly-once backstop.
  *
  * Uses the shared minhash constants ([[TextFns.MinhashA]]/`MinhashBands`),
  * so stream-time band keys are bit-identical to the batch pipeline's.
  */
object StreamNearDup {

  /** One exploded band row: document + its full signature + bucket key. */
  case class BandRow(doc_id: Long, ts_us: Long, sig: Array[Long], band: Int,
      bh: String, event_time: java.sql.Timestamp)

  /** Bucket state: the first occupant within the horizon. */
  case class Occupant(first_doc: Long, sig: Array[Long], ts_us: Long)

  /** A candidate hit: `doc_id` collided with `first_doc` on `band`;
    * `est_sim` is the agreeing-lane fraction over the FULL signature.
    */
  case class Hit(doc_id: Long, first_doc: Long, band: Int, est_sim: Double, ts_us: Long)

  /** Per-row minhash signature (array of [[TextFns.MinhashA]].length
    * lanes) over distinct 3-gram shingles; null for docs with fewer than
    * 3 tokens (no shingles — excluded upstream, matching `q_minhash`).
    */
  def sigArray(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hs = transform(array_distinct(TextFns.shinglesOf(toks, 3)), g => TextFns.hash32(g))
    array(TextFns.MinhashA.indices.map(i =>
      array_min(transform(hs, h => TextFns.minhashOf(h, i)))): _*)
  }

  /** ONE exploded-band frame both the stream and its batch twin read:
    * posexplode of the per-band key array (pos == band index by
    * construction) — the previous per-band union re-read the source once
    * per band, and a streaming source can't be checkpointed away like the
    * batch pipelines' shared frames. The band index prefixes the key so
    * equal hash tuples in different bands occupy different buckets
    * (batch parity).
    */
  private def explodeBands(docs: DataFrame): DataFrame = {
    val sigd = docs
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"),
        col("ts_us").cast(LongType).as("ts_us"))
      // a null doc_id/ts_us would be a POISON PILL: the typed BandRow
      // encoder NPEs on its non-nullable Long fields, killing the query,
      // and the checkpoint replays the same offsets on every restart —
      // the stream would be permanently wedged on one bad row. (A null
      // text is already dropped by the size(toks) filter.)
      .filter(col("doc_id").isNotNull && col("ts_us").isNotNull)
      .withColumn("toks", TextFns.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sig", sigArray(col("toks")))
    val bhArr = array(TextFns.MinhashBands.zipWithIndex.map { case (idx, bnd) =>
      concat_ws("_", lit(bnd) +: idx.map(i => col("sig")(i)): _*)
    }: _*)
    sigd.select(col("doc_id"), col("ts_us"), col("sig"),
        posexplode(bhArr).as(Seq("band", "bh")))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
  }

  /** THE occupancy rule, shared verbatim by the stream and [[batchTwin]]:
    * replay a bucket's event-time-sorted arrivals against one remembered
    * occupant. First arrival occupies; an arrival more than `horizonUs`
    * after the CURRENT occupant re-occupies (under continuous same-bucket
    * traffic the timed-out path never runs — groups receiving data skip
    * it — so the horizon is enforced inline rather than hitting a stale
    * first_doc); anything else hits with the signature-agreement estimate.
    */
  private def occupancyFold(sorted: Seq[BandRow], start: Option[Occupant],
      horizonUs: Long): (Seq[Hit], Option[Occupant]) = {
    val out = mutable.ArrayBuffer[Hit]()
    var occ = start
    sorted.foreach { r =>
      occ match {
        case None => occ = Some(Occupant(r.doc_id, r.sig, r.ts_us))
        case Some(o) if r.ts_us - o.ts_us > horizonUs =>
          occ = Some(Occupant(r.doc_id, r.sig, r.ts_us))
        case Some(o) if o.first_doc != r.doc_id =>
          val agree = o.sig.zip(r.sig).count { case (a, b) => a == b }
          out += Hit(r.doc_id, o.first_doc, r.band,
            agree.toDouble / o.sig.length, r.ts_us)
        case _ => () // the occupant's own re-sent band rows
      }
    }
    (out.toSeq, occ)
  }

  /** Candidate hits for a stream of documents `(doc_id, text, ts_us)`.
    * `horizonUs` bounds both the watermark delay and bucket-state
    * lifetime, in integer microseconds (the engine's event-time
    * convention).
    */
  def candidates(docs: DataFrame, horizonUs: Long): DataFrame = {
    val horizonMs = horizonUs / 1000L
    val bands = explodeBands(docs)
      .withWatermark("event_time", s"$horizonUs microseconds")
    implicit val rowEnc = Encoders.product[BandRow]
    implicit val occEnc = Encoders.product[Occupant]
    implicit val hitEnc = Encoders.product[Hit]
    implicit val strEnc = Encoders.STRING
    bands.as[BandRow]
      .groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[Occupant]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic within-batch order: event time, then id
            val (out, occ) = occupancyFold(
              rows.toSeq.sortBy(r => (r.ts_us, r.doc_id)), state.getOption, horizonUs)
            occ.foreach { o =>
              state.update(o)
              // event-time eviction at occupant + horizon; never behind
              // the current watermark (Spark rejects a stale timeout)
              state.setTimeoutTimestamp(
                math.max(o.ts_us / 1000L + horizonMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
      .toDF()
  }

  /** The TRUE backfill twin of [[candidates]]: the identical
    * [[occupancyFold]] run per band bucket over an event-time-sorted
    * batch replay, so stream/batch agreement holds across ANY number of
    * horizon lapses (each lapse re-occupies the bucket in both engines).
    * Agreement assumes the stream saw arrivals in event-time order (the
    * stream sorts within each micro-batch only). Scale: one shuffle on
    * the band key; each group materializes one bucket's arrivals,
    * bounded by per-bucket occupancy over the replayed span.
    */
  def batchTwin(docs: DataFrame, horizonUs: Long): DataFrame = {
    implicit val rowEnc = Encoders.product[BandRow]
    implicit val hitEnc = Encoders.product[Hit]
    implicit val strEnc = Encoders.STRING
    explodeBands(docs).as[BandRow]
      .groupByKey(_.bh)
      .flatMapGroups { (_: String, rows: Iterator[BandRow]) =>
        occupancyFold(rows.toSeq.sortBy(r => (r.ts_us, r.doc_id)), None, horizonUs)._1.iterator
      }
      .toDF()
  }
}
