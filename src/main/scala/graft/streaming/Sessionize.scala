package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the continuous counterpart of the
  * batch `q_sessionize` query (lag/running-sum windows). State per user is
  * the open session; a gap above `gapUs` microseconds closes it and emits.
  * Built on `flatMapGroupsWithState`; when the input stream carries a
  * watermark, the event-time timeout closes (and emits) a trailing open
  * session once the watermark passes its `last event + gap` horizon — so
  * quiet users still get their final session, late-data safe.
  *
  * Scale: state size is O(active users), not O(events); the shuffle key is
  * user_id — the same single partitioning the batch plan uses.
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, ts_us: Long)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class Session(user_id: Long, t_start: Long, t_end: Long, n_events: Long)

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000

  /** Fold a user's (in-batch) events into sessions; keeps the trailing open
    * session in state, emits every closed one. With `withTimeout`, a timed-out
    * invocation (empty event iterator, watermark past the horizon) closes and
    * emits the open session; otherwise each live invocation re-arms the
    * timeout at `last event + gap` (clamped above the current watermark —
    * Spark rejects a timeout timestamp at or before it).
    */
  def step(gapUs: Long, withTimeout: Boolean = false)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (withTimeout && state.hasTimedOut) {
      val out = state.getOption.map(s => Session(userId, s.startUs, s.lastUs, s.n))
      state.remove()
      out.iterator
    } else {
      // Only WITHIN-batch order is guaranteed by the sort: a later
      // micro-batch can deliver an on-time event BELOW the open session's
      // lastUs (any watermark delay > 0 admits this), and a naive
      // `lastUs = e.ts_us` would emit t_end < t_start and re-arm the
      // event-time timeout early. Fold the batch as a standard gap
      // sessionization over INTERVAL items — each event a point, the open
      // session its [startUs, lastUs] span (gap-chained internally by
      // construction), everything ordered by interval start — which
      // reproduces the globally-sorted batch semantics exactly whenever
      // the events the state has already EMITTED are not involved: chains
      // of admitted late events merge with each other and into the open
      // session precisely as closeAll would merge them. With watermark
      // delay <= gap no event can even arrive below the open session's
      // reach; with a larger delay, only an event chain that should have
      // merged into an ALREADY-EMITTED session diverges (it emits as its
      // own session) — the one approximation single-open-session state
      // forces.
      val sorted = events.toVector.sortBy(e => (e.ts_us, e.event_id))
      val evSpans = sorted.map(e => OpenSession(e.ts_us, e.ts_us, 1))
      val items = state.getOption match {
        case Some(os) =>
          val i = evSpans.indexWhere(_.startUs > os.startUs) match {
            case -1 => evSpans.length
            case x  => x
          }
          (evSpans.take(i) :+ os) ++ evSpans.drop(i)
        case None => evSpans
      }
      var open: Option[OpenSession] = None
      val out = Vector.newBuilder[Session]
      items.foreach { it =>
        open = open match {
          case Some(c) if it.startUs - c.lastUs <= gapUs =>
            Some(OpenSession(c.startUs, math.max(c.lastUs, it.lastUs), c.n + it.n))
          case Some(c) =>
            out += Session(userId, c.startUs, c.lastUs, c.n)
            Some(it)
          case None => Some(it)
        }
      }
      open.foreach { s =>
        state.update(s)
        if (withTimeout)
          // ceil the µs horizon into ms ONCE — truncating each term would
          // arm the timeout up to ~2 ms early and could split a session
          // whose closing event arrives inside that window
          state.setTimeoutTimestamp(
            math.max((s.lastUs + gapUs + 999) / 1000, state.getCurrentWatermarkMs() + 1))
      }
      out.result().iterator
    }
  }

  private def hasWatermark(ds: Dataset[_]): Boolean =
    ds.queryExecution.analyzed.collectFirst { case _: EventTimeWatermark => () }.nonEmpty

  /** Attach to a (streaming or batch) Dataset[Event]. On a watermarked
    * stream the event-time timeout is wired automatically; without a
    * watermark (or in batch) sessions only close when a gap-exceeding event
    * arrives — use [[closeAll]] to drain a batch completely.
    *
    * NOTE: for the timeout path the watermarked timestamp column must
    * still be present in `events`'s schema (extra columns beyond the Event
    * fields are fine) — Spark requires an event-time attribute in the
    * grouped input, not just a watermark node upstream.
    */
  def sessions(events: Dataset[Event], gapUs: Long = DefaultGapUs): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    val withTimeout = events.isStreaming && hasWatermark(events)
    val conf =
      if (withTimeout) GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), conf)(step(gapUs, withTimeout))
  }

  /** Drain whatever is still open (batch use: emit trailing sessions). */
  def closeAll(events: Dataset[Event], gapUs: Long = DefaultGapUs): Dataset[Session] = {
    implicit val outEnc = Encoders.product[Session]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroups { (uid: Long, it: Iterator[Event]) =>
        val sorted = it.toVector.sortBy(e => (e.ts_us, e.event_id))
        val out = Vector.newBuilder[Session]
        var open: Option[OpenSession] = None
        sorted.foreach { e =>
          open = open match {
            case Some(s) if e.ts_us - s.lastUs <= gapUs =>
              Some(s.copy(lastUs = e.ts_us, n = s.n + 1))
            case Some(s) =>
              out += Session(uid, s.startUs, s.lastUs, s.n)
              Some(OpenSession(e.ts_us, e.ts_us, 1))
            case None => Some(OpenSession(e.ts_us, e.ts_us, 1))
          }
        }
        open.foreach(s => out += Session(uid, s.startUs, s.lastUs, s.n))
        out.result().iterator
      }
  }
}
