package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the continuous counterpart of the
  * batch `q_sessionize` query (lag/running-sum windows). State per user is
  * the open session; a gap above `gapUs` microseconds closes it and emits.
  * Built on `flatMapGroupsWithState` with event-time timeout so sessions
  * also close when the watermark passes their horizon (late-data safe).
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
    * session in state, emits every closed one.
    */
  def step(gapUs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toVector.sortBy(e => (e.ts_us, e.event_id))
    var open = state.getOption
    val out = Vector.newBuilder[Session]
    sorted.foreach { e =>
      open = open match {
        case Some(s) if e.ts_us - s.lastUs <= gapUs =>
          Some(s.copy(lastUs = e.ts_us, n = s.n + 1))
        case Some(s) =>
          out += Session(userId, s.startUs, s.lastUs, s.n)
          Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open match {
      case Some(s) if state.hasTimedOut =>
        out += Session(userId, s.startUs, s.lastUs, s.n)
        state.remove()
      case Some(s) =>
        state.update(s)
        if (events.isEmpty && state.hasTimedOut) state.remove()
      case None => state.remove()
    }
    out.result().iterator
  }

  /** Attach to a (streaming or batch) Dataset[Event]. For streaming use
    * with `update`/`append` via flatMapGroupsWithState; the caller sets
    * watermark upstream.
    */
  def sessions(events: Dataset[Event], gapUs: Long = DefaultGapUs): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(step(gapUs))
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
