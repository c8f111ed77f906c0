package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** True streaming sessionization via flatMapGroupsWithState — the
  * stateful path SURVEY.md §2 `stream_sessionize` names. State per
  * user is O(1): only the open tail of the last session, which
  * SURVIVES across micro-batches — a session spanning a batch
  * boundary is one session, not two. Sessions are emitted when a gap
  * closes them (a later event arrives > 30 min after the tail) or
  * when the event-time watermark passes the tail's close point
  * (EventTimeTimeout): the production contract, where open tails are
  * never emitted early and never lost.
  */
object Sessionize {
  case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(startUs: Long, endUs: Long, n: Long, sid: Int)
  case class Session(user_id: Long, session_id: Int, n_events: Long,
      t_start: Timestamp, t_end: Timestamp)

  val GapUs: Long = 1800000000L // 30 minutes

  /** java.sql.Timestamp getTime is ms-precision; keep the µs part
    * (carried in nanos) or session bounds drift from the engine's
    * µs TimestampType. floorDiv/floorMod so pre-epoch instants keep
    * the right sign (truncating division was off by a second and
    * setNanos(negative) throws). */
  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  def sessions(userId: Long, evs: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[Session] = {
    // watermark passed the open tail's close point: emit and clear
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(
        Session(userId, s.sid, s.n, fromUs(s.startUs), fromUs(s.endUs)))
    }
    val sorted = evs.toIndexedSeq.sortBy(e => (toUs(e.ts), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var out = Vector.empty[Session]
    var cur = state.getOption.orNull // continue the open tail, if any
    sorted.foreach { e =>
      val us = toUs(e.ts)
      cur match {
        case null =>
          cur = SessionState(us, us, 1, 1)
        case s if us - s.endUs > GapUs =>
          out :+= Session(userId, s.sid, s.n, fromUs(s.startUs), fromUs(s.endUs))
          cur = SessionState(us, us, 1, s.sid + 1)
        case s =>
          cur = s.copy(endUs = math.max(s.endUs, us), n = s.n + 1)
      }
    }
    // the open tail stays in state for the next batch; it times out
    // (and emits) once the watermark passes its gap horizon
    state.update(cur)
    state.setTimeoutTimestamp(fromUs(cur.endUs + GapUs).getTime)
    out.iterator
  }

  /** Apply to a (possibly streaming) events frame with
    * user_id/event_id/ts columns. The zero-delay watermark closes a
    * tail as soon as any event 30+ minutes later has been seen;
    * events arriving older than the watermark are dropped by the
    * engine (standard late-data semantics). */
  def streaming(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("ts"))
      .withWatermark("ts", "0 seconds")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessions)
  }
}
