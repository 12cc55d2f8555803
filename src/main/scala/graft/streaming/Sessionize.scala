package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the streaming twin of the
  * batch `operators.Analytics.eventsSessions` (SURVEY §2 #27), built
  * on `KeyValueGroupedDataset.flatMapGroupsWithState`: per-user
  * session state lives in the state store, sessions CLOSE either when
  * a new event arrives past the inactivity gap (emitted inline) or
  * when the event-time watermark passes `last_ts + gap` (emitted via
  * EventTimeTimeout), so quiet users still flush without a driver
  * timer — the distributed analogue of the reference sink's
  * FLUSH_TIME check loop (kinesyslog/sink.py:150-156).
  *
  * Scale: state is one fixed-size record per ACTIVE user (not per
  * event), partitioned by user_id; watermark-driven timeout evicts
  * idle keys, so state size tracks concurrently-active users.
  */
object Sessionize {

  case class Ev(user_id: Long, event_id: Long, ts_s: Long,
                event_time: java.sql.Timestamp)
  case class SessionState(start_s: Long, last_s: Long, n_events: Int)
  case class Session(user_id: Long, session_start_s: Long,
                     session_end_s: Long, n_events: Int, duration_s: Long)

  val GapSeconds = 3600L

  private def close(uid: Long, s: SessionState): Session =
    Session(uid, s.start_s, s.last_s, s.n_events, s.last_s - s.start_s)

  private def step(gap: Long)(uid: Long, events: Iterator[Ev],
                              state: GroupState[SessionState]): Iterator[Session] =
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(uid, _)).iterator
      state.remove()
      out
    } else {
      // within a micro-batch, order by event time (cross-batch order
      // is the watermark's job)
      val evs = events.toSeq.sortBy(e => (e.ts_s, e.event_id))
      val closed = Seq.newBuilder[Session]
      var cur = state.getOption
      evs.foreach { e =>
        cur match {
          case Some(s) if e.ts_s - s.last_s <= gap =>
            cur = Some(s.copy(last_s = math.max(s.last_s, e.ts_s),
              n_events = s.n_events + 1))
          case Some(s) =>
            closed += close(uid, s)
            cur = Some(SessionState(e.ts_s, e.ts_s, 1))
          case None =>
            cur = Some(SessionState(e.ts_s, e.ts_s, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // clamp above the current watermark: Spark THROWS on a timeout
        // below it, so one event arriving > gap behind the watermark
        // (late rows reach flatMapGroupsWithState unfiltered) would
        // kill the whole query; clamped, the stale session closes at
        // the next watermark tick instead
        state.setTimeoutTimestamp(
          math.max((s.last_s + gap) * 1000L,
            state.getCurrentWatermarkMs() + 1L))
      }
      closed.result().iterator
    }

  /** Append-mode session stream: one output row per CLOSED session. */
  def sessions(events: Dataset[Ev], gap: Long = GapSeconds): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("event_time", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step(gap))
  }
}
