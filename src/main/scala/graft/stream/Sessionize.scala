package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via flatMapGroupsWithState — the arbitrary
  * per-key state API (SURVEY §2.10-W4 stretch; the built-in
  * `session_window` covers the common case in Analytics.sessionCounts,
  * this is the escape hatch for session logic a window can't express:
  * per-session invariants, custom merge rules, side outputs).
  *
  * State design for scale: one small fixed-size record per ACTIVE user
  * (not per event); event-time timeout + watermark reclaim state for
  * idle users, so state size tracks concurrent activity, not history.
  */
object Sessionize {

  final case class SessionEvent(user_id: String, event_ts: Timestamp)

  final case class SessionState(nEvents: Long, firstTs: Long, lastTs: Long)

  final case class SessionSummary(
      user_id: String,
      n_events: Long,
      session_start: Timestamp,
      session_end: Timestamp)

  /** Sessions close after `gapMinutes` of per-user inactivity (measured
    * in event time against the stream's watermark). Emits one summary row
    * per closed session; open sessions hold a single state record.
    */
  def userSessions(
      events: DataFrame,
      gapMinutes: Int = 5,
      watermark: String = Pipeline.DefaultWatermark): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("timestamp", watermark)
      .select(col("user_id"), col("timestamp").as("event_ts"))
      .as[SessionEvent]

    val gapMs = gapMinutes * 60000L
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(
              userId, s.nEvents, new Timestamp(s.firstTs), new Timestamp(s.lastTs)))
          } else {
            // Split WITHIN the batch too: a micro-batch (or a backfill
            // arriving before the event-time timeout fires) can carry
            // events more than gap apart — they must land in separate
            // sessions, exactly as the islands-and-gaps oracle and
            // session_window would place them.
            val ts = rows.map(_.event_ts.getTime).toArray.sorted
            val closed = Seq.newBuilder[SessionSummary]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.lastTs > gapMs =>
                  closed += SessionSummary(userId, s.nEvents,
                    new Timestamp(s.firstTs), new Timestamp(s.lastTs))
                  cur = Some(SessionState(1L, t, t))
                case Some(s) =>
                  cur = Some(SessionState(s.nEvents + 1,
                    math.min(s.firstTs, t), math.max(s.lastTs, t)))
                case None =>
                  cur = Some(SessionState(1L, t, t))
              }
            }
            val open = cur.get
            state.update(open)
            // close the open session once the watermark passes last + gap
            state.setTimeoutTimestamp(open.lastTs + gapMs)
            closed.result().iterator
          }
      }
  }
}
