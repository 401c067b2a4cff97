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
  * State design for scale: a SHORT LIST of open sessions per active user
  * (not per event) — more than one only while out-of-order events inside
  * the watermark straddle a gap, exactly the case `session_window`'s
  * merging state also has to hold. Event-time timeout + watermark
  * reclaim state for idle users, so state size tracks concurrent
  * activity, not history.
  */
object Sessionize {

  final case class SessionEvent(user_id: String, event_ts: Timestamp)

  final case class OpenSession(nEvents: Long, firstTs: Long, lastTs: Long)

  /** Open sessions, pairwise more than gap apart, sorted by firstTs. */
  final case class SessionList(sessions: Seq[OpenSession])

  final case class SessionSummary(
      user_id: String,
      n_events: Long,
      session_start: Timestamp,
      session_end: Timestamp)

  /** Sessions close after `gapMinutes` of per-user inactivity (measured
    * in event time against the stream's watermark). Emits one summary row
    * per closed session. Semantics match `session_window` / the
    * islands-and-gaps oracle exactly, INCLUDING out-of-order arrivals
    * within the watermark: an event that lands more than gap before every
    * open session starts its own session rather than being glued onto a
    * later one, and an event bridging two open sessions merges them.
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
    def summary(userId: String, s: OpenSession): SessionSummary =
      SessionSummary(userId, s.nEvents,
        new Timestamp(s.firstTs), new Timestamp(s.lastTs))

    // One body serves both entry modes: a timeout call is simply a call
    // with zero input rows, so the merge fold is a no-op and only the
    // close/re-register step runs.
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionList, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[SessionList]) =>
          val wm = state.getCurrentWatermarkMs()
          var sessions =
            state.getOption.map(_.sessions.toList).getOrElse(Nil)
          rows.map(_.event_ts.getTime).toArray.sorted.foreach { t =>
            // sessions within gap of t merge with it (an event bridging
            // two sessions collapses them into one — session_window's
            // merge rule); otherwise t opens a new session
            val (touching, rest) = sessions.partition(s =>
              t >= s.firstTs - gapMs && t <= s.lastTs + gapMs)
            val merged =
              if (touching.isEmpty) OpenSession(1L, t, t)
              else OpenSession(
                touching.map(_.nEvents).sum + 1L,
                math.min(touching.map(_.firstTs).min, t),
                math.max(touching.map(_.lastTs).max, t))
            sessions = merged :: rest
          }
          // a session closes only when no on-time event can still merge:
          // merging needs t ≤ lastTs + gap and on-time means t ≥ wm, so
          // the cut is STRICTLY lastTs + gap < wm (an event at exactly
          // the watermark is on time and must still merge)
          val (done, open) = sessions.partition(_.lastTs + gapMs < wm)
          if (open.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(SessionList(open.sortBy(_.firstTs)))
            // ≥ wm for every open session, so always legal to register
            state.setTimeoutTimestamp(open.map(_.lastTs).min + gapMs)
          }
          done.sortBy(_.firstTs).iterator.map(summary(userId, _))
      }
  }
}
