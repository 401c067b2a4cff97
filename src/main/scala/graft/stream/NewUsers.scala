package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of [[graft.ops.Analytics.userGrowth]]: first-touch
  * detection on the live stream — exactly one NewUser row per user_id,
  * ever, carrying the earliest timestamp seen when they first appeared.
  * A downstream day-bucketed count of these rows IS the acquisition
  * curve, converging to the batch build over the same prefix.
  *
  * Ordering contract (the [[ChangeCapture]] family): rows apply in
  * (ts, event_id) order WITHIN each micro-batch, so the emitted
  * first_ts is the true minimum of the batch that introduced the user.
  * A LATER batch delivering an even earlier event for a known user
  * cannot re-emit or retract (appends are final); it increments the
  * per-user `late` ValueState and the batch replay over the sink is the
  * healing path (lambda posture).
  *
  * State per user: (first_ts_us, n_late) — constant bytes per user;
  * the smallest possible stateful operator, and the one whose state
  * table doubles as the first-touch dimension ([[graft.ops.Analytics
  * .retentionCohorts]]'s spine) when read back via the state-store
  * reader.
  */
object NewUsers {

  final case class NewUser(user_id: Long, first_ts_us: Long)

  private class Processor
      extends StatefulProcessor[Long, (Long, Long, Long), NewUser] {
    // (first_ts_us, n_late)
    @transient private var seen: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[(Long, Long)](
        "seen", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        inputRows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[NewUser] = {
      val rows = inputRows.toArray.sortBy { case (_, tsUs, id) => (tsUs, id) }
      Option(seen.get()) match {
        case None =>
          val first = rows.head._2
          seen.update((first, 0L))
          Iterator.single(NewUser(user, first))
        case Some((first, late)) =>
          val newLate = late + rows.count(_._2 < first)
          if (newLate != late) seen.update((first, newLate))
          Iterator.empty
      }
    }
  }

  /** First-touch stream over the events frame (needs user_id, ts,
    * event_id). Append mode: a first touch is final.
    */
  def firstTouches(events: DataFrame): Dataset[NewUser] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
