package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of [[graft.ops.Analytics.disorderProfile]]: a live
  * watermark-lag monitor. The batch audit picks the delay; this monitor
  * proves (or disproves) it in production — each micro-batch folds its
  * events into fixed per-type counters and emits the CUMULATIVE lateness
  * profile, so an alerting consumer thresholds the latest `late_share_e4`
  * / `max_late_us` against what the chosen watermark tolerates.
  *
  * Contract difference from the batch op, on purpose: the running event-
  * time maximum is tracked PER TYPE (the state key), not globally — a
  * global maximum through one state key would funnel the whole stream
  * through one task. On single-type traffic the two definitions coincide,
  * which is what the parity spec pins; cross-type lag belongs to the
  * offline audit. State per type is eight longs — bounded regardless of
  * volume. Arrival order within a batch is event_id order (the monitor
  * sorts its group's rows), matching the batch op's arrival axis, so
  * replaying a sink yields identical counters.
  */
object DisorderMonitor {

  final case class Reading(
      event_type: String,
      n_events: Long,
      n_late: Long,
      n_late_1s: Long,
      n_late_1m: Long,
      n_late_10m: Long,
      max_late_us: Long,
      avg_late_us: Long,
      late_share_e4: Long)

  // state slots: n, n_late, n_1s, n_1m, n_10m, max_late, sum_late, max_ts
  private class Processor
      extends StatefulProcessor[String, (String, Long, Long), Reading] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Long]("disorder", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(
        tpe: String,
        inputRows: Iterator[(String, Long, Long)],
        timerValues: TimerValues): Iterator[Reading] = {
      val stored = st.get().toArray
      val s = if (stored.nonEmpty) stored else Array.fill(8)(0L)
      // intra-batch arrival order = event_id, the batch op's axis
      inputRows.toArray.sortBy(_._2).foreach { case (_, _, tsUs) =>
        val late = if (s(0) > 0 && s(7) > tsUs) s(7) - tsUs else 0L
        s(0) += 1
        if (late > 0L) { s(1) += 1; s(6) += late }
        if (late > 1000000L) s(2) += 1
        if (late > 60000000L) s(3) += 1
        if (late > 600000000L) s(4) += 1
        if (late > s(5)) s(5) = late
        if (s(0) == 1L || tsUs > s(7)) s(7) = tsUs
      }
      st.put(s)
      Iterator.single(Reading(tpe, s(0), s(1), s(2), s(3), s(4), s(5),
        s(6) / s(0), s(1) * 10000L / s(0)))
    }
  }

  /** Monitor over an events frame (needs event_id, event_type, ts).
    * Update mode: each batch re-emits the touched types' latest profile.
    */
  def monitor(events: DataFrame): Dataset[Reading] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
