package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running event counters on the MODERN arbitrary-state API —
  * `transformWithState` + `StatefulProcessor` (Spark 4), the successor to
  * `[flat]MapGroupsWithState` used by [[Sessionize]]. Kept alongside the
  * older API deliberately: both are part of the engine surface a
  * streaming user expects, and the new one brings typed state variables,
  * per-state TTL, and the RocksDB store (required by this API — state
  * scales to disk, not heap, which IS the 100 TB story for wide key
  * spaces).
  *
  * Emits one (user_id, running_count) row per user per micro-batch that
  * saw that user's events. State: a single long per active user, aged
  * out by TTL rather than by watermark timers.
  */
object RunningCounts {

  final case class UserCount(user_id: String, running_count: Long)

  private class CountProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, String, UserCount] {
    @transient private var countState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long](
        "count", Encoders.scalaLong,
        if (ttl == null) TTLConfig.NONE else new TTLConfig(ttl))

    override def handleInputRows(
        key: String,
        inputRows: Iterator[String],
        timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (countState.exists()) countState.get() else 0L) +
        inputRows.size
      countState.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  /** events: the enriched stream (needs `user_id`). `ttl = null` keeps
    * state forever; with an idle-age bound the query runs in
    * ProcessingTime mode — Spark rejects a non-NONE TTLConfig under any
    * other time mode, so the mode follows the ttl argument.
    */
  def perUser(
      events: DataFrame,
      ttl: java.time.Duration = null): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events.select(col("user_id")).as[String]
      .groupByKey(identity)
      .transformWithState(
        new CountProcessor(ttl), timeMode, OutputMode.Update())
  }
}
