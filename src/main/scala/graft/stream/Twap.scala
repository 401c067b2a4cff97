package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of [[graft.ops.Analytics.timeWeightedValue]]: per-user
  * hold emission over the live stream. Each arriving event CLOSES the
  * user's open hold — the span from their previous event to this one,
  * weighted by the previous event's value — and opens a new one. The
  * consumer aggregates emitted holds per type; because the batch twin
  * also drops each user's open (last) hold, the running aggregate of
  * emissions converges to exactly the batch answer over the same prefix.
  *
  * Ordering contract (same as [[ChangeCapture]]): rows are applied in
  * (ts, event_id) order WITHIN each micro-batch; across batches a row
  * older than the open hold's start cannot retract already-emitted mass
  * (that would need an updating sink) — it is counted in `n_late` state
  * and the batch twin over the sink table is the replay path that heals
  * the history (the standard lambda posture).
  *
  * State per user: (last_ts_us, last_cents, last_type, n_late) — a few
  * dozen bytes regardless of volume; RocksDB-backed ValueState. The
  * cents·micros product fits a long (≤ ~1.2e17 per hold); SUMS of
  * weighted mass belong to the consumer, which must widen (the batch
  * twin uses DECIMAL(38,0)).
  */
object Twap {

  final case class Hold(
      user_id: Long, event_type: String, hold_us: Long, wcents: Long)

  private class Processor
      extends StatefulProcessor[Long, (Long, Long, Long, String, Long), Hold] {
    // (last_ts_us, last_cents, last_type, n_late)
    @transient private var open: ValueState[(Long, Long, String, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[(Long, Long, String, Long)](
        "open", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.STRING, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        inputRows: Iterator[(Long, Long, Long, String, Long)],
        timerValues: TimerValues): Iterator[Hold] = {
      // batch-window ordering: (ts_us, event_id)
      val rows = inputRows.toArray.sortBy { case (_, tsUs, id, _, _) => (tsUs, id) }
      var st = Option(open.get())
      val out = scala.collection.mutable.ArrayBuffer[Hold]()
      rows.foreach { case (_, tsUs, _, tpe, cents) =>
        st match {
          case None =>
            st = Some((tsUs, cents, tpe, 0L))
          case Some((lastTs, lastCents, lastType, late)) =>
            if (tsUs < lastTs) st = Some((lastTs, lastCents, lastType, late + 1))
            else {
              val hold = tsUs - lastTs
              out += Hold(user, lastType, hold, lastCents * hold)
              st = Some((tsUs, cents, tpe, late))
            }
        }
      }
      st.foreach(open.update)
      out.iterator
    }
  }

  /** Hold stream over the enriched events frame (needs user_id, ts,
    * event_id, event_type, value). Append mode: a closed hold is final.
    */
  def holds(events: DataFrame): Dataset[Hold] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("event_type").cast("string"),
        round(col("value") * 100).cast("long"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
