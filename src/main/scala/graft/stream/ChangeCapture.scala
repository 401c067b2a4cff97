package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of [[graft.ops.Analytics.changeCapture]]: per-user SCD2
  * change detection over the live event stream — each time a user's
  * `event_type` differs from their current open version, emit the newly
  * OPENED version row (the arriving state of the dimension). Batch
  * `changeCapture` additionally carries `valid_to`; downstream the close
  * timestamp of version v is exactly version v+1's `valid_from`, so the
  * streaming emission is information-complete for the same table.
  *
  * Ordering contract (same as [[AsOfEnrich]]): rows are applied in
  * (ts, event_id) order WITHIN each micro-batch, so intra-batch disorder
  * — the common kind under parallel ingestion — cannot flip versions.
  * Across batches arrival order is trusted (a row older than the open
  * version's start is counted in `n_late` state but cannot retract an
  * already-emitted version — retraction would need a sink that accepts
  * updates; the batch twin over the sink table is the replay path that
  * heals any such history, which is the standard lambda posture).
  *
  * State per user: the open version's (type, from_us, version) — a few
  * dozen bytes regardless of event volume; RocksDB-backed ValueState.
  */
object ChangeCapture {

  final case class Change(
      user_id: Long, version: Long, event_type: String, valid_from_us: Long)

  private class Processor
      extends StatefulProcessor[Long, (Long, Long, Long, String), Change] {
    // (open type, open from_us, version counter, n_late)
    @transient private var open: ValueState[(String, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[(String, Long, Long, Long)](
        "open", Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        inputRows: Iterator[(Long, Long, Long, String)],
        timerValues: TimerValues): Iterator[Change] = {
      // batch-window ordering: (ts_us, event_id) — disorder inside the
      // micro-batch must not produce spurious versions
      val rows = inputRows.toArray.sortBy { case (_, tsUs, id, _) => (tsUs, id) }
      var st = Option(open.get())
      val out = scala.collection.mutable.ArrayBuffer[Change]()
      rows.foreach { case (_, tsUs, _, tpe) =>
        st match {
          case None =>
            st = Some((tpe, tsUs, 1L, 0L))
            out += Change(user, 1L, tpe, tsUs)
          case Some((curType, fromUs, ver, late)) =>
            if (tsUs < fromUs) st = Some((curType, fromUs, ver, late + 1))
            else if (tpe != curType) {
              st = Some((tpe, tsUs, ver + 1, late))
              out += Change(user, ver + 1, tpe, tsUs)
            }
        }
      }
      st.foreach(open.update)
      out.iterator
    }
  }

  /** Change stream over the enriched events frame (needs user_id, ts,
    * event_id, event_type). Append mode: each emitted row is a newly
    * opened version and is never updated.
    */
  def changes(events: DataFrame): Dataset[Change] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
