package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of [[graft.ops.Analytics.attributionSplit]]: live
  * linear multi-touch attribution. Views accumulate in per-user state;
  * each arriving purchase splits its integer cents across the views in
  * its trailing `gapMinutes` window — `cents div n` each, remainder to
  * the most recent — and emits one Credit row per credited view, so the
  * per-purchase credits telescope to EXACTLY the purchase amount, same
  * as the batch build.
  *
  * Ordering contract ([[ChangeCapture]]/[[Twap]] plus one refinement):
  * rows apply in (ts, KIND, event_id) order WITHIN each micro-batch,
  * views before purchases at EQUAL timestamps — the batch join's
  * `v_ts <= p_ts` credits a same-instant view whatever its event_id,
  * so the stream must too. View state is pruned to the attribution
  * window behind the newest timestamp seen per user, so state is
  * bounded by views-per-hour-per-user; an out-of-order purchase whose
  * window reaches behind the prune horizon could find some views
  * already pruned — it credits what remains and increments the
  * per-user `late` ValueState (a conservative may-have-lost-credit
  * indicator: EVERY purchase behind the per-user max timestamp counts,
  * whether or not views were actually pruned — read it offline via the
  * state-store reader, as with [[Twap]]); the batch twin over the sink
  * table is the replay path (lambda posture).
  *
  * State per user: a ListState of (view_ts_us, view_id) pairs within the
  * trailing window — bounded, RocksDB-backed.
  */
object Attribution {

  final case class Credit(
      user_id: Long, purchase_id: Long, view_id: Long,
      view_ts_us: Long, credit_cents: Long)

  private class Processor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, Long, Long, String, Long), Credit] {
    @transient private var views: ListState[(Long, Long)] = _
    @transient private var late: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      views = getHandle.getListState[(Long, Long)](
        "views", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      late = getHandle.getValueState[Long]("late", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(
        user: Long,
        inputRows: Iterator[(Long, Long, Long, String, Long)],
        timerValues: TimerValues): Iterator[Credit] = {
      // batch-window ordering (ts, KIND, event_id): at EQUAL timestamps
      // views apply before purchases, because the batch join's
      // `v_ts <= p_ts` credits a same-instant view regardless of which
      // event_id is larger — sorting by id alone would silently
      // under-credit such purchases (parity-pinned in the spec)
      val rows = inputRows.toArray.sortBy { case (_, tsUs, id, tpe, _) =>
        (tsUs, if (tpe == "view") 0 else 1, id) }
      var buf = {
        val it = views.get()
        val b = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        while (it.hasNext) b += it.next()
        b
      }
      var maxTs = if (buf.nonEmpty) buf.map(_._1).max else Long.MinValue
      var nLate = late.get()
      val out = scala.collection.mutable.ArrayBuffer[Credit]()
      rows.foreach { case (_, tsUs, id, tpe, cents) =>
        // any out-of-order purchase whose window lower bound (p_ts - gap)
        // precedes the prune horizon (maxTs - gap) — i.e. p_ts < maxTs —
        // MAY have lost pruned views, not just purchases a full gap
        // behind: count them all so the lambda posture's monitoring
        // signal is conservative (a may-have-lost indicator, readable
        // offline via the state-store reader, like Twap's)
        if (tpe == "purchase" && maxTs != Long.MinValue && tsUs < maxTs)
          nLate += 1
        if (tsUs > maxTs) maxTs = tsUs
        tpe match {
          case "view" =>
            buf += ((tsUs, id))
          case "purchase" =>
            // credited views: within [p_ts - gap, p_ts], most recent first
            // (ties by id, matching the batch build's (v_ts, view_id) DESC)
            val win = buf.filter { case (vTs, _) =>
              vTs <= tsUs && vTs >= tsUs - gapUs }.sortBy { case (vTs, vId) =>
              (-vTs, -vId) }
            val n = win.length
            if (n > 0) {
              val base = cents / n
              val rem = cents % n
              win.zipWithIndex.foreach { case ((vTs, vId), i) =>
                out += Credit(user, id, vId, vTs,
                  base + (if (i < rem) 1L else 0L))
              }
            }
          case _ => ()
        }
        // prune views that can no longer be credited by any in-order
        // purchase (older than the window behind the newest seen ts)
        buf = buf.filter { case (vTs, _) => vTs >= maxTs - gapUs }
      }
      views.put(buf.toArray)
      late.update(nLate)
      out.iterator
    }
  }

  /** Credit stream over the enriched events frame (needs user_id, ts,
    * event_id, event_type, value). Append mode: a credit is final.
    */
  def credits(events: DataFrame, gapMinutes: Int = 60): Dataset[Credit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("event_type").cast("string"),
        round(col("value") * 100).cast("long"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor(gapMinutes * 60000000L),
        TimeMode.None(), OutputMode.Append())
  }
}
