package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch AS-OF join
  * ([[graft.ops.Analytics.asofLastView]]): enrich each purchase with the
  * user's most recent view AS OF the purchase's event time, as purchases
  * arrive. State is one (ts, value) pair per active user — a
  * `transformWithState` ValueState on the RocksDB store, so the key
  * space scales to disk, not heap.
  *
  * Parity contract with the batch operator (asserted in StreamingSpec):
  *  - within a micro-batch, a user's events are processed in
  *    (ts, view-before-purchase, event_id) order — the exact window
  *    order of the batch twin — so out-of-order delivery inside a batch
  *    cannot flip the result;
  *  - across batches, the state keeps the lexicographically greatest
  *    (ts, event_id) view, so a late view older than (or an equal-ts,
  *    lower-id rival of) the current last view never regresses state
  *    (batch "last view" = max (ts, event_id) among views ≤ the
  *    purchase);
  *  - the one divergence streaming cannot avoid: a view arriving AFTER
  *    a purchase it precedes in event time has already been emitted
  *    cannot retroactively re-enrich that purchase. The watermark-bounded
  *    interval join covers the windowed variant of that case.
  */
object AsOfEnrich {

  final case class AsOfInput(
      user_id: String,
      event_id: Long,
      event_type: String,
      ts_us: Long,
      value: Double)

  final case class LastView(ts_us: Long, event_id: Long, value: Double)

  final case class EnrichedPurchase(
      purchase_id: Long,
      user_id: String,
      last_view_us: Option[Long],
      last_view_value: Option[Double])

  private class AsOfProcessor
      extends StatefulProcessor[String, AsOfInput, EnrichedPurchase] {
    @transient private var lastView: ValueState[LastView] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastView = getHandle.getValueState[LastView](
        "lastView", Encoders.product[LastView], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        inputRows: Iterator[AsOfInput],
        timerValues: TimerValues): Iterator[EnrichedPurchase] = {
      val sorted = inputRows.toArray.sortBy(e =>
        (e.ts_us, if (e.event_type == "purchase") 1 else 0, e.event_id))
      val out = Seq.newBuilder[EnrichedPurchase]
      sorted.foreach { e =>
        if (e.event_type == "purchase") {
          val lv = if (lastView.exists()) Some(lastView.get()) else None
          out += EnrichedPurchase(e.event_id, key,
            lv.map(_.ts_us), lv.map(_.value))
        } else if (e.event_type == "view") {
          // lexicographic (ts, event_id) comparison: among equal-ts views
          // the HIGHEST event_id wins — the batch twin's window order —
          // including when the equal-ts rival arrives in a LATER batch
          val lv = if (lastView.exists()) lastView.get() else null
          if (lv == null || e.ts_us > lv.ts_us ||
              (e.ts_us == lv.ts_us && e.event_id > lv.event_id))
            lastView.update(LastView(e.ts_us, e.event_id, e.value))
        }
      }
      out.result().iterator
    }
  }

  /** events: any frame with `user_id`, `event_id`, `event_type`, `ts`
    * (timestamp) and `value` — the enriched pipeline output qualifies.
    * Emits one row per purchase; non-view/non-purchase events are
    * dropped before the shuffle.
    */
  def enrich(events: DataFrame): Dataset[EnrichedPurchase] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type").isin("view", "purchase"))
      .select(
        col("user_id").cast("string").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        coalesce(col("value"), lit(0.0)).cast("double").as("value"))
      .as[AsOfInput]
      .groupByKey(_.user_id)
      .transformWithState(new AsOfProcessor, TimeMode.None(), OutputMode.Append())
  }
}
