package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming quantile monitor: per event type, converging p50/p95/p99
  * estimates of `value` over the whole stream — the latency-percentile
  * dashboard shape, where exact streaming quantiles are impossible in
  * bounded memory and a histogram sketch is the standard answer.
  *
  * Sketch: a FIXED equal-width histogram over a caller-declared value
  * domain [lo, hi) — `nBins` longs of state per type, forever. The
  * estimate for quantile q is the upper edge of the first bin whose
  * cumulative count reaches q·n, so the error is bounded by ONE BIN
  * WIDTH by construction (plus domain clipping, which is counted and
  * emitted as `n_clipped` rather than hidden). The spec pins exactly
  * that contract against exact percentiles computed offline. For
  * unknown domains the production move is a first-pass min/max (or the
  * batch [[graft.ops.Analytics.valuePercentiles]] over the sink) to set
  * [lo, hi] — same freeze-a-model posture as [[DriftMonitor]]'s
  * references.
  *
  * Bin counts are exact integers and the merge is addition, so the
  * estimate is arrival-order-independent — replay-deterministic like
  * every other sketch in this repo.
  */
object Quantiles {

  final case class QuantileReading(
      event_type: String, n: Long, n_clipped: Long,
      p50: Double, p95: Double, p99: Double)

  private class Processor(lo: Double, hi: Double, nBins: Int)
      extends StatefulProcessor[String, (String, Double), QuantileReading] {
    @transient private var hist: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getListState[Long](
        "hist", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        tpe: String,
        inputRows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[QuantileReading] = {
      val stored = hist.get().toArray
      // layout: [n_clipped, c0..c(nBins-1)]
      val state = if (stored.isEmpty) Array.fill(nBins + 1)(0L) else stored
      val width = (hi - lo) / nBins
      inputRows.foreach { case (_, v) =>
        if (v < lo || v >= hi) state(0) += 1
        else {
          val bin = math.min(nBins - 1, ((v - lo) / width).toInt)
          state(bin + 1) += 1
        }
      }
      hist.put(state)
      val n = state.drop(1).sum
      def estimate(q: Double): Double = {
        if (n == 0) return lo
        val target = math.ceil(q * n).toLong
        var cum = 0L
        var i = 0
        while (i < nBins) {
          cum += state(i + 1)
          if (cum >= target) return lo + (i + 1) * width
          i += 1
        }
        hi
      }
      Iterator.single(QuantileReading(tpe, n, state(0),
        estimate(0.50), estimate(0.95), estimate(0.99)))
    }
  }

  /** Quantile stream over an events frame (needs event_type, value).
    * Update mode: each batch re-emits the touched types' readings.
    */
  def monitor(
      events: DataFrame,
      lo: Double = 0.0,
      hi: Double = 1024.0,
      nBins: Int = 256): Dataset[QuantileReading] = {
    require(nBins >= 1 && hi > lo)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new Processor(lo, hi, nBins),
        TimeMode.None(), OutputMode.Update())
  }
}
