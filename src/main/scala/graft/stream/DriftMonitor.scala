package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of [[graft.ops.Analytics.psiDrift]]: a live
  * data-drift monitor. A REFERENCE histogram per event type (trained
  * offline by [[referenceHistograms]], frozen like the quality model's
  * weights) rides into the processor as plain constructor state — a
  * model-sized broadcast, exactly the deployed-monitor shape. Each
  * micro-batch folds its values into a CUMULATIVE per-type histogram
  * (state: `nBins` longs per type, bounded regardless of volume) and
  * emits the PSI of the cumulative distribution against the reference —
  * so the reading CONVERGES as evidence accumulates rather than jumping
  * with every small batch, and an alerting consumer just thresholds the
  * latest `psi_e4` per type (0.10 / 0.25 conventional cuts).
  *
  * Binning and smoothing replicate the batch operator exactly (same
  * [vmin, vmax] carried inside the reference, same add-one smoothing),
  * so a stream fed the reference period's own data reads ≈ 0 and the
  * batch operator over the sink table is the replay/heal path.
  */
object DriftMonitor {

  /** Frozen per-type reference: bin counts over [vmin, vmax]. */
  final case class Reference(vmin: Double, vmax: Double, counts: Seq[Long])

  final case class Drift(
      event_type: String, gen: Long, n_seen: Long, psi_e4: Long)

  /** Train references from a batch frame (e.g. the sink table's trusted
    * period): per type, `nBins` equal-width counts over the GLOBAL value
    * range. Driver-sized result: |types| × nBins longs.
    */
  def referenceHistograms(
      df: DataFrame, nBins: Int = 16): Map[String, Reference] = {
    val mm = df.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val rows = df.join(broadcast(mm))
      .select(col("event_type"),
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(lit(nBins - 1L),
            floor((col("value") - col("vmin")) * nBins /
              (col("vmax") - col("vmin"))))).as("bin"),
        col("vmin"), col("vmax"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("c"), first(col("vmin")).as("vmin"),
        first(col("vmax")).as("vmax"))
      .collect()
    rows.groupBy(_.getAs[String]("event_type")).map { case (t, rs) =>
      val counts = Array.fill(nBins)(0L)
      rs.foreach(r => counts(r.getAs[Long]("bin").toInt) = r.getAs[Long]("c"))
      t -> Reference(rs.head.getAs[Double]("vmin"),
        rs.head.getAs[Double]("vmax"), counts.toSeq)
    }
  }

  private class Processor(refs: Map[String, Reference], nBins: Int)
      extends StatefulProcessor[String, (String, Double), Drift] {
    @transient private var hist: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getListState[Long](
        "hist", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        tpe: String,
        inputRows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[Drift] = {
      // a type absent from the reference is itself drift — surfaced as a
      // sentinel row rather than silently dropped
      val ref = refs.get(tpe) match {
        case Some(r) => r
        case None =>
          inputRows.size // drain
          return Iterator.single(Drift(tpe, -1L, 0L, Long.MaxValue))
      }
      val stored = hist.get().toArray
      // first element doubles as the generation counter slot layout:
      // [gen, c0..c(nBins-1)]
      val state = if (stored.isEmpty) Array.fill(nBins + 1)(0L) else stored
      val width = ref.vmax - ref.vmin
      inputRows.foreach { case (_, v) =>
        val bin = if (width == 0) 0
        else math.min(nBins - 1L,
          math.floor((v - ref.vmin) * nBins / width).toLong).max(0L).toInt
        state(bin + 1) += 1
      }
      state(0) += 1
      hist.put(state)
      val nSeen = state.drop(1).sum
      val nRef = ref.counts.sum
      var psi = 0L
      var i = 0
      while (i < nBins) {
        val p = (ref.counts(i) + 1).toDouble / (nRef + nBins)
        val q = (state(i + 1) + 1).toDouble / (nSeen + nBins)
        psi += math.round((p - q) * math.log(p / q) * 10000)
        i += 1
      }
      Iterator.single(Drift(tpe, state(0), nSeen, psi))
    }
  }

  /** Drift stream over an events frame (needs event_type, value). Update
    * mode: each batch re-emits the touched types' latest reading.
    */
  def monitor(
      events: DataFrame,
      refs: Map[String, Reference],
      nBins: Int = 16): Dataset[Drift] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new Processor(refs, nBins),
        TimeMode.None(), OutputMode.Update())
  }
}
