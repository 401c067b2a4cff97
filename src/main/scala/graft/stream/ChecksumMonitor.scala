package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of [[graft.ops.Analytics.tableChecksum]]: the sink's
  * integrity fingerprint maintained LIVE, so a downstream copy can be
  * validated against the stream's own running checksum without ever
  * re-scanning the sink. The mod-M sum of row hashes is associative and
  * commutative, so folding each micro-batch into two longs of state per
  * type reproduces exactly what the batch audit computes over the
  * accumulated table — the parity spec replays a stream and pins the
  * final readings equal to the batch rollup rows.
  *
  * The row hash is computed by the same SQL expression chain the batch
  * op uses (via [[graft.ops.Analytics.checksumHashExpr]]), BEFORE the
  * keyed state — the processor only counts and sums mod M.
  */
object ChecksumMonitor {

  final case class Reading(event_type: String, n_rows: Long, checksum: Long)

  private val M = 1000000007L

  private class Processor
      extends StatefulProcessor[String, (String, Long), Reading] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Long]("chk", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        tpe: String,
        inputRows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[Reading] = {
      val stored = st.get().toArray
      var n = if (stored.nonEmpty) stored(0) else 0L
      var sum = if (stored.nonEmpty) stored(1) else 0L
      inputRows.foreach { case (_, h) =>
        n += 1
        sum = (sum + h) % M
      }
      st.put(Array(n, sum))
      Iterator.single(Reading(tpe, n, sum))
    }
  }

  /** Monitor over an events frame (event_id, user_id, event_type, value,
    * ts). Update mode: each batch re-emits the touched types' running
    * (count, checksum).
    */
  def monitor(events: DataFrame): Dataset[Reading] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("th",
        graft.ops.TextAnalysis.rollingFingerprint(col("event_type")))
      .withColumn("h", expr(graft.ops.Analytics.checksumHashExpr))
      .select(col("event_type").cast("string"), col("h").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
