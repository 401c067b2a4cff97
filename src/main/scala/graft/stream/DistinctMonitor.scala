package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of [[graft.ops.Sketch.kmvDistinct]]: a live distinct-
  * users monitor. An exact streaming distinct needs state proportional to
  * the user population — unbounded, and exactly what kills a
  * `mapGroupsWithState` job in week three. The KMV sketch is the bounded
  * answer: k longs per event type, mergeable, and the SAME estimator the
  * batch side publishes, so dashboard and backfill agree by construction.
  *
  * State per type: the bottom-k set of portable user-id hashes (at most
  * k = 64 longs). Each batch folds its rows in and emits the type's
  * current (n_kept, kth_hash, estimate). The parity spec pins a full
  * replay's final readings equal to the batch sketch columns on the same
  * frame — the replay-convergence contract every monitor in this repo
  * honors ([[IngestDedup]], [[DisorderMonitor]]).
  */
object DistinctMonitor {

  final case class Reading(
      event_type: String,
      n_kept: Long,
      kth_hash: Long,
      est_distinct: Long)

  private class Processor(k: Int)
      extends StatefulProcessor[String, (String, Long), Reading] {
    import graft.ops.Sketch.{KmvAddC, KmvModulus, KmvMulA}
    @transient private var st: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Long]("kmv", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        tpe: String,
        inputRows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[Reading] = {
      val sketch = scala.collection.mutable.TreeSet.from(st.get())
      inputRows.foreach { case (_, uid) =>
        val h = (uid * KmvMulA + KmvAddC) % KmvModulus
        if (sketch.size < k) sketch += h
        else if (h < sketch.last && !sketch.contains(h)) {
          sketch += h
          sketch -= sketch.last
        }
      }
      st.put(sketch.toArray)
      val n = sketch.size.toLong
      val kth = if (sketch.isEmpty) 0L else sketch.last
      val est = if (n < k) n else (k - 1).toLong * KmvModulus / kth
      Iterator.single(Reading(tpe, n, kth, est))
    }
  }

  /** Monitor over an events frame (needs event_type, user_id). Update
    * mode: each batch re-emits the touched types' latest sketch readout.
    */
  def monitor(events: DataFrame, k: Int = 64): Dataset[Reading] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("user_id").isNotNull)
      .select(col("event_type").cast("string"), col("user_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Update())
  }
}
