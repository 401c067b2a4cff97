package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of [[graft.ops.Analytics.cepPattern]]: the browse-to-buy
  * motif `v[vc]*p` detected live, per user, with three longs of state.
  *
  * The batch op runs a regex over the assembled journey; a stream cannot
  * hold journeys, so the motif compiles to its two-state NFA: OUT --v-->
  * IN, IN --[vc]--> IN, IN --p--> OUT (+1 match), IN --[es]--> OUT. For
  * this pattern class (required head, middle class, required tail) the
  * linear scan counts exactly the regex's leftmost non-overlapping
  * matches — a failing char can never begin or continue a match, so
  * dropping the run loses nothing; the parity spec replays tricky
  * journeys (failure mid-run, back-to-back runs) against the batch regex
  * to pin the equivalence.
  *
  * State per user: in-run flag, journey length, match count — bounded,
  * TTL-able, and key-partitioned (no cross-user state), so the monitor
  * shards to any executor count. Intra-batch order is (ts_us, event_id)
  * — the [[Twap]]/[[NewUsers]] contract, and EXACTLY the batch
  * journey-assembly sort — so replaying a sink reproduces the batch
  * journey order even when event_id order diverges from event-time
  * order.
  */
object CepMonitor {

  final case class Reading(user_id: Long, journey_len: Long, n_matches: Long)

  private class Processor
      extends StatefulProcessor[Long, (Long, Long, Long, String), Reading] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Long]("cep", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        uid: Long,
        inputRows: Iterator[(Long, Long, Long, String)],
        timerValues: TimerValues): Iterator[Reading] = {
      val stored = st.get().toArray
      var inRun = stored.nonEmpty && stored(0) == 1L
      var len = if (stored.nonEmpty) stored(1) else 0L
      var matches = if (stored.nonEmpty) stored(2) else 0L
      inputRows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, ini) =>
        len += 1
        ini match {
          case "v" => inRun = true
          case "c" => () // extends a run, never starts one
          case "p" => if (inRun) { matches += 1; inRun = false }
          case _ => inRun = false
        }
      }
      st.put(Array(if (inRun) 1L else 0L, len, matches))
      Iterator.single(Reading(uid, len, matches))
    }
  }

  /** Monitor over an events frame (needs event_id, ts, user_id,
    * event_type). Update mode: each batch re-emits the touched users'
    * latest counts.
    */
  def monitor(events: DataFrame): Dataset[Reading] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("user_id").isNotNull)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"),
        substring(col("event_type"), 1, 1).as("ini"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
