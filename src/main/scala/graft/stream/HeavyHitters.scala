package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming heavy hitters via the Space-Saving algorithm (Metwally et
  * al., "Efficient computation of frequent and top-k elements in data
  * streams") — the standard bounded-memory answer to "what are the top
  * event types / user agents / domains right now" over an unbounded
  * stream, where an exact groupBy-count's state would grow with the key
  * cardinality forever.
  *
  * Distribution shape: keys are sharded into `nBuckets` disjoint hash
  * buckets; each bucket task maintains ONE Space-Saving summary of
  * `capacity` counters over the keys that hash there (RocksDB-backed via
  * `transformWithState` ListState). Because buckets partition the key
  * space, each summary carries the full stream for its own keys, so the
  * classic guarantees hold per bucket: a tracked key's count
  * overestimates its true count by at most its recorded `overestimate`,
  * and any key with true count > bucketTotal/capacity is guaranteed
  * present. The union of all bucket summaries (≤ nBuckets·capacity tiny
  * rows per batch) is the global sketch — the consumer takes its top-k.
  *
  * At 100 TB: state is nBuckets·capacity counters TOTAL regardless of
  * key cardinality (vs unbounded for exact counting); the exchange
  * hash-partitions on the bucket id, so summary maintenance parallelizes
  * to nBuckets tasks with no skew a hot KEY can cause beyond its bucket
  * (raise nBuckets to spread; one key's traffic always folds into one
  * counter increment per row regardless).
  */
object HeavyHitters {

  /** One tracked counter: count includes up to `overestimate` phantom
    * hits inherited from the counter it displaced.
    */
  final case class Counter(bucket: Int, key: String, count: Long, overestimate: Long)

  private class SpaceSavingProcessor(capacity: Int, emitK: Int)
      extends StatefulProcessor[Int, (Int, String), Counter] {
    @transient private var counters: ListState[(String, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getListState[(String, Long, Long)](
        "counters", Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(
        bucket: Int,
        inputRows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[Counter] = {
      // load the bucket's summary (≤ capacity entries) into a heap-free
      // map — capacity is small by construction, linear min-scan is fine
      val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
      counters.get().foreach { case (k, c, o) => m(k) = (c, o) }
      inputRows.foreach { case (_, key) =>
        m.get(key) match {
          case Some((c, o)) => m(key) = (c + 1, o)
          case None if m.size < capacity => m(key) = (1L, 0L)
          case None =>
            // displace the minimum counter: the newcomer inherits its
            // count as the overestimate bound (the Space-Saving step)
            val (mk, (mc, _)) = m.minBy { case (k, (c, _)) => (c, k) }
            m.remove(mk)
            m(key) = (mc + 1, mc)
        }
      }
      counters.put(m.toArray.map { case (k, (c, o)) => (k, c, o) })
      m.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(emitK)
        .map { case (k, (c, o)) => Counter(bucket, k, c, o) }.iterator
    }
  }

  /** Top event-type heavy hitters over the enriched stream. Each batch
    * emits every bucket's current top-`emitK` counters in Update mode;
    * the global top-k is the consumer's (count desc) head of the union.
    */
  def topK(
      events: DataFrame,
      keyCol: String = "event_type",
      capacity: Int = 100,
      nBuckets: Int = 16,
      emitK: Int = 10): Dataset[Counter] = {
    require(capacity > 0 && nBuckets > 0 && emitK > 0)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(pmod(hash(col(keyCol)), lit(nBuckets)).as("bucket"),
        col(keyCol).cast("string").as("key"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(
        new SpaceSavingProcessor(capacity, emitK),
        TimeMode.None(), OutputMode.Update())
  }
}
