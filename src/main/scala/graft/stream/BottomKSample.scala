package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of [[graft.ops.Corpus.sampleKPerGroup]]: a per-group
  * uniform k-sample of an unbounded document stream that CONVERGES to the
  * batch sample — not approximately, identically. The trick is that
  * bottom-k-by-content-hash is a mergeable sketch: "the k smallest
  * (hash, doc_id) pairs seen so far" is insensitive to arrival order,
  * batching, and duplication, so replaying the stream in any permutation
  * lands on the same sample as one batch pass (asserted in
  * StreamingSpec). A classic reservoir sample (Vitter's Algorithm R)
  * cannot offer that — it is RNG- and order-dependent, which breaks both
  * replay determinism and the batch parity this repo treats as the gate.
  *
  * State per group: ≤ k (hash, doc_id) pairs — bytes, not documents;
  * RocksDB-backed ListState. Each batch emits the group's CURRENT sample
  * (Update mode, ≤ k tiny rows per touched group), so the sink always
  * holds a valid uniform sample mid-stream — the property a training-
  * data pipeline wants from "give me 5 docs per source to eyeball".
  *
  * The hash is the SAME replicable rolling fingerprint the batch side
  * uses (computed as a column before the shuffle — state code only
  * compares longs; text never enters the state store).
  */
object BottomKSample {

  /** `gen` is the group's emission generation — consumers (and the parity
    * test) keep each group's max-gen rows as its current sample.
    */
  final case class Sampled(
      group: String, gen: Long, rnk: Long, doc_id: Long, hkey: Long)

  private class Processor(k: Int)
      extends StatefulProcessor[String, (String, Long, Long), Sampled] {
    @transient private var kept: ListState[(Long, Long)] = _
    @transient private var gen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      kept = getHandle.getListState[(Long, Long)](
        "kept", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      gen = getHandle.getValueState[Long]("gen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        group: String,
        inputRows: Iterator[(String, Long, Long)],
        timerValues: TimerValues): Iterator[Sampled] = {
      // merge state ∪ batch, keep the k smallest (hkey, doc_id): set
      // semantics so a re-delivered document cannot occupy two slots
      val merged = (kept.get().map { case (h, d) => (h, d) } ++
        inputRows.map { case (_, h, d) => (h, d) })
        .toSet.toArray.sortBy(identity[(Long, Long)])
        .take(k)
      kept.put(merged)
      val g = (if (gen.exists()) gen.get() else 0L) + 1L
      gen.update(g)
      merged.iterator.zipWithIndex.map { case ((h, d), i) =>
        Sampled(group, g, i + 1L, d, h)
      }
    }
  }

  /** Sample stream over a documents frame (needs `doc_id`, `text` and the
    * group column). Emits each touched group's full current sample per
    * micro-batch in Update mode.
    */
  def perGroup(
      docs: DataFrame,
      groupCol: String = "source",
      k: Int = 5): Dataset[Sampled] = {
    require(k >= 1, "k must be at least 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string"),
        graft.ops.TextAnalysis.rollingFingerprint(col("text")).as("hkey"),
        col("doc_id").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Update())
  }
}
