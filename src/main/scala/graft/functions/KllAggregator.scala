package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch over Long values — the KLL-class compactor
  * hierarchy (Karnin-Lang-Liberty 2016's structure with DETERMINISTIC
  * compaction à la Munro-Paterson, no coin flips): level i holds items
  * of weight 2^i with capacity `k`; a full level sorts and promotes
  * every other survivor (the parity alternates by level so the
  * systematic half-item bias cancels instead of accumulating one-sided).
  * An odd item stays at its level, so TOTAL WEIGHT IS EXACTLY PRESERVED
  * through every compaction and merge — Σ weight(finish) == row count,
  * which the spec pins.
  *
  * Buffer is ≤ k·levels longs ≈ k·log₂(n/k) — KILOBYTES regardless of
  * row count, so the aggregate is a true partial+final combine: the
  * corpus never shuffles, per-partition sketches do (the
  * [[CovarianceAggregator]] shape). Merge is level-wise concatenation +
  * re-compaction: associative up to compaction choice, and the rank
  * guarantee below holds under ANY merge order, which is what lets the
  * driver-facing query emit an order-independent within-envelope boolean
  * instead of the (merge-order-sensitive) raw estimate.
  *
  * Rank guarantee (deterministic): each compaction at level i displaces
  * a query rank by at most 2^i, and level i compacts at most
  * ~n/(k·2^(i-1)) times, so total rank error ≤ Σᵢ n/(k·2^(i-1))·2^i =
  * O(n·log₂(n/k)/k). At k = 512: ≤ ~2% of n for n up to 10⁶ and ~6% at
  * n = 10¹² — size k like log₂(n/k)/ε for a target ε at 100 TB (the
  * same advice [[graft.ops.Dedup.bloomSizing]] institutionalizes for
  * Bloom gates).
  *
  * finish() returns the weighted sample (value, weight) — quantile
  * evaluation happens in the plan (cumulative-weight threshold), not in
  * the sketch, so one sketch serves every φ.
  */
final class KllAggregator(k: Int)
    extends Aggregator[Long, Seq[Seq[Long]], Seq[(Long, Long)]] {
  require(k >= 2 && k % 2 == 0, "k must be a positive even number")

  override def zero: Seq[Seq[Long]] = Nil

  /** Compact every overfull level, cascading upward. */
  private def compact(levels: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    var ls = levels.toVector
    var i = 0
    while (i < ls.length) {
      if (ls(i).length >= k) {
        val sorted = ls(i).sorted
        val evenCount = sorted.length - (sorted.length % 2)
        // survivor parity alternates by level: even levels keep indices
        // 0,2,..., odd levels keep 1,3,... — biases cancel across levels
        val off = i % 2
        val promoted =
          Iterator.range(off, evenCount, 2).map(sorted(_)).toVector
        ls = ls.updated(i, sorted.drop(evenCount))
        if (i + 1 >= ls.length) ls = ls :+ Vector.empty[Long]
        ls = ls.updated(i + 1, ls(i + 1) ++ promoted)
      }
      i += 1
    }
    ls
  }

  override def reduce(buf: Seq[Seq[Long]], v: Long): Seq[Seq[Long]] = {
    val withV =
      if (buf.isEmpty) Vector(Vector(v))
      else buf.toVector.updated(0, buf.head :+ v)
    if (withV.head.length >= k) compact(withV) else withV
  }

  override def merge(a: Seq[Seq[Long]], b: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    val depth = math.max(a.length, b.length)
    val zipped = Vector.tabulate(depth) { i =>
      (if (i < a.length) a(i).toVector else Vector.empty[Long]) ++
        (if (i < b.length) b(i) else Vector.empty[Long])
    }
    compact(zipped)
  }

  override def finish(buf: Seq[Seq[Long]]): Seq[(Long, Long)] =
    buf.zipWithIndex.flatMap { case (items, i) =>
      items.map(v => (v, 1L << i))
    }

  override def bufferEncoder: Encoder[Seq[Seq[Long]]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
