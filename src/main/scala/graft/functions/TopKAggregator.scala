package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator over (score, id) pairs — keeps the k best
  * by (score DESC, id ASC).
  *
  * Scale rationale vs `row_number().over(Window...)`: a rank-filter
  * window shuffles and sorts EVERY row of the group; this Aggregator is
  * a partial+final aggregate, so each map task ships at most k pairs per
  * group and nothing is globally sorted. At 100 TB with bounded k this
  * turns a full-data shuffle into a per-group-constant one.
  */
final class TopKAggregator[IN](k: Int, extract: IN => (Double, Long))
    extends Aggregator[IN, Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  private def best(pairs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    pairs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(buf: Seq[(Double, Long)], in: IN): Seq[(Double, Long)] =
    best(extract(in) +: buf)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(a ++ b)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
