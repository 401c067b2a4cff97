package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One entry of the covariance upper triangle. */
case class CovEntry(i: Int, j: Int, cov: Double)

/** Single-pass covariance-matrix accumulator over embedding vectors —
  * the Gram-matrix formulation of distributed PCA: each partition folds
  * its rows into a fixed-size buffer (n, Σx per dim, Σxᵢxⱼ upper
  * triangle), partials merge by element-wise addition (associative and
  * commutative, so partial-aggregation order can't change the result
  * beyond double-sum reordering), and the finish step emits
  * cov(i,j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n).
  *
  * Buffer size is d + d(d+1)/2 + 1 doubles (d=64 → ~17 KB) —
  * independent of row count, so the aggregate is a true map-side
  * combine: the corpus never shuffles, only per-partition buffers do.
  */
final class CovarianceAggregator(dim: Int)
    extends Aggregator[Seq[Float], Array[Double], Seq[CovEntry]] {
  require(dim > 0)
  private val nSums = dim
  private val nProds = dim * (dim + 1) / 2
  // buffer layout: [0] = n, [1..dim] = sums, [dim+1..] = upper-tri products
  override def zero: Array[Double] = new Array[Double](1 + nSums + nProds)

  override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
    val x = v.toArray
    buf(0) += 1.0
    var i = 0
    var p = 1 + nSums
    while (i < dim) {
      val xi = x(i).toDouble
      buf(1 + i) += xi
      var j = i
      while (j < dim) {
        buf(p) += xi * x(j).toDouble
        p += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[CovEntry] = {
    val n = buf(0)
    if (n == 0) return Nil
    val out = Vector.newBuilder[CovEntry]
    var i = 0
    var p = 1 + nSums
    while (i < dim) {
      val mi = buf(1 + i) / n
      var j = i
      while (j < dim) {
        val mj = buf(1 + j) / n
        out += CovEntry(i, j, buf(p) / n - mi * mj)
        p += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[CovEntry]] = ExpressionEncoder()
}
