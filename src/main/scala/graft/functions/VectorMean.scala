package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Buffer for [[VectorMean]]: running element-wise sum + count. */
final case class VecMeanBuf(sums: Array[Double], var n: Long)

/** Typed UDAF (SURVEY.md §2B UDF surface): mergeable element-wise mean of an
  * embedding column — the centroid builder for IVF-style ANN
  * (SimilarityQueries.s04). An `Aggregator` gets map-side partial
  * aggregation for free: each partition reduces locally and only
  * (dim doubles + count) per group crosses the shuffle, so building
  * centroids over 100 TB of vectors moves kilobytes per partition.
  */
class VectorMean(dim: Int) extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {
  override def zero: VecMeanBuf = VecMeanBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecMeanBuf, a: Seq[Float]): VecMeanBuf = {
    if (a == null) return b // skip null vectors like built-in aggregates do
    val n = math.min(dim, a.length)
    var i = 0
    while (i < n) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0) Seq.fill(dim)(0.0) else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorMean {
  /** Column function: `vector_mean(embedding)` over a group. */
  def vector_mean(c: Column, dim: Int = 64): Column =
    udaf(new VectorMean(dim)).apply(c)
}
