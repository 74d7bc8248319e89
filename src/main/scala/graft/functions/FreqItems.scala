package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch (Misra & Gries '82) as a typed
  * `Aggregator` — the frequency member of the mergeable-sketch family
  * (q65's HLL for distinct counts, q66's histogram for quantiles, this for
  * heavy hitters). At most k-1 counters ever exist, so the buffer is
  * bounded whatever the domain cardinality; map-side partial aggregation
  * IS the distributed sketch merge (the two-sketch combine rule of
  * Agarwal et al. PODS'12: add counters, subtract the k-th largest,
  * drop non-positives — still at most k-1 survive with the summary
  * guarantee intact).
  *
  * Guarantee (what the spec pins): estimates never exceed the true count,
  * undercount by at most n/k (n = stream length), and therefore every item
  * with true frequency above n/k retains a counter. Which sub-threshold
  * items hold the remaining counters depends on arrival/merge order — a
  * sketch, not a deterministic aggregate, hence a rows-only registry check
  * plus the property spec (same standing as q32/q46).
  */
class FreqItems(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    if (x == null) b
    else b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k - 1 => b.updated(x, 1L)
      case None => // decrement-all step: x's arrival is "paid" by k-1 others
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = (x.keySet ++ y.keySet).iterator
      .map(key => key -> (x.getOrElse(key, 0L) + y.getOrElse(key, 0L)))
      .toMap
    if (sum.size <= k - 1) sum
    else {
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      sum.view.mapValues(_ - kth).filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object FreqItems {
  /** Column function: `freq_items(x, k)` over a group (or globally). */
  def freq_items(c: Column, k: Int): Column = udaf(new FreqItems(k)).apply(c)
}
