package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{array, element_at, least, lit, udaf}

/** Count-Min sketch (Cormode & Muthukrishnan '05) as typed `Aggregator`s —
  * the point-frequency member of the mergeable-sketch family (q65 HLL for
  * distinct, q83 KLL for quantiles, q76 Misra-Gries for heavy hitters,
  * this for "how often did THIS key occur"). depth×width integer counters;
  * every arrival increments one counter per row (seeded stable hash), a
  * point estimate reads the MINIMUM across rows.
  *
  * Two properties the spec pins, both stronger than Misra-Gries offers:
  *  - estimates NEVER undercount (each row's counter ≥ the true count),
  *    and overcount only by collision mass (≤ εn with ε = e/width at
  *    depth ln(1/δ) — measured and pinned with margin, not assumed);
  *  - the sketch is ORDER-INDEPENDENT: merge is element-wise addition, so
  *    partial-merge == one-shot is an EXACT array equality, not a bound
  *    (Misra-Gries only guarantees the summary property, not the bits).
  *
  * Hashing: Scala `MurmurHash3.stringHash` with the row index as seed —
  * pure-JVM stable, no RNG state; width a power of two so the modulo is a
  * mask.
  */
class CountMinBuild(width: Int, depth: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(b: Array[Long], x: String): Array[Long] = {
    if (x != null) {
      var j = 0
      while (j < depth) {
        b(j * width + CountMin.cell(x, j, width)) += 1L
        j += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** Merges stored CMS blobs (element-wise addition — exact). */
class CountMinMerge(size: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(b: Array[Long], x: Array[Long]): Array[Long] = {
    require(x == null || x.length == size,
      s"count-min blob width mismatch: ${if (x == null) "null" else x.length} vs $size")
    if (x != null) { var i = 0; while (i < size) { b(i) += x(i); i += 1 } }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {
  val Width = 1024 // power of two: modulo is a mask
  val Depth = 4

  private[graft] def cell(x: String, row: Int, width: Int): Int =
    scala.util.hashing.MurmurHash3.stringHash(x, row) & (width - 1)

  def cm_agg(c: Column): Column = udaf(new CountMinBuild(Width, Depth)).apply(c)
  def cm_merge(c: Column): Column =
    udaf(new CountMinMerge(Width * Depth)).apply(c)

  /** Point estimate for a token KNOWN at plan time: its depth cell indexes
    * are computed driver-side, so the estimate is a plain `least()` over
    * `element_at`s — no UDF in the query path.
    */
  def cm_estimate(sketch: Column, token: String): Column =
    least((0 until Depth).map(j =>
      element_at(sketch, j * Width + cell(token, j, Width) + 1)): _*)

  /** All probe estimates as one array column (same order as `tokens`). */
  def cm_estimates(sketch: Column, tokens: Seq[String]): Column =
    array(tokens.map(t => cm_estimate(sketch, t)): _*)

  def probeLit(tokens: Seq[String]): Column = array(tokens.map(lit): _*)
}
