package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin, Lang, Liberty FOCS'16; Apache DataSketches
  * `KllDoublesSketch`, which ships with Spark) surfaced as native
  * aggregates — the real mergeable quantile digest behind q66's
  * persist→merge rollup architecture (q66's bounded histogram trades
  * error for exactness; KLL trades exactness for a size/error guarantee
  * independent of the VALUE DOMAIN: ~1.65% normalized rank error at k=200
  * in ~3 KB, where an equi-width histogram needs domain bounds known up
  * front).
  *
  * [[KllBuildAgg]] builds a sketch over a double column; [[KllMergeAgg]]
  * merges stored sketch blobs. Both are `TypedImperativeAggregate`s — the
  * live sketch object is the aggregation buffer, serialized only at the
  * partial/final exchange boundary (the same mechanism as Spark's own
  * `hll_sketch_agg`), so building over 100 TB updates a ~3 KB in-memory
  * sketch per partition and ships one blob per group through the shuffle.
  *
  * KLL compaction is randomized (coin-flip offset per compaction), so two
  * runs over identical data can produce different — equally valid —
  * sketch bytes: rows-only registry check, with the rank-error guarantee
  * pinned against the exact percentiles in QueriesSpec (q76's
  * sketch-contract pattern).
  */
abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  def k: Int

  /** Exact input type required (AbstractDataType is private[sql] in
    * Spark 4, so the check is spelled out instead of ExpectsInputTypes).
    */
  protected def requiredInputType: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == requiredInputType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ${requiredInputType.catalogString}, " +
        s"got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapify returns a read-only-capable image; merging into a fresh
    // writable sketch keeps the buffer updatable after an exchange
    val sk = KllDoublesSketch.newHeapInstance(k)
    sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    sk
  }
}

/** `kll_agg(x, k)`: sketch of a double column (nulls skipped). */
case class KllBuildAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def prettyName: String = "kll_agg"
  override protected def requiredInputType: DataType = DoubleType

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KllBuildAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllBuildAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllBuildAgg =
    copy(child = newChild)
}

/** `kll_merge(sketch_blob)`: union of stored sketches — the rollup-read
  * aggregate; its input is |groups| blobs, never the raw rows.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def prettyName: String = "kll_merge"
  override protected def requiredInputType: DataType = BinaryType

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(blob, rank)`: estimated quantile at normalized rank
  * (INCLUSIVE criteria, DataSketches default); null for an empty sketch.
  * Scalar post-processing of a merged one-row blob — never in a hot path,
  * so interpreted eval (CodegenFallback) is the right cost.
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(blob)`: exact stream length the sketch has absorbed (KLL tracks
  * n exactly through merges — the free sanity handle every rollup check
  * starts with).
  */
case class KllN(child: Expression) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType

  override def nullSafeEval(bytes: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getN

  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}

object KllQuantiles {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def kll_agg(c: Column, k: Int = 200): Column =
    column(KllBuildAgg(expression(c), k).toAggregateExpression())
  def kll_merge(c: Column, k: Int = 200): Column =
    column(KllMergeAgg(expression(c), k).toAggregateExpression())
  def kll_quantile(c: Column, rank: Column): Column =
    column(KllQuantile(expression(c), expression(rank)))
  def kll_n(c: Column): Column = column(KllN(expression(c)))

  /** SQL registration (the engine rule: every native function is reachable
    * from raw SQL text, not just the Column API). The analyzer wraps a
    * registered AggregateFunction in its AggregateExpression itself.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("kll_agg",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("kll_agg", 1, exprs); KllBuildAgg(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("kll_merge",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("kll_merge", 1, exprs); KllMergeAgg(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("kll_quantile",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("kll_quantile", 2, exprs)
        KllQuantile(exprs(0), exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("kll_n",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("kll_n", 1, exprs); KllN(exprs.head)
      }, "built-in")
  }
}
