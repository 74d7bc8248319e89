package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Theta sketches (Apache DataSketches KMV family) surfaced as native
  * aggregates + scalar set operations — the distinct-count sketch that,
  * unlike HLL (q65), supports set ALGEBRA on merged sketches:
  * INTERSECTION and DIFFERENCE estimates between cohorts whose exact
  * computation needs a full distinct-key join. Audience overlap ("users
  * who did A and B"), churn ("in A, gone from B"), and decontamination
  * overlap accounting all reduce to these two calls at 100 TB: build
  * per-partition/day partials once, persist, and answer ANY pairwise
  * cohort question from the stored blobs.
  *
  * [[ThetaBuildAgg]] sketches a long key column; [[ThetaMergeAgg]] unions
  * stored blobs. Both are `TypedImperativeAggregate`s with the live
  * `Union` object as the aggregation buffer (KllQuantiles' mechanism:
  * serialize only at exchange boundaries — a ~32 KB ordered-compact image
  * per group at the default lg_k). The scalar post-processing
  * ([[ThetaEstimate]], [[ThetaIntersectEst]], [[ThetaANotBEst]]) runs on
  * one-row merged frames, never in a hot path.
  *
  * A theta sketch under the default seed is a deterministic FUNCTION of
  * the input SET (the retained entries are the k smallest key hashes, and
  * ordered-compact serialization is canonical) — but the ESTIMATE leaves
  * exact mode once distincts exceed the nominal entry count, so registry
  * checks stay rows-only with the error contract pinned in QueriesSpec
  * (< 1% relative at lg_k=12 with >= 2^12 retained entries; DataSketches
  * published RSE is ~1/sqrt(2^lgk) ≈ 1.56%).
  */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  /** log2(nominal entries); 12 -> 4096 retained hashes, ~1.56% RSE. */
  def lgK: Int

  protected def requiredInputType: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == requiredInputType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ${requiredInputType.catalogString}, " +
        s"got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult(false, null)); a
  }

  /** Ordered-compact image: the canonical serialization of the retained
    * set, so identical input sets yield identical bytes.
    */
  override def eval(buf: Union): Any = buf.getResult(true, null).toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }
}

/** `theta_agg(key)`: theta sketch of a long key column (nulls skipped). */
case class ThetaBuildAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def prettyName: String = "theta_agg"
  override protected def requiredInputType: DataType = LongType

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaBuildAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaBuildAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaBuildAgg =
    copy(child = newChild)
}

/** `theta_merge(blob)`: union of stored sketch blobs — the rollup-read
  * aggregate; its input is |groups| blobs, never raw rows.
  */
case class ThetaMergeAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def prettyName: String = "theta_merge"
  override protected def requiredInputType: DataType = BinaryType

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaMergeAgg =
    copy(child = newChild)
}

private object ThetaOps {
  def sketch(bytes: Any): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
}

/** `theta_estimate(blob)`: distinct-count estimate (exact while the
  * sketch has not exceeded its nominal entries).
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(bytes: Any): Any = ThetaOps.sketch(bytes).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect_est(a, b)`: estimated |A ∩ B| — the call HLL cannot
  * answer without inclusion-exclusion error blowup.
  */
case class ThetaIntersectEst(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "theta_intersect_est"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaOps.sketch(a), ThetaOps.sketch(b)).getEstimate

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `theta_anotb_est(a, b)`: estimated |A \ B| (churn / exclusive reach). */
case class ThetaANotBEst(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "theta_anotb_est"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaOps.sketch(a), ThetaOps.sketch(b)).getEstimate

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ThetaSketches {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def theta_agg(c: Column): Column =
    column(ThetaBuildAgg(expression(c)).toAggregateExpression())
  def theta_merge(c: Column): Column =
    column(ThetaMergeAgg(expression(c)).toAggregateExpression())
  def theta_estimate(c: Column): Column = column(ThetaEstimate(expression(c)))
  def theta_intersect_est(a: Column, b: Column): Column =
    column(ThetaIntersectEst(expression(a), expression(b)))
  def theta_anotb_est(a: Column, b: Column): Column =
    column(ThetaANotBEst(expression(a), expression(b)))

  /** SQL registration (engine rule: every native function is reachable
    * from raw SQL).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("theta_agg",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("theta_agg", 1, exprs)
        ThetaBuildAgg(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("theta_merge",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("theta_merge", 1, exprs)
        ThetaMergeAgg(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("theta_estimate",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("theta_estimate", 1, exprs)
        ThetaEstimate(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("theta_intersect_est",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("theta_intersect_est", 2, exprs)
        ThetaIntersectEst(exprs(0), exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("theta_anotb_est",
      (exprs: Seq[Expression]) => {
        graft.GraftExtensions.arity("theta_anotb_est", 2, exprs)
        ThetaANotBEst(exprs(0), exprs(1))
      }, "built-in")
  }
}
