package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst kernels for the Johnson–Lindenstrauss search path (s22).
  *
  * Why Expressions and not HOFs: the projection ran first as nested
  * `transform(sequence(...), aggregate(sequence(...)))` lambdas — measured
  * 19 s at sf0.1 (5k vectors), because each of the 2048 per-row lambda
  * steps evaluates through the interpreted HOF path with boxing. The same
  * arithmetic as a `doGenCode` primitive loop stays inside
  * WholeStageCodegen; the HOF spelling remains in FunctionsSpec as the
  * equivalence oracle (bit-identical — all-integer arithmetic).
  *
  * Numerics contract (shared with the DuckDB oracle): quantize each float
  * by widening to double, multiplying by 1000.0 and flooring — then ALL
  * downstream arithmetic is exact 64-bit integers, so the approximate
  * method itself hash-checks.
  */
object JlFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  val InDim = 64
  val OutDim = 32

  /** Deterministic ±1 sign matrix (64×32, row-major), from a murmur-style
    * avalanche hash of the index pair — measured off-diagonal Gram
    * magnitude ≤ 24/64. (A naive linear-congruence parity gave
    * near-duplicate columns, Gram up to 62/64, and chance-level recall.)
    * Static data: the SAME array backs this kernel, the QueriesSpec Gram
    * bound, and the literal interpolated into the DuckDB oracle.
    */
  val signs: Array[Long] = {
    def sgn(i: Int, j: Int): Long = {
      var h = (i.toLong * 2654435761L + j.toLong * 1779033703L) & 0xFFFFFFFFL
      h ^= h >> 16
      h = (h * 0x85EBCA6BL) & 0xFFFFFFFFL
      h ^= h >> 13
      if ((h & 1L) == 0L) 1L else -1L
    }
    Array.tabulate(InDim * OutDim)(n => sgn(n / OutDim, n % OutDim))
  }

  def jl_project(v: Column): Column = column(JlProject(expression(v)))
  def sq_dist_long(a: Column, b: Column): Column =
    column(SqDistLong(expression(a), expression(b)))

  /** SQL registration (engine extensions must be reachable from SQL text). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "jl_project", exprs => { graft.GraftExtensions.arity("jl_project", 1, exprs); JlProject(exprs(0)) }, "built-in")
    reg.createOrReplaceTempFunction(
      "sq_dist_long", exprs => { graft.GraftExtensions.arity("sq_dist_long", 2, exprs); SqDistLong(exprs(0), exprs(1)) }, "built-in")
  }
}

/** array<float|double>(64) → array<long>(32): floor-quantize to integer
  * thousandths, then multiply through the static ±1 [[JlFunctions.signs]]
  * matrix. One fused pass — the quantized vector never materializes.
  */
case class JlProject(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"jl_project needs array<float> or array<double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != JlFunctions.InDim)
      throw new IllegalArgumentException(
        s"jl_project: expected ${JlFunctions.InDim} dims, got ${x.numElements()}")
    val q = new Array[Long](JlFunctions.InDim)
    var i = 0
    while (i < JlFunctions.InDim) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      q(i) = math.floor(v * 1000.0).toLong
      i += 1
    }
    val out = new Array[Long](JlFunctions.OutDim)
    var j = 0
    while (j < JlFunctions.OutDim) {
      var acc = 0L
      i = 0
      while (i < JlFunctions.InDim) {
        acc += JlFunctions.signs(i * JlFunctions.OutDim + j) * q(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    val signsRef = ctx.addReferenceObj("jlSigns", JlFunctions.signs, "long[]")
    val inDim = JlFunctions.InDim
    val outDim = JlFunctions.OutDim
    nullSafeCodeGen(ctx, ev, a => {
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
        |if ($a.numElements() != $inDim)
        |  throw new IllegalArgumentException("jl_project: expected $inDim dims, got "
        |    + $a.numElements());
        |long[] $q = new long[$inDim];
        |for (int $i = 0; $i < $inDim; $i++)
        |  $q[$i] = (long) Math.floor(((double) $a.$getter($i)) * 1000.0);
        |long[] $out = new long[$outDim];
        |for (int $j = 0; $j < $outDim; $j++) {
        |  long $acc = 0L;
        |  for (int $i = 0; $i < $inDim; $i++)
        |    $acc += $signsRef[$i * $outDim + $j] * $q[$i];
        |  $out[$j] = $acc;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> × array<long> → long: Σ (a_i − b_i)² — the projected-space
  * L2² ranking kernel. Exact integer arithmetic end to end.
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sq_dist_long needs two array<bigint> args, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"sq_dist_long: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
        |if ($a.numElements() != $b.numElements())
        |  throw new IllegalArgumentException("sq_dist_long: dimension mismatch "
        |    + $a.numElements() + " vs " + $b.numElements());
        |int $n = $a.numElements();
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  long $d = $a.getLong($i) - $b.getLong($i);
        |  $acc += $d * $d;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
