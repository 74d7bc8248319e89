package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst expression for cosine similarity over embedding columns
  * (`ArrayType(FloatType|DoubleType)`).
  *
  * Why an `Expression` and not a UDF (SURVEY.md §2C): this sits in the inner
  * loop of similarity search / near-dup scans — at 100 TB it runs per
  * candidate pair. `doGenCode` emits a tight primitive loop that stays inside
  * WholeStageCodegen (no boxing, no Row conversion, no serde), which a Scala
  * UDF cannot.
  *
  * Numerics: elements are widened to double and accumulated sequentially in
  * index order — bit-identical to the DuckDB oracle formulation
  * `list_sum(list_transform(list_zip(a::DOUBLE[], b::DOUBLE[]), x -> x[1]*x[2]))`,
  * so correctness checks need no rounding tolerance at all.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) && lt == rt =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs two array<float> or two array<double> args, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // error, don't truncate: a 64-vs-32-dim pair would otherwise yield a
    // plausible-looking but wrong similarity
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_similarity: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
    } else {
      while (i < n) {
        val xv = x.getDouble(i); val yv = y.getDouble(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
        |if ($a.numElements() != $b.numElements())
        |  throw new IllegalArgumentException("cosine_similarity: dimension mismatch "
        |    + $a.numElements() + " vs " + $b.numElements());
        |int $n = $a.numElements();
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xv = (double) $a.$getter($i);
        |  double $yv = (double) $b.$getter($i);
        |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        |}
        |double $denom = Math.sqrt($na) * Math.sqrt($nb);
        |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product twin of [[CosineSimilarity]] (same accumulation contract). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) && lt == rt =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product needs two array<float> or two array<double> args")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
        |if ($a.numElements() != $b.numElements())
        |  throw new IllegalArgumentException("dot_product: dimension mismatch "
        |    + $a.numElements() + " vs " + $b.numElements());
        |int $n = $a.numElements();
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += (double) $a.$getter($i) * (double) $b.$getter($i);
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ColBERT-style late-interaction MaxSim kernel: both arrays are viewed as
  * `n/sub` contiguous token sub-vectors of `sub` dims and the score is
  * {{{sum_i max_j <x_i, y_j>}}} — every query token matched to its best
  * document token. One native triple loop, zero allocations, inside
  * WholeStageCodegen; the HOF spelling (slice/zip_with/aggregate/array_max)
  * computes the identical value but materializes 2*(n/sub)^2 sub-arrays per
  * pair. Accumulation contract matches [[CosineSimilarity]]: widen to
  * double, inner dot sequential in index order, outer sum sequential in i
  * order, max order-independent — bit-identical to the DuckDB
  * generate_series/list_slice oracle formulation.
  */
case class MaxSimScore(left: Expression, right: Expression, sub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) && lt == rt && sub > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"maxsim_score needs two array<float> or two array<double> args and sub > 0")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() || x.numElements() % sub != 0)
      throw new IllegalArgumentException(
        s"maxsim_score: need equal lengths divisible by $sub, " +
          s"got ${x.numElements()} vs ${y.numElements()}")
    val nTok = x.numElements() / sub
    def el(v: ArrayData, i: Int): Double =
      if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
    var score = 0.0
    var i = 0
    while (i < nTok) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < nTok) {
        var dot = 0.0
        var k = 0
        while (k < sub) { dot += el(x, i * sub + k) * el(y, j * sub + k); k += 1 }
        if (dot > best) best = dot
        j += 1
      }
      score += best
      i += 1
    }
    score
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nTok = ctx.freshName("nTok")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
        |if ($a.numElements() != $b.numElements() || $a.numElements() % $sub != 0)
        |  throw new IllegalArgumentException("maxsim_score: need equal lengths "
        |    + "divisible by $sub, got " + $a.numElements() + " vs " + $b.numElements());
        |int $nTok = $a.numElements() / $sub;
        |double $score = 0.0;
        |for (int $i = 0; $i < $nTok; $i++) {
        |  double $best = Double.NEGATIVE_INFINITY;
        |  for (int $j = 0; $j < $nTok; $j++) {
        |    double $dot = 0.0;
        |    for (int $k = 0; $k < $sub; $k++) {
        |      $dot += (double) $a.$getter($i * $sub + $k)
        |            * (double) $b.$getter($j * $sub + $k);
        |    }
        |    if ($dot > $best) $best = $dot;
        |  }
        |  $score += $best;
        |}
        |${ev.value} = $score;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<float|double>(64) → array<long>(2): the two 32-bit halves of the
  * 64-bit SIGN signature behind binary quantization (s24/s27) — bit i of
  * half h set iff dim h·32+i is positive. Summing distinct powers of two
  * is exact bit-OR and each half stays below 2^32, matching the DuckDB
  * twin's shift arithmetic exactly. A native kernel (not the HOF
  * spelling) so the signature pass rides WholeStageCodegen in the corpus
  * scan; FunctionsSpec pins bit-identity against the interpreted
  * aggregate() formulation.
  */
case class SignBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bits needs array<float> or array<double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != 64)
      throw new IllegalArgumentException(
        s"sign_bits: expected 64 dims, got ${x.numElements()}")
    val out = new Array[Long](2)
    var h = 0
    while (h < 2) {
      var acc = 0L
      var i = 0
      while (i < 32) {
        val v = if (isFloat) x.getFloat(h * 32 + i).toDouble
                else x.getDouble(h * 32 + i)
        if (v > 0d) acc += (1L << i)
        i += 1
      }
      out(h) = acc
      h += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        |if ($a.numElements() != 64)
        |  throw new IllegalArgumentException("sign_bits: expected 64 dims, got "
        |    + $a.numElements());
        |long[] $out = new long[2];
        |for (int $h = 0; $h < 2; $h++) {
        |  long $acc = 0L;
        |  for (int $i = 0; $i < 32; $i++) {
        |    if (((double) $a.$getter($h * 32 + $i)) > 0.0) $acc += (1L << $i);
        |  }
        |  $out[$h] = $acc;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  // Spark 4 unified-Column API: Expression <-> Column bridging lives in the
  // (private[sql]) classic module; reached via our graftbridge subpackage.
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column-API entry points. */
  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def maxsim_score(a: Column, b: Column, sub: Int = 8): Column =
    column(MaxSimScore(expression(a), expression(b), sub))
  def sign_bits(v: Column): Column = column(SignBits(expression(v)))

  /** SQL registration so `spark.sql("SELECT cosine_similarity(...)")` works
    * — the reference's users wrote raw SQL, so engine extensions must be
    * reachable from SQL text too.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_similarity", exprs => { graft.GraftExtensions.arity("cosine_similarity", 2, exprs); CosineSimilarity(exprs(0), exprs(1)) }, "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => { graft.GraftExtensions.arity("dot_product", 2, exprs); DotProduct(exprs(0), exprs(1)) }, "built-in")
    reg.createOrReplaceTempFunction(
      "maxsim_score", exprs => {
        graft.GraftExtensions.arity("maxsim_score", 2, exprs)
        MaxSimScore(exprs(0), exprs(1), 8)
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "sign_bits", exprs => { graft.GraftExtensions.arity("sign_bits", 1, exprs); SignBits(exprs.head) }, "built-in")
  }
}
