package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column, DataFrame-native — the IVF
  * coarse-quantizer trainer — in EXACT fixed-point integer arithmetic.
  *
  * Every element quantizes once to 1e-6 fixed-point longs (the proven
  * s04/s07 playbook: `round(x * 1e6)` agrees across engines), assignment
  * is the argmin of exact int64 squared-L2 distances, and the centroid
  * update is a per-(cluster, dim) LONG sum + floor division. Nothing in
  * training ever touches a float, so:
  *
  *  - iteration results are ORDER-INDEPENDENT (integer sums commute —
  *    double partial sums merged in shuffle-fetch order do not), which
  *    upgrades round 3's "single-JVM stable, multi-node last-bit caveat"
  *    to a bit-replay guarantee on any cluster topology, and
  *  - the DuckDB oracle can REBUILD the full training inline (3 unrolled
  *    iterations of the same integer loop) and hash-match — this is what
  *    moved the s06/s09/s10/s12/s17/s18/s30 family from rows-only to
  *    hash-green in round 8.
  *
  * Spark shapes per iteration: the k centroids live on the DRIVER (k
  * integer vectors, tiny) and enter the plan as literals — nearest-
  * centroid is a pure per-row argmin projection inside the scan stage
  * (zero shuffle, zero row replication; PlanInvariantsSpec pins no
  * Exchange); the only exchange per iteration is the k×dim-row partial
  * sum aggregate (map-side combine, ≤ 512 rows to the driver).
  *
  * Metric note: the coarse quantizer uses squared L2 (Lloyd's native
  * objective — the update step is only optimal for L2); the SEARCH
  * ranking on top of the cells stays cosine, as in any IVF deployment.
  *
  * Magnitudes: |elem| ≤ ~10 → |qv| ≤ 1e7; per-dim diff² ≤ 4e14, ×64 dims
  * < 2.6e16 — int64-exact at any k. The update sum is exact to 1e9 rows
  * per (cluster, dim) × 1e7 magnitude < 2^63.
  *
  * Empty clusters keep their previous centroid (k rows always come back).
  * Determinism: init = the vectors with the k smallest ids (no RNG); ties
  * in assignment break to the LOWEST cluster id (strict-< fold keeps the
  * first min); a null vector assigns to cluster 0.
  */
object KMeans {
  /** Fixed-point scale shared with the DuckDB oracles. */
  val Scale = 1000000L

  /** Scalar quantization kernel: EXACTLY Spark's `round(x * 1e6, 0)` on a
    * double (BigDecimal.valueOf + HALF_UP — Round's own arithmetic), then
    * the exact integral-to-long cast. Shared by every kernel below so the
    * compiled path can never drift from the Column/oracle semantics.
    */
  def quantizeElem(v: Double): Long = {
    // Spark's Round passes NaN/Inf through as doubles; this kernel's output
    // is int64, so there is no "through" — fail loudly rather than let
    // BigDecimal.valueOf throw an opaque NumberFormatException (NaN) or
    // longValue() silently wrap (|v| > ~9.2e12). Dense embeddings are
    // |elem| ≤ ~10, so a non-finite or astronomic element is corrupt data.
    // guard the PRODUCT too: v can be finite while v * 1e6 overflows to
    // Infinity (|v| > ~1.8e302), which would resurface the opaque
    // NumberFormatException this guard exists to prevent
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v) ||
        java.lang.Double.isInfinite(v * Scale))
      throw new IllegalArgumentException(
        s"fixed-point quantizer: non-finite embedding element $v " +
          "(NaN/Infinity cannot be 1e-6 fixed-point quantized)")
    try
      java.math.BigDecimal.valueOf(v * Scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"fixed-point quantizer: |$v| * 1e6 overflows int64")
    }
  }

  /** Element-wise 1e-6 fixed-point quantization: array<float|double> →
    * array<bigint>, as a compiled kernel (the HOF spelling —
    * transform + round + cast — runs interpreted per element and showed
    * up as the PQ encode bottleneck at sf0.1). DuckDB twin:
    * `list_transform(v::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT))`.
    */
  def quantize(vec: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(QuantizeVec(expression(vec)))
  }

  /** Returns (cluster: int, centroid: array<double>) — always k rows;
    * `centroid` is the exact integer centroid divided by 1e6 (recoverable:
    * [[assign]] re-quantizes losslessly since |qc| ≤ 2e7 ≪ 2^52/1e6).
    */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int = 3): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // materialize the (id, qv) training projection once — every Lloyd
    // iteration re-reads these blocks instead of re-scanning the source.
    // (At 100 TB you'd also train the coarse quantizer on a SAMPLE of the
    // corpus — quantizer quality saturates long before full-corpus size —
    // and only the final assign pass would touch every vector.)
    val training = vectors
      .select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .localCheckpoint()
    // distributed top-k by id, then k rows to the driver (k is tiny)
    var centroids: Seq[(Int, Seq[Long])] = training
      .orderBy(col(idCol)).limit(k)
      .select(col("__qv"))
      .collect().toSeq.zipWithIndex
      .map { case (r: Row, i) => (i, r.getSeq[Long](0)) }
    var i = 0
    while (i < iterations) {
      // one pass: argmin projection + (k·dim)-row partial-sum aggregate,
      // then ≤ 512 exact integer rows back to the driver
      val sums = assignQ(training, centroids, "__qv")
        .select(col("cluster"), posexplode(col("__qv")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      // JVM long division truncates toward zero — the SAME semantics as
      // DuckDB's integer `//` AND Spark SQL `div` (measured: -7//2 = -3 in
      // DuckDB; its `//` only floors on DOUBLE operands), so the oracle's
      // `s // n` replays this exactly on negative sums
      centroids = centroids.map { case (c, old) =>
        byCluster.get(c).fold((c, old)) { rows =>
          val arr = old.toArray
          rows.foreach(r => arr(r.getInt(1)) = r.getLong(2) / r.getLong(3))
          (c, arr.toSeq)
        }
      }
      i += 1
    }
    centroids
      .map { case (c, qc) => (c, qc.map(_.toDouble / Scale)) }
      .toDF("cluster", "centroid")
  }

  /** Nearest-centroid assignment: adds a `cluster` column. Zero shuffle —
    * `centroids` (k rows) is collected to the driver and becomes literal
    * integer vectors in a per-row argmin projection.
    */
  def assign(vectors: DataFrame, centroids: DataFrame, vecCol: String): DataFrame = {
    val cents = centroids
      .select(col("cluster").cast("int"),
        quantize(col("centroid")).as("qc"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    vectors.withColumn("__qv", quantize(col(vecCol)))
      .transform(assignQ(_, cents, "__qv"))
      .drop("__qv")
  }

  /** 0-based index of the nearest (min squared-L2, exact int64) centroid
    * for the QUANTIZED `qvec` — THE quantizer assignment primitive, shared
    * by Lloyd training, corpus assignment and the PQ encoder (s09) so
    * tie-break and null semantics can never diverge between training and
    * encoding. First-min tie-break = lowest index; a null vector falls
    * back to index 0. Compiled kernel ([[NearestQIdx]]) — the HOF argmin
    * fold ran interpreted, k×dim nodes per row.
    */
  private[graft] def nearestQIdx(qvec: Column, qcents: Seq[Seq[Long]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    coalesce(column(NearestQIdx(expression(qvec), qcents)), lit(0))
  }

  /** The argmin projection itself over a pre-quantized column. `cents`
    * must be sorted by cluster id so the first-min tie-break resolves to
    * the lowest id; `cluster` is never null (see [[nearestQIdx]]), so
    * fit's collect never sees a null group.
    */
  private def assignQ(vectors: DataFrame, cents: Seq[(Int, Seq[Long])],
                      qvCol: String): DataFrame = {
    val ids = typedLit(cents.map(_._1))
    vectors.withColumn("cluster",
      element_at(ids, nearestQIdx(col(qvCol), cents.map(_._2)) + 1))
  }
}

/** Compiled quantization kernel: array<float|double> → array<bigint> of
  * floor-free EXACT `round(x*1e6)` values ([[KMeans.quantizeElem]] — the
  * same BigDecimal HALF_UP arithmetic Spark's own `Round` uses, so the
  * kernel can never drift from the Column/oracle semantics the green
  * s04/s07 pairing established). Null elements are not expected (the
  * embeddings tables are dense); a null ARRAY returns null and callers
  * coalesce.
  */
case class QuantizeVec(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with KernelCodegen {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec needs array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // output declares containsNull=false: a null SLOT (sparse/corrupt
      // embedding) must fail loudly, not quantize as 0.0 via getDouble
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"quantize_vec: null element at index $i — dense embeddings only")
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = KMeans.quantizeElem(v)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
}

/** Compiled integer argmin kernel: 0-based index of the centroid with the
  * smallest exact int64 squared-L2 distance to the quantized input vector;
  * strict < keeps the FIRST min (lowest index) on ties — identical to the
  * HOF fold it replaces and to the oracle's (d2, cluster) rank. The
  * centroid matrix rides the expression as a literal (k×dim longs — tiny)
  * and distances never overflow (|q| ≤ 2e7 → diff² ≤ 1.6e15 × 64 dims).
  */
case class NearestQIdx(child: org.apache.spark.sql.catalyst.expressions.Expression,
    cents: Seq[Seq[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with KernelCodegen {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if cents.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_q_idx needs array<bigint> (and >=1 centroid), got ${other.catalogString}")
  }

  @transient private lazy val cs: Array[Array[Long]] = cents.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData].toLongArray()
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cs.length) {
      val cent = cs(c)
      var d = 0L
      var i = 0
      val n = math.min(q.length, cent.length)
      while (i < n) { val t = q(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
}

/** Compiled PQ encoder: raw embedding → the 8 subspace codes in ONE kernel
  * call (quantize 64 elements + 8×16 argmins over 8-dim slices — trivial
  * compiled work; the previous spelling evaluated 128 interpreted HOF
  * folds per row and dominated the sf0.1 encode pass). Arithmetic is
  * [[KMeans.quantizeElem]] + [[NearestQIdx]]'s loop verbatim, so codes are
  * bit-identical to the slice-by-slice Column spelling and the oracle.
  */
case class PqEncode(child: org.apache.spark.sql.catalyst.expressions.Expression,
    books: Seq[Seq[Seq[Long]]], dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with KernelCodegen {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if books.nonEmpty && dsub >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val bs: Array[Array[Array[Long]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"pq_encode: null element at index $i — dense embeddings only")
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = KMeans.quantizeElem(v)
      i += 1
    }
    val codes = new Array[Any](bs.length)
    var m = 0
    while (m < bs.length) {
      val off = m * dsub
      val book = bs(m)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0L
        var j = 0
        val lim = math.min(dsub, math.min(cent.length, math.max(n - off, 0)))
        while (j < lim) { val t = q(off + j) - cent(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
}
