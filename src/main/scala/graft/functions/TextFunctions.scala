package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for document fingerprinting (SURVEY.md §2C: near-dup
  * text dedup, document fingerprinting).
  *
  * All are single-pass per-row kernels over a token array. Token hashes
  * are engine-portable polynomial folds ([[TokenHash]]) so the DuckDB
  * oracles rebuild bit-equal signatures.
  */

/** Codegen that keeps the expression inside WholeStageCodegen by emitting a
  * direct call to the kernel's `nullSafeEval` via an object reference —
  * unlike `CodegenFallback`, the CHILD expression (typically `split(text)`)
  * is still compiled, and the surrounding operator pipeline stays fused;
  * only the O(tokens) kernel body itself runs as a JVM method call, which
  * it would anyway.
  */
trait KernelCodegen extends UnaryExpression {
  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[KernelCodegen].getName)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val boxed = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .boxedType(dataType)
    // a nullable kernel (e.g. Log2Micros on n <= 0) returns a boxed null
    // from evalKernel — unboxing it straight into the primitive slot would
    // NPE under WholeStageCodegen even though the interpreted path is fine.
    // Branch through a boxed temp and surface SQL NULL via ev.isNull.
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("kernelRes")
      val onNull =
        if (nullable) s"${ev.isNull} = true;"
        else
          s"""throw new IllegalStateException(
             |  "kernel returned null for a non-nullable expression");""".stripMargin
      s"""Object $tmp = $ref.evalKernel($c);
         |if ($tmp == null) {
         |  $onNull
         |} else {
         |  ${ev.value} = ($javaType)($boxed) $tmp;
         |}""".stripMargin
    })
  }
  /** Public bridge for generated code (nullSafeEval itself is protected). */
  final def evalKernel(input: Any): Any = nullSafeEval(input)
}

/** 64-bit-layout SimHash over an `array<string>` of tokens.
  *
  * For each token t: h = a 60-bit token hash (two independent polynomial
  * hashes over codepoints — base 31 mod 1e9+7 in bits 0-29, base 131 mod
  * 1e9+9 shifted into bits 30-59; see [[TokenHash]]); each bit of h votes
  * +1/-1 on the corresponding output bit; the sign of the tally gives the
  * final bit (tie counts as 1, fixed for determinism). Bits 60-63 of the
  * token hash are always 0, so those output bits are 0 for any non-empty
  * doc — a constant offset that cancels in every Hamming distance.
  * Documents with similar token multisets land within small Hamming
  * distance.
  *
  * The polynomial hashes (not xxhash64) are deliberate: both engines can
  * spell the identical integer arithmetic, so d04's DuckDB oracle
  * rebuilds bit-equal signatures and the query is hash-checked
  * end-to-end rather than rows-only.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = TokenHash.hash60(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Engine-portable token hashes: polynomial folds over codepoints whose
  * every step is exact int64 arithmetic both Spark and DuckDB can spell —
  * the property that lets the near-dup oracles rebuild signatures
  * bit-equal (d03/d04 hash-green). t04/d28's hash family.
  */
object TokenHash {
  /** base-31 polynomial over codepoints mod 1e9+7 — in [0, 1e9+6] < 2^30. */
  def poly31(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** base-131 polynomial over codepoints mod 1e9+9 — independent of
    * [[poly31]] (different base AND modulus).
    */
  def poly131(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131L + cp) % 1000000009L
      i += Character.charCount(cp)
    }
    acc
  }

  /** 60 usable bits: poly31 in bits 0-29, poly131 in bits 30-59. */
  def hash60(s: String): Long = poly31(s) | (poly131(s) << 30)
}

/** MinHash signature (k independent permutations) over an `array<string>` of
  * shingles: sig_j = min over shingles of ((a_j * poly31(s) + b_j) mod p),
  * p = 2^31 - 1 (the base hash [[TokenHash.poly31]] is already < p). Returns `array<long>` of length k. Banding the signature
  * (see DedupQueries) gives the standard LSH candidate generation whose
  * collision probability per band is J(A,B)^r.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val p = MinHashSignature.Prime
    val as = MinHashSignature.coeffA(k)
    val bs = MinHashSignature.coeffB(k)
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // portable polynomial base hash (already < p): both engines can
        // rebuild it, so d03's oracle re-derives identical signatures
        val h = TokenHash.poly31(arr.getUTF8String(i).toString)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    // empty shingle set -> all-MaxValue signature (never collides with real docs)
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  val Prime: Long = 2147483647L // 2^31 - 1 (Mersenne)

  /** Deterministic permutation coefficients: a odd-ish nonzero, b arbitrary,
    * both from a fixed LCG so every executor and every round agrees.
    */
  private def lcgStream(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  def coeffA(k: Int): Array[Long] =
    lcgStream(0x9E3779B97F4A7C15L).map(x => java.lang.Math.floorMod(x, Prime - 1) + 1)
      .take(k).toArray
  def coeffB(k: Int): Array[Long] =
    lcgStream(0xC2B2AE3D27D4EB4FL).map(x => java.lang.Math.floorMod(x, Prime))
      .take(k).toArray
}

/** Distinct n-word shingles from a token array, in one native pass.
  *
  * The composable form (`transform(sequence(...), i -> concat_ws(...))` +
  * `array_distinct`) runs as interpreted lambda evals per element (Spark
  * HOFs are CodegenFallback) and gets duplicated wherever the column is
  * referenced (size + explode) — measured as the dominant cost of the
  * near-dup pipeline. This expression builds the distinct shingle set in a
  * single tight loop over UTF8Strings.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string> (and n >= 1), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val sep = WordShingles.Sep
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      var ok = true
      while (j < n) {
        if (arr.isNullAt(i + j)) ok = false
        else parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      // windows containing null tokens are skipped, not silently shortened
      // (concatWs drops nulls, which would emit an (n-1)-gram into the set)
      if (ok) seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  val Sep: UTF8String = UTF8String.fromString(" ")
}

/** Distinct xxhash64 signature of a shingle array, plus the per-doc
  * collision-safety flag, in ONE native pass (d24's level-1 verify input).
  *
  * The composable form — `array_distinct(transform(shingles, x ->
  * xxhash64(x)))` + a second `array_distinct(shingles)` for the safety
  * check — runs the higher-order lambda interpreted per element (Spark
  * HOFs are CodegenFallback) and walks the array three times. This kernel
  * returns `struct(hs: array<long>, hsafe: boolean)` where `hs` is the
  * distinct-hash set (order = first occurrence; only its SIZE and set
  * content feed `array_intersect`) and `hsafe` is true iff distinct
  * hashes == distinct strings, i.e. the hash is injective ON THIS DOC and
  * the level-1 jaccard upper bound is exact. Hash = XXH64(utf8 bytes,
  * seed 42) — bit-identical to SQL `xxhash64(x)`; a null element hashes
  * to the seed, also matching the SQL function.
  */
case class HashedShingles(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("hsafe", BooleanType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val strings = new java.util.HashSet[UTF8String](m * 2)
    val hashes = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) {
        strings.add(null)
        hashes.add(42L) // xxhash64(NULL) == the seed
      } else {
        val s = arr.getUTF8String(i)
        strings.add(s)
        hashes.add(org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(s, StringType, 42L))
      }
      i += 1
    }
    val out = new Array[Long](hashes.size)
    val it = hashes.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(out), hashes.size == strings.size))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADJACENT token pairs from a token array, in one native pass — the BPE
  * pair-census kernel (t17/t50's per-round hot stage). The composable form
  * (`transform(sequence(1, size(toks) - 1), i -> struct(element_at ...))`)
  * is an interpreted higher-order lambda with TWO O(n) element_at walks
  * per position on the catalyst ArrayData; this emits the same
  * (a, b) struct list — empty tokens skipped exactly like the downstream
  * `a <> '' AND b <> ''` filter did (the char-spaced BPE encoding leaves
  * 2+ spaces at word boundaries, which split() turns into empty tokens) —
  * in a single forward walk. NOT distinct: the pair census needs
  * multiplicity.
  */
case class AdjacentPairs(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adjacent_pairs needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](math.max(m - 1, 0))
    var prev: UTF8String = null
    var i = 0
    while (i < m) {
      val cur =
        if (arr.isNullAt(i)) null
        else {
          val s = arr.getUTF8String(i)
          if (s.numBytes == 0) null else s
        }
      if (prev != null && cur != null)
        out.add(new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](prev, cur)))
      prev = cur
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunk BOUNDARIES over a string (m11's kernel): 1-based
  * codepoint positions `i` in `[w, n]` where the rolling window hash
  * `sum_{j=0..w-1} code(i-j) * 31^j` is divisible by `div`, with the final
  * position `n` always appended — exactly the boundary set of m11's HOF
  * spelling (`filter(sequence(w, n), ...)` + `array(n)`), but O(n·w) inside
  * whole-stage codegen instead of an interpreted nested-lambda walk that
  * also had to re-derive the code array per row (the sf0.1 wall was 7.3 s
  * HOF vs sub-second native). Codes are codepoints (== bytes on ASCII),
  * matching `ascii(substring(text, i, 1))`.
  */
case class CdcBoundaries(child: Expression, w: Int, div: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w >= 1 && div >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries needs a string (and w, div >= 1), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    // codepoint array — one entry per substring(text, i, 1) unit
    val codes = str.codePoints().toArray
    val n = codes.length
    val pow = new Array[Long](w)
    pow(0) = 1L
    var j = 1
    while (j < w) { pow(j) = pow(j - 1) * 31L; j += 1 }
    val out = new java.util.ArrayList[Integer]()
    var i = w // 1-based boundary candidate
    while (i <= n) {
      var h = 0L
      var k = 0
      while (k < w) { h += codes(i - 1 - k) * pow(k); k += 1 }
      if (h % div == 0) out.add(i)
      i += 1
    }
    if (out.isEmpty || out.get(out.size - 1) != n) out.add(n)
    val arr = new Array[Any](out.size)
    var m = 0
    while (m < out.size) { arr(m) = out.get(m).intValue(); m += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaro-Winkler string similarity as a native binary expression — the
  * fuzzy-match kernel record linkage runs on name fields (d26). Standard
  * formulation (Winkler '90): Jaro similarity from the half-window match
  * count m and transposition count, then prefix boost
  * `jaro + l * 0.1 * (1 - jaro)` for the common prefix l <= 4, applied
  * only when jaro > 0.7 (the boost threshold DuckDB's
  * `jaro_winkler_similarity` applies — verified empirically, which is what
  * makes the d26 oracle a genuine INDEPENDENT-implementation cross-check
  * of this kernel). Codegen mirrors [[KernelCodegen]]: the child
  * expressions stay compiled and fused; only the O(|a|·window) kernel body
  * runs as a method call.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  /** Public bridge for generated code. */
  final def evalKernel(a: Any, b: Any): Any = nullSafeEval(a, b)

  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("jwKernel", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (c1, c2) =>
      s"${ev.value} = (java.lang.Double) $ref.evalKernel($c1, $c2);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** The scalar kernel; FunctionsSpec pins its micro-rounded outputs
    * against DuckDB-sourced reference values.
    */
  def score(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var matched = false
      while (j <= hi && !matched) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var x = 0 // mismatched aligned positions; transpositions = x / 2
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) x += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transpositions = floor(x / 2): DuckDB (and jellyfish) floor the
    // half-count; the fractional variant diverges on odd mismatch counts
    val t = (x / 2).toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken
  * SIGMOD'03) as one native kernel — the whole per-document pipeline of
  * d28 (stride-1 char k-gram polynomial hashes → min per w-hash window
  * with leftmost tie-break → distinct selected hashes in first-occurrence
  * order) in a single O(n·k + n·w) pass. Bit-identical to the HOF
  * spelling (transform/aggregate/slice/array_min over the hash·2^33+pos
  * encoding — kept as the parity oracle in FunctionsSpec), which runs
  * interpreted per element; this runs as one compiled method call with
  * the surrounding expressions still fused ([[KernelCodegen]]).
  * Hash: base-31 polynomial over codepoints mod 1e9+7 (t04's).
  *
  * Encoding bounds: hash < 2^30 (mod 1e9+7) rides the top bits, the
  * 1-based gram position the low 33 (enc = h·2^33 + pos < 2^63), so
  * documents up to 2^33 k-grams (~8G chars) keep hash and position
  * disjoint — the >= w+k-1 shared-substring guarantee holds at any
  * realistic document length.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs a string (and k, w >= 1), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = codes.length
    val g = n - (k - 1) // number of k-grams
    if (g < w) return new GenericArrayData(Array.empty[Any])
    val p = 1000000007L
    // encoded(i) = hash of gram at 1-based pos i+1, shifted to carry pos
    val enc = new Array[Long](g)
    var i = 0
    while (i < g) {
      var h = 0L
      var o = 0
      while (o < k) { h = (h * 31L + codes(i + o)) % p; o += 1 }
      enc(i) = h * 8589934592L + (i + 1)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= g - w) {
      var m = enc(j)
      var t = 1
      while (t < w) { if (enc(j + t) < m) m = enc(j + t); t += 1 }
      seen.add(m / 8589934592L)
      j += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-point base-2 logarithm in MICROS: floor(log2(n) * 1e6), computed
  * digit-by-digit with pure 64-bit integer arithmetic — NO libm call — so
  * Spark and the DuckDB oracle (a 30-step recursive CTE spelling the same
  * loop) produce the IDENTICAL integer on every engine and platform.
  *
  * This exists because of the round-7 `t41_heaps_fit` driver-gate red:
  * `round(ln(n), 9)` evaluated by two different libms can land on opposite
  * sides of a 9-decimal rounding boundary (a 1-ulp ln() difference is
  * enough), and the repo's 9dp-round-then-DECIMAL-sum discipline contains
  * summation-order drift but not boundary-adjacent transcendentals. A
  * least-squares fit on integer logs has no such boundary: every
  * downstream sum is exact int64 and the final double division/rounding
  * of identical integers is IEEE-deterministic.
  *
  * Algorithm (classic binary-digit log): e = floor(log2 n) from the bit
  * length; mantissa m = n scaled into [2^30, 2^31); 30 iterations of
  * m := m^2 >> 30, emitting a 1-bit and halving whenever m crosses 2^31
  * (m^2 < 2^62 — never overflows); result = (e·2^30 + acc)·1e6 div 2^30.
  * Max error < 2^-30 in log2, i.e. < 1 micro. Null for n <= 0.
  */
/** Scalar [[TokenHash.hash60]] over a string column — the int64 shuffle
  * key the near-dup family joins on instead of the shingle STRING (round
  * 10, verdict item 2: d32/d17's gram joins moved from 40-120-byte string
  * keys to this 8-byte key; the DuckDB twins rebuild the identical value
  * from the same two polynomial folds, so a 60-bit collision — were one
  * ever to occur — is mirrored on both engines and the hash gate stays
  * exact). Collision risk at 100 TB: ~2^-60 per pair of distinct grams,
  * and a collision only ever ADDS a candidate the exact verify stage
  * re-scores.
  */
case class Hash60(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash60 needs a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenHash.hash60(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Engine-portable base-31 polynomial token hash ([[TokenHash.poly31]]) as
  * a native expression. The SQL spelling —
  * `aggregate(transform(sequence(1, length(w)), ci -> ascii(substring(w,
  * ci, 1))), 0L, (acc, ch) -> (acc * 31 + ch) % 1000000007)` — is TWO
  * nested interpreted lambdas with an O(n) substring per position
  * (quadratic per token), and it sits in the scan stage of every
  * featurizer that uses it. DuckDB oracles keep the unrolled spelling;
  * values are bit-equal (both iterate codepoints).
  */
case class Poly31(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly31 needs a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenHash.poly31(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Log2Micros(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"log2_micros needs an integral column, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val n = input match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    if (n <= 0L) null else Log2Micros.log2Micros(n)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Log2Micros {
  /** Shared kernel, also used by driver-side fits that must agree with
    * the column form (e.g. planted-spec oracles in tests).
    */
  def log2Micros(n: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var m = if (e >= 30) n >> (e - 30) else n << (30 - e)
    var acc = 0L
    var i = 0
    while (i < 30) {
      m = (m * m) >> 30
      if (m >= 2147483648L) { acc = acc * 2 + 1; m >>= 1 }
      else acc = acc * 2
      i += 1
    }
    (e.toLong * 1073741824L + acc) * 1000000L / 1073741824L
  }
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def log2_micros(n: Column): Column =
    column(Log2Micros(expression(n)))

  def hash60(s: Column): Column =
    column(Hash60(expression(s)))

  def poly31(s: Column): Column =
    column(Poly31(expression(s)))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def word_shingles(tokens: Column, n: Int = 3): Column =
    column(WordShingles(expression(tokens), n))

  def hashed_shingles(shingles: Column): Column =
    column(HashedShingles(expression(shingles)))

  def adjacent_pairs(tokens: Column): Column =
    column(AdjacentPairs(expression(tokens)))

  def minhash_signature(shingles: Column, k: Int = 16): Column =
    column(MinHashSignature(expression(shingles), k))

  def cdc_boundaries(text: Column, w: Int = 8, div: Int = 64): Column =
    column(CdcBoundaries(expression(text), w, div))

  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))

  def winnow_fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    column(WinnowFingerprints(expression(text), k, w))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "hash60", exprs => { graft.GraftExtensions.arity("hash60", 1, exprs); Hash60(exprs.head) }, "built-in")
    reg.createOrReplaceTempFunction(
      "poly31", exprs => { graft.GraftExtensions.arity("poly31", 1, exprs); Poly31(exprs.head) }, "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => { graft.GraftExtensions.arity("simhash64", 1, exprs); SimHash64(exprs.head) }, "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_signature", exprs => { graft.GraftExtensions.arity("minhash_signature", 1, exprs); MinHashSignature(exprs.head, 16) }, "built-in")
    reg.createOrReplaceTempFunction(
      "word_shingles", exprs => { graft.GraftExtensions.arity("word_shingles", 1, exprs); WordShingles(exprs.head, 3) }, "built-in")
    reg.createOrReplaceTempFunction(
      "cdc_boundaries", exprs => { graft.GraftExtensions.arity("cdc_boundaries", 1, exprs); CdcBoundaries(exprs.head, 8, 64) }, "built-in")
    reg.createOrReplaceTempFunction(
      "jaro_winkler", exprs => { graft.GraftExtensions.arity("jaro_winkler", 2, exprs); JaroWinkler(exprs(0), exprs(1)) }, "built-in")
    reg.createOrReplaceTempFunction(
      "winnow_fingerprints", exprs => { graft.GraftExtensions.arity("winnow_fingerprints", 1, exprs); WinnowFingerprints(exprs.head, 8, 4) }, "built-in")
  }
}
