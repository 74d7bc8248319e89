package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AdjacentPairs, CdcBoundaries, HashedShingles,
  JaroWinkler, MinHashSignature, Poly31, WinnowFingerprints, WordShingles}

/** Generative properties of the native text kernels — the algebraic
  * guarantees each scaladoc advertises, checked on randomized inputs via
  * direct expression eval (no Spark jobs, so hundreds of samples are
  * cheap). Example-based specs pin known values; these pin the CONTRACTS:
  * winnowing's shared-substring detection, minhash's union-min algebra,
  * CDC's content-defined boundary locality, shingling against a reference
  * reimplementation, Jaro-Winkler's metric axioms.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def str(s: String) = Literal(UTF8String.fromString(s), StringType)
  private def strArr(xs: Seq[String]) =
    Literal.create(xs, ArrayType(StringType))
  private def params = Parameters.default.withMinSuccessfulTests(200)

  private val word: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  test("winnowing: any >= w+k-1 shared substring yields a common fingerprint") {
    // registered variant: k=8, w=4 -> guarantee kicks in at 11 shared chars
    def fps(s: String): Set[Long] =
      WinnowFingerprints(str(s), 8, 4).eval(null)
        .asInstanceOf[ArrayData].toLongArray().toSet
    val gen = for {
      pre1 <- Gen.listOfN(20, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      pre2 <- Gen.listOfN(20, Gen.oneOf('x', 'y', 'z')).map(_.mkString)
      sharedLen <- Gen.choose(11, 25)
      shared <- Gen.listOfN(sharedLen, Gen.oneOf('p', 'q', 'r')).map(_.mkString)
      post1 <- Gen.listOfN(20, Gen.oneOf('d', 'e', 'f')).map(_.mkString)
      post2 <- Gen.listOfN(20, Gen.oneOf('u', 'v', 'w')).map(_.mkString)
    } yield (pre1 + shared + post1, pre2 + shared + post2)
    val r = check(params, Prop.forAll(gen) { case (a, b) =>
      (fps(a) intersect fps(b)).nonEmpty
    })
    assert(r.passed, s"winnowing guarantee violated: $r")
  }

  test("minhash: sig(A ++ B) is the elementwise min of sig(A) and sig(B)") {
    def sig(xs: Seq[String]): Seq[Long] =
      MinHashSignature(strArr(xs), 16).eval(null)
        .asInstanceOf[ArrayData].toLongArray().toSeq
    val gen = for {
      a <- Gen.nonEmptyListOf(word)
      b <- Gen.nonEmptyListOf(word)
    } yield (a, b)
    val r = check(params, Prop.forAll(gen) { case (a, b) =>
      sig(a ++ b) == sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    })
    assert(r.passed, s"minhash union-min algebra violated: $r")
  }

  test("cdc: boundaries are content-defined — a prefix never moves interior cuts") {
    // a boundary at i >= w depends only on the w trailing chars, so the
    // interior boundary set of p+t in t's region equals t's, shifted —
    // the locality that makes CDC dedup survive insertions (m11/m12)
    val (w, div) = (8, 16)
    def bounds(s: String): Set[Int] =
      CdcBoundaries(str(s), w, div).eval(null)
        .asInstanceOf[ArrayData].toIntArray().toSet
    val gen = for {
      t <- Gen.listOfN(80, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
      p <- Gen.choose(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))).map(_.mkString)
    } yield (t, p)
    val r = check(params, Prop.forAll(gen) { case (t, p) =>
      val n = t.length
      // compare natural interior boundaries only (the kernel force-appends
      // the final position, which is not content-defined)
      val interior = bounds(t).filter(i => i >= w && i <= n - 1)
      val shifted = bounds(p + t)
        .filter(b => b >= p.length + w && b <= p.length + n - 1)
        .map(_ - p.length)
      interior == shifted
    })
    assert(r.passed, s"CDC boundary locality violated: $r")
  }

  test("word_shingles: distinct n-grams in first-occurrence order (reference impl)") {
    def shingles(xs: Seq[String], n: Int): Seq[String] =
      WordShingles(strArr(xs), n).eval(null).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
    val gen = for {
      n <- Gen.choose(1, 4)
      xs <- Gen.listOf(word)
    } yield (xs, n)
    val r = check(params, Prop.forAll(gen) { case (xs, n) =>
      val ref =
        if (xs.length < n) Seq.empty[String]
        else xs.sliding(n).map(_.mkString(" ")).toSeq.distinct
      shingles(xs, n) == ref
    })
    assert(r.passed, s"word_shingles diverged from the reference: $r")
  }

  test("hashed_shingles: matches the composable xxhash64 formulation") {
    // reference = the SQL spelling it replaced in d24:
    // hs = array_distinct(transform(shingles, x -> xxhash64(x))),
    // hsafe = size(hs) == size(array_distinct(shingles))
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    def kernel(xs: Seq[String]): (Seq[Long], Boolean) = {
      val row = HashedShingles(strArr(xs)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (row.getArray(0).toLongArray().toSeq, row.getBoolean(1))
    }
    // duplicate-heavy inputs: draw from a tiny vocabulary so repeated
    // shingles (and hence the distinct paths) are actually exercised
    val gen = Gen.listOf(Gen.oneOf("a", "b", "ab", "ba", "abc", "x"))
    val r = check(params, Prop.forAll(gen) { xs =>
      val hashes = xs.map(x =>
        XxHash64Function.hash(UTF8String.fromString(x), StringType, 42L))
      val refHs = hashes.distinct
      val refSafe = refHs.length == xs.distinct.length
      kernel(xs) == ((refHs, refSafe))
    })
    assert(r.passed, s"hashed_shingles diverged from the reference: $r")
  }

  test("poly31: matches the per-codepoint fold the SQL spelling unrolls") {
    def kernel(w: String): Long = Poly31(str(w)).eval(null).asInstanceOf[Long]
    val gen = Gen.listOf(Gen.frequency(
      9 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', 'ß', '中'))).map(_.mkString)
    val r = check(params, Prop.forAll(gen) { w =>
      // the reference the oracle keeps: fold (acc*31 + codepoint) % 1e9+7
      // over the string's codepoints, starting from 0
      var acc = 0L
      w.codePoints().forEach(cp => acc = (acc * 31 + cp) % 1000000007L)
      kernel(w) == acc
    })
    assert(r.passed, s"poly31 diverged from the reference fold: $r")
  }

  test("adjacent_pairs: matches the transform(sequence) + non-empty filter") {
    def kernel(xs: Seq[String]): Seq[(String, String)] = {
      val arr = AdjacentPairs(strArr(xs)).eval(null).asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      }
    }
    // include empty tokens (the BPE word-boundary artifact) so the
    // both-non-empty filter parity is exercised, multiplicity preserved
    val gen = Gen.listOf(Gen.oneOf("", "a", "b", "er", "m", ""))
    val r = check(params, Prop.forAll(gen) { xs =>
      val ref =
        if (xs.length < 2) Seq.empty
        else xs.sliding(2).collect {
          case Seq(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        }.toSeq
      kernel(xs) == ref
    })
    assert(r.passed, s"adjacent_pairs diverged from the reference: $r")
  }

  test("simhash: permutation-invariant (bit votes sum, order never matters)") {
    import graft.functions.SimHash64
    def sh(xs: Seq[String]): Long =
      SimHash64(strArr(xs)).eval(null).asInstanceOf[Long]
    val gen = for {
      xs <- Gen.nonEmptyListOf(word)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (xs, new scala.util.Random(seed).shuffle(xs))
    val r = check(params, Prop.forAll(gen) { case (xs, shuffled) =>
      sh(xs) == sh(shuffled)
    })
    assert(r.passed, s"simhash order-dependence detected: $r")
  }

  test("jaro-winkler: symmetric, bounded, and exactly 1 on identical strings") {
    def jw(a: String, b: String): Double =
      JaroWinkler(str(a), str(b)).eval(null).asInstanceOf[Double]
    val gen = for { a <- word; b <- word } yield (a, b)
    val r = check(params, Prop.forAll(gen) { case (a, b) =>
      val s = jw(a, b)
      s >= 0.0 && s <= 1.0 && s == jw(b, a) && jw(a, a) == 1.0
    })
    assert(r.passed, s"jaro-winkler axioms violated: $r")
  }
}
