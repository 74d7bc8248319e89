package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CdcBoundaries, JaroWinkler, MinHashSignature,
  WinnowFingerprints, WordShingles}

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
