package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the d05 hot-shingle guard: one ultra-common shingle must not make
  * the inverted-index self-join quadratic (df docs sharing a shingle meet
  * as df^2/2 pairs in a single reducer — no cluster size fixes that).
  */
class DedupScaleSpec extends SparkTestBase {

  // 120 docs, ALL sharing the hot leading trigram; every other shingle is
  // unique to its doc, so any surviving pair owes its existence to a
  // hot-or-boundary shingle
  private def skewedCorpus = {
    import spark.implicits._
    (0 until 120).map { i =>
      (i.toLong, "en", "web", s"the quick fox u${i}a u${i}b u${i}c u${i}d")
    }.toDF("doc_id", "lang", "source", "text")
  }

  test("df cap bounds the pair-join output on a hot-shingle corpus") {
    val capped = DedupQueries.ngramJaccardPairs(skewedCorpus, dfCap = 8).count()
    val uncapped = DedupQueries.ngramJaccardPairs(skewedCorpus, dfCap = 1000000).count()
    // without the cap every one of the 120C2 pairs materializes through the
    // hot key; with it the join only ever sees per-doc-unique shingles
    assert(uncapped == 120L * 119 / 2, s"uncapped=$uncapped")
    assert(capped == 0, s"capped=$capped — hot shingle leaked through the join")
  }

  test("capped jaccard under-counts but never invents pairs") {
    import spark.implicits._
    // two genuine near-dups (7 of 8 shingles shared) + 50 boilerplate docs
    // sharing a hot trigram; the cap must keep the true pair, drop the rest
    val docs = (
      Seq((1000L, "en", "web", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          (1001L, "en", "web", "alpha beta gamma delta epsilon zeta eta theta iota lambda")) ++
      (0 until 50).map(i => (i.toLong, "en", "web", s"terms of service v$i x$i y$i z$i"))
    ).toDF("doc_id", "lang", "source", "text")
    val pairs = DedupQueries.ngramJaccardPairs(docs, dfCap = 8)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1000L, 1001L)), pairs.mkString(", "))
  }

  test("star contraction converges on a path deeper than any propagation cap") {
    import spark.implicits._
    // a 200-edge path graph has diameter 200: min-label propagation (d10)
    // moves the min ONE hop per round and would need 200 rounds; star
    // contraction must collapse it within its 12-round O(log n) budget —
    // plus a ring (cycle) and a binary tree to cover non-path topologies
    val path = (0 until 200).map(i => (i.toLong, i + 1L))
    val ring = (300 until 340).map(i => (i.toLong, i + 1L)) :+ (340L, 300L)
    val tree = (2 to 63).map(i => (1000L + i, 1000L + i / 2))
    val pairs = (path ++ ring ++ tree).toDF("doc_a", "doc_b")
    // capOverride pins the O(log n) typical-case round count (the derived
    // production cap is the looser O(log^2 n) worst-case bound)
    val got = DedupQueries.starContract(pairs, capOverride = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wantMap =
      ((0 to 200).map(_.toLong -> 0L) ++
        (300 to 340).map(_.toLong -> 300L) ++
        (1001 to 1063).map(_.toLong -> 1001L)).toMap
    assert(got == wantMap,
      (got.toSet diff wantMap.toSet).take(5).toString + " / " +
        (wantMap.toSet diff got.toSet).take(5).toString)
  }

  test("passage dedup APPLY removes exactly the cross-doc-shared spans") {
    import spark.implicits._
    // docs 1 and 2 share an identical 13-token passage with distinct
    // prefixes/suffixes; doc 3 shares nothing 13 tokens long
    val passage = (1 to 13).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"aa bb $passage cc"),
      (2L, s"xx $passage yy zz"),
      (3L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"))
      .toDF("doc_id", "text")
    val got = DedupQueries.passageDedupApply(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // only the shared 13-gram's span [3,15] / [2,14] is covered; unique
    // prefix/suffix tokens survive verbatim
    assert(got(1L) == ("aa bb cc", 13L), got(1L))
    assert(got(2L) == ("xx yy zz", 13L), got(2L))
    // doc 3 has grams but none shared: untouched
    assert(got(3L)._1 ==
      "one two three four five six seven eight nine ten eleven twelve thirteen fourteen")
    assert(got(3L)._2 == 0L)
  }

  test("q-gram count filter finds every edit-distance<=2 pair (no false negatives)") {
    import spark.implicits._
    // pairs that stress the candidate generator: substitutions at TWO
    // separated positions (four bigrams disturbed — the worst case the
    // Gravano bound still covers), an insertion, and a deletion; plus a
    // dist-3 pair and an unrelated name that must NOT surface
    val names = Seq(
      "alpha widget", "alpho wodget", // two separated substitutions: dist 2
      "bravo spanner", "bravo spannerx", // append: dist 1
      "charlie bolt", "charlie bol", // delete: dist 1
      "delta gasket", "dexta gusket", "dexta guskez", // chain incl. a dist-3 pair
      "unrelated name").toDF("name")
    val got = DedupQueries.editDistJoin(names, 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = Set(
      ("alpha widget", "alpho wodget", 2L),
      ("bravo spanner", "bravo spannerx", 1L),
      ("charlie bol", "charlie bolt", 1L),
      ("delta gasket", "dexta gusket", 2L),
      ("dexta gusket", "dexta guskez", 1L))
    // ("delta gasket","dexta guskez") is dist 3 — correctly absent
    assert(got == want, got.mkString(", "))
  }

  test("d24 prefix filter is COMPLETE: equals brute force at jaccard >= 0.8") {
    val sf = "/root/testdata/sf0.001"
    val got = DedupQueries.d24_ppjoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // driver-side brute force over every pair (fixture-sized corpus only)
    val shingleRows = DedupQueries.docShingles(spark, sf)
      .select(col("doc_id"), col("shingles"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val want = (for {
      (ida, sa) <- shingleRows; (idb, sb) <- shingleRows if ida < idb
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.8
    } yield (ida, idb)).toSet
    assert(got == want,
      s"prefix filter missed or invented pairs: got=$got want=$want")
  }

  test("d32 AllPairs prefix filter is COMPLETE: equals brute force at cosine >= 0.9") {
    val sf = "/root/testdata/sf0.001"
    val got = DedupQueries.d32_allpairs_cosine(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("dot"))).toSet
    // driver-side replay of the exact quantization + an ALL-pairs dot
    // (binary trigram-shingle features, matching the operator)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getAs[String]("text").split(" ")
        r.getAs[Long]("doc_id") ->
          toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
    val n = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val qvs = docs.map { case (id, grams) =>
      val w = grams.toSeq.map { t =>
        t -> math.round(math.log(n.toDouble / df(t)) * 1000)
      }.filter(_._2 > 0L).toMap
      val nn = math.sqrt(w.values.map(x => (x * x).toDouble).sum)
      id -> w.map { case (t, x) => t -> math.round(1000000.0 * x / nn) }
    }
    val want = (for {
      (ida, qa) <- qvs; (idb, qb) <- qvs if ida < idb
      dot = qa.map { case (t, q) => q * qb.getOrElse(t, 0L) }.sum
      if dot >= 900000000000L
    } yield (ida, idb, dot)).toSet
    assert(got == want,
      s"AllPairs missed or invented pairs: only-got=${got.diff(want)} only-want=${want.diff(got)}")
    assert(want.nonEmpty, "fixture should contain cosine>=0.9 pairs")
  }

  test("d22's score: a planted quote is contained where jaccard misses it") {
    import spark.implicits._
    // doc 2 embeds doc 1 verbatim inside 10x unrelated filler: containment
    // of the small side is ~1.0 while jaccard dilutes below any usable cut
    val quote = (1 to 40).map(i => s"q$i").mkString(" ")
    val filler = (1 to 400).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, quote, "en", "src0"),
      (2L, s"$filler $quote", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = DedupQueries.ngramJaccardPairs(docs, dfCap = 1000000).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    val na: Int = r.getAs[Int]("na")
    val nb: Int = r.getAs[Int]("nb")
    val inter: Long = r.getAs[Long]("inter")
    val containment = inter.toDouble / math.min(na, nb)
    val jaccard = inter.toDouble / (na + nb - inter)
    assert(containment >= 0.8, s"quote not contained: $containment")
    assert(jaccard < 0.1, s"jaccard should miss the quote: $jaccard")
  }
}
