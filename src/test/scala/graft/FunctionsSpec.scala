package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.TextFunctions._

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine_similarity: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),
      (Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))) // zero vector -> 0 by convention
      .toDF("a", "b")
    val got = df.select(cosine_similarity($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-15)
    assert(math.abs(got(1) - 1.0) < 1e-15)
    assert(math.abs(got(2) + 1.0) < 1e-15)
    assert(got(3) == 0.0)
  }

  test("dot_product matches hand computation, double arrays too") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(dot_product($"a", $"b")).as[Double].head() == 32.0)
  }

  test("log2_micros: exact powers of two, libm agreement, column == kernel") {
    import graft.functions.Log2Micros
    // exact on powers of two (no rounding ambiguity at all)
    (0 to 62).foreach { e =>
      assert(Log2Micros.log2Micros(1L << e) == e.toLong * 1000000L,
        s"2^$e must map to exactly ${e}e6")
    }
    // within 1 micro of libm's log2 (the kernel truncates; libm rounds)
    val probes = Seq(3L, 5L, 7L, 1000L, 999983L, 999999937L,
      (1L << 62) - 1, 2654435761L)
    probes.foreach { n =>
      val want = math.floor(math.log(n.toDouble) / math.log(2.0) * 1e6).toLong
      val got = Log2Micros.log2Micros(n)
      assert(math.abs(got - want) <= 1,
        s"log2_micros($n) = $got, libm floor = $want")
    }
    // the Column path agrees with the kernel, null for n <= 0. A
    // Project-over-LocalRelation is constant-folded (interpreted eval), so
    // to actually exercise the GENERATED code — where a boxed null from
    // the kernel once NPE'd on unboxing (round-8 advice) — the probes go
    // through a parquet round-trip: a file scan is never foldable, and
    // the projection runs inside WholeStageCodegen.
    val pq = java.nio.file.Files.createTempDirectory("graft_log2_cg").toString
    (probes ++ Seq(0L, -5L)).toDF("n").write.mode("overwrite").parquet(pq)
    val df = spark.read.parquet(pq)
      .select($"n", log2_micros($"n").as("lg"))
    // the executedPlan toString marks whole-stage-codegen'd operators with
    // a `*(stageId)` prefix (WholeStageCodegenExec wraps lazily on execute)
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      "probe must flow through codegen for this test to mean anything")
    df.collect().foreach { r =>
      val n = r.getLong(0)
      if (n <= 0L) assert(r.isNullAt(1), s"n=$n must be null")
      else assert(r.getLong(1) == Log2Micros.log2Micros(n))
    }
  }

  test("quantize_vec: NaN/Inf/null-element/overflow fail loudly, not wrap") {
    import graft.functions.KMeans
    // the quantizer feeds hash-gated trained-ANN queries: a silent wrap or
    // a null-as-0.0 would corrupt codes undetectably. All four corrupt
    // shapes must surface with the quantizer named in the error.
    def mustFail(vals: Seq[java.lang.Double]): Unit = {
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(vals)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = true)))))
      val e = intercept[Exception] {
        df.select(KMeans.quantize($"v")).collect()
      }
      val msg = String.valueOf(e.getMessage) +
        Option(e.getCause).map(c => " " + c.getMessage).getOrElse("")
      assert(msg.contains("quantiz"), s"error must name the quantizer: $msg")
    }
    mustFail(Seq(Double.box(1.0), Double.box(Double.NaN)))
    mustFail(Seq(Double.box(Double.PositiveInfinity)))
    mustFail(Seq(Double.box(1.0), null))
    mustFail(Seq(Double.box(1e13))) // |v| * 1e6 overflows int64
    // and the happy path still quantizes exactly
    val ok = Seq(Seq(0.5, -1.25)).toDF("v")
      .select(KMeans.quantize($"v")).head().getSeq[Long](0)
    assert(ok == Seq(500000L, -1250000L))
  }

  test("jl_project/sq_dist_long: hand values, HOF equivalence, codegen parity") {
    import graft.functions.JlFunctions.{jl_project, sq_dist_long, signs}
    // hand check on a one-hot input: floor(2.5*1000)=2500 lands in dim 3,
    // so p_j = signs[3*32+j] * 2500 exactly
    val oneHot = Seq.tabulate(64)(i => if (i == 3) 2.5f else 0.0f)
    val hand = spark.createDataset(Seq(oneHot)).toDF("embedding")
      .select(jl_project($"embedding").as("p")).as[Seq[Long]].head()
    assert(hand == Seq.tabulate(32)(j => signs(3 * 32 + j) * 2500L))
    // negative values must floor (not truncate): floor(-0.0015*1000) = -2
    val neg = Seq.tabulate(64)(i => if (i == 0) -0.0015f else 0.0f)
    val handNeg = spark.createDataset(Seq(neg)).toDF("embedding")
      .select(jl_project($"embedding").as("p")).as[Seq[Long]].head()
    assert(handNeg == Seq.tabulate(32)(j => signs(j) * -2L))
    // sq_dist_long hand value
    val dd = Seq((Seq(3L, -1L), Seq(1L, 2L))).toDF("a", "b")
    assert(dd.select(sq_dist_long($"a", $"b")).as[Long].head() == 13L)
    // the interpreted HOF spelling of the same arithmetic must agree
    // bit-for-bit on real embeddings (it was the original s22 kernel)
    val e = Tables.embeddings(spark, sf).limit(40)
      .withColumn("sgns", typedLit(signs.toSeq)).cache()
    val native = e.select($"vec_id", jl_project($"embedding").as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = e.select($"vec_id",
      expr("""transform(sequence(0, 31), j ->
             |  aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) ->
             |    acc + element_at(sgns, i * 32 + j + 1) *
             |          CAST(floor(CAST(element_at(embedding, i + 1) AS DOUBLE)
             |                     * 1000.0) AS BIGINT)))""".stripMargin).as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof, "native JL kernel diverged from HOF spelling")
    // interpreted eval path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = e.select($"vec_id", jl_project($"embedding").as("p"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == viaEval)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("sign_bits: hand values, HOF equivalence, codegen parity") {
    import graft.functions.VectorFunctions.sign_bits
    // hand check: positives at dims 0, 2, 33 → lo = 0b101 = 5, hi = 1<<1 = 2
    val v = Seq.tabulate(64) {
      case 0 => 1.5f; case 2 => 0.25f; case 33 => 3f
      case _ => -1.0f
    }
    val hand = spark.createDataset(Seq(v)).toDF("embedding")
      .select(sign_bits($"embedding").as("s")).as[Seq[Long]].head()
    assert(hand == Seq(5L, 2L), s"sign_bits hand value wrong: $hand")
    // the HOF reference spelling must agree bit-for-bit on real embeddings
    val e = Tables.embeddings(spark, sf).limit(40).cache()
    val native = e.select($"vec_id", sign_bits($"embedding").as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = e.select($"vec_id", array(
        operators.SimilarityQueries.signHalf($"embedding", 0),
        operators.SimilarityQueries.signHalf($"embedding", 32)).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof, "native sign_bits diverged from the HOF spelling")
    // interpreted eval path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = e.select($"vec_id", sign_bits($"embedding").as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == viaEval)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("registered in SQL: raw query text can call the engine functions") {
    Sessions.tune(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("kll sketch functions are callable from raw SQL text") {
    Sessions.tune(spark)
    // end-to-end in one statement: build over 1..1000, read back median
    // estimate and exact n — n is exact by contract, the median of a
    // barely-compacted 1000-item stream lands within the coarse bound
    val r = spark.sql(
      """SELECT kll_n(sk) AS n, kll_quantile(sk, 0.5D) AS med
        |FROM (SELECT kll_agg(CAST(id AS DOUBLE)) AS sk FROM range(1, 1001))
        |""".stripMargin).head()
    assert(r.getAs[Long]("n") == 1000L)
    assert(math.abs(r.getAs[Double]("med") - 500.0) <= 30.0)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kll_quantile(CAST(NULL AS BINARY))").collect()
    }
    assert(e.getMessage.contains("kll_quantile"))
  }

  test("wrong arity in SQL raises an analysis error, not a crash or silent drop") {
    Sessions.tune(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity(array(1.0F))").collect()
    }
    assert(e.getMessage.contains("cosine_similarity"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array('a'), 5)").collect()
    }
    assert(e2.getMessage.contains("simhash64"))
  }

  test("maxsim_score: hand computation, HOF equivalence, codegen parity") {
    import graft.functions.VectorFunctions.maxsim_score
    // 2 tokens of 2 dims each: q = [(1,0),(0,1)], d = [(0,2),(3,0)]
    // token dots: q1·d1=0 q1·d2=3 ; q2·d1=2 q2·d2=0 -> maxsim = 3 + 2 = 5
    val df = Seq((Seq(1.0f, 0.0f, 0.0f, 1.0f), Seq(0.0f, 2.0f, 3.0f, 0.0f)))
      .toDF("q", "d")
    assert(df.select(maxsim_score($"q", $"d", 2)).as[Double].head() == 5.0)
    // self-match: every token's best match is itself -> sum of |t_i|^2
    assert(df.select(maxsim_score($"q", $"q", 2)).as[Double].head() == 2.0)
    // agrees with the higher-order-function spelling on real embeddings
    val e = Tables.embeddings(spark, sf).limit(30).cache()
    val q = e.select($"embedding".as("q")).limit(1)
    val pairs = e.crossJoin(broadcast(q))
    val native = pairs.select(maxsim_score($"q", $"embedding", 8).as("m"))
      .as[Double].collect()
    val hof = pairs.select(expr(
      """aggregate(transform(sequence(0, 7), i ->
        |  array_max(transform(sequence(0, 7), j ->
        |    aggregate(zip_with(slice(cast(q as array<double>), i*8+1, 8),
        |                       slice(cast(embedding as array<double>), j*8+1, 8),
        |                       (x, y) -> x * y),
        |              cast(0.0 as double), (acc, x) -> acc + x)))),
        |cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin).as("m"))
      .as[Double].collect()
    assert(native.toSeq == hof.toSeq, "native kernel diverged from HOF spelling")
    // interpreted path agrees bitwise with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = pairs.select(maxsim_score($"q", $"embedding", 8).as("m"))
        .as[Double].collect()
      assert(native.toSeq == viaEval.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("codegen and interpreted eval agree on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(20).cache()
    val q = e.select($"embedding".as("q")).limit(1)
    val viaCodegen = e.crossJoin(broadcast(q))
      .select(cosine_similarity($"q", $"embedding").as("c")).as[Double].collect()
    // WholeStageCodegen off -> interpreted eval path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = e.crossJoin(broadcast(q))
        .select(cosine_similarity($"q", $"embedding").as("c")).as[Double].collect()
      assert(viaCodegen.toSeq == viaEval.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("simhash64 is deterministic and token-order independent") {
    val df = Seq(
      Seq("spark", "fast", "table"),
      Seq("table", "spark", "fast"),
      Seq("entirely", "different", "words")).toDF("toks")
    val hs = df.select(simhash64($"toks")).as[Long].collect()
    assert(hs(0) == hs(1)) // bag-of-tokens semantics
    assert(hs(0) != hs(2))
  }

  test("cdc_boundaries: hand case, tiling invariants, shift re-sync, codegen parity") {
    import graft.functions.TextFunctions.cdc_boundaries
    // hand case, w=2, div=3: codes(ab..)=97,98,...; H(i)=c[i]+31*c[i-1]
    //   "abcabc": H(2)=97*31+98=3105 (3105%3=0 -> boundary), H(3)=98*31+99
    //   =3137 (no), H(4)=99*31+97=3166 (no), H(5)=3105 again at "ab" (yes),
    //   H(6)=3137 (no) -> bounds [2, 5, 6]
    val hand = Seq("abcabc").toDF("t")
      .select(cdc_boundaries($"t", 2, 3)).as[Seq[Int]].head()
    assert(hand == Seq(2, 5, 6), s"hand case got $hand")
    val docs = Tables.documents(spark, sf).select($"text").limit(50).cache()
    val bnds = docs.select($"text", cdc_boundaries($"text").as("b"))
      .as[(String, Seq[Int])].collect()
    bnds.foreach { case (t, b) =>
      assert(b.last == t.length, "final boundary must close the doc")
      assert(b == b.sorted && b.distinct == b, "boundaries sorted unique")
    }
    // the CDC property: prepending a byte shifts content, but boundaries
    // re-synchronize — chunks after the first shared boundary realign
    val shifted = docs.select(concat(lit("Z"), $"text").as("text"),
        cdc_boundaries(concat(lit("Z"), $"text")).as("b"))
      .as[(String, Seq[Int])].collect()
    val resynced = bnds.zip(shifted).count { case ((_, b0), (_, b1)) =>
      // shifted boundaries, minus the +1 offset, share a suffix with the
      // originals (full re-sync after the first window-local divergence)
      val tailShared = b1.map(_ - 1).toSet.intersect(b0.toSet).size
      tailShared >= math.max(1, b0.size - 2)
    }
    assert(resynced >= (bnds.length * 8) / 10,
      s"only $resynced/${bnds.length} docs re-synced after a 1-char shift")
    // codegen vs interpreted parity
    val viaCodegen = docs.select(cdc_boundaries($"text")).as[Seq[Int]].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = docs.select(cdc_boundaries($"text")).as[Seq[Int]].collect()
      assert(viaCodegen.toSeq == viaEval.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("winnow_fingerprints: hand case, HOF bit-parity, codegen parity") {
    import graft.functions.TextFunctions.winnow_fingerprints
    // hand case, k=2, w=2 on "abab": grams ab,ba,ab hash to
    // h(ab)=97*31+98=3105, h(ba)=98*31+97=3135; encoded 3105*2^33+1,
    // 3135*2^33+2, 3105*2^33+3; window mins: min(e1,e2)=e1, min(e2,e3)=e3
    // -> selected hashes [3105] (distinct, first-occurrence order)
    val hand = Seq("abab").toDF("text")
      .select(winnow_fingerprints($"text", 2, 2)).as[Seq[Long]].head()
    assert(hand == Seq(3105L), s"hand case got $hand")
    // bit-parity with the HOF spelling (the original d28 formulation,
    // two-stage with a checkpoint barrier against CollapseProject
    // inlining — the m11 lesson)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").limit(100)
    val withCodes = docs
      .withColumn("g", length($"text") - 7)
      .filter($"g" >= 4)
      .withColumn("codes", expr(
        """transform(sequence(1, g), i ->
          |  aggregate(transform(sequence(0, 7),
          |              o -> CAST(ascii(substring(text, i + o, 1)) AS LONG)),
          |            0L, (acc, c) -> (acc * 31 + c) % 1000000007)
          |  * 8589934592 + i)""".stripMargin))
      .localCheckpoint()
    val hof = withCodes.withColumn("fps", expr(
        "array_distinct(transform(sequence(1, g - 3), j -> " +
          "array_min(slice(codes, j, 4)) div 8589934592))"))
      .select($"doc_id", $"fps").as[(Long, Seq[Long])].collect().toMap
    val native = docs.filter(length($"text") >= 11)
      .select($"doc_id", winnow_fingerprints($"text", 8, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, fps) =>
      assert(fps == hof(id), s"doc $id: native $fps != HOF ${hof(id)}")
    }
    // codegen vs interpreted parity
    val viaCodegen = docs.select(winnow_fingerprints($"text")).as[Seq[Long]].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = docs.select(winnow_fingerprints($"text")).as[Seq[Long]].collect()
      assert(viaCodegen.toSeq == viaEval.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("minhash_signature: 16 hashes; equal sets equal sigs; similar sets share components") {
    val df = Seq(
      Seq("a b c", "b c d", "c d e", "d e f"),
      Seq("a b c", "b c d", "c d e", "d e f"),
      Seq("a b c", "b c d", "c d e", "x y z"), // jaccard 3/5
      Seq("p q r", "q r s", "r s t", "s t u")) // disjoint
      .toDF("sh")
    val sigs = df.select(minhash_signature($"sh")).as[Seq[Long]].collect()
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1))
    def shared(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).count { case (x, y) => x == y }
    // signature agreement estimates jaccard: similar >> disjoint
    assert(shared(sigs(0), sigs(2)) > shared(sigs(0), sigs(3)))
  }

  test("jaro_winkler: textbook values, floor transpositions, boost threshold, SQL parity") {
    import graft.functions.JaroWinkler.score
    def micro(a: String, b: String): Long = math.round(score(a, b) * 1000000)
    // reference values cross-read from an independent implementation
    // (DuckDB's jaro_winkler_similarity) — d26's oracle re-proves these
    // over every blocked pair at sf0.01, bit-identical doubles included
    assert(micro("martha", "marhta") == 961111L)
    assert(micro("dixon", "dicksonx") == 813333L)
    assert(micro("dwayne", "duane") == 840000L)
    assert(micro("jellyfish", "smellyfish") == 896296L) // no common prefix: no boost
    assert(micro("abc", "abc") == 1000000L)
    assert(micro("", "abc") == 0L && micro("a", "") == 0L)
    assert(micro("ab", "ba") == 0L) // window 0: no matches at distance 1
    // boost threshold: jaro = 0.6 with a 4-char prefix stays unboosted
    assert(micro("abcdxxxxxx", "abcdyyyyyy") == 600000L)
    // odd mismatch count: transpositions floor (x=3 -> t=1), the case that
    // separates this formulation from the fractional x/2 variant
    assert(micro("Customer#000000370", "Supplier#000000037") == 789174L)
    // SQL registration + codegen path agree with the direct kernel
    graft.functions.TextFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw").collect().head.getDouble(0)
    assert(viaSql == score("martha", "marhta"))
  }
}
