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
}
