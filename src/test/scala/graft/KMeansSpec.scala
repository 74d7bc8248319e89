package graft

import org.apache.spark.sql.functions._
import graft.functions.KMeans

class KMeansSpec extends SparkTestBase {

  test("fit returns k centroids of the right dimension, deterministically") {
    val e = Tables.embeddings(spark, sf)
    val c1 = KMeans.fit(e, "vec_id", "embedding", k = 4, iterations = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c2 = KMeans.fit(e, "vec_id", "embedding", k = 4, iterations = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c1.keySet == Set(0, 1, 2, 3))
    assert(c1.values.forall(_.length == 64))
    assert(c1 == c2, "k-means must be run-to-run deterministic")
  }

  test("assign covers every vector exactly once") {
    val e = Tables.embeddings(spark, sf)
    val cells = KMeans.fit(e, "vec_id", "embedding", k = 4, iterations = 1)
    val assigned = KMeans.assign(e, cells, "embedding")
    assert(assigned.count() == e.count())
    assert(assigned.select(col("cluster")).distinct().count() <= 4)
  }

  test("GraftExtensions injects the strategy and all SQL functions") {
    // a second getOrCreate in this JVM would reuse the shared session and
    // silently skip extensions, so probe the extensions object directly
    // through its public build/register API
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(ColumnBridge.plannerStrategies(ext, spark).contains(graft.plans.TopKStrategy))
    val reg = ColumnBridge.registerFunctions(ext, new SimpleFunctionRegistry)
    Seq("cosine_similarity", "dot_product", "simhash64", "minhash_signature",
      "word_shingles").foreach { f =>
      assert(reg.functionExists(FunctionIdentifier(f)), s"$f not registered")
    }
  }
}
