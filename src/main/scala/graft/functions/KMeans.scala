package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.cosine_similarity
import graft.functions.VectorMean.vector_mean

/** Lloyd's k-means over an embedding column, DataFrame-native — the IVF
  * coarse-quantizer trainer.
  *
  * Spark shapes per iteration: broadcast the k centroids (tiny), one corpus
  * scan assigns each vector to its nearest centroid (codegen'd cosine
  * kernel + rank window over k rows per vector), then one hash aggregate
  * (the mergeable [[VectorMean]] UDAF) recomputes centroids — so an
  * iteration is scan + broadcast-join + groupBy, no quadratic step, and the
  * driver only ever holds k vectors (init collects exactly k rows via a
  * distributed TakeOrdered, never a global single-partition window).
  *
  * Empty clusters keep their previous centroid (k rows always come back).
  *
  * Determinism: init = the vectors with the k smallest ids (no RNG); ties
  * in assignment break on cluster id. Note the ulp-level caveat: centroid
  * means merge double partial sums in shuffle-fetch order, so on a
  * multi-node cluster two runs can differ in the last bit and flip a
  * boundary vector — fine for ANN recall, not a bit-replay guarantee
  * (single-JVM local mode, as tested here, is stable).
  */
object KMeans {
  /** Returns (cluster: int, centroid: array<double>) — always k rows. */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int = 3, dim: Int = 64): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // distributed top-k by id, then k rows to the driver (k is tiny)
    val init: Seq[(Int, Seq[Double])] = vectors
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().toSeq.zipWithIndex
      .map { case (r: Row, i) => (i, r.getSeq[Double](0)) }
    var centroids = init.toDF("cluster", "centroid")
    var i = 0
    while (i < iterations) {
      val updated = assign(vectors, centroids, vecCol)
        .groupBy(col("cluster"))
        .agg(vector_mean(col(vecCol), dim).as("c_new"))
      // empty clusters would vanish from the groupBy: keep the old centroid
      centroids = centroids.alias("p")
        .join(updated.alias("u"), Seq("cluster"), "left")
        .select(col("cluster"), coalesce(col("c_new"), col("centroid")).as("centroid"))
      i += 1
    }
    centroids
  }

  /** Nearest-centroid assignment: adds a `cluster` column. */
  def assign(vectors: DataFrame, centroids: DataFrame, vecCol: String): DataFrame = {
    val w = Window.partitionBy(col("__vid")).orderBy(col("__sim").desc, col("cluster"))
    vectors
      .withColumn("__vid", monotonically_increasing_id())
      .crossJoin(broadcast(centroids))
      .withColumn("__sim",
        cosine_similarity(col(vecCol).cast("array<double>"), col("centroid")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__vid", "__sim", "__rk", "centroid")
  }
}
