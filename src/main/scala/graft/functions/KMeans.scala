package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.cosine_similarity
import graft.functions.VectorMean.vector_mean

/** Deterministic Lloyd's k-means over an embedding column, DataFrame-native —
  * the IVF coarse-quantizer trainer.
  *
  * Spark shapes per iteration: broadcast the k centroids (tiny), one corpus
  * scan assigns each vector to its nearest centroid (codegen'd cosine
  * kernel + rank window over k rows per vector), then one hash aggregate
  * (the mergeable [[VectorMean]] UDAF) recomputes centroids — so an
  * iteration is scan + broadcast-join + groupBy, no quadratic step, and the
  * driver only ever holds k vectors.
  *
  * Determinism: init = the vectors with the k smallest ids (no RNG);
  * cosine assignment ties break on cluster id.
  */
object KMeans {
  /** Returns (cluster: int, centroid: array<double>) — k rows. */
  def fit(spark: SparkSession, vectors: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int = 3, dim: Int = 64): DataFrame = {
    val ids = Window.orderBy(col(idCol))
    var centroids = vectors
      .withColumn("__rn", row_number().over(ids))
      .filter(col("__rn") <= k)
      .select((col("__rn") - 1).cast("int").as("cluster"),
        col(vecCol).cast("array<double>").as("centroid"))
    var i = 0
    while (i < iterations) {
      val assigned = assign(vectors, centroids, vecCol)
      centroids = assigned
        .groupBy(col("cluster"))
        .agg(vector_mean(col(vecCol), dim).as("centroid"))
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
