package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_similarity
import graft.functions.VectorMean.vector_mean

/** Lloyd's k-means over an embedding column, DataFrame-native — the IVF
  * coarse-quantizer trainer.
  *
  * Spark shapes per iteration: the k centroids live on the DRIVER (k
  * vectors, tiny) and enter the plan as literals — nearest-centroid is a
  * pure per-row argmax projection inside the scan stage (codegen'd cosine
  * kernel against each literal centroid, folded to the argmax index in a
  * single `aggregate` pass — see [[nearestCentroidIdx]]), so assignment
  * costs ZERO shuffle and ZERO row
  * replication; the only exchange per iteration is the k-row hash
  * aggregate (the mergeable [[VectorMean]] UDAF) that recomputes
  * centroids. Collecting the k centroid rows per iteration also truncates
  * the lineage — iteration i's plan does not re-execute iterations 0..i-1.
  *
  * (The previous formulation — crossJoin with broadcast centroids + a
  * row_number window partitioned by a per-row id — shuffled the k-times
  * replicated corpus once per iteration with one-row windows. The argmin
  * projection is the same math with no exchange at all.)
  *
  * Empty clusters keep their previous centroid (k rows always come back).
  *
  * Determinism: init = the vectors with the k smallest ids (no RNG); ties
  * in assignment break on cluster id (the argmax fold keeps the FIRST
  * index at equal similarity — lowest cluster id, same contract as the
  * old (sim desc, cluster asc) window order). Note the ulp-level caveat:
  * centroid means merge double partial sums in shuffle-fetch order, so on
  * a multi-node cluster two runs can differ in the last bit and flip a
  * boundary vector — fine for ANN recall, not a bit-replay guarantee
  * (single-JVM local mode, as tested here, is stable).
  */
object KMeans {
  /** Returns (cluster: int, centroid: array<double>) — always k rows. */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int = 3, dim: Int = 64): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // materialize the (id, vec) training projection once — every Lloyd
    // iteration re-reads these blocks instead of re-scanning the source.
    // (At 100 TB you'd also train the coarse quantizer on a SAMPLE of the
    // corpus — quantizer quality saturates long before full-corpus size —
    // and only the final assign pass would touch every vector.)
    val training = vectors.select(col(idCol), col(vecCol)).localCheckpoint()
    // distributed top-k by id, then k rows to the driver (k is tiny)
    var centroids: Seq[(Int, Seq[Double])] = training
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().toSeq.zipWithIndex
      .map { case (r: Row, i) => (i, r.getSeq[Double](0)) }
    var i = 0
    while (i < iterations) {
      // one pass: argmin projection + k-row hash aggregate, then k rows back
      val updated: Map[Int, Seq[Double]] = assignLocal(training, centroids, vecCol)
        .groupBy(col("cluster"))
        .agg(vector_mean(col(vecCol), dim).as("c_new"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      // empty clusters would vanish from the groupBy: keep the old centroid
      centroids = centroids.map { case (c, old) => (c, updated.getOrElse(c, old)) }
      i += 1
    }
    centroids.toDF("cluster", "centroid")
  }

  /** Nearest-centroid assignment: adds a `cluster` column. Zero shuffle —
    * `centroids` (k rows) is collected to the driver and becomes literal
    * vectors in a per-row argmax projection.
    */
  def assign(vectors: DataFrame, centroids: DataFrame, vecCol: String): DataFrame = {
    val cents = centroids
      .select(col("cluster").cast("int"), col("centroid").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assignLocal(vectors, cents, vecCol)
  }

  /** 0-based index of the nearest (max-cosine) centroid for `vec` — THE
    * quantizer assignment primitive, shared by Lloyd training, corpus
    * assignment and the PQ encoder (s09) so tie-break and null semantics
    * can never diverge between training and encoding. First-max tie-break
    * = lowest index; a null vector (all sims null) falls back to index 0 —
    * the same deterministic assignment the old (sim desc nulls-last,
    * cluster asc) window ordering produced.
    */
  private[graft] def nearestCentroidIdx(vec: org.apache.spark.sql.Column,
                                        cents: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    val sims = array(cents.map(c =>
      cosine_similarity(vec.cast("array<double>"), typedLit(c))): _*)
    // single-pass argmax fold: the k-kernel array is an ARGUMENT of the
    // aggregate, so it evaluates exactly once even in interpreted/fallback
    // mode (the array_position(array_max) formulation ran the kernel twice
    // unless codegen CSE kicked in). Strict > keeps the first-max (lowest
    // index) tie-break; null sims never beat the -2.0 floor, so an
    // all-null (null-vector) row stays at index 0 — both unchanged.
    val indexed = zip_with(sims, sequence(lit(0), lit(cents.size - 1)),
      (sim, i) => struct(sim.as("s"), i.as("i")))
    val best = aggregate(indexed,
      struct(lit(-2.0).as("s"), lit(0).as("i")),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x).otherwise(acc))
    coalesce(best.getField("i").cast("int"), lit(0))
  }

  /** The argmin projection itself. `cents` must be sorted by cluster id so
    * the first-max tie-break resolves to the lowest id; `cluster` is never
    * null (see [[nearestCentroidIdx]]), so fit's k-row collect never sees
    * a null group.
    */
  private def assignLocal(vectors: DataFrame, cents: Seq[(Int, Seq[Double])],
                          vecCol: String): DataFrame = {
    val ids = typedLit(cents.map(_._1))
    vectors.withColumn("cluster",
      element_at(ids, nearestCentroidIdx(col(vecCol), cents.map(_._2)) + 1))
  }
}
