package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared recall@k accounting for the ANN family — used by [[RecallProbe]]
  * and the s10/s11 recall specs, so "recall" can never mean two different
  * things in the probe and the tests. Driver-side maps are fine here: the
  * registry's similarity queries emit k rows per query vector (tiny).
  */
object Recall {
  /** Per-query-vector result id sets from a registry similarity query. */
  def topk(spark: SparkSession, sf: String, name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.queries(name)(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }

  /** Mean per-query recall of `m` against the exact sets. */
  def recall(exact: Map[Long, Set[Long]], m: Map[Long, Set[Long]]): Double =
    exact.map { case (q, ex) =>
      (m.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size }.sum / exact.size
}
