package graft.tools

/** Dev probe: recall@5 of the ANN variants vs s01's exact top-k. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.get()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    def topk(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val exact = topk("s01_knn_bruteforce")
    def recall(m: Map[Long, Set[Long]]): Double =
      exact.map { case (q, ex) =>
        (m.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size }.sum / exact.size
    Seq("s02_ann_lsh", "s04_ivf_ann", "s06_ivf_kmeans", "s08_ivf_nprobe",
      "s09_pq_ann", "s10_ivf_pq", "s11_graph_ann").foreach { n =>
      println(f"RECALL $n%-16s ${recall(topk(n))}%.3f")
    }
    spark.stop()
  }
}
