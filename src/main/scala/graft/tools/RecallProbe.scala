package graft.tools

/** Dev probe: recall@5 of the ANN variants vs s01's exact top-k. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.get()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val exact = Recall.topk(spark, sf, "s01_knn_bruteforce")
    Seq("s02_ann_lsh", "s04_ivf_ann", "s06_ivf_kmeans", "s08_ivf_nprobe",
      "s09_pq_ann", "s10_ivf_pq", "s11_graph_ann", "s12_ivf_pq_rerank",
      "s15_truncated_rerank", "s17_persisted_ivfpq",
      "s18_incremental_append", "s22_jl_projection").foreach { n =>
      println(f"RECALL $n%-16s ${Recall.recall(exact, Recall.topk(spark, sf, n))}%.3f")
    }
    spark.stop()
  }
}
