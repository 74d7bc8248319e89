package graft.tools

import graft.{Sessions, SparkEntry}

/** Plan auditor: prints `.explain("formatted")` for the named queries (or a
  * representative default set) so scan pushdown (PushedFilters/ReadSchema),
  * join strategy (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen
  * coverage can be eyeballed per round.
  *   runMain graft.tools.Plans [sfDir] [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q01_pricing_summary", "q02_filter_project", "q03_join_agg",
      "q12_window_rank", "q15_topk", "s01_knn_bruteforce",
      "d03_dedup_minhash_lsh", "t04_fingerprint")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
