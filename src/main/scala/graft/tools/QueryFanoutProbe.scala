package graft.tools

import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup
import graft.plans.TopKPerGroup.Ord

/** Scale evidence on the OTHER axis: the registry's similarity queries fix
  * |queries| = 10; production batch-inference fans out thousands of query
  * vectors. This probe times exact brute-force top-5 at |q| = 10 vs 1000
  * over sf0.1 — the broadcast side grows, the corpus scan count does NOT
  * (one scan either way; the kernel work is |q| x corpus but stays inside
  * one codegen'd stage and the heap shuffle carries k x |q| x partitions).
  *   runMain graft.tools.QueryFanoutProbe
  */
object QueryFanoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.get()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.Tables.embeddings(spark, sf)
    def knn(nq: Int): Long = {
      val q = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < nq)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      TopKPerGroup.topK(
        e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            graft.functions.VectorFunctions.cosine_similarity(
              col("q_emb"), col("embedding")).as("sim")),
        Seq("q_id"), Seq(Ord("sim", desc = true), Ord("vec_id")), 5).count()
    }
    knn(10) // warm
    for (nq <- Seq(10, 100, 1000)) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = knn(nq)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[fanout] |q|=$nq%-5d median ${med}%.2f s rows=${ts.head._2}")
    }
    spark.stop()
  }
}
