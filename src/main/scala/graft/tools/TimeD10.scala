package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc wall-clock probe for the d10 regression chase (round-3 VERDICT
  * item 8): splits d10's cost into the d05 pair kernel vs the label rounds.
  */
object TimeD10 {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.operators.DedupQueries.d10_dedup_clusters(s, d).count() // warm
    def t3(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val srt = ts.map(_._1).sorted
      println(f"$name median: ${srt(1)}%.2f s (all: ${srt.map(t => f"$t%.2f").mkString(", ")}; rows=${ts.head._2})")
    }
    t3("d05_pairs") {
      graft.operators.DedupQueries.d05_ngram_jaccard(s, d)
        .select(col("doc_a"), col("doc_b")).localCheckpoint().count()
    }
    t3("d10_full") {
      graft.operators.DedupQueries.d10_dedup_clusters(s, d).count()
    }
    t3("d13_full") {
      graft.operators.DedupQueries.d13_dedup_clusters_star(s, d).count()
    }
    s.stop()
  }
}
