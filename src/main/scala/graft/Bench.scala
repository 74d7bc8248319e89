package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run (driver contract). Timing
  * discipline after round 1's n=1 noise (identical window queries timed
  * 0.18s vs 4.27s): per-query warmup isolation, median-of-N (default 3),
  * and explicit error markers — a query that throws must never be reported
  * as a (fast) time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get()
    // warmup: JIT + codegen-cache + parquet footer caches on the tiny SF so
    // per-query timings measure the operator, not first-run JVM effects.
    // try INSIDE the loop: one broken query must not void the others' warmup
    SparkEntry.queries.values.foreach(f =>
      try f(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () })
    val reps = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt).getOrElse(3).max(1)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.flatMap { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name, e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).linesIterator.next().take(120))
          None
        }
      }
      // median damps one-off page-cache/GC outliers; min would hide them,
      // mean would double-count them. Even rep counts average the two
      // middle samples — upper-middle alone biases pessimistic
      if (times.isEmpty) None
      else {
        val ts = times.sorted
        val mid =
          if (ts.size % 2 == 1) ts(ts.size / 2)
          else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
        Some(name -> mid)
      }
    }
    // control chars (tabs in Spark plan fragments etc.) are illegal in JSON
    // strings — blank them so the one-line contract always parses
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .map(c => if (c < ' ') ' ' else c)
    // slowest first: the queries worth reading are at the front
    val qs = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    // the driver keeps only the TAIL of long output lines, and the full
    // line above sorts slowest-first — so the total and the interesting
    // queries are exactly what truncation destroys. A second, compact line
    // (total + top-10 slowest + error count) printed LAST survives any
    // tail capture and is independently parseable JSON.
    val top10 = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"top10_slowest":$top10,"sf":"$sfDir"}""")
    spark.stop()
  }
}
