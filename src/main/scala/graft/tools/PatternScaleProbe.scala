package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale evidence for the round-9 pattern family: q168 MATCH_RECOGNIZE
  * islands and st22's CEP runs-fold over an events log grown by USER
  * replication — each clone offsets user_id/event_id and keeps
  * timestamps, so every user's event sequence (and therefore the match
  * structure) is preserved exactly: matches MUST grow linearly with the
  * corpus, and any super-linear wall is the operator's own overhead, not
  * densified data.
  *
  *   GRAFT_PROBE_SCALE=100 runMain graft.tools.PatternScaleProbe
  *
  * What the design predicts: one user_id exchange of the scan, per-user
  * window work linear in events, runs compaction shrinking the match
  * window's input ~3.5× (fixture run-length ~= type alternation rate) —
  * so wall tracks scan + shuffle, shuffle bytes track the corpus, and
  * output tracks scale exactly. st22 adds one more user-keyed window
  * pass over RUNS (already compacted), so its overhead stays a constant
  * factor over q168 at every leg.
  */
object PatternScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val base = "/root/testdata/sf0.1"
    val scale = sys.env.getOrElse("GRAFT_PROBE_SCALE", "25").toInt
    val big = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_probe_evx$scale").toString

    val marker = new java.io.File(big, "_complete")
    if (!marker.exists()) {
      val ev = spark.read.parquet(s"$base/events.parquet")
      (0 until scale).map { i =>
        ev.withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L))
      }.reduce(_ unionByName _)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$big/events.parquet")
      marker.createNewFile()
    }

    val meter = new ProbeMetrics(spark)
    def time(name: String)(f: => Long): Unit = {
      meter.timed("probeCEP", name)(f)
      graft.Checkpoints.releaseAll(spark)
    }

    for ((sf, tag, parts) <- Seq((base, "1x  ", 32),
        (big, s"${scale}x", math.max(64, scale * 2)))) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"$tag q168_match_recognize")(
        graft.operators.RelationalQueries.q168_match_recognize(spark, sf)
          .count())
      time(s"$tag q170_pattern_alternation")(
        graft.operators.RelationalQueries.q170_pattern_alternation(spark, sf)
          .count())
      time(s"$tag st22_stream_pattern")(
        graft.operators.StreamingQueries.st22_stream_pattern(spark, sf)
          .count())
    }
    spark.stop()
  }
}
