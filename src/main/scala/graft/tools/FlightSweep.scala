package graft.tools

/** Dev probe: per-stage flight record for named registry entries at bench
  * SF — the d24 lesson generalized. AQE coalesces post-shuffle reads by
  * BYTES, so any stage whose per-row cost is compute-heavy over tiny rows
  * (pair verification, per-candidate scoring) can get silently serialized
  * onto a handful of tasks; this sweep surfaces every stage whose
  * executor-run time dominates its width (run/wall >> tasks would on a
  * full-width stage). Read the output for rows with small `tasks` and
  * large `run` — those are the width-pin candidates.
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.FlightSweep q1 q2 ...
  */
object FlightSweep {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val meter = new ProbeMetrics(s)
    meter.flightRecord = true
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(s, d).count() // warm: caches, store builds, JIT
      meter.resetStages()
      val t0 = System.nanoTime()
      fn(s, d).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] $name: $secs%.2f s")
      meter.dumpStages(6, name)
      graft.Checkpoints.releaseAll(s)
    }
    s.stop()
  }
}
