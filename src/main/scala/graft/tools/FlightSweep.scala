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
    // `all` (round-13 verdict item 2): sweep the ENTIRE registry and print
    // only the [flag] lines — stages with material executor-run time on
    // <= 4 tasks, the AQE-coalesced-CPU-bound signature. Named mode keeps
    // the full per-stage table for the queries under active investigation.
    val names =
      if (args.sameElements(Array("all"))) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val verbose = !args.sameElements(Array("all"))
    var totalFlags = 0
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(s, d).count() // warm: caches, store builds, JIT
        graft.Checkpoints.releaseAll(s)
        meter.resetStages()
        val t0 = System.nanoTime()
        fn(s, d).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[sweep] $name: $secs%.2f s")
        if (verbose) meter.dumpStages(6, name)
        totalFlags += meter.dumpFlags(name)
      } catch { case e: Throwable =>
        println(s"[sweep] $name: ERROR ${e.getClass.getSimpleName}: " +
          graft.etl.EtlRunner.firstLine(e).take(120))
      }
      graft.Checkpoints.releaseAll(s)
    }
    println(s"[sweep] done: ${names.size} entries, $totalFlags flagged stages")
    s.stop()
  }
}
