package graft.tools

/** Dev probe: attribute a query's FIRST-TOUCH cost (round-14 verdict item
  * 2 — q160's unexplained 29 s `top10_build` charge). The bench charges
  * `build[q] = firstTouch[q] - steadyMedian[q]`, where firstTouch is the
  * very first execution in the session; this probe reproduces that number
  * in ISOLATION (cold JVM, no prior queries) and, with the flight
  * recorder on for the cold run, names the stages the one-time cost goes
  * to — distinguishing "this query's plan pays X s of one-time work"
  * from "ambient: the bench's pass-0 neighborhood charged someone else's
  * work to this entry".
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.ColdTouch <query> [query..]
  *
  * (queries run in the order given; only the FIRST is truly cold — pass
  * one query per invocation for a clean cold attribution.)
  */
object ColdTouch {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val meter = new ProbeMetrics(s)
    meter.flightRecord = true
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      meter.resetStages()
      val t0 = System.nanoTime()
      fn(s, d).count()
      val cold = (System.nanoTime() - t0) / 1e9
      graft.Checkpoints.releaseAll(s)
      meter.dumpStages(10, s"$name cold")
      val ts = (1 to 3).map { _ =>
        val t1 = System.nanoTime()
        fn(s, d).count()
        val dt = (System.nanoTime() - t1) / 1e9
        graft.Checkpoints.releaseAll(s)
        dt
      }.sorted
      println(f"[cold] $name first=$cold%.2f s steady_median=${ts(1)}%.2f s " +
        f"build_charge=${cold - ts(1)}%.2f s " +
        s"(steady: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    s.stop()
  }
}
