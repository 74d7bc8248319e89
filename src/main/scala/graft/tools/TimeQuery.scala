package graft.tools

/** Ad-hoc wall-clock probe: median-of-3 for the registry queries named in
  * args, after one warm run each.
  *   runMain graft.tools.TimeQuery g01_pagerank g02_triangles
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(s, d).count() // warm
      graft.Checkpoints.releaseAll(s)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(s, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // bench discipline (round 9): release pinned checkpoint blocks
        // after EVERY execution or the session degrades monotonically
        graft.Checkpoints.releaseAll(s)
        dt
      }.sorted
      println(f"[time] $name median ${ts(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    s.stop()
  }
}
