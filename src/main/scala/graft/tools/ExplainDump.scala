package graft.tools

/** Dev probe: write `.explain("formatted")` output for registry queries to
  * files — the before/after plan evidence the optimization rounds commit
  * under plans/r{N}/.
  *
  *   runMain graft.tools.ExplainDump <outDir> <suffix> <query> [query ...]
  *
  * writes <outDir>/<query>_<suffix>.txt for each named query. The plan is
  * the ANALYZED+OPTIMIZED initial physical plan (AdaptiveSparkPlan's
  * initial shape — what `df.explain("formatted")` prints before
  * execution); sf dir from SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val s = graft.Sessions.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(s, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
      graft.Checkpoints.releaseAll(s)
    }
    s.stop()
  }
}
