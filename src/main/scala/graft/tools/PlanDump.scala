package graft.tools

/** Dev probe: print a registered query's executed plan.
  *   runMain graft.tools.PlanDump <query> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get()
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(args(0))(s, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
  }
}
