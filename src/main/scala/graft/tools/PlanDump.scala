package graft.tools

/** Dev probe: print a registered query's executed plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get()
    val df = graft.SparkEntry.queries(args(0))(s, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
  }
}
