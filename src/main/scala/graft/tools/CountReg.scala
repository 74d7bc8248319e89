package graft.tools

/** Dev probe: registry/oracle key accounting (SURVEY §8 counts). */
object CountReg {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[count] queries=${q.size} oracles=${o.size}")
    println(s"[count] rows-only=${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"[count] orphan-oracles=${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
