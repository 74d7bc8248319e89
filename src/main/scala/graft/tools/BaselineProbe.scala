package graft.tools

/** Dev probe: where does Bench.loadBaseline resolve BASELINE.md from, and
  * does the default-charset read survive it? (Round 14: this probe found
  * the MalformedInputException that had silently disabled the bench
  * adjudication pass since it was built — the forked JVM default charset
  * is not UTF-8 — and the bg-jobs jar depth that broke the classpath
  * walk.)
  */
object BaselineProbe {
  def main(args: Array[String]): Unit = {
    println("user.dir=" + sys.props("user.dir"))
    println("cwd.exists BASELINE.md=" + new java.io.File("BASELINE.md").isFile)
    val cs = getClass.getProtectionDomain.getCodeSource
    println("codeSource=" + cs)
    if (cs != null) println("location=" + cs.getLocation)
    val row = """^\|\s*([A-Za-z0-9_]+)\s*\|\s*([0-9]+\.?[0-9]*)\s*\|.*$""".r
    try {
      val src = scala.io.Source.fromFile("BASELINE.md")
      val m = src.getLines().collect {
        case row(name, secs) => name -> secs.toDouble
      }.toMap
      src.close()
      println("default-charset read: rows matched=" + m.size)
    } catch { case e: Throwable =>
      println("default-charset read failed (the pre-fix bug): " + e)
    }
    println("default charset=" + java.nio.charset.Charset.defaultCharset())
    println("Bench.loadBaseline rows=" + graft.Bench.loadBaseline().size)
  }
}
