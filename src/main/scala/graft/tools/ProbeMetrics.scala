package graft.tools

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-byte meter for the scale probes: sums task-level shuffle write
  * and read bytes between [[reset]] and a read, via a SparkListener —
  * the same numbers the UI's stage table shows, aggregated per probe
  * window. Listener events are delivered async; [[snapshot]] pauses for
  * a settle interval so a window rarely misses its own tail tasks.
  *
  * The point for the 100 TB argument: WALL time on one box conflates CPU
  * and IO, but SHUFFLE BYTES are topology-invariant — a probe whose
  * shuffle bytes grow linearly with the corpus ships the same bytes per
  * row on a 1000-executor cluster, where they spread across machines.
  * A super-linear byte curve is the scale-killer wall time alone hides.
  */
final class ProbeMetrics(spark: SparkSession) extends SparkListener {
  private val shuffleWrite = new LongAdder
  private val shuffleRead = new LongAdder
  spark.sparkContext.addSparkListener(this)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  // the listener bus drain API (waitUntilEmpty) is private[spark]; probes
  // time in whole seconds, so a fixed settle pause bounds the tail-event
  // error far below the measurement granularity
  private def settle(): Unit = Thread.sleep(500)

  def reset(): Unit = {
    settle()
    shuffleWrite.reset(); shuffleRead.reset()
  }

  /** (shuffle bytes written, shuffle bytes read) since the last reset. */
  def snapshot(): (Long, Long) = {
    settle()
    (shuffleWrite.sum(), shuffleRead.sum())
  }

  /** Meter + wall-time one probe entry (the shared harness body the
    * probes previously each copied): reset, run, print
    * `[tag] name: Xs (rows, shuffle w/r)`, return the seconds.
    */
  def timed(tag: String, name: String)(f: => Long): Double = {
    reset()
    val t0 = System.nanoTime()
    val rows = f
    val secs = (System.nanoTime() - t0) / 1e9
    val (sw, sr) = snapshot()
    println(f"[$tag] $name: $secs%.1fs ($rows rows, " +
      s"shuffle w=${fmt(sw)} r=${fmt(sr)})")
    secs
  }

  /** Full per-stage FLIGHT RECORDER (opt-in): when a deep leg's wall
    * disagrees with its shuffle bytes, the per-stage executor-time table
    * names the binding stage instead of leaving it to guesswork. Rows
    * accumulate between [[resetStages]] and [[dumpStages]].
    */
  @volatile var flightRecord: Boolean = false
  private final case class StageRow(id: Int, tasks: Int, wallMs: Long,
      runMs: Long, cpuMs: Long, gcMs: Long, inBytes: Long, swBytes: Long,
      srBytes: Long, spill: Long, name: String)
  private val stageRows =
    new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()

  def resetStages(): Unit = { settle(); stageRows.clear() }

  /** Top `n` recorded stages by summed executor run time — executor time,
    * not stage wall, because wall is parallelism-washed on local[32] and
    * run time is what a cluster actually pays.
    */
  def dumpStages(n: Int, tag: String): Unit = {
    settle()
    import scala.jdk.CollectionConverters._
    val rows = stageRows.asScala.toSeq.sortBy(-_.runMs)
    val totalRun = rows.map(_.runMs).sum
    println(f"[flight] $tag: ${rows.size} stages, " +
      f"total executor-run ${totalRun / 1000.0}%.1fs; top $n by run time:")
    rows.take(n).foreach { r =>
      println(f"[flight] $tag  id=${r.id} tasks=${r.tasks} " +
        f"wall=${r.wallMs / 1000.0}%.1fs run=${r.runMs / 1000.0}%.1fs " +
        f"cpu=${r.cpuMs / 1000.0}%.1fs gc=${r.gcMs / 1000.0}%.1fs " +
        s"in=${fmt(r.inBytes)} sw=${fmt(r.swBytes)} sr=${fmt(r.srBytes)} " +
        s"spill=${fmt(r.spill)} ${r.name.linesIterator.nextOption()
          .getOrElse("").take(110)}")
    }
  }

  /** Registry-sweep flag line (round-13 verdict item 2): print every
    * recorded stage whose summed executor-run time is material but ran on
    * a handful of tasks — the AQE-coalesced-CPU-bound signature (d24's
    * pathology: byte-based post-shuffle coalescing starves compute-heavy
    * small-row stages of parallelism). Returns the flagged count so the
    * sweep can summarize.
    */
  def dumpFlags(tag: String, minRunMs: Long = 400, maxTasks: Int = 4): Int = {
    settle()
    import scala.jdk.CollectionConverters._
    val flagged = stageRows.asScala.toSeq
      .filter(r => r.tasks <= maxTasks && r.runMs >= minRunMs)
      .sortBy(-_.runMs)
    flagged.foreach { r =>
      println(f"[flag] $tag id=${r.id} tasks=${r.tasks} " +
        f"run=${r.runMs / 1000.0}%.1fs cpu=${r.cpuMs / 1000.0}%.1fs " +
        s"in=${fmt(r.inBytes)} sr=${fmt(r.srBytes)} spill=${fmt(r.spill)} " +
        s"${r.name.linesIterator.nextOption().getOrElse("").take(110)}")
    }
    flagged.size
  }

  // always-on guardrail: any stage whose shuffle write or spill exceeds
  // 512 MB prints its callsite name — when a probe leg dies on disk, the
  // culprit operator line is in the log instead of being
  // reverse-engineered from temp_shuffle debris
  override def onStageCompleted(
      ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val si = ev.stageInfo
    val m = si.taskMetrics
    if (m != null) {
      val sw = m.shuffleWriteMetrics.bytesWritten
      val spill = m.diskBytesSpilled
      if (flightRecord) {
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stageRows.add(StageRow(si.stageId, si.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime,
          m.inputMetrics.bytesRead, sw,
          m.shuffleReadMetrics.totalBytesRead, spill, si.name))
      }
      if (sw > (512L << 20) || spill > (512L << 20))
        println(f"[probe-stage] id=${si.stageId} tasks=${si.numTasks} " +
          s"write=${fmt(sw)} spill=${fmt(spill)} " +
          s"rows=${m.shuffleWriteMetrics.recordsWritten} " +
          s"name=${si.name.linesIterator.nextOption().getOrElse("").take(100)}")
    }
  }

  def fmt(bytes: Long): String =
    if (bytes >= (1L << 30)) f"${bytes / (1024.0 * 1024 * 1024)}%.1fGB"
    else if (bytes >= (1L << 20)) f"${bytes / (1024.0 * 1024)}%.1fMB"
    else f"${bytes / 1024.0}%.1fKB"
}
