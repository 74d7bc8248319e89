package graft

import org.apache.spark.sql.SparkSession

/** Execution-scoped lifecycle for `localCheckpoint` blocks (round-8
  * verdict item 4).
  *
  * The operator library materializes intermediate frames with
  * `localCheckpoint()` at ~130 sites — the right call per query (one scan
  * feeding N branches), but each checkpoint pins MEMORY_AND_DISK blocks
  * that only the async ContextCleaner reaps after a driver GC. A
  * long-lived embedding that runs MANY queries in one session (Bench's
  * ~1,700 sf0.1 executions, `EtlRunner.publishRegistry` over the full
  * registry) therefore accumulates pinned storage without bound: round 8's
  * BENCH capture degraded monotonically until steady-state medians read
  * 7-60x above isolated warm truth.
  *
  * The fix is ownership, not instrumenting 130 sites: snapshot the
  * context's pinned-RDD ids on scope entry, run the work, unpersist every
  * id that appeared during the scope on exit. Within one query execution
  * the checkpoint blocks are alive exactly as before; across queries the
  * embedding drops them deterministically instead of waiting on GC.
  *
  * SAFETY CONTRACT: a local checkpoint truncates lineage — its blocks are
  * NOT recomputable. The scope body must therefore fully execute every
  * action that depends on frames it checkpointed (true for Bench's
  * `count()` and the ETL sink's `save()`), and must not leak a lazy
  * DataFrame for later consumption. Scopes may nest (inner scopes only
  * release ids they introduced), but must not run CONCURRENTLY on one
  * SparkContext at fine granularity: a scope exiting while a sibling is
  * mid-flight would unpersist the sibling's fresh blocks. For concurrent
  * batches (ETL `runParallel`) wrap the WHOLE batch, not each query.
  */
object Checkpoints {

  /** Run `body`; on exit unpersist every RDD pinned during it (and not
    * before it). Non-blocking unpersist: block deletion proceeds async
    * while the caller moves on, which is the cheap half of the cost.
    */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally {
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }

  /** Unpersist EVERY pinned RDD in the context; returns how many were
    * dropped. For serial per-entry harness loops (Bench) where nothing
    * pinned is ever reused across entries.
    */
  def releaseAll(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach(_.unpersist(blocking = false))
    rdds.size
  }

  /** Count of currently pinned RDDs — the spec hook: a publish/bench scope
    * that exits clean leaves this at (or returns it to) zero.
    */
  def pinnedCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size

  /** Release the blocks behind ONE checkpointed frame (the generational
    * twin of [[scoped]], for iterative fits whose round N+1 depends only
    * on round N: release generation N-1 the moment N is materialized,
    * instead of pinning every generation until scope exit). ROOT-ONLY by
    * design: it unpersists only when the frame IS a checkpoint (its
    * analyzed plan is the `LogicalRDD` itself) and is a no-op on derived
    * plans — a derived plan's LogicalRDD LEAVES are someone else's
    * checkpoints (typically a shared base like a store-read frame feeding
    * every round), and releasing those through a generation handle would
    * be the exact cross-frame accident [[scoped]]'s concurrency note
    * warns about. SAFETY: same contract as [[scoped]] — a
    * localCheckpoint's blocks are NOT recomputable, so the caller must
    * never evaluate `df` (or any plan built on it) after this call.
    */
  def release(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Sum of memory + disk bytes currently held by pinned RDD blocks — the
    * probe hook for the flat-peak evidence (a generational loop's pinned
    * footprint must stay ~one generation, not rounds x corpus).
    */
  def pinnedBytes(spark: SparkSession): Long = {
    val status = spark.sparkContext.getRDDStorageInfo
    status.map(i => i.memSize + i.diskSize).sum
  }
}
