package graft.plans

import scala.collection.mutable
import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/** Native per-group top-k operator (custom LogicalPlan + Strategy +
  * SparkPlan — SURVEY.md preference ladder (c)).
  *
  * The composable alternative (`row_number().over(window) <= k`, q12) must
  * SORT every group in full before ranking. This operator keeps a bounded
  * k-heap per group instead and runs in two phases, mirroring partial/final
  * hash aggregation:
  *
  *   partial (map-side, no distribution requirement): per-partition heaps —
  *     any row not in its partition's group top-k cannot be in the global
  *     top-k, so at most k rows per (group, partition) enter the shuffle;
  *   final (requires ClusteredDistribution on the group keys): re-heap the
  *     surviving candidates per group.
  *
  * At 100 TB the difference is a full sort + full-row shuffle vs an O(n log k)
  * scan + k-rows-per-group shuffle. Output rows within each group are emitted
  * in `ordering` order; callers must include a unique tie-break (same
  * contract as every rank query in this engine).
  *
  * Memory bound: each phase holds at most `spark.graft.topk.inMemoryRowLimit`
  * retained rows (groups-per-partition x k, default 4M) in heaps; when a
  * partition's group cardinality pushes past that, the partition falls back
  * to a disk-spilling sort (`UnsafeExternalRowSorter`, the engine behind
  * SortExec) ordered by (group keys, ordering) and streams out the first k
  * rows of each group — same output, bounded memory, like hash aggregate's
  * own sort-based fallback. The sort path needs orderable group keys (true
  * for every sane group-by column).
  */
case class TopKPerGroupNode(groupCols: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerGroupExec(groupCols: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val gCols = groupCols
    val ord = ordering
    val kk = k
    val rowLimit = conf.getConfString("spark.graft.topk.inMemoryRowLimit",
      "4194304").toInt
    val structType = DataTypeUtils.fromAttributes(schema)
    child.execute().mapPartitions({ it =>
      val grouping = UnsafeProjection.create(gCols, schema)
      val cmp = new LazilyGeneratedOrdering(ord, schema)
      // max-heap on the WORST retained row so the k best (cmp-smallest) stay
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]
      var retained = 0
      var sorter: UnsafeExternalRowSorter = null

      // spill fallback: (group keys asc, ordering) sort via the SortExec
      // machinery — memory-managed pages, disk spill, no OOM
      def newSorter(): UnsafeExternalRowSorter = {
        val fullOrd = gCols.map(e => SortOrder(e, Ascending)) ++ ord
        val fullCmp = new LazilyGeneratedOrdering(fullOrd, schema)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow) = { p.value = 0L; p.isNull = false; p }
        }
        UnsafeExternalRowSorter.create(structType, fullCmp, PrefixComparators.LONG,
          prefixComputer, SparkEnv.get.memoryManager.pageSizeBytes, false)
      }

      it.foreach { r =>
        val row = r.asInstanceOf[UnsafeRow]
        if (sorter != null) {
          sorter.insertRow(row)
        } else {
          val key = grouping(row)
          val existing = heaps.get(key)
          val grows = existing.forall(_.size < kk) // new group or non-full heap
          if (grows && retained >= rowLimit) {
            // this row would exceed the in-memory bound: drain the heaps
            // into the external sorter and continue sort-based
            sorter = newSorter()
            heaps.valuesIterator.foreach(h => h.forEach(sorter.insertRow(_)))
            heaps.clear()
            sorter.insertRow(row)
          } else existing match {
            case Some(heap) =>
              if (heap.size < kk) {
                heap.add(row.copy().asInstanceOf[UnsafeRow])
                retained += 1
              } else if (cmp.compare(row, heap.peek()) < 0) {
                heap.poll()
                heap.add(row.copy().asInstanceOf[UnsafeRow])
              }
            case None =>
              val heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, cmp.reversed())
              heap.add(row.copy().asInstanceOf[UnsafeRow])
              heaps.put(key.copy(), heap)
              retained += 1
          }
        }
      }

      if (sorter == null) {
        heaps.iterator.flatMap { case (_, heap) =>
          val arr = heap.toArray(new Array[UnsafeRow](heap.size))
          java.util.Arrays.sort(arr, cmp)
          arr.iterator
        }
      } else {
        // stream first-k-per-group off the sorted run; rows from the sorter
        // are volatile buffers — emit each before pulling the next, copy
        // only the group key
        val sorted = sorter.sort()
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var emitted = 0
          private var nextRow: UnsafeRow = null
          override def hasNext: Boolean = {
            if (nextRow != null) return true
            while (sorted.hasNext) {
              val r = sorted.next().asInstanceOf[UnsafeRow]
              val key = grouping(r)
              if (curKey == null || key != curKey) { curKey = key.copy(); emitted = 0 }
              if (emitted < kk) { emitted += 1; nextRow = r; return true }
            }
            false
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            val r = nextRow; nextRow = null; r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Plans TopKPerGroupNode as partial -> (exchange inserted by
  * EnsureRequirements) -> final.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      val partialExec = TopKPerGroupExec(g, o, k, planLater(child), partial = true)
      TopKPerGroupExec(g, o, k, partialExec, partial = false) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  /** Sort spec: column name + direction. */
  final case class Ord(name: String, desc: Boolean = false)

  /** Ensure the strategy is installed on this session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per group under `ordering` (include a unique tie-break).
    *
    * Attributes are resolved against the child's analyzed output here —
    * Spark 4's lazy Column nodes don't resolve inside third-party logical
    * operators, so the node must be built from bound AttributeReferences.
    */
  def topK(df: DataFrame, groupCols: Seq[String], ordering: Seq[Ord],
           k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val child = ColumnBridge.logicalPlan(df)
    def attr(n: String) = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"topK: no column '$n' in ${child.output.map(_.name).mkString(", ")}"))
    val g = groupCols.map(attr)
    val o = ordering.map(s =>
      SortOrder(attr(s.name), if (s.desc) Descending else Ascending))
    ColumnBridge.ofRows(spark, TopKPerGroupNode(g, o, k, child))
  }
}
