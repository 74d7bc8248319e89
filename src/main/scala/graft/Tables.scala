package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * The reference engine's "tables" were whatever MySQL exposed
  * (`/root/reference/src/loader.py:54-58, 231`); here the corpus is the
  * TPC-H-ish star schema plus `events`/`documents`/`embeddings`.
  *
  * Scale notes: these readers are plain `spark.read.parquet` scans so that
  * Catalyst predicate pushdown / column pruning reach the parquet footer
  * (verify with `.explain`: PushedFilters / ReadSchema). Nothing is cached
  * here — at 100 TB a cache would thrash; each query plans its own scan and
  * prunes to the columns it needs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan-side repartition width for EXPLODING operators (shingles,
    * character grams, token unnests). Parquet split sizing sees the
    * compressed file, not the 40-400× row blow-up an explode produces, so
    * a scan that "fits" in a handful of splits yields post-explode
    * partitions whose downstream hash aggregates exceed task memory — the
    * round-10 probe caught exactly that: at the 100× corpus the d17 gram
    * frame checkpointed into defaultParallelism=4 partitions (≈300M rows
    * each) and the df aggregate died with AGGREGATE_OUT_OF_MEMORY. The
    * session's `spark.sql.shuffle.partitions` IS the documented
    * size-to-target-SF knob, so the scan repartition follows it: at bench
    * scale both values agree (32) and plans are unchanged; a deep-scale
    * run that raises the shuffle knob now widens the scan with it.
    */
  def scanPartitions(s: SparkSession): Int =
    math.max(s.sparkContext.defaultParallelism,
      scala.util.Try(s.conf.get("spark.sql.shuffle.partitions").toInt)
        .getOrElse(32))

  /** Scale-adaptive width for CPU-heavy per-row work directly over a scan:
    * repartition to [[scanPartitions]] ONLY when the frame's physical plan
    * is narrower. The bench fixtures are single parquet files, so a bare
    * scan is ONE partition and any expensive projection/aggregate above it
    * serializes on one task (the r13 flight-sweep signature); a
    * production-scale scan is already thousands of splits wide and must
    * NOT pay a corpus-wide round-robin shuffle for width it has (guide
    * §2.4: no gratuitous exchanges). Project to the needed columns BEFORE
    * calling this so the conditional shuffle ships no payload it doesn't
    * have to (guide §2.3).
    */
  def widen(df: DataFrame): DataFrame = {
    val target = scanPartitions(df.sparkSession)
    if (scanWidth(df) < target) df.repartition(target) else df
  }

  /** Estimated partition count of the frame's leaf file scans, read off
    * scan metadata instead of `df.rdd.getNumPartitions` (round 14,
    * ADVICE/verdict: the RDD call instantiated the WHOLE physical RDD
    * graph on the driver per invocation — a per-query driver cost that
    * grows with production scan width, and a trap above any shuffle).
    * Uses the same `maxSplitBytes` the scan itself derives; the per-file
    * `ceil(len / maxSplit)` is exact for the splittable single-file bench
    * fixtures and a close over-approximation of FilePartition's greedy
    * packing for multi-file scans — over-approximating can only SKIP the
    * widen shuffle on an already-wide production scan, never add one.
    * Falls back to the RDD count for non-file leaves (checkpointed or
    * local relations), preserving the old behavior there.
    */
  private def scanWidth(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    val leaves = df.queryExecution.sparkPlan.collectLeaves()
    val fileScans = leaves.collect { case f: FileSourceScanExec => f }
    if (fileScans.nonEmpty && fileScans.size == leaves.size) {
      val est = fileScans.map { f =>
        val parts = f.relation.location.listFiles(Nil, Nil)
        val maxSplit = FilePartition.maxSplitBytes(df.sparkSession, parts)
        parts.iterator.flatMap(_.files.iterator)
          .map(st => math.max(1L, (st.getLen + maxSplit - 1) / maxSplit)).sum
      }.sum
      math.min(est, Int.MaxValue.toLong).toInt
    } else df.rdd.getNumPartitions
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` arrives in whatever parquet flavor the driver generated —
    * timestamp[ns] (surfaced as a Long of nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in [[Sessions]]),
    * timestamp[us] without a UTC flag (Spark reads TIMESTAMP_NTZ), or a
    * plain instant TimestampType. [[normalizeTs]] folds all three to a
    * µs-precision TimestampType so every downstream query sees one shape.
    * DuckDB reads the same file as a naive timestamp, so with the session
    * zone pinned to UTC `unix_micros` here == `epoch_us(ts::TIMESTAMP)`
    * there and oracle-checked queries compare exactly.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))

  /** Normalize an events-shaped frame's `ts` column to TimestampType —
    * shared by the batch reader above and the streaming readers in
    * [[graft.operators.StreamingQueries]]/StreamingSpec (a file stream
    * sees the same physical schema as the batch scan).
    */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral DIV, not `/`: ns epoch values (~1.7e18) exceed double's
        // exact-integer range, so floating division would corrupt low bits
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session zone is pinned UTC (Sessions.tune), so the NTZ wall
        // clock IS the instant; the cast changes type, not value
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
}
