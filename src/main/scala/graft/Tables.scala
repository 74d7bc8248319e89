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
