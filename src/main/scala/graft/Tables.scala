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

  /** `events.ts` is parquet timestamp[ns]; Spark's TimestampType is
    * microsecond-precision. Reading nanos needs
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[Sessions]]), which
    * surfaces `ts` as a Long of nanos — normalized here to a µs-truncated
    * TimestampType column so every downstream query sees a plain timestamp.
    * DuckDB keeps full ns precision, so oracle-checked queries must truncate
    * `ts` to a common precision (we format to whole seconds) before compare.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral DIV, not `/`: ns epoch values (~1.7e18) exceed double's
        // exact-integer range, so floating division would corrupt low bits
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
      case _ => raw
    }
  }
}
