package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format surface (SURVEY §2B scans row: Parquet/CSV/JSON/JDBC).
  * Parquet is exercised everywhere; these pin CSV and JSON round-trips with
  * explicit schemas (schema-on-read, no inference job at scale) and the
  * JDBC whole-query option plumbing.
  */
class SourcesSpec extends SparkTestBase {

  test("csv round-trip with explicit schema preserves an aggregate") {
    val dir = Files.createTempDirectory("csv_src").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    val a = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = back.groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("json round-trip including nested props map") {
    val dir = Files.createTempDirectory("json_src").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), MapType(StringType, LongType)).as("props"))
    ev.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("props", MapType(StringType, LongType))))
    val back = spark.read.schema(schema).json(dir)
    val total = back.select(sum(element_at(col("props"), "k"))).head().getLong(0)
    val expect = ev.select(sum(element_at(col("props"), "k"))).head().getLong(0)
    assert(total == expect && total > 0)
  }

  test("orc round-trip preserves values and pushes filters to the scan") {
    val dir = Files.createTempDirectory("orc_src").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("event_type") === "click")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"), plan.take(600))
    assert(back.count() == ev.filter(col("event_type") === "click").count())
  }

  test("jdbc whole-query plumbing reaches the JDBC layer (no live DB here)") {
    val ex = intercept[Exception] {
      graft.sources.JdbcWholeQuery.load(spark,
        "jdbc:mysql://nowhere:3306/db", "SELECT 1 AS one")
    }
    // failure must come from JDBC connectivity, not option wiring
    val msg = String.valueOf(ex.getMessage).toLowerCase
    assert(msg.contains("driver") || msg.contains("connect"), s"unexpected: $msg")
  }
}
