package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Whole-query JDBC pushdown (SURVEY.md §7 step 4).
  *
  * The reference shipped the entire SQL statement to MySQL and streamed the
  * result (`/root/reference/src/loader.py:228-234`); Spark's JDBC source
  * does exactly this with `option("query", sql)` — the statement runs
  * remotely and only result rows cross the wire. `numPartitions` +
  * `partitionColumn` bounds give parallel range reads when the remote
  * result is large (one connection per partition, as in the reference's
  * connection-per-request model, `src/loader.py:208-220`).
  *
  * Config-gated: there is no live RDBMS in this environment, so by default
  * only the option plumbing is exercised by tests; setting `GRAFT_MYSQL_URL`
  * (+ `GRAFT_MYSQL_USER`/`GRAFT_MYSQL_PASSWORD`) opts SourcesSpec into a
  * live round-trip against a real server.
  */
object JdbcWholeQuery {
  def reader(spark: SparkSession, url: String, sql: String,
             props: Map[String, String] = Map.empty): DataFrameReader = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .option("fetchsize", props.getOrElse("fetchsize", "10000"))
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
  }

  def load(spark: SparkSession, url: String, sql: String,
           props: Map[String, String] = Map.empty): DataFrame =
    reader(spark, url, sql, props).load()
}
