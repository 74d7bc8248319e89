package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (SURVEY.md §2 coverage);
  * `oracleSql` holds the DuckDB-dialect twin for every SQL-expressible query.
  * Column names are aliased identically on both sides (driver compare sorts
  * columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalQueries.q01_pricing_summary(
      Sessions.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all =
      operators.RelationalQueries.queries ++
        operators.DedupQueries.queries ++
        operators.SimilarityQueries.queries ++
        operators.TextQueries.queries ++
        operators.MultimodalQueries.queries ++
        operators.StreamingQueries.queries ++
        operators.CurationQueries.queries ++
        operators.SketchQueries.queries ++
        operators.GraphQueries.queries ++
        operators.TpchQueries.queries
    all.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(Sessions.tune(s), dir))
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (non-SQL-expressible ops).
    */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracles ++
      operators.DedupQueries.oracles ++
      operators.SimilarityQueries.oracles ++
      operators.TextQueries.oracles ++
      operators.MultimodalQueries.oracles ++
      operators.StreamingQueries.oracles ++
      operators.CurationQueries.oracles ++
      operators.SketchQueries.oracles ++
      operators.GraphQueries.oracles ++
      operators.TpchQueries.oracles
}
