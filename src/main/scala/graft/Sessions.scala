package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify/Bench/tests agree.
  *
  * Settings are chosen for the 100 TB design point, then scaled down by env
  * for local runs:
  *  - AQE on: runtime shuffle coalescing + skew-join splitting replace any
  *    hand-tuned partition counts at cluster scale.
  *  - shuffle.partitions defaults to the local core count (32 on the test
  *    box); on a real cluster this would be ~2-3x total cores and AQE
  *    coalesces down.
  *  - UTC session timezone: required for DuckDB-oracle parity and the only
  *    sane choice for a multi-node deployment.
  *  - nanosAsLong: the `events` fixture carries timestamp[ns], which Spark's
  *    µs TimestampType cannot hold; see [[Tables.events]].
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def builder(master: String = s"local[$cpus]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Ensure an existing session (e.g. created by the driver's Verify/Bench
    * harness before our code runs) still gets the configs that are settable
    * at runtime. nanosAsLong is read at scan time, so setting it on the
    * conf of a live session works.
    */
  def tune(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    // engine-native functions, reachable from raw SQL text (idempotent)
    graft.functions.VectorFunctions.register(s)
    graft.functions.JlFunctions.register(s)
    graft.functions.TextFunctions.register(s)
    graft.functions.KllQuantiles.register(s)
    graft.functions.ThetaSketches.register(s)
    // discarded-rank window top-k -> native heap operator (idempotent add;
    // spark-submit deployments get the same rule via GraftExtensions). The
    // strategy must ride along: the rule can now introduce TopKPerGroupNode
    // into plans that never called the topK API themselves
    graft.plans.TopKPerGroup.install(s)
    if (!s.experimental.extraOptimizations.contains(graft.plans.TopKWindowRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.TopKWindowRewrite
    s
  }
}
