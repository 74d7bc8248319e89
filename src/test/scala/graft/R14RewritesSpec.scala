package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 optimization rewrites pinned bit-equal to the spellings they
  * replaced (the KernelPropertiesSpec discipline, applied at query level):
  * each test executes the OLD formulation (the literal SQL text the oracle
  * still runs, or the replaced expression spelling) and the NEW execution
  * path on the same session and asserts row-for-row equality, doubles
  * compared bitwise. The DuckDB oracle gate is the authoritative check;
  * these fail fast in `sbt test` without an oracle round-trip.
  */
class R14RewritesSpec extends SparkTestBase {

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToRawLongBits(d)
      case v => v
    }.toList).toList.sortBy(_.mkString("|"))

  private def assertSameRows(old: DataFrame, nw: DataFrame, what: String): Unit = {
    val (a, b) = (rowsOf(old), rowsOf(nw))
    assert(a == b, s"$what: rewrite diverged from the replaced spelling")
  }

  test("d25: driver-side curve rows == the unrolled multiply-chain SQL") {
    assertSameRows(
      spark.sql(operators.DedupQueries.sCurveSql),
      SparkEntry.queries("d25_lsh_tuning_curve")(spark, sf),
      "d25_lsh_tuning_curve")
  }

  test("d36: driver-side curve rows == the unrolled auto-tune SQL") {
    assertSameRows(
      spark.sql(operators.DedupQueries.lshAutoTuneSql),
      SparkEntry.queries("d36_lsh_auto_tune")(spark, sf),
      "d36_lsh_auto_tune")
  }

  test("t30: materialized-vocabulary execution == the literal CTE text") {
    // run the new path first — it registers the repartitioned documents
    // view the literal text then reuses, so both see identical input
    val nw = SparkEntry.queries("t30_vocab_overlap")(spark, sf)
    val old = spark.sql(operators.TextQueries.t30Sql("div")
      .replace("$SPLIT$", "explode(split(text, ' '))"))
    assertSameRows(old, nw, "t30_vocab_overlap")
  }

  test("g22: materialized adj/deg execution == the literal CTE text") {
    val nw = SparkEntry.queries("g22_random_walks")(spark, sf)
    val old = spark.sql(
      operators.GraphQueries.g22Sql(operators.GraphQueries.coStored))
    assertSameRows(old, nw, "g22_random_walks")
  }

  test("s36 scorer: per-row norms + dot_product kernel == per-pair HOF folds") {
    // the replaced spelling, verbatim (three interpreted folds per pair)
    val oldSim =
      "CAST(floor(1000.0D * CAST(aggregate(zip_with(q_qv, qv, (a, b) -> a * b), 0L, (acc, v) -> acc + v) AS DOUBLE)" +
        " / (sqrt(CAST(aggregate(transform(q_qv, v -> v * v), 0L, (acc, v) -> acc + v) AS DOUBLE))" +
        " * sqrt(CAST(aggregate(transform(qv, v -> v * v), 0L, (acc, v) -> acc + v) AS DOUBLE)))) AS BIGINT)"
    val base = Tables.embeddings(spark, sf)
      .withColumn("__amax",
        expr("array_max(transform(CAST(embedding AS ARRAY<DOUBLE>), v -> abs(v)))"))
      .withColumn("q", expr(
        "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * (127.0D / __amax)) AS BIGINT))"))
      .select(col("vec_id"), col("q"))
    val qa = base.filter(col("vec_id") % 3 === 0).limit(25)
      .select(col("vec_id").as("q_id"), col("q").as("q_qv"))
    val qb = base.filter(col("vec_id") % 3 === 1).limit(25)
      .select(col("vec_id"), col("q").as("qv"))
    val pairs = qb.crossJoin(broadcast(qa)).localCheckpoint()
    val old = pairs.withColumn("sim_pm", expr(oldSim))
      .select(col("q_id"), col("vec_id"), col("sim_pm"))
    def nrm(c: String) = sqrt(expr(
      s"CAST(aggregate(transform($c, v -> v * v), 0L, (acc, v) -> acc + v) AS DOUBLE)"))
    val nw = pairs
      .withColumn("q_qvd", expr("transform(q_qv, v -> CAST(v AS DOUBLE))"))
      .withColumn("qvd", expr("transform(qv, v -> CAST(v AS DOUBLE))"))
      .withColumn("sim_pm",
        floor(lit(1000.0) * graft.functions.VectorFunctions
          .dot_product(col("q_qvd"), col("qvd"))
          / (nrm("q_qv") * nrm("qv"))).cast("long"))
      .select(col("q_id"), col("vec_id"), col("sim_pm"))
    assertSameRows(old, nw, "s36 scorer")
    assert(old.count() == 625)
  }

  test("widen: plan-metadata gate widens narrow file scans, skips wide frames") {
    val target = Tables.scanPartitions(spark)
    val scan = Tables.documents(spark, sf).select("doc_id")
    assert(Tables.widen(scan).rdd.getNumPartitions == target,
      "bare single-file scan must be widened to scanPartitions")
    // non-file leaf (checkpointed frame): falls back to the RDD count —
    // an already-wide frame must NOT pay another exchange
    val wide = Tables.documents(spark, sf).select("doc_id")
      .repartition(target + 7).localCheckpoint()
    assert(Tables.widen(wide).rdd.getNumPartitions == target + 7,
      "already-wide frame must pass through unrepartitioned")
  }
}
