package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Persisted co-supplier co-occurrence store — the g-family's shared edge
  * generator (lineitem self-join on l_orderkey → per-pair co-occurrence
  * counts) built ONCE per corpus version and committed by a `_complete`
  * marker, exactly the s17/t24/d18 economics applied to graph structure:
  * at 100 TB the self-join + aggregate is the one expensive pass (it
  * shuffles the fact table), and every graph query thereafter reads a
  * pair-count table that is orders of magnitude smaller than lineitem.
  *
  * The SOURCE table is the monthly pair counts `(m, u, v, n)` — `m` the
  * integer month index since 1992-01, `n` the lineitem-pair count within
  * that month — because every co-occurrence projection derives from it
  * losslessly:
  *
  *   - global pair counts  = Σ over months (each lineitem pair belongs to
  *     exactly one order, each order to exactly one month, so the monthly
  *     counts PARTITION the global count) → g02-g06, g10-g14, g17;
  *   - the frequent graph  = global counts filtered `n >= CoSupport`;
  *   - the strongest-k graph (g12) = global counts ordered by `n`;
  *   - the temporal graphs (g16, g18) = the monthly rows themselves.
  *
  * Two derived tables are stored beside it at build time: the global
  * `pairs` rollup (read directly by most queries) and the distinct
  * customer→supplier `bipartite` projection (the order-graph family —
  * g01/g07/g08/g09 — whose orders×lineitem join is otherwise rebuilt
  * inline per query).
  *
  * The store is keyed by the IDENTITY of both inputs (size + mtime of
  * lineitem.parquet and orders.parquet, the ivfPqIndexDir discipline): a
  * regenerated dataset at the same path orphans the old store rather than
  * serving stale edges under a valid marker. Orders join LEFT so an
  * orphan orderkey (RI violation) could never silently change the global
  * counts vs. the oracle's plain self-join — its pairs land in a
  * null-month row that the global sum still includes and the monthly
  * views exclude (matching the oracles' inner join on orders).
  *
  * DuckDB oracles are UNCHANGED — they rebuild from lineitem per query,
  * so the hash gate cross-checks persistence losslessness on every run;
  * PlanInvariantsSpec pins that the query paths never rescan
  * lineitem.parquet once the marker exists.
  *
  * Reference scope: the co-occurrence projection itself is this engine's
  * §2C graph extension (SURVEY §2C); the reference (loader.py) has no
  * graph surface.
  */
object CoGraph {

  // v3: + the stored distinct customer->supplier `bipartite` projection
  // (a marker from a prior format must not satisfy the new reader, so
  // the version keys the dir)
  private val Version = "v3"

  private[graft] def coDir(d: String): String = {
    val li = new java.io.File(d, "lineitem.parquet")
    val or = new java.io.File(d, "orders.parquet")
    SketchQueries.partialsDir(
      s"co_${Version}_${li.length()}_${li.lastModified()}" +
        s"_${or.length()}_${or.lastModified()}", d)
  }

  /** OFFLINE build: one lineitem self-join + month-keyed aggregate,
    * written then marker-committed. Idempotent and cheap on re-entry: a
    * present marker skips the build entirely.
    */
  private[graft] def ensure(s: SparkSession, d: String): String = {
    val dir = coDir(d)
    if (new java.io.File(dir, "_complete").exists()) return dir
    val om = Tables.orders(s, d).select(col("o_orderkey"),
      (((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
        .cast("long")).as("m"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      // pin the pair-generation width ON THE JOIN KEY: the self-join's
      // ENSURE_REQUIREMENTS exchanges AQE-coalesce to ~cluster
      // parallelism by BYTES (34 tasks at the 100x probe, 193 s of
      // executor-run each) while the per-order pair fan-out and the
      // (m,u,v) partial-agg hash tables are per-task CPU/memory — on a
      // real cluster 34 tasks is the build's ceiling, and fatter
      // per-task agg state is the superlinear factor the 25x->100x
      // build walls showed (69.7 -> 374.7 s for 4x data). A user-pinned
      // hash repartition feeds both sides of the self-join
      // exchange-free at full width.
      .repartition(Tables.scanPartitions(s), col("l_orderkey"))
    li.alias("a")
      .join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .join(om, col("o_orderkey") === col("a.l_orderkey"), "left")
      .groupBy(col("m"), col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$dir/monthly")
    // the global rollup is stored too: it is the projection most queries
    // read, and summing it at build time (one cheap pass over the already
    // small monthly table) beats re-aggregating in every query plan
    s.read.parquet(s"$dir/monthly")
      .groupBy(col("u"), col("v")).agg(sum(col("n")).as("n"))
      .write.mode("overwrite").parquet(s"$dir/pairs")
    // the DISTINCT customer->supplier bipartite projection shares the
    // same inputs and serves the order-graph family (g01 pagerank, g07
    // personalized pagerank, g08 CF similarity, g09 degree distribution)
    // -- one orders x lineitem join paid at build time instead of inline
    // by each of the four
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
      .write.mode("overwrite").parquet(s"$dir/bipartite")
    new java.io.File(dir, "_complete").createNewFile()
    dir
  }

  /** Monthly pair counts `(m, u, v, n)` — rows with a resolvable order
    * month only (the temporal queries' inner-join-on-orders semantics).
    */
  def monthly(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/monthly").filter(col("m").isNotNull)

  /** Global pair counts `(u, v, n)` — the monthly partition summed back
    * up at BUILD time (null-month rows included, mirroring the oracle's
    * plain self-join) and stored; queries read the rollup directly.
    */
  def pairs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/pairs")

  /** The frequent co-supplier edge list `(u, v)` with `u < v` — the
    * projection g02-g05, g10, g11, g13-g15, g17 consume.
    */
  def frequentPairs(s: SparkSession, d: String, support: Int): DataFrame =
    pairs(s, d).filter(col("n") >= support).select(col("u"), col("v"))

  /** Distinct customer->supplier pairs `(cust, supp)` — the order-graph
    * projection g01/g07/g08/g09 consume.
    */
  def bipartite(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/bipartite")

  /** Registers `co_pairs (u, v, n)` as a temp view for the SQL-text query
    * paths (g02, g13-g15, g17).
    */
  private[graft] def registerPairsView(s: SparkSession, d: String): Unit =
    pairs(s, d).createOrReplaceTempView("co_pairs")

  /** Registers `co_monthly (m, u, v, n)` for the temporal query paths
    * (g16, g18).
    */
  private[graft] def registerMonthlyView(s: SparkSession, d: String): Unit =
    monthly(s, d).createOrReplaceTempView("co_monthly")
}
