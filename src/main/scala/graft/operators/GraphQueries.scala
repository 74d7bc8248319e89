package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.TopKPerGroup

/** Link-graph analytics over the order graph — the quality-signal family a
  * web-corpus curation pipeline runs before training-data selection
  * (Common-Crawl-style pipelines rank pages/domains by link centrality and
  * feed the rank into keep/drop decisions; the reference's users would run
  * the same shape over any edge list MySQL could hold,
  * `/root/reference/src/loader.py:231`).
  *
  * The graph: customer -> supplier edges from co-occurrence in an order
  * (orders x lineitem), deduplicated. Node ids are disambiguated into one
  * id space arithmetically (cust*2, supp*2+1) so both partitions live in
  * one BIGINT column.
  *
  * Scale shape: each power-iteration round is ONE equi-join (edges x ranks
  * on src — both sides hash-partitioned on the join key) + ONE map-side
  * partial sum keyed by dst + a left join back to the node list. Rounds are
  * fixed (5), lineage is cut per round with localCheckpoint, and nothing
  * driver-side ever holds a rank vector — at 100 TB this is the standard
  * Pregel-free PageRank-on-joins layout where AQE splits any
  * high-in-degree hub's partition.
  *
  * Determinism: ranks are integer micro-units (1e6 = rank 1.0) and every
  * update is integer arithmetic — `rank div outdeg` contributions, damped
  * as `150000 + (85 * sum) div 100`. Integer sums are exactly associative,
  * so the result is bit-identical across partitionings AND across engines:
  * the DuckDB oracle unrolls the same 5 iterations and the rank VALUES
  * hash-check (no float drift window). Dangling mass (suppliers have no
  * out-edges) is dropped, the common pruned-PageRank simplification; ranks
  * are relative signals, not a probability distribution.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Iters = 5
  private val Unit_ = 1000000L // micro-rank scale: 1.0 == 1e6

  /** (edges, out-degrees, nodes) of the order graph, each checkpointed so
    * the power iterations rescan materialized blocks, not orders x lineitem.
    */
  private[graft] def graphParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val edges = CoGraph.bipartite(s, d)
      .select((col("cust") * 2).as("src"), (col("supp") * 2 + 1).as("dst"))
      .localCheckpoint() // feeds every iteration; the join was paid at build
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("od"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    (edges, outdeg, nodes)
  }

  /** One un-checkpointed power-iteration round — split out so
    * PlanInvariantsSpec can pin its physical shape (keyed hash joins +
    * partial-aggregated sum; never a nested loop).
    */
  private[graft] def pagerankRound(edges: DataFrame, outdeg: DataFrame,
                                   nodes: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = edges
      .join(outdeg, "src")
      .join(ranks.select(col("node").as("src"), col("r")), "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(expr("r div od")).as("c"))
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        expr(s"150000L + (85L * coalesce(c, 0L)) div 100L").as("r"))
  }

  def g01_pagerank(s: SparkSession, d: String): DataFrame = {
    val (edges, outdeg, nodes) = graphParts(s, d)
    var ranks = nodes.withColumn("r", lit(Unit_))
    // no per-round checkpoint: with a FIXED small iteration count over
    // already-checkpointed inputs the 5-deep join tree is one job —
    // per-round materialization cost ~5 jobs for no lineage benefit
    // (a convergence-driven loop like d10's checkpoints every round
    // because its round count is unbounded)
    for (_ <- 1 to Iters) {
      ranks = pagerankRound(edges, outdeg, nodes, ranks)
    }
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Support threshold for the frequent co-supplier projection (g02-g04):
    * pairs must co-occur in >= this many orders. 10, not higher: the
    * co-occurrence counts THIN as the supplier pool grows with SF (30
    * empties the graph at sf0.1 — the bench SF — where 10 leaves 114
    * edges), and a support cut that zeroes the working set measures
    * nothing. Real corpora tune this to the projection density they want;
    * the shapes below don't depend on the value.
    */
  private val CoSupport = 10

  /** The frequent-co CTE body rebuilt inline from a registered `lineitem`
    * view — the form the DuckDB oracles and the planted-graph spec
    * helpers drive. Production Spark paths read [[CoGraph]]'s persisted
    * pair counts instead (identical rows by construction — the monthly
    * counts partition the global count — and the unchanged oracles
    * cross-check losslessness on every gate run).
    */
  private def coRebuild: String =
    s"""SELECT a.l_suppkey AS u, b.l_suppkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $CoSupport""".stripMargin

  /** The same projection served from the persisted store's `co_pairs`
    * view ([[CoGraph.registerPairsView]]) — no lineitem rescan.
    */
  private[graft] def coStored: String =
    s"SELECT u, v FROM co_pairs WHERE n >= $CoSupport"

  /** Triangle counting + global clustering coefficient over the frequent
    * co-supplier graph (suppliers co-occurring in >= [[CoSupport]] orders)
    * — the
    * community-structure statistic link-graph curation monitors. The SQL
    * is the degree-ordered "forward" algorithm (Schank & Wagner '05):
    * every undirected edge is oriented from its lower-(degree, id)
    * endpoint, wedges are generated only at each edge's SMALLER endpoint,
    * and closure is one more equi-join. At 100 TB this orientation is the
    * whole ballgame: a hub of degree D generates wedges at its low-degree
    * neighbors instead of D^2/2 at itself, bounding the join fan-out to
    * sum(min-degree per edge) — the standard bound of O(E^1.5) — with AQE
    * splitting any residual skew. Pure integer counts -> hash-green with
    * the identical SQL text as the DuckDB oracle. The support threshold
    * (HAVING count(*) >= CoSupport) is the frequent-co-occurrence cut that keeps
    * a real-world projection sparse; the wedge denominator comes from the
    * degree sum, never a second wedge enumeration.
    */
  private def g02Sql(co: String): String =
    s"""WITH co AS (
      |  $co),
      |und AS (SELECT u, v FROM co UNION ALL SELECT v AS u, u AS v FROM co),
      |deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY 1),
      |dir AS (
      |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND c.u < c.v)
      |              THEN c.u ELSE c.v END AS src,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND c.u < c.v)
      |              THEN c.v ELSE c.u END AS dst
      |  FROM co c JOIN deg du ON du.node = c.u JOIN deg dv ON dv.node = c.v),
      |wedge AS (
      |  SELECT e1.dst AS v, e2.dst AS w
      |  FROM dir e1 JOIN dir e2 ON e1.src = e2.src
      |  JOIN deg dv ON dv.node = e1.dst
      |  JOIN deg dw ON dw.node = e2.dst
      |  WHERE dv.d < dw.d OR (dv.d = dw.d AND e1.dst < e2.dst)),
      |tri AS (SELECT count(*) AS nt FROM wedge t
      |        JOIN dir d3 ON d3.src = t.v AND d3.dst = t.w),
      |wcnt AS (SELECT CAST(CAST(sum(d * (d - 1)) AS DOUBLE) / 2 AS BIGINT) AS nw
      |         FROM deg)
      |SELECT tri.nt AS n_triangles, w.nw AS n_wedges,
      |       round(CAST(3 AS DOUBLE) * tri.nt / w.nw, 9) AS clustering_coeff
      |FROM tri CROSS JOIN wcnt w""".stripMargin

  def g02_triangles(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerPairsView(s, d)
    s.sql(g02Sql(coStored))
  }

  /** The triangle SQL over whatever `lineitem` view is registered —
    * separated so the spec can cross-check the degree-ordered counting on
    * a hand-built graph with a known answer (K4 -> 4 triangles, coeff 1).
    */
  private[graft] def trianglesFromView(s: SparkSession): DataFrame =
    s.sql(g02Sql(coRebuild))

  /** Connected components of the frequent co-supplier graph — supplier
    * "communities" from the same thresholded projection as g02, resolved
    * by the LARGE-STAR/SMALL-STAR contraction already proven O(log n) on
    * adversarial diameters for document dedup ([[DedupQueries.starContract]],
    * Kiveris et al. SoCC'14). Registering it over a second, unrelated
    * graph shows the component machinery is generic engine surface, not a
    * dedup-special-case; the oracle is the same recursive-CTE reachability
    * pattern as d10/d13's.
    */
  def g03_components(s: SparkSession, d: String): DataFrame = {
    val pairs = CoGraph.frequentPairs(s, d, CoSupport)
      .select(col("u").as("doc_a"), col("v").as("doc_b"))
    DedupQueries.starContract(pairs)
      .select(col("doc_id").as("node"), col("cluster_rep").as("component"))
  }

  /** BFS hop distance (bounded breadth-first search) from the smallest
    * supplier in the frequent co-supplier graph — the "degrees of
    * separation" / neighborhood-radius query curation runs to scope a
    * crawl frontier or measure how tightly a community is knit. Shape per
    * round: ONE equi-join (current distances × edges on the node key) +
    * ONE map-side-partial min-aggregate — the standard BFS-on-joins
    * layout; the round count is the fixed hop budget (6), so lineage
    * stays one bounded tree over the checkpointed edge list and nothing
    * driver-side ever holds a distance vector. Integer hop counts →
    * hash-green against a recursive-CTE oracle bounded by the same
    * budget; nodes unreachable within 6 hops are absent from both sides.
    *
    * Shares [[CoSupport]] with g02/g03; an empty graph (threshold too
    * high for the corpus) returns an empty frame rather than failing on
    * the NULL source.
    */
  private val Hops = 6

  def g04_bfs_hops(s: SparkSession, d: String): DataFrame = {
    val co = CoGraph.frequentPairs(s, d, CoSupport)
    // symmetrize by explode, not union-of-two-selects: a union would read
    // the stored pair counts once per branch inside the checkpoint job
    val edges = co.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint() // feeds every round; ONE store read
    // driver-tiny scalar (one source id), same as KMeans' k centroids
    val srcRow = edges.agg(min(col("src"))).head()
    if (srcRow.isNullAt(0))
      return s.range(0).select(col("id").as("node"), col("id").as("hops"))
    val source = srcRow.getLong(0)
    var dist = edges.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("h"))
    for (_ <- 1 to Hops) {
      val expanded = dist.join(edges, dist("node") === edges("src"))
        .select(col("dst").as("node"), (col("h") + 1).as("h"))
      // re-aggregating the full frontier each round keeps the round a pure
      // join+min (no changed-set bookkeeping); the state is one row per
      // reached node, never more
      val next = dist.union(expanded)
        .groupBy(col("node")).agg(min(col("h")).as("h"))
        .localCheckpoint()
      // gen N-1 dead once next materializes (root-only: the round-1 lazy
      // seed is a no-op and the shared edges checkpoint is never touched)
      graft.Checkpoints.release(dist)
      dist = next
    }
    dist.select(col("node"), col("h").as("hops"))
  }

  /** k-core decomposition (iterative peeling) of the frequent co-supplier
    * graph — the density filter link-graph curation uses to find the
    * tightly-knit community a crawl should prioritize (a node is in the
    * k-core iff it keeps >= k neighbors after everything of lower degree
    * is recursively removed). Shape per peel round: ONE double semi-join
    * (edges restricted to surviving endpoints) + ONE map-side-partial
    * count + the degree filter — no windows, no driver-held state, each
    * round's survivor set checkpointed so lineage stays flat. The round
    * count is a FIXED compute budget ([[KCoreRounds]]); both engines
    * unroll the identical budget, so the result hash-checks even on a
    * graph that hasn't fully converged (the spec proves the fixture
    * converges well inside it). Integer degrees -> hash-green.
    */
  private val KCoreK = 3
  private val KCoreRounds = 8

  def g05_kcore(s: SparkSession, d: String): DataFrame = {
    val co = CoGraph.frequentPairs(s, d, CoSupport)
    val edges = co.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint() // feeds every peel round; ONE store read
    kcoreFrom(edges, KCoreK, KCoreRounds)
  }

  /** g10: k-TRUSS decomposition — the EDGE-level cohesion criterion next
    * to g05's node-level k-core (Cohen '08): an edge survives iff it sits
    * in >= k-2 triangles whose other two edges also survive; iterate to a
    * fixpoint. Trusses are the standard community-core primitive (every
    * k-truss is a (k-1)-core, but not vice versa — a k-core can be a
    * sparse star-of-stars while a truss demands local triangle density).
    *
    * Per round: one support computation (edge list joined twice against
    * the symmetrized adjacency of the CURRENT survivor set — wedge rows
    * generate per edge-neighbor pair, never nodes²) + one integer filter,
    * survivor edges checkpointed so lineage stays flat and later rounds
    * join against a monotonically shrinking working set (g05's peel
    * economics at edge granularity). The round count is a FIXED budget
    * unrolled identically in the DuckDB oracle, so the result hash-checks
    * even short of convergence; TrussSpec-style planted-graph assertions
    * in QueriesSpec prove the cascade (a clique's edges all survive, a
    * pendant triangle chain peels) and that the sf fixture converges
    * inside the budget. Integer supports -> hash-green. At 100 TB the
    * wedge join is the honest cost of truss decomposition (it IS triangle
    * counting per round); the df-capped / degree-oriented variants of g02
    * apply unchanged if hubs appear.
    */
  private val TrussK = 4
  private val TrussRounds = 3

  def g10_ktruss(s: SparkSession, d: String): DataFrame =
    trussFrom(CoGraph.frequentPairs(s, d, CoSupport), TrussK, TrussRounds)

  /** g11: seeded HARMONIC centrality — the practical form of
    * closeness/harmonic centrality at scale (Boldi & Vigna '14: harmonic
    * handles disconnected graphs where closeness degenerates): exact
    * all-pairs BFS is O(V·E), so production systems estimate centrality
    * from a fixed SEED SAMPLE (Eppstein–Wang '04) — here the 5 smallest
    * node ids (deterministic; a real run would hash-sample). One
    * multi-source BFS carries (seed, node, h) state — g04's join+min
    * round shape keyed by seed as well as node, so the state is at most
    * |seeds|·|nodes| rows and every round is ONE keyed join + ONE min
    * aggregate. Centrality(v) = Σ_seeds 1000000 div d(s,v) in integer
    * micro-units (d > 0; unreached seeds contribute nothing) — pure
    * integer arithmetic against the identically-unrolled recursive-CTE
    * oracle -> hash-green.
    */
  def g11_harmonic_centrality(s: SparkSession, d: String): DataFrame = {
    val co = CoGraph.frequentPairs(s, d, CoSupport)
    val edges = co.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    val seeds = edges.select(col("src")).distinct()
      .orderBy(col("src")).limit(5)
      .select(col("src").as("seed"))
    var dist = seeds.select(col("seed"), col("seed").as("node"), lit(0L).as("h"))
    for (_ <- 1 to Hops) {
      val expanded = dist.join(edges, dist("node") === edges("src"))
        .select(col("seed"), col("dst").as("node"), (col("h") + 1).as("h"))
      val next = dist.union(expanded)
        .groupBy(col("seed"), col("node")).agg(min(col("h")).as("h"))
        .localCheckpoint()
      graft.Checkpoints.release(dist) // gen N-1 (t17 discipline; round-1 no-op)
      dist = next
    }
    dist.filter(col("h") > 0)
      .groupBy(col("node"))
      .agg(sum(expr("1000000 div h")).as("harmonic_micro"),
        count(lit(1)).as("n_seeds_reached"))
  }

  /** g12: LINK PREDICTION scores — the "who should be connected next"
    * primitive behind recommendation and graph completion (Liben-Nowell &
    * Kleinberg '03): for every non-adjacent supplier pair at distance 2,
    * the common-neighbors count and the resource-allocation index
    * Σ_z 1/deg(z) over shared neighbors z (Zhou et al. '09 — RA
    * outperforms plain counts because hub neighbors carry less signal).
    * RA rides integer micro-units (1000000 div deg — g11's discipline),
    * so both scores hash-check. Shape: candidate pairs generate per
    * SHARED NEIGHBOR (g08's wedge economics — never suppliers²), degree
    * prices arrive by one keyed join on the wedge center, and the
    * existing-edge anti join removes already-linked pairs. Top-20 by
    * (ra desc, pair) through the native heaps.
    */
  def g12_link_prediction(s: SparkSession, d: String): DataFrame = {
    // top-200 STRONGEST co-occurrence edges, not a fixed count threshold:
    // a threshold that leaves the small-SF projection near-complete makes
    // "non-adjacent distance-2 pair" vacuous (every pair is linked), and
    // one that suits small SF empties sf0.1 — the k-bounded strongest-edge
    // graph is sparse by construction at EVERY scale, and it is also the
    // scale-safe form (the edge list entering the wedge join is k rows)
    val co = CoGraph.pairs(s, d)
      .orderBy(col("n").desc, col("u"), col("v")).limit(200)
      .select(col("u"), col("v"))
    linkPredictionFrom(co)
  }

  /** The scoring core over a canonical (u < v) edge list — separated so
    * the spec can drive a planted graph (the sf0.001 fixture has only 10
    * suppliers, whose strongest-edge projection is complete and so has no
    * non-adjacent pair to predict; sf0.01+ exercise the full path).
    */
  private[graft] def linkPredictionFrom(co: DataFrame): DataFrame = {
    val adj = co.select(explode(array(
        struct(col("u").as("z"), col("v").as("n")),
        struct(col("v").as("z"), col("u").as("n")))).as("e"))
      .select(col("e.z").as("z"), col("e.n").as("n"))
      .localCheckpoint() // feeds wedges, degrees, and the anti join
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val wedges = adj.as("l").join(adj.as("r"), col("l.z") === col("r.z"))
      .filter(col("l.n") < col("r.n"))
      .select(col("l.n").as("a"), col("r.n").as("b"), col("l.z").as("z"))
    val scored = wedges.join(deg, "z")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("1000000 div deg")).as("ra_micro"))
      .join(co, col("a") === col("u") && col("b") === col("v"), "left_anti")
    TopKPerGroup.topK(scored.withColumn("g", lit(1)),
      Seq("g"), Seq(TopKPerGroup.Ord("ra_micro", desc = true),
        TopKPerGroup.Ord("a"), TopKPerGroup.Ord("b")), 20)
      .select(col("a"), col("b"), col("common_neighbors"), col("ra_micro"))
  }

  /** g13: degree ASSORTATIVITY — Newman's (PRL'02) mixing coefficient,
    * the one-number answer to "do hubs link to hubs?" that the
    * graph-health panel (g09 degree fit, g02 clustering) reads before
    * trusting any link-derived quality signal: the Pearson correlation of
    * endpoint degrees over the directed edge list (both directions of
    * each undirected edge, the standard convention). Every sum is an
    * exact integer (degrees x degrees), so the closed-form correlation is
    * one final double region over identical int64s on both engines —
    * q67's recipe on graph structure. One degree aggregate + two keyed
    * joins + one global sum: scan-shaped at any graph size.
    */
  private def g13Sql(co: String): String =
    s"""WITH co AS (
      |  $co),
      |und AS (SELECT u, v FROM co UNION ALL SELECT v, u FROM co),
      |deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY u),
      |e AS (
      |  SELECT du.d AS x, dv.d AS y
      |  FROM und JOIN deg du ON du.node = und.u
      |           JOIN deg dv ON dv.node = und.v),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM e)
      |SELECT n AS n_directed_edges,
      |       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
      |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
      |                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |                        * CAST(n * syy - sy * sy AS DOUBLE)), 9) END
      |         AS assortativity
      |FROM sums""".stripMargin

  def g13_assortativity(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerPairsView(s, d)
    s.sql(g13Sql(coStored))
  }

  /** g14: LOCAL clustering coefficient (Watts–Strogatz) — g02 reports the
    * graph's ONE transitivity number; this is the per-node field the
    * curation pipeline actually joins against (a node embedded in a dense
    * clique is a different quality signal than a same-degree star hub —
    * link farms score near 0 here while organic communities score high).
    * Per node: triangle count via the canonical a<b<c enumeration (each
    * triangle materialized exactly ONCE — the information-theoretic floor,
    * same argument as g10's support kernel — then exploded to its three
    * corners), degree from the symmetrized adjacency, and
    *
    *   {{{coeff_micro = 2 * tri(v) * 1e6  div  deg(v) * (deg(v) - 1)}}}
    *
    * in integer micro-units (exact on both engines -> hash-green; deg<2
    * nodes are defined 0). Scale shape: the co-graph build is the shared
    * group-agg, the triangle join is edge-oriented (never wedge-per-node
    * quadratic at hubs), and the rest is two keyed aggregates.
    */
  private def g14Sql(co: String): String =
    s"""WITH co AS (
      |  $co),
      |und AS (SELECT u, v FROM co UNION ALL SELECT v, u FROM co),
      |deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY u),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM co e1 JOIN co e2 ON e2.u = e1.v
      |  JOIN co e3 ON e3.u = e1.u AND e3.v = e2.v),
      |pt AS (
      |  SELECT node, count(*) AS t FROM (
      |    SELECT a AS node FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri) x
      |  GROUP BY node)
      |SELECT deg.node, deg.d AS degree,
      |       COALESCE(pt.t, 0) AS n_triangles,
      |       CASE WHEN deg.d >= 2
      |            THEN (2 * COALESCE(pt.t, 0) * 1000000) $$DIV$$ (deg.d * (deg.d - 1))
      |            ELSE 0 END AS coeff_micro
      |FROM deg LEFT JOIN pt ON pt.node = deg.node""".stripMargin

  /** g15: attribute MODULARITY (Newman & Girvan) — "how much of the
    * co-purchase structure does the supplier's NATION explain?": the
    * modularity of the co-supplier graph under the partition given by an
    * existing node attribute, the one-number check a curation pipeline
    * runs before trusting a metadata field as a grouping signal (domains
    * as communities, languages as communities). For communities c with
    * within-edges e_c and degree sums d_c over m undirected edges,
    *
    *   {{{Q = sum_c (e_c / m  -  (d_c / 2m)^2)}}}
    *
    * computed as ONE integer division: numerator sum_c (4·m·e_c - d_c²),
    * denominator 4·m² — exact int64 arithmetic at any graph size that
    * fits edge counts (m up to ~2e4 here; 4m² ~ 1.6e9, x1e6 micro-scale
    * still << 2^63), and truncation agrees across engines for negative Q
    * (both truncate toward zero). Scale shape: the co-graph aggregate,
    * two keyed joins against the broadcast-size supplier attribute, and
    * two community-keyed aggregates — no iteration, no per-node state.
    */
  private def g15Sql(co: String): String =
    s"""WITH co AS (
      |  $co),
      |und AS (SELECT u, v FROM co UNION ALL SELECT v, u FROM co),
      |nat AS (SELECT s_suppkey AS node, s_nationkey AS comm FROM supplier),
      |deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY u),
      |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM co),
      |ec AS (
      |  SELECT na.comm, CAST(count(*) AS BIGINT) AS e_c
      |  FROM co JOIN nat na ON na.node = co.u
      |          JOIN nat nb ON nb.node = co.v AND nb.comm = na.comm
      |  GROUP BY na.comm),
      |dc AS (
      |  SELECT nat.comm, CAST(sum(deg.d) AS BIGINT) AS d_c
      |  FROM deg JOIN nat ON nat.node = deg.node
      |  GROUP BY nat.comm),
      |agg AS (
      |  SELECT CAST(sum(4 * mm.m * coalesce(ec.e_c, 0) - dc.d_c * dc.d_c)
      |              AS BIGINT) AS num,
      |         min(mm.m) AS m,
      |         count(*) AS n_communities
      |  FROM dc CROSS JOIN mm LEFT JOIN ec ON ec.comm = dc.comm)
      |SELECT m AS n_edges, n_communities,
      |       (1000000 * num) $$DIV$$ (4 * m * m) AS modularity_micro
      |FROM agg""".stripMargin

  /** The modularity SQL over registered `lineitem` + `supplier` views —
    * separated so the spec can pin planted partitions (two disjoint
    * cliques labeled apart -> strongly positive; labeled across -> the
    * same magnitude negative... exact values asserted).
    */
  private[graft] def modularityFromViews(s: SparkSession): DataFrame =
    s.sql(g15Sql(coRebuild).replace("$DIV$", "div"))

  def g15_modularity(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerPairsView(s, d)
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    s.sql(g15Sql(coStored).replace("$DIV$", "div"))
  }

  /** g21: LABEL-PROPAGATION community detection (Raghavan et al. 2007),
    * month-keyed — g15 scores a partition someone else supplies (nations);
    * this DISCOVERS one from structure alone, per monthly graph snapshot
    * (the global co-graph is a near-clique where every method returns one
    * block; the monthly graphs are where structure lives — g16's point).
    * Every node starts as its own label, and for four SYNCHRONOUS rounds
    * each node adopts its neighbors' most frequent label (ties → smallest
    * label, so the fixpoint is deterministic — asynchronous LPA is
    * run-order-dependent and unreproducible, the wrong choice for a data
    * pipeline). Output is one row per (month, community) with size,
    * internal edges, degree mass and the community's modularity
    * CONTRIBUTION within its month, micro units. Division is
    * sign-separated (magnitude `div` then negate) because Spark truncates
    * toward zero while DuckDB floors — negative contributions are the
    * common case for fragment communities.
    *
    * Scale shape: month rides EVERY join key, so all 79 monthly LPAs run
    * in the same four keyed rounds (join-per-round like g01 — months add
    * keys, never rounds); reads the persisted monthly co-graph, never
    * lineitem. The oracle rebuilds from raw lineitem+orders with the
    * identical unrolled text.
    */
  def g21_labelprop(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerMonthlyView(s, d)
    chainMaterialized(s, g21CoStored, g21Tail.replace("$DIV$", "div"))
  }

  /** Run a label-chain consumer with `co` and the 4-round LPA chain
    * MATERIALIZED once (localCheckpoint + temp view) instead of inlined
    * per reference: Spark inlines CTEs, so the literal g21/g23/g24 SQL
    * texts re-evaluate the whole und→l0→…→l4 chain once per l4 reference
    * (2-3× per query — g23's executed plan carried 120 Exchanges with
    * only 7 reused; the d32 CTE-inlining lesson applied to the graph
    * family). The tail text is the same string the oracle builders
    * compose, so semantics — and the hash gate — are unchanged.
    *
    * View names are UNIQUE per invocation and dropped before returning
    * (round 14, ADVICE: fixed session-global names meant two graph
    * queries built concurrently on one session would silently compute one
    * query's LPA chain over the other's co-frame; `s.sql` analyzes
    * eagerly, so the returned frame no longer needs the catalog entries).
    */
  private val matSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def chainMaterialized(s: SparkSession, co: String,
      tail: String): DataFrame = {
    val id = matSeq.incrementAndGet()
    val coV = s"g21_co_mat_$id"
    val l4V = s"g21_l4_mat_$id"
    val coDf = s.sql(co).localCheckpoint()
    coDf.createOrReplaceTempView(coV)
    val l4 = s.sql(s"WITH ${g21Chain(s"SELECT month, u, v FROM $coV")}\n" +
      "SELECT month, node, lbl FROM l4").localCheckpoint()
    l4.createOrReplaceTempView(l4V)
    val out = s.sql(
      s"""WITH co AS (SELECT month, u, v FROM $coV),
         |und AS (SELECT month, u, v FROM co UNION ALL SELECT month, v, u FROM co),
         |l4 AS (SELECT month, node, lbl FROM $l4V),
         |$tail""".stripMargin)
    s.catalog.dropTempView(coV)
    s.catalog.dropTempView(l4V)
    out
  }

  /** g22: RANDOM-WALK CORPUS generation — the graph-ML data op (DeepWalk /
    * node2vec): emit fixed-length walks over the co-supplier graph, the
    * sequences a skip-gram embedding trains on. Walks are DETERMINISTIC —
    * at each step the walker picks the neighbor whose adjacency RANK is an
    * LCG hash of (walk, step, current) mod degree — because a training
    * corpus you cannot regenerate bit-identically is a provenance hole
    * (the c01/s02 no-RNG discipline applied to graph sampling). One walk
    * starts per node, 4 steps, output (walk_id, step, node) — long-format
    * sequences, 5 rows per walk.
    *
    * Scale shape: adjacency ranks are one window over u (graph-sized, not
    * corpus-sized); each step is one keyed join on (cur, rank) — steps
    * are rounds, walks are keys, so a billion walks still take exactly 4
    * joins. Reads the persisted co-graph; the oracle rebuilds from raw
    * lineitem with identical unrolled text.
    */
  def g22_random_walks(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerPairsView(s, d)
    // Round 14 (verdict item 3): Spark inlines CTEs, so the literal
    // g22Sql text re-evaluated the co→und→window `adj` subtree once per
    // step reference (4×) and `deg` five times (w0 + every step) — the
    // same duplication class chainMaterialized fixed for g21/g23/g24.
    // Materialize adj once (graph-sized), derive deg from it (same rows:
    // adj is und + a rank column), and run the walk steps over the
    // materialized views. The SQL text the oracle executes (g22Sql) is
    // unchanged.
    val id = matSeq.incrementAndGet()
    val adjV = s"g22_adj_mat_$id"
    val degV = s"g22_deg_mat_$id"
    val adj = s.sql(
      s"""WITH co AS (
         |  $coStored),
         |und AS (SELECT u, v FROM co UNION ALL SELECT v, u FROM co)
         |SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rn
         |FROM und""".stripMargin).localCheckpoint()
    adj.createOrReplaceTempView(adjV)
    val deg = s.sql(s"SELECT u, count(*) AS d FROM $adjV GROUP BY 1")
      .localCheckpoint()
    deg.createOrReplaceTempView(degV)
    val out = s.sql(
      s"""WITH adj AS (SELECT u, v, rn FROM $adjV),
         |deg AS (SELECT u, d FROM $degV),
         |$g22Tail""".stripMargin)
    s.catalog.dropTempView(adjV)
    s.catalog.dropTempView(degV)
    out
  }

  private def g22Step(prev: String, cur: String, t: Int): String =
    s"""$cur AS (
       |  SELECT p.walk, a.v AS node
       |  FROM $prev p
       |  JOIN deg dg ON dg.u = p.node
       |  JOIN adj a ON a.u = p.node
       |   AND a.rn = ((p.walk * 2654435761 + $t * 40503 + p.node * 69621)
       |               % 2147483648) % dg.d)""".stripMargin

  private val g22Tail: String =
    s"""w0 AS (SELECT u AS walk, u AS node FROM deg),
       |${g22Step("w0", "w1", 1)},
       |${g22Step("w1", "w2", 2)},
       |${g22Step("w2", "w3", 3)},
       |${g22Step("w3", "w4", 4)}
       |SELECT walk AS walk_id, CAST(0 AS BIGINT) AS step, node FROM w0
       |UNION ALL SELECT walk, CAST(1 AS BIGINT), node FROM w1
       |UNION ALL SELECT walk, CAST(2 AS BIGINT), node FROM w2
       |UNION ALL SELECT walk, CAST(3 AS BIGINT), node FROM w3
       |UNION ALL SELECT walk, CAST(4 AS BIGINT), node FROM w4""".stripMargin

  private[graft] def g22Sql(co: String): String =
    s"""WITH co AS (
       |  $co),
       |und AS (SELECT u, v FROM co UNION ALL SELECT v, u FROM co),
       |adj AS (
       |  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rn
       |  FROM und),
       |deg AS (SELECT u, count(*) AS d FROM und GROUP BY 1),
       |$g22Tail""".stripMargin

  /** g23: COMMUNITY CHURN — month-over-month stability of g21's discovered
    * communities, the drift monitor that must run before any
    * community-derived feature (mixture slot, dedup block, trust score)
    * is trusted across snapshots: for each adjacent month pair, every
    * community is matched to its best-overlap successor (argmax member
    * overlap, ties to the smallest label) and counted SURVIVED only when
    * the overlap is a strict majority of BOTH sides — the standard
    * community-tracking rule that filters out splits and merges
    * masquerading as survival. Months are the STORED integer indices, so
    * adjacency is `m + 1` (no date parsing); the whole panel is two copies
    * of g21's label chain joined on (node, m+1), all keyed joins.
    */
  def g23_community_churn(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerMonthlyView(s, d)
    chainMaterialized(s, "SELECT m AS month, u, v FROM co_monthly WHERE n >= 2",
      g23Tail)
  }

  /** g23's SQL over registered `lineitem`/`orders` views (oracle form). */
  private[graft] def g23CoRebuild: String =
    """SELECT m.month, a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM lineitem a
      |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |                 AND a.l_suppkey < b.l_suppkey
      |  JOIN (SELECT o_orderkey,
      |               (CAST(substring(CAST(CAST(o_orderdate AS DATE) AS $STR$),
      |                               1, 4) AS INT) - 1992) * 12
      |               + CAST(substring(CAST(CAST(o_orderdate AS DATE) AS $STR$),
      |                                6, 2) AS INT) - 1 AS month
      |        FROM orders) m ON m.o_orderkey = a.l_orderkey
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin

  private[graft] def g23Sql(co: String): String =
    s"WITH ${g21Chain(co)},\n$g23Tail"

  private val g23Tail: String =
    s"""sizes AS (
       |  SELECT month, lbl, count(*) AS sz FROM l4 GROUP BY 1, 2),
       |ov AS (
       |  SELECT a.month AS m, a.lbl AS ca, b.lbl AS cb, count(*) AS overlap
       |  FROM l4 a JOIN l4 b ON b.node = a.node AND b.month = a.month + 1
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT m, ca, cb, overlap FROM (
       |    SELECT m, ca, cb, overlap,
       |           row_number() OVER (PARTITION BY m, ca
       |               ORDER BY overlap DESC, cb) AS rk
       |    FROM ov) t WHERE rk = 1),
       |surv AS (
       |  SELECT b.m, count(*) AS n_matched,
       |         CAST(sum(CASE WHEN b.overlap * 2 > sa.sz
       |                        AND b.overlap * 2 > sb.sz
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_survived
       |  FROM best b
       |  JOIN sizes sa ON sa.month = b.m AND sa.lbl = b.ca
       |  JOIN sizes sb ON sb.month = b.m + 1 AND sb.lbl = b.cb
       |  GROUP BY 1),
       |counts AS (
       |  SELECT month, CAST(count(*) AS BIGINT) AS n_comms
       |  FROM sizes GROUP BY 1)
       |SELECT CAST(s2.m AS BIGINT) AS month, ca.n_comms AS n_comms_from,
       |       cb.n_comms AS n_comms_to, s2.n_matched, s2.n_survived
       |FROM surv s2
       |JOIN counts ca ON ca.month = s2.m
       |JOIN counts cb ON cb.month = s2.m + 1""".stripMargin

  /** g24: GRAPH COARSENING — the community SUPER-GRAPH: g21's discovered
    * communities become super-nodes and every cross-community edge folds
    * into a weighted super-edge (canonicalized min/max label order) — the
    * summarization step hierarchical graph pipelines recurse on (Louvain's
    * second phase), and the "which communities talk to each other" view a
    * mixture designer reads. Per month on stored integer indices; two
    * label-join passes over the monthly co-graph, group-by-fold to the
    * super-edge list (strictly smaller than the input graph by
    * construction).
    */
  def g24_community_graph(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerMonthlyView(s, d)
    chainMaterialized(s, "SELECT m AS month, u, v FROM co_monthly WHERE n >= 2",
      g24Tail)
  }

  private[graft] def g24Sql(co: String): String =
    s"WITH ${g21Chain(co)},\n$g24Tail"

  private val g24Tail: String =
    s"""x AS (
       |  SELECT co.month, la.lbl AS ca, lb.lbl AS cb
       |  FROM co JOIN l4 la ON la.month = co.month AND la.node = co.u
       |          JOIN l4 lb ON lb.month = co.month AND lb.node = co.v
       |  WHERE la.lbl <> lb.lbl)
       |SELECT CAST(month AS BIGINT) AS month,
       |       least(ca, cb) AS comm_a, greatest(ca, cb) AS comm_b,
       |       count(*) AS n_edges
       |FROM x GROUP BY 1, 2, 3""".stripMargin

  /** g21's SQL over registered `lineitem`/`orders` views — the
    * planted-partition spec drives this form directly (two disjoint
    * cliques must come back as exactly two communities labeled by their
    * minima).
    */
  private[graft] def labelPropFromViews(s: SparkSession): DataFrame =
    s.sql(g21Sql(g21CoRebuild).replace("$DIV$", "div")
      .replace("$STR$", "STRING"))

  private val g21CoRebuild: String =
    """SELECT m.month, a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM lineitem a
      |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |                 AND a.l_suppkey < b.l_suppkey
      |  JOIN (SELECT o_orderkey,
      |               substring(CAST(CAST(o_orderdate AS DATE) AS $STR$), 1, 7)
      |                 AS month
      |        FROM orders) m ON m.o_orderkey = a.l_orderkey
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin

  private val g21CoStored: String =
    """SELECT format_string('%04d-%02d', 1992 + m div 12, m % 12 + 1) AS month,
      |         u, v FROM co_monthly WHERE n >= 2""".stripMargin

  private def g21Round(prev: String, cur: String): String =
    s"""v$cur AS (
       |  SELECT e.month, e.u AS node, l.lbl, count(*) AS n
       |  FROM und e JOIN $prev l ON l.month = e.month AND l.node = e.v
       |  GROUP BY 1, 2, 3),
       |$cur AS (
       |  SELECT month, node, lbl FROM (
       |    SELECT month, node, lbl,
       |           row_number() OVER (PARTITION BY month, node
       |               ORDER BY n DESC, lbl) AS rk FROM v$cur) t
       |  WHERE rk = 1)""".stripMargin

  /** The co → und → 4 LPA rounds CTE prefix, shared by g21 (communities
    * + modularity) and g23 (month-over-month churn, integer months).
    */
  private def g21Chain(co: String): String =
    s"""co AS (
       |  $co),
       |und AS (SELECT month, u, v FROM co
       |        UNION ALL SELECT month, v, u FROM co),
       |l0 AS (SELECT DISTINCT month, u AS node, u AS lbl FROM und),
       |${g21Round("l0", "l1")},
       |${g21Round("l1", "l2")},
       |${g21Round("l2", "l3")},
       |${g21Round("l3", "l4")}""".stripMargin

  private def g21Sql(co: String): String =
    s"WITH ${g21Chain(co)},\n$g21Tail"

  private val g21Tail: String =
    s"""deg AS (SELECT month, u AS node, count(*) AS d FROM und GROUP BY 1, 2),
       |mm AS (SELECT month, CAST(count(*) AS BIGINT) AS m FROM co GROUP BY 1),
       |ec AS (
       |  SELECT co.month, la.lbl AS comm, CAST(count(*) AS BIGINT) AS e_c
       |  FROM co JOIN l4 la ON la.month = co.month AND la.node = co.u
       |          JOIN l4 lb ON lb.month = co.month AND lb.node = co.v
       |                    AND lb.lbl = la.lbl
       |  GROUP BY 1, 2),
       |dc AS (
       |  SELECT l4.month, l4.lbl AS comm, CAST(count(*) AS BIGINT) AS n_nodes,
       |         CAST(sum(deg.d) AS BIGINT) AS d_c
       |  FROM l4 JOIN deg ON deg.month = l4.month AND deg.node = l4.node
       |  GROUP BY 1, 2),
       |contrib AS (
       |  SELECT dc.month, dc.comm, dc.n_nodes,
       |         CAST(coalesce(ec.e_c, 0) AS BIGINT) AS e_c, dc.d_c,
       |         4 * mm.m * coalesce(ec.e_c, 0) - dc.d_c * dc.d_c AS num,
       |         4 * mm.m * mm.m AS den
       |  FROM dc JOIN mm ON mm.month = dc.month
       |  LEFT JOIN ec ON ec.month = dc.month AND ec.comm = dc.comm)
       |SELECT month, comm, n_nodes, e_c, d_c,
       |       CASE WHEN num >= 0 THEN (1000000 * num) $$DIV$$ den
       |            ELSE -((1000000 * (-num)) $$DIV$$ den) END AS q_contrib_micro
       |FROM contrib""".stripMargin

  /** g16: temporal graph EVOLUTION panel — the co-supplier graph rebuilt
    * per order-month with its structural vitals (nodes, edges, density,
    * mean degree), the "is the link structure drifting" monitor a
    * continuously-ingested corpus needs before trusting any
    * centrality-derived quality signal trained on last month's shape.
    * Monthly graphs are sparser, so co-occurrence support >= 2 within the
    * month replaces the global cut; density and mean degree are integer
    * micro/per-mille divisions -> hash-green. Scale shape: ONE
    * month-keyed self-join + aggregate builds every monthly edge list in
    * the same shuffle (month rides the join key — no per-month passes),
    * then two tiny keyed aggregates; months only add keys, never rounds.
    */
  /** The monthly-co CTE prefix rebuilt from lineitem+orders views (oracle
    * + spec form) vs. served from the stored monthly counts (production
    * form — the month string is reconstructed arithmetically from the
    * stored month index, bit-identical to the date-substring spelling).
    */
  private val g16CoRebuild: String =
    """om AS (
      |  SELECT o_orderkey, substring(CAST(CAST(o_orderdate AS DATE) AS $STR$), 1, 7)
      |           AS month
      |  FROM orders),
      |co AS (
      |  SELECT m.month, a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM lineitem a
      |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |                 AND a.l_suppkey < b.l_suppkey
      |  JOIN om m ON m.o_orderkey = a.l_orderkey
      |  GROUP BY m.month, a.l_suppkey, b.l_suppkey
      |  HAVING count(*) >= 2)""".stripMargin

  private val g16CoStored: String =
    """co AS (
      |  SELECT format_string('%04d-%02d', 1992 + m div 12, m % 12 + 1) AS month,
      |         u, v
      |  FROM co_monthly WHERE n >= 2)""".stripMargin

  private def g16Sql(co: String): String =
    s"""WITH $co,
      |nodes AS (
      |  SELECT month, count(*) AS n_nodes FROM (
      |    SELECT month, u AS node FROM co
      |    UNION SELECT month, v FROM co) x
      |  GROUP BY month),
      |edges AS (SELECT month, count(*) AS n_edges FROM co GROUP BY month)
      |SELECT n.month, n.n_nodes, e.n_edges,
      |       CASE WHEN n.n_nodes >= 2
      |            THEN (2 * e.n_edges * 1000) $$DIV$$ (n.n_nodes * (n.n_nodes - 1))
      |            ELSE 0 END AS density_pm,
      |       (2 * e.n_edges * 1000000) $$DIV$$ n.n_nodes AS mean_degree_micro
      |FROM nodes n JOIN edges e ON e.month = n.month""".stripMargin

  def g16_graph_evolution(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerMonthlyView(s, d)
    s.sql(g16Sql(g16CoStored).replace("$DIV$", "div"))
  }

  /** The per-node coefficient SQL over whatever `lineitem` view is
    * registered — separated (g02's pattern) so the spec can pin planted
    * graphs: K4 -> every corner coeff 1e6; a star -> hub and leaves 0.
    */
  private[graft] def localClusteringFromView(s: SparkSession): DataFrame =
    s.sql(g14Sql(coRebuild).replace("$DIV$", "div"))

  def g14_local_clustering(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerPairsView(s, d)
    s.sql(g14Sql(coStored).replace("$DIV$", "div"))
  }

  /** The truss peel over a canonical (u < v) edge list — separated so the
    * spec can drive a planted graph. Returns surviving edges with their
    * final triangle support.
    */
  private[graft] def trussFrom(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    // support via ORIENTED triangle enumeration, not wedges-per-edge: the
    // first cut joined every edge against the full adjacency of one
    // endpoint (|E| x avg-degree intermediate rows — 400M/round on the
    // 10x-densified probe graph, 752 s wall). Enumerating each triangle
    // exactly once at its canonical a<b<c orientation makes the
    // intermediate row count the TRIANGLE count (the information-theoretic
    // floor for exact support), and a 3-way explode + count distributes
    // each triangle to its three edges. Output-identical integers; the
    // DuckDB oracle keeps the wedge formulation, so the two engines now
    // cross-validate through genuinely different algorithms.
    def support(e: DataFrame): DataFrame = {
      val tri = e.as("ab").join(e.as("bc"), col("ab.v") === col("bc.u"))
        .join(e.as("ac"),
          col("ac.u") === col("ab.u") && col("ac.v") === col("bc.v"))
        .select(col("ab.u").as("a"), col("ab.v").as("b"), col("bc.v").as("c"))
      tri.select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("c").as("v")),
          struct(col("a").as("u"), col("c").as("v")))).as("t"))
        .groupBy(col("t.u").as("u"), col("t.v").as("v"))
        .agg(count(lit(1)).as("sup"))
    }
    var e = edges0.select(col("u"), col("v")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val next = support(e).filter(col("sup") >= k - 2)
        .select(col("u"), col("v")).localCheckpoint()
      graft.Checkpoints.release(e) // gen N-1: consumed building next (t17 discipline)
      e = next
    }
    support(e).filter(col("sup") >= k - 2) // final gen stays for the caller's action
  }

  /** The peel loop over an already-symmetrized edge list — separated so
    * the spec can prove the cascade on a hand-built graph (a clique
    * survives a k-peel; a path hanging off it peels away completely).
    */
  private[graft] def kcoreFrom(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // peel EDGES, not just nodes: each round keeps only edges whose both
    // endpoints survived, so later rounds join against a monotonically
    // shrinking working set instead of re-filtering the full edge list —
    // equivalent by induction (survivors_i ⊆ survivors_{i-1}, so
    // restricting the already-restricted edges yields the same subgraph),
    // and the property that makes the peel cheap at 100 TB: total work is
    // bounded by the SHRINKING frontier, not rounds × full-graph
    var alive = edges
    var owned = false // whether `alive` is a generation this loop checkpointed
    for (_ <- 1 to rounds) {
      val survivors = alive
        .groupBy(col("src"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("node"))
      val next = alive
        .join(survivors.select(col("node").as("src")), "src")
        .join(survivors.select(col("node").as("dst")), "dst")
        .localCheckpoint()
      // release only generations THIS loop created: round 1's prev is the
      // caller's edges frame (possibly itself a checkpoint the caller
      // still reads) — ownership, not rootness, is the release test here
      if (owned) graft.Checkpoints.release(alive)
      alive = next
      owned = true
    }
    alive.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** g17: 4-CYCLE (square) census — the motif one step past g02's
    * triangles: squares are the bipartite-ish redundancy signature
    * (two nodes sharing TWO+ distinct neighbors — co-purchase rings,
    * mirror/scraper pairs in a link graph) that triangle counts miss
    * entirely on bipartite-leaning graphs. Identity: every square has
    * two diagonals, and a pair with c common neighbors closes C(c,2)
    * squares through itself, so n_squares = Σ_{u<v} C(codeg(u,v), 2) / 2
    * — one wedge join (2-paths through each middle node) + one pair
    * aggregate, never cycle enumeration. Wedge fan-out is the g12/g14
    * bound (Σ deg² over the support-thinned projection; AQE splits any
    * residual hub). Pure integers, identical SQL both engines →
    * hash-green; K4-and-square planted spec pins the closed forms.
    */
  private def g17Sql(co: String, div: String): String =
    s"""WITH co AS (
       |  $co),
       |und AS (SELECT u, v FROM co UNION ALL SELECT v AS u, u AS v FROM co),
       |codeg AS (
       |  SELECT a.u AS x, b.v AS y, CAST(count(*) AS BIGINT) AS cd
       |  FROM und a JOIN und b ON a.v = b.u AND a.u < b.v
       |  GROUP BY 1, 2)
       |SELECT CAST(sum(cd * (cd - 1)) AS BIGINT) $div 4 AS n_squares,
       |       CAST(count(*) AS BIGINT) AS n_connected_pairs,
       |       CAST(max(cd) AS BIGINT) AS max_codegree
       |FROM codeg""".stripMargin

  def g17_squares(s: SparkSession, d: String): DataFrame = {
    CoGraph.registerPairsView(s, d)
    s.sql(g17Sql(coStored, "div"))
  }

  /** The census over any registered `lineitem` view — split out so the
    * spec can plant a known co-occurrence structure.
    */
  private[graft] def squaresFromViews(s: SparkSession): DataFrame =
    s.sql(g17Sql(coRebuild, "div"))

  /** g18: TIME-RESPECTING reachability (Holme & Saramäki's temporal
    * paths) — the semantics static BFS (g04) cannot express: influence
    * only flows along edges whose timestamps are NON-DECREASING on the
    * path, so a partner acquired in 1995 cannot forward something
    * received through a 1993-only tie. Edges are g16's monthly
    * co-supplier projection keyed by integer month index; state is one
    * (node, earliest_arrival_month) row; each of the 6 bounded rounds is
    * one keyed join (edges usable only when month ≥ the source's
    * arrival) + one min aggregate — g04's shape with the temporal
    * constraint in the join predicate. The DuckDB oracle unrolls the
    * identical rounds as a CTE chain; integer months → hash-green.
    * Spec contrasts against STATIC reachability on the union graph:
    * time-ignorant BFS reaches a superset, and the fixture plants the
    * gap. At 100 TB: rounds are join-bound in |temporal edges|, state
    * is one row per node, months add edge keys, never rounds.
    */
  private def g18Sql(div: String): String = {
    val rounds = (1 to 6).map { i =>
      s"""r$i AS (
         |  SELECT node, CAST(min(arr) AS BIGINT) AS arr FROM (
         |    SELECT node, arr FROM r${i - 1}
         |    UNION ALL
         |    SELECT e.v AS node, e.m AS arr
         |    FROM und e JOIN r${i - 1} s ON s.node = e.u AND e.m >= s.arr) t
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH om AS (
       |  SELECT o_orderkey,
       |         CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
       |              AS BIGINT) AS m
       |  FROM orders),
       |co AS (
       |  SELECT om.m, a.l_suppkey AS u, b.l_suppkey AS v
       |  FROM lineitem a
       |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |                 AND a.l_suppkey < b.l_suppkey
       |  JOIN om ON om.o_orderkey = a.l_orderkey
       |  GROUP BY om.m, a.l_suppkey, b.l_suppkey
       |  HAVING count(*) >= 2),
       |und AS (SELECT m, u, v FROM co UNION ALL SELECT m, v AS u, u AS v FROM co),
       |seed AS (SELECT min(u) AS node FROM und),
       |r0 AS (SELECT node, CAST(-1 AS BIGINT) AS arr FROM seed),
       |$rounds
       |SELECT node, arr AS arrival_month FROM r6""".stripMargin
  }

  def g18_temporal_reach(s: SparkSession, d: String): DataFrame = {
    // the SQL spelling re-evaluates the co-occurrence projection once per
    // round (CTE inlining — the d32 lesson: 20.7 s at sf0.1); the
    // persisted store goes further: the projection is built ONCE PER
    // CORPUS ([[CoGraph]]), not once per call, and the rounds run as
    // DataFrame joins over the stored monthly counts
    val co = CoGraph.monthly(s, d).filter(col("n") >= 2)
      .select(col("m"), col("u"), col("v"))
    val und = co.unionByName(co.select(col("m"), col("v").as("u"), col("u").as("v")))
      .localCheckpoint() // one store read serves all six rounds
    val seed = und.agg(min(col("u")).as("node"))
    var state = seed.withColumn("arr", lit(-1L))
    var prevCk: DataFrame = null
    for (_ <- 1 to 6) {
      // each round reads `state` twice (carry + expand) — checkpoint the
      // (≤|nodes|-row) state so the plan doesn't double per round. Gen
      // N-1's checkpoint is read while materializing gen N's (the lazy
      // round transform below), so it releases HERE, one round later
      // (t17 discipline, shifted by the lazy tail)
      val ck = state.localCheckpoint()
      if (prevCk != null) graft.Checkpoints.release(prevCk)
      prevCk = ck
      state = ck
        .unionByName(
          und.join(ck.select(col("node").as("u"), col("arr")), "u")
            .filter(col("m") >= col("arr"))
            .select(col("v").as("node"), col("m").as("arr")))
        .groupBy(col("node")).agg(min(col("arr")).cast("long").as("arr"))
    }
    state.select(col("node"), col("arr").as("arrival_month"))
  }

  /** The reachability over registered views — split out so the spec can
    * plant a temporal chain whose static union-graph reach is larger.
    */
  private[graft] def temporalReachFromViews(s: SparkSession): DataFrame =
    s.sql(g18Sql("div"))

  val queries: Map[String, Q] = Map(
    "g18_temporal_reach" -> (g18_temporal_reach _),
    "g17_squares" -> (g17_squares _),
    "g01_pagerank" -> (g01_pagerank _),
    "g02_triangles" -> (g02_triangles _),
    "g03_components" -> (g03_components _),
    "g04_bfs_hops" -> (g04_bfs_hops _),
    "g05_kcore" -> (g05_kcore _),
    "g10_ktruss" -> (g10_ktruss _),
    "g11_harmonic_centrality" -> (g11_harmonic_centrality _),
    "g12_link_prediction" -> (g12_link_prediction _),
    "g13_assortativity" -> (g13_assortativity _),
    "g14_local_clustering" -> (g14_local_clustering _),
    "g24_community_graph" -> (g24_community_graph _),
    "g23_community_churn" -> (g23_community_churn _),
    "g22_random_walks" -> (g22_random_walks _),
    "g21_labelprop" -> (g21_labelprop _),
    "g15_modularity" -> (g15_modularity _),
    "g16_graph_evolution" -> (g16_graph_evolution _),
    "g06_weighted_paths" -> (g06_weighted_paths _),
    "g07_ppr" -> (g07_ppr _),
    "g08_cf_similarity" -> (g08_cf_similarity _),
    "g09_degree_dist" -> (g09_degree_dist _),
    "g20_graph_audit" -> (g20_graph_audit _),
    "g19_hits" -> (g19_hits _),
  )

  /** g06: bounded-hop WEIGHTED shortest paths (Bellman-Ford rounds over
    * the min-plus semiring) — g04's BFS with real edge costs: co-supplier
    * edges are priced inversely to co-occurrence strength (w = 1000 div
    * count: frequently-paired suppliers are "close"), and after R rounds
    * each node holds the cheapest cost over paths of <= R edges from the
    * source. Per round: ONE keyed join + ONE min aggregate over a state
    * of one row per reached node (never per path) — the iteration shape
    * that survives any graph size; the oracle unrolls the identical
    * rounds as chained CTEs over the per-round node table, so the
    * all-integer distances hash-check.
    */
  def g06_weighted_paths(s: SparkSession, d: String): DataFrame = {
    val co = CoGraph.pairs(s, d).filter(col("n") >= CoSupport)
      .select(col("u"), col("v"), col("n").as("c"))
    val edges = co.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst"), col("c")),
        struct(col("v").as("src"), col("u").as("dst"), col("c")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        expr("1000 div e.c").cast("long").as("w"))
      .localCheckpoint() // feeds every round; ONE store read
    val srcRow = edges.agg(min(col("src"))).head()
    if (srcRow.isNullAt(0))
      return s.range(0).select(col("id").as("node"), col("id").as("dist"))
    val source = srcRow.getLong(0)
    var dist = edges.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
    for (_ <- 1 to Hops) {
      val expanded = dist.join(edges, dist("node") === edges("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.union(expanded)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      graft.Checkpoints.release(dist) // gen N-1 (t17 discipline; round-1 no-op)
      dist = next
    }
    dist.select(col("node"), col("dist"))
  }

  /** g07: PERSONALIZED PageRank — g01's power iteration with the teleport
    * mass restricted to a seed set (customers of one nation), the
    * "similar-to-these" centrality a curation pipeline uses to expand a
    * trusted seed list into a ranked crawl frontier (the TrustRank /
    * seed-expansion shape). Per round the ONLY change from g01 is the
    * restart term: `is_seed * 150000` instead of a global 150000, so the
    * rank mass decays with distance from the seeds and untouched nodes
    * stay at exactly 0 — the final `r > 0` filter returns just the seed
    * neighborhood, which is the point of the personalized variant (output
    * is |reachable-from-seeds|, not |V|). Scale shape is identical to g01
    * (one keyed join + one partial-aggregated sum per round, seeds
    * broadcast-joined); integer micro-units end to end, so the DuckDB
    * oracle unrolls the same 5 rounds and the values hash-check.
    */
  def g07_ppr(s: SparkSession, d: String): DataFrame = {
    val (edges, outdeg, nodes) = graphParts(s, d)
    val seeds = Tables.customer(s, d)
      .filter(col("c_nationkey") === 0)
      .select((col("c_custkey") * 2).as("node"), lit(1L).as("is_seed"))
    // the seed flag is static per node: join it ONCE and carry it through
    // the rounds (joining seeds inside the loop costs an extra join x
    // Iters — the 10x probe showed 35 s vs g01's 11 s before this fold)
    val seededNodes = nodes.join(broadcast(seeds), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint()
    var ranks = seededNodes.select(col("node"), (col("is_seed") * Unit_).as("r"))
    for (_ <- 1 to Iters) {
      val contrib = edges
        .join(outdeg, "src")
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div od")).as("c"))
      ranks = seededNodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("is_seed") * 150000L +
            expr("(85L * coalesce(c, 0L)) div 100L")).as("r"))
    }
    ranks.filter(col("r") > 0).select(col("node"), col("r").as("rank"))
  }

  /** g08: item-item COLLABORATIVE-FILTERING similarity — "suppliers like
    * this one" from co-purchase structure (the neighborhood-method
    * recommender primitive; Amazon's classic item-item CF): suppliers are
    * vectors over the customers who bought from them, similarity is the
    * cosine co(a,b) / sqrt(deg a * deg b) over those binary vectors.
    * Shape: distinct customer->supplier edges (one orders x lineitem
    * pass), self-join keyed ON CUSTOMER so pairs generate per shared
    * customer (never supplier x supplier), count-aggregate to co(a,b),
    * then a broadcast-joined degree table prices the cosine. At 100 TB
    * the fan-out is bounded the d05/g02 way: a hub customer of degree D
    * contributes D^2/2 pairs, so the support cut (co >= [[CoSupport]])
    * plus AQE skew splits are what keep the projection sparse — same
    * economics as every co-occurrence projection in this file. cosine =
    * round(co / sqrt(da * db), 9): integer inputs, one sqrt, one divide —
    * bit-identical cross-engine, so the pairs AND scores hash-check.
    */
  def g08_cf_similarity(s: SparkSession, d: String): DataFrame = {
    val edges = CoGraph.bipartite(s, d)
      // widen BEFORE checkpointing: the store reads 5-wide at bench SF
      // and the checkpoint freezes that width, serializing the pair
      // join's compute onto 5 tasks (flight-recorded 8.8 s run / 2.2 s
      // wall in one stage)
      .repartition(graft.Tables.scanPartitions(s))
      .localCheckpoint() // feeds the pair join AND the degree table
    val deg = edges.groupBy(col("supp")).agg(count(lit(1)).as("deg"))
    val co = edges.as("a").join(edges.as("b"),
        col("a.cust") === col("b.cust") && col("a.supp") < col("b.supp"))
      .groupBy(col("a.supp").as("sa"), col("b.supp").as("sb"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= CoSupport)
    co.join(broadcast(deg.select(col("supp").as("sa"), col("deg").as("da"))), "sa")
      .join(broadcast(deg.select(col("supp").as("sb"), col("deg").as("db"))), "sb")
      .select(col("sa"), col("sb"), col("co"),
        round(col("co") / sqrt(col("da") * col("db")), 9).as("cosine"))
  }

  /** g09: DEGREE distribution + power-law fit — the graph-health panel a
    * link-curation pipeline reads before trusting centrality signals
    * (heavy-tailed in-degree is why g01's hub handling and AQE skew
    * splits exist; a bent tail flags spam farms or collector artifacts —
    * t20's Zipf diagnostic applied to graph structure). Supplier
    * in-degree over the customer->supplier edge set, histogrammed, with
    * the complementary CDF share per degree and the continuous-MLE
    * exponent alpha = 1 + N / Σ ln(deg) (Clauset-Shalizi-Newman form,
    * d_min = 1) carried on each row. The CCDF window and the alpha
    * reduction both run over |distinct degrees| rows — metadata-sized at
    * any corpus scale (the histogram IS the sketch). The Σ ln(deg)
    * reduction is the t41-class hazard (a fit-style aggregate over
    * rounded libm logs), so it runs on FIXED-POINT INTEGER logs
    * ([[graft.functions.Log2Micros]]) and converts to natural-log units
    * by one shared ln(2) double LITERAL — the moment is exact int64 on
    * both engines and the final IEEE arithmetic is deterministic.
    */
  def g09_degree_dist(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = CoGraph.bipartite(s, d)
      .groupBy(col("supp")).agg(count(lit(1)).as("deg"))
      .localCheckpoint() // feeds the histogram AND the alpha reduction
    val hist = deg.groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
    val tot = deg.agg(count(lit(1)).cast("double").as("n_total"),
      sum(graft.functions.TextFunctions.log2_micros(col("deg"))).as("sum_lg"))
    val w = Window.orderBy(col("deg").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("n_nodes")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("deg"), col("n_nodes"),
        round(col("cum").cast("double") / col("n_total"), 9).as("ccdf"),
        round(lit(1.0) + col("n_total") /
          (col("sum_lg").cast("double") / lit(1000000.0D) *
            lit(0.6931471805599453D)), 9).as("alpha_hat"))
  }

  /** Mutual-reinforcement rounds for g19 (also the spec entry point). */
  private val HitsRounds = 3

  /** g19: HITS hub/authority scores (Kleinberg, JACM'99) over the stored
    * customer→supplier bipartite order graph — the OTHER classic link
    * centrality, and the one that fits a bipartite graph natively where
    * PageRank (g01) needs the symmetrized projection: customers are hubs
    * (good buyers point at many good suppliers), suppliers are
    * authorities (good suppliers are bought by many good hubs), and the
    * two scores reinforce through alternating matrix-vector products
    * Aᵀh / Aa. Arithmetic is the g-family integer scheme: hubs start at
    * 1000, each half-round is ONE keyed join + sum aggregate, and a
    * broadcast-scalar per-mille rescale (x·1000 div max) bounds every
    * score ≤ 1000 — the normalization HITS needs anyway, done in exact
    * integer math, so values can never overflow regardless of graph
    * size or round count and both engines agree bit-for-bit. Scale
    * shape: state is one row per node, each round shuffles |edges| rows
    * keyed by node — g01/g06's iteration economics; the bipartite table
    * itself is read from [[CoGraph]]'s marker-committed store (built
    * once, never rescanning orders×lineitem), while the oracle rebuilds
    * it inline so the hash gate re-proves store losslessness.
    */
  /** g20: graph CONTRACT audit — s35's QA-gate pattern applied to the
    * persisted co-graph store before the g-family trusts it: edge and
    * node counts, weight mass/extremes, the three structural invariants
    * the store guarantees (no self-loops, strict u < v orientation, no
    * duplicate pairs — each must read 0; a nonzero row means the store
    * build is corrupt and every downstream triangle/component/centrality
    * number is wrong), and the isolated-supplier count (suppliers that
    * co-occur with nobody — the coverage the graph actually has over the
    * dimension). The DuckDB oracle rebuilds the same census from
    * lineitem, so the audit doubles as one more store-losslessness
    * cross-check. Metadata-sized everywhere after the pair read.
    */
  def g20_graph_audit(s: SparkSession, d: String): DataFrame = {
    val pairs = CoGraph.pairs(s, d).localCheckpoint()
    val nodes = pairs.select(col("u").as("k"))
      .union(pairs.select(col("v").as("k"))).distinct()
    val nNodes = nodes.count()
    val nSupp = Tables.supplier(s, d).count()
    val wide = pairs.agg(
      count(lit(1)).as("n_edges"),
      sum(when(col("u") === col("v"), 1L).otherwise(0L)).as("self_loops"),
      sum(when(col("u") >= col("v"), 1L).otherwise(0L)).as("orient_viol"),
      (count(lit(1)) - countDistinct(col("u"), col("v"))).as("dup_edges"),
      sum(col("n")).as("total_weight"),
      max(col("n")).as("max_weight"))
    wide.select(expr(
      s"""stack(8,
         |  'n_edges', n_edges,
         |  'n_nodes', ${nNodes}L,
         |  'self_loops', self_loops,
         |  'orientation_violations', orient_viol,
         |  'duplicate_edges', dup_edges,
         |  'total_weight', total_weight,
         |  'max_weight', max_weight,
         |  'isolated_suppliers', ${nSupp - nNodes}L)
         |  AS (metric, value)""".stripMargin))
  }

  def g19_hits(s: SparkSession, d: String): DataFrame = {
    val edges = CoGraph.bipartite(s, d)
      .repartition(graft.Tables.scanPartitions(s)) // width for 6 half-rounds
      .localCheckpoint() // drives both half-rounds of every iteration
    var hub = edges.select(col("cust")).distinct()
      .withColumn("h", lit(1000L))
    var auth: DataFrame = null
    // g01's idiom: NO per-round checkpoint — a fixed 3-round tree over
    // the checkpointed edge table is one job, and each round's
    // double-read (the agg feeding both the rescale and its max) is
    // served by exchange reuse, not recomputation
    for (_ <- 1 to HitsRounds) {
      val a0 = edges.join(hub, "cust")
        .groupBy(col("supp")).agg(sum(col("h")).as("a"))
      auth = a0.crossJoin(broadcast(a0.agg(max(col("a")).as("am"))))
        .select(col("supp"), expr("a * 1000 div am").as("a"))
      val h0 = edges.join(auth, "supp")
        .groupBy(col("cust")).agg(sum(col("a")).as("h"))
      hub = h0.crossJoin(broadcast(h0.agg(max(col("h")).as("hm"))))
        .select(col("cust"), expr("h * 1000 div hm").as("h"))
    }
    auth.orderBy(col("a").desc, col("supp")).limit(20)
      .select(col("supp").as("s_suppkey"), col("a").as("authority"))
  }

  /** The oracle unrolls the 5 integer iterations as chained CTEs — DuckDB's
    * `//` and Spark's `div` both truncate toward zero, and every operand is
    * non-negative, so the arithmetic is identical step by step. sum() is
    * cast back to BIGINT (DuckDB widens to HUGEINT).
    */
  val oracles: Map[String, String] = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        |nodes AS (SELECT src AS node FROM edges
        |          UNION SELECT dst FROM edges),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)""".stripMargin
    val iters = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST(150000 + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.r // o.od) AS BIGINT) AS c
         |    FROM edges e
         |    JOIN outdeg o ON o.src = e.src
         |    JOIN r${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n")
    val pprIters = (1 to Iters).map { i =>
      s"""p$i AS (
         |  SELECT n.node,
         |         CAST(CASE WHEN sd.node IS NOT NULL THEN 150000 ELSE 0 END
         |              + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.r // o.od) AS BIGINT) AS c
         |    FROM edges e
         |    JOIN outdeg o ON o.src = e.src
         |    JOIN p${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node
         |  LEFT JOIN seeds sd ON sd.node = n.node)""".stripMargin
    }.mkString(",\n")
    val kcoreBase =
      s"""WITH co AS (
        |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING count(*) >= $CoSupport),
        |edges AS (SELECT u AS src, v AS dst FROM co
        |          UNION ALL SELECT v, u FROM co),
        |s0 AS (SELECT DISTINCT src AS node FROM edges)""".stripMargin
    val kcoreRounds = (1 to KCoreRounds).map { i =>
      s"""s$i AS (
         |  SELECT e.src AS node FROM edges e
         |  JOIN s${i - 1} a ON a.node = e.src
         |  JOIN s${i - 1} b ON b.node = e.dst
         |  GROUP BY e.src HAVING count(*) >= $KCoreK)""".stripMargin
    }.mkString(",\n")
    // truss oracle: the per-round CTEs are marked MATERIALIZED — each
    // round references its predecessor three times (edge list + both
    // adjacency sides), and an inlining planner would otherwise recompute
    // the base join 3^rounds times
    val trussBase =
      s"""WITH co AS MATERIALIZED (
        |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING count(*) >= $CoSupport),
        |e0 AS MATERIALIZED (SELECT u, v FROM co)""".stripMargin
    val trussRounds = (1 to TrussRounds + 1).map { i =>
      val p = i - 1
      s"""a$p AS (SELECT u AS a, v AS b FROM e$p
         |         UNION ALL SELECT v, u FROM e$p),
         |r$i AS MATERIALIZED (
         |  SELECT e.u, e.v, count(*) AS sup FROM e$p e
         |  JOIN a$p x ON x.a = e.u
         |  JOIN a$p y ON y.a = e.v AND y.b = x.b
         |  GROUP BY e.u, e.v),
         |e$i AS MATERIALIZED (SELECT u, v FROM r$i WHERE sup >= ${TrussK - 2})""".stripMargin
    }.mkString(",\n")
    Map(
      "g18_temporal_reach" -> g18Sql("//"),
      "g17_squares" -> g17Sql(coRebuild, "//"),
      "g13_assortativity" -> g13Sql(coRebuild),
      "g14_local_clustering" -> g14Sql(coRebuild).replace("$DIV$", "//"),
      "g15_modularity" -> g15Sql(coRebuild).replace("$DIV$", "//"),
      "g21_labelprop" -> g21Sql(g21CoRebuild).replace("$DIV$", "//")
        .replace("$STR$", "VARCHAR"),
      "g22_random_walks" -> g22Sql(coRebuild),
      "g23_community_churn" -> g23Sql(g23CoRebuild)
        .replace("$STR$", "VARCHAR"),
      "g24_community_graph" -> g24Sql(g23CoRebuild)
        .replace("$STR$", "VARCHAR"),
      "g16_graph_evolution" ->
        g16Sql(g16CoRebuild).replace("$STR$", "VARCHAR").replace("$DIV$", "//"),
      "g12_link_prediction" ->
        s"""WITH co AS (
           |  SELECT u, v FROM (
           |    SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS c
           |    FROM lineitem a JOIN lineitem b
           |      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
           |    GROUP BY 1, 2
           |    ORDER BY c DESC, u, v LIMIT 200) t),
           |adj AS (SELECT u AS z, v AS n FROM co UNION ALL SELECT v, u FROM co),
           |dg AS (SELECT z, count(*) AS deg FROM adj GROUP BY z),
           |w AS (SELECT l.n AS a, r.n AS b, l.z AS z
           |      FROM adj l JOIN adj r ON l.z = r.z WHERE l.n < r.n),
           |sc AS (
           |  SELECT a, b, count(*) AS common_neighbors,
           |         CAST(sum(1000000 // deg) AS BIGINT) AS ra_micro
           |  FROM w JOIN dg USING (z)
           |  GROUP BY a, b),
           |nl AS (SELECT sc.* FROM sc LEFT JOIN co ON co.u = sc.a AND co.v = sc.b
           |       WHERE co.u IS NULL)
           |SELECT a, b, common_neighbors, ra_micro FROM nl
           |ORDER BY ra_micro DESC, a, b LIMIT 20""".stripMargin,
      "g11_harmonic_centrality" ->
        s"""WITH RECURSIVE co AS (
           |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
           |  GROUP BY 1, 2 HAVING count(*) >= $CoSupport),
           |edges AS (SELECT u AS src, v AS dst FROM co
           |          UNION ALL SELECT v, u FROM co),
           |sd AS (SELECT src AS seed FROM (
           |         SELECT DISTINCT src FROM edges ORDER BY src LIMIT 5) t),
           |reach AS (
           |  SELECT seed, seed AS node, CAST(0 AS BIGINT) AS h FROM sd
           |  UNION
           |  SELECT r.seed, e.dst AS node, CAST(r.h + 1 AS BIGINT) AS h
           |  FROM reach r JOIN edges e ON e.src = r.node
           |  WHERE r.h < $Hops),
           |md AS (SELECT seed, node, min(h) AS h FROM reach GROUP BY 1, 2)
           |SELECT node, CAST(sum(1000000 // h) AS BIGINT) AS harmonic_micro,
           |       count(*) AS n_seeds_reached
           |FROM md WHERE h > 0 GROUP BY node""".stripMargin,
      "g10_ktruss" ->
        s"""$trussBase,
           |$trussRounds
           |SELECT u, v, sup FROM r${TrussRounds + 1}
           |WHERE sup >= ${TrussK - 2}""".stripMargin,
      "g05_kcore" ->
        s"""$kcoreBase,
           |$kcoreRounds
           |SELECT e.src AS node, count(*) AS core_deg FROM edges e
           |JOIN s$KCoreRounds a ON a.node = e.src
           |JOIN s$KCoreRounds b ON b.node = e.dst
           |GROUP BY e.src""".stripMargin,
      "g01_pagerank" ->
        s"$base,\n$iters\nSELECT node, r AS rank FROM r$Iters",
      "g09_degree_dist" ->
        """WITH RECURSIVE e AS (
          |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
          |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          |dg AS (SELECT supp, count(*) AS deg FROM e GROUP BY 1),
          |h AS (SELECT deg, count(*) AS n_nodes FROM dg GROUP BY 1),
          |uvg AS (
          |  SELECT supp, CAST(deg AS BIGINT) AS v,
          |         CAST(length(bin(deg)) - 1 AS BIGINT) AS e
          |  FROM dg),
          |lgg AS (
          |  SELECT supp, e,
          |         CASE WHEN e >= 30 THEN v // CAST(power(2, e - 30) AS BIGINT)
          |              ELSE v * CAST(power(2, 30 - e) AS BIGINT) END AS m,
          |         CAST(0 AS BIGINT) AS acc, 0 AS i
          |  FROM uvg
          |  UNION ALL
          |  SELECT supp, e,
          |         CASE WHEN (m * m) // 1073741824 >= 2147483648
          |              THEN ((m * m) // 1073741824) // 2
          |              ELSE (m * m) // 1073741824 END,
          |         acc * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
          |                        THEN 1 ELSE 0 END,
          |         i + 1
          |  FROM lgg WHERE i < 30),
          |t AS (
          |  SELECT CAST(count(*) AS DOUBLE) AS n_total,
          |         CAST(sum((e * 1073741824 + acc) * 1000000 // 1073741824)
          |              AS BIGINT) AS sum_lg
          |  FROM lgg WHERE i = 30),
          |c AS (
          |  SELECT deg, n_nodes,
          |         CAST(sum(n_nodes) OVER (ORDER BY deg DESC
          |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          |  FROM h)
          |SELECT c.deg, c.n_nodes,
          |       round(c.cum / t.n_total, 9) AS ccdf,
          |       round(1.0 + t.n_total /
          |             (CAST(t.sum_lg AS DOUBLE) / 1000000.0
          |              * 0.6931471805599453), 9) AS alpha_hat
          |FROM c CROSS JOIN t""".stripMargin,
      "g08_cf_similarity" ->
        s"""WITH edges AS (
           |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |deg AS (SELECT supp, count(*) AS deg FROM edges GROUP BY 1),
           |co AS (
           |  SELECT a.supp AS sa, b.supp AS sb, count(*) AS co
           |  FROM edges a JOIN edges b
           |    ON a.cust = b.cust AND a.supp < b.supp
           |  GROUP BY 1, 2
           |  HAVING count(*) >= $CoSupport)
           |SELECT co.sa, co.sb, co.co,
           |       round(co.co / sqrt(da.deg * db.deg), 9) AS cosine
           |FROM co JOIN deg da ON da.supp = co.sa
           |        JOIN deg db ON db.supp = co.sb""".stripMargin,
      "g07_ppr" ->
        s"""$base,
           |seeds AS (SELECT c_custkey * 2 AS node FROM customer
           |          WHERE c_nationkey = 0),
           |p0 AS (
           |  SELECT n.node,
           |         CAST(CASE WHEN s.node IS NOT NULL THEN 1000000 ELSE 0 END
           |              AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
           |$pprIters
           |SELECT node, r AS rank FROM p$Iters WHERE r > 0""".stripMargin,
      "g20_graph_audit" ->
        s"""WITH co AS (
           |  SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS n
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
           |  GROUP BY 1, 2),
           |nodes AS (SELECT u AS k FROM co UNION SELECT v FROM co),
           |agg AS (
           |  SELECT count(*) AS n_edges,
           |         CAST(sum(CASE WHEN u = v THEN 1 ELSE 0 END) AS BIGINT)
           |           AS self_loops,
           |         CAST(sum(CASE WHEN u >= v THEN 1 ELSE 0 END) AS BIGINT)
           |           AS orient_viol,
           |         count(*) - count(DISTINCT (u, v)) AS dup_edges,
           |         CAST(sum(n) AS BIGINT) AS total_weight,
           |         CAST(max(n) AS BIGINT) AS max_weight
           |  FROM co),
           |nn AS (SELECT count(*) AS n_nodes FROM nodes),
           |ns AS (SELECT count(*) AS n_supp FROM supplier)
           |SELECT 'n_edges' AS metric, n_edges AS value FROM agg
           |UNION ALL SELECT 'n_nodes', n_nodes FROM nn
           |UNION ALL SELECT 'self_loops', self_loops FROM agg
           |UNION ALL SELECT 'orientation_violations', orient_viol FROM agg
           |UNION ALL SELECT 'duplicate_edges', dup_edges FROM agg
           |UNION ALL SELECT 'total_weight', total_weight FROM agg
           |UNION ALL SELECT 'max_weight', max_weight FROM agg
           |UNION ALL SELECT 'isolated_suppliers', ns.n_supp - nn.n_nodes
           |          FROM ns CROSS JOIN nn""".stripMargin,
      "g02_triangles" -> g02Sql(coRebuild),
      "g03_components" ->
        s"""WITH RECURSIVE co AS (
          |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
          |  GROUP BY 1, 2 HAVING count(*) >= $CoSupport),
          |edges AS (SELECT u AS src, v AS dst FROM co
          |          UNION ALL SELECT v, u FROM co),
          |nodes AS (SELECT DISTINCT src AS node FROM edges),
          |reach AS (
          |  SELECT node, node AS lbl FROM nodes
          |  UNION
          |  SELECT e.dst AS node, r.lbl
          |  FROM reach r JOIN edges e ON e.src = r.node),
          |cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
          |SELECT node, component FROM cc""".stripMargin,
      "g04_bfs_hops" ->
        s"""WITH RECURSIVE co AS (
           |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
           |  GROUP BY 1, 2 HAVING count(*) >= $CoSupport),
           |edges AS (SELECT u AS src, v AS dst FROM co
           |          UNION ALL SELECT v, u FROM co),
           |s AS (SELECT min(src) AS src FROM edges HAVING min(src) IS NOT NULL),
           |reach AS (
           |  SELECT src AS node, CAST(0 AS BIGINT) AS h FROM s
           |  UNION
           |  SELECT e.dst AS node, CAST(r.h + 1 AS BIGINT) AS h
           |  FROM reach r JOIN edges e ON e.src = r.node
           |  WHERE r.h < $Hops)
           |SELECT node, min(h) AS hops FROM reach GROUP BY node""".stripMargin,
      "g06_weighted_paths" -> {
        val rounds = (1 to Hops).map { i =>
          s"""d$i AS (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d${i - 1}
             |    UNION ALL
             |    SELECT e.dst AS node, d.dist + e.w AS dist
             |    FROM d${i - 1} d JOIN edges e ON e.src = d.node) x
             |  GROUP BY node)""".stripMargin
        }.mkString(",\n")
        s"""WITH co AS (
           |  SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS c
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
           |  GROUP BY 1, 2 HAVING count(*) >= $CoSupport),
           |edges AS (
           |  SELECT u AS src, v AS dst, CAST(1000 // c AS BIGINT) AS w FROM co
           |  UNION ALL
           |  SELECT v, u, CAST(1000 // c AS BIGINT) FROM co),
           |sq AS (SELECT min(src) AS src FROM edges
           |       HAVING min(src) IS NOT NULL),
           |d0 AS (SELECT src AS node, CAST(0 AS BIGINT) AS dist FROM sq),
           |$rounds
           |SELECT node, dist FROM d$Hops""".stripMargin
      },
      "g19_hits" -> {
        val rounds = (1 to HitsRounds).map { r =>
          s"""a${r}r AS (SELECT supp, sum(h) AS a FROM edges
             |         JOIN h${r - 1} USING (cust) GROUP BY 1),
             |a$r AS (SELECT supp, CAST(a * 1000 // (SELECT max(a) FROM a${r}r)
             |                         AS BIGINT) AS a FROM a${r}r),
             |h${r}r AS (SELECT cust, sum(a) AS h FROM edges
             |         JOIN a$r USING (supp) GROUP BY 1),
             |h$r AS (SELECT cust, CAST(h * 1000 // (SELECT max(h) FROM h${r}r)
             |                         AS BIGINT) AS h FROM h${r}r)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS (
           |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |h0 AS (SELECT DISTINCT cust, CAST(1000 AS BIGINT) AS h FROM edges),
           |$rounds
           |SELECT supp AS s_suppkey, a AS authority FROM a$HitsRounds
           |ORDER BY a DESC, supp LIMIT 20""".stripMargin
      },
    )
  }
}
