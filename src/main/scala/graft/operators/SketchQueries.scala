package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable-sketch PERSISTENCE — the 100 TB rollup architecture the
  * per-query sketches (q32's HLL, q46's percentile digest) only hint at:
  * partial sketches are computed once per partition/day, STORED as a table,
  * and later queries aggregate by MERGING stored sketches — never
  * re-scanning the raw corpus (d11's incremental-ingest pattern applied to
  * aggregates). A daily 100 TB pipeline appends one day's partials and
  * re-merges in seconds; the raw-event rescan a one-shot aggregate would
  * need is amortized away.
  *
  * Two sketch families, both demonstrated end-to-end (build -> persist ->
  * merge-only read):
  *  - q65: Datasketches HLL via Spark's native `hll_sketch_agg` /
  *    `hll_union_agg` binary columns (the industrial distinct-count rollup;
  *    JVM sketch bytes -> rows-only check, with merged == one-shot pinned
  *    in QueriesSpec);
  *  - q66: a bounded equi-width HISTOGRAM as the quantile sketch — merge is
  *    plain per-bucket addition, so merged == one-shot EXACTLY and the
  *    whole rollup sits under the DuckDB hash gate (KLL-style digests
  *    trade that exactness for tighter error at equal size; the
  *    persistence architecture is identical).
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  /** lg_k for the HLL sketches: 12 (4 KiB dense) matches Spark's default. */
  private val HllLgK = 12

  /** Stable partials location per (tag, data dir): repeated invocations
    * overwrite ONE directory instead of leaking a fresh
    * Files.createTempDirectory each run (bench reps + probe loops would
    * otherwise accumulate unbounded /tmp copies of the partials).
    */
  private[operators] def partialsDir(tag: String, d: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${tag}_${d.hashCode & 0x7fffffff}").toString

  /** Per-day HLL user sketches persisted, then distinct-users-overall
    * computed by MERGING the stored sketches only. The merge stage's input
    * is |days| binary rows regardless of corpus size; `hll_union_agg` is
    * mergeable map-side like any partial aggregate.
    *
    * Round-9 (verdict item 6): the Datasketches estimate is
    * engine-specific, so the GATED output is the exact distinct count plus
    * an integer verdict — |merged-sketch estimate − exact| ≤ 5% — that the
    * oracle asserts as literal 1; a contract violation flips the bit →
    * hash red. The merge-only read path is unchanged (first half of the
    * plan, pinned in PlanInvariantsSpec to read stored blobs, with exactly
    * ONE raw-events scan in the whole plan: the exact-audit side — the
    * distributed acceptance audit a deployment runs when onboarding the
    * sketch, not part of the production rollup read).
    */
  def q65_hll_rollup(s: SparkSession, d: String): DataFrame = {
    val dir = partialsDir("hll_partials", d)
    // ONE raw scan feeds both the partials build and the exact audit
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .localCheckpoint()
    ev.groupBy(col("day"))
      .agg(expr(s"hll_sketch_agg(user_id, $HllLgK)").as("sketch"))
      .write.mode("overwrite").parquet(dir)
    // merge-only: reads the stored sketches, never the events table
    val est = s.read.parquet(dir)
      .agg(count(lit(1)).as("n_partials"),
        expr("hll_sketch_estimate(hll_union_agg(sketch))")
          .as("distinct_users"))
    // exact audit: distributed exact-distinct over the same checkpointed
    // projection, broadcast-joined onto the single merged row
    val exact = ev.agg(countDistinct(col("user_id")).as("exact_distinct"))
    est.crossJoin(broadcast(exact))
      .select(col("n_partials"), col("exact_distinct"),
        (abs(col("distinct_users") - col("exact_distinct")) <=
          ceil(col("exact_distinct") * 0.05)).cast("long").as("within_5pct"))
  }

  /** Histogram bucket width for q66 — o_totalprice spans ~[800, 600k], so
    * the sketch is bounded at a few hundred buckets at ANY corpus size
    * (that bound is what makes the final quantile window safe: it runs
    * over the sketch domain, not the data).
    */
  private val BucketWidth = 1000.0

  /** Per-day bounded-histogram partials of o_totalprice persisted, then
    * p50/p90/p99 computed from the MERGED histogram: merge = per-bucket
    * count addition (exactly associative), quantile = first bucket whose
    * cumulative count crosses q * total, reported at the bucket midpoint.
    * Every step is integer/plain-double arithmetic -> hash-green vs a
    * DuckDB twin computing the same histogram straight from the source.
    */
  def q66_histogram_rollup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dir = partialsDir("hist_partials", d)
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") / BucketWidth).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(dir)
    val merged = s.read.parquet(dir)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
    // unpartitioned window: safe by construction — the histogram has a
    // fixed bucket count however large the corpus (the sketch's bound)
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val quants = s.range(1)
      .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("quantile"))
    cum.crossJoin(broadcast(quants))
      .filter(col("cum") >= col("quantile") * col("total"))
      .groupBy(col("quantile"))
      .agg(min(col("bucket")).as("b"))
      .select(col("quantile"),
        ((col("b") + 0.5) * BucketWidth).as("approx_value"))
  }

  /** Heavy-hitter tokens over the document corpus through the Misra-Gries
    * sketch ([[graft.functions.FreqItems]], k=32): one pass, at most 31
    * counters per partition and across the merge, no token-level shuffle
    * at all — the exact groupBy twin shuffles one row per DISTINCT token,
    * which at web scale is billions; the sketch moves <=31 counters per
    * partition regardless. Items with true frequency > n/32 are guaranteed
    * present (QueriesSpec pins guarantee + estimate bounds vs the exact
    * counts over the FULL counter set).
    *
    * Round-9 (verdict item 6): counter identity below the threshold is
    * order-dependent, so the GATED output restricts to the
    * DETERMINISTIC part of the contract — the rows are exactly the tokens
    * whose true count exceeds n/32 (both engines compute that set
    * exactly), and per row two verdict bits assert the MG guarantees the
    * oracle cannot see but can hold to: the token kept its counter, and
    * the estimate sits in [exact − n/32, exact]. A sketch bug flips a bit
    * → hash red. The exact side is a distributed token groupBy — the
    * onboarding audit, not the production path (which reads the ≤31
    * sketch counters only).
    */
  def q76_freq_items(s: SparkSession, d: String): DataFrame = {
    import graft.functions.FreqItems.freq_items
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .localCheckpoint()
    val sk = toks.agg(freq_items(col("tok"), 32).as("sketch"))
      .select(explode(col("sketch")).as(Seq("s_token", "est_count")))
    val total = toks.agg(count(lit(1)).as("n_total"))
    val heavy = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_count"))
      .crossJoin(broadcast(total))
      .filter(col("exact_count") * 32 > col("n_total"))
    heavy.join(broadcast(sk), heavy("tok") === sk("s_token"), "left")
      .select(col("tok").as("token"), col("exact_count"),
        col("s_token").isNotNull.cast("long").as("guaranteed_present"),
        (col("est_count").isNotNull &&
          col("est_count") <= col("exact_count") &&
          col("est_count") >= col("exact_count") - floor(col("n_total") / 32))
          .cast("long").as("est_within_bounds"))
  }

  /** q66's persist→merge rollup with a REAL quantile digest: per-day KLL
    * sketches of o_totalprice persisted ([[graft.functions.KllQuantiles]],
    * k=200 ≈ 1.65% rank error in ~3 KB), then p25/p50/p75 computed by
    * MERGING the stored blobs only — the merge stage's input is |days|
    * binary rows whatever the corpus size, and unlike q66's equi-width
    * histogram the digest needs no domain bounds known up front. KLL
    * compaction is randomized, so the quantile VALUES can't cross engines
    * — round-9 (verdict item 6) gates the rank-error CONTRACT instead:
    * the output carries the exact absorbed-n (the sketch must have
    * swallowed every row — n is cross-checked against the oracle's
    * count(*)) plus one verdict bit per φ, computed by re-ranking the
    * sketch's answer against orders with a 5% rank tolerance (k=200 ⇒
    * ~1.65% at 99% confidence; 5% leaves vanishing failure mass across
    * the randomized compactions). PlanInvariantsSpec pins that the MERGE
    * side still reads only stored blobs — the one orders scan in the plan
    * is the rank audit.
    */
  def q83_kll_rollup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KllQuantiles.{kll_agg, kll_merge, kll_n, kll_quantile}
    val dir = partialsDir("kll_partials", d)
    // ONE raw scan feeds both the partials build and the rank audit
    val o = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .localCheckpoint()
    o.groupBy(col("day"))
      .agg(kll_agg(col("o_totalprice")).as("sketch"))
      .write.mode("overwrite").parquet(dir)
    val sk = s.read.parquet(dir)
      .agg(count(lit(1)).as("n_partials"), kll_merge(col("sketch")).as("sk"))
      .select(col("n_partials"),
        kll_n(col("sk")).as("n"),
        kll_quantile(col("sk"), lit(0.25)).as("a25"),
        kll_quantile(col("sk"), lit(0.5)).as("a50"),
        kll_quantile(col("sk"), lit(0.75)).as("a75"))
    o.select(col("o_totalprice"))
      .crossJoin(broadcast(sk))
      .groupBy(col("n_partials"), col("n"))
      .agg(SketchQueries.rankOk(0.25, col("a25"), col("o_totalprice"), col("n"))
          .as("ok_p25"),
        SketchQueries.rankOk(0.50, col("a50"), col("o_totalprice"), col("n"))
          .as("ok_p50"),
        SketchQueries.rankOk(0.75, col("a75"), col("o_totalprice"), col("n"))
          .as("ok_p75"))
  }

  /** Rank-bracket audit shared by the quantile-sketch verdict gates
    * (q46/q83/q84): the value's rank span [cnt_lt+1, cnt_le] (tie-safe)
    * must intersect [(φ−ε)n − 1, (φ+ε)n + 1]. Pure counts — distributed,
    * no exact-percentile buffer.
    */
  private[operators] def rankOk(phi: Double, a: org.apache.spark.sql.Column,
      x: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column,
      eps: Double = 0.05): org.apache.spark.sql.Column = {
    val lo = floor(lit(phi - eps) * n) - 1.0
    val hi = ceil(lit(phi + eps) * n) + 1.0
    val cntLt = sum(when(x < a, 1L).otherwise(0L))
    val cntLe = sum(when(x <= a, 1L).otherwise(0L))
    ((cntLt + 1.0) <= hi && cntLe >= lo).cast("long")
  }

  /** q83's rollup GROUPED — per-(status, day) sketch partials stored, then
    * per-status quantiles by merging each status's stored blobs: the
    * per-segment dashboard shape (one sketch row per group per day; the
    * merge is a keyed aggregate whose input is |groups|x|days| blobs, with
    * map-side partial merge like any hash aggregate). Cross-checked
    * against q40's exact per-status percentiles in QueriesSpec via the
    * same rank-error contract.
    */
  def q84_kll_by_group(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KllQuantiles.{kll_agg, kll_merge, kll_n, kll_quantile}
    val dir = partialsDir("kll_grp_partials", d)
    // ONE raw scan feeds both the partials build and the rank audit
    val src = Tables.orders(s, d)
      .select(col("o_orderstatus"), to_date(col("o_orderdate")).as("day"),
        col("o_totalprice"))
      .localCheckpoint()
    src.groupBy(col("o_orderstatus"), col("day"))
      .agg(kll_agg(col("o_totalprice")).as("sketch"))
      .write.mode("overwrite").parquet(dir)
    // per-status merged sketches (|groups| rows), then the q83 rank audit
    // keyed by group: broadcast the tiny sketch frame onto one orders scan
    val sk = s.read.parquet(dir)
      .groupBy(col("o_orderstatus"))
      .agg(kll_merge(col("sketch")).as("sk"))
      .select(col("o_orderstatus").as("st"),
        kll_n(col("sk")).as("n"),
        kll_quantile(col("sk"), lit(0.25)).as("a25"),
        kll_quantile(col("sk"), lit(0.5)).as("a50"),
        kll_quantile(col("sk"), lit(0.75)).as("a75"))
    val o = src.select(col("o_orderstatus"), col("o_totalprice"))
    o.join(broadcast(sk), o("o_orderstatus") === sk("st"))
      .groupBy(col("o_orderstatus"), col("n"))
      .agg(SketchQueries.rankOk(0.25, col("a25"), col("o_totalprice"), col("n"))
          .as("ok_p25"),
        SketchQueries.rankOk(0.50, col("a50"), col("o_totalprice"), col("n"))
          .as("ok_p50"),
        SketchQueries.rankOk(0.75, col("a75"), col("o_totalprice"), col("n"))
          .as("ok_p75"))
  }

  /** q90: cohort-overlap rollup through persisted THETA sketches — the
    * set-algebra question HLL cannot answer: per-(day, event_type) theta
    * partials of the user set are built ONCE and stored; the read side
    * merges stored blobs per cohort and answers every pairwise
    * |A|, |B|, |A ∩ B|, |A \ B| from the sketches alone (audience
    * overlap / churn / contamination-overlap accounting). The merge
    * stage's input is |days| x |event_types| blobs regardless of corpus
    * size, and the pairwise frame is |event_types|^2 one-row sketches.
    *
    * A theta sketch under the default seed is a deterministic function
    * of the input SET, and below its nominal entry count (lg_k=12 ->
    * 4096) it is in EXACT mode — the gate fixture's cohorts are, so this
    * rollup is fully hash-checked against exact DuckDB set arithmetic
    * (the q66 move: same persistence architecture as the approximate
    * sketch, oracle-checkable configuration). Past 4096 distincts the
    * same query degrades gracefully to ~1.56% RSE estimates —
    * QueriesSpec drives estimation mode with a 50k-key synthetic build
    * and pins the error contract.
    */
  def q90_theta_overlap(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ThetaSketches._
    val dir = partialsDir("theta_partials", d)
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(theta_agg(col("user_id")).as("sketch"))
      .write.mode("overwrite").parquet(dir)
    // merge-only: reads stored blobs, never the events table
    val merged = s.read.parquet(dir)
      .groupBy(col("event_type"))
      .agg(theta_merge(col("sketch")).as("sk"))
    merged.as("a").crossJoin(merged.as("b")) // |event_types|^2 sketch rows
      .filter(col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("cohort_a"),
        col("b.event_type").as("cohort_b"),
        round(theta_estimate(col("a.sk"))).cast("long").as("est_a"),
        round(theta_estimate(col("b.sk"))).cast("long").as("est_b"),
        round(theta_intersect_est(col("a.sk"), col("b.sk")))
          .cast("long").as("est_overlap"),
        round(theta_anotb_est(col("a.sk"), col("b.sk")))
          .cast("long").as("est_a_only"))
  }

  /** q98: per-source Count-Min partials persisted, token frequencies
    * answered by MERGING the stored blobs only — the point-frequency
    * member completing the sketch shelf (q65 distinct / q83-q84 quantiles
    * / q76 heavy hitters / q90 set algebra). CMS merge is element-wise
    * addition, so unlike every other sketch here the rollup is EXACTLY
    * order-independent — QueriesSpec pins merged == one-shot as array
    * equality, plus the one-sided error contract (never undercounts;
    * overcount ≤ collision mass, measured and bounded). Probe tokens are
    * known at plan time, so each estimate is a plain least(element_at…)
    * over the merged blob — no UDF in the read path.
    *
    * Round-9 (verdict item 6): the estimates are deterministic but no
    * DuckDB twin can replay the JVM murmur cells — so the GATE carries the
    * CMS one-sided error contract per probe: exact count (both engines
    * compute it; the absent probe's exact 0 included), `no_undercount`
    * (est ≥ exact — CMS's hard guarantee), and `overcount_bounded`
    * (est − exact ≤ ⌈(e/width)·N⌉, the classic εN bound with ε = e/1024).
    * A hashing/merge bug flips a bit → hash red. The exact side filters
    * to the 5 plan-time probes before aggregating — a near-free audit.
    */
  def q98_cms_rollup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.CountMin._
    val dir = partialsDir("cms_partials", d)
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .localCheckpoint()
    toks.groupBy(col("source"))
      .agg(cm_agg(col("tok")).as("sketch"))
      .write.mode("overwrite").parquet(dir)
    // merge-only: reads stored blobs, never the documents table
    val merged = s.read.parquet(dir)
      .agg(count(lit(1)).as("n_partials"), cm_merge(col("sketch")).as("sk"))
    val ests = merged.select(col("n_partials"),
        explode(arrays_zip(probeLit(CmsProbes),
          cm_estimates(col("sk"), CmsProbes))).as("z"))
      .select(col("z.0").as("token"), col("z.1").as("est_count"),
        col("n_partials"))
    // exact audit: probe counts (0 for the absent probe) + total token mass
    val probes = s.createDataFrame(
      CmsProbes.map(Tuple1.apply)).toDF("p_token")
    val exact = probes.join(
        toks.filter(col("tok").isin(CmsProbes: _*))
          .groupBy(col("tok")).agg(count(lit(1)).as("c")),
        col("p_token") === col("tok"), "left")
      .select(col("p_token"), coalesce(col("c"), lit(0L)).as("exact_count"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    ests.join(broadcast(exact), col("token") === col("p_token"))
      .crossJoin(broadcast(total))
      .select(col("token"), col("exact_count"), col("n_partials"),
        (col("est_count") >= col("exact_count")).cast("long")
          .as("no_undercount"),
        (col("est_count") - col("exact_count") <=
          ceil(col("n_total") * (math.E / 1024.0))).cast("long")
          .as("overcount_bounded"))
  }

  /** Probe mix: three high-frequency corpus tokens, one mid, and one
    * guaranteed-absent token whose estimate IS the raw collision mass —
    * the overcount the error spec bounds.
    */
  private[graft] val CmsProbes = Seq("join", "hash", "scan", "the", "zzz_absent")

  /** Bottom-k size for q102 (64 hashes ≈ 12% relative error on the
    * distinct estimate — the sample side is the point, not the error).
    */
  private val BottomK = 64

  /** q102: BOTTOM-K distinct-sample rollup — the sketch-shelf member that
    * returns a mergeable uniform SAMPLE of the distinct population, not
    * just its count (q65's HLL estimates; bottom-k also hands back k
    * concrete representative users — the audit/debug sample a pipeline
    * actually joins against). Per-day partials persist the k smallest
    * multiplicative hashes of the day's distinct users; the read path
    * merges STORED partials only (union → global re-bottom-k — bottom-k
    * is exactly mergeable, which QueriesSpec pins as merged == direct),
    * and the count estimate is the classic k-minimum-value form
    * (k−1)·M / h_(k). Unlike every hash-library sketch here, the hash is
    * hashCol's pure integer arithmetic — so the WHOLE rollup, sample and
    * estimate, sits under the DuckDB hash gate: no rows-only concession.
    */
  def q102_bottomk_rollup(s: SparkSession, d: String): DataFrame = {
    import graft.plans.TopKPerGroup
    import graft.plans.TopKPerGroup.Ord
    val dir = partialsDir("bottomk_partials", d)
    val m = 1000000007L
    val perDay = Tables.events(s, d)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .distinct()
      .withColumn("h",
        expr(s"((user_id % 1000003) * 2654435761 + 17) % $m"))
    TopKPerGroup.topK(perDay, Seq("day"), Seq(Ord("h"), Ord("user_id")),
        BottomK)
      .write.mode("overwrite").parquet(dir)
    // merge-only: stored per-day samples union, dedupe by user (a user
    // active on many days is one distinct), global re-bottom-k
    val merged = s.read.parquet(dir)
      .select(col("user_id"), col("h")).distinct()
      .withColumn("g", lit(1))
    val bottom = TopKPerGroup.topK(merged, Seq("g"),
      Seq(Ord("h"), Ord("user_id")), BottomK)
    bottom.groupBy(col("g"))
      .agg(count(lit(1)).as("k"),
        max(col("h")).as("kth_hash"),
        min(col("user_id")).as("smallest_sample_user"))
      .select(col("k"), col("kth_hash"),
        round((col("k") - 1).cast("double") * m.toDouble /
          col("kth_hash").cast("double"), 9).as("est_distinct_users"),
        col("smallest_sample_user"))
  }

  /** q103: MOMENTS rollup — the degenerate-but-foundational member of the
    * sketch shelf: mean/variance/stddev are algebraic aggregates, so their
    * "sketch" is just (n, Σx, Σx²) and the merge is component addition —
    * the textbook case every fancier sketch generalizes (same
    * persist → merge-only-read architecture as q65/q66/q83/q98/q102, zero
    * approximation). Per-day partials over o_totalprice persist; the read
    * path folds STORED triples only. Sums ride DECIMAL(38,6) so partial
    * order can't drift them — the rolled-up population variance is exact
    * and hash-checks against DuckDB computing straight from the source
    * (the strongest possible merge proof: merged == one-shot == oracle).
    */
  def q103_moments_rollup(s: SparkSession, d: String): DataFrame = {
    val dir = partialsDir("moments_partials", d)
    // (18,6): x*x must stay exact on BOTH engines — Spark needs
    // p1+p2+1 <= 38; the DuckDB twin uses width 19 for its int128 path
    // (the t20/q101 decimal lessons, applied at design time)
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_totalprice").cast(dec).as("x"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sx2"))
      .write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .agg(count(lit(1)).as("n_partials"),
        sum(col("n")).as("n"),
        sum(col("sx")).cast("double").as("sum_x"),
        sum(col("sx2")).cast("double").as("sum_x2"))
      .select(col("n_partials"), col("n"),
        round(col("sum_x") / col("n").cast("double"), 9).as("mean"),
        round(col("sum_x2") / col("n").cast("double") -
          (col("sum_x") / col("n").cast("double")) *
            (col("sum_x") / col("n").cast("double")), 9)
          .as("var_pop"))
  }

  val queries: Map[String, Q] = Map(
    "q103_moments_rollup" -> (q103_moments_rollup _),
    "q102_bottomk_rollup" -> (q102_bottomk_rollup _),
    "q98_cms_rollup" -> (q98_cms_rollup _),
    "q90_theta_overlap" -> (q90_theta_overlap _),
    "q65_hll_rollup" -> (q65_hll_rollup _),
    "q66_histogram_rollup" -> (q66_histogram_rollup _),
    "q76_freq_items" -> (q76_freq_items _),
    "q83_kll_rollup" -> (q83_kll_rollup _),
    "q84_kll_by_group" -> (q84_kll_by_group _),
  )

  /** q65's Datasketches binary isn't reproducible in DuckDB -> rows-only
    * (QueriesSpec pins merged == one-shot instead). q66's twin recomputes
    * the identical histogram/quantile arithmetic directly from orders —
    * valid precisely because histogram merge is exact.
    */
  val oracles: Map[String, String] = Map(
    // sketch-contract verdict gates (round-8 item 6): the oracle computes
    // every EXACT column and asserts each contract bit as literal 1; the
    // Spark side measures the bit, so a sketch bug reads as a hash red
    "q65_hll_rollup" ->
      """SELECT (SELECT count(DISTINCT CAST(ts AS DATE)) FROM events)
        |         AS n_partials,
        |       count(DISTINCT user_id) AS exact_distinct,
        |       CAST(1 AS BIGINT) AS within_5pct
        |FROM events""".stripMargin,
    "q76_freq_items" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |     tot AS (SELECT count(*) AS n FROM t)
        |SELECT tok AS token, count(*) AS exact_count,
        |       CAST(1 AS BIGINT) AS guaranteed_present,
        |       CAST(1 AS BIGINT) AS est_within_bounds
        |FROM t, tot GROUP BY tok, tot.n HAVING count(*) * 32 > tot.n""".stripMargin,
    "q83_kll_rollup" ->
      """SELECT (SELECT count(DISTINCT CAST(o_orderdate AS DATE)) FROM orders)
        |         AS n_partials,
        |       count(*) AS n,
        |       CAST(1 AS BIGINT) AS ok_p25, CAST(1 AS BIGINT) AS ok_p50,
        |       CAST(1 AS BIGINT) AS ok_p75
        |FROM orders""".stripMargin,
    "q84_kll_by_group" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(1 AS BIGINT) AS ok_p25, CAST(1 AS BIGINT) AS ok_p50,
        |       CAST(1 AS BIGINT) AS ok_p75
        |FROM orders GROUP BY 1""".stripMargin,
    "q98_cms_rollup" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |     p AS (SELECT unnest(['join','hash','scan','the','zzz_absent'])
        |             AS token),
        |     c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok)
        |SELECT p.token, CAST(coalesce(c.n, 0) AS BIGINT) AS exact_count,
        |       (SELECT count(DISTINCT source) FROM documents) AS n_partials,
        |       CAST(1 AS BIGINT) AS no_undercount,
        |       CAST(1 AS BIGINT) AS overcount_bounded
        |FROM p LEFT JOIN c ON p.token = c.tok""".stripMargin,
    "q103_moments_rollup" ->
      """WITH p AS (
        |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
        |         count(*) AS n,
        |         sum(CAST(o_totalprice AS DECIMAL(19,6))) AS sx,
        |         sum(CAST(o_totalprice AS DECIMAL(19,6))
        |             * CAST(o_totalprice AS DECIMAL(19,6))) AS sx2
        |  FROM orders GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_partials,
        |       CAST(sum(n) AS BIGINT) AS n,
        |       round(CAST(sum(sx) AS DOUBLE)
        |             / CAST(sum(n) AS DOUBLE), 9) AS mean,
        |       round(CAST(sum(sx2) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
        |             - (CAST(sum(sx) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
        |               * (CAST(sum(sx) AS DOUBLE) / CAST(sum(n) AS DOUBLE)),
        |             9) AS var_pop
        |FROM p""".stripMargin,
    "q102_bottomk_rollup" ->
      """WITH du AS (
        |  SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |         user_id
        |  FROM events),
        |h AS (
        |  SELECT day, user_id,
        |         ((user_id % 1000003) * 2654435761 + 17) % 1000000007 AS h
        |  FROM du),
        |pd AS (
        |  SELECT day, user_id, h,
        |         row_number() OVER (PARTITION BY day
        |                            ORDER BY h, user_id) AS rk
        |  FROM h QUALIFY rk <= 64),
        |mg AS (SELECT DISTINCT user_id, h FROM pd),
        |bt AS (
        |  SELECT user_id, h,
        |         row_number() OVER (ORDER BY h, user_id) AS rk
        |  FROM mg QUALIFY rk <= 64)
        |SELECT CAST(count(*) AS BIGINT) AS k,
        |       CAST(max(h) AS BIGINT) AS kth_hash,
        |       round((count(*) - 1) * 1000000007.0 / max(h), 9)
        |         AS est_distinct_users,
        |       CAST(min(user_id) AS BIGINT) AS smallest_sample_user
        |FROM bt""".stripMargin,
    "q90_theta_overlap" ->
      """WITH c AS (SELECT DISTINCT event_type, user_id FROM events),
        |n AS (SELECT event_type, count(*) AS n FROM c GROUP BY 1),
        |ov AS (
        |  SELECT x.event_type AS cohort_a, y.event_type AS cohort_b,
        |         count(*) AS o
        |  FROM c x JOIN c y
        |    ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT na.event_type AS cohort_a, nb.event_type AS cohort_b,
        |       na.n AS est_a, nb.n AS est_b,
        |       coalesce(ov.o, 0) AS est_overlap,
        |       na.n - coalesce(ov.o, 0) AS est_a_only
        |FROM n na JOIN n nb ON na.event_type < nb.event_type
        |LEFT JOIN ov ON ov.cohort_a = na.event_type
        |            AND ov.cohort_b = nb.event_type""".stripMargin,
    "q66_histogram_rollup" ->
      """WITH h AS (
        |  SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS bucket,
        |         count(*) AS cnt
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT bucket,
        |         CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum,
        |         CAST(sum(cnt) OVER () AS BIGINT) AS total
        |  FROM h),
        |q AS (SELECT unnest([0.5, 0.9, 0.99]) AS quantile)
        |SELECT q.quantile, (min(c.bucket) + 0.5) * 1000.0 AS approx_value
        |FROM q JOIN c ON c.cum >= q.quantile * c.total
        |GROUP BY q.quantile""".stripMargin,
  )
}
