package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The delegated relational surface (SURVEY.md §2B): the reference shipped
  * arbitrary SELECT text to MySQL (`/root/reference/src/loader.py:231`); here
  * the same capability is the Spark SQL / DataFrame surface itself. Each
  * query is a named, oracle-checked exercise of one operator family over the
  * fixture tables.
  *
  * Conventions (driver compare contract):
  *  - every computed column is aliased identically here and in the oracle SQL
  *  - double aggregates sum through DECIMAL(38,6) then cast to double (see
  *    dsum below) so Spark vs DuckDB summation order cannot drift
  *  - ties in any top-k / rank are broken by a unique key so results are
  *    deterministic under any partitioning
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact decimal sum, surfaced as double.
    *
    * Why not `round(sum(x), 2)`: summation order differs between Spark
    * partitions and the DuckDB oracle, and Spark's `round` (HALF_UP on the
    * shortest decimal repr) disagrees with DuckDB's (binary) exactly at half
    * boundaries. The fixture money/qty columns are exact 2-4dp decimals, so
    * summing through DECIMAL(38,6) is exact and order-independent, and the
    * final double cast is the same nearest-double on both engines. This also
    * scales: Spark decimal sums are partial-aggregated map-side like any sum.
    */
  private val dec = org.apache.spark.sql.types.DecimalType(38, 6)
  private def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")
  private def davg(c: Column): Column = sum(c.cast(dec)).cast("double") / count(c)
  /** Oracle-side twin of [[dsum]]. */
  private def osum(e: String): String = s"CAST(sum(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"
  private def oavg(e: String): String = s"${osum(e)} / count($e)"

  // ---------------------------------------------------------------- scans/agg

  /** TPC-H Q1 shape: scan + filter + hash aggregate + sort. The filter and
    * the 4-column projection reach the parquet scan (PushedFilters/ReadSchema);
    * partial aggregation happens map-side, so the shuffle carries only
    * |groups| x partitions rows — the pattern that holds at 100 TB.
    */
  def q01_pricing_summary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Projection + conjunctive filter, all pushed to the scan; no shuffle at
    * all — the plan is a single WholeStageCodegen over the file scan.
    */
  def q02_filter_project(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30 &&
        col("l_discount") > 0.05)
      // raw product, no rounding: a single IEEE multiply is bit-identical
      // across engines; rounding would reintroduce half-boundary drift
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))

  def q09_distinct_agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  def q28_having(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"),
        count(lit(1)).as("n_items"))
      .filter(col("total_qty") > 1000) // HAVING == post-agg filter in Catalyst

  // ---------------------------------------------------------------- joins

  /** Star join: both dims are small → broadcast-hash joins (no shuffle of the
    * fact side); at 100 TB the lineitem scan stays shuffle-free until the
    * final 5-group aggregate.
    */
  def q03_join_agg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  def q04_left_join(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"),
        coalesce(dsum(col("c_acctbal")), lit(0.0)).as("total_bal"))
  }

  /** Full-outer join of two aggregates (some nations have customers but no
    * suppliers and vice versa → both null sides exercised).
    */
  def q05_full_join(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(su, c("nationkey") === su("s_nk"), "full")
      .select(coalesce(col("nationkey"), col("s_nk")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  /** EXISTS → left-semi join: no payload columns from the right side ever
    * cross the shuffle.
    */
  def q06_semi_join(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val bigOrders = Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000).select(col("o_custkey"))
    c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
  }

  /** NOT EXISTS → left-anti join (also the idiom behind the reference sink's
    * name-existence probe, `/root/reference/src/loader.py:159-163`).
    */
  def q07_anti_join(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Theta/band join against a tiny literal dimension: broadcast nested loop
    * over 4 rows — the scalable shape for range-bucketing a 100 TB fact table.
    */
  def q08_band_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("small", 0.0, 100000.0),
      ("medium", 100000.0, 250000.0),
      ("large", 250000.0, 400000.0),
      ("jumbo", 400000.0, 1000000.0)).toDF("band", "lo", "hi")
    val o = Tables.orders(s, d)
    o.join(broadcast(bands),
        o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("volume"))
  }

  // ------------------------------------------------- grouping sets / windows

  def q10_rollup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("o_orderstatus"))
      .agg(dsum(col("o_totalprice")).as("volume"), count(lit(1)).as("n_orders"))
  }

  def q11_cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** Ranking window: top-3 orders per market segment. The window shuffles
    * once on the partition key; ties broken by o_orderkey for determinism.
    */
  def q12_window_rank(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Running-total frame (rows unbounded-preceding..current). */
  def q13_window_running(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend", sum(col("o_totalprice").cast(dec)).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
  }

  /** lag/lead analytics: gap in days between consecutive orders per customer. */
  def q14_window_lag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date")))
      .select(col("o_custkey"), col("o_orderkey"), col("gap_days"))
  }

  // ------------------------------------------------------- sort/topk/set ops

  /** ORDER BY .. LIMIT k → Catalyst TakeOrderedAndProject: each partition
    * keeps a k-heap, the driver merges k*partitions rows — no global sort.
    */
  def q15_topk(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  def q16_union(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_nationkey").cast("int").as("nationkey"))
      .withColumn("side", lit("customer"))
    val su = Tables.supplier(s, d)
      .select(col("s_nationkey").cast("int").as("nationkey"))
      .withColumn("side", lit("supplier"))
    c.unionByName(su).groupBy(col("nationkey"), col("side"))
      .agg(count(lit(1)).as("n"))
  }

  def q17_intersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .intersect(
        Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))

  def q18_except(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .except(
        Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))

  /** Bag-semantics set ops (ALL variants keep multiplicity). */
  def q37_intersect_all(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .intersectAll(
        Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))

  def q38_except_all(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .exceptAll(
        Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))

  // ---------------------------------------------------- SQL-surface queries
  // These go through spark.sql(...) on temp views — the exact entry point the
  // reference exposed to its users (raw SELECT text, src/loader.py:231).

  private def withViews(s: SparkSession, d: String, names: String*)(sql: String): DataFrame = {
    names.foreach(n => Tables.table(s, d, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  /** IN-subquery (decorrelated by Catalyst into a semi join). */
  def q19_subquery_in(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders", "customer")(
      """SELECT o_orderstatus, count(*) AS n_orders
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |GROUP BY o_orderstatus""".stripMargin)

  /** Scalar subquery → broadcast of a 1-row aggregate. The threshold goes
    * through the decimal dsum/davg pattern (not a plain double avg) so both
    * engines compute the identical boundary — summation-order ulp drift in
    * a double avg could flip rows sitting exactly at the threshold.
    */
  def q20_scalar_subquery(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "part")(
      """SELECT p_brand, count(*) AS n_pricey
        |FROM part
        |WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
        |                              / count(p_retailprice) FROM part)
        |GROUP BY p_brand""".stripMargin)

  /** CTE + derived table + join, all in SQL. */
  def q21_cte(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders", "lineitem")(
      """WITH order_rev AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS rev
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT o.o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(r.rev AS DECIMAL(38,6))) AS DOUBLE) AS total_rev
        |FROM orders o JOIN order_rev r ON o.o_orderkey = r.l_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin)

  def q31_grouping_sets(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)

  // ------------------------------------------------------- scalar functions

  def q22_string_funcs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        lower(col("p_type")).as("type_lc"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        trim(concat(lit(" "), col("p_brand"), lit(" "))).as("brand_trim"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devowel"),
        length(col("p_name")).cast("long").as("name_len"))

  def q23_date_funcs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("volume"))

  def q24_math_case(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 0).as("price_r0"),
        floor(col("l_discount") * 100).as("disc_pct"),
        ceil(col("l_tax") * 100).as("tax_pct"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 35, "mid")
          .otherwise("high").as("qty_bucket"))
      .filter(col("l_orderkey") % 100 === 0)

  def q25_conditional_null(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select(
        col("o_orderkey"),
        coalesce(col("prev_price"), lit(0.0)).as("prev_or_zero"),
        nullif(col("o_orderstatus"), lit("O")).as("status_nz"),
        when(col("prev_price").isNull, lit("first"))
          .otherwise(lit("repeat")).as("order_seq"))
  }

  /** JSON extraction over events.props (MySQL JSON_EXTRACT parity). */
  def q26_json(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        davg(col("k")).as("avg_k"),
        max(col("k")).as("max_k"))

  /** GROUP_CONCAT parity: deterministic ordered string agg. */
  def q27_group_concat(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d)
    val su = Tables.supplier(s, d)
    n.join(su, n("n_nationkey") === su("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"))
  }

  /** Pivot: per-user event-type totals (wide schema from groupBy.pivot). */
  def q29_pivot(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(dsum(col("value")))

  /** As-of join, the scalable way: instead of a per-row theta join
    * (quadratic in events-per-user), union the two sides and take a running
    * `last(click_ts)` window — one shuffle, O(n log n) per user. For each
    * 'error' event: timestamp of the latest 'click' by the same user at-or-
    * before it.
    */
  def q30_asof_join(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type").isin("click", "error"))
      // clicks sort before errors at equal ts (is_probe 0<1) → ties count as
      // "at-or-before", matching the oracle's c.ts <= e.ts
      .withColumn("is_probe", when(col("event_type") === "error", 1).otherwise(0))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"),
        date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss").as("last_click_s"))
  }

  /** HLL++ approximate distinct with its error contract HASH-GATED
    * (round-8 verdict item 6): the estimate itself is engine-specific (no
    * DuckDB twin can replay Spark's HLL++ registers), so the gated output
    * carries the EXACT count plus an integer VERDICT — |approx − exact| ≤
    * 5% of exact — that the oracle asserts as literal truth. The sketch
    * still runs end-to-end and a contract violation flips the verdict to
    * 0 → hash mismatch → red row: falsifiable, not decorative. HLL++ is a
    * deterministic function of the input set, so the verdict is stable
    * per fixture. At 100 TB the approx aggregate is the production path
    * (mergeable sketches, no exact-distinct shuffle expansion); the exact
    * twin riding next to it here is the acceptance audit a pipeline runs
    * when onboarding the sketch — distributed (hash-partitioned distinct),
    * never a single-reducer buffer.
    */
  def q32_approx_distinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      // rsd=0.016 (q65's lgK=12 accuracy): the 5% gate is then ~3 sigma,
      // not 1 sigma — at the default rsd=0.05 a healthy engine lands a
      // group outside 5% with material probability on a new fixture/SF,
      // flipping the verdict bit with no bug to find
      .agg(approx_count_distinct(col("l_partkey"), 0.016)
          .as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          ceil(col("exact_parts") * 0.05)).cast("long").as("within_rsd"))

  /** q12's semantics on the native two-phase heap operator
    * (graft.plans.TopKPerGroup) instead of a window sort — oracle-checked
    * against the same SQL, proving the custom SparkPlan is correct.
    */
  def q33_topk_native(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.TopKPerGroup.topK(joined,
      Seq("c_mktsegment"),
      Seq(graft.plans.TopKPerGroup.Ord("o_totalprice", desc = true),
        graft.plans.TopKPerGroup.Ord("o_orderkey")), 3)
  }

  /** UDTF surface: LATERAL VIEW explode in raw SQL (generator in a SELECT). */
  def q34_lateral_explode(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "documents")(
      """SELECT tok, count(*) AS n
        |FROM documents LATERAL VIEW explode(split(text, ' ')) AS tok
        |GROUP BY tok""".stripMargin)

  /** Map explode over parsed JSON (MySQL JSON_EXTRACT-era parity, arrays/
    * maps beyond it).
    */
  def q35_map_explode(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))).as(Seq("k_name", "k_val")))
      .groupBy(col("k_name"))
      .agg(count(lit(1)).as("n"), sum(col("k_val")).as("total"))

  /** RANGE window frame: per-user trailing-1-hour event-value sum, anchored
    * on epoch seconds so the frame bound is a plain numeric range (shared
    * precision with the oracle).
    */
  def q36_range_frame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-3600L, 0L)
    graft.Tables.events(s, d)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("trailing_hour_value",
        sum(col("value").cast(dec)).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("trailing_hour_value"))
  }

  /** Statistical aggregates from exact decimal sums: stddev and correlation
    * assembled from sum/sum-of-squares/cross-sum, all summed as
    * DECIMAL(38,6) then combined in double with an identical expression on
    * both engines — deterministic, unlike built-in stddev/corr whose
    * accumulation formulas (Welford vs naive) differ per engine. corr is
    * rounded to 9dp: the composite mul-sub expression drifts by 1 ulp
    * across engines (compiler FMA fusion), ~1e-19 — far below 0.5e-9. The SQL
    * text below IS the oracle text (ANSI subset both engines parse).
    */
  private val q39Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
      |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy2,
      |         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |       sqrt((sx2 - sx * sx / n) / (n - 1)) AS stddev_qty,
      |       round((n * sxy - sx * sy)
      |         / sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 9) AS corr_qty_price
      |FROM s""".stripMargin

  def q39_stats(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(q39Sql)

  /** Exact median / quartiles per group: Spark `percentile` and DuckDB
    * `quantile_cont` both do linear interpolation on the sorted values —
    * midpoint arithmetic on identical doubles is identical.
    */
  def q40_median(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderstatus,
        |       percentile(o_totalprice, 0.5) AS median_price,
        |       percentile(o_totalprice, 0.25) AS p25,
        |       percentile(o_totalprice, 0.75) AS p75,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin)

  /** Deterministic systematic sampling — the reproducible corpus-subsample
    * op (every engine/run picks the same rows, unlike seeded RNG sampling
    * whose stream is engine-specific). Knuth multiplicative hash on the key
    * in plain 64-bit arithmetic, expressible identically on both engines;
    * keeps ~5%. The key is reduced mod a prime BEFORE the multiply so the
    * product stays far from Long overflow at any corpus key range (ANSI
    * mode would otherwise error at ~3.5e9 keys).
    */
  def q41_systematic_sample(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE ((l_orderkey % 1000003) * 2654435761 + l_linenumber * 40503)
        |        % 4294967296 < 214748365
        |""".stripMargin)

  /** Remaining ranking/analytic window family (dense_rank, ntile,
    * first/last value, percent_rank/cume_dist — all rank-derived, so
    * cross-engine exact) + an RE2-and-Java-compatible regexp filter.
    */
  def q42_window_misc(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "customer")(
      """SELECT c_custkey,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drk,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       first_value(c_custkey) OVER w AS richest_key,
        |       round(percent_rank() OVER w, 9) AS prk,
        |       round(cume_dist() OVER w, 9) AS cd
        |FROM customer
        |WHERE c_name RLIKE '^Customer#[0-9]+$'
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)""".stripMargin)

  /** Right-outer equi join (the §2B inventory's fourth join type; mirror of
    * q04 with the preserved side on the right). Catalyst plans it as the
    * mirrored left join — the small preserved side still broadcasts.
    */
  def q43_right_join(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(n, c("c_nationkey") === n("n_nationkey"), "right")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"),
        coalesce(dsum(col("c_acctbal")), lit(0.0)).as("total_bal"))
  }

  /** lead + lag + last_value in one window family (completes the §2B
    * offset/value window inventory; q14 covers lag-only, q42 first_value).
    * last_value needs the explicit unbounded frame — the default frame ends
    * at CURRENT ROW, where last_value degenerates to the row itself (both
    * engines agree on that trap, but the unbounded form is the useful op).
    */
  def q44_window_lead_last(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderkey, o_custkey,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       last_value(o_orderkey) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS final_order_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin)

  /** Approximate percentiles (mergeable quantile summary) — the 100 TB
    * scale path for q40's exact quantiles: per-partition sketches, one
    * tiny row per group crosses the shuffle, bounded rank error. Sketch
    * VALUES are engine-specific, so the hash gate carries the rank-error
    * CONTRACT instead (round-8 verdict item 6): exact n per group plus
    * one verdict bit per φ, recomputed by ranking the sketch's answer
    * against the data; the oracle asserts the contract as literal truth
    * and any violation flips a bit → hash red. q40 remains the exact
    * value twin in QueriesSpec.
    */
  def q46_approx_percentile(s: SparkSession, d: String): DataFrame = {
    // rank-audit gate (round-8 verdict item 6): approx_percentile(acc=1e4)
    // guarantees the returned element's rank is within n/acc of φ·n. The
    // estimate can't cross engines, but the CONTRACT can: re-rank each
    // returned value against the data (two counts: strictly-below and
    // at-or-below bracket the value's rank span) and gate the boolean.
    // The audit is a broadcast join + conditional aggregate — distributed,
    // no exact-percentile single-task buffer anywhere in the plan.
    val o = Tables.orders(s, d).select(col("o_orderstatus"), col("o_totalprice"))
    val appx = o.groupBy(col("o_orderstatus"))
      .agg(expr(
        "approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 10000)")
        .as("qs"), count(lit(1)).as("n"))
      .select(col("o_orderstatus").as("st"), col("n"),
        element_at(col("qs"), 1).as("a25"),
        element_at(col("qs"), 2).as("a50"),
        element_at(col("qs"), 3).as("a75"))
    // rank span [cnt_lt+1, cnt_le] must intersect [(φ−ε)n−1, (φ+ε)n+1]
    // — SketchQueries.rankOk, the one shared spelling of the bracket
    def ok(phi: Double, a: Column) =
      SketchQueries.rankOk(phi, a, col("o_totalprice"), col("n"),
        eps = 1.0 / 10000.0)
    o.join(broadcast(appx), o("o_orderstatus") === appx("st"))
      .groupBy(col("o_orderstatus"), col("n"))
      .agg(ok(0.25, col("a25")).as("ok_p25"),
        ok(0.50, col("a50")).as("ok_p50"),
        ok(0.75, col("a75")).as("ok_p75"))
      .select(col("o_orderstatus"), col("n"),
        col("ok_p25"), col("ok_p50"), col("ok_p75"))
  }

  /** UNPIVOT / melt (inverse of q29's pivot): wide metric columns to
    * (metric, value) rows via the native `Dataset.unpivot` (planned as an
    * Expand — each input row fans out in the map stage, no shuffle until
    * the aggregate).
    */
  def q45_unpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))

  /** CORRELATED scalar subquery (q20 is the uncorrelated form): per-order
    * lineitem count. Catalyst decorrelates this into a left outer join
    * against the pre-aggregated subquery — no per-row re-execution, which
    * is exactly why the SQL surface can afford to offer it at 100 TB.
    */
  def q47_correlated_subquery(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders", "lineitem")(
      """SELECT o_orderkey, o_orderstatus,
        |       (SELECT count(*) FROM lineitem
        |        WHERE l_orderkey = o_orderkey) AS n_items
        |FROM orders
        |WHERE o_totalprice > 400000""".stripMargin)

  /** Bounded sliding ROWS frame (q13 = running unbounded, q36 = RANGE):
    * centered moving average over each customer's order history.
    */
  def q48_moving_average(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderkey, o_custkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
        |         / count(*) OVER w AS moving_avg,
        |       CAST(count(*) OVER w AS BIGINT) AS frame_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""".stripMargin)

  /** LATERAL correlated derived table (top-2 customers per nation) — the
    * SQL-standard form of per-row subquery iteration; Catalyst plans it as
    * a correlated join with the limit pushed inside, not a per-row loop.
    * (q34's LATERAL VIEW explode is the array flavor; this is the
    * subquery flavor.)
    */
  def q49_lateral_join(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "nation", "customer")(
      """SELECT n_name, top_c.c_name, top_c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) AS top_c""".stripMargin)

  /** Pagination (ORDER BY + LIMIT/OFFSET) + plain LIKE prefix match — the
    * two most common raw-MySQL idioms the reference's users would ship
    * verbatim. Deterministic because the sort key is unique; Spark plans
    * OFFSET+LIMIT as a single take-ordered over (offset+limit) rows, not a
    * global sort.
    */
  def q50_pagination(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "customer")(
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_name LIKE 'Customer#0000001%'
        |ORDER BY c_acctbal DESC, c_custkey
        |LIMIT 20 OFFSET 10""".stripMargin)

  /** Time-series resample + gap fill — the "regularize an event stream
    * onto an hourly grid" op every monitoring/feature pipeline needs:
    * build the full hour spine (sequence + explode — a distributed row
    * generator, rows appear map-side), cross it with the dimension,
    * left-join the hourly aggregate, and forward-fill missing hours with
    * the last observed value (`last(_, ignoreNulls)` over an unbounded
    * preceding frame). The spine bounds come from a 1-row aggregate
    * (broadcast), so no driver-side date math; volumes go through dsum so
    * the carried-forward values are exact on both engines.
    */
  def q51_gap_fill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hourly = ev
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vol"))
    val bounds = ev.agg(
      date_trunc("HOUR", min(col("ts"))).as("mn"),
      date_trunc("HOUR", max(col("ts"))).as("mx"))
    val spine = bounds
      .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
      .crossJoin(ev.select(col("event_type")).distinct())
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("hour", "event_type"), "left")
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("vol"), ignoreNulls = true).over(w).as("filled_vol"))
  }

  /** q169: LINEAR interpolation over the resampled grid — the imputation
    * mode q51's forward-fill lacks (pandas `interpolate`, InfluxDB
    * `fill(linear)`): a missing hour between two anchors takes the
    * straight-line value, hours before the first anchor back-fill and
    * after the last forward-fill (tagged 'edge' so a consumer can drop
    * extrapolation-free rows). ALL integer: anchor sums are exact BIGINT
    * cents, grid positions are epoch hours, and the interpolation is
    * `pc + (nc − pc)·(h − ph) div (nh − ph)` — int64 end to end, and
    * signed-safe because BOTH engines truncate integer division toward
    * zero (verified: Spark `-7 div 2` = DuckDB `-7 // 2` = −3). Shape:
    * the anchors are one hash aggregate, the spine is a map-side row
    * generator, and the four anchor-lookup passes are two window frames
    * (backward last / forward first, IGNORE NULLS) over the SAME
    * event_type partitioning — one shuffle of the grid, whose size is
    * |hours|×|types| regardless of event volume.
    */
  def q169_interpolate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val anchors = ev.groupBy(col("hour"), col("event_type"))
      .agg(sum(col("cents")).as("c"))
    val bounds = ev.agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
    val grid = bounds
      .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
      .crossJoin(ev.select(col("event_type")).distinct())
    val j = grid.join(anchors, Seq("hour", "event_type"), "left")
      .withColumn("h", expr("unix_seconds(hour) div 3600"))
    val back = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val anchorH = when(col("c").isNotNull, col("h"))
    j.withColumn("pc", last(col("c"), ignoreNulls = true).over(back))
      .withColumn("ph", last(anchorH, ignoreNulls = true).over(back))
      .withColumn("nc", first(col("c"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(anchorH, ignoreNulls = true).over(fwd))
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        when(col("c").isNotNull, "anchor")
          .when(col("ph").isNull || col("nh").isNull, "edge")
          .otherwise("interp").as("kind"),
        when(col("c").isNotNull, col("c"))
          .when(col("ph").isNull, col("nc"))
          .when(col("nh").isNull, col("pc"))
          // expr, not Column `/` (which is DOUBLE division on longs):
          // `div` keeps the int64 truncating semantics both engines share
          .otherwise(expr("pc + (nc - pc) * (h - ph) div (nh - ph)"))
          .as("filled_cents"))
  }

  /** MERGE/upsert maintenance — the "apply a change batch to a snapshot"
    * op (the scaled-up analogue of the sheets sink's upsert-by-name):
    * matched keys update, unmatched source keys insert, untouched rows
    * keep. Without a transactional table format this is the canonical
    * full-outer-join + coalesce rewrite; the join shuffles both sides on
    * the key (sort-merge at scale, AQE-broadcast when the change batch is
    * small — which a daily batch is). The change batch is derived
    * deterministically from the fixture: +100.00 price corrections for
    * every 7th key, negated keys for inserts (disjoint from the positive
    * key space at ANY scale factor, so an "insert" can never collide with
    * a real order and break MERGE's match-at-most-once invariant).
    */
  def q53_merge_upsert(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """WITH changes AS (
        |  SELECT o_orderkey AS k, o_totalprice + 100.0 AS new_price
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT -o_orderkey AS k, 42.0 AS new_price
        |  FROM orders WHERE o_orderkey % 1000 = 0),
        |merged AS (
        |  SELECT coalesce(o.o_orderkey, c.k) AS k,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |              WHEN c.k IS NULL THEN 'keep' ELSE 'update' END AS action,
        |         coalesce(c.new_price, o.o_totalprice) AS price
        |  FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.k)
        |SELECT action, count(*) AS n_rows,
        |       CAST(sum(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total_price
        |FROM merged GROUP BY action""".stripMargin)

  /** Aggregate FILTER clause — per-group conditional aggregation without
    * self-joins or CASE pyramids (the SQL-standard form Spark and DuckDB
    * both plan as one pass with predicated partial aggregates).
    */
  def q52_filter_clause(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      s"""SELECT o_orderpriority,
         |       count(*) AS n_total,
         |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
         |       count(*) FILTER (WHERE o_totalprice > 200000) AS n_large,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
         |              FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
         |         AS open_volume
         |FROM orders
         |GROUP BY o_orderpriority""".stripMargin)

  /** Recursive CTE (SQL:1999 WITH RECURSIVE, Spark 4's UnionLoop operator).
    * Hierarchy walk the fixture lacks a parent column for, so the tree is
    * the implicit binary heap on p_partkey (parent = key DIV 2): every part
    * climbs to the root, and the rollup prices each level of the hierarchy.
    * Each recursion step is one self-reference scan + filter — Spark runs
    * it as iterated incremental steps (the frontier is only the rows added
    * last round), so depth-d recursion over n rows costs O(n·d) total rows,
    * never materializing more than the running union. Depth here is
    * log2(max key) ≈ 15 at sf0.1 — far under the 100-level default cap.
    */
  def q54_recursive_cte(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "part")(
      """WITH RECURSIVE anc(node, a, depth, price) AS (
        |  SELECT p_partkey, p_partkey, 0, p_retailprice FROM part
        |  UNION ALL
        |  SELECT node, a DIV 2, depth + 1, price FROM anc WHERE a > 1
        |)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes,
        |       CAST(sum(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS level_price
        |FROM anc GROUP BY depth""".stripMargin)

  /** IGNORE NULLS across the offset-window family (lag / lead / nth_value):
    * per customer ordered by date, carry the previous and next *finished*
    * order's price past open-order gaps. One shuffle on o_custkey serves
    * all three window functions (same partition + order spec).
    */
  def q55_ignore_nulls(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_custkey, o_orderkey,
        |       lag(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)
        |         IGNORE NULLS OVER w AS prev_f_price,
        |       lead(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)
        |         IGNORE NULLS OVER w AS next_f_price,
        |       nth_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 1)
        |         IGNORE NULLS OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS first_f_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)

  /** Ordered-set aggregates (SQL:2008 WITHIN GROUP). percentile_disc
    * picks actual stored values — no interpolation, so cross-engine
    * equality is exact by construction; percentile_cont mirrors q40's
    * proven-matching median. Same 100 TB caveat as q40/c02: exact
    * percentiles buffer per-group distinct values in the final merge —
    * fine keyed by a low-cardinality group, and q46/c06 are the
    * registered approx scale twins for the global case.
    */
  def q56_within_group(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderpriority,
        |       percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25_disc,
        |       percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75_disc,
        |       percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_cont,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin)

  /** Ordered event-funnel analysis (view → click-after-view →
    * purchase-after-click): the per-stage user counts every product
    * analytics engine sells as a primitive. Each stage is one filtered
    * min-timestamp aggregate keyed by user plus an equi join back on the
    * user key — partial-aggregated map-side, shuffle carries one row per
    * user per stage, and at 100 TB the three stage frames co-partition on
    * user_id so AQE reuses the exchange. Timestamps truncate to whole
    * seconds first (the engines' shared precision); stage boundaries use
    * >= so a same-second view+click still advances the funnel on both
    * engines identically, and each conversion must land within 24 h of
    * the previous stage (sweep-chosen so the fixture funnel actually
    * narrows: 150 -> 60 -> 25 at sf0.01, not a vacuous all-pass).
    */
  def q57_funnel(s: SparkSession, d: String): DataFrame = {
    // each stage frame feeds BOTH the next stage and its own count —
    // checkpoint the tiny per-user aggregates (and the shared scan) once,
    // or the unioned counts re-execute the whole prefix per stage (the
    // d03 4x-recompute lesson)
    val e = Tables.events(s, d)
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts_s"),
        col("event_type"))
      .localCheckpoint()
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t1"))
      .localCheckpoint()
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts_s") >= col("t1") &&
        col("ts_s") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t2"))
      .localCheckpoint()
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts_s") >= col("t2") &&
        col("ts_s") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t3"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("stage"), col("n_users"))
    stage(v, "1_view")
      .unionAll(stage(c, "2_click_after_view"))
      .unionAll(stage(p, "3_purchase_after_click"))
  }

  /** Cohort retention — the other analytics-engine staple next to q57's
    * funnel: users grouped by first-seen day, activity counted per
    * day-offset since the cohort day. Two hash aggregates keyed by
    * user_id then (cohort, offset) — both partial-aggregate map-side, and
    * the self-join on user_id co-partitions with q57's stage frames. Day
    * arithmetic is integer (datediff) so there is nothing to drift.
    */
  def q58_retention(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"), col("n_active"))
  }

  /** Last-touch marketing attribution: every purchase credits the most
    * recent view/click by the same user within 24 h, else counts as
    * unattributed. One carry-forward window per user (last non-null touch
    * via IGNORE NULLS over the time-ordered event stream) — the same
    * zero-join shape as q51's gap fill, so the whole attribution pass is
    * a single shuffle on user_id however many touch types there are
    * (the naive formulation is one as-of join PER touch type). Ordering
    * ties break on the unique event_id; timestamps truncate to shared
    * second precision.
    */
  def q59_attribution(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts_s"),
        col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchTs = when(col("event_type") =!= "purchase", col("ts_s"))
    e.withColumn("touch_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("touch_ts", last(touchTs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("touch_ts").isNotNull &&
          col("ts_s") <= col("touch_ts") + expr("INTERVAL 24 HOURS"),
          col("touch_type")).otherwise("unattributed").as("touch"))
      .groupBy(col("touch")).agg(count(lit(1)).as("n_purchases"))
  }

  /** Rolling 7-day active users (WAU) per day. COUNT(DISTINCT) over a
    * sliding window is not expressible as a window function (no engine
    * merges distinct sets incrementally), so the scalable rewrite fans
    * each distinct (user, day) pair out to its <= 7 window-END days via
    * explode(sequence(day, day+6)) — a pure map-side expansion — and
    * equi-aggregates the distinct count keyed by window end. A range
    * predicate against the day spine would plan as a
    * BroadcastNestedLoopJoin whose COMPUTE is rows x |spine| (every row
    * compared against every spine day — the scale-killer at a 10-year
    * corpus); the explode form is O(rows x 7) with a hash join, and the
    * left-semi to observed days only trims window ends that extend past
    * the last day with activity. Plan pinned BNLJ-free in
    * PlanInvariantsSpec.
    */
  def q60_rolling_wau(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint() // spine + activity derive from one distinct pass
    val spine = ud.select(col("day").as("d0")).distinct()
    ud.select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("d0"))
      .join(spine, Seq("d0"), "left_semi")
      .groupBy(col("d0"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(date_format(col("d0"), "yyyy-MM-dd").as("day"), col("wau"))
  }

  /** QUALIFY (DuckDB/Snowflake/BigQuery's post-window filter clause): top-2
    * orders per status. Spark has no QUALIFY keyword; its exact
    * decomposition is the filter-over-windowed-subquery below — the same
    * plan engines execute FOR the clause, so the DuckDB oracle uses real
    * QUALIFY syntax against this rewrite.
    */
  def q61_qualify(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 2""".stripMargin)

  /** grouping_id() over CUBE — distinguishes which aggregation level a
    * rollup row belongs to (the thing consumers ORDER BY / filter on when
    * reading cube output). Both engines assign bit N to the Nth grouping
    * expression, most-significant first.
    */
  def q62_grouping_id(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderstatus, o_orderpriority,
        |       grouping_id(o_orderstatus, o_orderpriority) AS gid,
        |       count(*) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)

  /** TABLESAMPLE's deterministic twin, bucket form: TABLESAMPLE(BUCKET 8
    * OUT OF 20) with engine RNG replaced by Knuth multiplicative hashing on
    * the key, so the "sample" is reproducible across engines, runs and
    * partitionings (REPEATABLE(seed) only pins it within one engine). The
    * predicate reaches the scan as a pushed filter; downstream aggregation
    * sees an unbiased 1/20 stratum.
    */
  /** Mod-first multiplicative hash (the c01/hashCol invariant): the raw
    * key x 2654435761 product overflows Long past key ~3.5e9, where Spark
    * wraps silently while DuckDB errors — mod by 1000003 BEFORE the
    * multiply keeps both engines exact at any key range.
    */
  private val q63Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
      |FROM orders
      |WHERE ((o_custkey % 1000003) * 2654435761) % 20 = 7
      |GROUP BY o_orderstatus""".stripMargin

  def q63_bucket_sample(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q63Sql)

  /** explode_outer — unnest that PRESERVES rows whose array is empty (an
    * inner explode silently drops them, the classic lost-document bug in
    * per-token pipelines). Docs with no 'q'-prefixed token survive with a
    * NULL token. DuckDB spells the outer behavior as a CASE-wrapped [NULL].
    */
  def q64_explode_outer(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode_outer(expr(
          "filter(split(text, ' '), t -> substring(t, 1, 1) = 'q')"))
          .as("qword"))

  /** Linear-regression aggregate family (REGR_SLOPE / REGR_INTERCEPT /
    * REGR_R2 / REGR_AVGX / REGR_AVGY / REGR_COUNT) — ordinary least squares
    * of extendedprice on quantity per return flag. Built from the q39
    * decimal-sum pattern rather than the engines' native regr_* functions:
    * DECIMAL(38,6) partial sums are exactly associative (map-side combine
    * safe at any partitioning), and the closed-form OLS arithmetic then
    * runs on identical doubles in both engines, so the statistics
    * themselves hash-check (native float regr_* would drift with
    * summation order). Shared SQL text, q39Sql's structure extended.
    */
  private val q67Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
      |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy2,
      |         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |       CAST(n AS BIGINT) AS regr_n,
      |       round(sx / n, 9) AS avg_x,
      |       round(sy / n, 9) AS avg_y,
      |       round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 9) AS slope,
      |       round(sy / n - ((n * sxy - sx * sy) / (n * sx2 - sx * sx)) * (sx / n), 9)
      |         AS intercept,
      |       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |         / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 9) AS r2
      |FROM s""".stripMargin

  def q67_regression(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(q67Sql)

  /** Time-INTERVAL range frame — `RANGE BETWEEN INTERVAL '30' MINUTE
    * PRECEDING AND CURRENT ROW` over a TIMESTAMP ordering (q36 covers the
    * numeric-range frame; this is the calendar-typed SQL surface users
    * actually write for trailing-window metrics). The frame needs each
    * user's events time-sorted within its partition — fine when the
    * partition key bounds the data (per-user streams); an unbounded-key
    * trailing count would switch to q60's explode fan-out instead.
    * DECIMAL-summed volume keeps the frame aggregate hash-exact; the
    * DuckDB twin truncates its ns timestamps to Spark's µs precision.
    */
  private val q68FrameSql: String =
    """SELECT event_id, user_id,
      |       count(*) OVER w AS n_last30m,
      |       CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS vol_last30m
      |FROM %s
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL '30' MINUTE PRECEDING AND CURRENT ROW)""".stripMargin

  def q68_time_range_frame(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_norm")
    s.sql(q68FrameSql.format("events_norm"))
  }

  /** Data-quality audit — the validation stage (Deequ/Great-Expectations
    * shape) every production pipeline runs before publishing a table:
    * per-column completeness, distinct counts, ranges, and declared
    * constraint violations, emitted as (column, metric, value) rows. ONE
    * aggregation pass computes every metric (count/count-distinct/min/max
    * are all map-side-partial; nothing rescans the table per metric) and
    * the metric rows unpivot from the single 1-row aggregate — identical
    * SQL text on both engines, every value exact in double.
    */
  private val q69AuditSql: String =
    """WITH a AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
      |         CAST(count(l_quantity) AS DOUBLE) AS nn_qty,
      |         CAST(count(DISTINCT l_quantity) AS DOUBLE) AS nd_qty,
      |         CAST(min(l_quantity) AS DOUBLE) AS min_qty,
      |         CAST(max(l_quantity) AS DOUBLE) AS max_qty,
      |         CAST(count(l_extendedprice) AS DOUBLE) AS nn_price,
      |         CAST(count(DISTINCT l_extendedprice) AS DOUBLE) AS nd_price,
      |         CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
      |         CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
      |         CAST(count(l_returnflag) AS DOUBLE) AS nn_flag,
      |         CAST(count(DISTINCT l_returnflag) AS DOUBLE) AS nd_flag,
      |         CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
      |              AS DOUBLE) AS bad_discount,
      |         CAST(count(*) FILTER (WHERE l_quantity <= 0)
      |              AS DOUBLE) AS bad_qty
      |  FROM lineitem)
      |SELECT 'table' AS column_name, 'row_count' AS metric, n_rows AS value FROM a
      |UNION ALL SELECT 'l_quantity', 'completeness', nn_qty / n_rows FROM a
      |UNION ALL SELECT 'l_quantity', 'n_distinct', nd_qty FROM a
      |UNION ALL SELECT 'l_quantity', 'min', min_qty FROM a
      |UNION ALL SELECT 'l_quantity', 'max', max_qty FROM a
      |UNION ALL SELECT 'l_extendedprice', 'completeness', nn_price / n_rows FROM a
      |UNION ALL SELECT 'l_extendedprice', 'n_distinct', nd_price FROM a
      |UNION ALL SELECT 'l_extendedprice', 'min', min_price FROM a
      |UNION ALL SELECT 'l_extendedprice', 'max', max_price FROM a
      |UNION ALL SELECT 'l_returnflag', 'completeness', nn_flag / n_rows FROM a
      |UNION ALL SELECT 'l_returnflag', 'n_distinct', nd_flag FROM a
      |UNION ALL SELECT 'l_discount', 'violations_range_0_0.1', bad_discount FROM a
      |UNION ALL SELECT 'l_quantity', 'violations_nonpositive', bad_qty FROM a""".stripMargin

  def q69_data_quality(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(q69AuditSql)

  /** Deterministic MODE aggregate — most frequent value per group with a
    * min-value tie-break. Built from count + rank rather than the engines'
    * native `mode()` (whose tie choice is implementation-defined — Spark
    * and DuckDB may legitimately disagree, which is exactly the kind of
    * silent nondeterminism a cross-engine pipeline can't ship). Two
    * map-side-partial hash aggregates + a 1-row-per-group reduction;
    * the same SQL text runs on both engines.
    */
  private val q70Sql: String =
    """WITH f AS (
      |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_orderpriority, o_orderstatus AS mode_status, n AS n_rows
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
      |             ORDER BY n DESC, o_orderstatus) AS rk FROM f) t
      |WHERE rk = 1""".stripMargin

  def q70_mode(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q70Sql)

  /** GROUP BY ALL — the modern shorthand (Spark 3.4+ / DuckDB both infer
    * the grouping keys from the non-aggregate select items); identical
    * text both engines, decimal-pathed volume.
    */
  private val q71Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
      |FROM orders GROUP BY ALL""".stripMargin

  def q71_group_by_all(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q71Sql)

  /** Semi-structured VARIANT path (Spark 4's headline type): parse the
    * JSON props column once into VARIANT, extract typed paths with
    * `variant_get`, aggregate — the open-schema event-payload pattern
    * (q26 covers string-side get_json_object; this is the binary-encoded
    * typed path, ~an order of magnitude faster at scale because the parse
    * happens once and extraction is a binary walk, not a re-parse per
    * path). DuckDB twin uses its native JSON extraction — same values.
    */
  def q72_variant(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_norm")
    s.sql(
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT)
        |         AS total_k
        |FROM events_norm
        |GROUP BY event_type""".stripMargin)
  }

  /** DISTINCT aggregate over a window — `COUNT(DISTINCT x) OVER (PARTITION
    * BY k)` is valid ANSI (and runs natively in DuckDB — the oracle uses
    * the real clause) but Spark rejects DISTINCT in window aggregates, so
    * the engine-surface translation is `size(collect_set(x) OVER w)`:
    * set semantics make it order-independent (deterministic under any
    * partitioning) and the per-partition buffer is bounded by the counted
    * column's cardinality (5 priorities here). For unbounded-cardinality
    * columns the right plan is the groupBy-distinct + join-back twin, or
    * approx_count_distinct over the window — this entry documents the
    * bounded-cardinality idiom.
    */
  def q73_window_distinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .withColumn("n_prio",
        size(collect_set(col("o_orderpriority"))
          .over(Window.partitionBy(col("o_custkey")))).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("n_prio"))

  /** Gap-based batch sessionization — the classic clickstream staple
    * (split each user's event stream into sessions at >30-min silences)
    * and the batch twin of st02's streaming session windows: lag() flags
    * session starts, a running sum numbers them, one groupBy emits the
    * per-session stats. Two window passes + one aggregate over the same
    * (user_id, time) partitioning — Spark reuses the sort across the
    * windows and the partial-aggregated groupBy, so the whole operator is
    * a single shuffle on user_id. Determinism: gaps compare in exact
    * epoch-µs integers (both engines see identical µs values — Spark's ts
    * is ns DIV 1000, DuckDB casts ns::TIMESTAMP), ties break on event_id,
    * and the outputs are integers + whole-second formatted bounds →
    * hash-green.
    */
  def q74_sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        date_format(timestamp_micros(min(col("us"))), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(timestamp_micros(max(col("us"))), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        expr("(max(us) - min(us)) div 1000000").as("duration_s"))
  }

  /** Slowly-changing-dimension Type 2 history build — collapse each user's
    * event stream into contiguous same-state runs and effective-date them
    * ([valid_from, valid_to) with NULL valid_to on the current row): the
    * warehouse-ETL staple that turns a change log into a dimension you can
    * as-of join (q30) against. Same single-shuffle shape as q74: the
    * change flag, run numbering, and the valid_to lead() all share one
    * (user_id, time) sort; runs collapse in a partial-aggregated groupBy.
    * Determinism: state changes compare exactly, run bounds are epoch-µs
    * integers formatted to whole seconds, ties break on event_id.
    */
  def q75_scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRuns = Window.partitionBy(col("user_id")).orderBy(col("run_idx"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          col("event_type") =!= lag(col("event_type"), 1).over(w), 1L)
          .otherwise(0L))
      .withColumn("run_idx", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("run_idx"), col("event_type").as("state"))
      .agg(min(col("us")).as("from_us"), count(lit(1)).as("n_events"))
      .withColumn("valid_from",
        date_format(timestamp_micros(col("from_us")), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("valid_to",
        date_format(timestamp_micros(lead(col("from_us"), 1).over(wRuns)),
          "yyyy-MM-dd HH:mm:ss"))
      .withColumn("is_current", lead(col("from_us"), 1).over(wRuns).isNull)
      .select(col("user_id"), col("run_idx"), col("state"), col("n_events"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Per-group z-score outlier detection — the screening stage of every
    * data-quality / fraud pipeline: flag rows beyond 1.5σ of their group
    * (the fixture's totalprice is near-uniform, whose max deviation is
    * √3σ ≈ 1.73σ, so a textbook 2σ screen would be vacuous on it; the
    * threshold is the operator's tuning knob, not its shape).
    * Two passes over the fact table (one to aggregate moments, one to
    * screen — the group stats join back broadcast), both
    * map-side-partial. Determinism is the q39/q67 recipe: Σx and Σx² run
    * through DECIMAL (exactly associative, order-independent), every
    * float op after that is the same IEEE expression on identical inputs
    * (sqrt is correctly rounded), and the output is integer counts —
    * identical SQL text on both engines, hash-green. A streaming or
    * incremental variant persists (n, s1, s2) per group and merges by
    * addition — the same mergeable-partials architecture as q66.
    */
  private val q77Sql: String =
    """WITH g AS (
      |  SELECT o_orderpriority, count(*) AS n,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS s1,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,3)) *
      |                  CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS s2
      |  FROM orders GROUP BY 1)
      |SELECT o.o_orderpriority, g.n AS n_orders,
      |       count(*) FILTER (WHERE
      |         abs(o.o_totalprice - g.s1 / g.n) >
      |         1.5 * sqrt(g.s2 / g.n - (g.s1 / g.n) * (g.s1 / g.n))) AS n_outliers
      |FROM orders o JOIN g ON o.o_orderpriority = g.o_orderpriority
      |GROUP BY 1, 2""".stripMargin

  def q77_outlier_zscore(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q77Sql)

  /** Linear interpolation over the hourly grid — q51's resample with the
    * other fill policy every feature pipeline needs (forward-fill holds a
    * step function; interpolation draws the line): bracket each missing
    * hour with the nearest observed value on each side (last/first
    * IGNORE NULLS over mirrored frames — same one-sort window stack) and
    * fill prev + (next-prev) * (h-prev_h)/(next_h-prev_h) on the integer
    * epoch-hour axis. Leading/trailing edges (no bracket on one side)
    * hold the single available neighbor. Determinism: observed volumes
    * are exact (dsum), hour indexes are integers, and both engines
    * evaluate the one identical interpolation expression on identical
    * doubles → hash-green.
    */
  def q78_interpolate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hourly = ev
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vol"))
    val bounds = ev.agg(
      date_trunc("HOUR", min(col("ts"))).as("mn"),
      date_trunc("HOUR", max(col("ts"))).as("mx"))
    val spine = bounds
      .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
      .crossJoin(ev.select(col("event_type")).distinct())
    val wb = Window.partitionBy(col("event_type")).orderBy(col("hr_i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("event_type")).orderBy(col("hr_i"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(hourly, Seq("hour", "event_type"), "left")
      .withColumn("hr_i", expr("unix_timestamp(hour) DIV 3600"))
      .withColumn("pv", last(col("vol"), ignoreNulls = true).over(wb))
      .withColumn("pi",
        last(when(col("vol").isNotNull, col("hr_i")), ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("vol"), ignoreNulls = true).over(wf))
      .withColumn("ni",
        first(when(col("vol").isNotNull, col("hr_i")), ignoreNulls = true).over(wf))
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        when(col("vol").isNotNull, col("vol"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("hr_i") - col("pi")) / (col("ni") - col("pi")))
          .as("interp_vol"))
  }

  /** Numeric RANGE frame — the value-bounded window variant (q13 runs ROWS
    * frames, q68 calendar-INTERVAL ranges; this bounds the frame by a
    * NUMERIC offset on the ORDER BY value): peers within ±500 of each
    * order's totalprice. Value-bounded frames are inherently
    * tie-insensitive — the frame is defined by the value interval, not row
    * positions — so the count is deterministic under any sort of equal
    * prices; identical SQL text both engines, integer output.
    */
  private val q79Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |       count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
      |                      RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
      |         AS n_similar
      |FROM orders""".stripMargin

  def q79_numeric_range_frame(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q79Sql)

  /** Error-tolerant ingestion audit — TRY_CAST over a dirty string column
    * (the fixture mixes numeric strings with free text deterministically):
    * per source, how many cells parse, how many don't, and the sum over
    * the parseable slice. This is the schema-on-read cleanup every
    * ingestion pipeline runs before declaring a typed column; `try_cast`
    * yields NULL on failure instead of failing the job (or silently
    * nulling under non-ANSI CAST), and the counts stay exact integers.
    * One scan, one aggregate; the only dialect split is STRING vs VARCHAR
    * in the cast target.
    */
  private def q80Sql(strType: String): String =
    s"""WITH raw AS (
       |  SELECT source,
       |         CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS $strType)
       |              WHEN doc_id % 3 = 1 THEN substr(text, 1, 8)
       |              ELSE CAST(doc_id AS $strType) END AS cell
       |  FROM documents)
       |SELECT source, count(*) AS n_rows,
       |       count(TRY_CAST(cell AS BIGINT)) AS n_numeric,
       |       count(*) - count(TRY_CAST(cell AS BIGINT)) AS n_bad,
       |       CAST(sum(COALESCE(TRY_CAST(cell AS BIGINT), 0)) AS BIGINT)
       |         AS total_ok
       |FROM raw GROUP BY source""".stripMargin

  def q80_try_cast_audit(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "documents")(q80Sql("STRING"))

  /** NULL-semantics matrix: the three places NULL keys silently corrupt a
    * pipeline, exercised in one query — (1) a null-safe FULL equi-join
    * (Spark `<=>`, DuckDB `IS NOT DISTINCT FROM`): the NULL key groups on
    * both sides must MATCH each other, where a plain `=` would emit two
    * dangling rows; (2) genuine full-outer preservation: supplier keys 5
    * and 6 have no customer twin and must survive with NULL counts;
    * (3) explicit `NULLS FIRST` ordering, materialized as a row_number so
    * the ordering semantics themselves are hash-checked (engines disagree
    * on default NULL placement — Spark ASC puts NULLs first, DuckDB last —
    * so relying on the default is a cross-engine bug this query would
    * catch). The window orders ≤ 8 post-aggregate rows (key domains are
    * mod-5/mod-7), not base data.
    */
  private def q85Sql(nullSafeEq: String): String =
    s"""WITH a AS (
       |  SELECT nullif(c_nationkey % 5, 0) AS k, count(*) AS n_cust
       |  FROM customer GROUP BY 1),
       |b AS (
       |  SELECT nullif(s_nationkey % 7, 0) AS k, count(*) AS n_supp
       |  FROM supplier GROUP BY 1),
       |j AS (
       |  SELECT a.k AS ka, b.k AS kb, a.n_cust, b.n_supp
       |  FROM a FULL JOIN b ON a.k $nullSafeEq b.k)
       |SELECT CAST(row_number() OVER (
       |         ORDER BY ka ASC NULLS FIRST, kb ASC NULLS FIRST) AS INT)
       |         AS pos,
       |       ka, kb, n_cust, n_supp
       |FROM j""".stripMargin

  def q85_null_semantics(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "customer", "supplier")(q85Sql("<=>"))

  /** Leave-one-out window aggregate — ANSI's `EXCLUDE CURRENT ROW` frame
    * modifier, which Spark's window grammar lacks: each line item's
    * quantity vs the average of its ±3 PEERS (self excluded) — the
    * neighborhood-outlier shape (is this row anomalous vs its
    * surroundings?) that naive self-inclusive frames dilute. Spark-first
    * emulation: one bounded-frame decimal sum and count, then subtract
    * the current row's own contribution — algebraically exact because the
    * sum is DECIMAL(38,6) (associative, no float cancellation), so the
    * result hash-matches DuckDB evaluating the REAL `EXCLUDE CURRENT ROW`
    * clause. Bounded ROWS frame → streaming-compatible, no
    * whole-partition state. Runs over orders, whose o_orderkey is unique,
    * so the frame ordering is total — the synthetic lineitem duplicates
    * (orderkey, linenumber), which would make ±3-row frames
    * engine-dependent.
    */
  def q86_window_exclude(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
      .rowsBetween(-3, 3)
    Tables.orders(s, d)
      .withColumn("s", sum(col("o_totalprice").cast(dec)).over(w))
      .withColumn("c", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round((col("s") - col("o_totalprice").cast(dec)).cast("double")
          / (col("c") - 1), 9).as("peer_avg_price"))
  }

  /** ANSI GROUPS window frames — `GROUPS BETWEEN 2 PRECEDING AND CURRENT
    * ROW` — which Spark's frame grammar omits entirely (ROWS/RANGE only).
    * Exact rewrite: peer groups tick `dense_rank()` over the ORDER BY key,
    * and an integer RANGE frame over that rank reproduces group-offset
    * framing precisely (all peers of the current row share its rank, so
    * CURRENT ROW spans the whole current group — GROUPS semantics). Both
    * windows partition on o_orderstatus, so EnsureRequirements plans one
    * exchange for the pair. The oracle is an independent formulation —
    * per-peer-group rollup, ROWS frame over the group rows, join back to
    * the detail rows — same numbers through a different plan (DuckDB has
    * no GROUPS mode to delegate to). DECIMAL(38,2) frame sums are exactly
    * associative → hash-green.
    */
  def q87_groups_frame(s: SparkSession, d: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderdate"))
    val byGrp = Window.partitionBy(col("o_orderstatus")).orderBy(col("grp"))
      .rangeBetween(-2, 0)
    Tables.orders(s, d)
      .withColumn("grp", dense_rank().over(byDate))
      .select(col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 2))).over(byGrp)
          .cast("double").as("grp_sum"))
  }

  /** ANSI frame exclusion, the peer-aware variants: `EXCLUDE GROUP` (drop
    * the current row AND its ORDER BY peers from the frame) and `EXCLUDE
    * TIES` (drop the peers but keep the current row) over a GROUPS-style
    * frame — q86 covered EXCLUDE CURRENT ROW on a peer-free total order,
    * where all three variants coincide; here the ordering (o_orderdate)
    * has real peer groups so they diverge. Emulation: frame sum minus the
    * peer-group sum — computed as a `RANGE BETWEEN CURRENT ROW AND
    * CURRENT ROW` frame over the same rank ordering (a RANGE frame's
    * CURRENT ROW spans ALL peers, so the zero-width frame IS the peer
    * group; and sharing the status partitioning keeps every window on one
    * exchange) — plus the row's own value back for TIES; a frame-count
    * guard reproduces ANSI's empty-frame NULL (sum over zero surviving
    * rows), which plain subtraction would render as 0. All in
    * DECIMAL(38,2) → exact → hash-green against DuckDB running the REAL
    * `EXCLUDE GROUP` / `EXCLUDE TIES` clauses.
    */
  def q88_exclude_ties(s: SparkSession, d: String): DataFrame = {
    val price = col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 2))
    val byDate = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderdate"))
    val frame = Window.partitionBy(col("o_orderstatus")).orderBy(col("grp"))
      .rangeBetween(-2, 0)
    val peers = Window.partitionBy(col("o_orderstatus")).orderBy(col("grp"))
      .rangeBetween(0, 0)
    Tables.orders(s, d)
      .withColumn("grp", dense_rank().over(byDate))
      .withColumn("fsum", sum(price).over(frame))
      .withColumn("fcnt", count(lit(1)).over(frame))
      .withColumn("gsum", sum(price).over(peers))
      .withColumn("gcnt", count(lit(1)).over(peers))
      .select(col("o_orderkey"),
        when(col("fcnt") > col("gcnt"), (col("fsum") - col("gsum")).cast("double"))
          .as("excl_group"),
        (col("fsum") - col("gsum") + price).cast("double").as("excl_ties"))
  }

  /** ANSI aggregate FILTER inside a WINDOW — `count(*) FILTER (cond) OVER
    * w` — the last of the window-grammar gaps (after q86-q88's EXCLUDE
    * and GROUPS): Spark supports FILTER on group aggregates (q52) but
    * rejects it under OVER. Emulation: route the condition through the
    * aggregated expression — `sum(CASE WHEN cond THEN 1 ELSE 0)` for the
    * filtered count, `sum(CASE WHEN cond THEN x END)` (nulls ignored) for
    * the filtered sum — algebraically exact for sum/count over the
    * DECIMAL(38,2) cast. The all-excluded frame yields NULL, coalesced to
    * 0 on both sides. DuckDB evaluates the REAL FILTER clause over the
    * same frame → the emulation's equivalence is itself hash-checked.
    * Frame orders by the unique o_orderkey (total order — ROWS frames
    * over ties are engine-dependent).
    */
  def q89_window_filter(s: SparkSession, d: String): DataFrame = {
    val price = col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 2))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
      .rowsBetween(-5, 0)
    Tables.orders(s, d).select(
      col("o_orderkey"),
      sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
        .over(w).as("n_urgent"),
      coalesce(
        sum(when(col("o_totalprice") > 100000, price)).over(w).cast("double"),
        lit(0.0)).as("big_sum"))
  }

  /** Market-basket association rules (the classic retail/co-occurrence
    * mining workload — a-priori's pairwise step): per part pair, joint
    * support, directional confidence, and lift. The pair generator is the
    * ORDER-bounded self-join — fan-out per order is C(items-in-order, 2)
    * (a handful), never parts² — which is the same banded economics as
    * d05/g02; supports are one hash aggregate and join back broadcast.
    * Counts are integers; confidence/lift are single identical
    * expressions over those exact integers, rounded to 9dp → hash-green.
    * Support floor 3: the co-occurrence distribution thins with SF (the
    * CoSupport lesson) and 3 keeps every fixture SF non-trivial.
    */
  private val q81Sql: String =
    """WITH n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
      |item AS (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2),
      |sup AS (SELECT l_partkey, count(*) AS cnt FROM item GROUP BY 1),
      |pair AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |         count(*) AS n_both
      |  FROM item a JOIN item b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 3)
      |SELECT part_a, part_b, n_both, sa.cnt AS n_a, sb.cnt AS n_b,
      |       round(CAST(n_both AS DOUBLE) / sa.cnt, 9) AS confidence_ab,
      |       round(CAST(n_both AS DOUBLE) * n.n_orders / (sa.cnt * sb.cnt), 9)
      |         AS lift
      |FROM pair
      |JOIN sup sa ON sa.l_partkey = part_a
      |JOIN sup sb ON sb.l_partkey = part_b
      |CROSS JOIN n""".stripMargin

  def q81_market_basket(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(q81Sql)

  /** Cohort LTV matrix — the revenue companion to q58's retention grid:
    * users bucketed by first-seen week, revenue accumulated by cohort age
    * in weeks (the fixture spans one month, so weekly granularity is what
    * yields a real matrix; a production run swaps the truncation unit).
    * Two aggregates and one keyed join (first-seen is a map-side-partial
    * min; the join back to events is the only shuffle pairing); age
    * arithmetic is integer day-diffs and revenue runs through the decimal
    * path → hash-green.
    */
  def q82_cohort_ltv(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_norm")
    s.sql(
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events_norm GROUP BY user_id),
        |j AS (
        |  SELECT f.cohort,
        |         CAST(datediff(e.ts, f.cohort) div 7 AS BIGINT) AS age_weeks,
        |         e.value
        |  FROM events_norm e JOIN f ON e.user_id = f.user_id)
        |SELECT date_format(cohort, 'yyyy-MM-dd') AS cohort_week, age_weeks,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM j GROUP BY 1, 2""".stripMargin)
  }

  /** Z-value bit interleave over two 8-bit bucketed dims, as identical
    * arithmetic text on both engines modulo the integer-div operator
    * (`div` / `//`): bit i of each dim lands at output bits 2i / 2i+1.
    */
  private def zInterleave(divOp: String): String =
    (0 until 8).map(i =>
      s"((zx $divOp ${1 << i}) % 2) * ${1L << (2 * i)} + " +
        s"((zy $divOp ${1 << i}) % 2) * ${1L << (2 * i + 1)}").mkString(" + ")

  /** q91: Z-ORDER clustering key (Morton code) over (customer, order day)
    * — the multi-dimensional data-layout operator behind Delta/Iceberg
    * `ZORDER BY`: interleaving the bits of two rank-bucketed dimensions
    * yields ONE sort key under which every aligned key range is a small
    * RECTANGLE in the original space, so parquet row-group min/max stats
    * prune scans filtered on EITHER dimension (a single-column sort
    * clusters only its own column; the secondary dim spans the full range
    * in every file). The query emits each 256-key z-cell's bounding box —
    * the guarantee is that every cell is a 16x16 rectangle, pinned
    * exactly in QueriesSpec against a custkey-only sort whose cells
    * sprawl the full date range.
    *
    * Scale shape: bucket bounds are a broadcast 1-row aggregate; the
    * z-value is a pure integer projection in the scan stage; the cell
    * rollup is one hash aggregate. At 100 TB the write path becomes
    * `repartitionByRange(z).sortWithinPartitions(z)` and the key keeps
    * its pruning power no matter how many files the corpus spans.
    * All-integer arithmetic -> hash-green.
    */
  def q91_zorder(s: SparkSession, d: String): DataFrame =
    zBuckets(s, d)
      .groupBy(expr("z div 256").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("zx")).cast("long").as("x_min"),
        max(col("zx")).cast("long").as("x_max"),
        min(col("zy")).cast("long").as("y_min"),
        max(col("zy")).cast("long").as("y_max"))

  /** Orders with both dims rank-bucketed to 0..255 and the interleaved
    * z-key — shared by q91 and its QueriesSpec locality contrast.
    */
  private[graft] def zBuckets(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("dy"))
    val bounds = o.agg(min(col("ck")).as("ck0"), max(col("ck")).as("ck1"),
      min(col("dy")).as("dy0"), max(col("dy")).as("dy1"))
    o.crossJoin(broadcast(bounds))
      .withColumn("zx", expr("((ck - ck0) * 256) div (ck1 - ck0 + 1)"))
      .withColumn("zy", expr("((dy - dy0) * 256) div (dy1 - dy0 + 1)"))
      .withColumn("z", expr(zInterleave("div")))
  }

  /** q92: OHLC bars — the time-bucket downsampling every metrics and
    * market-data pipeline runs (first/last/extremes/volume per bucket): per
    * (event_type, hour) the opening and closing value (first/last by
    * (ts, event_id) — the unique tie-break that makes "first" a fact,
    * not a partitioning accident), high/low, event count and
    * decimal-summed volume. Open/close come from two row_number windows
    * over the SAME partitioning (one exchange, two sorts) folded into
    * the aggregate as conditional picks — no self-join back to the
    * extremes. Doubles are only ever PICKED (open/close) or min/maxed —
    * both order-independent — and the sum runs through DECIMAL(38,6),
    * so the bars hash-check cross-engine.
    */
  def q92_ohlc_bars(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("hour", expr("us div 3600000000").cast("long"))
    val wA = Window.partitionBy(col("event_type"), col("hour"))
      .orderBy(col("us"), col("event_id"))
    val wD = Window.partitionBy(col("event_type"), col("hour"))
      .orderBy(col("us").desc, col("event_id").desc)
    ev.withColumn("ra", row_number().over(wA))
      .withColumn("rd", row_number().over(wD))
      .groupBy(col("event_type"), col("hour"))
      .agg(
        max(when(col("ra") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rd") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(dec6)).cast("double").as("volume"))
      .select(col("event_type"),
        date_format(timestamp_micros(col("hour") * 3600000000L),
          "yyyy-MM-dd HH:mm:ss").as("bar_hour"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("volume"))
  }

  /** q93: CDC changelog via snapshot diff — the full-outer-join-on-key
    * formulation that turns two table versions into an insert/update/delete
    * stream, the feed every incremental downstream (materialized views,
    * replicas, cache invalidation) consumes when the source has no native
    * changelog. Two deterministic versions are derived from `orders`:
    * version A drops keys ≡3 (mod 10) (rows that arrive later), version B
    * drops keys ≡6 (mod 10) (rows deleted since) and bumps the price 5%
    * on keys ≡0 (mod 7) (updates). The diff is ONE shuffle — a full outer
    * join on the key — then pure row-local classification: A-null →
    * insert, B-null → delete, changed payload → update, unchanged rows
    * drop out. At 100 TB both sides partition on the same key so AQE can
    * plan a co-partitioned join; no window, no skew (keys unique per
    * side), and the unchanged majority never leaves the join stage.
    * Prices compare in exact cents — a float-equality CDC diff would emit
    * phantom updates.
    */
  def q93_snapshot_diff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val vA = base.filter(pmod(col("o_orderkey"), lit(10L)) =!= 3L)
      .select(col("o_orderkey").as("a_key"), col("o_orderstatus").as("a_status"),
        col("cents").as("a_cents"))
    val vB = base.filter(pmod(col("o_orderkey"), lit(10L)) =!= 6L)
      .select(col("o_orderkey").as("b_key"), col("o_orderstatus").as("b_status"),
        when(pmod(col("o_orderkey"), lit(7L)) === 0L,
          (col("cents") * 105L - pmod(col("cents") * 105L, lit(100L))) / 100L)
          .otherwise(col("cents")).cast("long").as("b_cents"))
    vA.join(vB, col("a_key") === col("b_key"), "full_outer")
      .withColumn("change",
        when(col("a_key").isNull, "insert")
          .when(col("b_key").isNull, "delete")
          .when(col("a_cents") =!= col("b_cents") ||
            col("a_status") =!= col("b_status"), "update"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("a_key"), col("b_key")).as("o_orderkey"),
        col("change"), col("a_cents").as("old_cents"),
        col("b_cents").as("new_cents"))
  }

  /** q94: incremental materialized-view maintenance — the consumer of
    * q93's changelog. A per-customer revenue view stands materialized over
    * snapshot A; when snapshot B lands, production must NOT recompute the
    * view from 100 TB of base table — it applies the (tiny) delta:
    * per-key Σ(new − old) from the changelog, one full outer join of
    * view × delta, keys whose order count hits zero drop out. The hash
    * oracle recomputes the view DIRECTLY over snapshot B — so the check
    * proves the algebraic identity incremental-apply == full-recompute,
    * which is the entire correctness obligation of view maintenance.
    * At 100 TB the stored view and the delta are both keyed on o_custkey:
    * the join co-partitions, the changelog side is a filtered aggregate
    * of the day's changes (broadcast-able on quiet days), and the base
    * table is never rescanned. Same derived snapshots as q93 (keys ≡3/≡6
    * mod 10 differ, ≡0 mod 7 price-bumped) so the two registry entries
    * stay one story.
    */
  def q94_view_maintain(s: SparkSession, d: String): DataFrame = {
    val (va, vb) = orderSnapshots(s, d)
    applyViewDelta(revenueView(va), changelogRows(va, vb))
  }

  /** The two derived order snapshots behind q93/q94/st12 — keys ≡3 (mod
    * 10) arrive later, keys ≡6 (mod 10) get deleted, keys ≡0 (mod 7) get
    * a 5% price bump (floored to whole cents in exact integers).
    */
  private[graft] def orderSnapshots(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val va = base.filter(pmod(col("o_orderkey"), lit(10L)) =!= 3L)
    val vb = base.filter(pmod(col("o_orderkey"), lit(10L)) =!= 6L)
      .withColumn("cents",
        when(pmod(col("o_orderkey"), lit(7L)) === 0L,
          ((col("cents") * 105L - pmod(col("cents") * 105L, lit(100L))) / 100L)
            .cast("long"))
          .otherwise(col("cents")))
    (va, vb)
  }

  /** The materialized per-customer revenue view. */
  private[graft] def revenueView(snapshot: DataFrame): DataFrame =
    snapshot.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))

  /** Per-ORDER changelog rows (o_orderkey, o_custkey, dn, dc) — kept at
    * order grain so a consumer can re-batch them arbitrarily (st12 splits
    * them into micro-batches; delta application is associative, so any
    * batching folds to the same view).
    */
  private[graft] def changelogRows(va: DataFrame, vb: DataFrame): DataFrame =
    va.select(col("o_orderkey"), col("o_custkey").as("a_cust"),
        col("cents").as("a_cents"))
      .join(vb.select(col("o_orderkey"), col("o_custkey").as("b_cust"),
        col("cents").as("b_cents")), Seq("o_orderkey"), "full_outer")
      .filter(col("a_cust").isNull || col("b_cust").isNull ||
        col("a_cents") =!= col("b_cents"))
      .select(col("o_orderkey"),
        coalesce(col("a_cust"), col("b_cust")).as("o_custkey"),
        (when(col("a_cust").isNull, 1L).when(col("b_cust").isNull, -1L)
          .otherwise(0L)).as("dn"),
        (coalesce(col("b_cents"), lit(0L)) - coalesce(col("a_cents"), lit(0L)))
          .as("dc"))

  /** One maintenance step: reduce changelog rows to per-key deltas (the
    * "day's changes" — tiny next to the view, never the base table), one
    * keyed full outer join against the stored view, zero-count keys drop.
    */
  private[graft] def applyViewDelta(view: DataFrame, rows: DataFrame): DataFrame = {
    val delta = rows.groupBy(col("o_custkey"))
      .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    view.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_orders"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("rev_cents"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("rev_cents"))
      .filter(col("n_orders") > 0)
  }

  /** q95: seasonal anomaly screen — q77's z-score with a SEASONAL baseline
    * (per event-type × hour-of-day cell), the shape monitoring pipelines
    * actually need: "is this value odd *for 3am*", not "odd overall".
    * Same two-pass scheme as q77: one grouped pass builds exact first and
    * second moments per cell (DECIMAL sums cast to double — no float
    * accumulation-order drift), a second pass rejoins events to their
    * cell and counts |value − μ| > 1.5σ. Both passes shuffle on the same
    * (type, hod) key — 24×|types| cells, trivially broadcast-able at any
    * corpus size, so the screen is scan-bound at 100 TB. Determinism:
    * moments are exact decimals, the compare expression is the one
    * identical double formula in both engines.
    */
  def q95_seasonal_anomaly(s: SparkSession, d: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 3)
    val ev = Tables.events(s, d)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
        col("value"))
    val g = ev.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("s1"),
        sum((col("value").cast(dec)) * (col("value").cast(dec)))
          .cast("double").as("s2"))
    ev.join(broadcast(g), Seq("event_type", "hod"))
      .groupBy(col("event_type"), col("hod"), col("n"))
      .agg(count(when(
        abs(col("value") - col("s1") / col("n")) >
          lit(1.5) * sqrt(col("s2") / col("n") -
            (col("s1") / col("n")) * (col("s1") / col("n"))), 1))
        .as("n_anomalies"))
      .select(col("event_type"), col("hod"), col("n").as("n_events"),
        col("n_anomalies"))
  }

  /** q96: point-in-time SCD2 lookup — the feature-store staple that
    * chains q75 (build the versioned dimension) with q30's scalable as-of
    * machinery (query it): "what was this user's state at time T", with
    * training-serving skew ruled out by construction. The dimension is
    * q75's state runs keyed (user, from_us); probes ask 1 s after every
    * 10th event. The lookup is the union + one-(user, time)-sort + last()
    * IGNORE NULLS rewrite — no per-probe theta join, no range explosion:
    * versions and probes ride ONE window over ONE sort, so at 100 TB the
    * cost is a single (user, time) shuffle of versions+probes, not
    * |probes|×|versions|. At equal instants the version row sorts before
    * the probe (tag column), giving ASOF's inclusive `probe ≥ from`
    * semantics exactly. The DuckDB oracle uses its NATIVE ASOF JOIN — a
    * genuinely different algorithm validating the rewrite, hash-green
    * (fixture has no (user, ts) ties, so the match is unique).
    */
  def q96_scd2_lookup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dim = e
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          col("event_type") =!= lag(col("event_type"), 1).over(w), 1L)
          .otherwise(0L))
      .withColumn("run_idx", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("run_idx"), col("event_type").as("state"))
      .agg(min(col("us")).as("from_us"))
    val probes = e.filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("event_id"), (col("us") + 1000000L).as("t"))
    val tagged = dim
      .select(col("user_id"), col("from_us").as("t"), lit(0L).as("tag"),
        col("state"), lit(null).cast("long").as("event_id"))
      .unionByName(probes.select(col("user_id"), col("t"), lit(1L).as("tag"),
        lit(null).cast("string").as("state"), col("event_id")))
    val wa = Window.partitionBy(col("user_id")).orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("state_asof", last(col("state"), ignoreNulls = true).over(wa))
      .filter(col("tag") === 1L)
      .select(col("user_id"), col("event_id"),
        date_format(timestamp_micros(col("t")), "yyyy-MM-dd HH:mm:ss")
          .as("as_of"),
        col("state_asof").as("state"))
  }

  /** q97: event pathing — the first-order Markov transition matrix over
    * per-user event streams ("after a click, what happens next"), the
    * product-analytics staple behind sankey/flow views. One lead() over
    * the (user, time) sort everything in the session family already rides
    * (q74/q75/st11 share the identical exchange — at 100 TB these chain
    * without re-shuffling), then a partial-aggregated transition count;
    * the denominator rides a window over the GROUPED matrix (|types|²
    * rows), not the event stream. End-of-stream rows have no successor
    * and drop out; shares round through the one identical double division
    * in both engines.
    */
  def q97_event_pathing(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    trans
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(wf), 9))
      .select(col("from_type"), col("to_type"), col("n"), col("share"))
  }

  /** q99: interval-overlap CONCURRENCY via a distributed sweep line — the
    * "how many were active at once" analytic (peak concurrent sessions /
    * streams / beds) no join formulation survives at scale (interval x
    * interval overlap joins are quadratic in the overlap mass). Each event
    * holds its resource for `value` seconds; every interval becomes a +1
    * point at its start and a -1 at its end ([start, end) — ends sort
    * before starts at the same instant, so back-to-back intervals never
    * overlap), and concurrency is the running sum of deltas in time order.
    * The running sum is c17's TWO-PHASE distributed scan, not one window
    * over a whole event_type: sweep points range-partition by (type, time),
    * per-partition delta subtotals (32 x |types| rows, the only collect)
    * prefix-scan into per-partition offsets on the driver, and each
    * partition's local window sum adds its broadcast offset — no single
    * task ever sorts a whole type's sweep, which is what makes this hold
    * when one resource class dominates 100 TB. Peaks then reduce through
    * an ordinary partial-aggregated groupBy; `conc == peak` rows join back
    * against the 5-row broadcast peak frame for the first-peak timestamp.
    * All-integer deltas/counts -> hash-green (durations enter as
    * floor(value * 1e6), the same IEEE double op on both engines).
    */
  def q99_concurrency(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(floor(value * 1000000d) AS BIGINT)").as("dur"))
      .filter(col("dur") > 0L)
    val pts = iv.select(col("event_type"), col("us"), lit(1L).as("delta"),
        col("event_id"))
      .unionAll(iv.select(col("event_type"), (col("us") + col("dur")).as("us"),
        lit(-1L).as("delta"), col("event_id")))
    val ranged = pts
      .repartitionByRange(32, col("event_type"), col("us"), col("delta"),
        col("event_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical across both phases
    val subs = ranged.groupBy(col("event_type"), col("pid"))
      .agg(sum(col("delta")).as("psum"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offs = subs.groupBy(_._1).iterator.flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (et, pid, off) }
    }.toSeq
    val offDf = s.createDataFrame(offs).toDF("event_type", "pid", "off")
    val w = Window.partitionBy(col("event_type"), col("pid"))
      .orderBy(col("us"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val conc = ranged.join(broadcast(offDf), Seq("event_type", "pid"))
      .withColumn("conc", col("off") + sum(col("delta")).over(w))
      .localCheckpoint() // feeds the peak agg AND the peak-time probe
    val peaks = conc.groupBy(col("event_type"))
      .agg(max(col("conc")).as("peak"),
        expr("count(1) div 2").as("n_intervals"))
    conc.join(broadcast(peaks), "event_type")
      .filter(col("conc") === col("peak"))
      .groupBy(col("event_type"), col("n_intervals"), col("peak"))
      .agg(date_format(timestamp_micros(min(col("us"))), "yyyy-MM-dd HH:mm:ss")
        .as("first_peak_at"))
      .select(col("event_type"), col("n_intervals"),
        col("peak").as("peak_concurrency"), col("first_peak_at"))
  }

  /** q100: event-SEQUENCE pattern matching (MATCH_RECOGNIZE / Flink-CEP
    * shape) — find users whose stream contains `view … click … purchase`
    * as an in-order subsequence with arbitrary gaps, counting every
    * completion and stamping the first. q57's funnel answers the
    * stage-reach marketing question through per-stage joins with time
    * caps; this is the complementary state-machine formulation: the
    * pattern compiles into CHAINED CONDITIONAL RUNNING AGGREGATES on one
    * (user, time) sort — `last_a` = running max of view times, `last_ab`
    * = running max of click times seen after some view, and a purchase
    * row completes the pattern iff `last_ab` is set. Each extra pattern
    * stage is one more window column on the SAME sort — no joins, no
    * per-user collect_list, state O(stages) per row — the layout that
    * survives users with millions of events. All-integer µs and counts ->
    * hash-green (both engines share the (us, event_id) tie order).
    */
  def q100_sequence_match(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_a",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("last_ab",
        max(when(col("event_type") === "click" && col("last_a").isNotNull,
          col("us"))).over(w))
      .withColumn("hit",
        col("event_type") === "purchase" && col("last_ab").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_matches"),
        date_format(timestamp_micros(min(when(col("hit"), col("us")))),
          "yyyy-MM-dd HH:mm:ss").as("first_match_at"))
      .filter(col("n_matches") > 0)
  }

  /** q101: TIME-WEIGHTED average (TWAP) over irregular samples — the
    * correct mean for state that persists between observations (sensor
    * readings, account balances, prices): each value holds from its event
    * until the user's next one, so it weighs by its holding DURATION, not
    * its sample count (a plain avg over-counts burst periods). One lead()
    * on the (user, time) sort prices every interval; the mean is the
    * decimal-path weighted sum (value at DECIMAL(18,6) x µs duration at
    * DECIMAL(18,0) — products stay exact at precision 37 on both engines,
    * the t20 lesson applied in advance) so partial-aggregation order
    * can't drift the double. Users with fewer than two events have no
    * held interval and drop out.
    */
  def q101_twap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .as("v"))
      .withColumn("dur",
        (lead(col("us"), 1).over(w) - col("us"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 0)))
      .filter(col("dur").isNotNull && col("dur") > 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        expr("CAST(sum(dur) AS BIGINT) div 1000000").as("held_s"),
        round((sum(col("v") * col("dur")).cast("double") /
          sum(col("dur")).cast("double")), 9).as("twap"))
  }

  // ---------------------------------------------------------------- registry

  /** q104: AS-OF join with a STALENESS TOLERANCE — the feature-store
    * variant of q30 (Snowflake's ASOF ... MATCH_CONDITION / kdb's wj):
    * each error probe matches the latest click at-or-before it, but a
    * match older than 30 minutes is discarded — a model must not be fed
    * features staler than its contract. Implementation is q30's single
    * carry-forward window (one exchange on user_id) + a tolerance filter
    * on the carried timestamp: the latest at-or-before click is the ONLY
    * candidate inside [t-30m, t], so filtering it is exact. The DuckDB
    * oracle is an INDEPENDENT algorithm — a correlated max() subquery
    * with the tolerance inside the range predicate — so the window
    * rewrite is cross-validated, not formula-shared. Probes with no
    * in-tolerance match keep a NULL feature (the row must SURVIVE — an
    * inner as-of join would silently drop cold-start users). Age in whole
    * seconds via integer µs arithmetic (the q74 discipline).
    */
  def q104_asof_tolerance(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type").isin("click", "error"))
      .withColumn("is_probe", when(col("event_type") === "error", 1).otherwise(0))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .withColumn("matched_ts",
        when(col("last_click_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"),
          col("last_click_ts")))
      .withColumn("age_us", unix_micros(col("ts")) - unix_micros(col("matched_ts")))
      .select(col("event_id"),
        date_format(col("matched_ts"), "yyyy-MM-dd HH:mm:ss").as("click_s"),
        expr("age_us div 1000000").cast("long").as("age_s"))
  }

  /** q105: per-group top-k WITH TIES — ANSI `FETCH FIRST n ROWS WITH
    * TIES` exists only as a global LIMIT clause (and Spark lacks even
    * that); the per-group form every leaderboard needs is expressed as a
    * rank() window (rank, not row_number — equal keys share a rank, so
    * the k-th value's ties all survive). The DuckDB oracle is an
    * INDEPENDENT algorithm: it computes each group's k-th highest
    * DISTINCT date and keeps rows at-or-after it — equality proves the
    * rank semantics rather than restating them. o_orderdate carries real
    * ties (many orders share a date), so WITH TIES genuinely returns
    * more than 3 dates' worth of rows per status.
    */
  def q105_topk_with_ties(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderdate").desc)
    graft.Tables.orders(s, d)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderkey"))
  }

  /** q106: DISTINCT ON — the Postgres/DuckDB idiom "one row per key,
    * chosen by an ordering" (latest order per customer). Spark has no
    * DISTINCT ON; the engine-side form is the native k=1 TopKPerGroup
    * heap (no rank window, no global sort — plan-pinned elsewhere for
    * the family), while the DuckDB oracle runs the REAL `DISTINCT ON`
    * clause — a different algorithm validating the same semantics.
    * Tie-break on (o_orderdate desc, o_orderkey desc) is total, so the
    * selection is deterministic in both engines.
    */
  def q106_distinct_on(s: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerGroup.topK(
      graft.Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice")),
      Seq("o_custkey"),
      Seq(graft.plans.TopKPerGroup.Ord("o_orderdate", desc = true),
        graft.plans.TopKPerGroup.Ord("o_orderkey", desc = true)), 1)
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_order_date"),
        col("o_orderkey"), col("o_totalprice"))

  /** q107: ROLLING 30-day OLS revenue trend — q67's closed-form
    * regression under a moving window (the time-series "trend" column
    * every revenue dashboard carries): per (status, day), the slope of
    * daily revenue against the day index over the trailing 30 days.
    * Scale discipline: orders pre-aggregate to per-day PARTIALS (nd, Σy,
    * day·nd, day²·nd, day·Σy — all exact integers, revenue in cents), so
    * the window frames slide over |days| rows, never the order stream,
    * and the integer-RANGE frame (29 PRECEDING) is q79's tie-safe frame
    * type. The five framed sums are exactly associative; the one double
    * division happens per output row on identical integers, with the
    * zero-variance frame (a single distinct day) emitting NULL through
    * the same CASE on both engines.
    */
  def q107_rolling_ols(s: SparkSession, d: String): DataFrame = {
    val daily = graft.Tables.orders(s, d)
      .withColumn("day",
        datediff(col("o_orderdate"), to_date(lit("1992-01-01"))).cast("long"))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy(col("o_orderstatus"), col("day"))
      .agg(count(lit(1)).as("nd"), sum(col("cents")).as("sy"))
      .withColumn("sx", col("day") * col("nd"))
      .withColumn("sxx", col("day") * col("day") * col("nd"))
      .withColumn("sxy", col("day") * col("sy"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("day"))
      .rangeBetween(-29, 0)
    daily
      .withColumn("n", sum(col("nd")).over(w))
      .withColumn("tsx", sum(col("sx")).over(w))
      .withColumn("tsy", sum(col("sy")).over(w))
      .withColumn("tsxx", sum(col("sxx")).over(w))
      .withColumn("tsxy", sum(col("sxy")).over(w))
      .select(col("o_orderstatus"), col("day"), col("n"),
        expr("""CASE WHEN n * tsxx - tsx * tsx = 0 THEN NULL
                ELSE CAST(n * tsxy - tsx * tsy AS DOUBLE)
                     / CAST(n * tsxx - tsx * tsx AS DOUBLE) END""")
          .as("slope_cents_per_day"))
  }

  /** q108: Pareto / ABC contribution analysis — "which customers are the
    * top 80% of revenue" (inventory's ABC classification applied to any
    * revenue dimension): per-customer revenue in exact cents, global rank
    * by (revenue desc, custkey), cumulative share in integer per-mille,
    * class A/B/C at the 800/950 cuts. The global running sum over the
    * revenue ordering is the honest scale problem (a naive window is one
    * reducer over every customer), so positions and prefixes come from
    * c17's two-phase distributed scan — range-partition on the order key,
    * driver-held per-partition subtotals, broadcast offsets,
    * within-partition windows — pid-keyed like c28. Integer arithmetic
    * end to end -> hash-green.
    */
  def q108_pareto_abc(s: SparkSession, d: String): DataFrame = {
    val byCust = graft.Tables.orders(s, d)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .repartitionByRange(32, col("revenue_cents").desc, col("o_custkey"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical in both passes
    val subtotals = byCust.groupBy(col("pid"))
      .agg(sum(col("revenue_cents")).as("psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val total = offsets.last
    val offDf = s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off")
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("revenue_cents").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byCust.join(broadcast(offDf), "pid")
      .withColumn("cum", col("off") + sum(col("revenue_cents")).over(w))
      .withColumn("cum_share_pm", expr(s"(cum * 1000) div ${total}L"))
      .select(col("o_custkey"), col("revenue_cents"), col("cum_share_pm"),
        when(col("cum_share_pm") <= 800, "A")
          .when(col("cum_share_pm") <= 950, "B")
          .otherwise("C").as("abc_class"))
  }

  /** q109: MEDIAN ABSOLUTE DEVIATION outlier screen — the robust twin of
    * q77's z-score (one wild value drags a mean and explodes a stddev;
    * the median/MAD pair is 50%-breakdown robust, which is why monitoring
    * pipelines prefer it): per status, the exact median, the exact median
    * of |x − median|, and the count beyond the standard 3·1.4826·MAD
    * fence. Two grouped exact-percentile passes (q40's proven
    * interpolation parity) + one broadcast join of the 3-row median frame
    * back over the scan; the deviation arithmetic is the same IEEE
    * expression text on both engines, outlier counts are integers ->
    * hash-green. Same 100 TB caveat as q40: exact percentiles sort within
    * groups; q46's sketch is the scale path, this is the exact auditor.
    */
  private def madSql(pctFn: String): String =
    s"""WITH med AS (
      |  SELECT o_orderstatus, $pctFn(o_totalprice, 0.5) AS med
      |  FROM orders GROUP BY o_orderstatus),
      |dev AS (
      |  SELECT o.o_orderstatus, m.med,
      |         abs(o.o_totalprice - m.med) AS adev
      |  FROM orders o JOIN med m ON m.o_orderstatus = o.o_orderstatus),
      |madt AS (
      |  SELECT o_orderstatus, $pctFn(adev, 0.5) AS mad
      |  FROM dev GROUP BY o_orderstatus)
      |SELECT d.o_orderstatus,
      |       min(d.med) AS median_price,
      |       min(t.mad) AS mad,
      |       count(*) AS n,
      |       CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * t.mad
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN madt t ON t.o_orderstatus = d.o_orderstatus
      |GROUP BY d.o_orderstatus""".stripMargin

  def q109_mad_outliers(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(madSql("percentile"))

  /** q110: A/B-TEST significance — the two-proportion z-test every
    * experimentation readout runs (variant = user-id parity, the
    * deterministic stand-in for an assignment column; conversion = the
    * user ever fired a big-ticket `purchase` — value > 150, a threshold
    * that keeps both rates strictly inside (0, 1) so the pooled variance
    * never degenerates). Pipeline: per-user conversion
    * flag (one grouped max over the scan), per-variant user/conversion
    * counts (integers), then the pooled-proportion z statistic
    *
    *   {{{z = (pA - pB) / sqrt(p(1-p)(1/nA + 1/nB))}}}
    *
    * as ONE final double region over exact int64 counts — q67/g13's
    * recipe: IEEE divide/sqrt are correctly rounded, so identical integer
    * inputs give bit-identical doubles on both engines, rounded to 9 to
    * guard display representation. Scale shape: two hash aggregates (the
    * first keyed by user, map-side combinable) and a 2-row pivot —
    * scan-bound at any event volume.
    */
  private val q110Sql: String =
    """WITH u AS (
      |  SELECT user_id,
      |         max(CASE WHEN event_type = 'purchase' AND value > 150
      |             THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |v AS (
      |  SELECT user_id % 2 AS variant, count(*) AS n,
      |         CAST(sum(conv) AS BIGINT) AS c
      |  FROM u GROUP BY user_id % 2),
      |w AS (
      |  SELECT max(CASE WHEN variant = 0 THEN n END) AS n_a,
      |         max(CASE WHEN variant = 0 THEN c END) AS conv_a,
      |         max(CASE WHEN variant = 1 THEN n END) AS n_b,
      |         max(CASE WHEN variant = 1 THEN c END) AS conv_b
      |  FROM v)
      |SELECT n_a, conv_a, n_b, conv_b,
      |       (conv_a * 1000000) $DIV$ n_a AS rate_a_micro,
      |       (conv_b * 1000000) $DIV$ n_b AS rate_b_micro,
      |       round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      |             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |                    * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |                    * (1.0 / n_a + 1.0 / n_b)), 9) AS z_score
      |FROM w""".stripMargin

  def q110_ab_test(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "events")(q110Sql.replace("$DIV$", "div"))

  /** q111: exact WEIGHTED median — the selection twin of q40 when rows
    * carry mass (price levels weighted by quantity: "the price at which
    * half the VOLUME trades", not half the rows). Cumulative weight per
    * group via a RANGE-framed running sum (default ORDER BY frame on both
    * engines sums all peers, so equal prices accumulate atomically — no
    * intra-tie order sensitivity), then the smallest price whose
    * cumulative weight reaches half the total. Pure SELECTION: the output
    * value is an input value, no interpolation arithmetic — and the
    * quantity weights are integral doubles whose sums are exact, so the
    * comparison 2*cumw >= totw is order-independent -> hash-green.
    * Same 100 TB honesty as q40: the running sum sorts within groups
    * (3 reducers here); at scale the move is the q46 sketch or a
    * two-phase weighted-histogram scan (q108's pattern).
    */
  private val q111Sql: String =
    """WITH cw AS (
      |  SELECT l_returnflag, l_extendedprice,
      |         sum(l_quantity) OVER (PARTITION BY l_returnflag
      |                               ORDER BY l_extendedprice) AS cumw,
      |         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
      |  FROM lineitem)
      |SELECT l_returnflag,
      |       min(l_extendedprice) AS weighted_median,
      |       CAST(min(totw) AS BIGINT) AS total_weight
      |FROM cw WHERE 2 * cumw >= totw
      |GROUP BY l_returnflag""".stripMargin

  def q111_weighted_median(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(q111Sql)

  /** q112: EXPONENTIALLY-weighted moving average — the recency-biased twin
    * of q48's uniform moving average (monitoring and forecasting default
    * to EWMA because a level shift shows up in days, not after the window
    * ages out). Decay alpha = 1/2 with BINARY weights 2^9..2^0 over the
    * last 10 daily observations, normalized by the sum of the weights
    * actually present (the standard finite-window "adjust=True"
    * formulation) — so numerator and denominator are exact integers and
    * the EWMA is one integer division: hash-green with no float windows
    * anywhere. The lag chain is 9 offsets over the per-day PARTIALS, and
    * that is the scale story (q107's): the corpus-sized work is the
    * map-side-combinable daily aggregate; the window runs over
    * |status| x |days| rows — thousands, at any fact-table size.
    */
  private def ewmaSql(dayExpr: String, div: String): String = {
    val lags = (1 to 9).map(i =>
      s"lag(cents, $i) OVER (PARTITION BY o_orderstatus ORDER BY day) AS c$i")
      .mkString(",\n         ")
    val num = "cents * 512 + " +
      (1 to 9).map(i => s"coalesce(c$i, 0) * ${1 << (9 - i)}").mkString(" + ")
    val den = "512 + " +
      (1 to 9).map(i => s"CASE WHEN c$i IS NULL THEN 0 ELSE ${1 << (9 - i)} END")
        .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT o_orderstatus, $dayExpr AS day,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY 1, 2),
       |l AS (
       |  SELECT o_orderstatus, day, cents,
       |         $lags
       |  FROM daily)
       |SELECT o_orderstatus, day, cents,
       |       ($num) $div ($den) AS ewma_cents
       |FROM l""".stripMargin
  }

  def q112_ewma(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      ewmaSql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div"))

  /** q113: top-N + OTHER rollup — the BI "iceberg" presentation shape
    * (chart the top 5 suppliers, collapse the tail into one OTHER bucket
    * with its true share, so the legend is bounded while totals still
    * reconcile to 100%). Revenue in exact cents, global rank over
    * per-supplier AGGREGATES (dimension-sized — the fact scan never meets
    * the window), shares in integer per-mille against the grand total.
    * The whole thing is integers -> hash-green; the rank-over-partials is
    * the same honest-scale note as q108: |suppliers| rows through one
    * ordered window, with the two-phase scan as the giant-dimension path.
    */
  private def q113Sql(strT: String, div: String): String =
    s"""WITH r AS (
       |  SELECT l_suppkey,
       |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
       |           AS cents
       |  FROM lineitem GROUP BY l_suppkey),
       |rk AS (
       |  SELECT l_suppkey, cents,
       |         row_number() OVER (ORDER BY cents DESC, l_suppkey) AS rn
       |  FROM r),
       |b AS (
       |  SELECT CASE WHEN rn <= 5 THEN concat('S', CAST(l_suppkey AS $strT))
       |              ELSE 'OTHER' END AS bucket,
       |         cents
       |  FROM rk),
       |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tc FROM r)
       |SELECT bucket,
       |       count(*) AS n_suppliers,
       |       CAST(sum(cents) AS BIGINT) AS cents,
       |       (CAST(sum(cents) AS BIGINT) * 1000) $div min(tc) AS share_pm
       |FROM b CROSS JOIN tot
       |GROUP BY bucket""".stripMargin

  def q113_topn_other(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(q113Sql("STRING", "div"))

  /** q114: CUMULATIVE distinct users by day — "how many uniques have we
    * ever seen as of day d", the growth curve every analytics dashboard
    * leads with. Windowed COUNT(DISTINCT) doesn't exist in either engine
    * (and would be quadratic anyway); the standard rewrite is the
    * FIRST-SEEN flag: each user collapses to their first active day (one
    * map-side-combinable min aggregate over the event scan), new-user
    * counts per day, and a running sum over the |days| partials — exact
    * integers end to end, and the corpus-sized work never meets the
    * window (q112's economics). Day emitted as an ISO string so both
    * engines hash the same bytes (the ns-vs-us timestamp lesson).
    */
  private val q114Sql: String =
    """WITH fs AS (
      |  SELECT user_id, min(CAST(CAST(ts AS DATE) AS $STR$)) AS first_day
      |  FROM events GROUP BY user_id),
      |d AS (SELECT first_day AS day, count(*) AS new_users FROM fs GROUP BY first_day)
      |SELECT day, new_users,
      |       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
      |FROM d""".stripMargin

  def q114_running_distinct(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "events")(q114Sql.replace("$STR$", "STRING"))

  /** q115: referential-integrity ORPHAN audit — the cross-table
    * data-quality complement of q69's per-table profile: every foreign-key
    * relationship in the star schema left-joins its dimension and counts
    * rows whose key resolves to nothing, with the orphan rate in integer
    * per-mille. One row per relationship; each check is a single keyed
    * left join (dimension sides broadcast-size here; at 100 TB the same
    * plan co-partitions on the key) + an integer aggregate -> hash-green.
    * A healthy pipeline reads all zeros — the operator exists so a broken
    * ingest reads nonzero BEFORE a training run consumes the join.
    */
  private val q115Sql: String = {
    def check(rel: String, fact: String, fk: String, dim: String, pk: String) =
      s"""SELECT '$rel' AS relationship, count(*) AS n_rows,
         |       CAST(sum(CASE WHEN d.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_orphans,
         |       (CAST(sum(CASE WHEN d.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |        * 1000) $$DIV$$ count(*) AS orphan_pm
         |FROM $fact f LEFT JOIN $dim d ON d.$pk = f.$fk""".stripMargin
    Seq(
      check("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      check("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      check("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      check("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      check("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      check("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      check("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ).mkString("\nUNION ALL\n")
  }

  def q115_ri_orphans(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem", "orders", "part", "supplier", "customer",
      "nation", "region")(q115Sql.replace("$DIV$", "div"))

  /** The audit SQL over whatever star-schema views are registered —
    * separated so the spec can plant an orphan key and see it counted.
    */
  private[graft] def riOrphansFromViews(s: SparkSession): DataFrame =
    s.sql(q115Sql.replace("$DIV$", "div"))

  /** q116: CUSUM changepoint detection over the daily revenue series —
    * the classic sequential level-shift monitor (Page 1954): a sustained
    * drift from target accumulates where a one-day spike decays. The
    * textbook recursion S_t = max(0, S_{t-1} + (x_t − μ − k)) looks
    * un-SQL-able, but the clamped running sum has an exact closed form —
    * S_t = P_t − min(0, min_{i≤t} P_i) where P is the plain prefix sum of
    * the deviations — so BOTH cusum sides are one prefix-sum window plus
    * one running-min/max window on the same (single-exchange) day order.
    * Target μ is total div days, allowance k = μ div 20 (5%), alarm when
    * a side exceeds h = μ (one average day's revenue of accumulated
    * drift). All arithmetic is exact int64 cents → hash-green; QueriesSpec
    * additionally pins the window identity against a literal driver-side
    * replay of the max(0, ·) recursion on a planted level-shift series.
    * Scale: the corpus-sized work is the map-side daily aggregate; every
    * window runs over |days| partial rows (q112's economics).
    */
  private def q116Sql(dayExpr: String, div: String): String =
    s"""WITH daily AS (
       |  SELECT $dayExpr AS day,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |t AS (
       |  SELECT day, cents,
       |         CAST(sum(cents) OVER () AS BIGINT) $div count(*) OVER () AS mu
       |  FROM daily),
       |p AS (
       |  SELECT day, cents, mu,
       |         CAST(sum(cents - mu - mu $div 20) OVER (ORDER BY day) AS BIGINT) AS p_hi,
       |         CAST(sum(cents - mu + mu $div 20) OVER (ORDER BY day) AS BIGINT) AS p_lo
       |  FROM t),
       |c AS (
       |  SELECT day, cents, mu,
       |         p_hi - least(0, min(p_hi) OVER (ORDER BY day)) AS cusum_hi,
       |         greatest(0, max(p_lo) OVER (ORDER BY day)) - p_lo AS cusum_lo
       |  FROM p)
       |SELECT day, cents, cusum_hi, cusum_lo,
       |       CASE WHEN cusum_hi > mu THEN 1 ELSE 0 END AS alarm_hi,
       |       CASE WHEN cusum_lo > mu THEN 1 ELSE 0 END AS alarm_lo
       |FROM c""".stripMargin

  def q116_cusum(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      q116Sql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div"))

  /** The CUSUM windows over whatever `orders` view is registered — split
    * out so the spec can plant a level-shift series and replay the
    * recursion against the closed form.
    */
  private[graft] def cusumFromViews(s: SparkSession): DataFrame =
    s.sql(q116Sql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div"))

  /** q117: Benford first-digit audit — the fraud/synthetic-data screen:
    * naturally-occurring multi-scale amounts follow P(d) = log10(1+1/d);
    * fabricated or truncated feeds don't (uniform leading digits, missing
    * 1s). Expected shares enter as per-mille CONSTANTS (the nine
    * log10(1+1/d) values rounded once, summing exactly to 1000) via one
    * CASE — no libm at query time — and each digit row carries observed
    * vs expected per-mille, the signed gap, and its Pearson chi²
    * contribution ×1000: floor((1000·n_d − N·exp_pm)² / (N·exp_pm·1000)).
    * The squared deviation is carried through IEEE DOUBLE (the operands
    * stay < 2^53 so the cast is exact, and one multiply + one divide +
    * floor is bit-deterministic on both engines) — int64 would wrap
    * silently in Spark past N ≈ 1e8 while DuckDB promotes to HUGEINT,
    * diverging the engines exactly when the audit matters. One scan + a
    * 9-group aggregate; the digit extraction is a cast-to-string head,
    * pure codegen. Deterministic integers out → hash-green.
    */
  private def q117Sql(str: String, div: String): String =
    s"""WITH digits AS (
       |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS $str), 1, 1)
       |              AS BIGINT) AS digit
       |  FROM orders),
       |obs AS (
       |  SELECT digit, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(count(*)) OVER () AS BIGINT) AS total
       |  FROM digits GROUP BY digit),
       |e AS (
       |  SELECT digit, n, total,
       |         CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
       |                    WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67
       |                    WHEN 7 THEN 58 WHEN 8 THEN 51 ELSE 46 END AS exp_pm
       |  FROM obs)
       |SELECT digit, n,
       |       (n * 1000) $div total AS obs_pm,
       |       exp_pm,
       |       (n * 1000) $div total - exp_pm AS gap_pm,
       |       CAST(floor(CAST(1000 * n - total * exp_pm AS DOUBLE)
       |                  * CAST(1000 * n - total * exp_pm AS DOUBLE)
       |                  / CAST(total * exp_pm * 1000 AS DOUBLE))
       |            AS BIGINT) AS chi2_milli
       |FROM e""".stripMargin

  def q117_benford(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q117Sql("STRING", "div"))

  /** q118: join-explosion / skew pre-flight audit — the operational check
    * run BEFORE committing a 100 TB self-join: for an equi-join key, the
    * output row count is Σ c_k² (c_k = per-key multiplicity), and one hot
    * key can dominate the whole shuffle. Per-key counts are one map-side
    * aggregate over the scan; each key's pair contribution c², its
    * per-mille share of the total join output, and the running
    * concentration curve are integer arithmetic over KEY-sized partials
    * (the fact table never meets a window). Top-10 contributors emitted —
    * exactly the keys `Scale.saltedJoin`'s salt factor should target.
    * The audited key is lineitem.l_partkey, the co-occurrence generator
    * behind g02/g08/g12 — so this measures the repo's own heaviest join
    * family. All integers → hash-green.
    */
  private def q118Sql(div: String): String =
    s"""WITH k AS (
       |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
       |  FROM lineitem GROUP BY l_partkey),
       |t AS (
       |  SELECT l_partkey, c, c * c AS pairs,
       |         CAST(sum(c * c) OVER () AS BIGINT) AS total_pairs,
       |         CAST(count(*) OVER () AS BIGINT) AS n_keys
       |  FROM k)
       |SELECT l_partkey, c AS rows_per_key, pairs,
       |       (pairs * 1000) $div total_pairs AS share_pm,
       |       total_pairs, n_keys
       |FROM t
       |ORDER BY pairs DESC, l_partkey
       |LIMIT 10""".stripMargin

  def q118_join_skew(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(q118Sql("div"))

  /** q119: Population Stability Index — the ML-monitoring staple: compare
    * the event-type mix of a reference window (first half-month) against
    * the current window; PSI = Σ (p−q)·ln(p/q) per bucket, with >0.25
    * conventionally "significant drift". Bucket counts are exact integers;
    * p, q and their ratio are deterministic IEEE divisions of those
    * integers (identical expression text both engines); the one libm call
    * (ln) is ulp-contained by the t05/t11 round-to-9dp discipline, and
    * each bucket's contribution is 9dp-rounded then summed through
    * DECIMAL(38,9) so the TOTAL is order-independent — the whole row set
    * hash-checks. Scale: two filtered map-side count aggregates over the
    * scan; everything after runs on |buckets| rows.
    */
  /** The PSI arithmetic over any (event_type, n_ref, n_cur) relation —
    * shared verbatim between q119 (counts inline from events) and st13
    * (counts merged from stored per-batch partials), so the incremental
    * path provably computes the identical statistic.
    *
    * Zero-count floor: a bucket (or a whole window) with n = 0 would put
    * ln(0) in the term — Spark's ln returns NULL (silently dropping the
    * term from psi_total) while DuckDB raises, so the standard PSI floor
    * applies: every count entering a ratio rides greatest(n, 1). The
    * fixture never hits it, but st13's per-batch ingest makes an empty
    * current window plausible in production; with the floor an absent
    * bucket contributes its maximal finite penalty instead of vanishing.
    */
  private[graft] def psiTail(div: String, src: String): String =
    s"""t AS (
       |  SELECT event_type, n_ref, n_cur,
       |         CAST(sum(n_ref) OVER () AS BIGINT) AS tot_ref,
       |         CAST(sum(n_cur) OVER () AS BIGINT) AS tot_cur
       |  FROM $src),
       |c AS (
       |  SELECT event_type, n_ref, n_cur,
       |         (n_ref * 1000) $div greatest(tot_ref, 1) AS ref_pm,
       |         (n_cur * 1000) $div greatest(tot_cur, 1) AS cur_pm,
       |         CAST(round(
       |           (CAST(greatest(n_ref, 1) AS DOUBLE) / CAST(greatest(tot_ref, 1) AS DOUBLE)
       |            - CAST(greatest(n_cur, 1) AS DOUBLE) / CAST(greatest(tot_cur, 1) AS DOUBLE))
       |           * round(ln((CAST(greatest(n_ref, 1) AS DOUBLE) / CAST(greatest(tot_ref, 1) AS DOUBLE))
       |                      / (CAST(greatest(n_cur, 1) AS DOUBLE) / CAST(greatest(tot_cur, 1) AS DOUBLE))), 9),
       |           9) AS DECIMAL(20,9)) AS psi_part
       |  FROM t)
       |SELECT event_type, n_ref, n_cur, ref_pm, cur_pm,
       |       CAST(psi_part AS DOUBLE) AS psi_part,
       |       CAST(CAST(sum(psi_part) OVER () AS DECIMAL(38,9)) AS DOUBLE) AS psi_total
       |FROM c""".stripMargin

  private[graft] def q119Sql(div: String): String =
    s"""WITH pc AS (
       |  SELECT event_type,
       |         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
       |  FROM events GROUP BY event_type),
       |${psiTail(div, "pc")}""".stripMargin

  def q119_psi_drift(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "events")(q119Sql("div"))

  /** q120: winsorized robust mean — the APPLY step q109's MAD screen only
    * measures: clamp each value into its group's [p05, p95] and aggregate
    * the clamped series. Bounds come from percentile_disc (nearest-rank
    * SELECTION — actual data values, no interpolation arithmetic, q56's
    * proven surface), so clamping and summing happen in exact integer
    * cents: n clamped low/high, winsorized vs raw sums — all hash-green
    * with no float anywhere. Scale: one per-group percentile pass (q40's
    * honest per-group-sort caveat; q46/q83 sketches are the 100 TB path)
    * + one clamp-and-aggregate scan with the 5-row bounds broadcast.
    */
  private val q120Sql: String =
    """WITH b AS (
      |  SELECT event_type,
      |         CAST(round(percentile_disc(0.05) WITHIN GROUP (ORDER BY value) * 100)
      |              AS BIGINT) AS lo_c,
      |         CAST(round(percentile_disc(0.95) WITHIN GROUP (ORDER BY value) * 100)
      |              AS BIGINT) AS hi_c
      |  FROM events GROUP BY event_type),
      |w AS (
      |  SELECT e.event_type,
      |         CAST(round(value * 100) AS BIGINT) AS cents, lo_c, hi_c
      |  FROM events e JOIN b ON b.event_type = e.event_type)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN cents < lo_c THEN 1 ELSE 0 END) AS BIGINT) AS n_floor,
      |       CAST(sum(CASE WHEN cents > hi_c THEN 1 ELSE 0 END) AS BIGINT) AS n_ceil,
      |       lo_c, hi_c,
      |       CAST(sum(least(greatest(cents, lo_c), hi_c)) AS BIGINT) AS winsor_cents,
      |       CAST(sum(cents) AS BIGINT) AS raw_cents
      |FROM w GROUP BY event_type, lo_c, hi_c""".stripMargin

  def q120_winsorize(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "events")(q120Sql)

  /** q121: decile LIFT/GAINS table — the model-eval artifact next to
    * t19's AUC: rank customers by a score (here: total revenue, standing
    * in for a model score), cut into deciles, and report each decile's
    * response rate (big-ticket purchase, q110's conversion flag),
    * cumulative gain and cumulative lift — "the top 20% of scores capture
    * X% of responders" is THE campaign-targeting readout. Deciles come
    * from ntile(10) over a UNIQUE order (score desc, custkey — ntile over
    * ties without a tie-break is engine-defined, the q70 lesson);
    * everything downstream is integer counts over 10 partial rows, gains
    * and lift in per-mille via cross-multiplied integer division →
    * hash-green. Scale: the score aggregate is map-side; the one global
    * sort is |customers| rows (the q108 note: two-phase scan is the
    * giant-dimension path), windows after that see 10 rows.
    */
  private def q121Sql(div: String): String =
    s"""WITH score AS (
       |  SELECT o_custkey,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |           AS revenue_cents,
       |         max(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS responder
       |  FROM orders GROUP BY o_custkey),
       |dec AS (
       |  SELECT o_custkey, revenue_cents, responder,
       |         CAST(ntile(10) OVER (ORDER BY revenue_cents DESC, o_custkey)
       |              AS BIGINT) AS decile
       |  FROM score),
       |agg AS (
       |  SELECT decile, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(responder) AS BIGINT) AS responders
       |  FROM dec GROUP BY decile),
       |cum AS (
       |  SELECT decile, n, responders,
       |         CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
       |         CAST(sum(responders) OVER (ORDER BY decile) AS BIGINT) AS cum_resp,
       |         CAST(sum(n) OVER () AS BIGINT) AS tot_n,
       |         CAST(sum(responders) OVER () AS BIGINT) AS tot_resp
       |  FROM agg)
       |SELECT decile, n, responders,
       |       (responders * 1000) $div n AS response_pm,
       |       (cum_resp * 1000) $div tot_resp AS cum_gain_pm,
       |       (cum_resp * tot_n * 1000) $div (cum_n * tot_resp) AS cum_lift_pm
       |FROM cum""".stripMargin

  def q121_lift_gains(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q121Sql("div"))

  /** q122: SPRT sequential test ledger (Wald 1945) — the always-valid
    * monitor q110's fixed-horizon z-test can't be: peeking at a z-test
    * daily inflates false positives, while the sequential
    * probability-ratio test is DESIGNED to be read every day. Testing
    * H0: conversion = 4% vs H1: 8% at α = β = 0.05, each day's
    * log-likelihood increment is x·ln(p1/p0) + (n−x)·ln((1−p1)/(1−p0)) —
    * and because p0/p1 are design CONSTANTS, both logs enter as
    * pre-rounded integer micro-literals (693147 = ln 2·10⁶, −42560) just
    * like q117's Benford table: the entire ledger is exact int64
    * arithmetic, no libm at query time. Cumulative LLR is one prefix sum
    * over day partials; crossing ln((1−β)/α) = ±2944439 micro decides.
    * Scale: the corpus-sized work is the map-side daily aggregate
    * (q112/q116's economics); the window sees |days| rows.
    */
  private def q122Sql(dayExpr: String, div: String): String =
    s"""WITH daily AS (
       |  SELECT $dayExpr AS day, CAST(count(*) AS BIGINT) AS n_trials,
       |         CAST(sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_conv
       |  FROM orders GROUP BY 1),
       |l AS (
       |  SELECT day, n_trials, n_conv,
       |         CAST(sum(n_conv * 693147 + (n_trials - n_conv) * (-42560))
       |              OVER (ORDER BY day) AS BIGINT) AS llr_micro
       |  FROM daily)
       |SELECT day, n_trials, n_conv, llr_micro,
       |       CASE WHEN llr_micro >= 2944439 THEN 'accept_h1'
       |            WHEN llr_micro <= -2944439 THEN 'accept_h0'
       |            ELSE 'continue' END AS verdict
       |FROM l""".stripMargin

  def q122_sprt(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      q122Sql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div"))

  /** q123: weekday SEASONAL-INDEX decomposition — the classical-
    * decomposition prep step before any forecast or anomaly rule on
    * business metrics (q95 normalizes within (type × hour) cells; this
    * produces the reusable multiplicative index itself): per-weekday
    * index = weekday mean over global mean in per-mille, computed
    * CROSS-MULTIPLIED ((Σ_wd · n_total · 1000) div (n_wd · Σ_total)) so
    * no float mean ever forms, then each day's revenue deseasonalizes by
    * integer division against its weekday's index. Weekday comes from
    * the epoch-day index mod 7 — engines disagree on dayofweek()
    * numbering (a cross-engine hazard class like NULL ordering, pinned
    * here by construction instead). All int64 → hash-green; windows see
    * |days| partials, the 7-row index broadcasts.
    */
  private def q123Sql(dayExpr: String, div: String): String =
    s"""WITH daily AS (
       |  SELECT $dayExpr AS day,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |w AS (
       |  SELECT day % 7 AS weekday,
       |         CAST(sum(cents) AS BIGINT) AS wd_sum,
       |         CAST(count(*) AS BIGINT) AS wd_days
       |  FROM daily GROUP BY 1),
       |t AS (
       |  SELECT CAST(sum(cents) AS BIGINT) AS tot_sum,
       |         CAST(count(*) AS BIGINT) AS tot_days
       |  FROM daily),
       |idx AS (
       |  SELECT weekday,
       |         (wd_sum * tot_days * 1000) $div (wd_days * tot_sum) AS idx_pm
       |  FROM w CROSS JOIN t)
       |SELECT d.day, d.day % 7 AS weekday, d.cents, i.idx_pm,
       |       (d.cents * 1000) $div i.idx_pm AS deseas_cents
       |FROM daily d JOIN idx i ON i.weekday = d.day % 7""".stripMargin

  def q123_seasonal_index(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      q123Sql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div"))

  /** q124: NEAREST as-of join — pandas `merge_asof(direction='nearest')`:
    * q30/q104 answer "latest at-or-before"; sensor/feature alignment often
    * wants the temporally CLOSEST reading either side. Rewrite: ONE
    * (user, ts) sort carries both a last-at-or-before and a
    * first-after window (q30's union trick, both directions), then an
    * exact epoch-µs integer compare picks the nearer (tie → the earlier,
    * i.e. the backward match; same-ts clicks sort before the probe so a
    * zero-gap match is a backward match on both engines). Probes with no
    * click either side survive with NULLs (q104's contract). The DuckDB
    * oracle is an INDEPENDENT LATERAL top-1-by-|gap| per probe — a
    * different algorithm reaching the same rows, cross-validating the
    * two-window rewrite. Scale: one exchange on user_id serves both
    * windows; no probes×candidates join ever forms.
    */
  def q124_asof_nearest(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .filter(col("event_type").isin("click", "error"))
      .withColumn("is_probe", when(col("event_type") === "error", 1).otherwise(0))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      .withColumn("prev_ts", last(col("click_ts"), ignoreNulls = true).over(back))
      .withColumn("next_ts", first(col("click_ts"), ignoreNulls = true).over(fwd))
      .filter(col("is_probe") === 1)
      .withColumn("gap_back", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .withColumn("gap_fwd", unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .withColumn("take_back",
        col("prev_ts").isNotNull &&
          (col("next_ts").isNull || col("gap_back") <= col("gap_fwd")))
      .select(col("event_id"),
        date_format(
          when(col("take_back"), col("prev_ts")).otherwise(col("next_ts")),
          "yyyy-MM-dd HH:mm:ss").as("nearest_click_s"),
        when(col("take_back"), col("gap_back"))
          .otherwise(col("gap_fwd")).as("gap_us"),
        when(col("prev_ts").isNull && col("next_ts").isNull, lit(null))
          .otherwise(when(col("take_back"), "back").otherwise("fwd"))
          .as("direction"))
  }

  /** q125: SHARE-OF-PARENT drilldown — the hierarchy presentation every
    * BI drill (region → nation) leads with: each nation's revenue with
    * its per-mille share WITHIN its region and the region's share of the
    * grand total, so the two window scopes nest (q113 bounds one level's
    * legend; this walks the hierarchy). Revenue aggregates to the
    * |nations| grain map-side before any window — the windows see 25
    * rows — and every share is cross-multiplied integer division →
    * hash-green with identical SQL text. The dimension joins broadcast.
    */
  private def q125Sql(div: String): String =
    s"""WITH rev AS (
       |  SELECT r_name AS region, n_name AS nation,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |           AS rev_cents
       |  FROM orders
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation ON n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = n_regionkey
       |  GROUP BY r_name, n_name)
       |SELECT region, nation, rev_cents,
       |       (rev_cents * 1000) $div CAST(sum(rev_cents)
       |          OVER (PARTITION BY region) AS BIGINT) AS share_in_region_pm,
       |       (CAST(sum(rev_cents) OVER (PARTITION BY region) AS BIGINT) * 1000)
       |         $div CAST(sum(rev_cents) OVER () AS BIGINT) AS region_share_pm
       |FROM rev""".stripMargin

  def q125_share_of_parent(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders", "customer", "nation", "region")(q125Sql("div"))

  /** q126: sample AUTOCORRELATION at lags 1/7/30 — the seasonality
    * DETECTOR that justifies q123's weekday index and q112's smoothing
    * choices (a spike at lag 7 ⇒ weekly structure; slow decay ⇒ trend
    * first, then model): classic ACF over the daily revenue series,
    * computed center-free so no float mean ever forms — r_k =
    * Σ(N·x_t − S)(N·x_{t−k} − S) / Σ(N·x_t − S)², with the centered
    * operands exact int64 (N·x ≈ 2.4e12) and their PRODUCTS carried as
    * DECIMAL(38,0) (the square tops 5e24 — past int64, exact in
    * decimal; the t20 rule: no intermediate downcast anywhere). Only
    * the final ratio is a double, micro-rounded. Gaps in the day spine
    * are treated as missing pairs (the lag join simply finds no row —
    * the standard irregular-series convention, stated here). Windows
    * and joins all ride |days| partial rows.
    */
  private def q126Sql(dayExpr: String, div: String): String =
    s"""WITH daily AS (
       |  SELECT $dayExpr AS day,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |t AS (
       |  SELECT day, cents,
       |         CAST(count(*) OVER () AS BIGINT) AS n,
       |         CAST(sum(cents) OVER () AS BIGINT) AS s
       |  FROM daily),
       |c AS (SELECT day, n * cents - s AS dev, n FROM t),
       |lags AS (SELECT 1 AS lag UNION ALL SELECT 7 UNION ALL SELECT 30),
       |num AS (
       |  SELECT l.lag,
       |         CAST(sum(CAST(a.dev AS DECIMAL(38,0))
       |                   * CAST(b.dev AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS a_k,
       |         CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM lags l
       |  JOIN c a ON 1 = 1
       |  JOIN c b ON b.day = a.day - l.lag
       |  GROUP BY l.lag),
       |den AS (
       |  SELECT CAST(sum(CAST(dev AS DECIMAL(38,0))
       |                  * CAST(dev AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS d
       |  FROM c)
       |SELECT lag, n_pairs,
       |       CAST(round(1000000.0 * CAST(a_k AS DOUBLE) / CAST(d AS DOUBLE))
       |            AS BIGINT) AS acf_micro
       |FROM num CROSS JOIN den""".stripMargin

  def q126_autocorrelation(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      q126Sql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div"))

  /** q127: GINI coefficient of customer revenue — the single-number
    * concentration measure behind q108's ABC curve (a portfolio at
    * G≈0.6+ depends on its head; the number that goes on the risk
    * dashboard where the curve doesn't fit): the rank formulation
    * G = Σ(2r−n−1)·x / (n·Σx) over ascending revenue with a unique
    * (revenue, custkey) tie-break, every term an exact integer carried
    * through DECIMAL(38,0) (per-term products reach ~1e12 at bench SF
    * and ~1e15 at SF100 — the t20 no-downcast rule keeps the sum exact
    * at any scale), one final micro-rounded double division. The rank
    * is the q108 honest-scale note: |customers| rows through one ordered
    * window, two-phase scan at giant dimensions. Emitted alongside n
    * and total cents so the spec can replay the closed form.
    */
  private def q127Sql(div: String): String =
    s"""WITH r AS (
       |  SELECT o_custkey,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |           AS cents
       |  FROM orders GROUP BY o_custkey),
       |rk AS (
       |  SELECT cents,
       |         CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rnk,
       |         CAST(count(*) OVER () AS BIGINT) AS n,
       |         CAST(sum(cents) OVER () AS BIGINT) AS s
       |  FROM r),
       |g AS (
       |  SELECT CAST(sum(CAST((2 * rnk - n - 1) AS DECIMAL(38,0))
       |                  * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS num,
       |         CAST(min(n) AS BIGINT) AS n, CAST(min(s) AS BIGINT) AS s
       |  FROM rk)
       |SELECT n AS n_customers, s AS total_cents,
       |       CAST(round(1000000.0 * CAST(num AS DOUBLE)
       |                  / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)))
       |            AS BIGINT) AS gini_micro
       |FROM g""".stripMargin

  def q127_gini(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q127Sql("div"))

  /** q128: THEIL index with exact between/within-region decomposition —
    * the property that earns Theil its place next to q127's Gini: total
    * inequality splits ADDITIVELY into "inequality between regions" plus
    * the revenue-weighted within-region terms (Gini admits no such
    * split), which is how a dashboard answers "is concentration a
    * regional story or a within-market story". Every term follows the
    * q119 PSI discipline — deterministic IEEE ratios, 9dp-rounded ln,
    * 9dp-rounded term, DECIMAL(38,9) summation — so all three statistics
    * hash-check; the decomposition identity itself is pinned in the spec
    * to within the rounding budget. Corpus-sized work is the per-customer
    * aggregate; the Theil sums run over |customers| and |regions| rows.
    */
  private val q128Sql: String = {
    def term(share: String, lnArg: String) =
      s"""CAST(sum(CAST(round(($share)
         |       * round(ln($lnArg), 9), 9) AS DECIMAL(20,9))) AS DECIMAL(38,9))""".stripMargin
    s"""WITH cr AS (
       |  SELECT r_name AS region, o_custkey,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation ON n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = n_regionkey
       |  GROUP BY r_name, o_custkey),
       |tot AS (SELECT CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
       |        FROM cr),
       |gr AS (SELECT region, CAST(sum(x) AS BIGINT) AS sg,
       |              CAST(count(*) AS BIGINT) AS ng
       |       FROM cr GROUP BY region),
       |tw AS (
       |  SELECT cr.region,
       |         ${term(
             "CAST(x AS DOUBLE) / CAST(sg AS DOUBLE)",
             "CAST(ng AS DOUBLE) * CAST(x AS DOUBLE) / CAST(sg AS DOUBLE)")} AS t_within
       |  FROM cr JOIN gr ON gr.region = cr.region
       |  GROUP BY cr.region),
       |tt AS (
       |  SELECT ${term(
             "CAST(x AS DOUBLE) / CAST(s AS DOUBLE)",
             "CAST(n AS DOUBLE) * CAST(x AS DOUBLE) / CAST(s AS DOUBLE)")} AS t_total
       |  FROM cr CROSS JOIN tot),
       |tb AS (
       |  SELECT ${term(
             "CAST(sg AS DOUBLE) / CAST(s AS DOUBLE)",
             "(CAST(sg AS DOUBLE) / CAST(s AS DOUBLE)) * (CAST(n AS DOUBLE) / CAST(ng AS DOUBLE))")} AS t_between
       |  FROM gr CROSS JOIN tot)
       |SELECT g.region, g.ng AS n_customers, g.sg AS revenue_cents,
       |       CAST(w.t_within AS DOUBLE) AS t_within,
       |       CAST(t.t_total AS DOUBLE) AS t_total,
       |       CAST(b.t_between AS DOUBLE) AS t_between
       |FROM gr g JOIN tw w ON w.region = g.region
       |CROSS JOIN tt t CROSS JOIN tb b""".stripMargin
  }

  def q128_theil(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders", "customer", "nation", "region")(q128Sql)

  /** q129: calendar-GAP audit — the spine-completeness check every
    * daily-series operator here silently assumes (q112's lags, q116's
    * prefix sums and q126's lag pairs all treat "no row" as "no day"):
    * generate the min..max day spine, anti-join the observed days, and
    * collapse missing days into maximal runs via the d17/q74
    * gaps-and-islands trick — one row per OUTAGE with its span, which
    * is what a monitoring page actually lists. Integer day indexes end
    * to end → hash-green; the spine is |days| rows (sequence explode,
    * zero shuffle) and the windows see only the missing sliver.
    */
  private def q129Sql(dayExpr: String, div: String): String =
    s"""WITH obs AS (
       |  SELECT DISTINCT $dayExpr AS day FROM orders),
       |bounds AS (
       |  SELECT CAST(min(day) AS BIGINT) AS lo, CAST(max(day) AS BIGINT) AS hi
       |  FROM obs),
       |spine AS ($$SPINE$$),
       |missing AS (
       |  SELECT s.day FROM spine s LEFT JOIN obs o ON o.day = s.day
       |  WHERE o.day IS NULL),
       |isl AS (
       |  SELECT day,
       |         day - row_number() OVER (ORDER BY day) AS island
       |  FROM missing)
       |SELECT CAST(min(day) AS BIGINT) AS gap_start,
       |       CAST(max(day) AS BIGINT) AS gap_end,
       |       CAST(count(*) AS BIGINT) AS n_missing_days
       |FROM isl GROUP BY island""".stripMargin

  def q129_calendar_gaps(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      q129Sql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div")
        .replace("$SPINE$",
          "SELECT explode(sequence(lo, hi)) AS day FROM bounds"))

  /** The audit over whatever `orders` view is registered — split out so
    * the spec can plant known outages.
    */
  private[graft] def calendarGapsFromViews(s: SparkSession): DataFrame =
    s.sql(
      q129Sql("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)", "div")
        .replace("$SPINE$",
          "SELECT explode(sequence(lo, hi)) AS day FROM bounds"))

  /** q130: two-sample KOLMOGOROV-SMIRNOV test — "is this slice's length
    * distribution the same as the rest of the corpus?", the
    * distribution-level drift check PSI's binned form (q119) only
    * approximates: D = max |CDF_en − CDF_rest| over document lengths.
    * Exact-integer formulation: per distinct length, grouped counts →
    * one running-sum window → D carried SCALED as
    * max |cumA·nB − cumB·nA| (int64; the division to a double happens
    * once at the end), so the statistic hash-checks. The α=0.05 decision
    * uses the standard asymptotic critical value 1.358·sqrt((nA+nB)/
    * (nA·nB)) — sqrt is correctly rounded everywhere. One scan, one
    * |distinct lengths| window — scan-shaped at any corpus size.
    */
  private val q130Sql: String =
    """WITH v AS (
      |  SELECT n_chars,
      |         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS is_a
      |  FROM documents),
      |tot AS (
      |  SELECT CAST(sum(is_a) AS BIGINT) AS na,
      |         CAST(sum(1 - is_a) AS BIGINT) AS nb
      |  FROM v),
      |g AS (
      |  SELECT n_chars, CAST(sum(is_a) AS BIGINT) AS ca,
      |         CAST(sum(1 - is_a) AS BIGINT) AS cb
      |  FROM v GROUP BY n_chars),
      |cum AS (
      |  SELECT n_chars,
      |         CAST(sum(ca) OVER (ORDER BY n_chars) AS BIGINT) AS cum_a,
      |         CAST(sum(cb) OVER (ORDER BY n_chars) AS BIGINT) AS cum_b
      |  FROM g),
      |dd AS (
      |  SELECT CAST(max(abs(cum_a * t.nb - cum_b * t.na)) AS BIGINT) AS d_scaled
      |  FROM cum CROSS JOIN tot t)
      |SELECT t.na AS n_a, t.nb AS n_b, d.d_scaled,
      |       CAST(d.d_scaled AS DOUBLE) / (t.na * t.nb) AS ks_d,
      |       round(1.358 * sqrt(CAST(t.na + t.nb AS DOUBLE) / (t.na * t.nb)), 9)
      |         AS crit_05,
      |       (CAST(d.d_scaled AS DOUBLE) / (t.na * t.nb) >
      |        1.358 * sqrt(CAST(t.na + t.nb AS DOUBLE) / (t.na * t.nb)))
      |         AS reject_05
      |FROM dd d CROSS JOIN tot t""".stripMargin

  def q130_ks_test(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "documents")(q130Sql)

  /** q131: QUANTIFIED comparison subqueries (`> ALL` / `> ANY`) — the
    * ANSI surface Spark's parser lacks, emulated the q86-q89 way: the
    * quantifier collapses to a scalar extreme (`> ALL s ⇔ > max(s)`,
    * `> ANY s ⇔ > min(s)` — s is non-empty and non-null here), while the
    * DuckDB oracle runs the REAL `ALL`/`ANY` clauses, so the rewrite is
    * hash-checked against the native semantics. The subquery is the
    * per-month average order value carried as exact integer cents
    * (sum·100 div count — operands non-negative, so Spark's `div` and
    * DuckDB's `//` agree); output keeps orders beating ANY monthly
    * average, flagging those beating ALL of them. Scale: one grouped
    * aggregate (12·years rows), broadcast back as two scalars — the scan
    * never shuffles.
    */
  private val q131SparkSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, substring(CAST(o_orderdate AS STRING), 1, 7) AS m,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |mavg AS (
      |  SELECT m, sum(cents) div count(*) AS cents_avg
      |  FROM o GROUP BY m)
      |SELECT o_orderkey, cents,
      |       cents > (SELECT max(cents_avg) FROM mavg) AS above_all
      |FROM o
      |WHERE cents > (SELECT min(cents_avg) FROM mavg)""".stripMargin

  def q131_quantified(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q131SparkSql)

  /** q132: DISTRIBUTION-rank window trio — percent_rank, cume_dist,
    * ntile — the last ANSI window functions the registry didn't exercise
    * (q12 covers rank/dense_rank/row_number, q42 the offset family).
    * percent_rank = (rank−1)/(n−1) and cume_dist = rank/n are single
    * IEEE divisions of integers (bit-identical cross-engine; rounded to
    * 9dp anyway per t05's discipline), ntile is integer arithmetic; the
    * ORDER BY carries the key tie-break so ranks are total. One shuffle
    * on the partition key, same as any window — both engines run the
    * IDENTICAL SQL text (shared dialect, WINDOW clause included).
    */
  private val q132Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |       round(percent_rank() OVER w, 9) AS pr,
      |       round(cume_dist() OVER w, 9) AS cd,
      |       CAST(ntile(10) OVER w AS BIGINT) AS decile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin

  def q132_distribution_ranks(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q132Sql)

  /** q133: the orderkey fact-fact join over the PERSISTED BUCKETED layout
    * ([[Buckets]]) — per-order revenue from a ZERO-EXCHANGE sort-merge
    * join (both sides hash-clustered into the same 16 buckets on the
    * join key, so Spark joins bucket pairs in place), then a rollup of
    * the 15k pre-aggregated order rows to priority level (the single,
    * tiny shuffle bucketing leaves behind). The merge hint is the 100 TB
    * choice made explicit: at scale neither fact side broadcasts, and
    * the bucketed SMJ is exactly the plan a deployment wants — the pin
    * in PlanInvariantsSpec asserts no exchange ever touches the fact
    * rows. Oracle rebuilds from the raw parquet, so the hash gate also
    * proves the bucketed layout is lossless.
    */
  def q133_bucketed_join(s: SparkSession, d: String): DataFrame = {
    val (oT, lT) = Buckets.tables(s, d)
    val o = s.table(oT).select(col("o_orderkey"), col("o_orderpriority"))
    val l = s.table(lT).select(col("l_orderkey"),
      col("l_extendedprice"), col("l_discount"))
    l.hint("merge")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .as("rev"), count(lit(1)).as("n_items"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("rev")).cast("double").as("revenue"),
        sum(col("n_items")).as("n_lineitems"))
  }

  /** q134: language-filtered census over the lang-PARTITIONED layout
    * ([[Buckets.langPartitionedDocs]]) — the scan's PartitionFilters
    * prune every non-matching language directory before any I/O, the
    * layout-level complement to q133's bucketing (pinned: inputFiles all
    * live under `lang=de/`). `lang` comes back from the directory name as
    * a partition column; the oracle filters the raw corpus, so the hash
    * gate proves the partitioned layout lossless, round-tripped values
    * included.
    */
  def q134_partitioned_scan(s: SparkSession, d: String): DataFrame =
    s.read.parquet(Buckets.langPartitionedDocs(s, d))
      .filter(col("lang") === "de")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))

  /** q135: SALTED join — the manual skew-mitigation pattern for the case
    * AQE's skew-split cannot reach (it only splits sort-merge partitions
    * AFTER a shuffle materializes; a stream-stream join, a stubborn
    * hot-key aggregation, or a pre-AQE engine needs the rewrite itself):
    * the probe side carries `salt = deterministic_hash(row) % 8`, the
    * build side replicates each key 8× with every salt value, and the
    * join key widens to (key, salt) — a hot key's rows now land on 8
    * reducers instead of one, at the price of an 8× build-side blowup
    * that is SIZED, not guessed (q118 is the preflight that measures
    * whether a key is hot enough to warrant it). Salting is
    * correctness-neutral by construction, which is exactly what the
    * oracle checks: DuckDB runs the UNSALTED join and the hash gate
    * must not see a difference. The merge hint pins the
    * two-big-tables shape (at 100 TB `part` is TBs — not broadcastable);
    * the plan pin asserts the join really runs on the widened key pair.
    */
  /** The probe-side salt — deterministic per row (no RNG to ship), shared
    * with the spec that pins a hot key's rows really spread over all
    * salts.
    */
  private[graft] def saltOf(orderkey: Column, linenumber: Column,
      salts: Int): Column = (orderkey * 31L + linenumber) % salts

  def q135_salted_join(s: SparkSession, d: String): DataFrame = {
    val salts = 8
    val li = Tables.lineitem(s, d).select(col("l_partkey"),
      col("l_extendedprice"), col("l_discount"),
      saltOf(col("l_orderkey"), col("l_linenumber"), salts).as("salt"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      .withColumn("salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
    li.hint("merge")
      .join(p, li("l_partkey") === p("p_partkey") && li("salt") === p("salt"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
  }

  /** q136: exact EQUI-DEPTH range boundaries — the split-point table a
    * range-partitioned writer needs (q134's layout planning step):
    * 32 buckets of equal row mass over (l_orderkey, l_linenumber), each
    * bucket's max key = the boundary. Spark's own repartitionByRange
    * SAMPLES its boundaries (good enough to route, wrong to publish);
    * this computes them EXACTLY with the c28/d27/m20 two-phase scan —
    * range-partition, per-partition subtotals to the driver (≤32 rows at
    * any corpus size), broadcast offsets back, positions from pid-local
    * windows — no global sort ever lands on one reducer. Bucket =
    * position·32 DIV N (the remainder-spreading rule both engines can
    * spell; ntile's all-big-buckets-first convention differs, so the
    * oracle uses the same row_number arithmetic).
    */
  def q136_range_boundaries(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"))
      .repartitionByRange(32, col("l_orderkey"), col("l_linenumber"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical in both passes
    val subtotals = keyed.groupBy(col("pid"))
      .agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = subtotals.map(_._2).sum
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val offDf = s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off")
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offDf), "pid")
      .withColumn("position", col("off") + count(lit(1)).over(w) - 1)
      .withColumn("bucket", expr(s"position * 32 DIV $total") + lit(1))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("l_orderkey")).as("boundary_key"))
  }

  /** q137: COLUMN-GROUP statistics — the ANALYZE-table pass a cost-based
    * optimizer needs before it can price multi-column predicates: per
    * column pair, the individual NDVs, the JOINT NDV, and the
    * independence ratio joint·1000 / min(ndv_a·ndv_b, rows) — 1000 means
    * the columns combine independently (multiplying selectivities is
    * sound), low values flag functional-dependence-like correlation
    * (where independence assumptions underestimate selectivity by orders
    * of magnitude — the classic CBO misestimate). One scan: all nine
    * distinct-aggregates ride a single Expand-based aggregate, then the
    * 1-row wide result unpivots to the 3-row stats table.
    */
  def q137_column_stats(s: SparkSession, d: String): DataFrame = {
    // nine distinct-aggregates ride one Expand (~7x row multiplication)
    // whose partial aggregation runs in the scan stage — 1 task on the
    // single-file fixture (r13 flight sweep: 1.9 s CPU on 3 tasks);
    // widen the projected columns only when the scan is narrow
    val li = Tables.widen(Tables.lineitem(s, d).select(
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
      col("l_partkey"), col("l_suppkey")))
    val wide = li.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_returnflag")).as("a1"),
      countDistinct(col("l_linestatus")).as("b1"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("j1"),
      countDistinct(col("l_shipdate")).as("a2"),
      countDistinct(col("l_returnflag")).as("b2"),
      countDistinct(col("l_shipdate"), col("l_returnflag")).as("j2"),
      countDistinct(col("l_partkey")).as("a3"),
      countDistinct(col("l_suppkey")).as("b3"),
      countDistinct(col("l_partkey"), col("l_suppkey")).as("j3"))
    wide.select(expr(
      """stack(3,
        |  'l_returnflag,l_linestatus', a1, b1, j1,
        |  'l_shipdate,l_returnflag',   a2, b2, j2,
        |  'l_partkey,l_suppkey',       a3, b3, j3)
        |  AS (col_pair, ndv_a, ndv_b, ndv_joint)""".stripMargin),
      col("n_rows"))
      .withColumn("independence_pm",
        expr("ndv_joint * 1000 DIV least(ndv_a * ndv_b, n_rows)"))
  }

  /** q138: SAMPLED-aggregation audit — the approximate-query-processing
    * play (BlinkDB-lineage: answer a grouped aggregate from a p=10%
    * sample, scaled by 1/p) measured against its own ground truth: per
    * group, the exact count/revenue, the sample-scaled estimates, and
    * the realized relative error in per-mille. At 100 TB the sampled
    * scan is the product (10× less I/O for ~1-2% error on big groups);
    * the audit form is what makes it shippable — it shows the error the
    * operator actually delivers per group, not a hoped-for bound. The
    * sample is the stateless multiplicative hash over the row identity
    * (no RNG, no seed state), so sample membership — and therefore every
    * estimate — is deterministic and the whole table hash-checks.
    * One scan computes both sides (conditional aggregates), map-side
    * partial throughout.
    */
  def q138_sampled_agg_audit(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .withColumn("in_sample",
        (((col("l_orderkey") * 8L + col("l_linenumber")) % 1000003L)
          * 2654435761L + 911L) % 1000L < 100L)
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact_n"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("exact_rev"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("sample_n"),
        dsum(when(col("in_sample"),
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0))).as("sample_rev"))
      .withColumn("est_n", col("sample_n") * 10L)
      .withColumn("n_err_pm",
        expr("abs(est_n - exact_n) * 1000 DIV exact_n"))
      .withColumn("est_rev", round(col("sample_rev") * 10d, 6))
      .withColumn("rev_err_pm",
        expr("CAST(abs(est_rev - exact_rev) * 1000 / exact_rev AS BIGINT)"))
      .select(col("l_returnflag"), col("exact_n"), col("est_n"),
        col("n_err_pm"), col("exact_rev"), col("est_rev"), col("rev_err_pm"))
  }

  /** q139: INCREMENTAL bucketed-layout maintenance — the lifecycle step
    * q133's build-once story needs to be production-true (a layout you
    * cannot grow gets rebuilt nightly, forfeiting its economics): a
    * delta slice (orders ending in 0, re-keyed past the base range,
    * standing in for the day's new orders) is APPENDED into an
    * independent bucketed pair via INSERT — Spark buckets the inserted
    * rows with the same hash, so each bucket gains a file and the
    * zero-exchange sort-merge join SURVIVES growth (plan-pinned). The
    * oracle rebuilds base ∪ delta from raw parquet, proving the appended
    * layout lossless; the append itself is marker-committed idempotent
    * (re-runs must not double the delta — the hash gate would catch a
    * double-append as inflated counts on every re-keyed order).
    */
  def q139_bucketed_append(s: SparkSession, d: String): DataFrame = {
    val (oT, lT) = Buckets.deltaTables(s, d)
    val o = s.table(oT).select(col("o_orderkey"), col("o_orderpriority"))
    val l = s.table(lT).select(col("l_orderkey"),
      col("l_extendedprice"), col("l_discount"))
    l.hint("merge")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .as("rev"), count(lit(1)).as("n_items"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("rev")).cast("double").as("revenue"),
        sum(col("n_items")).as("n_lineitems"))
  }

  /** q140: ZONE-MAP file skipping ([[Buckets.zoneMapOrders]]) — a date-
    * range query plans its file list from the per-file (min, max) stats
    * table and reads ONLY overlapping files; the stats read is file-level
    * METADATA (16 rows here; one row per data file at any scale — the
    * manifest scan every Delta/Iceberg driver performs at planning time,
    * so the driver-side collect is the planning step, not a data
    * collect). The residual predicate still applies inside the surviving
    * files (zone maps are conservative). The oracle filters raw orders,
    * so the hash gate proves skipping lossless; the plan pin asserts the
    * scan's numFiles really dropped to the overlap count.
    */
  def q140_zone_map_skip(s: SparkSession, d: String): DataFrame = {
    val (dataDir, statsDir) = Buckets.zoneMapOrders(s, d)
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1995-12-31 23:59:59").cast("timestamp")
    val files = s.read.parquet(statsDir)
      .filter(col("max_date") >= lo && col("min_date") <= hi)
      .select(col("file_path"))
      .collect().map(_.getString(0)).sorted
    require(files.nonEmpty, s"zone map pruned every file under $dataDir")
    s.read.parquet(files.toIndexedSeq: _*)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  /** q141: merge-on-read DELETION VECTORS
    * ([[Buckets.lineitemDeleteVectors]]) — the retention purge is served
    * by anti-joining the positional delete table against the base scan on
    * (file_path, row_index); base files are never rewritten (pinned: the
    * read path's data inputs are exactly the original lineitem parquet
    * plus the vector table). The vector side is deletes-sized, orders of
    * magnitude under the base, so it broadcasts; at 100 TB this is the
    * point — a few-GB delete set streams past every executor instead of a
    * full-table rewrite. Oracle applies the purge predicate to raw
    * lineitem, proving the positional vector captures exactly those rows.
    */
  def q141_deletion_vectors(s: SparkSession, d: String): DataFrame = {
    val dv = s.read.parquet(Buckets.lineitemDeleteVectors(s, d))
    val li = Tables.lineitem(s, d).select(
      col("_metadata.file_path").as("file_path"),
      col("_metadata.row_index").as("row_index"),
      col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    li.join(broadcast(dv), Seq("file_path", "row_index"), "left_anti")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("l_quantity")).cast("long").as("qty"),
        dsum(col("l_extendedprice")).as("gross"))
  }

  /** q142: TIME TRAVEL over the snapshot log ([[Buckets.ordersSnapshots]])
    * — the same census read at v1 (pre-1997 base files) and v2 (base +
    * appended delta), each resolving its file list from its own manifest.
    * The v1 read runs AFTER the v2 commit exists, so matching the oracle's
    * pre-1997 slice proves snapshot isolation: a published version is
    * immutable however the log grows. The pin additionally asserts the v1
    * scan never touches the delta file.
    */
  def q142_time_travel(s: SparkSession, d: String): DataFrame = {
    val dir = Buckets.ordersSnapshots(s, d)
    def census(v: Int) =
      Buckets.snapshotRead(s, dir, v)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .withColumn("version", lit(v))
    census(1).unionByName(census(2))
  }

  /** q143: KAPLAN-MEIER survival over customer lifetimes — the retention
    * curve with CENSORING done right (naive churn rates over-count: a
    * recently-acquired active customer is not a survivor to month 60, he
    * is censored at his observation length). Lifetime = months between
    * first and last order; churn = no order in the trailing 6 months of
    * the observation window, else censored. S(t) = Π(1 − d/n) over event
    * months, computed as a DECIMAL-summed 9dp-log cumulative product
    * (t20's discipline; exp re-rounded at 9 dp) so the curve
    * hash-checks. Risk sets come from one running count over the
    * MONTH-GRAIN frame — bounded by the calendar (≤ a few hundred rows at
    * any corpus size), so the global-ordered window is a driver-scale
    * fold, not a data funnel. The degenerate all-events-at-max-t stratum
    * is floored at 1e-12 before ln (documented; fixture never hits it).
    */
  private val q143Sql: String =
    """WITH spans AS (
      |  SELECT o_custkey,
      |         min(year(o_orderdate) * 12 + month(o_orderdate)) AS m0,
      |         max(year(o_orderdate) * 12 + month(o_orderdate)) AS m1
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT max(m1) AS mmax, CAST(count(*) AS BIGINT) AS n_total
      |      FROM spans),
      |sp AS (SELECT CAST(m1 - m0 AS BIGINT) AS t,
      |              CASE WHEN m1 <= h.mmax - 6 THEN 1 ELSE 0 END AS ev,
      |              h.n_total
      |       FROM spans CROSS JOIN h),
      |bt AS (SELECT t, n_total, CAST(sum(ev) AS BIGINT) AS d,
      |              CAST(sum(1 - ev) AS BIGINT) AS n_censored
      |       FROM sp GROUP BY t, n_total),
      |r AS (SELECT t, d, n_censored,
      |             n_total - CAST(coalesce(sum(d + n_censored) OVER
      |               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |                AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      |      FROM bt),
      |lf AS (SELECT t, n_risk, d, n_censored,
      |              CAST(round(ln(greatest(
      |                1.0 - CAST(d AS DOUBLE) / n_risk, 1e-12)), 9)
      |                AS DECIMAL(18,9)) AS lf
      |       FROM r)
      |SELECT t, n_risk, d, n_censored,
      |       round(exp(CAST(sum(lf) OVER (ORDER BY t
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)),
      |         9) AS surv
      |FROM lf""".stripMargin

  def q143_kaplan_meier(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q143Sql)

  /** q144: CUPED variance reduction (Deng et al., WSDM 2013) — the
    * standard experimentation adjustment: the pre-period covariate
    * (1995 revenue) absorbs between-customer variance from the
    * experiment metric (1996 revenue), θ = cov(X,Y)/var(X) from EXACT
    * integer-cent moment sums carried in DECIMAL (q39's discipline —
    * wide sums never round), adjusted mean = ȳ_arm − θ·(x̄_arm − x̄).
    * Arms assigned by custkey parity (the deterministic hash split a
    * real experiment uses, c03's recipe). One grouped pass per customer,
    * a 2-row arm aggregate joined to broadcast pooled moments — at
    * 100 TB this is one map-side-combined groupBy plus driver-scale
    * arithmetic.
    */
  private val q144Sql: String =
    """WITH cust AS (
      |  SELECT o_custkey,
      |         CAST(sum(CASE WHEN year(o_orderdate) = 1995
      |           THEN CAST(round(o_totalprice * 100) AS BIGINT)
      |           ELSE 0 END) AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN year(o_orderdate) = 1996
      |           THEN CAST(round(o_totalprice * 100) AS BIGINT)
      |           ELSE 0 END) AS BIGINT) AS y
      |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
      |  GROUP BY o_custkey),
      |ca AS (SELECT x, y, CAST(o_custkey % 2 AS INTEGER) AS arm FROM cust),
      |p AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |             CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
      |             CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
      |             CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |             CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sx2
      |      FROM ca),
      |th AS (SELECT n, sx,
      |             round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 9) AS theta
      |      FROM p),
      |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_cust,
      |             CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS asx,
      |             CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS asy
      |      FROM ca GROUP BY arm)
      |SELECT arm, n_cust,
      |       round(asy / n_cust, 9) AS mean_y_cents,
      |       round(asy / n_cust - theta * (asx / n_cust - sx / n), 9)
      |         AS mean_y_adj_cents,
      |       CAST(floor(theta * 1000000.0) AS BIGINT) AS theta_micro
      |FROM a CROSS JOIN th""".stripMargin

  def q144_cuped(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(q144Sql)

  /** q145: DIFFERENTIALLY-PRIVATE release with DETERMINISTIC Laplace
    * noise — per-nation customer counts released under an ε ladder
    * (0.1, 1.0), noise drawn via the inverse CDF
    * (−(1/ε)·sgn(u−½)·ln(1−2|u−½|)) from a per-(group, ε) LCG uniform:
    * a real deployment seeds its sampler; pinning the seed makes the
    * MECHANISM (sensitivity-1 counts, ε-scaled Laplace, half-up integer
    * rounding) fully hash-checkable cross-engine, and the released table
    * carries its own honesty column (abs_err) the ε tradeoff reads
    * directly. Noise ln's are 9dp-rounded (the transcendental
    * discipline); rounding is floor(x+½) — no half-even ambiguity. One
    * grouped count; everything after is per-released-row arithmetic.
    */
  private val q145Sql: String =
    """WITH g AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_true
      |           FROM customer GROUP BY c_nationkey),
      |e AS (SELECT CAST(100 AS BIGINT) AS eps_milli
      |      UNION ALL SELECT CAST(1000 AS BIGINT)),
      |u AS (SELECT g.c_nationkey, g.n_true, e.eps_milli,
      |             ((CAST(1103515245 AS BIGINT)
      |               * (g.c_nationkey + e.eps_milli * 131) + 12345)
      |              % 1000003) / 1000003.0 AS u
      |      FROM g CROSS JOIN e),
      |nz AS (SELECT c_nationkey, n_true, eps_milli,
      |              -(1000.0 / eps_milli) * sign(u - 0.5)
      |                * round(ln(1.0 - 2.0 * abs(u - 0.5)), 9) AS noise
      |       FROM u)
      |SELECT eps_milli, c_nationkey, n_true,
      |       n_true + CAST(floor(noise + 0.5) AS BIGINT) AS n_noisy,
      |       abs(CAST(floor(noise + 0.5) AS BIGINT)) AS abs_err
      |FROM nz""".stripMargin

  def q145_dp_release(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "customer")(q145Sql)

  /** q146: column ENCODING ADVISOR — the storage-layout ANALYZE pass
    * (q137's column-group stats are for the optimizer; this one is for
    * the writer): for each candidate string column, exact NDV, plain
    * bytes, and a dictionary-encoding estimate (distinct-value bytes +
    * n·⌈log₂ ndv⌉ bits of indices — bit width via the binary-string
    * length of ndv−1, integer-exact in both engines), with the
    * per-mille ratio and the pick. Each column costs one pruned
    * single-column scan pre-aggregated by value (map-side combine;
    * the value frame is |ndv| rows).
    */
  /** One shared text parameterized on the byte-length spelling
    * (`octet_length` / `strlen`) and integer division — values are the
    * same on the ASCII fixture but the byte semantics is the honest one.
    */
  private[graft] def q146Sql(len: String, div: String): String = {
    def one(table: String, c: String): String =
      s"""SELECT '$table' AS table_name, '$c' AS column_name,
         |       n, ndv, plain_bytes,
         |       dict_value_bytes
         |         + (n * (CASE WHEN ndv <= 1 THEN 0
         |                 ELSE length(bin(ndv - 1)) END) + 7) $div 8
         |         AS dict_bytes,
         |       ((dict_value_bytes
         |         + (n * (CASE WHEN ndv <= 1 THEN 0
         |                 ELSE length(bin(ndv - 1)) END) + 7) $div 8) * 1000)
         |         $div plain_bytes AS ratio_pm,
         |       CASE WHEN ((dict_value_bytes
         |         + (n * (CASE WHEN ndv <= 1 THEN 0
         |                 ELSE length(bin(ndv - 1)) END) + 7) $div 8) * 1000)
         |         $div plain_bytes < 500
         |         THEN 'dictionary' ELSE 'plain' END AS encoding
         |FROM (
         |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |         CAST(count(*) AS BIGINT) AS ndv,
         |         CAST(sum(cnt * $len(v)) AS BIGINT) AS plain_bytes,
         |         CAST(sum($len(v)) AS BIGINT) AS dict_value_bytes
         |  FROM (SELECT $c AS v, CAST(count(*) AS BIGINT) AS cnt
         |        FROM $table GROUP BY $c) g) t""".stripMargin
    Seq(one("lineitem", "l_returnflag"), one("lineitem", "l_linestatus"),
      one("orders", "o_orderstatus"), one("orders", "o_orderpriority"),
      one("customer", "c_mktsegment")).mkString("\nUNION ALL\n")
  }

  def q146_encoding_advisor(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem", "orders", "customer")(
      q146Sql("octet_length", "div"))

  /** q147: RUNTIME BLOOM-FILTER join pruning — Spark's automatic
    * semi-join reduction (`InjectRuntimeFilter`): when BOTH join sides
    * are too big to broadcast (the 100 TB default — modeled here by
    * disabling auto-broadcast) and the build side carries a selective
    * predicate, the optimizer plants a bloom-filter aggregate on the
    * build side and a `might_contain` filter on the probe side's SCAN,
    * so most probe rows die before the shuffle instead of after it.
    * The result is computed EAGERLY under the demo confs (checkpointed
    * 5-row output) and the confs restored, so nothing leaks into other
    * queries' plans; the spec pins might_contain really appears. The
    * oracle runs the plain join — the filter is semantically free.
    */
  def q147_bloom_join_pruning(s: SparkSession, d: String): DataFrame = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set(keys(0), "-1")
      s.conf.set(keys(1), "0")
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .localCheckpoint(true)
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }

  /** q148: INCREMENTAL zone-map maintenance
    * ([[Buckets.zoneMapOrdersWithDelta]]) — q140's layout receiving a
    * delta-file append whose stats are computed by scanning ONLY the new
    * file (committed files never re-read — the manifest-update economics
    * that keep a 100 TB layout's planning metadata current). Query path
    * identical to q140; the oracle covers base ∪ delta, so the hash gate
    * proves the incrementally-maintained stats still plan a lossless
    * read, and the pin proves the file count read grew by exactly the
    * delta file.
    */
  def q148_zone_map_append(s: SparkSession, d: String): DataFrame = {
    val (_, statsDir) = Buckets.zoneMapOrdersWithDelta(s, d)
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1995-12-31 23:59:59").cast("timestamp")
    val files = s.read.parquet(statsDir)
      .filter(col("max_date") >= lo && col("min_date") <= hi)
      .select(col("file_path"))
      .collect().map(_.getString(0)).sorted
    require(files.nonEmpty, s"zone map pruned every file under $statsDir")
    s.read.parquet(files.toIndexedSeq: _*)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  /** q149: AGGREGATE NAVIGATOR over the materialized cube
    * ([[Buckets.ordersCube]]) — two different rollup grains (by status,
    * by year) both answered by RE-AGGREGATING cube rows; the fact table
    * is never scanned (pinned: the plan's only data input is the cube
    * store). Additivity is what makes the rewrite lossless, and the
    * DuckDB oracle aggregates the RAW facts — so the hash gate proves
    * cube losslessness end-to-end, including the cents-exact revenue.
    */
  def q149_cube_reuse(s: SparkSession, d: String): DataFrame = {
    val cube = s.read.parquet(Buckets.ordersCube(s, d))
    val byStatus = cube.groupBy(col("o_orderstatus").as("grain_value"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("cents")).as("cents"))
      .withColumn("grain", lit("status"))
    val byYear = cube
      .groupBy(expr("CAST((ym - 1) div 12 AS STRING)").as("grain_value"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("cents")).as("cents"))
      .withColumn("grain", lit("year"))
    byStatus.unionByName(byYear)
      .select(col("grain"), col("grain_value"), col("n_orders"), col("cents"))
  }

  /** q150: HOLT LINEAR-TREND forecasting (double exponential smoothing,
    * α=0.5 β=0.3) over the monthly revenue series — the sequential
    * recurrence Spark cannot window (each level needs the previous
    * SMOOTHED level, not the previous observation) expressed through the
    * recursive CTE (q54's UnionLoop), one row per month, joined forward
    * against the static series. Both engines run the IDENTICAL text with
    * every step's level/trend quantized to WHOLE CENTS via floor — 9dp
    * rounding cannot quantize at 1e8-cent magnitudes (the double grid is
    * coarser than 1e-9 there, so cross-engine ulp drift compounded); cent
    * resolution stays exactly representable to 2^53, i.e. petabyte-scale
    * monthly revenue, and ~80 chained IEEE steps stay bit-aligned. Depth is the CALENDAR length — bounded at any
    * corpus size; the heavy part (monthly cents) is one grouped scan.
    * Emits the fitted path plus a 3-month-ahead linear forecast.
    */
  /** The recursion over `ser` — Spark's UnionLoop re-evaluates
    * non-recursive CTE references EVERY iteration, so the Spark path
    * materializes the ~80-row monthly series behind a localCheckpoint
    * first (46 s → ~2 s measured; 80 re-scans of the fact table
    * otherwise); DuckDB inlines the series CTE, same text otherwise.
    */
  private def q150Sql(serCte: String): String =
    s"""WITH RECURSIVE $serCte,
       |n AS (SELECT max(i) AS t FROM ser),
       |hw AS (
       |  SELECT CAST(1 AS BIGINT) AS i,
       |         CAST(s1.cents AS DOUBLE) AS lv,
       |         CAST(s2.cents - s1.cents AS DOUBLE) AS tr
       |  FROM (SELECT cents FROM ser WHERE i = 1) s1,
       |       (SELECT cents FROM ser WHERE i = 2) s2
       |  UNION ALL
       |  SELECT s.i,
       |         floor(0.5 * CAST(s.cents AS DOUBLE) + 0.5 * (h.lv + h.tr)),
       |         floor(0.3 * (floor(0.5 * CAST(s.cents AS DOUBLE)
       |                            + 0.5 * (h.lv + h.tr)) - h.lv)
       |               + 0.7 * h.tr)
       |  FROM hw h JOIN ser s ON s.i = h.i + 1)
       |SELECT i AS m_idx, CAST(lv AS BIGINT) AS level_cents,
       |       CAST(tr AS BIGINT) AS trend_cents, CAST(0 AS BIGINT) AS horizon
       |FROM hw
       |UNION ALL
       |SELECT n.t + hz.h, CAST(hl.lv + hz.h * hl.tr AS BIGINT),
       |       CAST(hl.tr AS BIGINT), CAST(hz.h AS BIGINT)
       |FROM (SELECT lv, tr FROM hw WHERE i = (SELECT t FROM n)) hl
       |CROSS JOIN n
       |CROSS JOIN (SELECT 1 AS h UNION ALL SELECT 2 UNION ALL SELECT 3) hz""".stripMargin

  private val q150SerSql: String =
    """ser AS (
      |  SELECT CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS i, cents
      |  FROM (SELECT year(o_orderdate) * 12 + month(o_orderdate) AS ym,
      |               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |                    AS BIGINT) AS cents
      |        FROM orders
      |        GROUP BY year(o_orderdate) * 12 + month(o_orderdate)) m)""".stripMargin

  def q150_holt_forecast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the monthly reduction is the distributed part; the recurrence is a
    // CALENDAR-BOUNDED scalar fold (≤ a few hundred steps at any corpus
    // size) and runs on the driver — the recursive-CTE formulation (the
    // oracle text, and q54's covered machinery) was measured at ~0.25 s
    // PER STEP on Spark's UnionLoop (one job per iteration, 21 s total):
    // the wrong altitude for 80 scalar steps
    val series = Tables.orders(s, d)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("ym"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .orderBy(col("ym")).collect().map(_.getLong(1))
    var lv = series(0).toDouble
    var tr = (series(1) - series(0)).toDouble
    val out = scala.collection.mutable.ArrayBuffer(
      (1L, lv.toLong, tr.toLong, 0L))
    for (i <- 1 until series.length) {
      val nl = math.floor(0.5 * series(i) + 0.5 * (lv + tr))
      tr = math.floor(0.3 * (nl - lv) + 0.7 * tr)
      lv = nl
      out += (((i + 1).toLong, lv.toLong, tr.toLong, 0L))
    }
    for (h <- 1L to 3L)
      out += ((series.length + h, lv.toLong + h * tr.toLong, tr.toLong, h))
    out.toSeq.toDF("m_idx", "level_cents", "trend_cents", "horizon")
  }

  /** q151's journey→transition extraction, shared verbatim by both
    * engines (param: events relation and the epoch-µs spelling). Journeys
    * are 30-min-gap sessions per user (st02's definition), truncated at
    * the first purchase (→ CONV); non-converting sessions close with an
    * explicit → NULL edge; START opens every session. All windows are
    * user/session-partitioned.
    */
  private[graft] def q151TransSql(tbl: String, us: String): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type, $us AS us FROM $tbl),
       |brks AS (
       |  SELECT user_id, event_id, event_type, us,
       |         CASE WHEN lag(us) OVER w IS NULL
       |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
       |           AS brk
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, event_type, us,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM brks),
       |idxd AS (
       |  SELECT user_id, sid, event_type,
       |         row_number() OVER (PARTITION BY user_id, sid
       |                            ORDER BY us, event_id) AS idx
       |  FROM sess),
       |fp AS (
       |  SELECT user_id, sid,
       |         min(CASE WHEN event_type = 'purchase' THEN idx END) AS pidx,
       |         max(idx) AS midx
       |  FROM idxd GROUP BY user_id, sid),
       |kept AS (
       |  SELECT x.user_id, x.sid, x.idx,
       |         CASE WHEN x.event_type = 'purchase' THEN 'CONV'
       |              ELSE x.event_type END AS st,
       |         f.pidx, f.midx
       |  FROM idxd x JOIN fp f ON f.user_id = x.user_id AND f.sid = x.sid
       |  WHERE x.idx <= coalesce(f.pidx, f.midx)),
       |tr AS (
       |  SELECT user_id, sid,
       |         coalesce(lag(st) OVER (PARTITION BY user_id, sid
       |                                ORDER BY idx), 'START') AS src,
       |         st AS dst
       |  FROM kept
       |  UNION ALL
       |  SELECT user_id, sid, st, 'NULL'
       |  FROM kept WHERE idx = midx AND pidx IS NULL)
       |SELECT src, dst, CAST(count(*) AS BIGINT) AS n
       |FROM tr GROUP BY src, dst""".stripMargin

  /** q151: MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2016) — the
    * multi-touch attribution model beyond last-touch (q59): user journeys
    * become a first-order Markov chain (START → channels → CONV/NULL),
    * and a channel's value is its REMOVAL EFFECT — how much conversion
    * probability disappears if every path through it dies. Absorption
    * probabilities come from 100 fixed value-iteration rounds; the
    * channel-count-bounded fold runs on the driver (k ≤ |event types|,
    * the q150 altitude call — the distributed work is the journey scan
    * and transition count), while the DuckDB oracle runs the SAME
    * iteration as a recursive CTE over the shared transition extraction,
    * so two independent formulations must agree bit-for-bit. Determinism
    * discipline: every product is 9dp-rounded then summed as
    * DECIMAL(18,9) (addition order-free — a raw double Σ would depend on
    * engine visit order), per-state results re-rounded at 9dp each round.
    */
  def q151_markov_attribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).createOrReplaceTempView("events_n")
    val trans = s.sql(q151TransSql("events_n", "unix_micros(ts)"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rowTot = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = trans.map { case (src, dst, n) =>
      (src, dst, n.toDouble / rowTot(src)) }
    val states = (p.map(_._1) ++ p.map(_._2))
      .filterNot(Set("CONV", "NULL").contains).distinct.sorted
    def round9(x: Double): Double =
      new java.math.BigDecimal(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def dec(x: Double) = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
    def converge(rm: String): Map[String, Double] = {
      var v = states.map(_ -> 0.0).toMap
      for (_ <- 1 to 100) {
        v = states.map { s0 =>
          if (s0 == rm) s0 -> 0.0
          else {
            val terms = p.filter(_._1 == s0).map { case (_, dst, pv) =>
              val vd = dst match {
                case "CONV" => 1.0
                case "NULL" => 0.0
                case `rm` => 0.0
                case other => v(other)
              }
              dec(round9(pv * vd))
            }
            s0 -> round9(
              terms.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue())
          }
        }.toMap
      }
      v
    }
    val base = converge("__none__")("START")
    val channels = states.filterNot(_ == "START")
    channels.toSeq.map { c =>
      val vc = converge(c)("START")
      (c, math.floor(base * 1000000.0).toLong,
        math.floor(vc * 1000000.0).toLong,
        math.floor(1000.0 * (base - vc) / base).toLong)
    }.toDF("channel", "base_conv_micro", "conv_without_micro",
      "removal_effect_pm")
  }

  /** q152: ingestion SCHEMA-DRIFT audit over semi-structured payloads —
    * the contract check an event pipeline runs before a new producer
    * version breaks consumers: per (era, key) presence rates over the
    * JSON props, keys discovered FROM THE DATA (json_object_keys /
    * json_keys — no schema declared anywhere), drift = per-mille
    * presence delta between the first and second half of the feed. The
    * payloads are derived deterministically from typed columns (the
    * fixture's props is a bare {"k": n}): clicks carry a `page`,
    * purchases an `amount`, and the feed's second half adds a `v`
    * version key — the exact producer-upgrade shape the audit exists to
    * catch (v: 0‰ → 1000‰). One scan + explode + grouped counts.
    */
  def q152_schema_drift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val n = ev.agg(count(lit(1)).as("n_ev"))
    val withEra = ev.crossJoin(broadcast(n))
      .withColumn("era", when(col("event_id") * 2 >= col("n_ev"), 1).otherwise(0))
    // per-era denominators COUNTED from the data, not derived as
    // n_ev div 2: the arithmetic shortcut silently mis-scales the
    // per-mille rates whenever event_id has gaps or is 1-based — a shared
    // (Spark+oracle) assumption the hash gate could never catch
    val eras = withEra.agg(
      sum(when(col("era") === 0, 1L).otherwise(0L)).as("d_era0"),
      sum(when(col("era") === 1, 1L).otherwise(0L)).as("d_era1"))
    withEra.crossJoin(broadcast(eras))
      .withColumn("body", expr(
        "CASE WHEN event_type = 'click' THEN" +
          " concat('{\"k\": ', CAST(event_id % 100 AS STRING)," +
          " ', \"page\": \"p', CAST(user_id % 10 AS STRING), '\"')" +
          " WHEN event_type = 'purchase' THEN" +
          " concat('{\"k\": ', CAST(event_id % 100 AS STRING)," +
          " ', \"amount\": ', CAST(CAST(round(value * 100) AS BIGINT) AS STRING))" +
          " ELSE concat('{\"k\": ', CAST(event_id % 100 AS STRING)) END"))
      .withColumn("props2", expr(
        "concat(body, CASE WHEN era = 1 THEN ', \"v\": 2}' ELSE '}' END)"))
      .select(col("era"), col("d_era0"), col("d_era1"),
        explode(expr("json_object_keys(props2)")).as("key"))
      .groupBy(col("key"))
      .agg(
        sum(when(col("era") === 0, 1L).otherwise(0L)).as("n_era0"),
        sum(when(col("era") === 1, 1L).otherwise(0L)).as("n_era1"),
        expr("(sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) * 1000)" +
          " div max(d_era0)").as("pm_era0"),
        expr("(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) * 1000)" +
          " div max(d_era1)").as("pm_era1"))
      .withColumn("drift_pm", col("pm_era1") - col("pm_era0"))
  }

  /** q153: MERGE-ON-READ — the full CRUD lifecycle over an immutable
    * base ([[Buckets.lineitemMerge]]): updates land as DV-masked old
    * rows plus re-inserted new images in a delta file, deletes as DV
    * rows alone; the reader reconstructs (base ∖ DV) ∪ delta with the
    * base parquet never rewritten (pinned). This is q141's delete path
    * and q139's append path composed into the general writer — what
    * Delta/Iceberg MERGE compiles to when copy-on-write is too
    * expensive, i.e. always at 100 TB. The oracle reconstructs the
    * post-merge table from raw lineitem with the change rules inlined,
    * so the hash gate proves the DV+delta encoding equals the logical
    * MERGE exactly.
    */
  def q153_merge_on_read(s: SparkSession, d: String): DataFrame = {
    val (dvDir, deltaDir) = Buckets.lineitemMerge(s, d)
    val dv = s.read.parquet(dvDir)
    val live = Tables.lineitem(s, d)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(dv), Seq("file_path", "row_index"), "left_anti")
      .drop("file_path", "row_index")
    val delta = s.read.parquet(deltaDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    live.unionByName(delta)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("l_quantity")).cast("long").as("qty"),
        dsum(col("l_extendedprice")).as("gross"))
  }

  /** q155: SCHEMA-EVOLUTION reader — a long-lived lake table whose
    * physical file schemas differ by epoch (Buckets.evoSnapshots: e1 is
    * the original 3-column layout, e2 the producer upgrade that added
    * `o_priority_class`/`o_channel`; old files are never rewritten). The
    * operator is Spark's `mergeSchema` footer union + null-fill, audited:
    * per epoch the census reports row count, non-null count of the added
    * column, its default-filled sum, the distinct channel count (with the
    * null bucket folded to 'missing'), and decimal-exact revenue over the
    * shared column. The DuckDB oracle re-derives the SAME logical content
    * from raw `orders`, so the hash gate proves the physical
    * evolved-schema read loses and invents nothing. Scale: footer union
    * is metadata-sized; the scan stays one pass with column pruning
    * intact — this is exactly how a 100 TB table survives column adds
    * without a rewrite.
    */
  def q155_schema_evolution(s: SparkSession, d: String): DataFrame = {
    val dir = Buckets.evoSnapshots(s, d)
    s.read.option("mergeSchema", "true").parquet(s"$dir/e1", s"$dir/e2")
      .withColumn("epoch",
        when(col("_metadata.file_path").contains("/e1/"), 1L).otherwise(2L))
      .groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_priority_class")).as("n_pc_nonnull"),
        sum(coalesce(col("o_priority_class"), lit(0))).cast("long").as("pc_sum"),
        countDistinct(coalesce(col("o_channel"), lit("missing")))
          .as("n_channels"),
        dsum(col("o_totalprice")).as("revenue"))
  }

  /** q156: FORMAT-PRESERVING PSEUDONYMIZATION — the data-sharing step that
    * replaces stable entity keys with unlinkable-but-reversible tokens
    * from the SAME domain (a 24-bit key maps to a 24-bit token, so every
    * downstream schema, join and partition strategy keeps working): a
    * 4-round Feistel network over the key's 12-bit halves with an
    * integer round function — bijective BY CONSTRUCTION on [0, 2²⁴), no
    * mapping table to store, leak or shuffle (the 100 TB argument: a
    * lookup-table pseudonymizer is a giant join; Feistel is a scan-local
    * projection). The audit proves what construction promises: per
    * nation, distinct tokens == distinct keys (injectivity) and the
    * inverse rounds recover every original key (round-trip). XOR is the
    * one dialect split (Spark `^`, DuckDB `xor()`), parameterized like
    * $DIV$. Integer-only — the full token census is hash-checked.
    */
  def q156_feistel_pseudonymize(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "customer")(
      feistelSql((a, b) => s"($a ^ $b)").replace("$DIV$", "div"))

  private def feistelF(x: String, r: Int): String =
    s"(($x * 2654435761 + $r * 40503 + 99991) % 4096)"

  private[operators] def feistelSql(xor: (String, String) => String): String = {
    def fwd(i: Int): String =
      s"""f$i AS (
         |  SELECT c_custkey, c_nationkey, r${i - 1} AS l$i,
         |         ${xor(s"l${i - 1}", feistelF(s"r${i - 1}", i))} AS r$i
         |  FROM f${i - 1})""".stripMargin
    def inv(i: Int): String =
      s"""i${i - 1} AS (
         |  SELECT c_custkey, c_nationkey, pseudo,
         |         ${xor(s"ir$i", feistelF(s"il$i", i))} AS il${i - 1},
         |         il$i AS ir${i - 1}
         |  FROM i$i)""".stripMargin
    s"""WITH f0 AS (
       |  SELECT c_custkey, c_nationkey,
       |         c_custkey $$DIV$$ 4096 AS l0, c_custkey % 4096 AS r0
       |  FROM customer),
       |${fwd(1)},
       |${fwd(2)},
       |${fwd(3)},
       |${fwd(4)},
       |i4 AS (
       |  SELECT c_custkey, c_nationkey, l4 * 4096 + r4 AS pseudo,
       |         l4 AS il4, r4 AS ir4
       |  FROM f4),
       |${inv(4)},
       |${inv(3)},
       |${inv(2)},
       |${inv(1)},
       |fin AS (
       |  SELECT c_custkey, c_nationkey, pseudo,
       |         il0 * 4096 + ir0 AS recovered
       |  FROM i0)
       |SELECT CAST(c_nationkey AS BIGINT) AS nation, count(*) AS n_customers,
       |       CAST(count(DISTINCT pseudo) AS BIGINT) AS n_distinct_pseudo,
       |       CAST(sum(CASE WHEN recovered = c_custkey THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_roundtrip_ok,
       |       CAST(min(pseudo) AS BIGINT) AS min_pseudo,
       |       CAST(max(pseudo) AS BIGINT) AS max_pseudo,
       |       CAST(sum(pseudo) AS BIGINT) AS sum_pseudo
       |FROM fin GROUP BY c_nationkey""".stripMargin
  }

  /** q157: BITMAP-INDEX set algebra — the roaring-bitmap pattern every
    * warehouse uses for multi-predicate cardinality without rescans: rows
    * chunk by `key div 63` (63-bit containers: bit 63 is the sign bit,
    * where DuckDB's checked shift overflows while Spark wraps silently —
    * staying below it keeps both engines in agreeing signed arithmetic),
    * each predicate's chunk gets a mask (`bit_or(1 << bit)`), and ANY
    * conjunction's cardinality is a
    * chunk-aligned join + `bit_count(a & b)` over the TINY bitmap table —
    * at 100 TB the masks are ~1/64th of a row id list and set algebra
    * never touches the fact table again. All three predicate bitmaps
    * build in ONE scan (conditional bit_or); the audit emits every
    * conjunction's bitmap count NEXT TO the direct scan count, so the
    * hash gate locks their equality. Dialect splits parameterized: shift
    * (Spark `shiftleft` vs DuckDB `<<`) and $DIV$.
    */
  def q157_bitmap_rollup(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      q157Sql(b => s"shiftleft(CAST(1 AS BIGINT), $b)", sparkStack = true)
        .replace("$DIV$", "div"))

  private[operators] def q157Sql(shl: String => String,
      sparkStack: Boolean = false): String =
    s"""WITH o AS (
       |  SELECT o_orderkey $$DIV$$ 63 AS chunk,
       |         CAST(o_orderkey % 63 AS INT) AS bit,
       |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pa,
       |         CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS pb,
       |         CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pc
       |  FROM orders),
       |bm AS (
       |  SELECT chunk,
       |         coalesce(bit_or(CASE WHEN pa = 1 THEN ${shl("bit")} END),
       |                  CAST(0 AS BIGINT)) AS a,
       |         coalesce(bit_or(CASE WHEN pb = 1 THEN ${shl("bit")} END),
       |                  CAST(0 AS BIGINT)) AS b,
       |         coalesce(bit_or(CASE WHEN pc = 1 THEN ${shl("bit")} END),
       |                  CAST(0 AS BIGINT)) AS c
       |  FROM o GROUP BY 1),
       |card AS (
       |  SELECT CAST(sum(bit_count(a)) AS BIGINT) AS ca,
       |         CAST(sum(bit_count(b)) AS BIGINT) AS cb,
       |         CAST(sum(bit_count(c)) AS BIGINT) AS cc,
       |         CAST(sum(bit_count(a & b)) AS BIGINT) AS cab,
       |         CAST(sum(bit_count(a & c)) AS BIGINT) AS cac,
       |         CAST(sum(bit_count(b & c)) AS BIGINT) AS cbc,
       |         CAST(sum(bit_count(a & b & c)) AS BIGINT) AS cabc,
       |         count(*) AS n_chunks
       |  FROM bm),
       |direct AS (
       |  SELECT CAST(count(*) FILTER (WHERE pa = 1) AS BIGINT) AS da,
       |         CAST(count(*) FILTER (WHERE pb = 1) AS BIGINT) AS db,
       |         CAST(count(*) FILTER (WHERE pc = 1) AS BIGINT) AS dc,
       |         CAST(count(*) FILTER (WHERE pa = 1 AND pb = 1) AS BIGINT) AS dab,
       |         CAST(count(*) FILTER (WHERE pa = 1 AND pc = 1) AS BIGINT) AS dac,
       |         CAST(count(*) FILTER (WHERE pb = 1 AND pc = 1) AS BIGINT) AS dbc,
       |         CAST(count(*) FILTER (WHERE pa = 1 AND pb = 1 AND pc = 1)
       |              AS BIGINT) AS dabc
       |  FROM o)
       |${"$TAIL$"}""".stripMargin
      .replace("$TAIL$",
        if (sparkStack)
          // Spark does not materialize CTEs: a 7-way UNION ALL would
          // re-evaluate the scans per branch (28 scans, caught by the
          // plan pin). stack() unpivots the single card x direct row in
          // one pass; DuckDB (which dedups CTEs but lacks stack) keeps
          // the UNION ALL form.
          """SELECT t.predicate, t.bitmap_count, t.direct_count, n_chunks
            |FROM (SELECT * FROM card CROSS JOIN direct) one
            |LATERAL VIEW stack(7,
            |  'A', ca, da, 'B', cb, db, 'C', cc, dc,
            |  'A&B', cab, dab, 'A&C', cac, dac, 'B&C', cbc, dbc,
            |  'A&B&C', cabc, dabc) t AS predicate, bitmap_count, direct_count
            |""".stripMargin
        else
          """SELECT 'A' AS predicate, ca AS bitmap_count, da AS direct_count,
            |       n_chunks FROM card CROSS JOIN direct
            |UNION ALL SELECT 'B', cb, db, n_chunks FROM card CROSS JOIN direct
            |UNION ALL SELECT 'C', cc, dc, n_chunks FROM card CROSS JOIN direct
            |UNION ALL SELECT 'A&B', cab, dab, n_chunks FROM card CROSS JOIN direct
            |UNION ALL SELECT 'A&C', cac, dac, n_chunks FROM card CROSS JOIN direct
            |UNION ALL SELECT 'B&C', cbc, dbc, n_chunks FROM card CROSS JOIN direct
            |UNION ALL SELECT 'A&B&C', cabc, dabc, n_chunks
            |FROM card CROSS JOIN direct""".stripMargin)

  /** q159: BITEMPORAL grid — the two time axes every audited warehouse
    * eventually needs queried TOGETHER: transaction time ("as the table
    * was KNOWN at snapshot v" — q142's axis, served from the snapshot
    * log's file lists, base files never rewritten) × valid time
    * ("effective before date V" — the business axis, a predicate on
    * o_orderdate). One row per (tx_version, valid_cutoff) cell with count
    * and decimal-exact revenue; the restatement column shows what later
    * knowledge added inside the same valid window (the "as reported vs as
    * restated" delta auditors ask for). The oracle re-derives every cell
    * from raw orders with the snapshot rule inlined (v1 = orderdate <
    * 1997), so the gate proves the physical file-list read reconstructs
    * the logical bitemporal table. Scale: each cell is a metadata-pruned
    * scan of the snapshot's files; the grid shares one pass per tx
    * version via conditional aggregation over the valid cutoffs.
    */
  def q159_bitemporal(s: SparkSession, d: String): DataFrame = {
    val dir = Buckets.ordersSnapshots(s, d)
    val cuts = Seq("1995-01-01", "1996-01-01", "1998-01-01")
    val perTx = (1 to 2).map { v =>
      val snap = Buckets.snapshotRead(s, dir, v)
      val aggs = cuts.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(col("o_orderdate") < lit(c).cast("timestamp"), 1L)
            .otherwise(0L)).as(s"n_$i"),
          sum(when(col("o_orderdate") < lit(c).cast("timestamp"),
            col("o_totalprice").cast(dec)).otherwise(lit(0).cast(dec)))
            .cast("double").as(s"rev_$i"))
      }
      snap.agg(aggs.head, aggs.tail: _*)
        .select(lit(v.toLong).as("tx_version") +: cuts.indices.flatMap(i =>
          Seq(col(s"n_$i"), col(s"rev_$i"))): _*)
    }
    val wide = perTx.reduce(_ unionByName _)
    val rows = cuts.zipWithIndex.map { case (c, i) =>
      wide.select(col("tx_version"), lit(c).as("valid_before"),
        col(s"n_$i").as("n_orders"), col(s"rev_$i").as("revenue"))
    }
    val grid = rows.reduce(_ unionByName _)
    val asReported = grid.where(col("tx_version") === 1L)
      .select(col("valid_before"), col("n_orders").as("n_tx1"))
    grid.join(broadcast(asReported), "valid_before")
      .select(col("tx_version"), col("valid_before"), col("n_orders"),
        col("revenue"), (col("n_orders") - col("n_tx1")).as("n_restated"))
  }

  /** q160: SORT-KEY ADVISOR — the layout decision q91 (Z-order) and q140
    * (zone maps) both presuppose: WHICH column should the table be sorted
    * by? For each candidate sort key the advisor simulates the layout
    * (rows ranked by the key, packed into 64 balanced files), computes
    * each file's min/max zone for every predicate column, and replays a
    * 5-predicate workload counting the files a zone-map reader would
    * SKIP — the measured skipping matrix a 100 TB table owner reads
    * before paying for a rewrite (clustering helps its own key's
    * predicates and does nothing for the others; the matrix shows both).
    * Ranks come from the c28 two-phase prefix scan per candidate (never a
    * global-sort reducer); file stats are one grouped agg per layout; the
    * workload replay is arithmetic over 64×3 stat rows. All-integer
    * (epoch days / cents), hash-checked.
    */
  def q160_sortkey_advisor(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = Tables.orders(s, d).select(
      col("o_orderkey"),
      expr("CAST(datediff(to_date(o_orderdate), DATE '1970-01-01') AS BIGINT)")
        .as("day"),
      col("o_custkey").cast("long").as("ck"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val keys = Seq("day", "ck", "cents")
    // predicate workload: (name, column, lo, hi) half-open ranges
    val preds = Seq(
      ("date_1995q2", "day", 9190L, 9282L),     // [1995-03-01, 1995-06-01)
      ("date_1996h1", "day", 9496L, 9678L),     // [1996-01-01, 1996-07-01)
      ("cust_100_200", "ck", 100L, 200L),
      ("price_300k", "cents", 30000000L, Long.MaxValue),
      ("date_1997on", "day", 9862L, Long.MaxValue))
    val perKey = keys.map { k =>
      val ranked = rows
        .repartitionByRange(32, col(k), col("o_orderkey"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val sub = ranked.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = sub.map(_._2).sum
      val offDf = broadcast(s.createDataFrame(
        sub.map(_._1).zip(sub.map(_._2).scanLeft(0L)(_ + _)).toSeq)
        .toDF("pid", "off"))
      val w = Window.partitionBy(col("pid")).orderBy(col(k), col("o_orderkey"))
      val stats = ranked.join(offDf, "pid")
        .withColumn("rank", col("off") + row_number().over(w))
        .withColumn("file", expr(s"((rank - 1) * 64) div ${n}L"))
        .groupBy(col("file"))
        .agg(min(col("day")).as("min_day"), max(col("day")).as("max_day"),
          min(col("ck")).as("min_ck"), max(col("ck")).as("max_ck"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      // ONE aggregate computes every predicate's skip count, then explodes
      // to the per-predicate rows — the previous per-predicate `stats.agg`
      // re-executed the whole ranked->window->min/max subtree once per
      // predicate (5x per key, 15x per query; measured 5.2 s at sf0.1)
      val aggCols = count(lit(1)).as("n_files") +: preds.map {
        case (pn, pc, lo, hi) =>
          sum(when(col(s"max_$pc") < lo || col(s"min_$pc") >= hi, 1L)
            .otherwise(0L)).as(s"sk_$pn")
      }
      val rowsStructs = preds.map { case (pn, _, _, _) =>
        struct(lit(pn).as("predicate"), col("n_files"),
          col(s"sk_$pn").as("n_skipped"))
      }
      stats.agg(aggCols.head, aggCols.tail: _*)
        .select(explode(array(rowsStructs: _*)).as("r"))
        .select(lit(k).as("sort_key"), col("r.predicate"),
          col("r.n_files"), col("r.n_skipped"))
    }
    perKey.reduce(_ unionByName _)
  }

  /** q160's DuckDB twin, assembled from the same key/predicate tables the
    * Spark side uses (plain window ranks stand in for the two-phase scan —
    * identical positions by construction).
    */
  private lazy val q160Oracle: String = {
    val keys = Seq("day", "ck", "cents")
    val preds = Seq(
      ("date_1995q2", "day", 9190L, 9282L),
      ("date_1996h1", "day", 9496L, 9678L),
      ("cust_100_200", "ck", 100L, 200L),
      ("price_300k", "cents", 30000000L, Long.MaxValue),
      ("date_1997on", "day", 9862L, Long.MaxValue))
    val fileCtes = keys.map { k =>
      s"""files_$k AS (
         |  SELECT ((rank - 1) * 64) // nn.n AS file,
         |         min(day) AS min_day, max(day) AS max_day,
         |         min(ck) AS min_ck, max(ck) AS max_ck,
         |         min(cents) AS min_cents, max(cents) AS max_cents
         |  FROM (SELECT *, row_number() OVER (ORDER BY $k, o_orderkey) AS rank
         |        FROM rows_) t CROSS JOIN nn
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = keys.flatMap(k => preds.map { case (pn, pc, lo, hi) =>
      s"""SELECT '$k' AS sort_key, '$pn' AS predicate, count(*) AS n_files,
         |       CAST(sum(CASE WHEN max_$pc < $lo OR min_$pc >= $hi
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped
         |FROM files_$k""".stripMargin
    }).mkString("\nUNION ALL ")
    s"""WITH rows_ AS (
       |  SELECT o_orderkey,
       |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
       |           AS day,
       |         CAST(o_custkey AS BIGINT) AS ck,
       |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |nn AS (SELECT count(*) AS n FROM rows_),
       |$fileCtes
       |$selects""".stripMargin
  }

  /** q161: TWO-PASS exact median — how exact order statistics are actually
    * computed at 100 TB, where q40's sort-based median is unaffordable:
    * pass 1 histograms values into width-bounded buckets (one map-side
    * combinable aggregate; the histogram is ~160 rows, driver-safe), the
    * cumulative walk finds the bucket containing the k-th value and its
    * within-bucket rank r*, and pass 2 ranks ONLY that bucket's rows —
    * the sorted set shrinks from n to one bucket's width before any
    * ordering happens (at larger scale the same step recurses; one level
    * suffices here and the bucket-row count is emitted as evidence of the
    * pruning). Emitted median is the exact lower median of the cent
    * values, which the spec cross-checks against a driver-side full sort
    * at sf0.001; the within-bucket window is bucket-bounded by
    * construction, never data-sized.
    */
  def q161_twopass_median(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables.lineitem(s, d)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("id"))
    val hist = v.groupBy(expr("cents div 65536").as("bucket"))
      .agg(count(lit(1)).as("bn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    val k = (n + 1) / 2
    val (bStar, before) = hist.scanLeft((0L, 0L)) { case ((_, cum), (b, bn)) =>
      (b, cum + bn)
    }.tail.zip(hist).collectFirst {
      case ((b, cum), (_, bn)) if cum >= k => (b, cum - bn)
    }.get
    val rStar = k - before
    val wb = Window.orderBy(col("cents"), col("id"))
    val inBucket = v.where(expr(s"cents div 65536") === bStar)
    val median = inBucket
      .withColumn("rn", row_number().over(wb).cast("long"))
      .where(col("rn") === rStar)
      .select(col("cents").as("median_cents"))
    median.crossJoin(broadcast(inBucket.agg(count(lit(1)).as("n_bucket_rows"))))
      .select(lit(n).as("n"), lit(k).as("k"), col("median_cents"),
        col("n_bucket_rows"))
  }

  /** q162: FOREIGN-KEY inference — the data-catalog profiling pass that
    * proposes join keys on an undocumented lake: for each candidate
    * (child.column → parent.key) pair, measure distinct counts, orphan
    * count (child values missing from the parent — one anti-join, the
    * q115 RI machinery generalized to DISCOVERY), and the containment
    * per-mille; verdict `fk` requires total containment AND the parent
    * key being unique. The candidate list mixes the schema's real FKs
    * with decoys (value-overlapping but non-FK pairs like
    * orders.custkey → supplier.suppkey) so the verdict column actually
    * discriminates — spec-pinned. Each pair costs two distinct-aggs and
    * one anti-join on pruned single-column scans; pairs are independent
    * (a catalog crawler fans them out).
    */
  def q162_fk_inference(s: SparkSession, d: String): DataFrame = {
    val pairs = Seq(
      ("orders.o_custkey", "customer.c_custkey"),
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"),
      ("customer.c_nationkey", "nation.n_nationkey"),
      ("orders.o_custkey", "supplier.s_suppkey"), // decoy: overlaps, not FK
      ("orders.o_orderkey", "lineitem.l_orderkey")) // decoy: parent not unique
    def column(ref: String) = {
      val Array(t, c) = ref.split("\\.")
      Tables.table(s, d, t).select(col(c).as("v"))
    }
    pairs.map { case (childRef, parentRef) =>
      val child = column(childRef)
      val parent = column(parentRef)
      val stats = child.agg(count(lit(1)).as("n_child"),
        countDistinct(col("v")).as("ndv_child"))
      val pstats = parent.agg(count(lit(1)).as("n_parent"),
        countDistinct(col("v")).as("ndv_parent"))
      val orphans = child.distinct()
        .join(parent.distinct(), Seq("v"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_values"))
      stats.crossJoin(broadcast(pstats)).crossJoin(broadcast(orphans))
        .select(lit(childRef).as("child"), lit(parentRef).as("parent"),
          col("ndv_child"), col("ndv_parent"), col("n_orphan_values"),
          expr("(ndv_child - n_orphan_values) * 1000 div ndv_child")
            .as("containment_pm"),
          expr("CASE WHEN n_orphan_values = 0 AND ndv_parent = n_parent " +
            "THEN 'fk' ELSE 'no' END").as("verdict"))
    }.reduce(_ unionByName _)
  }

  /** q163: SESSION STITCHING across batch boundaries — the bug every daily
    * batch pipeline ships at least once: sessionizing each day's partition
    * independently SPLITS any session that spans midnight. The repair is
    * two-level sessionization: within-day sessions first (exactly what the
    * daily job computed), then the SAME 30-minute gap rule re-run over the
    * per-user session SUMMARIES ordered by start time — which stitches
    * chains across any number of midnights in ONE window pass, no
    * iteration (between consecutive summaries the only possible gap is
    * the boundary gap; within-day correctness is inherited). Output is
    * q74's exact schema and the twin runs under q74's OWN oracle — the
    * hash gate proves stitched == global sessionization, the equality
    * the daily pipeline needs certified. Scale: the second pass runs
    * over session summaries (orders of magnitude smaller than events),
    * same (user_id, time) key family as the first.
    */
  def q163_session_stitch(s: SparkSession, d: String): DataFrame = {
    val wD = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("us"), col("event_id"))
    val runD = wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        to_date(col("ts")).as("day"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(wD).isNull ||
          col("us") - lag(col("us"), 1).over(wD) > 1800000000L, 1L).otherwise(0L))
      .withColumn("day_sess", sum(col("new_s")).over(runD))
      .groupBy(col("user_id"), col("day"), col("day_sess"))
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("first_us"),
        max(col("us")).as("last_us"))
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("first_us"), col("last_us"))
    val runU = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("stitch",
        when(lag(col("last_us"), 1).over(wU).isNull ||
          col("first_us") - lag(col("last_us"), 1).over(wU) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("stitch")).over(runU))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sum(col("n_events")).as("n_events"),
        date_format(timestamp_micros(min(col("first_us"))),
          "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(timestamp_micros(max(col("last_us"))),
          "yyyy-MM-dd HH:mm:ss").as("session_end"),
        expr("(max(last_us) - min(first_us)) div 1000000").as("duration_s"))
  }

  /** q164: SEMI-ADDITIVE rollup — the measure class (balances, inventory,
    * head-counts) that sums ACROSS entities but NOT across time: each
    * user's balance is the running sum of their event values, a period's
    * figure is each user's LAST balance in the period (max_by over the
    * in-period events — never a sum over time), and only then do balances
    * add across users. Getting this wrong (summing balances over time) is
    * the classic BI bug; the operator spells the correct two-level
    * aggregation: one (user, time) window for the running balance, one
    * max_by per (user, week), one sum per week. Cents-integer arithmetic;
    * weeks are epoch-day div 7 (the q158 portable bucket).
    */
  def q164_semi_additive(s: SparkSession, d: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT) div 7")
          .as("week"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("balance", sum(col("cents")).over(run))
      .groupBy(col("user_id"), col("week"))
      .agg(expr("max_by(balance, struct(us, event_id))").as("closing_balance"),
        count(lit(1)).as("n_events"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("closing_balance")).as("total_closing_cents"),
        sum(col("n_events")).as("n_events"))
  }

  /** q165: JOIN-CARDINALITY estimator audit — the CBO diagnostic: for each
    * equi-join the optimizer's textbook estimate |A|·|B| / max(ndv_A,
    * ndv_B) (containment + uniformity assumptions) is computed from
    * single-column statistics and placed NEXT TO the true join size, with
    * the signed error in per-mille — the table that tells an operator
    * which joins the planner will mis-size (row estimates drive
    * broadcast-vs-shuffle and AQE skew decisions, so a bad estimate here
    * is a bad plan there). Three joins of different character: two clean
    * FKs (estimate ≈ exact) and the many-to-many co-order pair where
    * uniformity breaks. Stats are one agg per side; actuals are keyed
    * join counts.
    */
  def q165_join_estimate(s: SparkSession, d: String): DataFrame = {
    val joins = Seq(
      ("orders*customer", Tables.orders(s, d).select(col("o_custkey").as("k")),
        Tables.customer(s, d).select(col("c_custkey").as("k"))),
      ("lineitem*orders", Tables.lineitem(s, d).select(col("l_orderkey").as("k")),
        Tables.orders(s, d).select(col("o_orderkey").as("k"))),
      ("lineitem*lineitem_supp",
        Tables.lineitem(s, d).select(col("l_suppkey").as("k")),
        Tables.lineitem(s, d).select(col("l_suppkey").as("k"))))
    joins.map { case (name, a, b) =>
      val sa = a.agg(count(lit(1)).as("na"), countDistinct(col("k")).as("da"))
      val sb = b.agg(count(lit(1)).as("nb"), countDistinct(col("k")).as("db"))
      // the audit must not PAY the join it predicts: the exact join
      // cardinality is the per-key histogram product-sum, computed from
      // two grouped counts and a tiny keyed join — never the (possibly
      // quadratic) join itself
      val actual = a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(col("k")).agg(count(lit(1)).as("cb")), "k")
        .agg(sum(col("ca") * col("cb")).as("actual"))
      sa.crossJoin(broadcast(sb)).crossJoin(broadcast(actual))
        .select(lit(name).as("join_pair"), col("na"), col("nb"),
          expr("greatest(da, db)").as("ndv_max"),
          expr("na * nb div greatest(da, db)").as("estimate"),
          col("actual"),
          expr("CASE WHEN na * nb div greatest(da, db) >= actual " +
            "THEN (na * nb div greatest(da, db) - actual) * 1000 div actual " +
            "ELSE -((actual - na * nb div greatest(da, db)) * 1000 div actual) " +
            "END").as("err_pm"))
    }.reduce(_ unionByName _)
  }

  /** q166: DATA-SUBJECT ACCESS report (GDPR art. 15 / CCPA) — the
    * governance fan-out q141/st19's deletion path presupposes: for each
    * requesting subject, every table holding their data reports how many
    * rows, over what time span, and with what monetary footprint — the
    * per-table manifest a DSAR response is assembled from (and the
    * work-list a deletion request becomes). Subjects are keyed by
    * customer key; the event identity rides user_id = custkey mod the
    * active-user range (the fixture's implicit linkage, stated, not
    * assumed — the spec cross-checks each census against direct filters).
    * One pruned scan per (subject set × table); tables are independent —
    * a DSAR service fans them out.
    */
  /** q167: ROW-LEVEL SQL against the sheets connector — real `MERGE INTO`
    * and `DELETE FROM` statements compiled by Catalyst against the DSv2
    * sink through [[graft.sources.sheets.SheetsCatalog]] +
    * `SupportsRowLevelOperations` (round-7 verdict item 6; until now the
    * sink exposed only whole-sheet upsert, faithful to `loader.py:159-179`,
    * and q53/q153 only EMULATED merge relationally). Lifecycle under test:
    * publish the pre-1997 per-priority revenue report as a sheet, MERGE
    * the 1997+ delta into it (matched rows add counts/cents, unmatched
    * insert), DELETE the unspecified-priority row, read the sheet back.
    * The DuckDB oracle recomputes the final state from RAW orders in one
    * aggregate — so the hash gate proves base-publish + MERGE + DELETE
    * over the CSV store equals the logical recompute, cents-exact through
    * the all-string sheet round-trip. Execution is a group-based rewrite
    * where the group is the whole sheet — the honest granularity for a
    * 2M-cell-bounded store (the unbounded-table analogue is q153's
    * merge-on-read). The catalog name is keyed by the warehouse dir, so
    * sessions touching several SFs never serve a stale catalog instance
    * (Spark caches catalogs by name after first lookup).
    */
  def q167_sheet_merge_sql(s: SparkSession, d: String): DataFrame = {
    val wh = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sheets_merge_${Math.abs(d.hashCode)}").toString
    val cat = s"sheets_${Math.abs(d.hashCode)}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.sheets.SheetsCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.path", wh)
    val cents = expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    // base publish: the pre-1997 report, rebuilt every run for idempotence
    Tables.orders(s, d).filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("cents"))
      .write.format("sheets").option("path", wh).option("name", "q167_target")
      .mode("overwrite").save()
    Tables.orders(s, d).filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("cents"))
      .createOrReplaceTempView("q167_delta")
    s.sql(
      s"""MERGE INTO $cat.q167_target t USING q167_delta s
         |ON t.priority = s.priority
         |WHEN MATCHED THEN UPDATE SET
         |  n_orders = CAST(CAST(t.n_orders AS BIGINT) + s.n_orders AS STRING),
         |  cents = CAST(CAST(t.cents AS BIGINT) + s.cents AS STRING)
         |WHEN NOT MATCHED THEN INSERT (priority, n_orders, cents)
         |  VALUES (s.priority, CAST(s.n_orders AS STRING),
         |          CAST(s.cents AS STRING))""".stripMargin)
    s.sql(s"DELETE FROM $cat.q167_target WHERE priority = '4-NOT SPECIFIED'")
    s.read.format("sheets").option("path", wh).option("name", "q167_target").load()
      .select(col("priority"), col("n_orders").cast("long").as("n_orders"),
        col("cents").cast("long").as("cents"))
  }

  def q166_subject_access(s: SparkSession, d: String): DataFrame = {
    val subjects = Seq(3L, 7L, 11L)
    val subjDf = broadcast(s.createDataFrame(
      subjects.map(Tuple1(_))).toDF("subject"))
    val fromOrders = Tables.orders(s, d)
      .join(subjDf, col("o_custkey") === col("subject"))
      .groupBy(col("subject"))
      .agg(count(lit(1)).as("n_rows"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_seen"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_seen"),
        dsum(col("o_totalprice")).as("monetary"))
      .withColumn("table_name", lit("orders"))
    val fromEvents = Tables.events(s, d)
      .join(subjDf, col("user_id") === col("subject"))
      .groupBy(col("subject"))
      .agg(count(lit(1)).as("n_rows"),
        date_format(min(col("ts")), "yyyy-MM-dd").as("first_seen"),
        date_format(max(col("ts")), "yyyy-MM-dd").as("last_seen"),
        dsum(col("value")).as("monetary"))
      .withColumn("table_name", lit("events"))
    val fromCustomer = Tables.customer(s, d)
      .join(subjDf, col("c_custkey") === col("subject"))
      .groupBy(col("subject"))
      .agg(count(lit(1)).as("n_rows"),
        lit(null).cast("string").as("first_seen"),
        lit(null).cast("string").as("last_seen"),
        dsum(col("c_acctbal")).as("monetary"))
      .withColumn("table_name", lit("customer"))
    fromOrders.unionByName(fromEvents).unionByName(fromCustomer)
      .select(col("subject"), col("table_name"), col("n_rows"),
        col("first_seen"), col("last_seen"), col("monetary"))
  }

  /** q158: EXACT distinct-count rollup via MERGEABLE BITMAPS — what q65's
    * HLL does approximately, done exactly: per (day, chunk) the user set
    * is a 63-bit mask (q157's containers), and ANY coarser period's
    * distinct count is `bit_or` over its days then `bit_count` — set
    * union as integer OR, which (unlike COUNT DISTINCT) is partially
    * aggregable and mergeable, so a month's exact distinct never rescans
    * events, only |days × chunks| tiny masks. The audit emits the
    * bitmap-merged count NEXT TO the direct per-month COUNT DISTINCT —
    * hash-locked equal. This is the production pattern for exact DAU/MAU
    * rollups at 100 TB (HLL when ±2% is fine, bitmaps when finance wants
    * exact).
    */
  def q158_bitmap_distinct(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    bitmapFinalize(bitmapDayMasks(ev), ev)
  }

  /** Per-(period, day, chunk) 63-bit user masks — the mergeable partial
    * st21 folds across micro-batches (bit_or is idempotent, so replays
    * need no ledger).
    */
  private[graft] def bitmapDayMasks(ev: DataFrame): DataFrame =
    ev.select(
      expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT) div 7")
        .as("period"),
      to_date(col("ts")).as("day"),
      expr("user_id div 63").as("chunk"),
      expr("CAST(user_id % 63 AS INT)").as("bit"))
      .groupBy(col("period"), col("day"), col("chunk"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("mask"))

  /** Merge day masks to periods and audit against direct COUNT DISTINCT
    * over the same events.
    */
  private[graft] def bitmapFinalize(daily: DataFrame, ev: DataFrame)
      : DataFrame = {
    val rolled = daily
      .groupBy(col("period"), col("chunk"))
      .agg(expr("bit_or(mask)").as("mask"), count(lit(1)).as("n_day_masks"))
      .groupBy(col("period"))
      .agg(expr("CAST(sum(bit_count(mask)) AS BIGINT)").as("distinct_bitmap"),
        sum(col("n_day_masks")).as("n_masks_merged"))
    val direct = ev.select(
      expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT) div 7")
        .as("period"), col("user_id"))
      .groupBy(col("period"))
      .agg(countDistinct(col("user_id")).as("distinct_direct"))
    rolled.join(direct, "period")
      .select(col("period"), col("distinct_bitmap"), col("distinct_direct"),
        col("n_masks_merged"))
  }

  private[operators] def q158Sql(shl: String => String, month: String,
      day: String, table: String): String =
    s"""WITH e AS (
       |  SELECT $month AS period, $day AS day,
       |         user_id $$DIV$$ 63 AS chunk, CAST(user_id % 63 AS INT) AS bit
       |  FROM $table),
       |daily AS (
       |  SELECT period, day, chunk,
       |         bit_or(${shl("bit")}) AS mask
       |  FROM e GROUP BY 1, 2, 3),
       |merged AS (
       |  SELECT period, chunk, bit_or(mask) AS mask, count(*) AS n_day_masks
       |  FROM daily GROUP BY 1, 2),
       |rolled AS (
       |  SELECT period, CAST(sum(bit_count(mask)) AS BIGINT) AS distinct_bitmap,
       |         CAST(sum(n_day_masks) AS BIGINT) AS n_masks_merged
       |  FROM merged GROUP BY 1),
       |direct AS (
       |  SELECT period, CAST(count(DISTINCT user_id) AS BIGINT)
       |           AS distinct_direct
       |  FROM (SELECT $month AS period, user_id FROM $table) GROUP BY 1)
       |SELECT r.period, r.distinct_bitmap, dd.distinct_direct, r.n_masks_merged
       |FROM rolled r JOIN direct dd ON dd.period = r.period""".stripMargin

  /** q154: POISSON BOOTSTRAP confidence interval — the one bootstrap that
    * works at 100 TB. The classical bootstrap resamples n rows WITH
    * replacement per replicate (R full shuffles of a 100 TB table: dead on
    * arrival); the Poisson bootstrap (the standard large-scale substitute —
    * multinomial(n, 1/n) counts factorize into independent Poisson(1)
    * weights as n → ∞) gives every row an i.i.d. Poisson(1) weight per
    * replicate, so ALL R replicates ride ONE scan: each row emits R
    * weighted contributions via a constant-folded `sequence(1, R)`
    * generator and map-side partial aggregation collapses them to R rows
    * per partition before the only shuffle (R × partitions tiny rows).
    *
    * Determinism across engines: the weight is Poisson(1) by inverse-CDF
    * over a MINSTD-scrambled LCG of (row id, replicate) — pure int64
    * arithmetic with the CDF embedded as ⌊P(X≤k)·(2³¹−1)⌋ literals, the
    * s02/s20 embedded-plane discipline — and the per-replicate mean is a
    * floor division of exact cent-integers, so Spark and DuckDB are
    * bit-equal. CI = nearest-rank 2.5/97.5 percentiles over the R=100
    * replicate means (rank window over 100 rows — R-bounded, never
    * data-sized).
    */
  def q154_bootstrap_ci(s: SparkSession, d: String): DataFrame =
    bootstrapFinalize(bootstrapPartials(Tables.lineitem(s, d)))

  /** Per-replicate Poisson partial sums (rep, wsum, nw) for a lineitem
    * slice. ADDITIVE by construction — partials over any row partition of
    * the table merge by plain per-rep sums, which is what st20 exploits
    * to maintain the CI over a stream.
    */
  private[graft] def bootstrapPartials(lineitem: DataFrame): DataFrame =
    lineitem
      .select((col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("id"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .withColumn("rep0", explode(sequence(lit(1), lit(100))))
      .withColumn("rep", col("rep0").cast("long")).drop("rep0")
      .withColumn("u", expr(
        // id is pre-modded BEFORE the Knuth multiply (the q52 discipline at
        // :951): at TPC-H sf>=60 the raw id*2654435761 product passes 2^63,
        // where Spark wraps to a negative u (poissonW would map it to 0,
        // silently corrupting the bootstrap) while DuckDB raises — pre-mod
        // keeps the product <= 1000002*2654435761 ~ 2.7e15 at ANY scale
        "(((id % 1000003L) * 2654435761L + rep * 40503L + 12345L) % 2147483648L) * 48271L % 2147483647L"))
      .withColumn("w", expr(poissonW("u")))
      .groupBy(col("rep"))
      .agg(sum(col("w") * col("cents")).as("wsum"), sum(col("w")).as("nw"))

  /** Rank + nearest-rank CI over the R=100 merged partials (R-bounded). */
  private[graft] def bootstrapFinalize(partials: DataFrame): DataFrame = {
    val ranked = partials
      .withColumn("rep_mean_milli_cents",
        expr("wsum * 1000L div greatest(nw, 1L)"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rep_mean_milli_cents"), col("rep"))).cast("long"))
      .select(col("rep"), col("nw"), col("rep_mean_milli_cents"), col("rnk"))
    val ci = ranked.agg(
      min(when(col("rnk") === 3, col("rep_mean_milli_cents"))).as("ci_lo_milli_cents"),
      min(when(col("rnk") === 98, col("rep_mean_milli_cents"))).as("ci_hi_milli_cents"))
    ranked.crossJoin(broadcast(ci))
  }

  /** Poisson(1) inverse CDF over a 31-bit uniform `u` — thresholds are
    * ⌊P(X≤k)·2147483647⌋, k = 0..8, tail capped at 9 (P > 1−1e−6). The
    * identical literal text runs in the DuckDB twin.
    */
  private def poissonW(u: String): String =
    s"""CAST(CASE WHEN $u < 790015083 THEN 0 WHEN $u < 1580030167 THEN 1
       |          WHEN $u < 1975037709 THEN 2 WHEN $u < 2106706890 THEN 3
       |          WHEN $u < 2139624185 THEN 4 WHEN $u < 2146207644 THEN 5
       |          WHEN $u < 2147304887 THEN 6 WHEN $u < 2147461637 THEN 7
       |          WHEN $u < 2147481230 THEN 8 ELSE 9 END AS BIGINT)""".stripMargin

  /** Shared q168 template — the one splice point is the epoch-seconds
    * spelling (Spark `unix_seconds`, DuckDB `CAST(epoch() AS BIGINT)`);
    * everything else (row numbering, islands grouping, named window,
    * run-leading value via the portable krn = 1 reduction) is common SQL.
    */
  /** The match pass over a `runs(user_id, event_type, srn, len, t0, t1,
    * v0)` CTE — shared verbatim by q168 (runs from one global numbering)
    * and st22 (runs stitched across micro-batches), which is what makes
    * st22's fold-invariance gate meaningful: same detector, different
    * run construction.
    */
  private[operators] def q168MatchTail(epoch: String => String): String =
    s"""seq AS (
       |  SELECT user_id, event_type, srn, len, t0, t1, v0,
       |         lead(event_type, 1) OVER w AS ty1,
       |         lead(event_type, 2) OVER w AS ty2,
       |         lead(len, 1) OVER w AS c_len,
       |         lead(t1, 1) OVER w AS c_t1,
       |         lead(t0, 2) OVER w AS p_t0,
       |         lead(v0, 2) OVER w AS p_v0
       |  FROM runs
       |  WINDOW w AS (PARTITION BY user_id ORDER BY srn)),
       |m AS (
       |  SELECT user_id, srn, ${epoch("t1")} AS view_epoch,
       |         c_len AS n_clicks, ${epoch("c_t1")} AS last_click_epoch,
       |         ${epoch("p_t0")} AS purchase_epoch, p_v0 AS purchase_value
       |  FROM seq
       |  WHERE event_type = 'view' AND ty1 = 'click' AND ty2 = 'purchase')
       |SELECT user_id,
       |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY srn)
       |            AS BIGINT) AS match_no,
       |       view_epoch, n_clicks, last_click_epoch, purchase_epoch,
       |       purchase_value
       |FROM m""".stripMargin

  /** The shared e→r→runs prefix of q168/q170: global per-user numbering,
    * gaps-and-islands run keys, and run compaction. The run-leading value
    * (`v0`) is reduced with the PORTABLE `max(CASE WHEN krn = 1 THEN
    * value END)` spelling, NOT `min_by(value, rn)`: the engines' min_by /
    * arg_min diverge on NULL arguments (Spark returns the NULL value at
    * min rn; DuckDB skips NULL arguments and returns the next non-null),
    * so a NULL value on a run-leading event would silently split the hash
    * gate. `krn` is unique within a run (rn is unique), so the CASE
    * reduces over exactly one possibly-NULL value on BOTH engines.
    */
  private[operators] def q168RunsPrefix: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, ts, value,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY ts, event_id) AS rn
       |  FROM events),
       |r AS (
       |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type
       |                                    ORDER BY rn) AS grp
       |  FROM e),
       |r1 AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, grp
       |                               ORDER BY rn) AS krn
       |  FROM r),
       |runs AS (
       |  SELECT user_id, event_type, grp, min(rn) AS srn,
       |         CAST(count(*) AS BIGINT) AS len,
       |         min(ts) AS t0, max(ts) AS t1,
       |         max(CASE WHEN krn = 1 THEN value END) AS v0
       |  FROM r1 GROUP BY 1, 2, 3),""".stripMargin

  private[operators] def q168Sql(epoch: String => String): String =
    s"""$q168RunsPrefix
       |${q168MatchTail(epoch)}""".stripMargin

  /** q168: ROW-PATTERN RECOGNITION — SQL:2016 MATCH_RECOGNIZE semantics
    * for `PATTERN (V C+ P)` / `AFTER MATCH SKIP PAST LAST ROW` over the
    * per-user event stream (a view immediately followed by one-or-more
    * clicks then a purchase, no intervening events — stricter than q57's
    * time-bounded eventually-funnel). Spark has no MATCH_RECOGNIZE
    * operator; the distributed spelling is gaps-and-islands run-length
    * encoding: rn minus per-type rn keys maximal same-type runs, one
    * grouped aggregate compacts rows to runs, and a single lead() window
    * over runs tests the contiguous V→C+→P adjacency — only the LAST view
    * of a view-run can head a match (an earlier view's successor is a
    * view, failing C+), exactly the greedy-skip semantics. Every window
    * and the aggregate are partitioned by user_id, so the whole plan is
    * ONE shuffle of the events scan followed by per-user-local work —
    * runs compaction shrinks the window input before lead() touches it,
    * which is what makes the pattern pass viable on a 100 TB event log.
    * Measures: per-match view/last-click/first-purchase epochs, click run
    * length, and the matched purchase's value (the run-leading value via
    * the portable krn = 1 reduction, deterministic under timestamp ties).
    */
  def q168_match_recognize(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events")
    s.sql(q168Sql(t => s"unix_seconds($t)"))
  }

  /** Shared q170 template — q168's runs table driven through a pattern
    * with ALTERNATION and an OPTIONAL quantifier:
    * `PATTERN (V (C|E)+ P?)` / `AFTER MATCH SKIP PAST LAST ROW` — a view
    * followed by one-or-more clicks-OR-errors (any interleaving), then
    * optionally a purchase. The `(C|E)+` body is a second gaps-and-islands
    * pass OVER RUNS: runs whose type is click/error flag `mid`, and
    * consecutive mid-runs group into maximal STRETCHES (rrn minus a
    * per-(user, mid) row_number) — maximal-munch is the unique greedy
    * parse because P never matches click/error, so the quantifier's
    * extent is not a choice point. The head (V) and tail (P?) runs attach
    * via lag/lead carried on each mid run and conditional aggregation
    * over the stretch's first/last run — NOT min_by/max_by, whose
    * null-argument semantics differ across engines; `max(CASE WHEN
    * is_first THEN prev_x END)` reduces over exactly one possibly-null
    * value and is portable. MEASURES: run count, per-type row counts,
    * whether the optional purchase matched, its value, and the match
    * duration in seconds. Same plan economics as q168: every window and
    * the two aggregates key on user_id first, so the whole pattern pass
    * is ONE exchange of the events scan (PlanInvariantsSpec pins it).
    */
  private[operators] def q170Sql(epoch: String => String): String =
    s"""$q168RunsPrefix
       |rr AS (
       |  SELECT user_id, event_type, srn, len, t0, t1, v0,
       |         CAST(row_number() OVER w AS BIGINT) AS rrn,
       |         lag(event_type) OVER w AS prev_type,
       |         lag(t1) OVER w AS prev_t1,
       |         lead(event_type) OVER w AS next_type,
       |         lead(t0) OVER w AS next_t0,
       |         lead(v0) OVER w AS next_v0,
       |         CASE WHEN event_type IN ('click', 'error')
       |              THEN 1 ELSE 0 END AS mid
       |  FROM runs
       |  WINDOW w AS (PARTITION BY user_id ORDER BY srn)),
       |isl AS (
       |  SELECT *,
       |         rrn - row_number() OVER (PARTITION BY user_id, mid
       |                                  ORDER BY rrn) AS isle,
       |         CASE WHEN prev_type IS NULL
       |                OR prev_type NOT IN ('click', 'error')
       |              THEN 1 ELSE 0 END AS is_first,
       |         CASE WHEN next_type IS NULL
       |                OR next_type NOT IN ('click', 'error')
       |              THEN 1 ELSE 0 END AS is_last
       |  FROM rr),
       |stretch AS (
       |  SELECT user_id, isle, min(srn) AS s0,
       |         CAST(count(*) AS BIGINT) AS n_runs,
       |         CAST(coalesce(sum(len) FILTER (WHERE event_type = 'click'),
       |                       0) AS BIGINT) AS n_clicks,
       |         CAST(coalesce(sum(len) FILTER (WHERE event_type = 'error'),
       |                       0) AS BIGINT) AS n_errors,
       |         max(CASE WHEN is_first = 1 THEN prev_type END) AS head_type,
       |         max(CASE WHEN is_first = 1 THEN prev_t1 END) AS head_t1,
       |         max(CASE WHEN is_last = 1 THEN next_type END) AS tail_type,
       |         max(CASE WHEN is_last = 1 THEN next_t0 END) AS tail_t0,
       |         max(CASE WHEN is_last = 1 THEN next_v0 END) AS tail_v0,
       |         max(t1) AS stretch_t1
       |  FROM isl WHERE mid = 1
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT user_id, s0, ${epoch("head_t1")} AS view_epoch,
       |         n_runs, n_clicks, n_errors,
       |         CASE WHEN tail_type = 'purchase' THEN 1 ELSE 0 END
       |           AS has_purchase,
       |         CASE WHEN tail_type = 'purchase' THEN tail_v0 END
       |           AS purchase_value,
       |         CASE WHEN tail_type = 'purchase' THEN ${epoch("tail_t0")}
       |              ELSE ${epoch("stretch_t1")} END AS end_epoch
       |  FROM stretch
       |  WHERE head_type = 'view')
       |SELECT user_id,
       |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY s0)
       |            AS BIGINT) AS match_no,
       |       view_epoch, n_runs, n_clicks, n_errors,
       |       CAST(has_purchase AS BIGINT) AS has_purchase, purchase_value,
       |       end_epoch - view_epoch AS duration_secs
       |FROM m""".stripMargin

  /** q170: MATCH_RECOGNIZE with alternation + optional quantifier —
    * `PATTERN (V (C|E)+ P?)` with MEASURES; see [[q170Sql]].
    */
  def q170_pattern_alternation(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events")
    s.sql(q170Sql(t => s"unix_seconds($t)"))
  }

  val queries: Map[String, Q] = Map(
    "q170_pattern_alternation" -> (q170_pattern_alternation _),
    "q169_interpolate" -> (q169_interpolate _),
    "q168_match_recognize" -> (q168_match_recognize _),
    "q167_sheet_merge_sql" -> (q167_sheet_merge_sql _),
    "q166_subject_access" -> (q166_subject_access _),
    "q165_join_estimate" -> (q165_join_estimate _),
    "q164_semi_additive" -> (q164_semi_additive _),
    "q163_session_stitch" -> (q163_session_stitch _),
    "q162_fk_inference" -> (q162_fk_inference _),
    "q161_twopass_median" -> (q161_twopass_median _),
    "q160_sortkey_advisor" -> (q160_sortkey_advisor _),
    "q159_bitemporal" -> (q159_bitemporal _),
    "q158_bitmap_distinct" -> (q158_bitmap_distinct _),
    "q157_bitmap_rollup" -> (q157_bitmap_rollup _),
    "q156_feistel_pseudonymize" -> (q156_feistel_pseudonymize _),
    "q155_schema_evolution" -> (q155_schema_evolution _),
    "q154_bootstrap_ci" -> (q154_bootstrap_ci _),
    "q153_merge_on_read" -> (q153_merge_on_read _),
    "q152_schema_drift" -> (q152_schema_drift _),
    "q151_markov_attribution" -> (q151_markov_attribution _),
    "q150_holt_forecast" -> (q150_holt_forecast _),
    "q149_cube_reuse" -> (q149_cube_reuse _),
    "q148_zone_map_append" -> (q148_zone_map_append _),
    "q147_bloom_join_pruning" -> (q147_bloom_join_pruning _),
    "q146_encoding_advisor" -> (q146_encoding_advisor _),
    "q145_dp_release" -> (q145_dp_release _),
    "q144_cuped" -> (q144_cuped _),
    "q143_kaplan_meier" -> (q143_kaplan_meier _),
    "q142_time_travel" -> (q142_time_travel _),
    "q141_deletion_vectors" -> (q141_deletion_vectors _),
    "q140_zone_map_skip" -> (q140_zone_map_skip _),
    "q139_bucketed_append" -> (q139_bucketed_append _),
    "q138_sampled_agg_audit" -> (q138_sampled_agg_audit _),
    "q137_column_stats" -> (q137_column_stats _),
    "q136_range_boundaries" -> (q136_range_boundaries _),
    "q135_salted_join" -> (q135_salted_join _),
    "q134_partitioned_scan" -> (q134_partitioned_scan _),
    "q133_bucketed_join" -> (q133_bucketed_join _),
    "q132_distribution_ranks" -> (q132_distribution_ranks _),
    "q131_quantified" -> (q131_quantified _),
    "q130_ks_test" -> (q130_ks_test _),
    "q129_calendar_gaps" -> (q129_calendar_gaps _),
    "q128_theil" -> (q128_theil _),
    "q127_gini" -> (q127_gini _),
    "q126_autocorrelation" -> (q126_autocorrelation _),
    "q125_share_of_parent" -> (q125_share_of_parent _),
    "q124_asof_nearest" -> (q124_asof_nearest _),
    "q123_seasonal_index" -> (q123_seasonal_index _),
    "q122_sprt" -> (q122_sprt _),
    "q121_lift_gains" -> (q121_lift_gains _),
    "q119_psi_drift" -> (q119_psi_drift _),
    "q120_winsorize" -> (q120_winsorize _),
    "q116_cusum" -> (q116_cusum _),
    "q117_benford" -> (q117_benford _),
    "q118_join_skew" -> (q118_join_skew _),
    "q114_running_distinct" -> (q114_running_distinct _),
    "q115_ri_orphans" -> (q115_ri_orphans _),
    "q113_topn_other" -> (q113_topn_other _),
    "q112_ewma" -> (q112_ewma _),
    "q110_ab_test" -> (q110_ab_test _),
    "q111_weighted_median" -> (q111_weighted_median _),
    "q109_mad_outliers" -> (q109_mad_outliers _),
    "q108_pareto_abc" -> (q108_pareto_abc _),
    "q107_rolling_ols" -> (q107_rolling_ols _),
    "q105_topk_with_ties" -> (q105_topk_with_ties _),
    "q106_distinct_on" -> (q106_distinct_on _),
    "q104_asof_tolerance" -> (q104_asof_tolerance _),
    "q101_twap" -> (q101_twap _),
    "q100_sequence_match" -> (q100_sequence_match _),
    "q99_concurrency" -> (q99_concurrency _),
    "q97_event_pathing" -> (q97_event_pathing _),
    "q96_scd2_lookup" -> (q96_scd2_lookup _),
    "q95_seasonal_anomaly" -> (q95_seasonal_anomaly _),
    "q94_view_maintain" -> (q94_view_maintain _),
    "q93_snapshot_diff" -> (q93_snapshot_diff _),
    "q92_ohlc_bars" -> (q92_ohlc_bars _),
    "q91_zorder" -> (q91_zorder _),
    "q01_pricing_summary" -> (q01_pricing_summary _),
    "q02_filter_project" -> (q02_filter_project _),
    "q03_join_agg" -> (q03_join_agg _),
    "q04_left_join" -> (q04_left_join _),
    "q05_full_join" -> (q05_full_join _),
    "q06_semi_join" -> (q06_semi_join _),
    "q07_anti_join" -> (q07_anti_join _),
    "q08_band_join" -> (q08_band_join _),
    "q09_distinct_agg" -> (q09_distinct_agg _),
    "q10_rollup" -> (q10_rollup _),
    "q11_cube" -> (q11_cube _),
    "q12_window_rank" -> (q12_window_rank _),
    "q13_window_running" -> (q13_window_running _),
    "q14_window_lag" -> (q14_window_lag _),
    "q15_topk" -> (q15_topk _),
    "q16_union" -> (q16_union _),
    "q17_intersect" -> (q17_intersect _),
    "q18_except" -> (q18_except _),
    "q19_subquery_in" -> (q19_subquery_in _),
    "q20_scalar_subquery" -> (q20_scalar_subquery _),
    "q21_cte" -> (q21_cte _),
    "q22_string_funcs" -> (q22_string_funcs _),
    "q23_date_funcs" -> (q23_date_funcs _),
    "q24_math_case" -> (q24_math_case _),
    "q25_conditional_null" -> (q25_conditional_null _),
    "q26_json" -> (q26_json _),
    "q27_group_concat" -> (q27_group_concat _),
    "q28_having" -> (q28_having _),
    "q29_pivot" -> (q29_pivot _),
    "q30_asof_join" -> (q30_asof_join _),
    "q31_grouping_sets" -> (q31_grouping_sets _),
    "q32_approx_distinct" -> (q32_approx_distinct _),
    "q33_topk_native" -> (q33_topk_native _),
    "q34_lateral_explode" -> (q34_lateral_explode _),
    "q37_intersect_all" -> (q37_intersect_all _),
    "q38_except_all" -> (q38_except_all _),
    "q35_map_explode" -> (q35_map_explode _),
    "q36_range_frame" -> (q36_range_frame _),
    "q39_stats" -> (q39_stats _),
    "q40_median" -> (q40_median _),
    "q41_systematic_sample" -> (q41_systematic_sample _),
    "q42_window_misc" -> (q42_window_misc _),
    "q43_right_join" -> (q43_right_join _),
    "q44_window_lead_last" -> (q44_window_lead_last _),
    "q45_unpivot" -> (q45_unpivot _),
    "q46_approx_percentile" -> (q46_approx_percentile _),
    "q47_correlated_subquery" -> (q47_correlated_subquery _),
    "q48_moving_average" -> (q48_moving_average _),
    "q49_lateral_join" -> (q49_lateral_join _),
    "q50_pagination" -> (q50_pagination _),
    "q51_gap_fill" -> (q51_gap_fill _),
    "q52_filter_clause" -> (q52_filter_clause _),
    "q54_recursive_cte" -> (q54_recursive_cte _),
    "q55_ignore_nulls" -> (q55_ignore_nulls _),
    "q56_within_group" -> (q56_within_group _),
    "q57_funnel" -> (q57_funnel _),
    "q58_retention" -> (q58_retention _),
    "q59_attribution" -> (q59_attribution _),
    "q60_rolling_wau" -> (q60_rolling_wau _),
    "q61_qualify" -> (q61_qualify _),
    "q62_grouping_id" -> (q62_grouping_id _),
    "q63_bucket_sample" -> (q63_bucket_sample _),
    "q64_explode_outer" -> (q64_explode_outer _),
    "q53_merge_upsert" -> (q53_merge_upsert _),
    "q67_regression" -> (q67_regression _),
    "q68_time_range_frame" -> (q68_time_range_frame _),
    "q69_data_quality" -> (q69_data_quality _),
    "q70_mode" -> (q70_mode _),
    "q71_group_by_all" -> (q71_group_by_all _),
    "q72_variant" -> (q72_variant _),
    "q73_window_distinct" -> (q73_window_distinct _),
    "q74_sessionize" -> (q74_sessionize _),
    "q75_scd2" -> (q75_scd2 _),
    "q77_outlier_zscore" -> (q77_outlier_zscore _),
    "q78_interpolate" -> (q78_interpolate _),
    "q79_numeric_range_frame" -> (q79_numeric_range_frame _),
    "q80_try_cast_audit" -> (q80_try_cast_audit _),
    "q81_market_basket" -> (q81_market_basket _),
    "q82_cohort_ltv" -> (q82_cohort_ltv _),
    "q85_null_semantics" -> (q85_null_semantics _),
    "q86_window_exclude" -> (q86_window_exclude _),
    "q87_groups_frame" -> (q87_groups_frame _),
    "q88_exclude_ties" -> (q88_exclude_ties _),
    "q89_window_filter" -> (q89_window_filter _),
  )

  /** DuckDB-dialect oracle twins (ANSI; never MySQL-isms — SURVEY §7). */
  /** q74's oracle text — shared verbatim by q163 (stitched == global is
    * the claim, so both run under the same twin).
    */
  private lazy val oracles74Ref: String =
    """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us FROM events),
        |l AS (
        |  SELECT user_id, event_id, us,
        |         CASE WHEN lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sx AS (
        |  SELECT user_id, us,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM l)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       count(*) AS n_events,
        |       strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(make_timestamp(max(us)), '%Y-%m-%d %H:%M:%S') AS session_end,
        |       (max(us) - min(us)) // 1000000 AS duration_s
        |FROM sx GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    // epoch_us // 1000000, not CAST(epoch(..)): epoch() is a DOUBLE whose
    // cast ROUNDS sub-second timestamps up while unix_seconds floors
    "q168_match_recognize" ->
      q168Sql(t => s"(epoch_us($t) // 1000000)"),
    "q170_pattern_alternation" ->
      q170Sql(t => s"(epoch_us($t) // 1000000)"),
    "q169_interpolate" ->
      """WITH ev AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |anchors AS (
        |  SELECT hour, event_type, CAST(sum(cents) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
        |spine AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 hour)) AS hour
        |  FROM bounds),
        |grid AS (
        |  SELECT s.hour, t.event_type
        |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
        |j AS (
        |  SELECT g.hour, g.event_type, a.c,
        |         epoch_us(g.hour) // 3600000000 AS h
        |  FROM grid g LEFT JOIN anchors a
        |    ON a.hour = g.hour AND a.event_type = g.event_type),
        |f AS (
        |  SELECT *,
        |    last_value(c IGNORE NULLS) OVER wb AS pc,
        |    last_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER wb AS ph,
        |    first_value(c IGNORE NULLS) OVER wf AS nc,
        |    first_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER wf AS nh
        |  FROM j
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type,
        |       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       CASE WHEN c IS NOT NULL THEN 'anchor'
        |            WHEN ph IS NULL OR nh IS NULL THEN 'edge'
        |            ELSE 'interp' END AS kind,
        |       CASE WHEN c IS NOT NULL THEN c
        |            WHEN ph IS NULL THEN nc
        |            WHEN nh IS NULL THEN pc
        |            ELSE pc + (nc - pc) * (h - ph) // (nh - ph) END
        |         AS filled_cents
        |FROM f""".stripMargin,
    // recompute q167's post-MERGE/DELETE sheet state from raw orders: the
    // merged report over ALL orders (base + delta adds are exact BIGINT
    // cents) minus the deleted priority row
    "q167_sheet_merge_sql" ->
      """SELECT o_orderpriority AS priority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM orders
        |WHERE o_orderpriority <> '4-NOT SPECIFIED'
        |GROUP BY 1""".stripMargin,
    "q156_feistel_pseudonymize" ->
      feistelSql((a, b) => s"xor($a, $b)").replace("$DIV$", "//"),
    "q157_bitmap_rollup" ->
      q157Sql(b => s"(CAST(1 AS BIGINT) << $b)").replace("$DIV$", "//"),
    "q166_subject_access" ->
      s"""WITH subj AS (SELECT unnest([3, 7, 11]) AS subject)
         |SELECT CAST(subject AS BIGINT) AS subject, 'orders' AS table_name,
         |       count(*) AS n_rows,
         |       strftime(min(o_orderdate), '%Y-%m-%d') AS first_seen,
         |       strftime(max(o_orderdate), '%Y-%m-%d') AS last_seen,
         |       ${osum("o_totalprice")} AS monetary
         |FROM orders JOIN subj ON o_custkey = subject GROUP BY 1
         |UNION ALL
         |SELECT CAST(subject AS BIGINT), 'events', count(*),
         |       strftime(CAST(min(ts) AS DATE), '%Y-%m-%d'),
         |       strftime(CAST(max(ts) AS DATE), '%Y-%m-%d'),
         |       ${osum("value")}
         |FROM events JOIN subj ON user_id = subject GROUP BY 1
         |UNION ALL
         |SELECT CAST(subject AS BIGINT), 'customer', count(*),
         |       NULL, NULL, ${osum("c_acctbal")}
         |FROM customer JOIN subj ON c_custkey = subject GROUP BY 1""".stripMargin,
    "q165_join_estimate" ->
      """SELECT 'orders*customer' AS join_pair,
        |       (SELECT count(*) FROM orders) AS na,
        |       (SELECT count(*) FROM customer) AS nb,
        |       CAST(greatest((SELECT count(DISTINCT o_custkey) FROM orders),
        |                     (SELECT count(DISTINCT c_custkey) FROM customer))
        |            AS BIGINT) AS ndv_max,
        |       CAST((SELECT count(*) FROM orders) * (SELECT count(*) FROM customer)
        |            // greatest((SELECT count(DISTINCT o_custkey) FROM orders),
        |                        (SELECT count(DISTINCT c_custkey) FROM customer))
        |            AS BIGINT) AS estimate,
        |       (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1) ha JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1) hb ON ha.k = hb.k)
        |         AS actual,
        |       CAST(CASE WHEN (SELECT count(*) FROM orders) * (SELECT count(*) FROM customer)
        |             // greatest((SELECT count(DISTINCT o_custkey) FROM orders),
        |                         (SELECT count(DISTINCT c_custkey) FROM customer)) >= (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1) ha JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1) hb ON ha.k = hb.k)
        |            THEN ((SELECT count(*) FROM orders) * (SELECT count(*) FROM customer)
        |             // greatest((SELECT count(DISTINCT o_custkey) FROM orders),
        |                         (SELECT count(DISTINCT c_custkey) FROM customer))
        |                  - (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1) ha JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1) hb ON ha.k = hb.k)) * 1000 // (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1) ha JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1) hb ON ha.k = hb.k)
        |            ELSE -(((SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1) ha JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1) hb ON ha.k = hb.k) - ((SELECT count(*) FROM orders) * (SELECT count(*) FROM customer)
        |             // greatest((SELECT count(DISTINCT o_custkey) FROM orders),
        |                         (SELECT count(DISTINCT c_custkey) FROM customer)))) * 1000 // (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1) ha JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1) hb ON ha.k = hb.k))
        |            END AS BIGINT) AS err_pm
        |UNION ALL SELECT 'lineitem*orders' AS join_pair,
        |       (SELECT count(*) FROM lineitem) AS na,
        |       (SELECT count(*) FROM orders) AS nb,
        |       CAST(greatest((SELECT count(DISTINCT l_orderkey) FROM lineitem),
        |                     (SELECT count(DISTINCT o_orderkey) FROM orders))
        |            AS BIGINT) AS ndv_max,
        |       CAST((SELECT count(*) FROM lineitem) * (SELECT count(*) FROM orders)
        |            // greatest((SELECT count(DISTINCT l_orderkey) FROM lineitem),
        |                        (SELECT count(DISTINCT o_orderkey) FROM orders))
        |            AS BIGINT) AS estimate,
        |       (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1) hb ON ha.k = hb.k)
        |         AS actual,
        |       CAST(CASE WHEN (SELECT count(*) FROM lineitem) * (SELECT count(*) FROM orders)
        |             // greatest((SELECT count(DISTINCT l_orderkey) FROM lineitem),
        |                         (SELECT count(DISTINCT o_orderkey) FROM orders)) >= (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1) hb ON ha.k = hb.k)
        |            THEN ((SELECT count(*) FROM lineitem) * (SELECT count(*) FROM orders)
        |             // greatest((SELECT count(DISTINCT l_orderkey) FROM lineitem),
        |                         (SELECT count(DISTINCT o_orderkey) FROM orders))
        |                  - (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1) hb ON ha.k = hb.k)) * 1000 // (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1) hb ON ha.k = hb.k)
        |            ELSE -(((SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1) hb ON ha.k = hb.k) - ((SELECT count(*) FROM lineitem) * (SELECT count(*) FROM orders)
        |             // greatest((SELECT count(DISTINCT l_orderkey) FROM lineitem),
        |                         (SELECT count(DISTINCT o_orderkey) FROM orders)))) * 1000 // (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1) hb ON ha.k = hb.k))
        |            END AS BIGINT) AS err_pm
        |UNION ALL SELECT 'lineitem*lineitem_supp' AS join_pair,
        |       (SELECT count(*) FROM lineitem) AS na,
        |       (SELECT count(*) FROM lineitem) AS nb,
        |       CAST(greatest((SELECT count(DISTINCT l_suppkey) FROM lineitem),
        |                     (SELECT count(DISTINCT l_suppkey) FROM lineitem))
        |            AS BIGINT) AS ndv_max,
        |       CAST((SELECT count(*) FROM lineitem) * (SELECT count(*) FROM lineitem)
        |            // greatest((SELECT count(DISTINCT l_suppkey) FROM lineitem),
        |                        (SELECT count(DISTINCT l_suppkey) FROM lineitem))
        |            AS BIGINT) AS estimate,
        |       (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_suppkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT l_suppkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) hb ON ha.k = hb.k)
        |         AS actual,
        |       CAST(CASE WHEN (SELECT count(*) FROM lineitem) * (SELECT count(*) FROM lineitem)
        |             // greatest((SELECT count(DISTINCT l_suppkey) FROM lineitem),
        |                         (SELECT count(DISTINCT l_suppkey) FROM lineitem)) >= (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_suppkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT l_suppkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) hb ON ha.k = hb.k)
        |            THEN ((SELECT count(*) FROM lineitem) * (SELECT count(*) FROM lineitem)
        |             // greatest((SELECT count(DISTINCT l_suppkey) FROM lineitem),
        |                         (SELECT count(DISTINCT l_suppkey) FROM lineitem))
        |                  - (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_suppkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT l_suppkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) hb ON ha.k = hb.k)) * 1000 // (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_suppkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT l_suppkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) hb ON ha.k = hb.k)
        |            ELSE -(((SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_suppkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT l_suppkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) hb ON ha.k = hb.k) - ((SELECT count(*) FROM lineitem) * (SELECT count(*) FROM lineitem)
        |             // greatest((SELECT count(DISTINCT l_suppkey) FROM lineitem),
        |                         (SELECT count(DISTINCT l_suppkey) FROM lineitem)))) * 1000 // (SELECT CAST(sum(ca * cb) AS BIGINT) FROM (SELECT l_suppkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) ha JOIN (SELECT l_suppkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) hb ON ha.k = hb.k))
        |            END AS BIGINT) AS err_pm""".stripMargin,
    "q164_semi_additive" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
        |           AS week,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (
        |  SELECT *, sum(cents) OVER (PARTITION BY user_id
        |              ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
        |           AS balance
        |  FROM e),
        |cl AS (
        |  SELECT user_id, week,
        |         CAST(last(balance ORDER BY us, event_id) AS BIGINT)
        |           AS closing_balance,
        |         count(*) AS n_events
        |  FROM b GROUP BY 1, 2)
        |SELECT week, count(*) AS n_users,
        |       CAST(sum(closing_balance) AS BIGINT) AS total_closing_cents,
        |       CAST(sum(n_events) AS BIGINT) AS n_events
        |FROM cl GROUP BY 1""".stripMargin,
    "q163_session_stitch" -> oracles74Ref,
    "q162_fk_inference" ->
      """SELECT 'orders.o_custkey' AS child, 'customer.c_custkey' AS parent,
        |       (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS ndv_child,
        |       (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer) AS ndv_parent,
        |       (SELECT CAST(count(*) AS BIGINT) FROM
        |          (SELECT DISTINCT o_custkey AS v FROM orders) c
        |          WHERE v NOT IN (SELECT c_custkey FROM customer)) AS n_orphan_values,
        |       CAST(((SELECT count(DISTINCT o_custkey) FROM orders)
        |             - (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS v FROM orders) c
        |                WHERE v NOT IN (SELECT c_custkey FROM customer))) * 1000
        |            // (SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT)
        |         AS containment_pm,
        |       CASE WHEN (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS v FROM orders) c
        |                  WHERE v NOT IN (SELECT c_custkey FROM customer)) = 0
        |              AND (SELECT count(DISTINCT c_custkey) FROM customer)
        |                  = (SELECT count(*) FROM customer)
        |            THEN 'fk' ELSE 'no' END AS verdict
        |UNION ALL SELECT 'lineitem.l_orderkey' AS child, 'orders.o_orderkey' AS parent,
        |       (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS ndv_child,
        |       (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS ndv_parent,
        |       (SELECT CAST(count(*) AS BIGINT) FROM
        |          (SELECT DISTINCT l_orderkey AS v FROM lineitem) c
        |          WHERE v NOT IN (SELECT o_orderkey FROM orders)) AS n_orphan_values,
        |       CAST(((SELECT count(DISTINCT l_orderkey) FROM lineitem)
        |             - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey AS v FROM lineitem) c
        |                WHERE v NOT IN (SELECT o_orderkey FROM orders))) * 1000
        |            // (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS BIGINT)
        |         AS containment_pm,
        |       CASE WHEN (SELECT count(*) FROM (SELECT DISTINCT l_orderkey AS v FROM lineitem) c
        |                  WHERE v NOT IN (SELECT o_orderkey FROM orders)) = 0
        |              AND (SELECT count(DISTINCT o_orderkey) FROM orders)
        |                  = (SELECT count(*) FROM orders)
        |            THEN 'fk' ELSE 'no' END AS verdict
        |UNION ALL SELECT 'lineitem.l_suppkey' AS child, 'supplier.s_suppkey' AS parent,
        |       (SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT) FROM lineitem) AS ndv_child,
        |       (SELECT CAST(count(DISTINCT s_suppkey) AS BIGINT) FROM supplier) AS ndv_parent,
        |       (SELECT CAST(count(*) AS BIGINT) FROM
        |          (SELECT DISTINCT l_suppkey AS v FROM lineitem) c
        |          WHERE v NOT IN (SELECT s_suppkey FROM supplier)) AS n_orphan_values,
        |       CAST(((SELECT count(DISTINCT l_suppkey) FROM lineitem)
        |             - (SELECT count(*) FROM (SELECT DISTINCT l_suppkey AS v FROM lineitem) c
        |                WHERE v NOT IN (SELECT s_suppkey FROM supplier))) * 1000
        |            // (SELECT count(DISTINCT l_suppkey) FROM lineitem) AS BIGINT)
        |         AS containment_pm,
        |       CASE WHEN (SELECT count(*) FROM (SELECT DISTINCT l_suppkey AS v FROM lineitem) c
        |                  WHERE v NOT IN (SELECT s_suppkey FROM supplier)) = 0
        |              AND (SELECT count(DISTINCT s_suppkey) FROM supplier)
        |                  = (SELECT count(*) FROM supplier)
        |            THEN 'fk' ELSE 'no' END AS verdict
        |UNION ALL SELECT 'customer.c_nationkey' AS child, 'nation.n_nationkey' AS parent,
        |       (SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT) FROM customer) AS ndv_child,
        |       (SELECT CAST(count(DISTINCT n_nationkey) AS BIGINT) FROM nation) AS ndv_parent,
        |       (SELECT CAST(count(*) AS BIGINT) FROM
        |          (SELECT DISTINCT c_nationkey AS v FROM customer) c
        |          WHERE v NOT IN (SELECT n_nationkey FROM nation)) AS n_orphan_values,
        |       CAST(((SELECT count(DISTINCT c_nationkey) FROM customer)
        |             - (SELECT count(*) FROM (SELECT DISTINCT c_nationkey AS v FROM customer) c
        |                WHERE v NOT IN (SELECT n_nationkey FROM nation))) * 1000
        |            // (SELECT count(DISTINCT c_nationkey) FROM customer) AS BIGINT)
        |         AS containment_pm,
        |       CASE WHEN (SELECT count(*) FROM (SELECT DISTINCT c_nationkey AS v FROM customer) c
        |                  WHERE v NOT IN (SELECT n_nationkey FROM nation)) = 0
        |              AND (SELECT count(DISTINCT n_nationkey) FROM nation)
        |                  = (SELECT count(*) FROM nation)
        |            THEN 'fk' ELSE 'no' END AS verdict
        |UNION ALL SELECT 'orders.o_custkey' AS child, 'supplier.s_suppkey' AS parent,
        |       (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS ndv_child,
        |       (SELECT CAST(count(DISTINCT s_suppkey) AS BIGINT) FROM supplier) AS ndv_parent,
        |       (SELECT CAST(count(*) AS BIGINT) FROM
        |          (SELECT DISTINCT o_custkey AS v FROM orders) c
        |          WHERE v NOT IN (SELECT s_suppkey FROM supplier)) AS n_orphan_values,
        |       CAST(((SELECT count(DISTINCT o_custkey) FROM orders)
        |             - (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS v FROM orders) c
        |                WHERE v NOT IN (SELECT s_suppkey FROM supplier))) * 1000
        |            // (SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT)
        |         AS containment_pm,
        |       CASE WHEN (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS v FROM orders) c
        |                  WHERE v NOT IN (SELECT s_suppkey FROM supplier)) = 0
        |              AND (SELECT count(DISTINCT s_suppkey) FROM supplier)
        |                  = (SELECT count(*) FROM supplier)
        |            THEN 'fk' ELSE 'no' END AS verdict
        |UNION ALL SELECT 'orders.o_orderkey' AS child, 'lineitem.l_orderkey' AS parent,
        |       (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS ndv_child,
        |       (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS ndv_parent,
        |       (SELECT CAST(count(*) AS BIGINT) FROM
        |          (SELECT DISTINCT o_orderkey AS v FROM orders) c
        |          WHERE v NOT IN (SELECT l_orderkey FROM lineitem)) AS n_orphan_values,
        |       CAST(((SELECT count(DISTINCT o_orderkey) FROM orders)
        |             - (SELECT count(*) FROM (SELECT DISTINCT o_orderkey AS v FROM orders) c
        |                WHERE v NOT IN (SELECT l_orderkey FROM lineitem))) * 1000
        |            // (SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
        |         AS containment_pm,
        |       CASE WHEN (SELECT count(*) FROM (SELECT DISTINCT o_orderkey AS v FROM orders) c
        |                  WHERE v NOT IN (SELECT l_orderkey FROM lineitem)) = 0
        |              AND (SELECT count(DISTINCT l_orderkey) FROM lineitem)
        |                  = (SELECT count(*) FROM lineitem)
        |            THEN 'fk' ELSE 'no' END AS verdict""".stripMargin,
    "q161_twopass_median" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |         l_orderkey * 10 + l_linenumber AS id
        |  FROM lineitem),
        |nn AS (SELECT count(*) AS n, (count(*) + 1) // 2 AS k FROM v),
        |h AS (SELECT cents // 65536 AS bucket, count(*) AS bn
        |      FROM v GROUP BY 1),
        |c AS (SELECT bucket, bn,
        |             sum(bn) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |               AS cum
        |      FROM h),
        |tgt AS (SELECT bucket, cum - bn AS before FROM c CROSS JOIN nn
        |        WHERE cum >= k ORDER BY bucket LIMIT 1),
        |ib AS (SELECT v.* FROM v JOIN tgt ON v.cents // 65536 = tgt.bucket),
        |med AS (
        |  SELECT t.cents FROM (
        |    SELECT cents, row_number() OVER (ORDER BY cents, id) AS rn
        |    FROM ib) t CROSS JOIN tgt CROSS JOIN nn
        |  WHERE t.rn = nn.k - tgt.before)
        |SELECT CAST(nn.n AS BIGINT) AS n, CAST(nn.k AS BIGINT) AS k,
        |       med.cents AS median_cents,
        |       CAST((SELECT count(*) FROM ib) AS BIGINT) AS n_bucket_rows
        |FROM nn CROSS JOIN med""".stripMargin,
    "q160_sortkey_advisor" -> q160Oracle,
    "q159_bitemporal" ->
      """WITH grid AS (
        |SELECT CAST(1 AS BIGINT) AS tx_version, '1995-01-01' AS valid_before,
        |       count(*) FILTER (WHERE o_orderdate < least(TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00')) AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |              FILTER (WHERE o_orderdate < least(TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00')), 0) AS DOUBLE) AS revenue
        |FROM orders
        |UNION ALL SELECT CAST(2 AS BIGINT) AS tx_version, '1995-01-01' AS valid_before,
        |       count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00') AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |              FILTER (WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'), 0) AS DOUBLE) AS revenue
        |FROM orders
        |UNION ALL SELECT CAST(1 AS BIGINT) AS tx_version, '1996-01-01' AS valid_before,
        |       count(*) FILTER (WHERE o_orderdate < least(TIMESTAMP '1996-01-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00')) AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |              FILTER (WHERE o_orderdate < least(TIMESTAMP '1996-01-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00')), 0) AS DOUBLE) AS revenue
        |FROM orders
        |UNION ALL SELECT CAST(2 AS BIGINT) AS tx_version, '1996-01-01' AS valid_before,
        |       count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00') AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |              FILTER (WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'), 0) AS DOUBLE) AS revenue
        |FROM orders
        |UNION ALL SELECT CAST(1 AS BIGINT) AS tx_version, '1998-01-01' AS valid_before,
        |       count(*) FILTER (WHERE o_orderdate < least(TIMESTAMP '1998-01-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00')) AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |              FILTER (WHERE o_orderdate < least(TIMESTAMP '1998-01-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00')), 0) AS DOUBLE) AS revenue
        |FROM orders
        |UNION ALL SELECT CAST(2 AS BIGINT) AS tx_version, '1998-01-01' AS valid_before,
        |       count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00') AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |              FILTER (WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'), 0) AS DOUBLE) AS revenue
        |FROM orders),
        |tx1 AS (SELECT valid_before, n_orders AS n_tx1 FROM grid
        |        WHERE tx_version = 1)
        |SELECT g.tx_version, g.valid_before, g.n_orders, g.revenue,
        |       g.n_orders - t.n_tx1 AS n_restated
        |FROM grid g JOIN tx1 t ON t.valid_before = g.valid_before""".stripMargin,
    "q158_bitmap_distinct" ->
      q158Sql(b => s"(CAST(1 AS BIGINT) << $b)",
        month = "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7",
        day = "CAST(ts AS DATE)", table = "events").replace("$DIV$", "//"),
    "q155_schema_evolution" ->
      s"""SELECT CAST(1 AS BIGINT) AS epoch, count(*) AS n_rows,
         |       CAST(0 AS BIGINT) AS n_pc_nonnull, CAST(0 AS BIGINT) AS pc_sum,
         |       CAST(1 AS BIGINT) AS n_channels,
         |       ${osum("o_totalprice")} AS revenue
         |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), count(*), count(*),
         |       CAST(sum(CAST(substring(o_orderpriority, 1, 1) AS INT)) AS BIGINT),
         |       CAST(count(DISTINCT CASE o_orderkey % 3 WHEN 0 THEN 'web'
         |              WHEN 1 THEN 'app' ELSE 'store' END) AS BIGINT),
         |       ${osum("o_totalprice")}
         |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,
    "q154_bootstrap_ci" ->
      s"""WITH base AS (
         |  SELECT l_orderkey * 10 + l_linenumber AS id,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem),
         |draws AS (
         |  SELECT r.rep, b.cents,
         |         (((b.id % 1000003) * 2654435761 + r.rep * 40503 + 12345)
         |            % 2147483648)
         |           * 48271 % 2147483647 AS u
         |  FROM base b CROSS JOIN (SELECT unnest(range(1, 101)) AS rep) r),
         |wts AS (
         |  SELECT rep, cents, ${poissonW("u")} AS w FROM draws),
         |m AS (
         |  SELECT CAST(rep AS BIGINT) AS rep,
         |         CAST(sum(w) AS BIGINT) AS nw,
         |         CAST((CAST(sum(w * cents) AS BIGINT) * 1000)
         |              // greatest(CAST(sum(w) AS BIGINT), 1) AS BIGINT)
         |           AS rep_mean_milli_cents
         |  FROM wts GROUP BY rep),
         |r2 AS (
         |  SELECT rep, nw, rep_mean_milli_cents,
         |         CAST(row_number() OVER (ORDER BY rep_mean_milli_cents, rep)
         |              AS BIGINT) AS rnk
         |  FROM m)
         |SELECT rep, nw, rep_mean_milli_cents, rnk,
         |       min(CASE WHEN rnk = 3 THEN rep_mean_milli_cents END) OVER ()
         |         AS ci_lo_milli_cents,
         |       min(CASE WHEN rnk = 98 THEN rep_mean_milli_cents END) OVER ()
         |         AS ci_hi_milli_cents
         |FROM r2""".stripMargin,
    "q101_twap" ->
      """WITH e AS (
        |  -- (19,6)/(19,0), not (18,*): DuckDB multiplies width-<=18
        |  -- decimals in int64 and overflows on real µs durations; width
        |  -- 19 forces the int128 path ((19,6)x(19,0) -> precision 38).
        |  -- The numeric VALUES are identical to Spark's (18,*) operands.
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us,
        |         CAST(value AS DECIMAL(19,6)) AS v
        |  FROM events),
        |iv AS (
        |  SELECT user_id, v,
        |         CAST(lead(us) OVER (PARTITION BY user_id
        |                             ORDER BY us, event_id) - us
        |              AS DECIMAL(19,0)) AS dur
        |  FROM e)
        |SELECT user_id, count(*) AS n_intervals,
        |       CAST(sum(dur) AS BIGINT) // 1000000 AS held_s,
        |       round(CAST(sum(v * dur) AS DOUBLE)
        |             / CAST(sum(dur) AS DOUBLE), 9) AS twap
        |FROM iv WHERE dur IS NOT NULL AND dur > 0
        |GROUP BY 1""".stripMargin,
    "q100_sequence_match" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(ts::TIMESTAMP) AS us
        |  FROM events),
        |a AS (
        |  SELECT *, max(CASE WHEN event_type = 'view' THEN us END)
        |            OVER w AS last_a
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |                      ROWS UNBOUNDED PRECEDING)),
        |b AS (
        |  SELECT *, max(CASE WHEN event_type = 'click'
        |                      AND last_a IS NOT NULL THEN us END)
        |            OVER w AS last_ab
        |  FROM a WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |                      ROWS UNBOUNDED PRECEDING)),
        |h AS (
        |  SELECT user_id,
        |         event_type = 'purchase' AND last_ab IS NOT NULL AS hit, us
        |  FROM b)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_matches,
        |       strftime(make_timestamp(min(CASE WHEN hit THEN us END)),
        |                '%Y-%m-%d %H:%M:%S') AS first_match_at
        |FROM h GROUP BY 1
        |HAVING sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0""".stripMargin,
    "q99_concurrency" ->
      """WITH iv AS (
        |  SELECT event_type, event_id, epoch_us(ts::TIMESTAMP) AS us,
        |         CAST(floor(value * 1000000) AS BIGINT) AS dur
        |  FROM events
        |  WHERE CAST(floor(value * 1000000) AS BIGINT) > 0),
        |pts AS (
        |  SELECT event_type, us, CAST(1 AS BIGINT) AS delta, event_id FROM iv
        |  UNION ALL
        |  SELECT event_type, us + dur, CAST(-1 AS BIGINT), event_id FROM iv),
        |c AS (
        |  SELECT event_type, us,
        |         CAST(sum(delta) OVER (PARTITION BY event_type
        |                ORDER BY us, delta, event_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
        |  FROM pts),
        |p AS (
        |  SELECT event_type, CAST(max(conc) AS BIGINT) AS peak,
        |         CAST(count(*) // 2 AS BIGINT) AS n_intervals
        |  FROM c GROUP BY 1)
        |SELECT c.event_type, p.n_intervals, p.peak AS peak_concurrency,
        |       strftime(make_timestamp(min(c.us)),
        |                '%Y-%m-%d %H:%M:%S') AS first_peak_at
        |FROM c JOIN p ON p.event_type = c.event_type AND c.conc = p.peak
        |GROUP BY 1, 2, 3""".stripMargin,
    "q97_event_pathing" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS us
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY us, event_id) AS to_type
        |  FROM e),
        |m AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE) /
        |             sum(n) OVER (PARTITION BY from_type), 9) AS share
        |FROM m""".stripMargin,
    // the oracle runs DuckDB's NATIVE ASOF JOIN — a different algorithm
    // than the union+window rewrite, so the hash check cross-validates
    "q96_scd2_lookup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS us
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, event_type, us,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR event_type <> lag(event_type) OVER w
        |              THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |runs AS (
        |  SELECT user_id, event_type AS state,
        |         sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS run_idx, us
        |  FROM r),
        |dim AS (
        |  SELECT user_id, run_idx, state, min(us) AS from_us
        |  FROM runs GROUP BY 1, 2, 3),
        |probes AS (
        |  SELECT user_id, event_id, us + 1000000 AS t
        |  FROM e WHERE event_id % 10 = 0)
        |SELECT p.user_id, p.event_id,
        |       strftime(make_timestamp(p.t), '%Y-%m-%d %H:%M:%S') AS as_of,
        |       d.state
        |FROM probes p ASOF JOIN dim d
        |  ON p.user_id = d.user_id AND p.t >= d.from_us""".stripMargin,
    "q95_seasonal_anomaly" ->
      """WITH e AS (
        |  SELECT event_type, CAST(hour(ts::TIMESTAMP) AS BIGINT) AS hod, value
        |  FROM events),
        |g AS (
        |  SELECT event_type, hod, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(value AS DECIMAL(18,3)) *
        |                  CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS s2
        |  FROM e GROUP BY 1, 2)
        |SELECT e.event_type, e.hod, g.n AS n_events,
        |       count(*) FILTER (WHERE
        |         abs(e.value - g.s1 / g.n) >
        |         1.5 * sqrt(g.s2 / g.n - (g.s1 / g.n) * (g.s1 / g.n)))
        |         AS n_anomalies
        |FROM e JOIN g ON e.event_type = g.event_type AND e.hod = g.hod
        |GROUP BY 1, 2, 3""".stripMargin,
    // the oracle RECOMPUTES the view from snapshot B directly — hash
    // equality proves incremental-apply == full-recompute
    "q94_view_maintain" ->
      """WITH vb AS (
        |  SELECT o_custkey,
        |         CAST(CASE WHEN o_orderkey % 7 = 0
        |                   THEN (CAST(round(o_totalprice * 100) AS BIGINT) * 105) // 100
        |                   ELSE CAST(round(o_totalprice * 100) AS BIGINT) END
        |              AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 10 <> 6)
        |SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(cents) AS BIGINT) AS rev_cents
        |FROM vb GROUP BY o_custkey""".stripMargin,
    "q93_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |va AS (
        |  SELECT o_orderkey AS a_key, o_orderstatus AS a_status,
        |         cents AS a_cents
        |  FROM base WHERE o_orderkey % 10 <> 3),
        |vb AS (
        |  SELECT o_orderkey AS b_key, o_orderstatus AS b_status,
        |         CAST(CASE WHEN o_orderkey % 7 = 0
        |                   THEN (cents * 105) // 100 ELSE cents END AS BIGINT)
        |           AS b_cents
        |  FROM base WHERE o_orderkey % 10 <> 6),
        |j AS (
        |  SELECT *, CASE WHEN a_key IS NULL THEN 'insert'
        |                 WHEN b_key IS NULL THEN 'delete'
        |                 WHEN a_cents <> b_cents OR a_status <> b_status
        |                   THEN 'update' END AS change
        |  FROM va FULL OUTER JOIN vb ON a_key = b_key)
        |SELECT coalesce(a_key, b_key) AS o_orderkey, change,
        |       a_cents AS old_cents, b_cents AS new_cents
        |FROM j WHERE change IS NOT NULL""".stripMargin,
    "q92_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type, event_id, value,
        |         epoch_us(ts::TIMESTAMP) AS us FROM events),
        |h AS (SELECT *, us // 3600000000 AS hour FROM e),
        |r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY event_type, hour
        |                            ORDER BY us, event_id) AS ra,
        |         row_number() OVER (PARTITION BY event_type, hour
        |                            ORDER BY us DESC, event_id DESC) AS rd
        |  FROM h)
        |SELECT event_type,
        |       strftime(make_timestamp(hour * 3600000000),
        |                '%Y-%m-%d %H:%M:%S') AS bar_hour,
        |       max(CASE WHEN ra = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rd = 1 THEN value END) AS close,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q91_zorder" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey AS ck,
         |         (o_orderdate::DATE - DATE '1992-01-01') AS dy
         |  FROM orders),
         |b AS (SELECT min(ck) AS ck0, max(ck) AS ck1,
         |             min(dy) AS dy0, max(dy) AS dy1 FROM o),
         |sc AS (
         |  SELECT ((ck - ck0) * 256) // (ck1 - ck0 + 1) AS zx,
         |         ((dy - dy0) * 256) // (dy1 - dy0 + 1) AS zy
         |  FROM o CROSS JOIN b),
         |z AS (SELECT zx, zy, ${zInterleave("//")} AS z FROM sc)
         |SELECT CAST(z // 256 AS BIGINT) AS cell, count(*) AS n_orders,
         |       CAST(min(zx) AS BIGINT) AS x_min, CAST(max(zx) AS BIGINT) AS x_max,
         |       CAST(min(zy) AS BIGINT) AS y_min, CAST(max(zy) AS BIGINT) AS y_max
         |FROM z GROUP BY 1""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |       CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_discount > 0.05""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_left_join" ->
      """SELECT n_name, count(c_custkey) AS n_customers,
        |       coalesce(CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS total_bal
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name""".stripMargin,
    "q05_full_join" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
        |           FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS s_nk, count(*) AS n_suppliers
        |           FROM supplier GROUP BY 1)
        |SELECT coalesce(nationkey, s_nk) AS nationkey,
        |       coalesce(n_customers, 0) AS n_customers,
        |       coalesce(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.s_nk""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q08_band_join" ->
      """SELECT band, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM orders
        |JOIN (VALUES ('small', 0.0, 100000.0), ('medium', 100000.0, 250000.0),
        |             ('large', 250000.0, 400000.0), ('jumbo', 400000.0, 1000000.0))
        |     AS bands(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q10_rollup" ->
      """SELECT n_name, o_orderstatus,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS volume, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin,
    "q11_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q12_window_rank" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk <= 3""".stripMargin,
    "q13_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,
    "q14_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |       datediff('day',
        |         CAST(lag(o_orderdate, 1) OVER (
        |           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
        |         CAST(o_orderdate AS DATE)) AS gap_days
        |FROM orders""".stripMargin,
    "q15_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin,
    "q16_union" ->
      """SELECT nationkey, side, count(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nationkey, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS INT) AS nationkey, 'supplier' AS side FROM supplier
        |) u GROUP BY nationkey, side""".stripMargin,
    "q17_intersect" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""".stripMargin,
    "q18_except" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |EXCEPT
        |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""".stripMargin,
    "q19_subquery_in" ->
      """SELECT o_orderstatus, count(*) AS n_orders
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |GROUP BY o_orderstatus""".stripMargin,
    "q20_scalar_subquery" ->
      """SELECT p_brand, count(*) AS n_pricey
        |FROM part
        |WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
        |                              / count(p_retailprice) FROM part)
        |GROUP BY p_brand""".stripMargin,
    "q21_cte" ->
      """WITH order_rev AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS rev
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT o.o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(r.rev AS DECIMAL(38,6))) AS DOUBLE) AS total_rev
        |FROM orders o JOIN order_rev r ON o.o_orderkey = r.l_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin,
    "q22_string_funcs" ->
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_uc,
        |       lower(p_type) AS type_lc,
        |       substring(p_name, 1, 5) AS name_pfx,
        |       trim(' ' || p_brand || ' ') AS brand_trim,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
        |       CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part WHERE p_name LIKE '%a%'""".stripMargin,
    "q23_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(quarter(o_orderdate) AS INT) AS qtr,
        |       strftime(o_orderdate, '%Y-%m') AS ym,
        |       count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM orders GROUP BY 1, 2, 3""".stripMargin,
    "q24_math_case" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice, 0) AS price_r0,
        |       CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
        |       CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
        |       abs(l_quantity - 25) AS qty_dev,
        |       l_orderkey % 7 AS key_mod7,
        |       pow(l_quantity, 2) AS qty_sq,
        |       CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 35 THEN 'mid'
        |            ELSE 'high' END AS qty_bucket
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,
    "q25_conditional_null" ->
      """SELECT o_orderkey,
        |       coalesce(prev_price, 0.0) AS prev_or_zero,
        |       nullif(o_orderstatus, 'O') AS status_nz,
        |       CASE WHEN prev_price IS NULL THEN 'first' ELSE 'repeat' END AS order_seq
        |FROM (SELECT o_orderkey, o_orderstatus,
        |             lag(o_totalprice, 1) OVER (
        |               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |      FROM orders) t""".stripMargin,
    "q26_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(k AS DECIMAL(38,6))) AS DOUBLE) / count(k) AS avg_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type""".stripMargin,
    "q27_group_concat" ->
      """SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
        |FROM nation JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY n_name""".stripMargin,
    "q28_having" ->
      """SELECT l_suppkey, CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
        |       count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey
        |HAVING CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 1000""".stripMargin,
    "q29_pivot" ->
      """SELECT user_id,
        |       CAST(sum(CAST(CASE WHEN event_type = 'click' THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS click,
        |       CAST(sum(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS "view",
        |       CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS purchase,
        |       CAST(sum(CAST(CASE WHEN event_type = 'signup' THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS signup,
        |       CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS "error"
        |FROM events GROUP BY user_id""".stripMargin,
    "q122_sprt" -> q122Sql(
      "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)", "//"),
    "q123_seasonal_index" -> q123Sql(
      "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)", "//"),
    "q125_share_of_parent" -> q125Sql("//"),
    "q126_autocorrelation" -> q126Sql(
      "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)", "//"),
    "q127_gini" -> q127Sql("//"),
    "q128_theil" -> q128Sql,
    "q130_ks_test" -> q130Sql,
    "q132_distribution_ranks" -> q132Sql,
    "q140_zone_map_skip" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         |       ${osum("o_totalprice")} AS revenue
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate <= TIMESTAMP '1995-12-31 23:59:59'
         |GROUP BY 1""".stripMargin,
    "q143_kaplan_meier" -> q143Sql,
    "q144_cuped" -> q144Sql,
    "q150_holt_forecast" -> q150Sql(q150SerSql),
    "q152_schema_drift" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_ev FROM events),
        |b AS (SELECT event_id, event_type, value, user_id,
        |        CASE WHEN event_id * 2 >= n.n_ev THEN 1 ELSE 0 END AS era,
        |        n.n_ev
        |      FROM events CROSS JOIN n),
        |j AS (SELECT era, n_ev,
        |        concat(
        |          CASE event_type
        |            WHEN 'click' THEN concat('{"k": ',
        |              CAST(event_id % 100 AS VARCHAR), ', "page": "p',
        |              CAST(user_id % 10 AS VARCHAR), '"')
        |            WHEN 'purchase' THEN concat('{"k": ',
        |              CAST(event_id % 100 AS VARCHAR), ', "amount": ',
        |              CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR))
        |            ELSE concat('{"k": ', CAST(event_id % 100 AS VARCHAR))
        |          END,
        |          CASE WHEN era = 1 THEN ', "v": 2}' ELSE '}' END) AS props2
        |      FROM b),
        |eras AS (
        |  SELECT CAST(sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS d_era0,
        |         CAST(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS d_era1
        |  FROM b),
        |k AS (SELECT era, d_era0, d_era1,
        |        unnest(json_keys(props2)) AS key
        |      FROM j CROSS JOIN eras),
        |g AS (
        |  SELECT key,
        |    CAST(sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_era0,
        |    CAST(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_era1,
        |    CAST((sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) * 1000)
        |         // max(d_era0) AS BIGINT) AS pm_era0,
        |    CAST((sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) * 1000)
        |         // max(d_era1) AS BIGINT) AS pm_era1
        |  FROM k GROUP BY 1)
        |SELECT key, n_era0, n_era1, pm_era0, pm_era1,
        |       pm_era1 - pm_era0 AS drift_pm
        |FROM g""".stripMargin,
    "q153_merge_on_read" ->
      s"""WITH merged AS (
         |  SELECT l_returnflag,
         |         CASE WHEN l_orderkey % 97 = 0 AND l_orderkey % 89 <> 0
         |              THEN l_quantity + 5 ELSE l_quantity END AS q,
         |         l_extendedprice
         |  FROM lineitem
         |  WHERE l_orderkey % 89 <> 0)
         |SELECT l_returnflag, count(*) AS n_live,
         |       CAST(sum(q) AS BIGINT) AS qty,
         |       ${osum("l_extendedprice")} AS gross
         |FROM merged GROUP BY 1""".stripMargin,
    "q151_markov_attribution" ->
      s"""WITH RECURSIVE counts AS (
         |  SELECT * FROM (
         |    ${q151TransSql("events", "epoch_us(ts::TIMESTAMP)")
                 .replace("\n", "\n    ")}) q),
         |tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS rt
         |        FROM counts GROUP BY 1),
         |tr AS (
         |  SELECT c.src, c.dst, CAST(c.n AS DOUBLE) / t.rt AS p
         |  FROM counts c JOIN tot t ON t.src = c.src
         |  UNION ALL SELECT 'CONV', 'CONV', 1.0
         |  UNION ALL SELECT 'NULL', 'NULL', 1.0),
         |states AS (SELECT DISTINCT src AS st FROM counts
         |           UNION SELECT DISTINCT dst FROM counts),
         |rms AS (SELECT '__none__' AS rm
         |        UNION ALL
         |        SELECT st FROM states
         |        WHERE st NOT IN ('CONV', 'NULL', 'START')),
         |it(k, rm, st, v) AS (
         |  SELECT 0, r.rm, s.st,
         |         CASE WHEN s.st = 'CONV' THEN CAST(1.0 AS DOUBLE)
         |              ELSE CAST(0.0 AS DOUBLE) END
         |  FROM rms r CROSS JOIN states s
         |  UNION ALL
         |  SELECT i.k + 1, i.rm, t.src,
         |    CASE WHEN t.src = i.rm THEN 0.0
         |         WHEN t.src = 'CONV' THEN 1.0
         |         WHEN t.src = 'NULL' THEN 0.0
         |         ELSE round(CAST(sum(CAST(round(t.p *
         |                CASE WHEN i.st = i.rm THEN 0.0 ELSE i.v END, 9)
         |              AS DECIMAL(18,9))) AS DOUBLE), 9) END
         |  FROM it i JOIN tr t ON t.dst = i.st
         |  WHERE i.k < 100
         |  GROUP BY i.k, i.rm, t.src),
         |fin AS (SELECT rm, v FROM it WHERE k = 100 AND st = 'START'),
         |base AS (SELECT v FROM fin WHERE rm = '__none__')
         |SELECT f.rm AS channel,
         |       CAST(floor(b.v * 1000000.0) AS BIGINT) AS base_conv_micro,
         |       CAST(floor(f.v * 1000000.0) AS BIGINT) AS conv_without_micro,
         |       CAST(floor(1000.0 * (b.v - f.v) / b.v) AS BIGINT)
         |         AS removal_effect_pm
         |FROM fin f CROSS JOIN base b
         |WHERE f.rm <> '__none__'""".stripMargin,
    "q149_cube_reuse" ->
      """WITH cube AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS ym,
        |         o_orderstatus, o_orderpriority,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT 'status' AS grain, o_orderstatus AS grain_value,
        |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
        |       CAST(sum(cents) AS BIGINT) AS cents
        |FROM cube GROUP BY 2
        |UNION ALL
        |SELECT 'year', CAST((ym - 1) // 12 AS VARCHAR),
        |       CAST(sum(n_orders) AS BIGINT), CAST(sum(cents) AS BIGINT)
        |FROM cube GROUP BY 2""".stripMargin,
    "q145_dp_release" -> q145Sql,
    "q146_encoding_advisor" -> q146Sql("strlen", "//"),
    "q147_bloom_join_pruning" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |       ${osum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_totalprice > 400000.0
         |GROUP BY 1""".stripMargin,
    "q148_zone_map_append" ->
      s"""WITH all_orders AS (
         |  SELECT o_orderdate, o_orderpriority, o_totalprice FROM orders
         |  UNION ALL
         |  SELECT o_orderdate, o_orderpriority, o_totalprice FROM orders
         |  WHERE o_orderkey % 10 = 0)
         |SELECT o_orderpriority, count(*) AS n_orders,
         |       ${osum("o_totalprice")} AS revenue
         |FROM all_orders
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate <= TIMESTAMP '1995-12-31 23:59:59'
         |GROUP BY 1""".stripMargin,
    "q141_deletion_vectors" ->
      s"""SELECT l_returnflag, count(*) AS n_live,
         |       CAST(sum(l_quantity) AS BIGINT) AS qty,
         |       ${osum("l_extendedprice")} AS gross
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-07-01 00:00:00'
         |GROUP BY 1""".stripMargin,
    "q142_time_travel" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |       ${osum("o_totalprice")} AS revenue, 1 AS version
         |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1
         |UNION ALL
         |SELECT o_orderstatus, count(*) AS n_orders,
         |       ${osum("o_totalprice")} AS revenue, 2 AS version
         |FROM orders GROUP BY 1""".stripMargin,
    "q139_bucketed_append" ->
      """WITH o2 AS (
        |  SELECT o_orderkey, o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_orderpriority FROM orders
        |  WHERE o_orderkey % 10 = 0),
        |l2 AS (
        |  SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey + 1000000000, l_extendedprice, l_discount
        |  FROM lineitem WHERE l_orderkey % 10 = 0),
        |per_order AS (
        |  SELECT l_orderkey, o_orderpriority,
        |         sum(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(38,6))) AS rev,
        |         count(*) AS n_items
        |  FROM l2 JOIN o2 ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(rev) AS DOUBLE) AS revenue,
        |       CAST(sum(n_items) AS BIGINT) AS n_lineitems
        |FROM per_order GROUP BY 1""".stripMargin,
    "q138_sampled_agg_audit" ->
      s"""WITH t AS (
         |  SELECT l_returnflag,
         |         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
         |           AS rev,
         |         (((l_orderkey * 8 + l_linenumber) % 1000003)
         |           * 2654435761 + 911) % 1000 < 100 AS in_sample
         |  FROM lineitem),
         |g AS (
         |  SELECT l_returnflag, count(*) AS exact_n,
         |         CAST(sum(rev) AS DOUBLE) AS exact_rev,
         |         CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
         |           AS sample_n,
         |         CAST(sum(CASE WHEN in_sample THEN rev
         |                       ELSE CAST(0 AS DECIMAL(38,6)) END)
         |              AS DOUBLE) AS sample_rev
         |  FROM t GROUP BY 1)
         |SELECT l_returnflag, exact_n, sample_n * 10 AS est_n,
         |       abs(sample_n * 10 - exact_n) * 1000 // exact_n AS n_err_pm,
         |       exact_rev, round(sample_rev * 10, 6) AS est_rev,
         |       CAST(abs(round(sample_rev * 10, 6) - exact_rev) * 1000
         |            / exact_rev AS BIGINT) AS rev_err_pm
         |FROM g""".stripMargin,
    "q137_column_stats" ->
      """WITH w AS (
        |  SELECT count(*) AS n_rows,
        |         count(DISTINCT l_returnflag) AS a1,
        |         count(DISTINCT l_linestatus) AS b1,
        |         count(DISTINCT (l_returnflag, l_linestatus)) AS j1,
        |         count(DISTINCT l_shipdate) AS a2,
        |         count(DISTINCT l_returnflag) AS b2,
        |         count(DISTINCT (l_shipdate, l_returnflag)) AS j2,
        |         count(DISTINCT l_partkey) AS a3,
        |         count(DISTINCT l_suppkey) AS b3,
        |         count(DISTINCT (l_partkey, l_suppkey)) AS j3
        |  FROM lineitem),
        |st AS (
        |  SELECT 'l_returnflag,l_linestatus' AS col_pair,
        |         a1 AS ndv_a, b1 AS ndv_b, j1 AS ndv_joint, n_rows FROM w
        |  UNION ALL
        |  SELECT 'l_shipdate,l_returnflag', a2, b2, j2, n_rows FROM w
        |  UNION ALL
        |  SELECT 'l_partkey,l_suppkey', a3, b3, j3, n_rows FROM w)
        |SELECT col_pair, ndv_a, ndv_b, ndv_joint, n_rows,
        |       ndv_joint * 1000 // least(ndv_a * ndv_b, n_rows)
        |         AS independence_pm
        |FROM st""".stripMargin,
    "q136_range_boundaries" ->
      """WITH p AS (
        |  SELECT l_orderkey,
        |         row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1
        |           AS pos,
        |         count(*) OVER () AS n
        |  FROM lineitem)
        |SELECT pos * 32 // n + 1 AS bucket, count(*) AS n_rows,
        |       max(l_orderkey) AS boundary_key
        |FROM p GROUP BY 1""".stripMargin,
    "q135_salted_join" ->
      s"""SELECT p_brand, count(*) AS n_items,
         |       ${osum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1""".stripMargin,
    "q134_partitioned_scan" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM documents WHERE lang = 'de' GROUP BY 1""".stripMargin,
    "q133_bucketed_join" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, o_orderpriority,
        |         sum(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(38,6))) AS rev,
        |         count(*) AS n_items
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(rev) AS DOUBLE) AS revenue,
        |       CAST(sum(n_items) AS BIGINT) AS n_lineitems
        |FROM per_order GROUP BY 1""".stripMargin,
    "q131_quantified" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |         substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS m,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |mavg AS (
        |  SELECT m, cast(sum(cents) // count(*) AS BIGINT) AS cents_avg
        |  FROM o GROUP BY m)
        |SELECT o_orderkey, cents,
        |       cents > ALL (SELECT cents_avg FROM mavg) AS above_all
        |FROM o
        |WHERE cents > ANY (SELECT cents_avg FROM mavg)""".stripMargin,
    "q129_calendar_gaps" -> q129Sql(
      "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)", "//")
      .replace("$SPINE$",
        "SELECT unnest(generate_series(lo, hi)) AS day FROM bounds"),
    "q124_asof_nearest" ->
      """WITH base AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(date_trunc('microsecond', ts) AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type IN ('click', 'error')),
        |probes AS (SELECT * FROM base WHERE event_type = 'error'),
        |clicks AS (SELECT * FROM base WHERE event_type = 'click')
        |SELECT p.event_id,
        |       strftime(n.ts, '%Y-%m-%d %H:%M:%S') AS nearest_click_s,
        |       n.gap_us, n.direction
        |FROM probes p LEFT JOIN LATERAL (
        |  SELECT c.ts,
        |         abs(epoch_us(c.ts) - epoch_us(p.ts)) AS gap_us,
        |         CASE WHEN c.ts <= p.ts THEN 'back' ELSE 'fwd' END AS direction
        |  FROM clicks c WHERE c.user_id = p.user_id
        |  ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts
        |  LIMIT 1) n ON true""".stripMargin,
    "q121_lift_gains" -> q121Sql("//"),
    "q119_psi_drift" -> q119Sql("//"),
    "q120_winsorize" -> q120Sql,
    "q116_cusum" -> q116Sql(
      "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)", "//"),
    "q117_benford" -> q117Sql("VARCHAR", "//"),
    "q118_join_skew" -> q118Sql("//"),
    "q109_mad_outliers" -> madSql("quantile_cont"),
    "q110_ab_test" -> q110Sql.replace("$DIV$", "//"),
    "q113_topn_other" -> q113Sql("VARCHAR", "//"),
    "q114_running_distinct" -> q114Sql.replace("$STR$", "VARCHAR"),
    "q115_ri_orphans" -> q115Sql.replace("$DIV$", "//"),
    "q112_ewma" -> ewmaSql(
      "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)", "//"),
    "q111_weighted_median" -> q111Sql,
    "q108_pareto_abc" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS revenue_cents
        |  FROM orders GROUP BY o_custkey),
        |c AS (
        |  SELECT o_custkey, revenue_cents,
        |         CAST(sum(revenue_cents) OVER (ORDER BY revenue_cents DESC, o_custkey)
        |              AS BIGINT) AS cum,
        |         CAST((SELECT sum(revenue_cents) FROM r) AS BIGINT) AS total
        |  FROM r)
        |SELECT o_custkey, revenue_cents,
        |       (cum * 1000) // total AS cum_share_pm,
        |       CASE WHEN (cum * 1000) // total <= 800 THEN 'A'
        |            WHEN (cum * 1000) // total <= 950 THEN 'B'
        |            ELSE 'C' END AS abc_class
        |FROM c""".stripMargin,
    "q107_rolling_ols" ->
      """WITH daily AS (
        |  SELECT o_orderstatus,
        |         CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sy
        |  FROM orders GROUP BY 1, 2),
        |p AS (
        |  SELECT *, day * nd AS sx, day * day * nd AS sxx, day * sy AS sxy
        |  FROM daily),
        |f AS (
        |  SELECT o_orderstatus, day,
        |         CAST(sum(nd) OVER w AS BIGINT) AS n,
        |         CAST(sum(sx) OVER w AS BIGINT) AS tsx,
        |         CAST(sum(sy) OVER w AS BIGINT) AS tsy,
        |         CAST(sum(sxx) OVER w AS BIGINT) AS tsxx,
        |         CAST(sum(sxy) OVER w AS BIGINT) AS tsxy
        |  FROM p
        |  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY day
        |               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW))
        |SELECT o_orderstatus, day, n,
        |       CASE WHEN n * tsxx - tsx * tsx = 0 THEN NULL
        |            ELSE CAST(n * tsxy - tsx * tsy AS DOUBLE)
        |                 / CAST(n * tsxx - tsx * tsx AS DOUBLE) END
        |         AS slope_cents_per_day
        |FROM f""".stripMargin,
    "q105_topk_with_ties" ->
      """WITH rn AS (
        |  SELECT o_orderstatus, o_orderdate,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY o_orderdate DESC) AS rn
        |  FROM orders),
        |thr AS (
        |  SELECT o_orderstatus, min(o_orderdate) AS cutoff
        |  FROM rn WHERE rn <= 3 GROUP BY o_orderstatus)
        |SELECT o.o_orderstatus,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |       o.o_orderkey
        |FROM orders o JOIN thr t ON t.o_orderstatus = o.o_orderstatus
        |WHERE o.o_orderdate >= t.cutoff""".stripMargin,
    "q106_distinct_on" ->
      """SELECT DISTINCT ON (o_custkey)
        |       o_custkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS last_order_date,
        |       o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC""".stripMargin,
    "q104_asof_tolerance" ->
      """WITH m AS (
        |  SELECT e.event_id, e.ts,
        |         (SELECT max(c.ts) FROM events c
        |          WHERE c.user_id = e.user_id AND c.event_type = 'click'
        |            AND c.ts <= e.ts
        |            AND c.ts >= e.ts - INTERVAL 30 MINUTE) AS matched_ts
        |  FROM events e WHERE e.event_type = 'error')
        |SELECT event_id,
        |       strftime(matched_ts, '%Y-%m-%d %H:%M:%S') AS click_s,
        |       CAST((epoch_us(ts) - epoch_us(matched_ts)) // 1000000
        |            AS BIGINT) AS age_s
        |FROM m""".stripMargin,
    "q30_asof_join" ->
      """SELECT e.event_id,
        |       strftime((SELECT max(c.ts) FROM events c
        |                 WHERE c.user_id = e.user_id AND c.event_type = 'click'
        |                   AND c.ts <= e.ts), '%Y-%m-%d %H:%M:%S') AS last_click_s
        |FROM events e WHERE e.event_type = 'error'""".stripMargin,
    "q31_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    // sketch-contract verdicts (round-8 item 6): the oracle recomputes the
    // EXACT columns and asserts the error-contract bit as literal 1 — a
    // Spark-side contract violation flips the bit and the hash goes red
    "q32_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       CAST(1 AS BIGINT) AS within_rsd
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q46_approx_percentile" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(1 AS BIGINT) AS ok_p25, CAST(1 AS BIGINT) AS ok_p50,
        |       CAST(1 AS BIGINT) AS ok_p75
        |FROM orders GROUP BY 1""".stripMargin,
    "q33_topk_native" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk <= 3""".stripMargin,
    "q34_lateral_explode" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |GROUP BY tok""".stripMargin,
    "q37_intersect_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier) t
        |GROUP BY nationkey""".stripMargin,
    "q38_except_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier) t
        |GROUP BY nationkey""".stripMargin,
    "q35_map_explode" ->
      """SELECT 'k' AS k_name, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS total -- duckdb sum(BIGINT) is HUGEINT
        |FROM events""".stripMargin,
    "q39_stats" -> q39Sql,
    "q67_regression" -> q67Sql,
    "q68_time_range_frame" ->
      ("WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value FROM events)\n"
        + q68FrameSql.format("e")),
    "q69_data_quality" -> q69AuditSql,
    "q70_mode" -> q70Sql,
    "q71_group_by_all" -> q71Sql,
    "q72_variant" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS total_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q73_window_distinct" ->
      """SELECT o_orderkey, o_custkey,
        |       count(DISTINCT o_orderpriority)
        |         OVER (PARTITION BY o_custkey) AS n_prio
        |FROM orders""".stripMargin,
    "q74_sessionize" -> oracles74Ref,
    "q75_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(ts::TIMESTAMP) AS us FROM events),
        |l AS (
        |  SELECT user_id, event_id, event_type, us,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR event_type <> lag(event_type) OVER w
        |              THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |r AS (
        |  SELECT user_id, event_type, us,
        |         sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS run_idx
        |  FROM l),
        |g AS (
        |  SELECT user_id, CAST(run_idx AS BIGINT) AS run_idx,
        |         event_type AS state, min(us) AS from_us,
        |         count(*) AS n_events
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, run_idx, state, n_events,
        |       strftime(make_timestamp(from_us), '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       strftime(make_timestamp(lead(from_us) OVER wr),
        |                '%Y-%m-%d %H:%M:%S') AS valid_to,
        |       lead(from_us) OVER wr IS NULL AS is_current
        |FROM g WINDOW wr AS (PARTITION BY user_id ORDER BY run_idx)""".stripMargin,
    "q77_outlier_zscore" -> q77Sql,
    "q79_numeric_range_frame" -> q79Sql,
    "q80_try_cast_audit" -> q80Sql("VARCHAR"),
    "q81_market_basket" -> q81Sql,
    "q85_null_semantics" -> q85Sql("IS NOT DISTINCT FROM"),
    "q86_window_exclude" ->
      """SELECT o_orderkey, o_orderstatus,
        |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |                    OVER w_ex AS DOUBLE)
        |             / (count(*) OVER w_ex), 9) AS peer_avg_price
        |FROM orders
        |WINDOW w_ex AS (
        |  PARTITION BY o_orderstatus ORDER BY o_orderkey
        |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW)""".stripMargin,
    "q87_groups_frame" ->
      """WITH pg AS (
        |  SELECT o_orderstatus, o_orderdate,
        |         sum(o_totalprice::DECIMAL(38,2)) AS gsum
        |  FROM orders GROUP BY o_orderstatus, o_orderdate),
        |fr AS (
        |  SELECT o_orderstatus, o_orderdate,
        |         sum(gsum) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
        |                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS grp_sum
        |  FROM pg)
        |SELECT o.o_orderkey, CAST(f.grp_sum AS DOUBLE) AS grp_sum
        |FROM orders o JOIN fr f
        |  ON o.o_orderstatus = f.o_orderstatus
        | AND o.o_orderdate = f.o_orderdate""".stripMargin,
    "q88_exclude_ties" ->
      """WITH g AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         dense_rank() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY o_orderdate) AS grp
        |  FROM orders)
        |SELECT o_orderkey,
        |  CAST(sum(o_totalprice::DECIMAL(38,2)) OVER (
        |         PARTITION BY o_orderstatus ORDER BY grp
        |         RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
        |         EXCLUDE GROUP) AS DOUBLE) AS excl_group,
        |  CAST(sum(o_totalprice::DECIMAL(38,2)) OVER (
        |         PARTITION BY o_orderstatus ORDER BY grp
        |         RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
        |         EXCLUDE TIES) AS DOUBLE) AS excl_ties
        |FROM g""".stripMargin,
    "q89_window_filter" ->
      """SELECT o_orderkey,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') OVER w AS n_urgent,
        |  coalesce(CAST(sum(o_totalprice::DECIMAL(38,2))
        |                  FILTER (o_totalprice > 100000) OVER w AS DOUBLE),
        |           0.0) AS big_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
        |             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q82_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
        |f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM e GROUP BY user_id),
        |j AS (
        |  SELECT f.cohort,
        |         CAST(date_diff('day', f.cohort::DATE, e.ts::DATE) // 7
        |           AS BIGINT) AS age_weeks,
        |         e.value
        |  FROM e JOIN f ON e.user_id = f.user_id)
        |SELECT strftime(j.cohort, '%Y-%m-%d') AS cohort_week, age_weeks,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM j GROUP BY 1, 2""".stripMargin,
    "q78_interpolate" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS vol
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT unnest(generate_series(date_trunc('hour', min(ts)),
        |                                date_trunc('hour', max(ts)),
        |                                INTERVAL 1 HOUR)) AS hour
        |  FROM events),
        |grid AS (
        |  SELECT s.hour, t.event_type
        |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
        |g2 AS (
        |  SELECT g.hour, g.event_type, h.n, h.vol,
        |         epoch_us(g.hour::TIMESTAMP) // 3600000000 AS hr_i
        |  FROM grid g
        |  LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = g.event_type),
        |x AS (
        |  SELECT *,
        |         last_value(vol IGNORE NULLS) OVER wb AS pv,
        |         last_value(CASE WHEN vol IS NOT NULL THEN hr_i END IGNORE NULLS)
        |           OVER wb AS pi,
        |         first_value(vol IGNORE NULLS) OVER wf AS nv,
        |         first_value(CASE WHEN vol IS NOT NULL THEN hr_i END IGNORE NULLS)
        |           OVER wf AS ni
        |  FROM g2
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY hr_i
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY event_type ORDER BY hr_i
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type,
        |       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       coalesce(n, 0) AS n_events,
        |       CASE WHEN vol IS NOT NULL THEN vol
        |            WHEN pv IS NULL THEN nv
        |            WHEN nv IS NULL THEN pv
        |            ELSE pv + (nv - pv) * (hr_i - pi) / (ni - pi)
        |       END AS interp_vol
        |FROM x""".stripMargin,
    "q42_window_misc" ->
      """SELECT c_custkey,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drk,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       first_value(c_custkey) OVER w AS richest_key,
        |       round(percent_rank() OVER w, 9) AS prk,
        |       round(cume_dist() OVER w, 9) AS cd
        |FROM customer
        |WHERE regexp_matches(c_name, '^Customer#[0-9]+$')
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,
    "q40_median" ->
      """SELECT o_orderstatus,
        |       quantile_cont(o_totalprice, 0.5) AS median_price,
        |       quantile_cont(o_totalprice, 0.25) AS p25,
        |       quantile_cont(o_totalprice, 0.75) AS p75,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q41_systematic_sample" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE ((l_orderkey % 1000003) * 2654435761 + l_linenumber * 40503)
        |        % 4294967296 < 214748365
        |""".stripMargin,
    "q36_range_frame" ->
      """SELECT event_id, user_id,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
        |         PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts))
        |         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS trailing_hour_value
        |FROM events""".stripMargin,
    "q43_right_join" ->
      """SELECT n_name, count(c_custkey) AS n_customers,
        |       coalesce(CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS total_bal
        |FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q44_window_lead_last" ->
      """SELECT o_orderkey, o_custkey,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       last_value(o_orderkey) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS final_order_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin,
    "q45_unpivot" ->
      """SELECT metric, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax
        |      FROM lineitem)
        |  UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice,
        |                                l_discount, l_tax))
        |GROUP BY metric""".stripMargin,
    "q47_correlated_subquery" ->
      """SELECT o_orderkey, o_orderstatus,
        |       (SELECT count(*) FROM lineitem
        |        WHERE l_orderkey = o_orderkey) AS n_items
        |FROM orders
        |WHERE o_totalprice > 400000""".stripMargin,
    "q48_moving_average" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
        |         / count(*) OVER w AS moving_avg,
        |       CAST(count(*) OVER w AS BIGINT) AS frame_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""".stripMargin,
    "q49_lateral_join" ->
      """SELECT n_name, top_c.c_name, top_c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) AS top_c""".stripMargin,
    "q50_pagination" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_name LIKE 'Customer#0000001%'
        |ORDER BY c_acctbal DESC, c_custkey
        |LIMIT 20 OFFSET 10""".stripMargin,
    "q51_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS vol
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT unnest(generate_series(date_trunc('hour', min(ts)),
        |                                date_trunc('hour', max(ts)),
        |                                INTERVAL 1 HOUR)) AS hour
        |  FROM events),
        |grid AS (
        |  SELECT s.hour, t.event_type
        |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
        |SELECT g.event_type,
        |       strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       coalesce(h.n, 0) AS n_events,
        |       last_value(h.vol IGNORE NULLS) OVER (
        |         PARTITION BY g.event_type ORDER BY g.hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_vol
        |FROM grid g
        |LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = g.event_type""".stripMargin,
    "q53_merge_upsert" ->
      """WITH changes AS (
        |  SELECT o_orderkey AS k, o_totalprice + 100.0 AS new_price
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT -o_orderkey AS k, 42.0 AS new_price
        |  FROM orders WHERE o_orderkey % 1000 = 0),
        |merged AS (
        |  SELECT coalesce(o.o_orderkey, c.k) AS k,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |              WHEN c.k IS NULL THEN 'keep' ELSE 'update' END AS action,
        |         coalesce(c.new_price, o.o_totalprice) AS price
        |  FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.k)
        |SELECT action, count(*) AS n_rows,
        |       CAST(sum(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total_price
        |FROM merged GROUP BY action""".stripMargin,
    "q52_filter_clause" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_total,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |       count(*) FILTER (WHERE o_totalprice > 200000) AS n_large,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |              FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
        |         AS open_volume
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,
    "q60_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |spine AS (SELECT DISTINCT day AS d0 FROM ud)
        |SELECT strftime(d0, '%Y-%m-%d') AS day,
        |       count(DISTINCT user_id) AS wau
        |FROM spine JOIN ud ON ud.day >= d0 - 6 AND ud.day <= d0
        |GROUP BY d0""".stripMargin,
    "q61_qualify" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        |                           ORDER BY o_totalprice DESC, o_orderkey) <= 2
        |""".stripMargin,
    "q62_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       grouping_id(o_orderstatus, o_orderpriority) AS gid,
        |       count(*) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q63_bucket_sample" -> q63Sql,
    "q64_explode_outer" ->
      """SELECT doc_id,
        |       unnest(CASE WHEN l IS NULL OR len(l) = 0
        |              THEN [CAST(NULL AS VARCHAR)]
        |              ELSE l END) AS qword
        |FROM (SELECT doc_id,
        |             list_filter(string_split(text, ' '),
        |                         t -> substring(t, 1, 1) = 'q') AS l
        |      FROM documents)""".stripMargin,
    "q59_attribution" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, event_type
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |c AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER w AS touch_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts_s END IGNORE NULLS)
        |      OVER w AS touch_ts
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CASE WHEN touch_ts IS NOT NULL AND ts_s <= touch_ts + INTERVAL 24 HOUR
        |            THEN touch_type ELSE 'unattributed' END AS touch,
        |       count(*) AS n_purchases
        |FROM c WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,
    "q58_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |       CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
        |       count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN cohort USING (user_id)
        |GROUP BY cohort.cohort_day, datediff('day', cohort_day, day)""".stripMargin,
    "q57_funnel" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_type
        |  FROM events),
        |v AS (SELECT user_id, min(ts_s) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(ts_s) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_s >= t1
        |        AND ts_s <= t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(ts_s) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_s >= t2
        |        AND ts_s <= t2 + INTERVAL 24 HOUR GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT '2_click_after_view', count(*) FROM c
        |UNION ALL
        |SELECT '3_purchase_after_click', count(*) FROM p""".stripMargin,
    "q56_within_group" ->
      """SELECT o_orderpriority,
        |       CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p25_disc,
        |       CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p75_disc,
        |       percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_cont,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q54_recursive_cte" ->
      """WITH RECURSIVE anc(node, a, depth, price) AS (
        |  SELECT p_partkey, p_partkey, 0, p_retailprice FROM part
        |  UNION ALL
        |  SELECT node, a // 2, depth + 1, price FROM anc WHERE a > 1
        |)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes,
        |       CAST(sum(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS level_price
        |FROM anc GROUP BY depth""".stripMargin,
    "q55_ignore_nulls" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS)
        |         OVER w AS prev_f_price,
        |       lead(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS)
        |         OVER w AS next_f_price,
        |       nth_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 1 IGNORE NULLS)
        |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS first_f_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
  )
}
