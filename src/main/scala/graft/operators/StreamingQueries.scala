package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time windowing over the `events` table. The same `window()` /
  * `session_window()` groupings run identically under Structured Streaming
  * (`readStream` + watermark — exercised in StreamingSpec); registered here
  * in batch mode so the driver's DuckDB oracle can check the semantics.
  *
  * Timestamps are formatted to whole seconds at the output boundary: the
  * parquet carries ns, Spark computes in µs, DuckDB in ns — second
  * granularity is the shared precision (see Tables.events).
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  private val dec = org.apache.spark.sql.types.DecimalType(38, 6)

  /** Tumbling 1-hour event-time windows per event type. */
  def st01_tumbling_window(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("volume"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("volume"))

  /** Session windows (30-minute inactivity gap) per user. The oracle
    * reproduces merge semantics with the classic lag + running-sum
    * sessionization, which is also the scalable pure-SQL fallback on
    * engines without a native session window.
    */
  def st02_session_window(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))

  /** Sliding windows (1 hour every 15 min): each event lands in 4 windows —
    * the windowed-rate shape used for stream monitoring.
    */
  def st03_sliding_window(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .filter(col("event_type") === "error")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_errors"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n_errors"))

  /** Exactly-once repair over an at-least-once feed: the input replays
    * every 10th event (a deterministic stand-in for retransmission), and
    * the query deduplicates by event_id before the windowed rollup. The
    * streaming twin is `dropDuplicatesWithinWatermark("event_id")`
    * (StreamingSpec runs it for real: cross-batch replays collapse) —
    * identical semantics with state bounded by the watermark horizon
    * (StreamingSpec runs the real stream); in batch the dedup is one hash
    * aggregate keyed by event_id, partial-aggregated map-side. Duplicate
    * rows are bit-identical, so which copy survives is immaterial and the
    * result stays hash-checkable.
    */
  def st04_dedup_events(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
    val atLeastOnce = ev.unionAll(ev.filter(col("event_id") % 10 === 0))
    atLeastOnce.dropDuplicates("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("volume"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("volume"))
  }

  /** Stream-stream interval join, batch-twinned: each click pairs with
    * same-user errors in the following 30 minutes. Under Structured
    * Streaming the identical join runs with both sides watermarked and the
    * time-range condition bounding the state store (StreamingSpec proves
    * stream == batch on this exact shape); in batch it is an equi join on
    * user_id with the range as a residual predicate — per-user fan-out is
    * bounded by activity rate x window, never corpus size. Timestamps are
    * truncated to whole seconds BEFORE the range compare: the parquet
    * carries ns, Spark computes in µs, and a boundary row must not hinge
    * on sub-second residue the engines don't share.
    */
  def st05_stream_join(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .withColumn("ts_s", date_trunc("second", col("ts")))
    def side(kind: String, p: String) = ev
      .filter(col("event_type") === kind)
      .select(col("user_id").as(s"${p}_user"), col("ts_s").as(s"${p}_ts"),
        col("event_id").as(s"${p}_id"))
    val clicks = side("click", "c")
    val errors = side("error", "e")
    clicks.join(errors,
        col("c_user") === col("e_user") && col("e_ts") >= col("c_ts") &&
          col("e_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("c_id"), col("e_id"),
        (unix_timestamp(col("e_ts")) - unix_timestamp(col("c_ts")))
          .as("gap_s"))
  }

  /** Incremental per-day distinct actives — the streaming-ingest rollup
    * shape: each micro-batch APPENDS its deduped (day, user) partial to a
    * stored partials table, and the rollup reads/merges stored partials
    * only (q65's sketch-persistence architecture with an exactly-mergeable
    * "sketch": a distinct set union — so the whole incremental chain is
    * hash-checked, unlike any HLL variant). Batches here are derived
    * event_id strata; StreamingSpec runs the same rollup as a REAL
    * readStream/foreachBatch with Datasketches HLL partials and pins
    * merged == one-shot.
    */
  def st06_incremental_dau(s: SparkSession, d: String): DataFrame = {
    val dir = SketchQueries.partialsDir("dau_partials", d)
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"),
        (col("event_id") % 5).as("batch_id"))
    // five ingest batches append independently-deduped partials; batch 0
    // overwrites so repeated runs reuse ONE stable directory (a fresh
    // temp dir per run would leak partials across bench reps)
    (0 until 5).foreach { b =>
      ev.filter(col("batch_id") === b)
        .select(col("day"), col("user_id")).distinct()
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    // merge-only: distinct across stored partials, never the raw events
    s.read.parquet(dir).distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("dau"))
  }

  /** Sliding-window heavy hitters ("trending"): top-3 event types per
    * 1-hour window sliding every 30 minutes — the trending-topics /
    * hot-key detector that sits on every event firehose. Two-level Spark
    * shape: the per-(window, type) counts are one hash aggregate with
    * map-side partials (each event expands to its 2 covering windows in
    * the scan stage, no self-join against a window spine), then the
    * per-window top-3 goes through the native partial-heap
    * [[graft.plans.TopKPerGroup]] — at 100 TB no reducer ever funnels a
    * whole window's type histogram, and the shuffle after the partial agg
    * carries at most |windows| x |types| rows. The streaming twin is the
    * same windowed count under a watermark with the rank step in
    * foreachBatch (windowed-agg parity is proven by StreamingSpec on
    * st01/st03's identical grouping).
    */
  def st07_trending(s: SparkSession, d: String): DataFrame = {
    import graft.plans.TopKPerGroup
    import graft.plans.TopKPerGroup.Ord
    val counted = Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))
    TopKPerGroup.topK(counted,
      Seq("win_start"), Seq(Ord("n_events", desc = true), Ord("event_type")), 3)
  }

  /** Stream-static enrichment — the dimension-join every event pipeline
    * runs (click joins user profile; impression joins campaign): the
    * event stream equi-joins a STATIC dimension table, then rolls up per
    * (segment, type). Under Structured Streaming the static side is
    * re-planned per micro-batch and broadcast when small (no state store
    * involved — unlike st05's stream-stream join this needs no watermark
    * bookkeeping on the dim side); in batch it's the same keyed join.
    * StreamingSpec runs the real stream and pins stream == batch. Volume
    * sums go through DECIMAL(38,6) so the rollup is partitioning-proof
    * and hash-green.
    */
  def st08_stream_enrich(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .join(Tables.customer(s, d), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("volume"))

  /** Stream-stream LEFT OUTER interval join — st05's inner join answers
    * "which clicks errored"; the outer variant answers the operationally
    * loaded complement "which clicks did NOT error within 30 minutes",
    * and is the semantics milestone for streaming joins: unmatched left
    * rows can only be emitted once the watermark seals their join window
    * (state eviction = result emission). The global watermark is the MIN
    * over both watermarked inputs — each side is filtered to one event
    * type BEFORE its watermark node, so the lagging side's last event
    * pins it. The batch twin therefore scopes itself to the SEALED
    * region: clicks at least 2 h (1 h watermark + 30 min window +
    * margin) before the EARLIER of the two sides' final timestamps —
    * exactly the subset whose outer result is final; StreamingSpec runs
    * the real double-watermarked stream and pins stream == batch on it.
    */
  def st09_stream_left_join(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .withColumn("ts_s", date_trunc("second", col("ts")))
    def side(kind: String, p: String) = ev
      .filter(col("event_type") === kind)
      .select(col("user_id").as(s"${p}_user"), col("ts_s").as(s"${p}_ts"),
        col("event_id").as(s"${p}_id"))
    val sealEnd = ev.filter(col("event_type").isin("click", "error"))
      .groupBy(col("event_type")).agg(max(col("ts_s")).as("mx"))
      .agg((min(col("mx")) - expr("INTERVAL 2 HOURS")).as("seal"))
    val clicks = side("click", "c")
      .crossJoin(broadcast(sealEnd)).filter(col("c_ts") <= col("seal"))
    val errors = side("error", "e")
    clicks.join(errors,
        col("c_user") === col("e_user") && col("e_ts") >= col("c_ts") &&
          col("e_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"), "left")
      .select(col("c_user").as("user_id"), col("c_id"), col("e_id"),
        (unix_timestamp(col("e_ts")) - unix_timestamp(col("c_ts"))).as("gap_s"))
  }

  /** Incremental per-language vocabulary rollup — t16's statistics kept
    * fresh under continuous ingest without ever rescanning the corpus:
    * each ingest batch appends its own (lang, token, count) partial (the
    * word-count partial is EXACTLY mergeable — token counts add), and the
    * rollup merges stored partials only, then derives types/hapax/ratios
    * from the merged counts. Same economics as st06's distinct-union and
    * q65's sketch merge: the corpus-sized pass happens once per batch at
    * ingest, the dashboard query reads partials bounded by |vocabulary| ×
    * |batches|. Output is bit-identical to one-shot t16 (shares its
    * oracle verbatim); StreamingSpec runs the same rollup as a REAL
    * readStream/foreachBatch.
    */
  def st10_incremental_vocab(s: SparkSession, d: String): DataFrame = {
    val dir = SketchQueries.partialsDir("vocab_partials", d)
    val docs = Tables.documents(s, d)
    (0 until 5).foreach { b =>
      docs.filter(col("doc_id") % 5 === b)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    // merge-only: per-token sums across stored partials, then t16's stats
    s.read.parquet(dir)
      .groupBy(col("lang"), col("tok")).agg(sum(col("cnt")).as("cnt"))
      .groupBy(col("lang"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("lang"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 9)
          .as("type_token_ratio"),
        round(col("n_hapax").cast("double") / col("n_types"), 9)
          .as("hapax_ratio"))
  }

  /** Input row for the custom-state sessionizer: `us` is the exact epoch-µs
    * integer the gap compare runs on; `ts` stays present because the
    * streaming twin's event-time watermark must ride a timestamp column
    * into the stateful operator.
    */
  case class SessEvent(user_id: Long, us: Long, event_id: Long,
    ts: java.sql.Timestamp)

  /** One open session per user — the ENTIRE per-key state. Bounded and
    * evictable: the streaming run clears it on timeout, so state size is
    * O(active users), never O(events).
    */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  case class SessionRow(user_id: Long, n_events: Long, start_us: Long,
    end_us: Long)

  /** The gap-sessionization state machine behind st11 — written once and
    * run on BOTH execution models: batch `flatMapGroupsWithState`
    * (`emitOpenAtEnd = true`: the whole group arrives in one invocation,
    * so the trailing open session is final and emits) and real Structured
    * Streaming (`emitOpenAtEnd = false`: the open session parks in
    * [[OpenSession]] state with an event-time timeout at last-event + gap;
    * the watermark sealing it IS the emission — StreamingSpec pins parity).
    * Events are buffered and sorted per invocation — per user per
    * micro-batch under streaming, so the buffer is bounded by one key's
    * batch slice, not the corpus; the declarative twin q74 remains the
    * spill-safe whole-history formulation.
    */
  private[graft] def sessionStep(gapUs: Long, emitOpenAtEnd: Boolean)(
      user: Long, rows: Iterator[SessEvent],
      state: org.apache.spark.sql.streaming.GroupState[OpenSession])
      : Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      val o = state.get
      state.remove()
      Iterator.single(SessionRow(user, o.n, o.startUs, o.lastUs))
    } else {
      val evs = rows.toArray.sortBy(e => (e.us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
      var open = state.getOption
      evs.foreach { e =>
        open match {
          case Some(o) if e.us - o.lastUs <= gapUs =>
            open = Some(o.copy(lastUs = e.us, n = o.n + 1))
          case Some(o) =>
            out += SessionRow(user, o.n, o.startUs, o.lastUs)
            open = Some(OpenSession(e.us, e.us, 1L))
          case None =>
            open = Some(OpenSession(e.us, e.us, 1L))
        }
      }
      open.foreach { o =>
        val deadlineMs = o.lastUs / 1000 + gapUs / 1000
        if (emitOpenAtEnd) {
          out += SessionRow(user, o.n, o.startUs, o.lastUs)
        } else if (state.getCurrentWatermarkMs() >= deadlineMs) {
          // any event that could still extend this session is later than
          // the watermark allows — sealed now, nothing parks in state
          out += SessionRow(user, o.n, o.startUs, o.lastUs)
          state.remove()
        } else {
          state.update(o)
          state.setTimeoutTimestamp(deadlineMs)
        }
      }
      out.iterator
    }
  }

  /** q74's gap sessionization computed on the CUSTOM-STATE API —
    * `flatMapGroupsWithState` over `groupByKey(user_id)`, the surface a
    * pipeline reaches for when session logic outgrows what lag/sum windows
    * express (carry-over attribution, per-session ML features, abandonment
    * timers). Registered in batch mode (one invocation per user, state
    * discarded) and oracle-checked against q74's declarative twin — the
    * state machine and the window formulation must agree row-for-row.
    * session_idx is stamped AFTER the state machine by a window over
    * emitted session rows (|sessions| rows, not |events|): streaming state
    * must stay evictable, so the machine itself never carries a cross-
    * session counter. StreamingSpec runs this exact `sessionStep` under a
    * real watermark + event-time timeout and pins stream == batch.
    */
  def st11_stateful_sessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val sessions = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("ts"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionStep(1800000000L, emitOpenAtEnd = true))
    sessions.toDF()
      .withColumn("session_idx", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("start_us"))).cast("long"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(timestamp_micros(col("end_us")), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        expr("(end_us - start_us) div 1000000").as("duration_s"))
  }

  /** st12: CONTINUOUS materialized-view maintenance — the streaming end of
    * the q93→q94 CDC story. The changelog arrives in micro-batches; each
    * batch folds into the stored view through q94's one-keyed-join apply
    * step ([[RelationalQueries.applyViewDelta]]), and because per-key
    * deltas are associative and commutative the fold reaches the same
    * view as one-shot q94 REGARDLESS of how the changelog was batched —
    * this registry twin splits it three ways by order key and shares
    * q94's recompute oracle verbatim, so the batching-invariance is
    * hash-checked. StreamingSpec runs the SAME apply step under a real
    * readStream + foreachBatch with the view persisted as parquet between
    * micro-batches (read-apply-write-swap, the production loop) and pins
    * stream == batch == recompute. At 100 TB each step joins the stored
    * view against one micro-batch's key set — the base table is never
    * rescanned, and the join co-partitions on the view's key.
    */
  def st12_view_maintain(s: SparkSession, d: String): DataFrame = {
    val (va, vb) = RelationalQueries.orderSnapshots(s, d)
    // one changelog pass feeds all three batch filters
    val rows = RelationalQueries.changelogRows(va, vb).localCheckpoint()
    (0L until 3L).foldLeft(RelationalQueries.revenueView(va)) { (view, i) =>
      RelationalQueries.applyViewDelta(view,
        rows.filter(pmod(col("o_orderkey"), lit(3L)) === i))
    }
  }

  /** st16: REPLAY-SAFE view maintenance — the idempotence contract st12's
    * fold quietly assumes but foreachBatch does not provide: delivery is
    * AT-LEAST-ONCE (a crash between the view swap and the offset commit
    * redelivers the batch), and an unguarded delta-apply double-counts
    * the replay. The production fix is a committed-batch LEDGER
    * transacted with the view (Spark's own file sinks keep exactly this
    * batchId log); the apply step consults it and a redelivered batch
    * folds to a NO-OP. This twin replays batch 1 (sequence 0, 1,
    * 1-again, 2) through the guard; the oracle is q94's one-shot
    * recompute verbatim, so the hash gate proves the replay was really
    * dropped — without the guard, batch 1's revenue deltas apply twice
    * and the gate fails. The ledger here is the driver-side set standing
    * in for the transacted store; StreamingSpec drives the same guarded
    * apply under a real readStream with a forced handler redelivery and
    * a ledger PERSISTED as parquet between micro-batches.
    */
  def st16_replay_safe_apply(s: SparkSession, d: String): DataFrame = {
    val (va, vb) = RelationalQueries.orderSnapshots(s, d)
    val rows = RelationalQueries.changelogRows(va, vb).localCheckpoint()
    val delivered = Seq(0L, 1L, 1L, 2L) // batch 1 redelivered
    val ledger = scala.collection.mutable.Set.empty[Long]
    delivered.foldLeft(RelationalQueries.revenueView(va)) { (view, b) =>
      if (!ledger.add(b)) view // ledger hit: replay folds to a no-op
      else RelationalQueries.applyViewDelta(view,
        rows.filter(pmod(col("o_orderkey"), lit(3L)) === b))
    }
  }

  /** st17: LATE-DATA audit — the watermark-tuning table read BEFORE
    * deploying st01's windows: for a ladder of candidate watermark delays,
    * how many events would be dropped as late. An event is late under
    * delay W iff its event time sits more than W behind the arrival
    * high-water mark (the max event time over everything that arrived
    * STRICTLY earlier — exclusive, matching Spark's watermark being
    * computed from prior progress). The fixture's feed arrives perfectly
    * ordered (an audit of it is all zeros), so arrival order is DERIVED
    * with deterministic inversions — every 7th event arrives 50 sequence
    * slots late (st04's replay stand-in applied to reordering), giving
    * the ladder a real late tail to measure.
    *
    * Scale shape: the exclusive running max over a global order is a
    * distributed PREFIX-MAX, not a single-partition window — the c17/c28
    * two-phase discipline with max in place of sum: range-partition by
    * event_id, per-pid exclusive running max locally, per-pid max
    * subtotals to the driver (≤32 rows), scanLeft prefix maxima broadcast
    * back, global = greatest(local, carry-in). Comparisons in integer
    * epoch-µs; the ladder fans out over a 4-row broadcast.
    */
  /** Pre-history marker for st17's exclusive prefix max — far below any
    * real epoch-µs yet safe under the W·60s subtraction (Long.MinValue
    * would overflow ANSI arithmetic on the first row).
    */
  private val LateSentinelUs = -1000000000000000000L

  def st17_late_data_audit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("arr",
        col("event_id") + when(col("event_id") % 7 === 0, 50L).otherwise(0L))
      .repartitionByRange(32, col("arr"), col("event_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid identical in subtotal and window passes
    val pidMax = ev.groupBy(col("pid")).agg(max(col("us")).as("pm"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val carry = pidMax.map(_._2).scanLeft(LateSentinelUs)(math.max)
    val carryDf = broadcast(
      pidMax.map(_._1).zip(carry).toSeq.toDF("pid", "carry_us"))
    val w = Window.partitionBy(col("pid")).orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ladder = broadcast(Seq(0L, 60L, 240L, 480L).toDF("w_minutes"))
    ev.join(carryDf, "pid")
      .withColumn("hwm_us",
        greatest(coalesce(max(col("us")).over(w), lit(LateSentinelUs)),
          col("carry_us")))
      .crossJoin(ladder)
      .withColumn("late",
        (col("us") < col("hwm_us") - col("w_minutes") * 60000000L)
          .cast("long"))
      .groupBy(col("w_minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"))
      .withColumn("late_pm", expr("n_late * 1000 DIV n_events"))
  }

  /** st13: INCREMENTAL PSI drift monitor — q119's statistic maintained
    * under continuous ingest: each micro-batch appends its (event_type,
    * half, count) partial; the monitor merges STORED partials only and
    * feeds the merged counts through q119's psiTail SQL verbatim. Counts
    * add exactly, so the incremental path is bit-identical to one-shot
    * q119 — the oracle IS q119's (the st06/st10 pattern), and
    * StreamingSpec drives the same rollup under a real
    * readStream/foreachBatch. This is how a production drift alarm
    * actually runs: the reference window's counts are computed once and
    * frozen; only the current window accumulates.
    */
  def st13_incremental_psi(s: SparkSession, d: String): DataFrame = {
    val dir = SketchQueries.partialsDir("psi_partials", d)
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        when(col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'"), lit("ref"))
          .otherwise(lit("cur")).as("half"),
        (col("event_id") % 4).as("batch_id"))
    (0 until 4).foreach { b =>
      ev.filter(col("batch_id") === b)
        .groupBy(col("event_type"), col("half"))
        .agg(count(lit(1)).as("n"))
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    s.read.parquet(dir)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("half") === "ref", col("n")).otherwise(0L))
          .cast("long").as("n_ref"),
        sum(when(col("half") === "cur", col("n")).otherwise(0L))
          .cast("long").as("n_cur"))
      .createOrReplaceTempView("psi_counts")
    s.sql("WITH " + RelationalQueries.psiTail("div", "psi_counts"))
  }

  /** st14: INCREMENTAL co-graph maintenance — [[graft.operators.CoGraph]]'s
    * one-shot build maintained under continuous ingest: each micro-batch
    * (orders arriving in three arbitrary slices, l_orderkey % 3 — NOT
    * month-aligned, so per-(month, pair) counts must genuinely MERGE
    * across batches) computes its own monthly pair-count partial from
    * only its own orders, appends it to a stored partials table, and the
    * maintained graph is a merge over STORED partials only. Pair counts
    * add exactly (each lineitem pair belongs to one order, one batch),
    * so the incrementally-maintained frequent monthly graph is
    * bit-identical to the one-shot rebuild — the DuckDB oracle IS the
    * one-shot form (st06/st13's pattern applied to graph structure).
    * This is how the production co-edge store absorbs a day's ingest
    * without rescanning the corpus: one self-join over the BATCH's
    * lines, one append, one partials-sized merge.
    */
  def st14_incremental_co_graph(s: SparkSession, d: String): DataFrame = {
    val dir = SketchQueries.partialsDir("co_graph_partials", d)
    val om = Tables.orders(s, d).select(col("o_orderkey"),
      (((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
        .cast("long")).as("m"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      // the CoGraph.ensure lesson applied to the per-batch builds: pin the
      // pair-generation width ON THE JOIN KEY so each batch self-join runs
      // exchange-free at cluster width instead of inheriting the scan's
      // byte-coalesced 3 tasks (r13 flight sweep: 3 x 0.8 s CPU stages)
      .repartition(Tables.scanPartitions(s), col("l_orderkey"))
    (0L until 3L).foreach { b =>
      val batchLines = li.filter(pmod(col("l_orderkey"), lit(3L)) === b)
      batchLines.alias("a")
        .join(batchLines.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_suppkey") < col("b.l_suppkey"))
        .join(om, col("o_orderkey") === col("a.l_orderkey"))
        .groupBy(col("m"), col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
        .agg(count(lit(1)).as("n"))
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    // merge-only: sum across stored partials, never the raw lineitem
    s.read.parquet(dir)
      .groupBy(col("m"), col("u"), col("v"))
      .agg(sum(col("n")).cast("long").as("n"))
      .filter(col("n") >= 2)
  }

  /** st15: INCREMENTAL classifier training — the closed-form payoff t36
    * bought by rejecting iterative updates: Rocchio's sufficient
    * statistics are pure SUMS (per-class per-dim feature totals + class
    * counts), so continuous ingest maintains the model by appending
    * per-batch partials and merging — no epochs, no replay of old
    * batches, no state beyond 2·(dims+1) numbers per batch. Four
    * micro-batches (doc_id % 4 — arbitrary, not split-aligned, so the
    * partials must genuinely merge) each write their train-split partial
    * sums; the merge-only read derives the SAME weights and threshold as
    * t36's one-shot train — the oracle is t36's retrain-from-scratch
    * restricted to the model rows, so batching invariance is
    * hash-checked. Class counts ride the same partial table as dim −2
    * rows. At 100 TB each batch's partial is 66 rows; the merge reads
    * partials only, never any batch's documents again.
    */
  def st15_incremental_rocchio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = SketchQueries.partialsDir("rocchio_partials", d)
    val (docs, feats) = TextQueries.rocchioFeatures(s, d)
    (0 until 4).foreach { b =>
      val fp = feats.filter(col("h") < 800 && col("doc_id") % 4 === b)
        .groupBy(col("y"), col("dim")).agg(sum(col("pm")).as("v"))
      val np = docs.filter(col("h") < 800 && col("doc_id") % 4 === b)
        .groupBy(col("y")).agg(count(lit(1)).as("v"))
        .select(col("y"), lit(-2L).as("dim"), col("v"))
      fp.unionByName(np)
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    // merge-only: the model falls out of the summed partials
    val merged = s.read.parquet(dir)
      .groupBy(col("y"), col("dim")).agg(sum(col("v")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (w, theta2) = TextQueries.rocchioModelFromSums(merged)
    ((0 until TextQueries.RocchioDims).map(k =>
      ("model", f"w_$k%02d", w(k))) :+ (("model", "theta2", theta2)))
      .toSeq.toDF("part", "metric", "value")
  }

  /** st18: streaming ingest MAINTAINS THE LAYOUT MANIFEST
    * ([[Buckets.streamedLayout]]) — four order batches fold into a
    * zone-mapped layout, each appending its data file plus stats for ONLY
    * the new file; the final manifest then serves this 1996 census
    * through zone pruning exactly like the batch-built q140 layout. The
    * oracle aggregates raw orders, proving the streamed manifest lossless
    * end-to-end; StreamingSpec re-proves the same fold under a REAL
    * readStream (foreachBatch body identical; redelivery of a batch folds
    * to a no-op through an st16-style ledger marker guarding the data
    * append, while the stats step is idempotent by construction — it
    * only ever covers files the manifest doesn't know).
    */
  def st18_stream_layout(s: SparkSession, d: String): DataFrame = {
    val (_, statsDir) = Buckets.streamedLayout(s, d)
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-12-31 23:59:59").cast("timestamp")
    val files = s.read.parquet(statsDir)
      .filter(col("max_date") >= lo && col("min_date") <= hi)
      .select(col("file_path"))
      .collect().map(_.getString(0)).sorted
    require(files.nonEmpty, s"zone map pruned every file under $statsDir")
    s.read.parquet(files.toIndexedSeq: _*)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
  }

  /** st19: STREAMING DELETE-REQUEST maintenance
    * ([[Buckets.streamedDeleteVectors]]) — erasure requests fold into the
    * positional DV store batch by batch, with batch 1 deliberately
    * applied twice: anti-join deletion is idempotent by SEMANTICS
    * (duplicate positions cannot over-delete), so this is the one
    * maintenance fold that needs no replay ledger for correctness — the
    * deliberate duplicate is IN the hash-gated result, proving it. The
    * census reads (base ∖ DV); oracle filters raw lineitem by the
    * request predicate. StreamingSpec re-proves the fold under a real
    * readStream of key batches resolved to positions per micro-batch.
    */
  def st19_stream_deletes(s: SparkSession, d: String): DataFrame = {
    val dv = s.read.parquet(Buckets.streamedDeleteVectors(s, d))
    Tables.lineitem(s, d)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"),
        col("l_linestatus"), col("l_quantity"))
      .join(broadcast(dv), Seq("file_path", "row_index"), "left_anti")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("l_quantity")).cast("long").as("qty"))
  }

  /** st20: INCREMENTAL bootstrap-CI maintenance — q154's Poisson state is
    * ADDITIVE (per-replicate Σw·x and Σw are plain sums), so the CI over
    * an unbounded stream needs no replay and no resample: each
    * micro-batch contributes its 100-row partial, partials merge by
    * per-rep sum, and the rank/CI step runs over the merged 100 rows at
    * emit time. This twin splits lineitem into three deterministic
    * batches (l_orderkey mod 3 — a partition of the table), folds them
    * sequentially, and emits q154's EXACT output under q154's own oracle:
    * the hash gate proves batching invariance (any split of the corpus
    * folds to the same CI — the property that makes the bootstrap
    * maintainable at all). StreamingSpec drives the same fold under a
    * real readStream with the partial state persisted as parquet between
    * micro-batches. State is R=100 rows regardless of corpus size — the
    * ideal streaming-sketch economics.
    */
  def st20_incremental_bootstrap(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val merged = (0L until 3L)
      .map(b => RelationalQueries.bootstrapPartials(
        li.filter(pmod(col("l_orderkey"), lit(3L)) === b)))
      .reduce(_ unionByName _)
      .groupBy(col("rep"))
      .agg(sum(col("wsum")).as("wsum"), sum(col("nw")).as("nw"))
    RelationalQueries.bootstrapFinalize(merged)
  }

  /** st21: STREAMING exact-distinct maintenance via BITMAPS — q158's day
    * masks maintained batch by batch, and the second aggregation fold
    * (after st19's anti-join deletes) where AT-LEAST-ONCE needs NO replay
    * ledger: bitmap union is IDEMPOTENT (OR-ing a redelivered batch's
    * masks sets bits that are already set), unlike counts or sums which
    * double. This twin folds three deterministic event batches with batch
    * 1 deliberately applied TWICE and no guard anywhere; it still emits
    * q158's exact output under q158's own oracle — the duplicate sits
    * inside the hash-gated result, proving OR-idempotence the way st19
    * proved anti-join idempotence. State is |days × chunks| masks
    * regardless of event volume. StreamingSpec re-proves the fold under
    * a real readStream with redelivery and parquet-persisted masks.
    */
  def st21_stream_bitmap(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val delivered = Seq(0L, 1L, 1L, 2L) // batch 1 redelivered, no ledger
    val partials = delivered.map(b =>
      RelationalQueries.bitmapDayMasks(
        ev.filter(pmod(col("user_id"), lit(3L)) === b)))
      .reduce(_ unionByName _)
      .groupBy(col("period"), col("day"), col("chunk"))
      .agg(expr("bit_or(mask)").as("mask"))
    RelationalQueries.bitmapFinalize(partials, ev)
  }

  /** st22: STREAMING row-pattern maintenance (CEP — the Flink-CEP shape)
    * — q168's `PATTERN (V C+ P)` matches maintained over micro-batches:
    * per-user run-length encoding is a MONOID (each batch's runs
    * concatenate with the previous state's, merging boundary runs of
    * equal type), so a streaming detector keeps O(runs-tail) state per
    * user and emits a match the moment its purchase lands — state is
    * independent of stream length, the economics that make CEP viable
    * unbounded. This twin processes events in UTC-day batches (the
    * fixture's events span a single month, so day keys are what
    * actually split the stream):
    * runs are computed per (user, batch) with batch-LOCAL numbering (no
    * batch sees another's rows — exactly a micro-batch fold), stitched
    * across boundaries by a second islands pass over run sequence
    * numbers, then fed to the IDENTICAL match window q168 uses
    * ([[RelationalQueries.q168MatchTail]] — same detector, different run
    * construction). The output is q168's EXACT result under q168's own
    * oracle: the hash gate proves fold invariance — any time-split of
    * the stream folds to the same matches. StreamingSpec re-proves the
    * fold under a real readStream with runs-state persisted between
    * micro-batches.
    */
  def st22_stream_pattern(s: SparkSession, d: String): DataFrame =
    st22Finalize(st22BatchRuns(Tables.events(s, d)))

  /** One micro-batch's per-user runs with batch-LOCAL numbering — the
    * per-trigger state delta. The batch key is the event's own UTC day
    * (event-time, not arrival order), so the stored runs stitch
    * identically no matter what order micro-batches arrived in — the
    * property StreamingSpec exercises under a real readStream.
    */
  private[graft] def st22BatchRuns(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    ev.createOrReplaceTempView("st22_ev_batch")
    s.sql(
      s"""WITH e AS (
         |  SELECT user_id, event_type, ts, value,
         |         unix_seconds(ts) div 86400 AS batch,
         |         row_number() OVER (
         |           PARTITION BY user_id, unix_seconds(ts) div 86400
         |           ORDER BY ts, event_id) AS rn
         |  FROM st22_ev_batch),
         |r AS (
         |  SELECT *, rn - row_number() OVER (
         |           PARTITION BY user_id, batch, event_type
         |           ORDER BY rn) AS grp
         |  FROM e),
         |r1 AS (
         |  SELECT *, row_number() OVER (
         |           PARTITION BY user_id, batch, event_type, grp
         |           ORDER BY rn) AS krn
         |  FROM r)
         |SELECT user_id, batch, event_type, min(rn) AS brn,
         |       CAST(count(*) AS BIGINT) AS len,
         |       min(ts) AS t0, max(ts) AS t1,
         |       max(CASE WHEN krn = 1 THEN value END) AS v0
         |FROM r1 GROUP BY user_id, batch, event_type, grp""".stripMargin)
  }

  /** Stitch stored per-batch runs in EVENT-TIME order (batch, brn) —
    * boundary runs of equal type merge (run RLE is a monoid) — then run
    * q168's own match window over the merged runs.
    */
  private[graft] def st22Finalize(bruns: DataFrame): DataFrame = {
    val s = bruns.sparkSession
    bruns.createOrReplaceTempView("st22_runs_state")
    s.sql(
      s"""WITH seq0 AS (
         |  SELECT user_id, event_type, len, t0, t1, v0,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY batch, brn) AS ri
         |  FROM st22_runs_state),
         |r2 AS (
         |  SELECT *, ri - row_number() OVER (
         |           PARTITION BY user_id, event_type ORDER BY ri) AS grp2
         |  FROM seq0),
         |r3 AS (
         |  SELECT *, row_number() OVER (
         |           PARTITION BY user_id, event_type, grp2
         |           ORDER BY ri) AS krn
         |  FROM r2),
         |runs AS (
         |  SELECT user_id, event_type, grp2, min(ri) AS srn,
         |         CAST(sum(len) AS BIGINT) AS len,
         |         min(t0) AS t0, max(t1) AS t1,
         |         max(CASE WHEN krn = 1 THEN v0 END) AS v0
         |  FROM r3 GROUP BY 1, 2, 3),
         |${RelationalQueries.q168MatchTail(t => s"unix_seconds($t)")}"""
        .stripMargin)
  }

  /** st23: STREAMING Bradley-Terry maintenance — the arena-leaderboard
    * economics: c55's win matrix is ADDITIVE (per-(i, j) bout and win
    * counts are plain sums), so an unbounded preference stream needs no
    * replay and no refit-from-raw — each micro-batch contributes its own
    * directed-pair partials, partials merge by sum, and the k-bounded MM
    * fit runs over the merged |players|² matrix at emit time. This twin
    * partitions the bout log into three deterministic strata (da % 3 — a
    * partition of the bouts), folds them, and emits c55's EXACT output
    * under c55's own oracle: the hash gate proves batching invariance
    * (any split of the bout log folds to the same leaderboard). State is
    * |players|² rows regardless of stream length. StreamingSpec drives
    * the same fold under a real readStream of bout files with the
    * partial matrices persisted between micro-batches.
    */
  def st23_stream_bt(s: SparkSession, d: String): DataFrame = {
    // materialize once: each stratum filter would otherwise re-run the
    // corpus-sized stride self-join (3x the dominant stage)
    val bouts = CurationQueries.c55Bouts(s, d).localCheckpoint()
    val merged = (0L until 3L)
      .map(b => CurationQueries.c55PairPartials(
        bouts.filter(pmod(col("da"), lit(3L)) === b)))
      .reduce(_ unionByName _)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("w")).as("w"))
    CurationQueries.c55FitFrame(s, merged)
  }

  val queries: Map[String, Q] = Map(
    "st23_stream_bt" -> (st23_stream_bt _),
    "st22_stream_pattern" -> (st22_stream_pattern _),
    "st21_stream_bitmap" -> (st21_stream_bitmap _),
    "st20_incremental_bootstrap" -> (st20_incremental_bootstrap _),
    "st19_stream_deletes" -> (st19_stream_deletes _),
    "st18_stream_layout" -> (st18_stream_layout _),
    "st17_late_data_audit" -> (st17_late_data_audit _),
    "st16_replay_safe_apply" -> (st16_replay_safe_apply _),
    "st15_incremental_rocchio" -> (st15_incremental_rocchio _),
    "st14_incremental_co_graph" -> (st14_incremental_co_graph _),
    "st13_incremental_psi" -> (st13_incremental_psi _),
    "st12_view_maintain" -> (st12_view_maintain _),
    "st11_stateful_sessions" -> (st11_stateful_sessions _),
    "st10_incremental_vocab" -> (st10_incremental_vocab _),
    "st09_stream_left_join" -> (st09_stream_left_join _),
    "st08_stream_enrich" -> (st08_stream_enrich _),
    "st07_trending" -> (st07_trending _),
    "st06_incremental_dau" -> (st06_incremental_dau _),
    "st01_tumbling_window" -> (st01_tumbling_window _),
    "st02_session_window" -> (st02_session_window _),
    "st03_sliding_window" -> (st03_sliding_window _),
    "st04_dedup_events" -> (st04_dedup_events _),
    "st05_stream_join" -> (st05_stream_join _),
  )

  val oracles: Map[String, String] = Map(
    // st22 must equal q168 exactly (fold invariance IS the claim), so it
    // runs under q168's own oracle text
    "st22_stream_pattern" ->
      RelationalQueries.oracles("q168_match_recognize"),
    // st23 must equal c55 exactly (batching invariance IS the claim)
    "st23_stream_bt" -> CurationQueries.oracles("c55_bradley_terry"),
    // st20 must equal q154 exactly (batching invariance IS the claim), so
    // it runs under q154's own oracle text
    "st20_incremental_bootstrap" ->
      RelationalQueries.oracles("q154_bootstrap_ci"),
    // st21 must equal q158 exactly despite the redelivered batch —
    // OR-idempotence IS the claim
    "st21_stream_bitmap" ->
      RelationalQueries.oracles("q158_bitmap_distinct"),
    "st19_stream_deletes" ->
      """SELECT l_linestatus, count(*) AS n_live,
        |       CAST(sum(l_quantity) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey % 83 <> 0
        |GROUP BY 1""".stripMargin,
    "st18_stream_layout" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS cents
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
        |GROUP BY 1""".stripMargin,
    "st17_late_data_audit" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts::TIMESTAMP) AS us,
        |         event_id + CASE WHEN event_id % 7 = 0 THEN 50 ELSE 0 END
        |           AS arr
        |  FROM events),
        |h AS (
        |  SELECT us,
        |         max(us) OVER (ORDER BY arr, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS hwm_us
        |  FROM e),
        |lad AS (SELECT CAST(unnest([0, 60, 240, 480]) AS BIGINT) AS w_minutes),
        |x AS (
        |  SELECT lad.w_minutes,
        |         CASE WHEN h.us < coalesce(h.hwm_us, -1000000000000000000)
        |                          - lad.w_minutes * 60000000
        |              THEN 1 ELSE 0 END AS late
        |  FROM h CROSS JOIN lad)
        |SELECT w_minutes, count(*) AS n_events,
        |       CAST(sum(late) AS BIGINT) AS n_late,
        |       CAST(sum(late) AS BIGINT) * 1000 // count(*) AS late_pm
        |FROM x GROUP BY 1""".stripMargin,
    // the replay is dropped, so one-shot recompute is the exact answer
    "st16_replay_safe_apply" -> RelationalQueries.oracles("q94_view_maintain"),
    "st15_incremental_rocchio" -> (TextQueries.rocchioOracleCtes +
      """
        |SELECT 'model' AS part, printf('w_%02d', dim) AS metric,
        |       CAST(wt AS BIGINT) AS value FROM w
        |UNION ALL
        |SELECT 'model', 'theta2', theta2 FROM th""".stripMargin),
    "st14_incremental_co_graph" ->
      """WITH om AS (
        |  SELECT o_orderkey,
        |         CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
        |              AS BIGINT) AS m
        |  FROM orders)
        |SELECT om.m, a.l_suppkey AS u, b.l_suppkey AS v,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem a
        |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |               AND a.l_suppkey < b.l_suppkey
        |JOIN om ON om.o_orderkey = a.l_orderkey
        |GROUP BY om.m, a.l_suppkey, b.l_suppkey
        |HAVING count(*) >= 2""".stripMargin,
    // count partials add exactly, so merged-partials PSI == one-shot
    // q119 — its oracle verbatim
    "st13_incremental_psi" -> RelationalQueries.oracles("q119_psi_drift"),
    // any batching of the changelog folds to the same view — q94's
    // full-recompute oracle verbatim proves the 3-way split is invariant
    "st12_view_maintain" -> RelationalQueries.oracles("q94_view_maintain"),
    // the state machine must agree row-for-row with the declarative
    // lag/running-sum formulation — q74's oracle verbatim
    "st11_stateful_sessions" -> RelationalQueries.oracles("q74_sessionize"),
    // identical output contract to one-shot t16: word-count partials are
    // exactly mergeable, so the incremental rollup shares the oracle
    "st10_incremental_vocab" -> TextQueries.oracles("t16_vocab_stats"),
    "st09_stream_left_join" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, event_type
        |  FROM events),
        |seal AS (
        |  SELECT min(mx) - INTERVAL 2 HOUR AS seal FROM (
        |    SELECT event_type, max(ts_s) AS mx FROM e
        |    WHERE event_type IN ('click', 'error') GROUP BY 1) m),
        |c AS (SELECT user_id AS c_user, ts_s AS c_ts, event_id AS c_id
        |      FROM e CROSS JOIN seal
        |      WHERE event_type = 'click' AND ts_s <= seal),
        |r AS (SELECT user_id AS e_user, ts_s AS e_ts, event_id AS e_id
        |      FROM e WHERE event_type = 'error')
        |SELECT c.c_user AS user_id, c.c_id, r.e_id,
        |       CAST(epoch(r.e_ts) - epoch(c.c_ts) AS BIGINT) AS gap_s
        |FROM c LEFT JOIN r ON c.c_user = r.e_user
        |                  AND r.e_ts >= c.c_ts
        |                  AND r.e_ts <= c.c_ts + INTERVAL 30 MINUTE""".stripMargin,
    "st08_stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "st07_trending" ->
      """WITH w AS (
        |  SELECT date_trunc('minute', ts)
        |           - (EXTRACT(minute FROM ts)::INT % 30) * INTERVAL 1 MINUTE
        |           - (k * 30) * INTERVAL 1 MINUTE AS win_start,
        |         event_type
        |  FROM events, unnest([0, 1]) AS t(k)),
        |c AS (SELECT win_start, event_type, count(*) AS n_events
        |      FROM w GROUP BY 1, 2)
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, n_events
        |FROM (SELECT *, row_number() OVER (PARTITION BY win_start
        |              ORDER BY n_events DESC, event_type) AS rk FROM c) t
        |WHERE rk <= 3""".stripMargin,
    "st06_incremental_dau" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |       count(DISTINCT user_id) AS dau
        |FROM events GROUP BY 1""".stripMargin,
    "st01_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st02_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events
        |FROM y GROUP BY user_id, sid""".stripMargin,
    "st03_sliding_window" ->
      """WITH e AS (SELECT ts FROM events WHERE event_type = 'error'),
        |w AS (
        |  SELECT date_trunc('minute', ts)
        |           - (EXTRACT(minute FROM ts)::INT % 15) * INTERVAL 1 MINUTE
        |           - (k * 15) * INTERVAL 1 MINUTE AS win_start
        |  FROM e, unnest([0, 1, 2, 3]) AS t(k))
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |       count(*) AS n_errors
        |FROM w GROUP BY 1""".stripMargin,
    "st04_dedup_events" ->
      """WITH raw AS (
        |  SELECT * FROM events
        |  UNION ALL
        |  SELECT * FROM events WHERE event_id % 10 = 0),
        |deduped AS (
        |  SELECT * EXCLUDE (rn) FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
        |    FROM raw)
        |  WHERE rn = 1)
        |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volume
        |FROM deduped GROUP BY 1, 2""".stripMargin,
    "st05_stream_join" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, event_type
        |  FROM events),
        |c AS (SELECT user_id AS c_user, ts_s AS c_ts, event_id AS c_id
        |      FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id AS e_user, ts_s AS e_ts, event_id AS e_id
        |      FROM e WHERE event_type = 'error')
        |SELECT c.c_user AS user_id, c.c_id, r.e_id,
        |       CAST(epoch(r.e_ts) - epoch(c.c_ts) AS BIGINT) AS gap_s
        |FROM c JOIN r ON c.c_user = r.e_user
        |             AND r.e_ts >= c.c_ts
        |             AND r.e_ts <= c.c_ts + INTERVAL 30 MINUTE""".stripMargin,
  )
}
