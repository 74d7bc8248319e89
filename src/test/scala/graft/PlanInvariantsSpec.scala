package graft

/** Pins the physical-plan properties the 100 TB design depends on, so a
  * refactor that silently degrades a plan (broadcast -> shuffle join, lost
  * pushdown, full sort instead of top-k) fails `sbt test`, not a cluster
  * run. Assertions read the executed plan string after an action (AQE
  * final plan).
  */
class PlanInvariantsSpec extends SparkTestBase {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02 filter+project: predicates pushed to the scan, no exchange") {
    val p = finalPlan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)"), p.take(800))
    assert(!p.contains("Exchange"), "projection/filter query must not shuffle")
  }

  test("q01 agg: filter pushed; scan reads only the 6 needed columns") {
    val p = finalPlan("q01_pricing_summary")
    assert(p.contains("LessThanOrEqual(l_shipdate"), p.take(800))
    // pruned scan: key columns the query never touches must not be read
    assert(!p.contains("l_orderkey") && !p.contains("l_partkey") &&
      !p.contains("l_suppkey"), "column pruning regressed")
  }

  test("q03 star join: dimension joins broadcast, fact side never shuffles pre-agg") {
    val p = finalPlan("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "star join degraded to sort-merge")
  }

  test("q15 top-k: TakeOrderedAndProject, not a global sort") {
    val p = finalPlan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("s01 knn: query vectors broadcast; corpus scanned once") {
    val p = finalPlan("s01_knn_bruteforce")
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "knn join degraded from broadcast")
  }

  test("q06 semi join: planned as a semi join, not inner + dedup") {
    val p = finalPlan("q06_semi_join")
    assert(p.contains("LeftSemi"), p.take(800))
  }

  test("s01 knn top-k: native partial-heap operator, no rank window") {
    // a row_number window partitioned by q_id funnels ALL of a query's
    // candidates through one reducer — the round-1 scale-killer; the plan
    // must show the two-phase TopKPerGroup instead
    val p = finalPlan("s01_knn_bruteforce")
    assert(!p.contains("Window"), s"rank window back in s01:\n${p.take(1200)}")
    assert(p.contains("TopKPerGroup"), p.take(1200))
  }

  test("s04/s06/s10 ivf: no rank windows anywhere in the ANN family") {
    Seq("s04_ivf_ann", "s06_ivf_kmeans", "s10_ivf_pq", "s11_graph_ann",
        "s12_ivf_pq_rerank").foreach { q =>
      val p = finalPlan(q)
      assert(!p.contains("Window"), s"$q grew a rank window:\n${p.take(1200)}")
    }
  }

  test("d05: hot-shingle guard is an anti join; df agg is partial/final") {
    val p = finalPlan("d05_ngram_jaccard")
    assert(p.contains("LeftAnti"), p.take(1200))
    // the df count must partial-aggregate map-side (skew-safe), never
    // sort the exploded shingles globally
    assert(p.contains("HashAggregate"), p.take(1200))
  }

  test("c06 threshold: mergeable sketch aggregate, no exact percentile") {
    // the exact percentile's final merge buffers every distinct score in
    // one task — the single 100 TB scale bound found in round 2; c06's
    // plan must carry the bounded approx sketch with a map-side partial
    val p = finalPlan("c06_token_budget_approx")
    assert(p.contains("approx_percentile"), p.take(1200))
    // strip the approx spellings first: "approx_percentile(score" would
    // otherwise match the exact-percentile substring
    val stripped = p.replace("approx_percentile", "").replace("percentile_approx", "")
    assert(!stripped.contains("percentile("),
      s"exact percentile back in c06:\n${p.take(1200)}")
    assert(p.contains("partial_approx_percentile"),
      s"sketch must partial-aggregate map-side:\n${p.take(1200)}")
  }

  test("c09: eval gram set broadcasts; corpus probe never sort-merges") {
    val p = finalPlan("c09_decontaminate_ngram")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side probe degraded to a shuffle join:\n${p.take(1200)}")
  }

  test("q59 attribution: one carry-forward window, no per-touch-type joins") {
    val p = finalPlan("q59_attribution")
    // the naive formulation is an as-of join PER touch type; the plan must
    // instead carry exactly one Window over the user-ordered stream
    assert("(?s)Window".r.findAllIn(p).size >= 1, p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"attribution grew a join:\n${p.take(1200)}")
  }

  test("q60 rolling WAU: explode fan-out, never a window or a nested-loop join") {
    val p = finalPlan("q60_rolling_wau")
    assert(!p.contains("Window"),
      s"COUNT(DISTINCT) over a window is not mergeable — must stay a join rewrite:\n${p.take(1200)}")
    // a range predicate against the spine plans as a BNLJ: rows x |spine|
    // COMPUTE even though the output is bounded — the round-3 scale-killer
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"spine join degraded to a nested loop:\n${p.take(1200)}")
    assert(p.contains("Generate") && p.contains("HashAggregate"), p.take(800))
  }

  test("s13 filtered knn: label predicate reaches the parquet scan") {
    val p = finalPlan("s13_filtered_knn")
    // pre-filtering: the kernel must only ever score qualifying rows, so
    // the predicate belongs in the scan, not after the join
    assert(p.contains("PushedFilters: [In(label"),
      s"label filter not pushed to the scan:\n${p.take(1200)}")
    assert(!p.contains("Window"), p.take(800))
  }

  test("t11 LM scoring: no rank windows; LM join keyed, never nested-loop") {
    val p = finalPlan("t11_lm_quality")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LM probability join degraded:\n${p.take(1200)}")
    assert(!p.contains("Window"), p.take(800))
  }

  test("q65/q66 sketch rollups: merge stage never rescans the raw table") {
    // two-sided pin: absence of the raw path alone went blind when the
    // round-9 verdict rework routed the raw read through a localCheckpoint
    // (downstream scans print as "Scan ExistingRDD", no file path) — so
    // ALSO require the positive evidence that the merge reads the stored
    // partials directory
    val p65 = finalPlan("q65_hll_rollup")
    assert(!p65.contains("events.parquet"),
      s"q65 merge stage rescanned raw events:\n${p65.take(1200)}")
    assert(p65.contains("hll_partials"),
      s"q65 merge no longer reads the partials store:\n${p65.take(1200)}")
    assert(p65.toLowerCase.contains("hll_union_agg"), p65.take(800))
    val p66 = finalPlan("q66_histogram_rollup")
    assert(!p66.contains("orders.parquet"),
      s"q66 merge stage rescanned raw orders:\n${p66.take(1200)}")
    assert(p66.contains("hist_partials"),
      s"q66 merge no longer reads the partials store:\n${p66.take(1200)}")
    val p83 = finalPlan("q83_kll_rollup")
    assert(!p83.contains("orders.parquet"),
      s"q83 merge stage rescanned raw orders:\n${p83.take(1200)}")
    assert(p83.contains("kll_partials"),
      s"q83 merge no longer reads the partials store:\n${p83.take(1200)}")
    assert(p83.contains("kll_merge"), p83.take(800))
    // map-side partial merge: the sketch union is mergeable like any
    // partial aggregate — a plan without the partial step would funnel
    // every stored blob through one task
    assert(p83.contains("partial_kll_merge"), p83.take(1200))
    val p84 = finalPlan("q84_kll_by_group")
    assert(!p84.contains("orders.parquet"),
      s"q84 merge stage rescanned raw orders:\n${p84.take(1200)}")
    assert(p84.contains("kll_grp_partials"),
      s"q84 merge no longer reads the partials store:\n${p84.take(1200)}")
    val p90 = finalPlan("q90_theta_overlap")
    assert(!p90.contains("events.parquet"),
      s"q90 merge stage rescanned raw events:\n${p90.take(1200)}")
    assert(p90.contains("theta_partials"),
      s"q90 merge no longer reads the partials store:\n${p90.take(1200)}")
    assert(p90.contains("theta_merge"), p90.take(800))
    assert(p90.contains("partial_theta_merge"), p90.take(1200))
    val p98 = finalPlan("q98_cms_rollup")
    assert(!p98.contains("documents.parquet"),
      s"q98 merge stage rescanned raw documents:\n${p98.take(1200)}")
    assert(p98.contains("cms_partials"),
      s"q98 merge no longer reads the partials store:\n${p98.take(1200)}")
    assert(p98.contains("countminmerge") || p98.toLowerCase.contains("countminmerge"),
      p98.take(800))
    assert(p84.contains("partial_kll_merge"), p84.take(1200))
    val p102 = finalPlan("q102_bottomk_rollup")
    assert(!p102.contains("events.parquet"),
      s"q102 merge stage rescanned raw events:\n${p102.take(1200)}")
    val p103 = finalPlan("q103_moments_rollup")
    assert(!p103.contains("orders.parquet"),
      s"q103 merge stage rescanned raw orders:\n${p103.take(1200)}")
  }

  test("s17 persisted ANN: query path scans stored codes, never raw embeddings") {
    // the index split's whole point: once built, queries read 8 small
    // codes per corpus row from the stored index — a plan that rescans
    // embeddings.parquet has silently regressed to the inline rebuild
    val p = finalPlan("s17_persisted_ivfpq")
    assert(!p.contains("embeddings.parquet"),
      s"s17 query path rescanned raw embeddings:\n${p.take(1200)}")
    assert(p.contains("pq_codes"),
      s"s17 query path does not read the persisted codes:\n${p.take(1200)}")
    assert(p.contains("BroadcastExchange"), p.take(800)) // probes broadcast
    assert(!p.contains("Window"), s"s17 grew a rank window:\n${p.take(1200)}")
  }

  test("h-family: deep multi-join plans never degrade to nested-loop or cartesian") {
    // the TPC-H workload's whole point is join reordering + decorrelation;
    // the two silent catastrophes at 100 TB are a BroadcastNestedLoopJoin
    // (h19's disjunctive join predicate if the common p_partkey = l_partkey
    // conjunct is not extracted) and a CartesianProduct (a correlated
    // subquery decorrelated without its equality condition)
    for (name <- Seq("h02_min_cost_supplier", "h05_local_supplier_volume",
        "h11_important_stock", "h19_discounted_revenue",
        "h21_waiting_suppliers")) {
      val p = finalPlan(name)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name degraded to BNLJ:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"),
        s"$name grew a cartesian product:\n${p.take(1500)}")
      assert(p.contains("BroadcastHashJoin"),
        s"$name lost its dimension broadcasts:\n${p.take(1500)}")
    }
  }

  test("g-family: query paths read the persisted co-edge store, never lineitem") {
    // the store's whole point (s17's economics on graph structure): the
    // lineitem self-join is paid once per corpus version at build time; a
    // query plan that still scans lineitem.parquet has silently regressed
    // to the inline rebuild the round-6 bench tail exposed
    for (name <- Seq("g02_triangles", "g16_graph_evolution", "g13_assortativity")) {
      val p = finalPlan(name)
      assert(!p.contains("lineitem.parquet"),
        s"$name rescanned lineitem:\n${p.take(1200)}")
      assert(p.contains("graft_co_"),
        s"$name does not read the persisted co-edge store:\n${p.take(1200)}")
    }
  }

  test("c13: bloom bit-test screens the corpus before the broadcast verify join") {
    val p = finalPlan("c13_decontaminate_bloom")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"bloom-screened probe degraded to a shuffle join:\n${p.take(1200)}")
    // the k xxhash64 bit tests must run as a scan-stage scalar filter —
    // that's the whole point: corpus grams die before any join machinery
    assert(p.contains("shiftleft"),
      s"bloom bit-test filter missing from the plan:\n${p.take(1200)}")
  }

  test("g01 pagerank round: keyed hash joins + partial sum, never a nested loop") {
    val (edges, outdeg, nodes) =
      operators.GraphQueries.graphParts(spark, sf)
    val r1 = operators.GraphQueries.pagerankRound(
      edges, outdeg, nodes,
      nodes.withColumn("r", org.apache.spark.sql.functions.lit(1000000L)))
    r1.collect()
    val p = r1.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pagerank round degraded to a nested loop:\n${p.take(1200)}")
    assert(p.contains("HashAggregate"),
      s"contribution sum must partial-aggregate map-side:\n${p.take(1200)}")
  }

  test("st07/s15 top-k stages: native partial heaps, no rank windows") {
    Seq("st07_trending", "s15_truncated_rerank").foreach { q =>
      val p = finalPlan(q)
      assert(p.contains("TopKPerGroup"), s"$q lost the native top-k:\n${p.take(1200)}")
      assert(!p.contains("Window"), s"$q grew a rank window:\n${p.take(1200)}")
    }
  }

  test("s14 rrf: shortlist windows only — both rankers go through TopKPerGroup") {
    val p = finalPlan("s14_rrf_fusion")
    // two bounded row_number windows (one per shortlist) and a sort-merge
    // full-outer over the two |q| x N shortlists are fine — what must NOT
    // happen is the corpus-sized ranking outside the partial-heap operator
    // (each ranker needs its partial+final TopKPerGroup pair, plus the
    // fusion's own pair = 6 nodes)
    assert("TopKPerGroup".r.findAllIn(p).size >= 6, p.take(1200))
    assert(!p.contains("CartesianProduct"),
      s"rrf fusion join degraded:\n${p.take(1200)}")
  }

  test("g02 triangles: wedge/closure joins stay keyed — no cartesian expansion") {
    val p = finalPlan("g02_triangles")
    // the single BroadcastNestedLoopJoin Cross is the final 1-row x 1-row
    // scalar combine (tri x wcnt) — fine; what must never appear is a
    // cartesian over edge-scale data
    assert(!p.contains("CartesianProduct"),
      s"triangle counting grew a cartesian:\n${p.take(1200)}")
    // the AQE toString appends the initial plan — count nodes in the
    // final-plan section only
    val finalSection = p.split("== Initial Plan ==").head
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalSection).size <= 1,
      finalSection.take(1200))
    assert(p.contains("HashAggregate"), p.take(800))
  }

  test("q74/q75 sessionize + scd2: windows and final agg share ONE shuffle") {
    for (name <- Seq("q74_sessionize", "q75_scd2")) {
      val p = finalPlan(name)
      // lag/run-numbering windows partition on user_id; the groupBy keys
      // start with user_id, so EnsureRequirements must reuse that
      // partitioning — a second Exchange means the single-shuffle layout
      // regressed (q75's trailing lead() window also rides the same key)
      val finalSection = p.split("== Initial Plan ==").head
      assert("Exchange".r.findAllIn(finalSection).size == 1,
        s"$name must shuffle exactly once on user_id:\n${finalSection.take(1200)}")
    }
  }

  test("c17: the global prefix sum runs as pid-keyed windows, never one reducer") {
    val p = finalPlan("c17_weighted_sample")
    // the running sum must be partitioned on pid (the two-phase scan);
    // an unpartitioned windowspecdefinition would funnel the corpus
    // through a single task
    assert(p.contains("windowspecdefinition(pid"), p.take(1200))
    assert(!p.contains("windowspecdefinition(doc_id"),
      "prefix sum degenerated to a global (single-partition) window")
  }

  test("c28 training order: positions from pid-keyed windows, never one reducer") {
    val p = finalPlan("c28_training_order")
    assert(p.contains("windowspecdefinition(pid"), p.take(1200))
    assert(!p.contains("windowspecdefinition(k#"),
      "position assignment degenerated to a global (single-partition) window")
  }

  test("st10 vocab rollup: merge stage reads stored partials, never documents") {
    // the rollup must be answerable from the partials table alone — a
    // merge that silently re-tokenizes the corpus defeats the whole
    // incremental architecture
    val p = finalPlan("st10_incremental_vocab")
    assert(!p.contains("documents.parquet"),
      s"st10 merge stage rescanned the corpus:\n${p.take(1200)}")
    assert(!p.contains("Generate"), "merge stage must not re-explode tokens")
  }

  test("c18 curriculum: k-bounded TakeOrdered head, never a full global sort") {
    // the training-order head must come off a TakeOrderedAndProject (k rows
    // per partition, k merged at the driver) — a global Sort before the
    // limit would pull the whole corpus through one ordering at 100 TB
    val p = finalPlan("c18_curriculum_order")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("c19 epoch mixture: explode fan-out is scan-local — one agg shuffle only") {
    // replicas fan out inside the scan stage (Generate before any
    // Exchange); the single shuffle is the (source, epoch) aggregate
    val p = finalPlan("c19_epoch_mixture")
    val generateAt = p.indexOf("Generate")
    val exchangeAt = p.indexOf("Exchange")
    assert(generateAt >= 0, p.take(1200))
    // plan strings print top-down: the Generate must sit BELOW the agg
    // exchange (later in the string), i.e. on the scan side of it
    assert(exchangeAt >= 0 && generateAt > exchangeAt,
      s"explode must run before the shuffle, not after:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("g05 k-core: every peel round is keyed joins, never a nested loop") {
    val p = finalPlan("g05_kcore")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"k-core peel degraded to a nested loop:\n${p.take(1200)}")
    assert(!p.contains("Window"), "peel rounds must not use windows")
  }

  test("m08 media dedup: digest computed at the scan; content never shuffles") {
    val df = SparkEntry.queries("m08_media_dedup")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only exchange is the digest-keyed aggregate; its input schema
    // must already be the projected (digest, name, length) — raw bytes
    // stay in the scan stage
    assert(p.contains("Exchange"), p.take(800))
    val postShuffle = p.substring(0, p.indexOf("Exchange"))
    assert(!postShuffle.contains("content"),
      s"file content crossed the shuffle:\n${p.take(1200)}")
  }

  test("s19 late interaction: queries broadcast; maxsim join never degrades") {
    val p = finalPlan("s19_late_interaction")
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "maxsim join degraded from broadcast")
    assert(p.contains("TopKPerGroup"), "per-query top-k must use partial heaps")
  }

  test("s20 multiprobe: probe fan-out on the broadcast query side only") {
    val p = finalPlan("s20_multiprobe_lsh")
    assert(p.contains("BroadcastExchange"), p.take(800))
    // the corpus side must not explode — exactly one Generate (the probe
    // explode), and it must sit inside the broadcast build side
    assert(p.contains("Generate"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "bucket-probe join degraded from broadcast")
  }

  test("q87/q88 groups frames: both windows share one status-keyed exchange") {
    for (name <- Seq("q87_groups_frame", "q88_exclude_ties")) {
      val p = finalPlan(name).split("== Initial Plan ==").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1,
        s"$name: dense_rank + frame windows should reuse one exchange, got $exchanges:\n${p.take(1200)}")
    }
  }

  test("d18 persisted minhash: probe reads stored bands/shingles, not the corpus") {
    graft.operators.DedupQueries.ensureMinhashIndex(spark, sf) // build outside the measured plan
    val p = finalPlan("d18_persisted_minhash")
    assert(p.contains("bands") && p.contains("shingles"),
      s"d18 probe does not read the persisted index:\n${p.take(1200)}")
    // the corpus side must come from the store; the batch side is the
    // pre-plan checkpoint — documents.parquet itself must be absent
    assert(!p.contains("documents.parquet"),
      s"d18 probe rescanned the corpus:\n${p.take(1200)}")
  }

  test("d11 incremental dedup: corpus side reads the persisted bigram index, bucketed") {
    graft.operators.DedupQueries.ensureBigramIndex(spark, sf) // build outside the measured plan
    val p = finalPlan("d11_incremental_dedup")
    val fin = p.split("== Initial Plan ==").head
    assert(fin.contains("corpus_bigrams"),
      s"d11 probe does not read the persisted corpus index:\n${fin.take(1200)}")
    // the ONE allowed documents scan is the batch side — a second scan
    // means yesterday's corpus was re-shingled inline (the round-10 weak).
    // Count only the FINAL plan: AQE prints the initial plan again below
    val scans = "documents\\.parquet".r.findAllIn(fin).length
    assert(scans == 1,
      s"d11 plan scans documents.parquet $scans times (want 1: the batch):\n${fin.take(1200)}")
    // the store's CLUSTERED BY (shingle) layout must reach the join as
    // partitioning — the corpus side then never shuffles at probe time
    // (batch broadcasts at fixture scale; at 100 TB it exchanges
    // batch-sized bytes to the bucket count — either way the corpus's
    // only shuffle happened once, at build)
    assert(fin.contains("Bucketed: true"),
      s"d11 store scan is not a bucketed read:\n${fin.take(1200)}")
  }

  test("c26 persisted bloom: probe scans documents once, eval side from the store") {
    graft.operators.CurationQueries.ensureBloomIndex(spark, sf) // build outside the measured plan
    val p = finalPlan("c26_persisted_bloom")
    // the eval side must come only from the stored gram table; the single
    // allowed documents scan is the batch side
    assert(p.contains("grams"),
      s"c26 probe does not read the persisted gram table:\n${p.take(1200)}")
    val fin = p.split("== Initial Plan ==").head
    val docScans = "documents\\.parquet".r.findAllIn(fin).size
    assert(docScans == 1,
      s"c26 probe should scan documents exactly once (batch side), saw $docScans:\n${p.take(1200)}")
  }

  test("t24 persisted bm25: query path reads stored postings, never the corpus") {
    graft.operators.TextQueries.ensureInvertedIndex(spark, sf) // build outside the measured plan
    val p = finalPlan("t24_persisted_bm25")
    assert(p.contains("postings"),
      s"t24 does not read the persisted postings:\n${p.take(1200)}")
    assert(!p.contains("documents.parquet"),
      s"t24 query path rescanned the corpus:\n${p.take(1200)}")
    assert(p.contains("TopKPerGroup"), s"t24 lost the heap top-k:\n${p.take(1200)}")
  }

  test("c25 dsir: lambda join broadcast; top-100 is a bounded TakeOrdered") {
    val p = finalPlan("c25_dsir_weights")
    assert(p.contains("TakeOrderedAndProject"),
      s"c25 selection degraded to a global sort:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("d17 substring spans: keyed gram join; diagonal windows, no cartesian") {
    val p = finalPlan("d17_substring_spans")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"gram self-join degraded to a nested loop:\n${p.take(1200)}")
    // round-9 probe finding: the survivor lists are data-dependent, so a
    // stats-guessed broadcast is a driver OOM on a duplicate-heavy corpus
    // (the 25x probe corpus killed it at ~7M survivor hashes). Every d17
    // join must stay a shuffle join — shuffle_hash-pinned in the operator.
    val fin = p.split("== Initial Plan ==").head
    assert(!fin.contains("BroadcastHashJoin"),
      s"a data-dependent survivor list got broadcast:\n${p.take(1200)}")
    assert(fin.contains("ShuffledHashJoin"),
      s"survivor joins lost the shuffle_hash pin:\n${p.take(1200)}")
  }

  test("c20 domain cap: native heap operator, no Window and no global sort") {
    val p = finalPlan("c20_domain_cap")
    assert(p.contains("TopKPerGroup"), s"c20 lost the heap top-k:\n${p.take(1200)}")
    assert(!p.contains("Window") && !p.contains("Sort "),
      s"per-domain cap degraded to a sort/window plan:\n${p.take(1200)}")
  }

  test("t18 naive Bayes: scoring joins keyed on tok/cls; scalar crossjoins broadcast") {
    val p = finalPlan("t18_nb_classifier")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the hot joins — token stream x model, scores x prior — must be hash
    // joins on their keys; the only nested loops allowed are the bounded
    // broadcast-scalar crossjoins (|V| count, doc total, 5-class frame)
    val fin = p.split("== Initial Plan ==").head
    assert(fin.contains("BroadcastHashJoin [tok#"),
      s"token-model join lost its key:\n${p.take(1200)}")
    assert(fin.contains("BroadcastHashJoin [cls#"),
      s"prior join lost its key:\n${p.take(1200)}")
    assert(!fin.contains("SortMergeJoin"),
      s"model-sized join degraded to sort-merge:\n${p.take(1200)}")
  }

  test("q91 z-order: bounds broadcast; z projection adds no join shuffle") {
    val p = finalPlan("q91_zorder")
    // the 1-row bounds frame must arrive via broadcast — a shuffled join
    // here would mean the scan stage can't compute z inline
    assert(!p.contains("SortMergeJoin"),
      s"bounds join degraded to sort-merge:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("d19 line dedup: strike join keyed; reassembly is one aggregate, no window") {
    val p = finalPlan("d19_line_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"line-strike anti join degraded:\n${p.take(1200)}")
    assert(!p.contains("Window"),
      s"reassembly must be sort_array-in-agg, not a window:\n${p.take(800)}")
  }

  test("d20 record linkage: blocked equi-join, never cartesian; dim side broadcast") {
    val p = finalPlan("d20_record_linkage")
    // the whole design is that candidates come from a nationkey EQUI-join
    // (blocking); a cartesian/BNLJ here is the |C|x|S| scale-killer
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking degraded to all-pairs:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(800))
  }

  test("q93 snapshot diff: one keyed full outer join, no nested loop") {
    val p = finalPlan("q93_snapshot_diff")
    assert(p.contains("FullOuter"), s"diff lost its full outer join:\n${p.take(800)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"keyed diff degraded to nested loop:\n${p.take(1200)}")
    assert(!p.contains("Window"), "the diff is row-local after the join")
  }

  test("s22 JL search: queries broadcast, partial-heap top-k, no rank window") {
    val p = finalPlan("s22_jl_projection")
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(p.contains("TopKPerGroup"), p.take(1200))
    assert(!p.contains("Window"), s"rank window in s22:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q94 view maintenance: keyed joins only; base table never feeds the apply twice") {
    val p = finalPlan("q94_view_maintain")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"view-maintenance join degraded:\n${p.take(1200)}")
    // both the changelog reduction and the view apply are partial-agg'd
    // keyed joins; a Window here would mean a rank-based rewrite crept in
    assert(!p.contains("Window"), p.take(800))
  }

  test("c21 k-per-group sample: native heap operator, no rank window") {
    val p = finalPlan("c21_sample_k_per_group")
    assert(p.contains("TopKPerGroup"), p.take(1200))
    assert(!p.contains("Window"), s"rank window in c21:\n${p.take(1200)}")
  }

  test("q95 seasonal screen: baseline cells broadcast to the rejoin pass") {
    val p = finalPlan("q95_seasonal_anomaly")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"24x|types| cells must broadcast, not shuffle the event scan:\n${p.take(1200)}")
  }

  test("q96 scd2 lookup: union+window rewrite — no per-probe range join") {
    val p = finalPlan("q96_scd2_lookup")
    // the scale-killer would be a theta join probes x versions; the
    // rewrite must keep it to windows over one (user, time) sort
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of lookup degraded to range join:\n${p.take(1200)}")
    assert(p.contains("Window"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "probes/versions must union, not join")
  }

  test("d21 multiblock: every pass is an equi-join; provenance agg, no cartesian") {
    val p = finalPlan("d21_multiblock_linkage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"a blocking pass degraded to all-pairs:\n${p.take(1200)}")
    assert(!p.contains("Window"), "pair dedup must be a bit_or agg, not a window")
  }

  test("s23 radius search: scan + broadcast + filter, zero shuffles") {
    // range search has no global order, so unlike s01 there is no top-k
    // exchange either: any Exchange here means the scan-local plan broke
    val p = finalPlan("s23_radius_search")
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
      s"radius search must not shuffle:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("g08 CF similarity: pairs keyed on customer; degrees broadcast") {
    val p = finalPlan("g08_cf_similarity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"co-purchase projection degraded to all-pairs:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin"), "degree pricing must broadcast")
  }

  test("q99 concurrency: sweep never degrades to an interval join") {
    // the window halves run before the localCheckpoint barriers, so the
    // final plan is the peak agg + probe join — the pin is that no stage
    // re-introduced the quadratic interval x interval formulation
    val p = finalPlan("q99_concurrency")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"sweep line degraded to interval join:\n${p.take(1200)}")
  }

  test("m15 dHash: banded join stays keyed — never a cartesian/nested loop") {
    val p = finalPlan("m15_dhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded Hamming join degraded to all-pairs:\n${p.take(1200)}")
  }

  test("t27 RAKE: islands window partitions by document, never one reducer") {
    val df = SparkEntry.queries("t27_rake_keyphrases")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(doc_id"),
      s"islands window must partition per document:\n${p.take(1200)}")
  }

  test("c30 exemplar gains: candidate pool broadcasts; gain agg is partial/final") {
    val df = SparkEntry.queries("c30_exemplar_selection")(spark, sf)
    df.collect()
    // the trajectory frame itself is driver-built (5 rows); pin the sims
    // construction instead: corpus x pool must be a broadcast nested loop
    // over the 32-row pool at worst, never a shuffled cross of two big sides
    import graft.functions.VectorFunctions.cosine_similarity
    import org.apache.spark.sql.functions.{broadcast, col, round}
    val e = Tables.embeddings(spark, sf)
    val cand = e.filter(col("vec_id") < 32)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val sims = e.crossJoin(broadcast(cand))
      .select(col("vec_id").as("v"), col("c_id"),
        round(cosine_similarity(col("embedding"), col("c_emb")) * 1000000)
          .cast("long").as("sim"))
    sims.count()
    val p = sims.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"),
      s"candidate pool must broadcast:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"),
      s"corpus x pool must not shuffle the corpus:\n${p.take(1200)}")
  }

  test("d27 SNM: candidate join keyed on position, never all-pairs") {
    // the pid-keyed two-phase position windows run BEFORE the
    // localCheckpoint barrier (q99's situation), so the final plan starts
    // at the checkpointed RDD — the pin here is that the window-w
    // candidate stage stays an equi-join on position
    val p = finalPlan("d27_snm_linkage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"window-offset candidate join degraded to all-pairs:\n${p.take(1200)}")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"candidate join must be keyed on position:\n${p.take(1200)}")
  }

  test("d28 winnowing: fingerprint join keyed, never a cartesian") {
    val p = finalPlan("d28_winnowing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fingerprint pair join degraded to all-pairs:\n${p.take(1200)}")
  }

  test("t28 trigram search: pattern side broadcasts; candidate join keyed on trigram") {
    val p = finalPlan("t28_trigram_search")
    assert(p.contains("BroadcastExchange"),
      s"4-pattern trigram side must broadcast:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation degraded to all-pairs:\n${p.take(1200)}")
  }

  test("q124 nearest asof: both direction windows ride ONE user_id shuffle") {
    val p = finalPlan("q124_asof_nearest")
    // the back and forward windows share the (user, ts) sort, so one
    // Exchange must serve both — a second means the frames split
    val finalSection = p.split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(finalSection).size == 1,
      s"q124 must shuffle exactly once on user_id:\n${finalSection.take(1200)}")
  }

  test("t29 TextRank rounds: keyed joins only, never a nested loop") {
    val p = finalPlan("t29_textrank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"a TextRank round degraded to all-pairs:\n${p.take(1200)}")
  }

  test("d32 AllPairs: candidate and verify joins stay keyed on term") {
    val p = finalPlan("d32_allpairs_cosine")
    assert(!p.contains("CartesianProduct"),
      s"AllPairs degraded to a cartesian:\n${p.take(1200)}")
    // the only nested loops allowed are the 1-row n_docs scalar crosses
    val bnlj = p.split("\n").filter(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj.forall(_.contains("n_docs")),
      s"a non-scalar nested loop appeared:\n${bnlj.mkString("\n").take(1200)}")
  }

  test("s30 compacted index: query path reads ONLY the compacted codes files") {
    val df = SparkEntry.queries("s30_index_compaction")(spark, sf)
    df.collect()
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("pq_codes_compacted")),
      s"s30 must serve from the compacted table alone: ${files.take(5).mkString(", ")}")
  }

  test("q133 bucketed join: fact rows never shuffle; one exchange total (the rollup)") {
    val p = finalPlan("q133_bucketed_join").split("== Initial Plan ==").head
    assert(p.contains("SortMergeJoin"), p.take(800))
    // the plan string is top-down: everything from the join node on is the
    // fact-side subtree — bucketed scans feed it with no exchange anywhere
    val below = p.substring(p.indexOf("SortMergeJoin"))
    assert(!below.contains("Exchange"),
      s"bucketed fact sides must not shuffle:\n${below.take(1200)}")
    // the only exchange in the whole plan is the 5-row priority rollup of
    // per-order partials — the layout's residual shuffle
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly one exchange (the rollup):\n${p.take(1200)}")
  }

  test("q139 appended layout: the zero-exchange join survives growth") {
    val p = finalPlan("q139_bucketed_append").split("== Initial Plan ==").head
    assert(p.contains("SortMergeJoin"), p.take(800))
    val below = p.substring(p.indexOf("SortMergeJoin"))
    assert(!below.contains("Exchange"),
      s"delta-appended bucketed sides must still not shuffle:\n${below.take(1200)}")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly one exchange (the rollup):\n${p.take(1200)}")
  }

  test("q134 partitioned layout: non-matching lang directories never read") {
    val df = SparkEntry.queries("q134_partitioned_scan")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"lang filter must prune partitions, not rows:\n${p.take(1200)}")
    // inputFiles lists the whole relation pre-pruning; the scan's runtime
    // numFiles metric is what pruning actually left — one file (the single
    // lang=de directory holds one file by the store's repartition-by-lang)
    def collectScans(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectScans(a.executedPlan)
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectScans(st.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(collectScans)
    }
    val scans = collectScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, p.take(800))
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    assert(filesRead == 1,
      s"pruned scan must read exactly the lang=de file, read $filesRead")
  }

  test("q135 salted join: runs on the widened (key, salt) pair, no broadcast") {
    val p = finalPlan("q135_salted_join").split("== Initial Plan ==").head
    assert(p.contains("SortMergeJoin [l_partkey"), p.take(800))
    val keys = p.substring(p.indexOf("SortMergeJoin"),
      p.indexOf("\n", p.indexOf("SortMergeJoin")))
    assert(keys.contains("salt"), s"join must include the salt key: $keys")
    assert(!p.contains("BroadcastHashJoin"),
      "salting targets the no-broadcast case; a broadcast voids the demo")
  }

  test("two-phase scans (q136/st17): every window pid-partitioned, never one reducer") {
    // each computes a global order statistic (positions / prefix max) that
    // a naive plan funnels through one single-partition WINDOW; the
    // two-phase idiom must keep every window pid-partitioned. (Ungrouped
    // aggregates still end in a SinglePartition exchange of map-side
    // PARTIALS — metadata-sized and fine — so the pin inspects window
    // operators, not exchanges.)
    def windows(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        windows(a.executedPlan)
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        windows(st.plan)
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    // t41 is omitted: its position windows sit behind a localCheckpoint so
    // the final plan starts from the checkpointed RDD; the same pid-keyed
    // idiom is exercised here via q136 and semantics-pinned by t41's spec
    for (name <- Seq("q136_range_boundaries", "st17_late_data_audit")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val ws = windows(df.queryExecution.executedPlan)
      assert(ws.nonEmpty, s"$name should compute through windows")
      ws.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$name runs an UNPARTITIONED window (single-reducer funnel): $w"))
    }
  }

  test("kmeans assignment: pure projection, zero exchanges") {
    import graft.functions.KMeans
    val e = Tables.embeddings(spark, sf)
    val cells = KMeans.fit(e, "vec_id", "embedding", k = 4, iterations = 1)
    val assigned = KMeans.assign(e, cells, "embedding")
    assigned.count()
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"nearest-centroid assignment must not shuffle:\n${p.take(1200)}")
    assert(!p.contains("Window"), "assignment must not use a per-row window")
  }

  private def fileScans(pl: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = pl match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(st.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  test("q140 zone maps: only date-overlapping files are read") {
    val df = SparkEntry.queries("q140_zone_map_skip")(spark, sf)
    df.collect()
    val (_, statsDir) = graft.operators.Buckets.zoneMapOrders(spark, sf)
    import org.apache.spark.sql.functions.expr
    val stats = spark.read.parquet(statsDir)
      .select(
        expr("CAST(max_date >= TIMESTAMP'1995-01-01 00:00:00' AND " +
          "min_date <= TIMESTAMP'1995-12-31 23:59:59' AS BOOLEAN)").as("hit"))
      .collect().map(_.getBoolean(0))
    val overlap = stats.count(identity)
    // the 1995 predicate must not survive a full read: the range-clustered
    // layout puts ~1 year in a few of the 16 files
    assert(overlap < stats.length,
      s"fixture degenerate: predicate overlaps all ${stats.length} files")
    val filesRead =
      fileScans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    assert(filesRead == overlap,
      s"zone-map skip must read exactly the $overlap overlapping files, read $filesRead")
  }

  test("q141 deletion vectors: anti-join broadcasts; base files never rewritten") {
    val df = SparkEntry.queries("q141_deletion_vectors")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"DV apply must be a broadcast anti-join:\n${p.take(1200)}")
    // merge-on-read: the only data inputs are the ORIGINAL base parquet and
    // the vector table — no rewritten copy of lineitem anywhere
    val files = df.inputFiles
    assert(files.exists(_.contains("lineitem.parquet")) &&
      files.exists(_.contains("li_dv")),
      s"unexpected inputs: ${files.take(5).mkString(", ")}")
    assert(files.forall(f => f.contains("lineitem.parquet") || f.contains("li_dv")),
      s"DV read must not touch a rewritten base: ${files.take(5).mkString(", ")}")
  }

  test("q147 bloom pruning: might_contain injected on the probe side; confs restored") {
    val before = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => spark.conf.getOption(k))
    // the registry entry checkpoints eagerly; to see the plan, rebuild the
    // join under the same demo confs
    import org.apache.spark.sql.functions.{col, count, lit}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val j = Tables.lineitem(spark, sf).select(col("l_orderkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"runtime bloom filter not injected:\n${p.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        before(0).getOrElse("10MB"))
      before(1).fold(spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))(
        spark.conf.set(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", _))
    }
    // and the registry entry itself must leave no conf residue
    val snap = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => spark.conf.getOption(k))
    SparkEntry.queries("q147_bloom_join_pruning")(spark, sf).collect()
    val after = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => spark.conf.getOption(k))
    assert(after == snap, s"q147 leaked conf changes: $snap -> $after")
  }

  test("q148 appended zone map: reads base overlap plus exactly the delta file") {
    val df = SparkEntry.queries("q148_zone_map_append")(spark, sf)
    df.collect()
    val q140 = SparkEntry.queries("q140_zone_map_skip")(spark, sf)
    q140.collect()
    val baseOverlap =
      fileScans(q140.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    val filesRead =
      fileScans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    // the delta file spans the full date range, so it always overlaps; the
    // base partitioning is identical to q140's layout
    assert(filesRead == baseOverlap + 1,
      s"expected base overlap $baseOverlap + 1 delta, read $filesRead")
  }

  test("q149 cube navigator: fact table never scanned, only the cube store") {
    val df = SparkEntry.queries("q149_cube_reuse")(spark, sf)
    df.collect()
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("orders_cube")),
      s"rollups must serve from the cube alone: ${files.take(5).mkString(", ")}")
  }

  test("st18 streamed layout: the 1996 census reads exactly one band file") {
    val df = SparkEntry.queries("st18_stream_layout")(spark, sf)
    df.collect()
    // four year-band files in the streamed manifest; the 1996 predicate
    // must prune to its own band
    val files = df.inputFiles
    assert(files.length == 1,
      s"zone pruning over the streamed manifest failed: ${files.length} files")
    val (_, statsDir) = graft.operators.Buckets.streamedLayout(spark, sf)
    assert(spark.read.parquet(statsDir).count() == 4,
      "manifest must know exactly the four band files")
  }

  test("q153 merge-on-read: base untouched; anti-join broadcasts") {
    val df = SparkEntry.queries("q153_merge_on_read")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"merge DV must apply as a broadcast anti-join:\n${p.take(1200)}")
    val files = df.inputFiles
    assert(files.exists(_.contains("lineitem.parquet")) &&
      files.exists(_.contains("li_merge")),
      s"unexpected inputs: ${files.take(5).mkString(", ")}")
    assert(files.forall(f =>
      f.contains("lineitem.parquet") || f.contains("li_merge")),
      s"merge read must not touch a rewritten base: ${files.take(5).mkString(", ")}")
  }

  test("st19 streamed deletes: the redelivered batch left duplicate DV rows, harmlessly") {
    SparkEntry.queries("st19_stream_deletes")(spark, sf).collect()
    val dv = spark.read.parquet(
      graft.operators.Buckets.streamedDeleteVectors(spark, sf))
    val (all, distinct) = (dv.count(), dv.distinct().count())
    assert(all > distinct,
      s"batch-1 redelivery should have duplicated positions: $all vs $distinct")
    // and the hash gate (st19 vs the raw-predicate oracle) proves those
    // duplicates cannot over-delete — checked here too for fast failure
    import org.apache.spark.sql.functions.col
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 83 =!= 0).count()
    val live = SparkEntry.queries("st19_stream_deletes")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(col("n_live"))).collect()(0).getLong(0)
    assert(live == expected)
  }

  test("q142 time travel: the v1 manifest never reads the delta file") {
    SparkEntry.queries("q142_time_travel")(spark, sf).collect()
    val dir = graft.operators.Buckets.ordersSnapshots(spark, sf)
    val v1 = graft.operators.Buckets.snapshotRead(spark, dir, 1)
    val v1Files = v1.inputFiles
    assert(v1Files.nonEmpty && v1Files.forall(_.contains("/base/")),
      s"v1 snapshot leaked post-commit files: ${v1Files.mkString(", ")}")
    // snapshot isolation: v1 re-read AFTER the v2 commit still equals the
    // pre-1997 slice exactly
    import org.apache.spark.sql.functions.{col, lit}
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")).count()
    assert(v1.count() == expected)
  }

  test("q157 bitmaps: one scan builds all three predicate masks, no join") {
    val p = finalPlan("q157_bitmap_rollup")
    // the AQE plan string prints Final + Initial sections, doubling each
    // scan's appearance: 2 real scans (mask build + direct audit) == 4
    // occurrences; the pre-fix 7-way UNION ALL showed 28
    assert(p.split("Scan parquet").length - 1 <= 4,
      "bitmap build + direct audit should cost at most two orders scans")
    assert(!p.contains("SortMergeJoin"),
      "the chunk-aligned mask table must not sort-merge")
  }

  test("q161 two-pass median: no global Sort over the full value set") {
    val p = finalPlan("q161_twopass_median")
    // pass 2's window sorts ONE bucket inside a single partition; a
    // regression to full-table ordering would appear as a rangepartitioned
    // global sort (Exchange rangepartitioning) — pin its absence
    assert(!p.contains("rangepartitioning"),
      "two-pass median regressed to a global sort")
  }

  test("q155 schema evolution: the census never rescans raw orders") {
    val p = finalPlan("q155_schema_evolution")
    assert(!p.contains("orders.parquet"),
      "evolved-layout read leaked a raw orders scan")
  }

  test("q168 pattern: ONE user_id exchange, every window user-keyed") {
    // the MATCH_RECOGNIZE spelling's whole 100 TB claim: the events scan
    // shuffles ONCE on user_id and all four window passes + the runs
    // aggregate reuse that partitioning
    val p0 = finalPlan("q168_match_recognize")
    // AQE prints "== Initial Plan ==" after the final plan — count only
    // the final section or the same exchange is tallied twice
    val p = p0.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges")
    assert(!p.contains("SinglePartition"),
      "a global single-partition window crept into the pattern pass")
  }

  test("q170 alternation pattern: ONE user_id exchange, every window user-keyed") {
    // q168's economics must survive the richer pattern: the stretch
    // islands pass and both aggregates are user-keyed, so the events scan
    // still shuffles exactly once
    val p = finalPlan("q170_pattern_alternation").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges")
    assert(!p.contains("SinglePartition"),
      "a global single-partition window crept into the pattern pass")
  }

  test("c56 pairs: strengths broadcast; the bout screen never shuffles them") {
    val p = finalPlan("c56_preference_pairs")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "k-bounded strength join degraded to sort-merge")
  }

  test("c54 interleave: the position window stays pid-keyed, never one reducer") {
    // the range partitioning itself happens before the localCheckpoint
    // (lineage truncated), so the final plan's window is the pin: it must
    // be keyed by pid, and nothing may collapse to a single partition
    val p = finalPlan("c54_smooth_interleave")
    assert(p.contains("Window") && p.contains("[pid#"),
      "the global-position window lost its pid partitioning")
    assert(!p.contains("SinglePartition"),
      "a global single-partition stage crept into the interleave")
  }
}
