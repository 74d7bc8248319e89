package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale evidence: synthesizes a 10x documents corpus (~50k docs from
  * sf0.1 x 10 with distinct doc_ids) in /tmp, then times the near-dup
  * pipelines on 1x vs 10x to show the growth curve is the candidate-pair
  * count (by construction every doc now has 9 perfect duplicates, so the
  * LSH join output scales ~100x while the scan scales 10x).
  *   runMain graft.tools.ScaleProbe
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val base = "/root/testdata/sf0.1"
    // stable path, not createTempDirectory: repeated probe runs overwrite
    // ONE 10x corpus instead of leaking ~1.5 GB of /tmp copies per run
    val big = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_probe_sf1x10").toString
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val n = docs.count()
    (0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")
    // 10x embeddings for the ANN probes: vec_ids offset per copy, labels
    // and vectors unchanged — IVF cells and label buckets grow 10x deep
    // while the query side stays the same 10 vectors (vec_id < 10 only
    // matches copy 0), so the probe measures candidate-set growth
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until 10).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    // 10x order graph for g01: orderkeys and CUSTOMERS offset per copy,
    // suppliers shared — so supplier in-degree grows 10x (the hub-skew
    // shape a 100 TB link graph actually has), not 10 disconnected copies
    val orders = spark.read.parquet(s"$base/orders.parquet")
    (0 until 10).map(i => orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/orders.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    (0 until 10).map(i => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/lineitem.parquet")
    // 10x events for st07: same timestamps (same windows), 10x the rows —
    // the heavy-hitter agg must stay agg-bound, not window-spine-bound
    val ev = spark.read.parquet(s"$base/events.parquet")
    (0 until 10).map(i => ev.withColumn("event_id", col("event_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/events.parquet")
    // 10x customer/supplier for d20: keys offset per copy, names (and so
    // the parsed linkage suffixes) and nationkeys unchanged — every block
    // gets 10x deeper on BOTH sides, candidate pairs grow ~100x: the
    // blocked-join growth curve record linkage must survive
    val cust = spark.read.parquet(s"$base/customer.parquet")
    (0 until 10).map(i => cust.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/customer.parquet")
    val supp = spark.read.parquet(s"$base/supplier.parquet")
    (0 until 10).map(i => supp.withColumn("s_suppkey", col("s_suppkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/supplier.parquet")
    // tiny dimensions copy verbatim — queries joining nation/region
    // (q125/q128) crash on a corpus dir missing them (found when the
    // 10x q125 probe silently killed the rest of its run)
    for (t <- Seq("nation", "region", "part"))
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$big/$t.parquet")
    // dev-only filter: `runMain graft.tools.ScaleProbe d24,g10` times only
    // probes whose name contains one of the substrings (new-wave iteration
    // without re-running the whole shelf)
    val only: Option[Seq[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSeq) else None
    def time(name: String)(f: => Long): Unit = {
      if (only.exists(o => !o.exists(name.contains))) return
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($rows rows)")
    }
    println(s"[probe] corpus 1x = $n docs, 10x = ${n * 10} docs")
    for (sf <- Seq(base, big)) {
      val tag = if (sf == base) "1x " else "10x"
      time(s"$tag d02_content_hash")(
        graft.operators.DedupQueries.d02_dedup_content_hash(spark, sf).count())
      time(s"$tag d03_minhash_lsh")(
        graft.operators.DedupQueries.d03_dedup_minhash_lsh(spark, sf).count())
      time(s"$tag d05_ngram_jaccard")(
        graft.operators.DedupQueries.d05_ngram_jaccard(spark, sf).count())
      // d08 = d03 + anti-join + agg; with the localCheckpoint fix its cost
      // should track d03's (round 1: 14.3s vs 0.75s from the 4x recompute)
      time(s"$tag d08_dedup_apply")(
        graft.operators.DedupQueries.d08_dedup_apply(spark, sf).count())
      // round-3 additions: decontamination probes and passage stats. All
      // should grow ~linearly in corpus tokens (broadcast probe / df
      // aggregate), never pairwise — the 10x run is the check
      time(s"$tag c08_decontaminate")(
        graft.operators.CurationQueries.c08_decontaminate(spark, sf).count())
      time(s"$tag c09_decontaminate_ngram")(
        graft.operators.CurationQueries.c09_decontaminate_ngram(spark, sf).count())
      time(s"$tag d12_passage_stats")(
        graft.operators.DedupQueries.d12_passage_stats(spark, sf).count())
      time(s"$tag t08_repetition")(
        graft.operators.TextQueries.t08_repetition(spark, sf).count())
      // round-4 additions: d14's rewrite must stay linear in gram
      // occurrences (it is d12's machinery + a per-row lambda — with 9
      // clones per doc EVERY gram is shared, so output text shrinks but
      // row count stays 10x); t10 is a pure scan-side regex pass
      time(s"$tag d14_passage_dedup_apply")(
        graft.operators.DedupQueries.d14_passage_dedup_apply(spark, sf).count())
      time(s"$tag t10_bpe_tokenize")(
        graft.operators.TextQueries.t10_bpe_tokenize(spark, sf).count())
      // round-4 third wave: the bloom screen must track c09 (probe-bound),
      // the funnel is one scan + 6-group agg, pagerank's joins face 10x
      // edges with 10x supplier in-degree (hub skew -> AQE split), and the
      // trending agg sees 10x rows into the same window set
      time(s"$tag c13_decontaminate_bloom")(
        graft.operators.CurationQueries.c13_decontaminate_bloom(spark, sf).count())
      time(s"$tag t12_filter_funnel")(
        graft.operators.TextQueries.t12_filter_funnel(spark, sf).count())
      time(s"$tag g01_pagerank")(
        graft.operators.GraphQueries.g01_pagerank(spark, sf).count())
      time(s"$tag st07_trending")(
        graft.operators.StreamingQueries.st07_trending(spark, sf).count())
      // ANN family at 10x vectors: brute force scans 10x (the baseline
      // cost), IVF routes into 10x-deeper cells (~10x candidates at the
      // same cell count), s15's prefix shortlist stays k-bounded after a
      // 10x cheap pass, d15's cell-bounded pairs grow with cell depth
      time(s"$tag s01_knn_bruteforce")(
        graft.operators.SimilarityQueries.s01_knn_bruteforce(spark, sf).count())
      time(s"$tag s04_ivf_ann")(
        graft.operators.SimilarityQueries.s04_ivf_ann(spark, sf).count())
      time(s"$tag s10_ivf_pq")(
        graft.operators.SimilarityQueries.s10_ivf_pq(spark, sf).count())
      time(s"$tag s15_truncated_rerank")(
        graft.operators.SimilarityQueries.s15_truncated_rerank(spark, sf).count())
      time(s"$tag s16_mmr_rerank")(
        graft.operators.SimilarityQueries.s16_mmr_rerank(spark, sf).count())
      time(s"$tag d15_semdedup")(
        graft.operators.DedupQueries.d15_semdedup(spark, sf).count())
      // fifth wave: sessionize/scd2 see 10x rows per user partition (same
      // users, same timestamps — window+agg work grows, session structure
      // doesn't); g04's co-occurrence counts grow 10x on the shared
      // suppliers, so the thresholded graph gets DENSER, not just bigger
      time(s"$tag q74_sessionize")(
        graft.operators.RelationalQueries.q74_sessionize(spark, sf).count())
      time(s"$tag q75_scd2")(
        graft.operators.RelationalQueries.q75_scd2(spark, sf).count())
      time(s"$tag g04_bfs_hops")(
        graft.operators.GraphQueries.g04_bfs_hops(spark, sf).count())
      time(s"$tag q76_freq_items")(
        graft.operators.SketchQueries.q76_freq_items(spark, sf).count())
      // sixth wave: g05's peel faces the DENSER 10x co-supplier graph
      // (same thresholded-projection economics as g04), t16/c19 are
      // explode-then-agg and must scale with corpus tokens/rows, never
      // worse
      time(s"$tag g05_kcore")(
        graft.operators.GraphQueries.g05_kcore(spark, sf).count())
      time(s"$tag t16_vocab_stats")(
        graft.operators.TextQueries.t16_vocab_stats(spark, sf).count())
      time(s"$tag c19_epoch_mixture")(
        graft.operators.CurationQueries.c19_epoch_mixture(spark, sf).count())
      // m09's pairs grow with bucket depth squared (10x docs with copies
      // -> ~100x pairs, like d03): output-bound, never all-pairs
      time(s"$tag m09_feature_neardup")(
        graft.operators.MultimodalQueries.m09_feature_neardup(spark, sf).count())
      // seventh wave: d17's clone families put every gram at df=10 (inside
      // the 2..16 pair band), so every clone pair shares its full text —
      // match rows and spans grow ~45x (C(10,2) pairs per family): the
      // probe shows wall tracks OUTPUT, never corpus^2. s19 is a pure
      // 10x kernel scan (query side fixed); s20's multiprobe candidates
      // grow with bucket depth (~10x)
      time(s"$tag d17_substring_spans")(
        graft.operators.DedupQueries.d17_substring_spans(spark, sf).count())
      time(s"$tag s19_late_interaction")(
        graft.operators.SimilarityQueries.s19_late_interaction(spark, sf).count())
      time(s"$tag s20_multiprobe_lsh")(
        graft.operators.SimilarityQueries.s20_multiprobe_lsh(spark, sf).count())
      // eighth wave: d19's duplicate-line list grows with distinct
      // boilerplate lines (clone families make EVERY line df>=10, so all
      // text is struck — worst-case strike volume, still one agg + one
      // anti join); t18's model stays |V| x |classes| at any corpus size
      // (training aggregates absorb 10x tokens map-side); q90 merges 10x
      // partial blobs into the same 10 cohort pairs; s21 is s01's scan
      // with a 10x-deeper vote table; q91/m10 are scan-bound projections
      time(s"$tag d19_line_dedup")(
        graft.operators.DedupQueries.d19_line_dedup(spark, sf).count())
      time(s"$tag t18_nb_classifier")(
        graft.operators.TextQueries.t18_nb_classifier(spark, sf).count())
      time(s"$tag q90_theta_overlap")(
        graft.operators.SketchQueries.q90_theta_overlap(spark, sf).count())
      time(s"$tag s21_knn_classify")(
        graft.operators.SimilarityQueries.s21_knn_classify(spark, sf).count())
      time(s"$tag q91_zorder")(
        graft.operators.RelationalQueries.q91_zorder(spark, sf).count())
      // ninth wave: d20's candidate pairs grow ~100x (10x-deep blocks on
      // both sides) but stay Σ|block_c|·|block_s| — wall must track pair
      // count, never |C|x|S|; q93 is one full outer join on 10x keys
      // (linear); s22 projects 10x vectors once and rides the partial
      // heaps (shortlist stays 50/query); st11's state machine sees 10x
      // events per user with an unchanged session structure
      time(s"$tag d20_record_linkage")(
        graft.operators.DedupQueries.d20_record_linkage(spark, sf).count())
      time(s"$tag q93_snapshot_diff")(
        graft.operators.RelationalQueries.q93_snapshot_diff(spark, sf).count())
      time(s"$tag q94_view_maintain")(
        graft.operators.RelationalQueries.q94_view_maintain(spark, sf).count())
      time(s"$tag s22_jl_projection")(
        graft.operators.SimilarityQueries.s22_jl_projection(spark, sf).count())
      time(s"$tag st11_stateful_sessions")(
        graft.operators.StreamingQueries.st11_stateful_sessions(spark, sf).count())
      time(s"$tag c21_sample_k_per_group")(
        graft.operators.CurationQueries.c21_sample_k_per_group(spark, sf).count())
      time(s"$tag q95_seasonal_anomaly")(
        graft.operators.RelationalQueries.q95_seasonal_anomaly(spark, sf).count())
      time(s"$tag q96_scd2_lookup")(
        graft.operators.RelationalQueries.q96_scd2_lookup(spark, sf).count())
      time(s"$tag t19_auc")(
        graft.operators.TextQueries.t19_auc(spark, sf).count())
      time(s"$tag c22_preprocess_recipe")(
        graft.operators.CurationQueries.c22_preprocess_recipe(spark, sf).count())
      time(s"$tag d21_multiblock_linkage")(
        graft.operators.DedupQueries.d21_multiblock_linkage(spark, sf).count())
      time(s"$tag q97_event_pathing")(
        graft.operators.RelationalQueries.q97_event_pathing(spark, sf).count())
      time(s"$tag q98_cms_rollup")(
        graft.operators.SketchQueries.q98_cms_rollup(spark, sf).count())
      time(s"$tag g07_ppr")(
        graft.operators.GraphQueries.g07_ppr(spark, sf).count())
      time(s"$tag s23_radius_search")(
        graft.operators.SimilarityQueries.s23_radius_search(spark, sf).count())
      time(s"$tag q99_concurrency")(
        graft.operators.RelationalQueries.q99_concurrency(spark, sf).count())
      time(s"$tag m11_cdc_chunks")(
        graft.operators.MultimodalQueries.m11_cdc_chunks(spark, sf).count())
      time(s"$tag t20_zipf_fit")(
        graft.operators.TextQueries.t20_zipf_fit(spark, sf).count())
      time(s"$tag q100_sequence_match")(
        graft.operators.RelationalQueries.q100_sequence_match(spark, sf).count())
      time(s"$tag c23_split_repair")(
        graft.operators.CurationQueries.c23_split_repair(spark, sf).count())
      time(s"$tag d22_containment")(
        graft.operators.DedupQueries.d22_containment(spark, sf).count())
      time(s"$tag c24_filter_sweep")(
        graft.operators.CurationQueries.c24_filter_sweep(spark, sf).count())
      time(s"$tag g08_cf_similarity")(
        graft.operators.GraphQueries.g08_cf_similarity(spark, sf).count())
      time(s"$tag d23_canonical_pick")(
        graft.operators.DedupQueries.d23_canonical_pick(spark, sf).count())
      time(s"$tag q101_twap")(
        graft.operators.RelationalQueries.q101_twap(spark, sf).count())
      time(s"$tag d24_ppjoin")(
        graft.operators.DedupQueries.d24_ppjoin(spark, sf).count())
      time(s"$tag q102_bottomk_rollup")(
        graft.operators.SketchQueries.q102_bottomk_rollup(spark, sf).count())
      time(s"$tag q103_moments_rollup")(
        graft.operators.SketchQueries.q103_moments_rollup(spark, sf).count())
      time(s"$tag m12_delta_transfer")(
        graft.operators.MultimodalQueries.m12_delta_transfer(spark, sf).count())
      time(s"$tag g09_degree_dist")(
        graft.operators.GraphQueries.g09_degree_dist(spark, sf).count())
      time(s"$tag t21_readability")(
        graft.operators.TextQueries.t21_readability(spark, sf).count())
      // seventeenth wave: s24's signature pass rides the scan (10x) with a
      // k-bounded Hamming shortlist; c25's model stays 8192 buckets at any
      // corpus size; c26 probes a STORED index (build amortized; keyed per
      // corpus so the 10x run builds its own once); g10/g11 face the
      // 10x-denser co-supplier graph (wedge join / BFS state growth);
      // t22's word join is linear in matching tokens; q104 is one window
      // over 10x rows
      time(s"$tag s24_binary_quant")(
        graft.operators.SimilarityQueries.s24_binary_quant(spark, sf).count())
      time(s"$tag c25_dsir_weights")(
        graft.operators.CurationQueries.c25_dsir_weights(spark, sf).count())
      time(s"$tag c26_persisted_bloom")(
        graft.operators.CurationQueries.c26_persisted_bloom(spark, sf).count())
      time(s"$tag g10_ktruss")(
        graft.operators.GraphQueries.g10_ktruss(spark, sf).count())
      time(s"$tag g11_harmonic")(
        graft.operators.GraphQueries.g11_harmonic_centrality(spark, sf).count())
      time(s"$tag t22_phrase_search")(
        graft.operators.TextQueries.t22_phrase_search(spark, sf).count())
      time(s"$tag q104_asof_tolerance")(
        graft.operators.RelationalQueries.q104_asof_tolerance(spark, sf).count())
      // eighteenth wave: s26 is a scan-bound kernel pass; s27 probes STORED
      // signatures (16 bytes/row through the shortlist); t24 probes stored
      // postings; q107 windows over |days| partials regardless of order
      // count; m13's kernel pass is linear with a broadcast query side;
      // c28's two-phase position scan is the 10x-rows stress of c17's shape
      time(s"$tag s26_mips")(
        graft.operators.SimilarityQueries.s26_mips_augmented(spark, sf).count())
      time(s"$tag s27_persisted_sigs")(
        graft.operators.SimilarityQueries.s27_persisted_signatures(spark, sf).count())
      time(s"$tag t24_persisted_bm25")(
        graft.operators.TextQueries.t24_persisted_bm25(spark, sf).count())
      time(s"$tag q107_rolling_ols")(
        graft.operators.RelationalQueries.q107_rolling_ols(spark, sf).count())
      time(s"$tag m13_visual_search")(
        graft.operators.MultimodalQueries.m13_visual_search(spark, sf).count())
      time(s"$tag c28_training_order")(
        graft.operators.CurationQueries.c28_training_order(spark, sf).count())
      // nineteenth wave: g12's wedge join runs over a k-bounded (top-200)
      // edge list at any scale; t25 is linear in matching tokens with a
      // k-bounded head; m14 is one lag window over frames; q108's prefix
      // scan is pid-parallel; q109 is two grouped exact percentiles
      time(s"$tag g12_link_prediction")(
        graft.operators.GraphQueries.g12_link_prediction(spark, sf).count())
      time(s"$tag t25_kwic")(
        graft.operators.TextQueries.t25_kwic(spark, sf).count())
      time(s"$tag m14_shot_boundaries")(
        graft.operators.MultimodalQueries.m14_shot_boundaries(spark, sf).count())
      time(s"$tag q108_pareto_abc")(
        graft.operators.RelationalQueries.q108_pareto_abc(spark, sf).count())
      time(s"$tag q109_mad_outliers")(
        graft.operators.RelationalQueries.q109_mad_outliers(spark, sf).count())
      // twentieth wave: g14's triangle join is edge-oriented (canonical
      // a<b<c, never wedge-quadratic at hubs); t26 is two token-scan
      // aggregates + vocabulary-sized joins; m15's banded Hamming join on
      // the clone-densified corpus is OUTPUT-bound (every doc gains 9
      // identical copies, so planted pairs grow ~100x by construction);
      // q110/q111 are scan + tiny aggregates / a 3-group window
      time(s"$tag g14_local_clustering")(
        graft.operators.GraphQueries.g14_local_clustering(spark, sf).count())
      time(s"$tag t26_collocations")(
        graft.operators.TextQueries.t26_collocations(spark, sf).count())
      time(s"$tag m15_dhash_neardup")(
        graft.operators.MultimodalQueries.m15_dhash_neardup(spark, sf).count())
      time(s"$tag q110_ab_test")(
        graft.operators.RelationalQueries.q110_ab_test(spark, sf).count())
      time(s"$tag q111_weighted_median")(
        graft.operators.RelationalQueries.q111_weighted_median(spark, sf).count())
      // wave 21: q112's window runs over day-grain partials (|days| rows at
      // any fact size); g15 is two keyed joins + community aggregates; t27's
      // islands window partitions per document
      time(s"$tag q112_ewma")(
        graft.operators.RelationalQueries.q112_ewma(spark, sf).count())
      time(s"$tag g15_modularity")(
        graft.operators.GraphQueries.g15_modularity(spark, sf).count())
      time(s"$tag t27_rake")(
        graft.operators.TextQueries.t27_rake_keyphrases(spark, sf).count())
      // c30's five rounds are each one |corpus| x 32 join+agg; q113 ranks
      // dimension-sized partials
      time(s"$tag c30_exemplar_selection")(
        graft.operators.CurationQueries.c30_exemplar_selection(spark, sf).count())
      time(s"$tag q113_topn_other")(
        graft.operators.RelationalQueries.q113_topn_other(spark, sf).count())
      // s28 scans the corpus once for all four sweep points; candidate
      // growth is the same cells-get-deeper curve as s04/s08
      time(s"$tag s28_recall_sweep")(
        graft.operators.SimilarityQueries.s28_recall_sweep(spark, sf).count())
      // wave 23: q114 windows over day-grain partials; q115 is seven keyed
      // left joins; g16 builds all monthly edge lists in one shuffle
      time(s"$tag q114_running_distinct")(
        graft.operators.RelationalQueries.q114_running_distinct(spark, sf).count())
      time(s"$tag q115_ri_orphans")(
        graft.operators.RelationalQueries.q115_ri_orphans(spark, sf).count())
      time(s"$tag g16_graph_evolution")(
        graft.operators.GraphQueries.g16_graph_evolution(spark, sf).count())
      // wave 24: d26 is a blocked join through the codegen'd JW kernel;
      // c31 is one scan x 5-row spine
      time(s"$tag d26_jaro_linkage")(
        graft.operators.DedupQueries.d26_jaro_linkage(spark, sf).count())
      time(s"$tag c31_padding_sweep")(
        graft.operators.CurationQueries.c31_padding_sweep(spark, sf).count())
      // wave 25: q116/q117 window over day-grain/9-digit partials; q118's
      // fact-sized work is one map-side per-key count
      time(s"$tag q116_cusum")(
        graft.operators.RelationalQueries.q116_cusum(spark, sf).count())
      time(s"$tag q117_benford")(
        graft.operators.RelationalQueries.q117_benford(spark, sf).count())
      time(s"$tag q118_join_skew")(
        graft.operators.RelationalQueries.q118_join_skew(spark, sf).count())
      // wave 26: d27's candidate count is exactly n*w at any skew; d28's
      // pair join runs on the winnowed fingerprint sliver
      time(s"$tag d27_snm_linkage")(
        graft.operators.DedupQueries.d27_snm_linkage(spark, sf).count())
      time(s"$tag d28_winnowing")(
        graft.operators.DedupQueries.d28_winnowing(spark, sf).count())
      // wave 27: t28's index join is keyed on trigram (4-pattern side
      // broadcast); q119/q120/s29 are scan + metadata-sized tails
      time(s"$tag t28_trigram_search")(
        graft.operators.TextQueries.t28_trigram_search(spark, sf).count())
      time(s"$tag q119_psi_drift")(
        graft.operators.RelationalQueries.q119_psi_drift(spark, sf).count())
      time(s"$tag q120_winsorize")(
        graft.operators.RelationalQueries.q120_winsorize(spark, sf).count())
      time(s"$tag s29_centroid_drift")(
        graft.operators.SimilarityQueries.s29_centroid_drift(spark, sf).count())
      // wave 28: m16 is the frame kernel + per-doc windows; d29 is a
      // zero-shuffle scan projection + vocab-sized window
      time(s"$tag m16_vad_segments")(
        graft.operators.MultimodalQueries.m16_vad_segments(spark, sf).count())
      time(s"$tag d29_phonetic_keys")(
        graft.operators.DedupQueries.d29_phonetic_keys(spark, sf).count())
      // wave 29: t29's rounds are keyed joins over the vocab-sized edge
      // list; q121's one sort is |customers| rows, windows see 10
      time(s"$tag t29_textrank")(
        graft.operators.TextQueries.t29_textrank(spark, sf).count())
      time(s"$tag q121_lift_gains")(
        graft.operators.RelationalQueries.q121_lift_gains(spark, sf).count())
      // wave 30: q122 windows over day partials; c32 is the zero-shuffle
      // tokenize scan; st13 merges stored count partials
      time(s"$tag q122_sprt")(
        graft.operators.RelationalQueries.q122_sprt(spark, sf).count())
      time(s"$tag c32_tokenizer_fertility")(
        graft.operators.CurationQueries.c32_tokenizer_fertility(spark, sf).count())
      time(s"$tag st13_incremental_psi")(
        graft.operators.StreamingQueries.st13_incremental_psi(spark, sf).count())
      // wave 31: q123 windows over day partials + a 7-row broadcast
      time(s"$tag q123_seasonal_index")(
        graft.operators.RelationalQueries.q123_seasonal_index(spark, sf).count())
      // wave 32: c33 inherits its five components' audited shapes
      time(s"$tag c33_assembly")(
        graft.operators.CurationQueries.c33_assembly(spark, sf).count())
      // wave 33: q124 is two windows on one (user, ts) exchange
      time(s"$tag q124_asof_nearest")(
        graft.operators.RelationalQueries.q124_asof_nearest(spark, sf).count())
      // wave 34: d31 scores the dim-sized cross once per strategy; g17 is
      // one wedge join; q125 windows over |nations| partials
      time(s"$tag d31_blocking_audit")(
        graft.operators.DedupQueries.d31_blocking_audit(spark, sf).count())
      time(s"$tag g17_squares")(
        graft.operators.GraphQueries.g17_squares(spark, sf).count())
      time(s"$tag q125_share_of_parent")(
        graft.operators.RelationalQueries.q125_share_of_parent(spark, sf).count())
      // wave 35: s30's rewrite is one codes-table scan
      time(s"$tag s30_index_compaction")(
        graft.operators.SimilarityQueries.s30_index_compaction(spark, sf).count())
      // wave 36: d32's candidate join is prefix-filtered; clone output
      // grows with true pairs, never corpus^2
      time(s"$tag d32_allpairs_cosine")(
        graft.operators.DedupQueries.d32_allpairs_cosine(spark, sf).count())
      // wave 38: c34 is one hash + count agg; t30 joins vocab slivers
      time(s"$tag c34_split_balance")(
        graft.operators.CurationQueries.c34_split_balance(spark, sf).count())
      time(s"$tag t30_vocab_overlap")(
        graft.operators.TextQueries.t30_vocab_overlap(spark, sf).count())
      // wave 39: c35 is one md5 agg + semi join; m17 two keyed aggs
      time(s"$tag c35_mixture_drift")(
        graft.operators.CurationQueries.c35_mixture_drift(spark, sf).count())
      time(s"$tag m17_entropy_gate")(
        graft.operators.MultimodalQueries.m17_entropy_gate(spark, sf).count())
      // wave 40: s31 runs four scan-bound family pipelines once each
      time(s"$tag s31_compression_frontier")(
        graft.operators.SimilarityQueries.s31_compression_frontier(spark, sf).count())
      // wave 41: g18 is six keyed join+min rounds over monthly edges
      time(s"$tag g18_temporal_reach")(
        graft.operators.GraphQueries.g18_temporal_reach(spark, sf).count())
      // wave 42: q126 joins and sums over |days| partials
      time(s"$tag q126_autocorrelation")(
        graft.operators.RelationalQueries.q126_autocorrelation(spark, sf).count())
      // wave 43: q127 ranks |customers| partials once
      time(s"$tag q127_gini")(
        graft.operators.RelationalQueries.q127_gini(spark, sf).count())
      // wave 44: q128 sums |customers| terms; t31 is one vocab aggregate
      time(s"$tag q128_theil")(
        graft.operators.RelationalQueries.q128_theil(spark, sf).count())
      time(s"$tag t31_burstiness")(
        graft.operators.TextQueries.t31_burstiness(spark, sf).count())
      // wave 45: q129 anti-joins the |days| spine
      time(s"$tag q129_calendar_gaps")(
        graft.operators.RelationalQueries.q129_calendar_gaps(spark, sf).count())
      // round-7 wave: the TPC-H optimizer workload — the stress is the
      // JOIN SHAPES under 10x fact rows: h02's decorrelated min-subquery
      // re-join, h05's 6-relation reorder, h11's two-aggregates-one-scan,
      // h18's IN-over-HAVING, h21's double EXISTS self-joins (10x lines
      // per order on the shared-supplier clone corpus makes every order
      // multi-supplier, so the anti side grows too). All must stay
      // join/agg-bound — no plan may flip to nested-loop at scale (the
      // h-family PlanInvariantsSpec pin, re-verified here by wall-clock)
      time(s"$tag h02_min_cost_supplier")(
        graft.operators.TpchQueries.queries("h02_min_cost_supplier")(spark, sf).count())
      time(s"$tag h05_local_supplier_volume")(
        graft.operators.TpchQueries.queries("h05_local_supplier_volume")(spark, sf).count())
      time(s"$tag h11_important_stock")(
        graft.operators.TpchQueries.queries("h11_important_stock")(spark, sf).count())
      time(s"$tag h18_large_volume_customer")(
        graft.operators.TpchQueries.queries("h18_large_volume_customer")(spark, sf).count())
      time(s"$tag h21_waiting_suppliers")(
        graft.operators.TpchQueries.queries("h21_waiting_suppliers")(spark, sf).count())
      // round-7 wave: the persisted co-graph — time the one-off BUILD
      // (the corpus-scan pass every g-query used to pay inline) and the
      // post-build query side separately; the 10x build faces 10x lines
      // per order over shared suppliers (pair counts x10, pair SET ~flat)
      time(s"$tag co_graph_build") {
        val dir = new java.io.File(graft.operators.CoGraph.coDir(sf))
        val marker = new java.io.File(dir, "_complete")
        if (marker.exists()) { // force a fresh build so the probe times it
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
          }
          rm(dir)
        }
        graft.operators.CoGraph.pairs(spark, sf).count()
      }
      time(s"$tag g02_triangles_stored")(
        graft.operators.GraphQueries.g02_triangles(spark, sf).count())
      time(s"$tag g18_temporal_stored")(
        graft.operators.GraphQueries.g18_temporal_reach(spark, sf).count())
      // round-7 second wave: q130 is one grouped window over distinct
      // lengths; t32/t33 are scan + tiny aggregates; c36/c37 broadcast a
      // k-bounded eval side against one scan (clone corpora multiply HIT
      // rows, never the scan count); st14's batch self-joins partition
      // the one-shot work; m18's star rounds are linear in m09's edges
      time(s"$tag q130_ks_test")(
        graft.operators.RelationalQueries.q130_ks_test(spark, sf).count())
      time(s"$tag t32_calibration")(
        graft.operators.TextQueries.t32_calibration(spark, sf).count())
      time(s"$tag c36_semantic_decontam")(
        graft.operators.CurationQueries.c36_decontaminate_semantic(spark, sf).count())
      time(s"$tag c37_contamination_panel")(
        graft.operators.CurationQueries.c37_contamination_panel(spark, sf).count())
      time(s"$tag st14_incremental_co_graph")(
        graft.operators.StreamingQueries.st14_incremental_co_graph(spark, sf).count())
      time(s"$tag m18_media_clusters")(
        graft.operators.MultimodalQueries.m18_media_clusters(spark, sf).count())
      // round-7 third wave: t34 is explode + one per-doc window; t35 is
      // t11's keyed joins + a 5-row broadcast cut table; m19 is one frame
      // window + the k=1 heaps; c38's rounds are |sources|-row CTEs over
      // one corpus aggregate
      time(s"$tag t34_segment_lang")(
        graft.operators.TextQueries.t34_segment_lang(spark, sf).count())
      time(s"$tag t35_ccnet_buckets")(
        graft.operators.TextQueries.t35_ccnet_buckets(spark, sf).count())
      time(s"$tag m19_keyframes")(
        graft.operators.MultimodalQueries.m19_keyframes(spark, sf).count())
      time(s"$tag c38_waterfill_budget")(
        graft.operators.CurationQueries.c38_waterfill_budget(spark, sf).count())
      // round-7 fourth wave: g19 alternates keyed joins over 10x edges
      // (hub-skewed supplier side); s32's in-bucket candidate join faces
      // 10x-deeper sign buckets — ~100x pairs on the clone corpus, the
      // plane-count dial's cost curve made visible; s33 is a 10x corpus
      // scan against a constant query side; t36/c39/st15 are one feature
      // scan + broadcast-model joins; m20 is scan + two-phase prefix
      // scan; q131 is scan + a 12-row-per-year aggregate
      time(s"$tag g19_hits")(
        graft.operators.GraphQueries.g19_hits(spark, sf).count())
      time(s"$tag s32_knn_graph")(
        graft.operators.SimilarityQueries.s32_knn_graph(spark, sf).count())
      time(s"$tag s33_hard_negatives")(
        graft.operators.SimilarityQueries.s33_hard_negatives(spark, sf).count())
      time(s"$tag t36_rocchio")(
        graft.operators.TextQueries.t36_rocchio_classifier(spark, sf).count())
      time(s"$tag c39_model_apply")(
        graft.operators.CurationQueries.c39_persisted_model_apply(spark, sf).count())
      time(s"$tag st15_incremental_rocchio")(
        graft.operators.StreamingQueries.st15_incremental_rocchio(spark, sf).count())
      time(s"$tag m20_aspect_buckets")(
        graft.operators.MultimodalQueries.m20_aspect_buckets(spark, sf).count())
      time(s"$tag q131_quantified")(
        graft.operators.RelationalQueries.q131_quantified(spark, sf).count())
      // q132 is one partition-keyed window pass; t37 is explode + three
      // per-doc windows — both scan-shaped, both should track corpus size
      time(s"$tag q132_distribution_ranks")(
        graft.operators.RelationalQueries.q132_distribution_ranks(spark, sf).count())
      time(s"$tag t37_span_corruption")(
        graft.operators.TextQueries.t37_span_corruption(spark, sf).count())
      // c40 is c39's scan + two keyed aggs; t38's sweep join is
      // |types| x |ks| — metadata-sized at any corpus scale
      time(s"$tag c40_mixture_repair")(
        graft.operators.CurationQueries.c40_filter_mixture_repair(spark, sf).count())
      time(s"$tag t38_vocab_sweep")(
        graft.operators.TextQueries.t38_vocab_sweep(spark, sf).count())
      time(s"$tag t39_blocklist_filter")(
        graft.operators.TextQueries.t39_blocklist_filter(spark, sf).count())
      time(s"$tag d33_soft_dedup")(
        graft.operators.DedupQueries.d33_soft_dedup(spark, sf).count())
      time(s"$tag m21_interleaved_packing")(
        graft.operators.MultimodalQueries.m21_interleaved_packing(spark, sf).count())
      time(s"$tag q133_bucketed_join")(
        graft.operators.RelationalQueries.q133_bucketed_join(spark, sf).count())
      time(s"$tag q133_bucketed_join warm")(
        graft.operators.RelationalQueries.q133_bucketed_join(spark, sf).count())
      time(s"$tag q134_partitioned_scan")(
        graft.operators.RelationalQueries.q134_partitioned_scan(spark, sf).count())
      time(s"$tag q135_salted_join")(
        graft.operators.RelationalQueries.q135_salted_join(spark, sf).count())
      time(s"$tag m22_format_sniff")(
        graft.operators.MultimodalQueries.m22_format_sniff(spark, sf).count())
      time(s"$tag s34_auto_nprobe")(
        graft.operators.SimilarityQueries.s34_auto_nprobe(spark, sf).count())
      time(s"$tag st16_replay_safe_apply")(
        graft.operators.StreamingQueries.st16_replay_safe_apply(spark, sf).count())
      time(s"$tag q136_range_boundaries")(
        graft.operators.RelationalQueries.q136_range_boundaries(spark, sf).count())
      time(s"$tag c42_rejection_to_target")(
        graft.operators.CurationQueries.c42_rejection_to_target(spark, sf).count())
      time(s"$tag d34_dedup_roi")(
        graft.operators.DedupQueries.d34_dedup_roi(spark, sf).count())
      time(s"$tag t40_charset_audit")(
        graft.operators.TextQueries.t40_charset_audit(spark, sf).count())
      time(s"$tag st17_late_data_audit")(
        graft.operators.StreamingQueries.st17_late_data_audit(spark, sf).count())
      time(s"$tag t41_heaps_fit")(
        graft.operators.TextQueries.t41_heaps_fit(spark, sf).count())
      time(s"$tag c43_canary_recall")(
        graft.operators.CurationQueries.c43_canary_recall(spark, sf).count())
      time(s"$tag q137_column_stats")(
        graft.operators.RelationalQueries.q137_column_stats(spark, sf).count())
      time(s"$tag m23_shard_manifest")(
        graft.operators.MultimodalQueries.m23_shard_manifest(spark, sf).count())
      time(s"$tag d35_chaining_audit")(
        graft.operators.DedupQueries.d35_chaining_audit(spark, sf).count())
      time(s"$tag c44_corpus_diff")(
        graft.operators.CurationQueries.c44_corpus_diff(spark, sf).count())
      time(s"$tag q138_sampled_agg_audit")(
        graft.operators.RelationalQueries.q138_sampled_agg_audit(spark, sf).count())
      time(s"$tag s35_embedding_audit")(
        graft.operators.SimilarityQueries.s35_embedding_audit(spark, sf).count())
      time(s"$tag g20_graph_audit")(
        graft.operators.GraphQueries.g20_graph_audit(spark, sf).count())
      time(s"$tag q139_bucketed_append")(
        graft.operators.RelationalQueries.q139_bucketed_append(spark, sf).count())
      time(s"$tag q139_bucketed_append warm")(
        graft.operators.RelationalQueries.q139_bucketed_append(spark, sf).count())
      // fifteenth wave: the lakehouse trio's cold runs include their layout
      // builds (range-cluster+stats / DV extraction / snapshot log); the
      // warm runs are the served query — file-pruned scan, broadcast
      // anti-join, manifest-listed reads — which should scale with rows
      // read, not corpus
      time(s"$tag q140_zone_map_skip")(
        graft.operators.RelationalQueries.q140_zone_map_skip(spark, sf).count())
      time(s"$tag q140_zone_map_skip warm")(
        graft.operators.RelationalQueries.q140_zone_map_skip(spark, sf).count())
      time(s"$tag q141_deletion_vectors")(
        graft.operators.RelationalQueries.q141_deletion_vectors(spark, sf).count())
      time(s"$tag q141_deletion_vectors warm")(
        graft.operators.RelationalQueries.q141_deletion_vectors(spark, sf).count())
      time(s"$tag q142_time_travel")(
        graft.operators.RelationalQueries.q142_time_travel(spark, sf).count())
      // s36: candidate pass = batch x 10x B-side (linear); margin rescore
      // stays top-k-bounded
      time(s"$tag s36_bitext_margin")(
        graft.operators.SimilarityQueries.s36_bitext_margin(spark, sf).count())
      // t43: one token scan + vocab-keyed joins; c45: dimension-scan aggs
      time(s"$tag t43_log_odds")(
        graft.operators.TextQueries.t43_log_odds(spark, sf).count())
      time(s"$tag c45_k_anonymity")(
        graft.operators.CurationQueries.c45_k_anonymity(spark, sf).count())
      // sixteenth wave: q143/q144 are grouped scans + calendar-bounded
      // folds; q145/q146 dimension-scale; q147 includes the bloom build
      // each run; q148 cold includes layout+append, warm is the pruned read
      time(s"$tag q143_kaplan_meier")(
        graft.operators.RelationalQueries.q143_kaplan_meier(spark, sf).count())
      time(s"$tag q144_cuped")(
        graft.operators.RelationalQueries.q144_cuped(spark, sf).count())
      time(s"$tag q145_dp_release")(
        graft.operators.RelationalQueries.q145_dp_release(spark, sf).count())
      time(s"$tag q146_encoding_advisor")(
        graft.operators.RelationalQueries.q146_encoding_advisor(spark, sf).count())
      time(s"$tag q147_bloom_join_pruning")(
        graft.operators.RelationalQueries.q147_bloom_join_pruning(spark, sf).count())
      time(s"$tag q148_zone_map_append")(
        graft.operators.RelationalQueries.q148_zone_map_append(spark, sf).count())
      time(s"$tag q148_zone_map_append warm")(
        graft.operators.RelationalQueries.q148_zone_map_append(spark, sf).count())
      // seventeenth wave: c46 = one stats reduce + one broadcast-scored
      // test pass regardless of |sources|; q149 cold includes the cube
      // build, warm is cube-rows-only; q150 is one grouped scan + an
      // ~80-deep calendar-bounded recursion; st18 cold folds 4 batches
      time(s"$tag c46_loo_source_value")(
        graft.operators.CurationQueries.c46_loo_source_value(spark, sf).count())
      time(s"$tag q149_cube_reuse")(
        graft.operators.RelationalQueries.q149_cube_reuse(spark, sf).count())
      time(s"$tag q149_cube_reuse warm")(
        graft.operators.RelationalQueries.q149_cube_reuse(spark, sf).count())
      time(s"$tag q150_holt_forecast")(
        graft.operators.RelationalQueries.q150_holt_forecast(spark, sf).count())
      time(s"$tag st18_stream_layout")(
        graft.operators.StreamingQueries.st18_stream_layout(spark, sf).count())
      time(s"$tag st18_stream_layout warm")(
        graft.operators.StreamingQueries.st18_stream_layout(spark, sf).count())
      // eighteenth wave: q151's distributed half is the journey scan
      // (transition matrix is |types|^2, driver fold constant); m24 is
      // two two-phase position scans — output-linear
      time(s"$tag q151_markov_attribution")(
        graft.operators.RelationalQueries.q151_markov_attribution(spark, sf).count())
      time(s"$tag m24_contrastive_batches")(
        graft.operators.MultimodalQueries.m24_contrastive_batches(spark, sf).count())
      // c47: two two-phase rank scans + one keyed join (output-linear);
      // s37: the stored-signature scan + broadcast anti-mask
      time(s"$tag c47_quantile_normalize")(
        graft.operators.CurationQueries.c47_quantile_normalize(spark, sf).count())
      time(s"$tag s37_tombstoned_search")(
        graft.operators.SimilarityQueries.s37_tombstoned_search(spark, sf).count())
      // t44/q152: single-scan regex / JSON-key audits
      time(s"$tag t44_pii_canary")(
        graft.operators.TextQueries.t44_pii_canary(spark, sf).count())
      time(s"$tag q152_schema_drift")(
        graft.operators.RelationalQueries.q152_schema_drift(spark, sf).count())
      // q153/st19: base-scan-bound reads behind broadcast DV anti-joins;
      // cold runs include the one-time change-set / DV-fold builds
      time(s"$tag q153_merge_on_read")(
        graft.operators.RelationalQueries.q153_merge_on_read(spark, sf).count())
      time(s"$tag q153_merge_on_read warm")(
        graft.operators.RelationalQueries.q153_merge_on_read(spark, sf).count())
      time(s"$tag st19_stream_deletes")(
        graft.operators.StreamingQueries.st19_stream_deletes(spark, sf).count())
      // wave 21: c48 is a window cascade over (user_id, conv_idx) — one
      // shuffle key family, must scale with events; q154 is R=100
      // generator rows per input row collapsed by partial agg before a
      // 100-row shuffle — must scale with the lineitem scan (CPU-bound
      // on the weight arithmetic, never shuffle-bound). The 10x c48 count
      // is legitimately 0: replicated same-timestamp events merge into
      // single turns 10x the budget, so every conversation truncates to
      // nothing — the cascade still runs over all 10x rows, which is
      // what the timing measures.
      time(s"$tag c48_chat_assembly")(
        graft.operators.CurationQueries.c48_chat_assembly(spark, sf).count())
      time(s"$tag q154_bootstrap_ci")(
        graft.operators.RelationalQueries.q154_bootstrap_ci(spark, sf).count())
      // wave 22: c49 is a pure scan-side projection (flat expected);
      // m25 is agg → join-back → agg all keyed on doc_id — must track
      // the frame count, never the pair count
      time(s"$tag c49_drop_lineage")(
        graft.operators.CurationQueries.c49_drop_lineage(spark, sf).count())
      time(s"$tag m25_gated_loudness")(
        graft.operators.MultimodalQueries.m25_gated_loudness(spark, sf).count())
      // wave 23: q155 pays the two-epoch layout once (marker) then reads
      // a footer-union scan — must track the orders scan; s38 joins two
      // k-bounded result sets, so its cost is the two ANN queries
      time(s"$tag q155_schema_evolution")(
        graft.operators.RelationalQueries.q155_schema_evolution(spark, sf).count())
      time(s"$tag s38_ranking_metrics")(
        graft.operators.SimilarityQueries.s38_ranking_metrics(spark, sf).count())
      // wave 24: st20 is 3x q154's partials + a 100-row merge (must track
      // 3x the q154 scan); c50's prefix scan is two-phase — must track
      // the documents scan, never a single-reducer sort
      time(s"$tag st20_incremental_bootstrap")(
        graft.operators.StreamingQueries.st20_incremental_bootstrap(spark, sf).count())
      time(s"$tag c50_budget_certificate")(
        graft.operators.CurationQueries.c50_budget_certificate(spark, sf).count())
      // wave 25: g21 is four keyed LPA rounds over the persisted monthly
      // co-graph (months are keys, never rounds — must track the stored
      // graph, not lineitem); c51 is c07's window shape + a projection
      time(s"$tag g21_labelprop")(
        graft.operators.GraphQueries.g21_labelprop(spark, sf).count())
      time(s"$tag c51_license_audit")(
        graft.operators.CurationQueries.c51_license_audit(spark, sf).count())
      // wave 26: q156 is a scan-local projection + per-nation agg (flat);
      // g22 is 4 keyed joins over the stored graph — walks are keys
      time(s"$tag q156_feistel_pseudonymize")(
        graft.operators.RelationalQueries.q156_feistel_pseudonymize(spark, sf).count())
      time(s"$tag g22_random_walks")(
        graft.operators.GraphQueries.g22_random_walks(spark, sf).count())
      // wave 27: s39 rides one scored scan through heap top-k with the
      // filter ladder as extra group keys — must track s01's scan, x3;
      // t45 is a scan-side projection (flat)
      time(s"$tag s39_filter_strategy")(
        graft.operators.SimilarityQueries.s39_filter_strategy(spark, sf).count())
      time(s"$tag t45_code_detect")(
        graft.operators.TextQueries.t45_code_detect(spark, sf).count())
      // wave 28: q157 is one scan + a chunk-keyed bit_or agg (flat);
      // m26 is a generator scan + hash-keyed agg — d01 economics at tile
      // granularity, must track cell count
      time(s"$tag q157_bitmap_rollup")(
        graft.operators.RelationalQueries.q157_bitmap_rollup(spark, sf).count())
      time(s"$tag m26_patch_neardup")(
        graft.operators.MultimodalQueries.m26_patch_neardup(spark, sf).count())
      // wave 29: q158 is two keyed bit_or aggs (events-scan-bound); c52
      // is c48's cascade plus two windows on the same key family
      time(s"$tag q158_bitmap_distinct")(
        graft.operators.RelationalQueries.q158_bitmap_distinct(spark, sf).count())
      time(s"$tag c52_loss_mask")(
        graft.operators.CurationQueries.c52_loss_mask(spark, sf).count())
      // wave 30: st21 is 4x the q158 mask agg + a mask re-merge (state is
      // |days x chunks| regardless of volume); q159 is two snapshot
      // scans with conditional aggregation over the cutoff grid
      time(s"$tag st21_stream_bitmap")(
        graft.operators.StreamingQueries.st21_stream_bitmap(spark, sf).count())
      time(s"$tag q159_bitemporal")(
        graft.operators.RelationalQueries.q159_bitemporal(spark, sf).count())
      // wave 31: d38 is d03's kernel over a 1.8x corpus + a keyed 1:1
      // ground-truth join (must track d03); q160 is 3 two-phase rank
      // passes + 64-row stat replays (orders-scan-bound x3)
      time(s"$tag d38_mutation_recall")(
        graft.operators.DedupQueries.d38_mutation_recall(spark, sf).count())
      time(s"$tag q160_sortkey_advisor")(
        graft.operators.RelationalQueries.q160_sortkey_advisor(spark, sf).count())
      // wave 32: c53 is one two-phase scan + a scalar percentile
      // broadcast; g23 is two copies of g21's label chain joined on
      // (node, m+1) — tracks the monthly-graph size, never lineitem
      time(s"$tag c53_annealing_order")(
        graft.operators.CurationQueries.c53_annealing_order(spark, sf).count())
      time(s"$tag g23_community_churn")(
        graft.operators.GraphQueries.g23_community_churn(spark, sf).count())
      // wave 33: q161 is two scan-bound passes with a ~160-row driver
      // histogram between them (the sorted set shrinks to one bucket);
      // m27 is |lags|=5 keyed self-joins over the token-length series
      time(s"$tag q161_twopass_median")(
        graft.operators.RelationalQueries.q161_twopass_median(spark, sf).count())
      time(s"$tag m27_av_sync")(
        graft.operators.MultimodalQueries.m27_av_sync(spark, sf).count())
      // wave 34: q162 is 6 independent pairs of distinct-aggs + anti-join
      // on pruned single columns; g24 is the label chain + one grouped
      // fold (strictly smaller output than the input graph)
      time(s"$tag q162_fk_inference")(
        graft.operators.RelationalQueries.q162_fk_inference(spark, sf).count())
      time(s"$tag g24_community_graph")(
        graft.operators.GraphQueries.g24_community_graph(spark, sf).count())
      // wave 35: q163's second pass runs over session SUMMARIES (much
      // smaller than events); d39 is scan-side hashing + keyed 1:1 joins
      time(s"$tag q163_session_stitch")(
        graft.operators.RelationalQueries.q163_session_stitch(spark, sf).count())
      time(s"$tag d39_norm_recall")(
        graft.operators.DedupQueries.d39_norm_recall(spark, sf).count())
      // wave 36: q164 is two keyed aggs over one user-time window; c54 is
      // two chained two-phase prefix scans (events/documents-scan-bound)
      time(s"$tag q164_semi_additive")(
        graft.operators.RelationalQueries.q164_semi_additive(spark, sf).count())
      time(s"$tag c54_smooth_interleave")(
        graft.operators.CurationQueries.c54_smooth_interleave(spark, sf).count())
      // wave 37: s40 is one cosine scan + MaxSim over a 50-deep shortlist
      // (depths slice the same shortlist — keys, not passes)
      time(s"$tag s40_cascade_sweep")(
        graft.operators.SimilarityQueries.s40_cascade_sweep(spark, sf).count())
      // wave 38: q165 is per-pair stats aggs + keyed join counts
      time(s"$tag q165_join_estimate")(
        graft.operators.RelationalQueries.q165_join_estimate(spark, sf).count())
      // wave 39: q166 is one pruned broadcast-filtered scan per table
      time(s"$tag q166_subject_access")(
        graft.operators.RelationalQueries.q166_subject_access(spark, sf).count())
      // wave 40: t46 is one explode + a vocabulary-sized df agg + a
      // keyed join back (the df-feature shape)
      time(s"$tag t46_hapax_noise")(
        graft.operators.TextQueries.t46_hapax_noise(spark, sf).count())
    }
    // g10 on the replication-densified graph is triangle-bound: 10x copies
    // inflate every co-occurrence count 10x past the FIXED threshold, so
    // the graph saturates (~91% of K1000) and exact support must touch
    // ~1.25e8 triangles per round — the information floor, not a join
    // degeneration. A real 10x corpus keeps co-occurrence density roughly
    // constant; the density-matched probe scales the threshold with the
    // replication factor and shows the join-bound curve.
    for ((sf, thr, tag) <- Seq((base, 10, "1x "), (big, 100, "10x"))) {
      spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("lineitem")
      val co = spark.sql(
        s"""SELECT a.l_suppkey AS u, b.l_suppkey AS v
           |FROM lineitem a JOIN lineitem b
           |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
           |GROUP BY 1, 2 HAVING count(*) >= $thr""".stripMargin)
      time(s"$tag g10_truss_density_matched")(
        graft.operators.GraphQueries.trussFrom(co, 4, 3).count())
    }
    // d16 probes on a generated catalog (the fixture's 64 distinct part
    // names don't grow with corpus copies): each 10x variant family is
    // mutually within edit distance 2, so candidate pairs grow with the
    // OUTPUT (family size squared), never with catalog squared
    val names1 = spark.read.parquet(s"$base/part.parquet")
      .select(col("p_name").as("name")).distinct()
    for (m <- Seq(1, 10)) {
      val names = (0 until m).map(i =>
        if (i == 0) names1
        else names1.select(concat(col("name"), lit(s" v$i")).as("name")))
        .reduce(_ unionByName _)
      time(s"${m}x d16_editdist_core")(
        graft.operators.DedupQueries.editDistJoin(names, 2).count())
    }
    spark.stop()
  }
}
