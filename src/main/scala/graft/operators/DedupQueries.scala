package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.minhash_signature
import graft.functions.TextFunctions.simhash64
import graft.functions.VectorFunctions.cosine_similarity

/** Deduplication operators for a training-data pipeline (brief §extended;
  * SURVEY.md §2C). Five families: exact (hash-groupBy), MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale shapes (the part that matters at 100 TB):
  *  - exact dedup is a single hash aggregate — map-side partials, then a
  *    shuffle carrying one row per distinct key;
  *  - MinHash/SimHash candidate generation explodes each doc into a few
  *    (band, hash) rows and self-joins on them — the shuffle key is the
  *    band hash, so only colliding docs ever meet; no quadratic pass;
  *  - verification joins candidate ID pairs back to the doc table (ids-only
  *    shuffle for the distinct, then two key joins) instead of carrying
  *    shingle arrays through the pair-dedup shuffle;
  *  - embedding near-dup restricts pairs to a bucket key (label here; the
  *    ANN buckets of SimilarityQueries in general) before the O(pairs)
  *    cosine kernel runs.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Tokenized docs with distinct 3-word shingles (docs with <3 tokens drop).
    *
    * The repartition decouples compute parallelism from input splits: a
    * small parquet file arrives as ONE partition, which would serialize the
    * CPU-heavy shingle/hash pipeline onto a single core (measured 8s -> <2s
    * at sf0.1 on local[32]). The shuffled payload is just the raw text —
    * cheap relative to the per-row work it unlocks; at real corpus scale the
    * scan already has many splits and AQE coalesces any excess.
    */
  private[operators] def shingled(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles",
        graft.functions.TextFunctions.word_shingles(col("toks"), 3))

  private[operators] def docShingles(s: SparkSession, d: String): DataFrame =
    shingled(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  /** Exact dedup by key: keep-first (min id) + multiplicity per
    * (user_id, event_type) — `dropDuplicates` semantics made deterministic
    * (dropDuplicates keeps an arbitrary row; min-per-group survives any
    * partitioning).
    */
  def d01_dedup_exact(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_dupes"))

  /** Exact content dedup via cryptographic hash of the payload — the
    * 100 TB-safe form (the 256-bit key shuffles, the document bodies don't).
    */
  def d02_dedup_content_hash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-dup: 16-hash signature, 4 bands x 4 rows.
    * Candidates = docs colliding in any band; verified with exact shingle
    * Jaccard. Collision probability per band is J^4, so threshold-quality
    * pairs are caught with high recall while the join only ever touches
    * hash-colliding rows.
    */
  /** LSH banding of a (doc_id, sig) frame: 4 bands of 4 minhash components
    * each, packed INJECTIVELY into two int64 keys (component values are
    * < p = 2^31-1, so lo = c1*p + c2 and hi = c3*p + c4 fit in 62 bits
    * with zero collisions — a band matches iff all 4 components match,
    * the true LSH banding, and exact arithmetic both engines can spell,
    * unlike the earlier xxhash64 bucket). Shared by the inline pass (d03)
    * and the persisted index (d18).
    */
  private def bandsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(expr(
      "transform(sequence(0, 3), b -> struct(b AS band_no, " +
        "element_at(sig, 4*b+1) * 2147483647 + element_at(sig, 4*b+2) AS b_lo, " +
        "element_at(sig, 4*b+3) * 2147483647 + element_at(sig, 4*b+4) AS b_hi))"))
      .as("band"))
      .select(col("doc_id"), col("band.band_no"), col("band.b_lo"), col("band.b_hi"))

  /** d38: MUTATION-RECALL harness — d25 plots the LSH theory curve; this
    * MEASURES the deployed config (16 minhashes, 4×4 bands, 3-shingles)
    * against planted mutation families, the way a dedup method is actually
    * evaluated before it gates a corpus: every 5th document is re-emitted
    * four ways (identical copy; every-7th-token dropped; token order
    * reversed; truncated to the first 60%), and for each family the table
    * reports how many (original, mutant) pairs exist, how many the BAND
    * stage surfaced, how many are true near-dups at Jaccard ≥ 0.5, and the
    * Jaccard mass — so "LSH catches paraphrase-like edits but is blind to
    * reordering at this shingle size" becomes a measured row, not a prior.
    * Ground-truth Jaccard comes from a keyed 1:1 join (id arithmetic),
    * never all-pairs; the LSH side is d03's exact machinery over the
    * augmented corpus. All-integer (milli Jaccard), hash-checked.
    */
  def d38_mutation_recall(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val slice = base.where(pmod(col("doc_id"), lit(5L)) === 0)
      .withColumn("toks", split(col("text"), " "))
    val kinds = Seq(
      1L -> "toks",
      2L -> "transform(filter(sequence(1, size(toks)), i -> i % 7 != 0), i -> element_at(toks, i))",
      3L -> "reverse(toks)",
      4L -> "slice(toks, 1, greatest(3, size(toks) * 3 div 5))")
    val mutants = kinds.map { case (k, e) =>
      slice.select((col("doc_id") + k * 10000000L).as("doc_id"),
        expr(s"array_join($e, ' ')").as("text"))
    }.reduce(_ unionByName _)
    val corpus = shingled(base.unionByName(mutants)
      .repartition(Tables.scanPartitions(s)))
      .select(col("doc_id"), col("shingles"))
      .withColumn("sig", minhash_signature(col("shingles")))
      .localCheckpoint()
    val bands = bandsOf(corpus)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.b_lo") === col("y.b_lo") && col("x.b_hi") === col("y.b_hi") &&
          col("y.doc_id") > col("x.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sh = corpus.select(col("doc_id"), col("shingles"))
    val pairs = Seq(1L, 2L, 3L, 4L).map { k =>
      sh.as("sa").join(sh.as("sb"),
          col("sb.doc_id") === col("sa.doc_id") + k * 10000000L)
        .where(col("sa.doc_id") < 10000000L)
        .select(lit(k).as("k"), col("sa.doc_id").as("a"),
          col("sb.doc_id").as("b"),
          expr("size(array_intersect(sa.shingles, sb.shingles))").as("inter"),
          expr("size(sa.shingles) + size(sb.shingles)").as("tot"))
    }.reduce(_ unionByName _)
      .withColumn("j_milli", expr("1000 * inter div (tot - inter)"))
    pairs.join(cands.withColumn("hit", lit(1L)), Seq("a", "b"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0L)))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("hit")).as("n_band_caught"),
        sum(when(col("j_milli") >= 500L, 1L).otherwise(0L)).as("n_neardup_500"),
        sum(col("j_milli")).as("sum_jaccard_milli"))
      .withColumn("mutation", expr("CASE k WHEN 1 THEN 'identical' " +
        "WHEN 2 THEN 'drop7' WHEN 3 THEN 'reverse' ELSE 'prefix60' END"))
      .select(col("mutation"), col("n_pairs"), col("n_band_caught"),
        col("n_neardup_500"), col("sum_jaccard_milli"))
  }

  /** d39: NORMALIZATION-GAIN recall — answers "should we normalize before
    * exact dedup?" with a measured table instead of a prior: every 9th
    * document is re-emitted in three formatting-variant classes (doubled
    * spaces; trailing punctuation; uppercased) — the near-dup classes raw
    * content hashing (d02) is blind to — and the census reports, per
    * class, how many (original, variant) pairs the RAW hash catches
    * (zero, by construction) versus the t14-NORMALIZED hash (all,
    * spec-pinned: the d38 mutation-recall discipline applied to the
    * normalize-then-dedup decision). Scan-side projections + two
    * hash-keyed joins; the planted ids are arithmetic so ground truth is
    * a keyed 1:1 join, never all-pairs.
    */
  def d39_norm_recall(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // the two-regexp normalization below is the CPU of this query and
      // would inherit the single-file scan's width (r13 flight sweep)
      .repartition(Tables.scanPartitions(s))
    val slice = base.where(pmod(col("doc_id"), lit(9L)) === 4)
    val kinds = Seq(
      1L -> "replace(text, ' ', '  ')",
      2L -> "concat(text, ' !!')",
      3L -> "upper(text)")
    val plants = kinds.map { case (k, e) =>
      slice.select((col("doc_id") + k * 10000000L).as("doc_id"),
        expr(e).as("text"))
    }.reduce(_ unionByName _)
    val corpus = base.unionByName(plants)
      .withColumn("raw_h", md5(col("text")))
      .withColumn("norm_h", md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 .,]", " "),
        " {2,}", " "))))
      .select(col("doc_id"), col("raw_h"), col("norm_h"))
      .localCheckpoint()
    val pairs = Seq(1L, 2L, 3L).map { k =>
      corpus.as("a").join(corpus.as("b"),
          col("b.doc_id") === col("a.doc_id") + k * 10000000L)
        .where(col("a.doc_id") < 10000000L)
        .select(lit(k).as("k"),
          (col("a.raw_h") === col("b.raw_h")).cast("long").as("raw_same"),
          (col("a.norm_h") === col("b.norm_h")).cast("long").as("norm_same"))
    }.reduce(_ unionByName _)
    pairs.groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("raw_same")).as("caught_raw"),
        sum(col("norm_same")).as("caught_norm"))
      .withColumn("variant", expr("CASE k WHEN 1 THEN 'double_space' " +
        "WHEN 2 THEN 'trailing_punct' ELSE 'uppercased' END"))
      .select(col("variant"), col("n_pairs"), col("caught_raw"),
        col("caught_norm"))
  }

  def d03_dedup_minhash_lsh(s: SparkSession, d: String): DataFrame = {
    // The (shingles, sig) projection feeds FOUR subtrees (bands.x, bands.y,
    // sa, sb); without materialization Spark re-runs the CPU-heavy
    // shingle+minhash kernel for each (measured 4x kernel cost, d08 at 14s
    // vs d03 at 0.75s in round 1). Eager localCheckpoint runs the kernel
    // once and truncates the lineage, so every downstream use reads the
    // stored (doc_id, shingles, sig) blocks — the same trade a 100 TB run
    // makes (persist one slim projection vs four full kernel passes).
    val docs = docShingles(s, d)
      .select(col("doc_id"), col("shingles"))
      .withColumn("sig", minhash_signature(col("shingles")))
      .localCheckpoint()
    val bands = bandsOf(docs)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.b_lo") === col("y.b_lo") &&
          col("x.b_hi") === col("y.b_hi") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sh = docs.select(col("doc_id"), col("shingles"))
    cands
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sa.shingles"), col("sb.shingles")).as("jaccard"))
      .filter(col("jaccard") >= 0.05)
  }

  /** SimHash near-dup: 64-bit signature; LSH over four 16-bit chunks
    * (two docs within Hamming distance h collide on some chunk unless all
    * h differing bits spread across every chunk); verified by exact
    * Hamming distance.
    */
  def d04_dedup_simhash(s: SparkSession, d: String): DataFrame =
    simhashPairs(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** d04's pair pipeline parameterized on the raw (doc_id, text) corpus, so
    * the chunk-LSH recall guarantee is testable on a planted pair
    * (QueriesSpec): docs within Hamming distance 3 share an intact 16-bit
    * chunk by pigeonhole (4 chunks, at most 3 differing bits) and MUST
    * surface; identical docs collide on every chunk.
    */
  private[graft] def simhashPairs(rawDocs: DataFrame): DataFrame = {
    val docs = shingled(rawDocs)
      .select(col("doc_id"), simhash64(col("toks")).as("sh"))
    // unsigned shift + mask, NOT DIV/%: sh is a full-range signed long (bit
    // 63 set for ~half of docs) and truncating division would decompose
    // negative hashes into values that never collide with positive ones
    val chunks = docs.select(col("doc_id"), col("sh"), explode(expr(
      "transform(sequence(0, 3), c -> struct(c AS chunk_no, " +
        "shiftrightunsigned(sh, 16*c) & 65535 AS chunk_val))")).as("ch"))
      .select(col("doc_id"), col("sh"), col("ch.chunk_no"), col("ch.chunk_val"))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_no") === col("y.chunk_no") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
  }

  /** Bucketed n-gram Jaccard near-dup, fully SQL-expressible (the
    * oracle-checked member of the near-dup family): 3-gram token shingles,
    * pairs restricted to a (lang, source) bucket key.
    *
    * Inverted-index formulation: explode shingles, self-join on the shingle
    * (within the bucket), count common shingles per pair, then jaccard from
    * the per-doc set sizes. Cost is O(shingle occurrences x bucket
    * co-occurrence), never O(doc-pairs x array-intersect) — pairs with zero
    * overlap are never materialized.
    *
    * Hot-shingle guard: a single ultra-common shingle (boilerplate, a stock
    * phrase) makes the self-join quadratic within that one key — df docs
    * sharing it meet as df^2/2 pairs in ONE reducer, which no cluster size
    * fixes. Shingles whose document frequency exceeds [[DfCap]] are dropped
    * from the index before the join (broadcast anti-join; the hot set is by
    * definition small). `n` is still the FULL shingle-set size, so retained
    * pairs' jaccard only ever under-counts — the standard recall-for-bound
    * trade every production near-dup pipeline makes. The df aggregation
    * itself is skew-safe: map-side partial counts, one row per shingle
    * crosses the shuffle.
    */
  private[operators] val DfCap = 64

  /** The pair generator behind d05/d09, parameterized on the input corpus
    * and the df cap so the hot-shingle bound is testable on a synthetic
    * skewed corpus (DedupScaleSpec). `docs` needs (doc_id, lang, source,
    * text). Emits all co-bucketed pairs with inter > 0 and their jaccard —
    * thresholding is the caller's.
    */
  private[operators] def ngramJaccardPairs(docs: DataFrame, dfCap: Int): DataFrame = {
    // checkpoint the doc-level shingle arrays: `ex` feeds BOTH the df
    // aggregate and the pruned self-join, and without materialization the
    // shingle kernel + explode re-ran once per consumer — the r13 flight
    // record showed two ~7 s-CPU shingle stages per d05 execution, the
    // single largest CPU sink in the whole bench (d05 feeds
    // d09/d13/d22/d34/d35). Doc-level arrays, not exploded postings: the
    // checkpoint is |docs|-sized and the cheap explode replays per branch.
    val sh = shingled(docs)
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("shingles")).as("n"), col("shingles"))
      .localCheckpoint()
    val ex = sh
      .select(col("doc_id"), col("lang"), col("source"),
        col("n"), explode(col("shingles")).as("shingle"))
    val hot = ex.groupBy(col("lang"), col("source"), col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select(col("lang"), col("source"), col("shingle"))
    val pruned = ex.join(hot, Seq("lang", "source", "shingle"), "left_anti")
    pruned.as("a").join(pruned.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.lang").as("lang"), col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"), col("lang"),
        col("na"), col("nb"), col("inter"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  def d05_ngram_jaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccardPairs(
      Tables.documents(s, d).repartition(Tables.scanPartitions(s)),
      DfCap)
      .filter(col("jaccard") >= 0.1)
      .select(col("doc_a"), col("doc_b"), col("lang"), col("jaccard"))

  /** d34: dedup ROI curve — the threshold-decision table an operator
    * reads before fixing a near-dup cutoff (d25 tunes the LSH recall
    * side; this prices the APPLY side): at each candidate jaccard
    * threshold, how many pairs flag, how many docs the keep-min rule
    * drops, and the token mass saved. One pair pass (d05's df-capped
    * generator, shared verbatim) fanned across a 5-row broadcast
    * threshold ladder; the threshold test is the cross-multiplied
    * integer `inter·1000 >= tau·union` so no float ever decides a row —
    * the whole table hash-checks. Ladder rows with zero hits survive as
    * explicit zeros (a decision table with silent gaps misreads as
    * "nothing to save").
    */
  def d34_dedup_roi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .localCheckpoint() // pair generator + token lookup share one scan
    val pairs = ngramJaccardPairs(docs, DfCap)
      .select(col("doc_b"), col("na"), col("nb"), col("inter"))
    val taus = broadcast(Seq(100L, 300L, 500L, 700L, 900L).toDF("tau_pm"))
    val hits = pairs.crossJoin(taus)
      .filter(col("inter") * 1000 >=
        col("tau_pm") * (col("na") + col("nb") - col("inter")))
      .localCheckpoint() // pair census + drop census share the fan-out
    val pairCounts = hits.groupBy(col("tau_pm")).agg(count(lit(1)).as("n_pairs"))
    val toks = docs.select(col("doc_id").as("doc_b"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val dropAgg = hits.select(col("tau_pm"), col("doc_b")).distinct()
      .join(toks, "doc_b")
      .groupBy(col("tau_pm"))
      .agg(count(lit(1)).as("n_docs_dropped"),
        sum(col("n_tokens")).as("tokens_dropped"))
    taus.join(pairCounts, Seq("tau_pm"), "left")
      .join(dropAgg, Seq("tau_pm"), "left")
      .select(col("tau_pm"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_dropped"), lit(0L)).as("n_docs_dropped"),
        coalesce(col("tokens_dropped"), lit(0L)).as("tokens_dropped"))
  }

  /** d23: quality-aware CANONICAL selection — the apply-side policy choice
    * d08/d09 hard-code as keep-smallest-id: when a near-dup cluster
    * collapses to one survivor, production pipelines keep the BEST
    * version (longest/cleanest), not the arbitrarily-first one. Clusters
    * come from d10's min-label propagation; quality is the integer
    * per-mille non-short-token score (c24's scan-side signal); the pick
    * is argmax(q_pm, doc_id) per cluster through the native TopKPerGroup
    * heaps (k=1 — the shuffle carries one candidate per cluster per
    * partition, never cluster contents through one reducer). Integer
    * scores + id tie-break -> hash-green against the recursive-CTE
    * cluster oracle with a rank-1 window twin.
    */
  def d23_canonical_pick(s: SparkSession, d: String): DataFrame = {
    val clusters = d10_dedup_clusters(s, d).localCheckpoint()
    val quality = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nshort",
        expr("CAST(size(filter(toks, x -> length(x) <= 2)) AS BIGINT)"))
      .select(col("doc_id"), expr("1000 - (nshort * 1000) div nt").as("q_pm"))
    val scored = clusters.join(quality, "doc_id")
    val best = graft.plans.TopKPerGroup.topK(scored, Seq("cluster_rep"),
      Seq(graft.plans.TopKPerGroup.Ord("q_pm", desc = true),
        graft.plans.TopKPerGroup.Ord("doc_id")), 1)
    best
      .join(clusters.groupBy(col("cluster_rep"))
        .agg(count(lit(1)).as("n_members")), "cluster_rep")
      .select(col("cluster_rep"), col("doc_id").as("canonical_doc"),
        col("q_pm").as("canonical_q_pm"), col("n_members"))
  }

  /** d24: PREFIX-FILTERED similarity join (AllPairs/PPJoin) — the
    * candidate generator that beats a full inverted index at high
    * thresholds: order every doc's shingles by GLOBAL rarity (df asc,
    * shingle asc — one total order shared by all docs), keep only each
    * doc's first p = n − ceil(τ·n) + 1 shingles, and join on THOSE. The
    * prefix-filter theorem guarantees completeness at jaccard ≥ τ: two
    * sets with J ≥ τ overlap in ≥ n − ceil(τ·n) + 1 of any common total
    * order, so they must share a prefix element — at τ = 0.8 the index
    * shrinks to ~20% of postings and the df-ordering makes the surviving
    * postings the RAREST ones (tiny fan-out), which is why set-similarity
    * engines (Vernica VLDB'10) ship exactly this. Verification is one
    * candidate-keyed join back to the full shingle arrays + a codegen'd
    * array_intersect — never a second index pass. ceil(τ·n) is computed
    * as (4n+4) div 5 so no prefix length ever sits on a float boundary;
    * integer inter/sizes -> hash-green. DedupScaleSpec pins completeness
    * against a driver-side brute force of every pair.
    */
  def d24_ppjoin(s: SparkSession, d: String): DataFrame = {
    val docs = docShingles(s, d)
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("n"))
      .localCheckpoint() // feeds df counts, prefixes, and verification
    val ex = docs.select(col("doc_id"), col("n"),
      explode(col("shingles")).as("shingle"))
    val dfreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val pref = ex.join(dfreq, "shingle")
      // PREFIX-STAGE WIDTH PIN (r13 flight sweep: the per-doc
      // collect_list + array_sort aggregate had AQE-coalesced to 3
      // tasks behind 3.7 MB of postings): hash on doc_id is a user pin
      // the groupBy reuses (doc_id ⊂ group keys), so the CPU-heavy
      // sort-slice runs at cluster width with no extra exchange
      .repartition(graft.Tables.scanPartitions(s), col("doc_id"))
      .groupBy(col("doc_id"), col("n"))
      .agg(expr("slice(array_sort(collect_list(struct(df, shingle))), 1, " +
        "CAST(n - (4 * n + 4) div 5 + 1 AS INT))").as("pref"))
      .select(col("doc_id"), explode(col("pref")).as("ps"))
      .select(col("doc_id"), col("ps.shingle").as("shingle"))
      // CANDIDATE-STAGE WIDTH PIN (the 100x flight record's finding, the
      // same AQE-coalesces-by-bytes pathology as the verify pin below,
      // one stage earlier): posting rows are small, so the self-join's
      // shuffle reads coalesce narrow (34 tasks at the 100x probe) and
      // the join's partial-distinct hash tables overflow — 15.7 GB of
      // spill behind 713 MB of input. Pinning the partitioning ON THE
      // JOIN KEY keeps the self-join exchange-free on both sides at
      // full width, so per-task aggregate state stays small.
      .repartition(graft.Tables.scanPartitions(s), col("shingle"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      // VERIFY-WIDTH PIN: candidate pairs are 16 bytes each but each
      // costs a full array_intersect over two shingle arrays downstream,
      // so AQE's byte-based post-shuffle coalescing starves the verify
      // stage of parallelism (flight-recorded: ONE task at bench SF
      // carrying 4.4 s of the 7.5 s wall; 31 tasks behind 474 s of CPU at
      // the 25x probe — the round-11 "flat 25x wall" was this stage
      // serializing CPU, not shuffle). An explicit repartition is
      // user-pinned (AQE never coalesces it) and ships only the id
      // pairs; the broadcast verify joins then run at cluster width.
      .repartition(graft.Tables.scanPartitions(s))
    // TWO-LEVEL VERIFY (the d17 discipline applied to PPJoin
    // verification — the 100x flight record's second finding): attaching
    // the full STRING shingle arrays to every candidate pair ships
    // |candidates| x ~13 KB through the doc_b exchange once the docs
    // side outgrows broadcast (16.2 GB written + 15.7 GB sort-spilled at
    // the 100x probe). Level 1 verifies on 8-byte xxhash64 shingle
    // arrays (~11x slimmer, and the intersect itself is long-compares,
    // not string-compares); level 2 recomputes EXACT string jaccard on
    // the survivor sliver only, so emitted values are bit-identical to
    // the one-level plan. Losslessness: for a doc with no IN-DOCUMENT
    // hash collision (`hsafe`, checked per doc at hash time), distinct
    // common strings map to distinct common hashes, so hash-inter >=
    // true-inter and the monotone x/(na+nb-x) makes hash-jaccard an
    // UPPER bound — the >= tau prune keeps every true pair. The
    // astronomically-rare unsafe doc (a 64-bit collision inside one
    // document) bypasses the prune entirely and goes straight to level 2.
    // codegen'd kernel (round-12 lesson, verdict item 4): the composable
    // array_distinct(transform(..., xxhash64)) is a higher-order lambda —
    // interpreted per element — and needed a second array_distinct pass
    // for the safety flag; HashedShingles does both in one native pass
    val hdocs = docs
      .withColumn("hh",
        graft.functions.TextFunctions.hashed_shingles(col("shingles")))
      .select(col("doc_id"), col("hh.hs").as("hs"), col("n"),
        col("hh.hsafe").as("hsafe"))
    val sliver = cand
      .join(hdocs.select(col("doc_id").as("doc_a"), col("hs").as("ha"),
        col("n").as("na"), col("hsafe").as("safe_a")), "doc_a")
      .join(hdocs.select(col("doc_id").as("doc_b"), col("hs").as("hb"),
        col("n").as("nb"), col("hsafe").as("safe_b")), "doc_b")
      .withColumn("ih", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .filter(!col("safe_a") || !col("safe_b") ||
        col("ih") / (col("na") + col("nb") - col("ih")) >= 0.8)
      .select(col("doc_a"), col("doc_b"))
    sliver
      .join(docs.select(col("doc_id").as("doc_a"), col("shingles").as("sa"),
        col("n").as("na")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shingles").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** d22: ASYMMETRIC containment — the quote/boilerplate detector Jaccard
    * structurally misses: a 30-shingle doc fully embedded in a 500-shingle
    * doc scores jaccard ≈ 0.06 (invisible at any sane threshold) but
    * containment inter/|small| = 1.0. Same banded inverted-index candidate
    * generation as d05 (hot-shingle df cap and all), only the SCORE
    * differs — so the scale story is identical and the pair economics are
    * shared, not re-derived. Emits (small ⊆ big)-oriented rows with both
    * scores; ties on size orient by id for determinism.
    */
  def d22_containment(s: SparkSession, d: String): DataFrame =
    ngramJaccardPairs(
      Tables.documents(s, d).repartition(Tables.scanPartitions(s)),
      DfCap)
      .select(
        when(col("na") <= col("nb"), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_small"),
        when(col("na") <= col("nb"), col("doc_b")).otherwise(col("doc_a"))
          .as("doc_big"),
        least(col("na"), col("nb")).cast("long").as("n_small"),
        greatest(col("na"), col("nb")).cast("long").as("n_big"),
        (col("inter") / least(col("na"), col("nb"))).as("containment"),
        col("jaccard"))
      .filter(col("containment") >= 0.8)

  /** Embedding-cosine near-dup over a bucket key. The cosine kernel is the
    * codegen'd native expression; candidate pairs are bounded by the bucket
    * (label) join key, never all-pairs.
    */
  def d06_embed_neardup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        cosine_similarity(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") > 0.35)
  }

  /** Embedding near-dup with sign-LSH candidate buckets instead of the
    * label key — the general form when no bucket column exists: candidates
    * share a 4-bit hyperplane-sign bucket (~1/16 of all pairs), then the
    * codegen'd cosine verifies. This is d06's shape decoupled from labels
    * and the one that scales to an unlabeled 100 TB corpus.
    */
  def d07_embed_neardup_lsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("bucket", SimilarityQueries.bucketOf(col("embedding")))
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine_similarity(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") > 0.3)
  }

  /** The APPLY step: produce the deduplicated corpus, not just the pair
    * report. Keep-smallest-id greedy resolution: any doc appearing as the
    * larger id of a verified near-dup pair is dropped (left-anti join
    * against the pair set). One-hop greedy — transitive clusters keep one
    * doc per chain link rather than one per full cluster, the standard
    * trade against iterative connected components at corpus scale.
    */
  def d08_dedup_apply(s: SparkSession, d: String): DataFrame = {
    val pairs = d03_dedup_minhash_lsh(s, d).filter(col("jaccard") >= 0.8)
      .select(col("doc_b").as("drop_id"))
      .distinct()
    val docs = Tables.documents(s, d)
    docs.join(pairs, docs("doc_id") === pairs("drop_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
  }

  /** The apply step again, driven by d05's jaccard pairs instead of
    * d03's minhash candidates — a second, independently-derived pair
    * source under the same greedy keep-smallest-id resolution and
    * anti-join shape. (Both chains are hash-checked now that the minhash
    * signatures are engine-portable.)
    */
  def d09_dedup_apply_exact(s: SparkSession, d: String): DataFrame = {
    val drops = d05_ngram_jaccard(s, d).filter(col("jaccard") >= 0.5)
      .select(col("doc_b").as("drop_id"))
      .distinct()
    val docs = Tables.documents(s, d)
    docs.join(drops, docs("doc_id") === drops("drop_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
  }

  /** Transitive dedup CLUSTERS over d05's verified pairs — the full
    * connected-components resolution the greedy one-hop apply (d08/d09)
    * trades away: every doc in a near-dup component maps to the component's
    * min doc_id.
    *
    * Spark shape: iterative min-label propagation. Each round is one
    * key-join + hash-agg (neighbor-min) + a label merge, with
    * localCheckpoint truncating the lineage so round i never re-executes
    * rounds 0..i-1; early-exit when no label changes. Rounds needed =
    * component diameter — near-dup clusters are shallow (dups of dups of
    * the same source), so this converges in a handful of rounds; a 100 TB
    * run with adversarial chain-shaped components would switch to the
    * large-star/small-star contraction, same per-round join shapes.
    * Singleton docs (no near-dup pair) are not emitted.
    */
  def d10_dedup_clusters(s: SparkSession, d: String): DataFrame =
    clustersFromPairs(d05_ngram_jaccard(s, d)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()) // compute the d05 pair kernel exactly once

  /** d10's min-label propagation over an already-materialized pair list —
    * split out so d35 (which needs BOTH the clusters and the raw pairs)
    * can feed one checkpointed pair frame to both consumers instead of
    * running the d05 pair kernel twice.
    */
  private[graft] def clustersFromPairs(pairs: DataFrame): DataFrame = {
    // symmetrize AND add self-loops: with (v, v) present, one neighbor-min
    // aggregate per round yields BOTH the new label (min over nbrs ∪ self)
    // and the old label (the self-edge's contribution) — so the per-round
    // labels-vs-nbrMin merge join of rounds 2-3 disappears entirely
    // (round-3 VERDICT item 8: d10's wall time regressed despite fewer
    // actions; the second join per round was the remaining structural cost).
    // Checkpointed so the self-loop distinct's shuffle runs once, not per round
    val sym = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val edges = sym
      .union(sym.select(col("doc_a"), col("doc_a").as("doc_b")).distinct())
      .localCheckpoint()
    var labels = edges.filter(col("doc_a") === col("doc_b"))
      .select(col("doc_a").as("doc_id"), col("doc_a").as("lbl"))
    var changed = 1L
    var iter = 0
    val maxIter = 20
    // ONE join + ONE map-side-partial aggregate per round; the changed
    // flag is computed inside the same aggregate row (old label = the
    // self-edge's nlbl), and the count after the checkpoint is a plain
    // scan of already-materialized blocks
    def round(l: DataFrame): DataFrame = edges
      .join(l.select(col("doc_id").as("doc_b"), col("lbl").as("nlbl")), "doc_b")
      .groupBy(col("doc_a").as("doc_id"))
      .agg(min(col("nlbl")).as("lbl"),
        min(when(col("doc_b") === col("doc_a"), col("nlbl"))).as("old"))
      .select(col("doc_id"), col("lbl"), (col("lbl") < col("old")).as("chg"))
    while (changed > 0 && iter < maxIter) {
      // TWO propagation rounds per synchronization point (the r13
      // starContract rationale): the checkpoint + count is 2 driver jobs
      // and the loop is job-overhead-bound at bench SF. Termination stays
      // exact — labels are monotone non-increasing per node, so a SECOND
      // round that changes nothing is a fixpoint regardless of what the
      // first round did; at worst one extra no-op round pair runs.
      val next = round(round(labels).select(col("doc_id"), col("lbl")))
        .localCheckpoint(eager = false) // the count materializes it (1 job)
      changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      iter += 1
    }
    // diameter > maxIter would converge to WRONG cluster reps and silently
    // poison every consumer (c04's split, the oracle hash) — fail loud; the
    // 100 TB remedy is large-star/small-star contraction (O(log n) rounds)
    if (changed > 0)
      throw new IllegalStateException(
        s"d10: min-label propagation hit ${maxIter * 2} rounds with $changed labels " +
          "still moving; component diameter exceeds the cap — use star-contraction")
    labels.select(col("doc_id"), col("lbl").as("cluster_rep"))
  }

  /** Transitive dedup clusters by LARGE-STAR/SMALL-STAR contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the O(log n)-round answer to d10's O(diameter) min-label
    * propagation, and the algorithm d10's own cap-exceeded error message
    * prescribes. Each half-round is one groupBy-min + join keyed by node
    * id (map-side partial agg; skewed star centers split by AQE), and the
    * edge set only ever shrinks toward the star form, so a path graph
    * that takes d10 O(n) rounds finishes in O(log n). Output is
    * identical to d10 — same recursive-CTE oracle, so both cluster
    * algorithms sit under the same hash gate.
    */
  def d13_dedup_clusters_star(s: SparkSession, d: String): DataFrame =
    // starContract's own distinct().localCheckpoint() materializes the
    // pair join exactly once — no extra checkpoint here
    starContract(d05_ngram_jaccard(s, d).select(col("doc_a"), col("doc_b")))

  /** Generations below this row count skip the eager per-round release:
    * the unpersist round-trip costs more than the pinned KBs it frees
    * (they fall to scope release instead); above it a generation is real
    * memory and eager release bounds the loop's footprint.
    */
  private val ReleaseFloorRows = 1000000L

  /** Star-contraction core over an undirected pair list — shared by d13
    * and the adversarial-diameter spec (a path graph deeper than any
    * sane propagation cap must still converge in O(log n) rounds).
    */
  private[graft] def starContract(pairs: DataFrame, capOverride: Int = 0): DataFrame = {
    def bidir(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // m(u) = min(N(u) ∪ {u}); large-star hangs u's LARGER neighbors onto
    // m, small-star hangs the smaller ones (and u itself) onto m
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val nb = bidir(e)
      val mins = nb.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val joined = nb.join(mins, "src")
      val out =
        if (large)
          joined.filter(col("dst") > col("src"))
            .select(col("dst").as("src"), col("m").as("dst"))
        else
          joined.filter(col("dst") <= col("src"))
            .select(col("dst").as("src"), col("m").as("dst"))
            .union(mins.select(col("src"), col("m").as("dst")))
      out.filter(col("src") =!= col("dst")).distinct()
    }
    // LAZY checkpoint + count: the count action materializes the
    // checkpoint blocks AND returns the size in ONE job — the eager
    // checkpoint spent a separate job per round just to materialize
    // (2 driver jobs/round -> 1 on a loop that is job-latency-bound at
    // bench SF: m18 runs ~80 tiny stages under a 4 s wall)
    var edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .distinct().localCheckpoint(eager = false)
    var edgeCount = edges.count()
    var changed = 1L
    var iter = 0
    // worst case for large-star/small-star alternation is O(log^2 n)
    // rounds (Kiveris et al. SoCC'14 Thm 2; typical graphs finish in
    // O(log n)) — derive the cap from the input size so an adversarial
    // component can't hit a constant cap, while still failing loud on a
    // genuine non-convergence bug
    val maxIter = if (capOverride > 0) capOverride else {
      val lg = 64 - java.lang.Long.numberOfLeadingZeros(math.max(edgeCount, 2L) * 2)
      math.max(12, lg * lg)
    }
    while (changed > 0 && iter < maxIter) {
      // exactly ONE (large, small) pair per checkpoint: star() references
      // its input ~4x (bidir twice, mins join), so nesting k pairs per
      // sync duplicates the input subtree 4^k-fold — measured this round
      // as a 5x wall regression (d13 2.6 -> 14.3 s) when two pairs were
      // tried to halve the driver sync points. The sync cost is the
      // cheaper side of that trade; d10's label rounds (linear input
      // references) are where double-rounds-per-sync actually pay.
      val next = star(star(edges, large = true), large = false)
        .localCheckpoint(eager = false)
      // distinct edge sets are equal iff sizes match and one difference is
      // empty — the count below materializes the lazy checkpoint in the
      // same job, + one keys-only anti join per round when sizes tie
      val nextCount = next.count()
      changed =
        if (nextCount != edgeCount) 1L
        else next.join(edges, Seq("src", "dst"), "left_anti").count()
      // gen N-1's last read is the anti join above — release eagerly (the
      // t17 generational discipline) when the generation is WORTH a
      // block-manager round-trip: below the floor, O(log n) pinned
      // pair-frames are KBs and the per-call unpersist churn (measured
      // ~0.4 s across m18's rounds at bench SF) costs more than scope
      // release ever would; above it, each generation is real memory and
      // eager release is what bounds the loop's footprint at 100 TB
      if (edgeCount > ReleaseFloorRows) graft.Checkpoints.release(edges)
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"star contraction not converged after $maxIter rounds ($changed edge diffs)")
    // converged: every component is a star around its min node
    bidir(edges).groupBy(col("src").as("doc_id"))
      .agg(min(col("dst")).as("mn"))
      .select(col("doc_id"), least(col("mn"), col("doc_id")).as("cluster_rep"))
  }

  /** Incremental-ingest dedup: a NEW batch of documents probes the
    * EXISTING corpus's inverted shingle index — the shape a 100 TB
    * pipeline actually runs daily (only the batch's shingles ever probe;
    * the corpus side is a bucketed table that never rescans itself, and
    * batch-internal dups are d05's job on the batch alone). Here the
    * batch is the ~1/7 of docs with doc_id % 7 == 0, the corpus the rest;
    * emits each new doc's verdict with its best corpus match.
    */
  /** Bigram inverted-index rows (doc_id, lang, source, n, shingle, key)
    * over a document frame — the probe kernel shared by batch d11 and the
    * streaming-ingest composition in StreamingSpec. Bigrams, denser than
    * d05's trigrams: an ingest probe wants recall. `key` is the QUALIFIED
    * posting key `lang U+0001 source U+0001 shingle` — the single column
    * the probe join runs on (injective because lang/source never contain
    * the U+0001 separator), which is what lets the persisted index bucket
    * on ONE column and the probe join consume the bucket layout with no
    * store-side exchange. Built with `concat`, NOT `concat_ws`: concat_ws
    * SKIPS null arguments, so (NULL,'en',sh) and ('en',NULL,sh) would
    * collapse to the same key and rows with a null lang/source would
    * start matching each other — whereas the qualified key must
    * reproduce a three-column `===` join, under which a null component
    * never matches anything. `concat` null-propagates, and the explicit
    * isNotNull filter keeps the never-joinable rows out of the index
    * entirely (they would only widen the store and the probe shuffle).
    */
  private[graft] def bigramIndex(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      // the codegen'd WordShingles kernel, NOT a SQL transform(sequence)
      // lambda: higher-order functions are interpreted-only, and the
      // explode's inferred non-empty filter DUPLICATES its child
      // expression and pushes it into the scan stage — flight-recorded
      // as a 1-task, 2.4 s interpreted shingle pass at bench SF (75% of
      // d11's wall) before the kernel fix
      .withColumn("shingles", array_distinct(
        graft.functions.TextFunctions.word_shingles(col("toks"), 2)))
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("shingles")).as("n"), explode(col("shingles")).as("shingle"))
      .withColumn("key",
        concat(col("lang"), lit("\u0001"), col("source"), lit("\u0001"),
          col("shingle")))
      .filter(col("key").isNotNull)

  /** New-batch index rows probe the corpus index rows: jaccard per
    * candidate pair, best corpus match per new doc (TopKPerGroup k=1),
    * duplicate/novel verdict. Only the batch side ever probes — the
    * corpus never self-scans. The join runs on the qualified single-column
    * `key` (== equality on shingle AND lang AND source) so a bucketed
    * corpus side needs no exchange.
    */
  private[graft] def probeIndex(batch: DataFrame, corpus: DataFrame): DataFrame = {
    val scores = batch.as("b").join(corpus.as("c"),
        col("b.key") === col("c.key"))
      .groupBy(col("b.doc_id").as("new_doc"), col("c.doc_id").as("corpus_doc"),
        col("b.n").as("nb"), col("c.n").as("nc"))
      .agg(count(lit(1)).as("inter"))
      .select(col("new_doc"), col("corpus_doc"),
        (col("inter") / (col("nb") + col("nc") - col("inter"))).as("jaccard"))
    graft.plans.TopKPerGroup.topK(scores, Seq("new_doc"),
      Seq(graft.plans.TopKPerGroup.Ord("jaccard", desc = true),
        graft.plans.TopKPerGroup.Ord("corpus_doc")), 1)
      .select(col("new_doc"), col("corpus_doc"), col("jaccard"),
        when(col("jaccard") >= 0.5, "duplicate").otherwise("novel").as("verdict"))
  }

  /** Persisted corpus-side bigram inverted index for d11 — the d18
    * build-once / probe-stored economics applied to the ingest-probe
    * kernel (round-10 verdict item 2: the registry's "incremental" label
    * previously sat on a plan that re-shingled yesterday's corpus inline
    * every run). Keyed by corpus identity (size + mtime — the s17/d18
    * convention: regeneration orphans stale indexes), committed by a
    * `_complete` marker. The stored table is exactly the inline
    * formulation's corpus frame, so the query result — and its oracle —
    * are unchanged.
    */
  /** Returns the CATALOG NAME of the index table. The layout is BUCKETED
    * on the probe's single qualified join key (`CLUSTERED BY (key) INTO 16
    * BUCKETS`, the [[Buckets]] machinery): the probe join then reads the
    * store's buckets as join partitions with NO exchange on the corpus
    * side — only the batch's shingles ever shuffle, which is the whole
    * point of an incremental ingest at 100 TB (probe shuffle tracks BATCH
    * size; the corpus pays its one shuffle at build time). Bucketing the
    * key alone is why [[bigramIndex]] qualifies it into one column: a
    * 3-key join over a 1-column bucket layout makes the planner shuffle
    * BOTH sides (measured at the 25x probe — 175 MB of store re-shuffle
    * per probe run). 16 buckets is fixture-sized; a 100 TB layout sizes
    * it to target file counts and the plan shape is identical.
    */
  private[graft] def ensureBigramIndex(s: SparkSession, d: String): String =
    synchronized {
      val f = new java.io.File(d, "documents.parquet")
      val ident = s"${f.length()}_${f.lastModified()}"
      // v4: the round-12 content change (concat key, null lang/source rows
      // filtered, WordShingles kernel) altered the stored rows — the
      // version keys the dir (the CoGraph convention), so stale v3 stores
      // are orphaned instead of re-attaching via their _complete marker
      // and serving collapsed null-key rows
      val tbl = s"bigram_idx_v4_${d.hashCode & 0x7fffffff}_$ident"
      if (s.catalog.tableExists(tbl)) return tbl
      val numBuckets = 16
      val loc = SketchQueries.partialsDir(s"bigram_v4_$ident", d) +
        "/corpus_bigrams"
      // the probe needs (doc_id, n, key) — lang/source/shingle live inside
      // the qualified key; storing them again would only widen the scan
      val idx = bigramIndex(Tables.documents(s, d)
          .repartition(Tables.scanPartitions(s))
          .filter(col("doc_id") % 7 =!= 0))
        .select(col("doc_id"), col("n"), col("key"))
      if (new java.io.File(loc, "_complete").exists()) {
        // layout already committed by a prior session: metadata re-attach
        s.sql(s"CREATE TABLE $tbl (${idx.schema.toDDL}) USING parquet " +
          s"CLUSTERED BY (key) SORTED BY (key) " +
          s"INTO $numBuckets BUCKETS LOCATION '$loc'")
      } else {
        idx.repartition(numBuckets, col("key"))
          .write.mode("overwrite")
          .bucketBy(numBuckets, "key").sortBy("key")
          .option("path", loc).saveAsTable(tbl)
        new java.io.File(loc, "_complete").createNewFile()
      }
      tbl
    }

  def d11_incremental_dedup(s: SparkSession, d: String): DataFrame = {
    // the batch is doc_id % 7 (deliberately coprime with the fixture's
    // source = doc_id % 10 so the split crosses source buckets). Only the
    // BATCH is shingled at query time — the corpus side reads the
    // persisted bucketed index ([[ensureBigramIndex]]), so per-ingest
    // cost is batch kernel + a probe join that shuffles ONLY the batch
    // (PlanInvariantsSpec pins one documents scan and a bucketed,
    // exchange-free corpus side).
    val tbl = ensureBigramIndex(s, d)
    probeIndex(
      bigramIndex(Tables.documents(s, d)
        .repartition(Tables.scanPartitions(s))
        .filter(col("doc_id") % 7 === 0)),
      s.table(tbl))
  }

  /** Repeated-passage statistics — the RefinedWeb/C4 "duplicated text
    * fraction" signal (Penedo et al. 2023, arXiv:2306.01116 §3.3): for
    * each document, what fraction of its distinct 13-token runs also
    * appears in at least one OTHER document. Boilerplate-heavy and
    * template-cloned docs approach 1.0; the verdict prunes them before
    * the (more expensive) pairwise near-dup pass.
    *
    * Shape at scale: gram document-frequency is a map-side-partial hash
    * aggregate keyed by the gram; joining df back onto the gram stream is
    * a plain equi join whose build side carries ONE row per gram — fan-out
    * is linear in gram occurrences, never pairwise (no doc x doc blowup,
    * unlike candidate generation). The gram stream is localCheckpointed so
    * the shingle kernel runs once for both consumers (the d03 lesson).
    */
  /** The df>=2 distinct-gram set of a (…, ng) frame, computed with d17's
    * two-level scheme: the corpus-sized aggregate keys on xxhash64(ng)
    * (8 bytes through the big shuffle, not ~90-char gram strings) and
    * only prunes size-1 hash groups — provably lossless, since a df>=2
    * gram's hash group always has >= 2 rows; the exact string-keyed
    * df>=2 filter then runs on the duplicated sliver alone. Shared by
    * the gram-df family (d12/d14) whose downstream only consumes
    * shared-or-not.
    */
  private[operators] def sharedGramDf(grams: DataFrame): DataFrame = {
    val g = grams.withColumn("gh", xxhash64(col("ng")))
    val cand = g.groupBy("gh").count()
      .filter(col("count") >= 2).select("gh")
    g.join(cand, "gh")
      .groupBy("ng").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
  }

  private def sharedGramSet(grams: DataFrame): DataFrame =
    sharedGramDf(grams).select("ng")

  def d12_passage_stats(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.word_shingles
    val grams = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"),
        explode(word_shingles(split(lower(col("text")), " "), 13)).as("ng"))
      .localCheckpoint() // df agg + join-back share one kernel pass
    // shared-or-not is all the census needs, so the df aggregate runs
    // two-level ([[sharedGramSet]]) and the join back is a semi join
    // carrying only membership
    val shared = sharedGramSet(grams)
    val sharedCnt = grams.join(shared, Seq("ng"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(sharedCnt, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        (col("n_shared") / col("n_grams")).as("dup_frac"),
        when((col("n_shared") / col("n_grams")) > 0.5, "prune")
          .otherwise("keep").as("verdict"))
  }

  /** d33: SOFT dedup — down-WEIGHT repeated content instead of dropping
    * it (SoftDedup, She et al. ACL'24: sampling weight ∝ 1/commonness,
    * commonness = how corpus-frequent a document's n-grams are; the
    * data-constrained-scaling alternative to d08's hard drop, which
    * preserves rare-tail coverage while de-emphasizing boilerplate).
    * Per doc over its DISTINCT 13-grams: commonness_pm = mean gram
    * document-frequency ×1000 (>= 1000; all-unique docs sit exactly at
    * 1000), weight_pm = 1e6 DIV commonness_pm (the 1/x reweighting in
    * per-mille), effective tokens = n_tokens * weight_pm DIV 1000. Docs
    * too short to shingle (< 13 tokens) repeat nothing — weight 1000 by
    * contract. Output: the per-source datasheet line a mixture plan
    * bills against (docs, raw vs effective tokens, retention per-mille).
    *
    * Shape at scale: d12's economics exactly — one gram pass (distinct
    * grams linear in tokens), gram-DF keyed agg with map-side partials,
    * one join back on gram, then keys-only doc/source rollups. Nothing
    * pairwise, nothing driver-side; integer arithmetic end-to-end so the
    * weights themselves hash-check cross-engine.
    */
  def d33_soft_dedup(s: SparkSession, d: String): DataFrame =
    softDedupFrom(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** d33 over an arbitrary (doc_id, source, text) frame — split out so the
    * spec can plant exact-duplicate and too-short-to-shingle cases.
    */
  private[graft] def softDedupFrom(documents: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.word_shingles
    val docs = documents
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        word_shingles(split(lower(col("text")), " "), 13).as("ngs"))
      .localCheckpoint() // gram pass + census share one tokenize
    val grams = docs.select(col("doc_id"), explode(col("ngs")).as("ng"))
      .localCheckpoint() // df agg + join-back share one explode
    // two-level df ([[sharedGramDf]]): a df=1 gram contributes exactly 1
    // to its doc's df sum, so sum_df = n_grams + Σ over SHARED grams of
    // (df - 1) — the join back touches only the duplicated sliver and
    // the corpus-sized aggregate keys on 8-byte hashes
    val extra = grams.join(sharedGramDf(grams), "ng")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_docs") - 1).as("extra"))
    val common = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
      .join(extra, Seq("doc_id"), "left")
      .select(col("doc_id"),
        expr("(n_grams + coalesce(extra, 0)) * 1000 DIV n_grams")
          .as("commonness_pm"))
    docs.join(common, Seq("doc_id"), "left")
      .withColumn("w_pm",
        expr("1000000 DIV coalesce(commonness_pm, 1000)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("raw_tokens"),
        sum(expr("n_tokens * w_pm DIV 1000")).as("eff_tokens"))
      .withColumn("retention_pm",
        expr("eff_tokens * 1000 DIV raw_tokens"))
  }

  /** Passage-level dedup APPLY — the transformation d12 only measures
    * (RefinedWeb, Penedo et al. 2023, arXiv:2306.01116 §3.3: duplicated
    * spans are REMOVED from documents before training, not whole docs
    * dropped). A 13-token run whose gram appears in at least one other
    * document marks its entire token span [i, i+12] as covered; the
    * rewritten document keeps exactly the uncovered tokens.
    *
    * Shape at scale: positional grams are linear in tokens (each token
    * starts at most one gram); gram document-frequency is the same
    * map-side-partial aggregate as d12; the shared-gram semi join carries
    * one row per gram; covered-span starts collapse back to one
    * array-per-doc row bounded by document length (collect_set order is
    * irrelevant — starts are only membership-tested). The rewrite itself
    * is a zero-shuffle per-row lambda. Nothing is ever pairwise.
    */
  def d14_passage_dedup_apply(s: SparkSession, d: String): DataFrame =
    passageDedupApply(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** The rewrite core over any (doc_id, text) frame — separated so the
    * remove-the-span semantics are pinned on a hand-built corpus
    * (DedupScaleSpec) independent of the fixture.
    */
  private[graft] def passageDedupApply(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .localCheckpoint() // gram stream + the rebuild both read this once
    val posGrams = toks
      .filter(size(col("toks")) >= 13)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 12), i -> struct(i AS i, " +
          "array_join(slice(toks, i, 13), ' ') AS ng))")).as("pg"))
      .select(col("doc_id"), col("pg.i").as("i"), col("pg.ng").as("ng"))
    // document frequency over DISTINCT docs (a gram repeated inside one
    // doc is not "shared" — identical to d12's distinct-gram df), through
    // the same two-level hash-keyed aggregate
    val shared = sharedGramSet(
      posGrams.select(col("doc_id"), col("ng")).distinct())
    val starts = posGrams
      .join(shared, Seq("ng"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("i")).as("starts"))
    toks.join(starts, Seq("doc_id"), "left")
      .withColumn("kept", expr(
        "filter(sequence(1, size(toks)), j -> starts IS NULL OR " +
          "size(filter(starts, i -> i <= j AND j <= i + 12)) = 0)"))
      .select(col("doc_id"),
        expr("array_join(transform(kept, j -> element_at(toks, j)), ' ')")
          .as("cleaned_text"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed_tokens"),
        ((size(col("toks")) - size(col("kept"))) / size(col("toks")))
          .as("removed_frac"))
  }

  /** SemDeDup (Abbas et al. '23): semantic deduplication — within each
    * embedding cluster, a vector is a semantic duplicate if some
    * EARLIER-id vector in the same cluster sits above the cosine
    * threshold; the earlier one is kept (their "keep one per duplicate
    * group" policy made deterministic by id order). Cells here are the
    * label column (the same exact stand-in for trained k-means cells that
    * keeps d06/s04 hash-checkable); a production run swaps in
    * [[graft.functions.KMeans]] assignments. Shape at scale: the pair
    * join is CELL-BOUNDED (SemDeDup's core economics — clusters cap the
    * candidate set, never corpus x corpus), the max-aggregate is
    * map-side-partial, and max over exact doubles is order-independent,
    * so the dropped set hash-checks with no rounding at all.
    */
  def d15_semdedup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("b.label").as("label"),
        graft.functions.VectorFunctions.cosine_similarity(
          col("a.embedding"), col("b.embedding")).as("sim"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(col("sim")).as("max_sim_earlier"))
      .filter(col("max_sim_earlier") > 0.33)
  }

  /** Approximate-string similarity join core (edit distance <= k) over any
    * single-column `name` frame — the q-gram count filter of Gravano et al.
    * (VLDB'01): two strings within edit distance k share at least
    * max(|a|,|b|) - q + 1 - k*q positional q-grams (as a multiset), so an
    * inverted bigram index + a shared-gram count threshold yields a
    * COMPLETE candidate set (no false negatives) without any all-pairs
    * comparison, and the exact `levenshtein` kernel runs only on survivors.
    *
    * Scale shape: candidates meet only on a shared gram (the same banded
    * inverted-index economics as d05's shingle join — shuffle key is the
    * gram), the multiset intersection is one map-side-partial
    * sum(least(cnt_a, cnt_b)), and the length filters (|len_a - len_b| <= k,
    * len >= minLen so the count bound stays >= 1) prune before the count.
    * Hot grams fan out like hot shingles; AQE's skew split handles the
    * residual (a df-cap would break the completeness guarantee, so unlike
    * d05 none is applied — at web scale one caps by blocking on a second
    * key, e.g. a token, accepting documented recall loss).
    *
    * Determinism: integer distances and counts only -> hash-green.
    */
  private[graft] def editDistJoin(names: DataFrame, k: Int): DataFrame = {
    val q = 2
    val minLen = q + 1 + k * q // count bound >= 1 ⇔ completeness holds
    val eligible = names.filter(length(col("name")) >= minLen)
    val grams = eligible
      .select(col("name"), explode(expr(
        s"transform(sequence(1, length(name) - ${q - 1}), " +
          s"i -> substring(name, i, $q))")).as("gram"))
      .groupBy("name", "gram").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // both sides of the self-join read this once
    grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.name") < col("b.name") &&
          abs(length(col("a.name")) - length(col("b.name"))) <= k)
      .groupBy(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .agg(sum(least(col("a.cnt"), col("b.cnt"))).as("shared"))
      .filter(col("shared") >=
        greatest(length(col("name_a")), length(col("name_b"))) - lit(q - 1 + k * q))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .filter(col("dist") <= k)
  }

  /** d16: fuzzy (edit-distance) similarity join over the distinct
    * part-name catalog — the record-linkage / typo-dedup operator: find all
    * name pairs within edit distance 2 without comparing all pairs.
    */
  def d16_editdist_join(s: SparkSession, d: String): DataFrame =
    editDistJoin(
      Tables.part(s, d).select(col("p_name").as("name")).distinct(), 2)

  /** d18: PERSISTED MinHash LSH index — s17/s18's build-once / probe-stored
    * economics applied to TEXT dedup. The offline build shingles and
    * signs yesterday's corpus (doc_id % 17 != 0) ONCE and persists two
    * tables under a corpus-identity-keyed dir (the s17 convention: size +
    * mtime in the name orphans stale indexes on regeneration):
    *
    *   {{{<dir>/bands     (doc_id, band_no, b_lo, b_hi)}}}
    *   {{{<dir>/shingles  (doc_id, shingles string[])}}}
    *
    * committed by a `_complete` marker. The query path computes signatures
    * for TODAY'S batch only (doc_id % 17 == 0, ~6% of docs), probes the
    * stored band buckets, and verifies candidates against the stored
    * shingle sets — the raw corpus text is never re-read (PlanInvariantsSpec
    * pins documents.parquet scanned exactly once: the batch side). This is
    * d11's incremental probe-join taken to its production form: d11 still
    * recomputes the corpus-side index inline every run; here the corpus
    * pays its shingle/minhash kernel once per version. Same bands, same
    * thresholds as d03, so QueriesSpec pins exact pair-and-jaccard
    * equality with inline d03 restricted to cross-split pairs.
    */
  private[graft] def ensureMinhashIndex(s: SparkSession, d: String): String = {
    val f = new java.io.File(d, "documents.parquet")
    val dir = SketchQueries.partialsDir(
      // v2: portable polynomial base hash + injective 2-long band keys
      s"minhash_v2_${f.length()}_${f.lastModified()}", d)
    if (!new java.io.File(dir, "_complete").exists()) {
      val base = docShingles(s, d).filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("shingles"))
        .withColumn("sig", minhash_signature(col("shingles")))
        .localCheckpoint() // one kernel pass feeds both stored tables
      bandsOf(base).write.mode("overwrite").parquet(s"$dir/bands")
      base.select(col("doc_id"), col("shingles"))
        .write.mode("overwrite").parquet(s"$dir/shingles")
      new java.io.File(dir, "_complete").createNewFile()
    }
    dir
  }

  /** The probe half over an arbitrary batch frame — shared by the registry
    * query and StreamingSpec's foreachBatch run (a micro-batch's pairs
    * depend only on its own docs + the stored index, so per-batch probes
    * union to the one-shot result).
    */
  private[graft] def probeMinhashIndex(
      s: SparkSession, batchDocs: DataFrame, dir: String): DataFrame = {
    val batch = shingled(batchDocs)
      .select(col("doc_id"), col("shingles"))
      .withColumn("sig", minhash_signature(col("shingles")))
      .localCheckpoint() // batch kernel runs once for bands + verify
    val cands = bandsOf(batch).as("x")
      .join(s.read.parquet(s"$dir/bands").as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.b_lo") === col("y.b_lo") &&
          col("x.b_hi") === col("y.b_hi"))
      .select(col("x.doc_id").as("new_doc"), col("y.doc_id").as("corpus_doc"))
      .distinct()
    cands
      .join(batch.select(col("doc_id"), col("shingles")).as("sa"),
        col("new_doc") === col("sa.doc_id"))
      .join(s.read.parquet(s"$dir/shingles").as("sb"),
        col("corpus_doc") === col("sb.doc_id"))
      .select(col("new_doc"), col("corpus_doc"),
        jaccard(col("sa.shingles"), col("sb.shingles")).as("jaccard"))
      .filter(col("jaccard") >= 0.05)
  }

  def d18_persisted_minhash(s: SparkSession, d: String): DataFrame = {
    val dir = ensureMinhashIndex(s, d)
    probeMinhashIndex(s,
      Tables.documents(s, d)
        .repartition(Tables.scanPartitions(s))
        .filter(col("doc_id") % 17 === 0), dir)
  }

  /** d17: EXACT duplicated-substring spans — the suffix-array-style dedup
    * of Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL'22), re-expressed as three relational passes instead of
    * a monolithic suffix array: (1) stride-1 character 40-grams with
    * positions (one explode; docs shorter than the gram drop — and the
    * sequence() call must be guarded: Spark reverses sequence(1,0) to
    * [1,0] instead of returning []); (2) gram-equality self-join over the
    * grams occurring 2..16 times — df=1 grams are pair-sterile and df>16
    * is the boilerplate cap (the d05 hot-shingle economics: an uncapped
    * viral gram is a quadratic bomb, and >16-fold repeated 40-char strings
    * are templates, not signal); (3)
    * gaps-and-islands span merge: matches on one (da, db, pa-pb) diagonal
    * with consecutive positions collapse via the pa - row_number() trick
    * into MAXIMAL spans of length run+39. Everything is integer
    * arithmetic -> hash-green against DuckDB running the same three
    * passes. At 100 TB the shingle table is |corpus| rows — that IS the
    * honest cost of exact substring dedup (suffix arrays pay the same
    * linear blowup); gram identity is its 60-bit portable poly hash so
    * the corpus-sized shuffles carry an 8-byte key instead of 40-char
    * strings, and the diagonal windows are per-pair tiny (never a
    * corpus-sized sort).
    */
  def d17_substring_spans(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.hash60
    val k = 40
    val minSpan = 60
    // Round 10 (verdict item 2, exactness restored after self-review):
    // TWO-LEVEL filtering where the CORPUS-sized shuffles carry only
    // (doc_id, pos, hash60) — 8-byte keys instead of 40-char strings —
    // and every EXACT decision happens on the survivor sliver. Level 1
    // prunes hash-groups of size 1 only (a df≥2 gram's hash group
    // necessarily has ≥2 rows, so no true survivor is ever lost; a
    // colliding df=1 gram merely rides along). Level 2 re-derives the
    // gram STRING for the sliver alone and applies the 2..16 band plus
    // the pair self-join on the exact string — so a 60-bit collision can
    // neither exclude a true duplicate gram (the birthday bound at 1e13
    // grams is ~1e7 collisions — NOT ignorable, which is why the band
    // must not act on merged hash counts) nor fabricate a pair. Output
    // is bit-identical to the one-level exact-string algorithm at any
    // corpus size; the DuckDB oracle states the pure exact semantics.
    // The gram frames are STATELESS projections of the compressed text
    // scan — recomputing per consumer is one pipelined pass, while
    // CACHING was ~10 GB of object-store spill at the 100× probe (and
    // the unroll churn OOM'd a 48 GB heap). Only the survivor sliver —
    // the data-dependently small frame that IS worth holding —
    // checkpoints.
    def shBase = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .withColumn("n", length(col("text")))
      .withColumn("pos",
        explode(when(col("n") >= k, sequence(lit(1), col("n") - (k - 1)))
          .otherwise(array().cast("array<int>"))))
    def sh = shBase
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        hash60(expr(s"substring(text, pos, $k)")).as("gh"))
    // only grams occurring 2..16 times can ever produce a pair: df=1 is
    // pair-sterile (the bulk of the table) and df>16 is the boilerplate
    // cap — so the survivor list is tiny and the self-join input collapses
    // from |corpus| shingles to just the duplicated ones (sf0.1: 5.4s →
    // 2.5s; at 100 TB this is the difference between self-joining the
    // corpus and self-joining its duplicate sliver).
    // The survivor lists are DATA-DEPENDENT: "tiny" on a real
    // mostly-unique corpus, but nothing bounds them — a duplicate-heavy
    // corpus makes them O(distinct grams). The 25× probe caught exactly
    // that: the planner's estimate broadcast the survivors (~7M hashes
    // there) and the build died at the driver. Broadcast must be a proven
    // bound, not a stats guess (the c08 rule), so the survivor joins are
    // pinned SHUFFLE_HASH: same one-shuffle cost class as the broadcast
    // at small scale (the build side hashes per-partition, no sort), and
    // safe at any survivor cardinality on any topology.
    val cand = sh.groupBy("gh").count()
      .filter(col("count") >= 2).select("gh")
      .localCheckpoint() // hash-groups that can possibly pair: small
    // level 2: gram strings exist ONLY on the sliver — the string column
    // is re-derived in the same scan pass that the hash join filters
    val shc = shBase
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        expr(s"substring(text, pos, $k)").as("gram"),
        hash60(expr(s"substring(text, pos, $k)")).as("gh"))
      .join(cand.hint("shuffle_hash"), "gh")
      .select(col("doc_id"), col("pos"), col("gram"))
      .localCheckpoint() // survivor occurrences feed the band AND both join sides
    val keep = shc.groupBy("gram").count()
      .filter(col("count").between(2, 16)).select("gram")
    val sk = shc.join(keep.hint("shuffle_hash"), "gram")
    // the pair self-join sides are corpus-dependent too — same rule
    val m = sk.select(col("doc_id").as("da"), col("pos").as("pa"), col("gram"))
      .join(sk.select(col("doc_id").as("db"), col("pos").as("pb"), col("gram"))
          .hint("shuffle_hash"),
        Seq("gram"))
      .filter(col("da") < col("db"))
      .withColumn("diag", col("pa") - col("pb"))
    val w = Window.partitionBy(col("da"), col("db"), col("diag")).orderBy(col("pa"))
    m.withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("da"), col("db"), col("diag"), col("island"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (count(lit(1)) + (k - 1)).as("span_len"))
      .filter(col("span_len") >= minSpan)
      .select(col("da"), col("db"), col("start_a"), col("start_b"), col("span_len"))
  }

  /** d19: line-level boilerplate dedup — RefinedWeb §3.2 / MassiveText
    * "repetitious line removal" at corpus scope: a line that appears
    * verbatim in >= 2 distinct documents is boilerplate (headers, nav
    * bars, license banners) and is struck from EVERY document containing
    * it; surviving lines reassemble in original order. The synthetic
    * corpus has no newlines, so "line" here is a fixed-width 4-token
    * segment (the segmentation is one `split` — a real corpus swaps in
    * `split(text, '\n')` and nothing else changes).
    *
    * Scale shape: segmenting is a zero-shuffle explode; the duplicate-line
    * list is one hash aggregate keyed by line text (map-side partials, and
    * at 100 TB the key would be xxhash64(line) with the string kept only
    * for the final re-check); the strike pass is a left-anti join of line
    * rows against that (small) duplicate list; reassembly is one
    * groupBy(doc) carrying (idx, line) structs — linear everywhere, no
    * pairwise anything. All-string/integer ops -> hash-green.
    */
  def d19_line_dedup(s: SparkSession, d: String): DataFrame =
    lineDedup(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** The strike-and-reassemble pipeline over any (doc_id, lang, text)
    * frame — QueriesSpec drives it with a planted corpus where the exact
    * surviving text is known by hand.
    */
  private[graft] def lineDedup(docsIn: DataFrame): DataFrame = {
    val w = 4
    val docs = docsIn
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_lines", ((size(col("toks")) + (w - 1)) / w).cast("long"))
      .select(col("doc_id"), col("lang"), col("toks"), col("n_lines"))
    val lines = docs
      .withColumn("i",
        explode(when(col("n_lines") >= 1, sequence(lit(0L), col("n_lines") - 1))
          .otherwise(array().cast("array<long>"))))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("toks"), (col("i") * w + 1).cast("int"), lit(w)), " ")
          .as("line"))
      .localCheckpoint() // one segmentation pass feeds the df agg AND the strike join
    val dupLines = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("line"))
    val kept = lines.join(dupLines, Seq("line"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(sort_array(collect_list(struct(col("i"), col("line")))),
            x => x.getField("line")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"), col("lang"), col("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** d20: probabilistic record linkage (Fellegi–Sunter shape) between two
    * sources sharing NO key — customer and supplier records resolved as
    * candidate "same entity" pairs. Entity resolution is the step beyond
    * content dedup (d01-d19 match CONTENT; linkage matches RECORDS across
    * heterogeneous schemas), and its three stages are all shuffle-shaped:
    *
    *   1. BLOCK — candidate pairs exist only inside a nationkey block, so
    *      the pair count is Σ|block_c|·|block_s|, never |C|×|S|. At 100 TB
    *      the block key is the scale dial: compound keys shrink blocks,
    *      and a hot block is an ordinary skewed join (salting applies).
    *   2. SCORE — per-field agreement weights summed in exact integers:
    *      entity-number suffix parsed from the display name (strong,
    *      +22/-5), $2000 account-balance bucket (+8/-3), balance sign
    *      (+4/-2). The FS model derives log-odds weights from labeled
    *      agreement rates; fixed integer weights keep the score itself
    *      hash-checkable. Bucket floor uses a +1e7-shift so truncating
    *      integer division equals floor for negative balances too.
    *   3. RESOLVE — threshold 26 (suffix agreement alone is 22+8-2=28 max
    *      only with bucket corroboration, so the gate demands suffix AND
    *      bucket), then the best supplier per customer through one
    *      (score desc, s_suppkey) window, carrying the above-threshold
    *      candidate count a human review queue needs.
    */
  def d20_record_linkage(s: SparkSession, d: String): DataFrame = {
    def side(df: DataFrame, key: String, name: String, nat: String,
        bal: String): DataFrame =
      df.select(col(key),
        col(nat).cast("int").as(s"${key}_nat"),
        (regexp_extract(col(name), "(\\d+)", 1).cast("long") % 50)
          .as(s"${key}_suffix"),
        round(col(bal) * 100).cast("long").as(s"${key}_cents"))
    val c = side(Tables.customer(s, d), "c_custkey", "c_name", "c_nationkey",
      "c_acctbal")
    val sup = side(Tables.supplier(s, d), "s_suppkey", "s_name",
      "s_nationkey", "s_acctbal")
    // exact integer quotient: the +1e7 shift keeps the operand positive so
    // (a - a%b)/b is floor division — identical to DuckDB's `//` there, and
    // the double division is exact (numerator a multiple of b, < 2^53)
    def bucket(c: Column): Column = {
      val a = c + lit(10000000L)
      ((a - pmod(a, lit(200000L))) / lit(200000L)).cast("long")
    }
    val scored = c.join(sup, col("c_custkey_nat") === col("s_suppkey_nat"))
      .withColumn("score",
        when(col("c_custkey_suffix") === col("s_suppkey_suffix"), 22)
          .otherwise(-5) +
        when(bucket(col("c_custkey_cents")) === bucket(col("s_suppkey_cents")),
          8).otherwise(-3) +
        when((col("c_custkey_cents") >= 0) === (col("s_suppkey_cents") >= 0),
          4).otherwise(-2))
      .filter(col("score") >= 26)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey"))
      .orderBy(col("score").desc, col("s_suppkey"))
    scored
      .withColumn("n_candidates", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("c_custkey"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("s_suppkey"),
        col("score").cast("long").as("score"), col("n_candidates"))
  }

  /** d21: multi-pass blocking — the recall dial on d20 (what s20's
    * multiprobe is to s02). Single-key blocking misses every true match
    * whose blocking field disagrees; production linkage unions SEVERAL
    * blocking passes and scores the deduplicated candidate set once. A
    * pair agreeing on suffix + bucket + sign but in DIFFERENT nations
    * (score 34) is invisible to d20 and found by pass 2 — QueriesSpec
    * pins both the containment (d21 ⊇ d20's matched pairs) and that the
    * recall gain is real on this data. Output is every above-threshold
    * pair with a provenance bitmask (1 = nation block, 2 = balance
    * block, 3 = both) — the audit trail a linkage reviewer needs.
    *
    * Blocking-key cardinality is the whole game: the first cut blocked
    * pass 2 on the raw $2000 balance bucket — SIX distinct blocks, and
    * the 10x ScaleProbe measured the degeneration (233 s, ~250M
    * candidate pairs: a near-cartesian wearing a blocking costume). The
    * fix is a COMPOUND key, (bucket, suffix): the match threshold (26)
    * already requires BOTH fields to agree, so every reachable match
    * lives inside a compound block and the output is bit-identical —
    * recall costs nothing, while block count goes 6 → 300 and the pass-2
    * join shrinks by ~50x. Each pass is a bounded equi-join; the union
    * dedups by (c, s) key with a bit_or aggregate, so the cost is
    * Σ per-pass block joins, never |C|×|S|.
    */
  def d21_multiblock_linkage(s: SparkSession, d: String): DataFrame = {
    def side(df: DataFrame, key: String, name: String, nat: String,
        bal: String): DataFrame =
      df.select(col(key),
        col(nat).cast("int").as(s"${key}_nat"),
        (regexp_extract(col(name), "(\\d+)", 1).cast("long") % 50)
          .as(s"${key}_suffix"),
        round(col(bal) * 100).cast("long").as(s"${key}_cents"))
    def bucket(c: Column): Column = {
      val a = c + lit(10000000L)
      ((a - pmod(a, lit(200000L))) / lit(200000L)).cast("long")
    }
    val c = side(Tables.customer(s, d), "c_custkey", "c_name", "c_nationkey",
      "c_acctbal").withColumn("c_bkt", bucket(col("c_custkey_cents")))
    val sup = side(Tables.supplier(s, d), "s_suppkey", "s_name",
      "s_nationkey", "s_acctbal").withColumn("s_bkt", bucket(col("s_suppkey_cents")))
    val p1 = c.join(sup, col("c_custkey_nat") === col("s_suppkey_nat"))
      .withColumn("blk", lit(1L))
    val p2 = c.join(sup, col("c_bkt") === col("s_bkt") &&
        col("c_custkey_suffix") === col("s_suppkey_suffix"))
      .withColumn("blk", lit(2L))
    // score and threshold BEFORE the dedup aggregate: the score is a pure
    // function of the pair (identical on every pass's copy), so filtering
    // first is semantics-preserving — and it means only MATCHES enter the
    // (c, s) shuffle, not every candidate the blocks enumerated (at the
    // 10x probe: 5.2M rows aggregated instead of ~60M)
    p1.unionByName(p2)
      .withColumn("score",
        when(col("c_custkey_suffix") === col("s_suppkey_suffix"), 22)
          .otherwise(-5) +
          when(col("c_bkt") === col("s_bkt"), 8).otherwise(-3) +
          when((col("c_custkey_cents") >= 0) === (col("s_suppkey_cents") >= 0),
            4).otherwise(-2))
      .filter(col("score") >= 26)
      .groupBy(col("c_custkey"), col("s_suppkey"))
      .agg(expr("bit_or(blk)").as("blocks"), min(col("score")).as("score"))
      .select(col("c_custkey"), col("s_suppkey"),
        col("score").cast("long").as("score"), col("blocks"))
  }

  /** d25: the LSH banding S-CURVE — the tuning table every MinHash dedup
    * config decision reads (Leskovec/Rajaraman/Ullman MMDS §3.4): for a
    * 64-hash signature split into b bands of r rows, a pair at jaccard j
    * collides in some band with p = 1 − (1 − j^r)^b. d03 hard-codes one
    * (b, r); this emits the whole curve for every factorization of 64 at
    * per-mille jaccard steps, plus each config's effective threshold (the
    * first grid j where p ≥ 1/2 — the steep point ≈ (1/b)^(1/r)). All
    * powers are UNROLLED multiplication chains in generated SQL that both
    * engines execute verbatim — each step an IEEE-determined multiply, so
    * the curve is bit-exact with no pow()/ulp hazard. Metadata-sized (45
    * rows) by construction at any corpus scale: the curve depends on the
    * config, never the data.
    */
  private[graft] def sCurveSql: String = {
    def chain(base: String, n: Int): String =
      Seq.fill(n)(base).mkString("(", " * ", ")")
    val rows = for {
      (b, r) <- Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16))
      jpm <- 100 to 900 by 100
    } yield {
      val j = s"(CAST($jpm AS DOUBLE) / 1000.0)"
      val miss = s"(1.0 - ${chain(j, r)})"
      s"SELECT $b AS bands, $r AS rows_per_band, CAST($jpm AS BIGINT) AS j_pm, " +
        s"round(1.0 - ${chain(miss, b)}, 9) AS p_collide"
    }
    s"""WITH curve AS (${rows.mkString("\n", "\nUNION ALL\n", "\n")}),
       |thr AS (
       |  SELECT bands, min(j_pm) AS threshold_j_pm
       |  FROM curve WHERE p_collide >= 0.5 GROUP BY bands)
       |SELECT c.bands, c.rows_per_band, c.j_pm, c.p_collide,
       |       t.threshold_j_pm
       |FROM curve c JOIN thr t ON t.bands = c.bands""".stripMargin
  }

  /** The curve rows computed driver-side with the SAME IEEE arithmetic the
    * SQL text unrolls (round 14, verdict item 6): the 45 UNION ALL
    * branches of literal multiply-chains made the Spark wall
    * planning/constant-folding-bound at ANY scale factor (4 jobs,
    * sub-second executor time — the optimizer was evaluating exactly
    * these constants, slowly). Each chain is a left-associated double
    * fold, identical to Catalyst's ConstantFolding evaluation order, and
    * the final round matches Spark's Round(double, 9):
    * BigDecimal(x).setScale(9, HALF_UP).toDouble. The ORACLE keeps the
    * unrolled sCurveSql text verbatim, so the hash gate proves the
    * driver-side fold equals DuckDB's evaluation of the chains —
    * R14RewritesSpec additionally pins it equal to Spark's own
    * evaluation of the old text.
    */
  private[graft] def sCurveRows: Seq[(Int, Int, Long, Double)] =
    for {
      (b, r) <- Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16))
      jpm <- 100 to 900 by 100
    } yield {
      val j = jpm.toDouble / 1000.0
      var jr = j
      for (_ <- 2 to r) jr *= j // chain(j, r), left-associated
      val miss = 1.0 - jr
      var mb = miss
      for (_ <- 2 to b) mb *= miss // chain(miss, b), left-associated
      val p = scala.math.BigDecimal(1.0 - mb)
        .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      (b, r, jpm.toLong, p)
    }

  private val curveSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def withCurveView(s: SparkSession)(tail: String => String): DataFrame = {
    val v = s"d25_curve_mat_${curveSeq.incrementAndGet()}"
    s.createDataFrame(sCurveRows)
      .toDF("bands", "rows_per_band", "j_pm", "p_collide")
      .createOrReplaceTempView(v)
    val out = s.sql(tail(v))
    s.catalog.dropTempView(v)
    out
  }

  def d25_lsh_tuning_curve(s: SparkSession, d: String): DataFrame =
    withCurveView(s) { v =>
      s"""WITH curve AS (SELECT * FROM $v),
         |thr AS (
         |  SELECT bands, min(j_pm) AS threshold_j_pm
         |  FROM curve WHERE p_collide >= 0.5 GROUP BY bands)
         |SELECT c.bands, c.rows_per_band, c.j_pm, c.p_collide,
         |       t.threshold_j_pm
         |FROM curve c JOIN thr t ON t.bands = c.bands""".stripMargin
    }

  /** d36: LSH AUTO-TUNER — s34's close-the-calibration-loop pattern
    * applied to d25's S-curve: given the target similarity threshold
    * (700‰ jaccard), pick the (bands, rows-per-band) whose 50%-collision
    * point sits closest to it (ties break toward more bands — the
    * higher-recall side), and emit the chosen configuration's full
    * catch-probability curve. This is the decision an operator otherwise
    * eyeballs off d25's table, made deterministic and INSIDE the checked
    * query (ORDER BY distance LIMIT 1 — both engines spell it
    * identically, so the pick itself is hash-gated). Pure arithmetic,
    * one shared SQL text for both engines, d25's discipline.
    */
  private[graft] def lshAutoTuneSql: String = {
    // reuse sCurveSql's curve CTE verbatim (it is already margin-stripped)
    val curveWith = sCurveSql.substring(0, sCurveSql.indexOf("thr AS"))
    curveWith + """thr AS (
      |  SELECT bands, rows_per_band, min(j_pm) AS threshold_j_pm
      |  FROM curve WHERE p_collide >= 0.5 GROUP BY 1, 2),
      |pick AS (
      |  SELECT bands, rows_per_band, threshold_j_pm FROM thr
      |  ORDER BY abs(threshold_j_pm - 700), bands DESC LIMIT 1)
      |SELECT c.bands, c.rows_per_band, c.j_pm, c.p_collide,
      |       p.threshold_j_pm
      |FROM curve c JOIN pick p
      |  ON c.bands = p.bands AND c.rows_per_band = p.rows_per_band"""
      .stripMargin
  }

  def d36_lsh_auto_tune(s: SparkSession, d: String): DataFrame =
    withCurveView(s) { v =>
      s"""WITH curve AS (SELECT * FROM $v),
         |thr AS (
         |  SELECT bands, rows_per_band, min(j_pm) AS threshold_j_pm
         |  FROM curve WHERE p_collide >= 0.5 GROUP BY 1, 2),
         |pick AS (
         |  SELECT bands, rows_per_band, threshold_j_pm FROM thr
         |  ORDER BY abs(threshold_j_pm - 700), bands DESC LIMIT 1)
         |SELECT c.bands, c.rows_per_band, c.j_pm, c.p_collide,
         |       p.threshold_j_pm
         |FROM curve c JOIN pick p
         |  ON c.bands = p.bands AND c.rows_per_band = p.rows_per_band"""
        .stripMargin
    }

  /** d26: FUZZY name linkage by Jaro-Winkler — d20's rule-score linkage
    * replayed with the string-similarity kernel production MDM systems
    * actually rank on (Winkler built it for census name matching): nation
    * blocks the candidate pairs (d20's blocking), the native codegen'd
    * [[graft.functions.JaroWinkler]] scores each name pair, scores
    * quantize to integer micro-units, and the best supplier per customer
    * survives (jw desc, s_suppkey tie-break) above a 0.6 floor. The
    * DuckDB oracle scores with ITS OWN `jaro_winkler_similarity` — an
    * independent implementation of the same algorithm — so the hash gate
    * cross-validates the kernel itself, not just the plumbing (the same
    * trick FunctionsSpec uses for sign_bits, upgraded to a whole
    * independent engine). Scale: blocked join only, kernel inside
    * whole-stage codegen, top-1 through the partial heaps.
    */
  def d26_jaro_linkage(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.jaro_winkler
    import graft.plans.TopKPerGroup
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("int").as("c_nat"))
      // single-file scan: the blocked join broadcasts the supplier side,
      // so its output inherits the customer scan's ONE partition and the
      // JW kernel serializes (r13 flight sweep: 1 task x 1.0 s CPU)
      .repartition(Tables.scanPartitions(s))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"),
        col("s_nationkey").cast("int").as("s_nat"))
    val scored = c.join(sup, col("c_nat") === col("s_nat"))
      .withColumn("jw_micro",
        round(jaro_winkler(col("c_name"), col("s_name")) * 1000000)
          .cast("long"))
      .filter(col("jw_micro") >= 600000)
      .select(col("c_custkey"), col("s_suppkey"), col("jw_micro"))
    TopKPerGroup.topK(scored, Seq("c_custkey"),
      Seq(TopKPerGroup.Ord("jw_micro", desc = true),
        TopKPerGroup.Ord("s_suppkey")), 1)
  }

  /** d27: SORTED-NEIGHBORHOOD linkage (Hernández & Stolfo SIGMOD'95) — the
    * third candidate-generation strategy for entity resolution, next to
    * d20's single-key blocking and d21's multi-pass union: merge BOTH
    * sources into one list, sort by a discriminating key, and compare only
    * records within a fixed window w of each other. Where blocking's cost
    * is Σ|block|² (one hot block is quadratic), SNM's candidate count is
    * EXACTLY n·w at any skew — the window is the budget. The sort key
    * leads with the fields the match score demands agreement on
    * (name-suffix, then balance), so true matches land adjacent; nation
    * never enters the key, so cross-nation matches d20 is structurally
    * blind to are found (d21's discovery, via adjacency instead of a
    * second pass).
    *
    * Scale: global positions come from the c17/c28 two-phase distributed
    * prefix scan (range-partition on the full — unique — sort key,
    * per-partition subtotals to the driver, broadcast offsets), NOT one
    * ORDER BY window; the window-w candidate join is an explode of w
    * offsets + one equi-join on position. The DuckDB oracle uses its
    * native one-window row_number over the same total order — a different
    * plan reaching the same positions, so the two-phase scan itself is
    * hash-cross-validated. All-integer scoring (d20's rule weights) →
    * hash-green.
    */
  def d27_snm_linkage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = 6
    def side(df: DataFrame, tag: Int, key: String, name: String, nat: String,
        bal: String): DataFrame =
      df.select(lit(tag).as("side"), col(key).cast("long").as("key"),
        col(nat).cast("long").as("nat"),
        // coalesce(-1): a name with no digits would yield NULL, and NULL
        // sorts FIRST in Spark but LAST in DuckDB (the q85 hazard) —
        // breaking the two-phase global-position parity this operator
        // depends on; with the floor the key is provably non-null
        (coalesce(regexp_extract(col(name), "(\\d+)", 1).cast("long"),
          lit(-1L)) % 50).as("suffix"),
        round(col(bal) * 100).cast("long").as("cents"))
    val recs = side(Tables.customer(s, d), 0, "c_custkey", "c_name",
      "c_nationkey", "c_acctbal")
      .unionByName(side(Tables.supplier(s, d), 1, "s_suppkey", "s_name",
        "s_nationkey", "s_acctbal"))
      .repartitionByRange(32, col("suffix"), col("cents"), col("side"), col("key"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical in both passes
    val subtotals = recs.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val offDf = s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off")
    val ww = Window.partitionBy(col("pid"))
      .orderBy(col("suffix"), col("cents"), col("side"), col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pos = recs.join(broadcast(offDf), "pid")
      .withColumn("position", col("off") + count(lit(1)).over(ww) - 1)
      .drop("pid", "off")
      .localCheckpoint() // both sides of the window join reuse one scan
    def bucket(c: Column): Column = {
      val a = c + lit(10000000L)
      ((a - pmod(a, lit(200000L))) / lit(200000L)).cast("long")
    }
    val a = pos.select(col("side").as("a_side"), col("key").as("a_key"),
      col("nat").as("a_nat"), col("suffix").as("a_suffix"),
      col("cents").as("a_cents"), col("position").as("a_pos"))
      .withColumn("o", explode(sequence(lit(1), lit(w))))
      .withColumn("b_pos", col("a_pos") + col("o"))
    val b = pos.select(col("side").as("b_side"), col("key").as("b_key"),
      col("nat").as("b_nat"), col("suffix").as("b_suffix"),
      col("cents").as("b_cents"), col("position").as("b_pos"))
    a.join(b, "b_pos")
      .filter(col("a_side") =!= col("b_side"))
      .withColumn("c_custkey",
        when(col("a_side") === 0, col("a_key")).otherwise(col("b_key")))
      .withColumn("s_suppkey",
        when(col("a_side") === 0, col("b_key")).otherwise(col("a_key")))
      .withColumn("score",
        when(col("a_suffix") === col("b_suffix"), 22).otherwise(-5) +
          when(bucket(col("a_cents")) === bucket(col("b_cents")), 8)
            .otherwise(-3) +
          when((col("a_cents") >= 0) === (col("b_cents") >= 0), 4).otherwise(-2))
      .filter(col("score") >= 26)
      .withColumn("cross_nation",
        when(col("a_nat") =!= col("b_nat"), 1L).otherwise(0L))
      .select(col("c_custkey"), col("s_suppkey"),
        col("score").cast("long").as("score"),
        col("o").cast("long").as("pos_gap"), col("cross_nation"))
  }

  /** d28: WINNOWING fingerprints (Schleimer, Wilkerson, Aiken SIGMOD'03 —
    * the MOSS algorithm) — the sampled version of d17's exact substring
    * spans: hash every stride-1 char k-gram, slide a window of w hash
    * positions, keep one minimal hash per window. The selection is local
    * and deterministic, yet GUARANTEES any substring match of length ≥
    * w+k−1 chars is caught by at least one shared fingerprint — while
    * storing ~2/(w+1) of the grams d17 would join on. This is the
    * document-fingerprint index a plagiarism/provenance system persists.
    * (k=8, w=4 → guarantee threshold t = 11 chars; min ties break to the
    * LEFTMOST position — any per-window minimum preserves the guarantee.)
    *
    * Per doc everything is one codegen'd HOF pass (hash array → window
    * minima → distinct), zero shuffle; the cross-doc join runs on the
    * (tiny) selected-fingerprint table with a d17-style df cap against
    * viral boilerplate hashes. Integer polynomial hashes (t04's
    * base-31 mod 1e9+7) → hash-green against DuckDB building identical
    * fingerprints through its list lambdas.
    */
  def d28_winnowing(s: SparkSession, d: String): DataFrame =
    winnowPairs(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** Fingerprint-and-pair pipeline over any (doc_id, text) frame — split
    * out so the spec can plant a shared ≥ t-char substring and see the
    * detection guarantee hold.
    */
  private[graft] def winnowPairs(docs: DataFrame, minShared: Long = 2L): DataFrame = {
    import graft.functions.TextFunctions.winnow_fingerprints
    val k = 8; val w = 4
    // the whole per-doc selection is one native codegen'd kernel
    // ([[graft.functions.WinnowFingerprints]]); the HOF spelling it
    // replaced is pinned bit-identical in FunctionsSpec (hofWinnowExpr)
    val fps = docs
      .withColumn("fp", explode(winnow_fingerprints(col("text"), k, w)))
      .select(col("doc_id"), col("fp"))
      .localCheckpoint() // one kernel pass feeds the df agg AND both join sides
    val keep = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 16)).select("fp")
    val fk = fps.join(keep, "fp")
    fk.select(col("doc_id").as("da"), col("fp"))
      .join(fk.select(col("doc_id").as("db"), col("fp")), Seq("fp"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
  }

  /** Soundex as a dialect-shared SQL expression — the simplified
    * ("vowel-separator") American Soundex both engines can evaluate from
    * IDENTICAL text: uppercase, map letters to digit classes via one
    * translate, collapse adjacent equal codes with three chained
    * replace passes (RE2 has no backreferences, so the regex collapse is
    * off the table — three passes cover runs to length 8, far past any
    * real word), drop the first code, strip vowels, pad to 4. Differs
    * from archival Soundex only in treating H/W as separators (the
    * common SQL-dialect simplification); unit-pinned on textbook names
    * where the variants agree (Robert/Rupert → R163, Smith/Smyth →
    * S530).
    */
  private def soundexSql(c: String): String = {
    val codes = "01230120022455012623010202"
    val base = s"translate(upper($c), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '$codes')"
    val collapsed = (1 to 3).foldLeft(base) { (acc, _) =>
      (1 to 6).foldLeft(acc) { (a, dig) => s"replace($a, '$dig$dig', '$dig')" }
    }
    s"concat(substring(upper($c), 1, 1), " +
      s"substring(concat(replace(substring($collapsed, 2), '0', ''), '000'), 1, 3))"
  }

  /** d29: PHONETIC key encoding — the fourth ER blocking strategy
    * (d20 equi-key, d21 multi-pass, d27 sort-window, d29 phonetic):
    * names that SOUND alike land in one block even when spelled apart,
    * the standard census/MDM move for human-entered name fields. The
    * registry entry emits the encoding table over the corpus vocabulary
    * (word → code → code population) — hash-green because the entire
    * encoder is shared SQL text; the pairing step (block + Jaro-Winkler
    * verify through the d26 kernel) is exercised by QueriesSpec on a
    * planted surname corpus where Robert/Rupert and Smith/Smyth collide
    * and the cross-block negative holds. Scale: the encoder is a
    * zero-shuffle scan projection; blocking bounds pairs at Σ|block|²
    * over phonetic classes (the d20 economics with a fuzzier key).
    */
  private def d29Sql(split: String): String =
    s"""WITH w AS (SELECT DISTINCT $split AS word FROM documents),
       |e AS (SELECT word, ${soundexSql("word")} AS sx FROM w)
       |SELECT word, sx,
       |       CAST(count(*) OVER (PARTITION BY sx) AS BIGINT) AS n_in_code
       |FROM e""".stripMargin

  def d29_phonetic_keys(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(d29Sql("explode(split(text, ' '))"))
  }

  /** Phonetic-blocked pairing over any (id, name) frame — block on the
    * shared-text soundex, verify with the native Jaro-Winkler kernel.
    */
  private[graft] def phoneticPairs(names: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.jaro_winkler
    val e = names.withColumn("sx", expr(soundexSql("name")))
    e.select(col("id").as("id_a"), col("name").as("name_a"), col("sx"))
      .join(e.select(col("id").as("id_b"), col("name").as("name_b"), col("sx")),
        Seq("sx"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw_micro",
        round(jaro_winkler(col("name_a"), col("name_b")) * 1000000).cast("long"))
      .select(col("sx"), col("id_a"), col("id_b"), col("name_a"),
        col("name_b"), col("jw_micro"))
  }

  /** d31: BLOCKING-QUALITY audit — the methodology table every record-
    * linkage deployment publishes before trusting a blocker (Christen's
    * two numbers): REDUCTION RATIO (what fraction of the full cross
    * product the blocker avoided scoring) and PAIR COMPLETENESS (what
    * fraction of true matches its candidates retain), measured here for
    * the repo's own three strategies — d20 nation equi-blocking, d21
    * multi-pass union, d27 sorted-neighborhood w=6 — against the
    * exhaustively-scored truth. The truth IS the full customer×supplier
    * cross — affordable precisely because linkage runs on DIMENSION
    * tables (15M pairs at the bench SF; a fact-scale audit samples one
    * block stratum instead, and the scaladoc is the contract saying so).
    * The SNM order here rides one row_number window for the same reason.
    * All integer counts and per-mille ratios → hash-green with identical
    * SQL text on both engines.
    */
  private def d31Sql(div: String): String =
    s"""WITH c AS (
       |  SELECT c_custkey AS ck, CAST(c_nationkey AS BIGINT) AS cnat,
       |         CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) % 50 AS csuf,
       |         CAST(round(c_acctbal * 100) AS BIGINT) AS ccents
       |  FROM customer),
       |s AS (
       |  SELECT s_suppkey AS sk, CAST(s_nationkey AS BIGINT) AS snat,
       |         CAST(regexp_extract(s_name, '([0-9]+)', 1) AS BIGINT) % 50 AS ssuf,
       |         CAST(round(s_acctbal * 100) AS BIGINT) AS scents
       |  FROM supplier),
       |full_scored AS (
       |  SELECT ck, sk,
       |         (CASE WHEN csuf = ssuf THEN 22 ELSE -5 END
       |        + CASE WHEN (ccents + 10000000) $div 200000
       |               = (scents + 10000000) $div 200000 THEN 8 ELSE -3 END
       |        + CASE WHEN (ccents >= 0) = (scents >= 0) THEN 4 ELSE -2 END)
       |           AS score,
       |         cnat, snat, csuf, ssuf, ccents, scents
       |  FROM c CROSS JOIN s),
       |truth AS (SELECT ck, sk FROM full_scored WHERE score >= 26),
       |cand_nation AS (
       |  SELECT ck, sk FROM full_scored WHERE cnat = snat),
       |cand_multi AS (
       |  SELECT DISTINCT ck, sk FROM full_scored
       |  WHERE cnat = snat
       |     OR ((ccents + 10000000) $div 200000
       |         = (scents + 10000000) $div 200000 AND csuf = ssuf)),
       |recs AS (
       |  SELECT 0 AS side, ck AS key, csuf AS suffix, ccents AS cents FROM c
       |  UNION ALL
       |  SELECT 1, sk, ssuf, scents FROM s),
       |pos AS (
       |  SELECT side, key,
       |         row_number() OVER (ORDER BY suffix, cents, side, key) AS p
       |  FROM recs),
       |offs AS (SELECT 1 AS i UNION ALL SELECT 2 UNION ALL SELECT 3
       |         UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6),
       |cand_snm AS (
       |  SELECT CASE WHEN a.side = 0 THEN a.key ELSE b.key END AS ck,
       |         CASE WHEN a.side = 0 THEN b.key ELSE a.key END AS sk
       |  FROM pos a CROSS JOIN offs o JOIN pos b
       |    ON b.p = a.p + o.i AND a.side <> b.side),
       |sizes AS (
       |  SELECT 'full' AS strategy,
       |         CAST((SELECT count(*) FROM full_scored) AS BIGINT) AS n_candidates,
       |         CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_matches_found
       |  UNION ALL
       |  SELECT 'nation',
       |         CAST((SELECT count(*) FROM cand_nation) AS BIGINT),
       |         CAST((SELECT count(*) FROM cand_nation n JOIN truth t
       |               ON t.ck = n.ck AND t.sk = n.sk) AS BIGINT)
       |  UNION ALL
       |  SELECT 'multipass',
       |         CAST((SELECT count(*) FROM cand_multi) AS BIGINT),
       |         CAST((SELECT count(*) FROM cand_multi n JOIN truth t
       |               ON t.ck = n.ck AND t.sk = n.sk) AS BIGINT)
       |  UNION ALL
       |  SELECT 'snm_w6',
       |         CAST((SELECT count(*) FROM cand_snm) AS BIGINT),
       |         CAST((SELECT count(*) FROM cand_snm n JOIN truth t
       |               ON t.ck = n.ck AND t.sk = n.sk) AS BIGINT))
       |SELECT strategy, n_candidates, n_matches_found,
       |       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |       1000 - (n_candidates * 1000)
       |         $div (SELECT count(*) FROM full_scored) AS reduction_pm,
       |       CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1000
       |            ELSE (n_matches_found * 1000)
       |              $div (SELECT count(*) FROM truth) END AS completeness_pm
       |FROM sizes""".stripMargin

  def d31_blocking_audit(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    s.sql(d31Sql("div"))
  }

  /** d32: ALL-PAIRS weighted-cosine similarity join (Bayardo, Ma &
    * Srikant WWW'07) — the WEIGHTED completion of the candidate-
    * generation triptych (d03 MinHash sketches sets, d24 PPJoin
    * prefix-filters sets, d32 prefix-filters tf-idf VECTORS): documents
    * as L2-normalized idf-weighted BINARY shingle vectors (tf is 0/1 —
    * the standard for shingle features, and what makes the two dialects'
    * gram generators agree), pairs with cosine ≥ 0.9 emitted
    * exactly. Everything after the one sqrt normalization is integer:
    * weights quantize to micro-units (the s07 trick — the operator's
    * semantics are DEFINED on the quantized vectors, so the method is
    * exact, not approximate), and the Bayardo bound runs in int64: terms
    * order globally by descending max quantized weight, each doc indexes
    * only the rows whose remaining-suffix bound Σ q·maxq still reaches
    * τ, and a pair missing both prefixes provably has dot < τ (take the
    * earliest shared term in either doc's order: the dot is bounded by
    * that term's suffix bound). The tf-idf weighting IS the hot-term
    * economics: a stopword's tiny idf puts it last in every order, so it
    * never enters a prefix and never explodes the candidate join —
    * where d05/d24 needed an explicit df cap, AllPairs gets the same
    * protection from the weights themselves, WITHOUT losing
    * completeness. DedupScaleSpec pins output == driver-side brute force
    * over every pair. Verification is one term-equi join + integer dot
    * per candidate; all counts/dots exact → hash-green.
    *
    * Features are word TRIGRAM shingles, not unigrams — the choice that
    * makes AllPairs work at all: over the fixture's 31-word unigram
    * vocabulary every doc is a near-identical dense vector, the prefix
    * filter prunes nothing, and candidates go quadratic (measured: the
    * first cut ground >20 CPU-minutes at the 10x probe). The shingle
    * vocabulary grows with the corpus, vectors are sparse and
    * near-orthogonal except for genuine near-duplicates, and the filter
    * bites — the same reason production similarity joins run on
    * shingles/q-grams.
    */
  /** `hashTerm`: the dialect's spelling of hash60 over the column `term`
    * (round 10: term identity through every CTE is the 60-bit portable
    * poly hash — same int64 key both engines derive; see [[allPairsOver]]).
    */
  private def d32Sql(hashTerm: String): String = {
    val tau = 900000000000L // cos >= 0.9 over micro-unit vectors
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, $hashTerm AS th, CAST(1 AS BIGINT) AS tf
       |  FROM ($$GRAMS$$) t),
       |stats AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tok),
       |dfreq AS (SELECT th, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1),
       |wgt AS (
       |  SELECT t.doc_id, t.th,
       |         t.tf * CAST(round(ln(CAST(s.n_docs AS DOUBLE)
       |                              / CAST(d.df AS DOUBLE)) * 1000) AS BIGINT) AS w
       |  FROM tok t JOIN dfreq d ON d.th = t.th CROSS JOIN stats s),
       |wnz AS (SELECT * FROM wgt WHERE w > 0),
       |nrm AS (SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nn
       |        FROM wnz GROUP BY 1),
       |qv AS (
       |  SELECT w.doc_id, w.th,
       |         CAST(round(1000000.0 * CAST(w.w AS DOUBLE) / n.nn) AS BIGINT) AS q
       |  FROM wnz w JOIN nrm n ON n.doc_id = w.doc_id),
       |mx AS (SELECT th, CAST(max(q) AS BIGINT) AS mq FROM qv GROUP BY 1),
       |ordq AS (
       |  SELECT qv.doc_id, qv.th, qv.q,
       |         CAST(sum(qv.q * mx.mq) OVER (PARTITION BY qv.doc_id
       |              ORDER BY mx.mq DESC, qv.th
       |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |           AS BIGINT) AS rem
       |  FROM qv JOIN mx ON mx.th = qv.th),
       |pref AS (SELECT doc_id, th FROM ordq WHERE rem >= $tau),
       |cand AS (
       |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS da,
       |         greatest(a.doc_id, b.doc_id) AS db
       |  FROM qv a JOIN pref b ON b.th = a.th AND a.doc_id <> b.doc_id),
       |dots AS (
       |  SELECT c.da, c.db, CAST(sum(x.q * y.q) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN qv x ON x.doc_id = c.da
       |  JOIN qv y ON y.doc_id = c.db AND y.th = x.th
       |  GROUP BY 1, 2)
       |SELECT da, db, dot FROM dots WHERE dot >= $tau""".stripMargin
  }

  /** Word-trigram shingle generation per dialect (the c09 oracle pairing:
    * Spark uses the native word_shingles kernel, DuckDB slices token
    * lists — different text, identical strings).
    */
  private val sparkGrams = // SQL registration fixes n = 3
    "SELECT doc_id, explode(word_shingles(split(text, ' '))) AS term " +
      "FROM documents"
  private val duckGrams =
    """SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS term
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) z,
      |     unnest(generate_series(1, len(toks) - 2)) AS u(i)
      |WHERE len(toks) >= 3""".stripMargin

  def d32_allpairs_cosine(s: SparkSession, d: String): DataFrame =
    allPairsOver(s, Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** The Spark execution of [[d32Sql]]'s semantics as a checkpointed
    * DataFrame pipeline: Spark inlines CTEs, so the literal SQL text
    * re-evaluates the whole shingle+normalize prefix once per reference
    * (~5x — measured 13 s at sf0.1 and a 25 GB shuffle spill at the 10x
    * probe); here the quantized-vector frame materializes ONCE and every
    * downstream stage (max-weights, prefix, candidates, verification)
    * reuses it. Every expression mirrors the oracle's arithmetic exactly
    * (the one driver-side value is the scalar doc count), so the hash
    * gate still proves value equality.
    */
  private[graft] def allPairsOver(s: SparkSession, docsIn: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{hash60, word_shingles}
    val tau = 900000000000L
    // Round 10 (verdict item 2): the shingle STRING never leaves the
    // generating stage — term identity is its 60-bit portable poly hash
    // (the d03/d04/d18 keying), so every downstream shuffle (df agg,
    // weight join, prefix window, candidate join, both verify sides)
    // carries an 8-byte int64 key instead of a 15-120-byte string. The
    // DuckDB twin computes the identical hash, so the (astronomically
    // unlikely) collision is mirrored and the gate stays exact; a
    // collision can only ever ADD a candidate the exact dot re-scores.
    // grams is a def, not a checkpoint (round 10, the d17 lesson): the
    // distinct gram table is |corpus|-sized, and caching it was ~10 GB of
    // object-store spill at the 100× probe — recomputing the scan→explode
    // →hash→distinct chain for its two consumers (df aggregate, weight
    // join) costs one extra pipelined shuffle and zero storage. n_docs
    // comes straight off the raw scan: a doc yields ≥1 trigram iff it has
    // ≥3 tokens, so the count never needs the gram table at all.
    def grams = docsIn
      .select(col("doc_id"),
        explode(word_shingles(split(col("text"), " "), 3)).as("term"))
      .select(col("doc_id"), hash60(col("term")).as("th"))
      .distinct()
    val nDocs = docsIn.filter(size(split(col("text"), " ")) >= 3)
      .select(countDistinct(col("doc_id"))).collect()(0).getLong(0)
    val dfreq = grams.groupBy(col("th")).agg(count(lit(1)).as("df"))
    val wnz = grams.join(dfreq, "th")
      .withColumn("w", expr(
        s"CAST(round(ln(CAST($nDocs AS DOUBLE) / CAST(df AS DOUBLE)) * 1000) AS BIGINT)"))
      .filter(col("w") > 0)
    val nrm = wnz.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w")).cast("double")).as("nn"))
    val qv = wnz.join(nrm, "doc_id")
      .withColumn("q", expr("CAST(round(1000000.0 * CAST(w AS DOUBLE) / nn) AS BIGINT)"))
      .select(col("doc_id"), col("th"), col("q"))
      .localCheckpoint() // ONE evaluation serves prefix, probe, and both verify sides
    val mx = qv.groupBy(col("th")).agg(max(col("q")).as("mq"))
    // the global term order's tie-break is the hash, not the string — any
    // CONSISTENT total order preserves the Bayardo completeness bound, and
    // the exact verify makes the final output order-independent anyway
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("mq").desc, col("th"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val pref = qv.join(mx, "th")
      .withColumn("rem", sum(col("q") * col("mq")).over(w))
      .filter(col("rem") >= tau)
      .select(col("doc_id"), col("th"))
    val cand = qv.select(col("doc_id").as("id_a"), col("th"))
      .join(pref.select(col("doc_id").as("id_b"), col("th")), "th")
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("da"),
        greatest(col("id_a"), col("id_b")).as("db"))
      .distinct()
    // VERIFY as a shared-term self-join + pair semi-join (round 10): the
    // previous shape joined each candidate pair to doc A's FULL vector
    // then doc B's — |cand|·|terms per doc| intermediate rows, which the
    // 100× probe measured in the BILLIONS (every junk one-shared-term
    // candidate pulled two whole vectors; ~60 GB of in-flight shuffle
    // killed the leg). This shape emits exactly one row per (pair,
    // SHARED term) — Σ C(df,2) over the vocabulary, 167M rows on the
    // 100× corpus — then keeps candidate pairs via the semi-join and
    // aggregates exact dots. Same values (a dot is the sum over shared
    // terms either way); the completeness proof is untouched (cand is
    // unchanged). Caveat the scaladoc carries: Σ C(df,2) is the d05/d24
    // trade — a df-hot boilerplate corpus pays it in this join rather
    // than in candidate explosion, and composes with d05's df-cap
    // economics if that ever dominates.
    qv.select(col("doc_id").as("da"), col("th"), col("q").as("qa"))
      .join(qv.select(col("doc_id").as("db"), col("th"), col("q").as("qb")),
        Seq("th"))
      .filter(col("da") < col("db"))
      .join(cand, Seq("da", "db"), "left_semi")
      .groupBy(col("da"), col("db"))
      .agg(sum(col("qa") * col("qb")).as("dot"))
      .filter(col("dot") >= tau)
  }

  /** The join over whatever `documents` view is registered — kept for
    * completeness checks that want the literal shared-SQL formulation.
    */
  private[graft] def allPairsFromViews(s: SparkSession): DataFrame = {
    graft.functions.TextFunctions.register(s)
    s.sql(d32Sql("hash60(term)").replace("$GRAMS$", sparkGrams))
  }

  /** d35: cluster CHAINING audit — the transitivity artifact every
    * threshold-clustered dedup pipeline owes a report on: connected
    * components glue A~B~C into one cluster even when A and C share
    * nothing (pair edges are thresholded, membership is transitive), so
    * a cluster's keep-one-drop-rest apply step can delete documents that
    * resemble the keeper not at all. Per multi-doc cluster: size, the
    * direct pair edges present, pair DENSITY per-mille (1000 = clique,
    * every pair directly similar; low = a chain), and the weakest direct
    * edge (glue near the threshold = borderline merges). Reads d10's
    * clusters and d05's pairs — one keyed join from pairs to cluster
    * labels, metadata-sized output.
    */
  def d35_chaining_audit(s: SparkSession, d: String): DataFrame = {
    // the d05 pair kernel dominates BOTH inputs — run it ONCE, checkpoint,
    // and derive clusters and audit pairs from the same materialized
    // blocks (previously d10_dedup_clusters recomputed the kernel
    // internally on top of the audit's own pass: 2x the dominant cost)
    val pairs = d05_ngram_jaccard(s, d).localCheckpoint()
    chainingAuditFrom(
      clustersFromPairs(pairs.select(col("doc_a"), col("doc_b"))), pairs)
  }

  /** The audit over any (doc_id, cluster_rep) + (doc_a, doc_b, jaccard)
    * pair of frames — split out so the spec can plant a genuine A~B~C
    * chain (the fixture's only multi-doc cluster is a clique of two).
    */
  private[graft] def chainingAuditFrom(clusters: DataFrame,
      pairs: DataFrame): DataFrame = {
    val cl = clusters.localCheckpoint()
    val sz = cl.groupBy(col("cluster_rep")).agg(count(lit(1)).as("size"))
      .filter(col("size") >= 2)
    val pj = pairs
      .join(cl.select(col("doc_id").as("doc_a"), col("cluster_rep")), "doc_a")
      .groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("n_pairs"), min(col("jaccard")).as("min_jaccard"))
    sz.join(pj, "cluster_rep")
      .withColumn("density_pm",
        expr("n_pairs * 2000 DIV (size * (size - 1))"))
  }

  val queries: Map[String, Q] = Map(
    "d36_lsh_auto_tune" -> (d36_lsh_auto_tune _),
    "d35_chaining_audit" -> (d35_chaining_audit _),
    "d34_dedup_roi" -> (d34_dedup_roi _),
    "d33_soft_dedup" -> (d33_soft_dedup _),
    "d32_allpairs_cosine" -> (d32_allpairs_cosine _),
    "d31_blocking_audit" -> (d31_blocking_audit _),
    "d27_snm_linkage" -> (d27_snm_linkage _),
    "d28_winnowing" -> (d28_winnowing _),
    "d29_phonetic_keys" -> (d29_phonetic_keys _),
    "d26_jaro_linkage" -> (d26_jaro_linkage _),
    "d25_lsh_tuning_curve" -> (d25_lsh_tuning_curve _),
    "d21_multiblock_linkage" -> (d21_multiblock_linkage _),
    "d20_record_linkage" -> (d20_record_linkage _),
    "d19_line_dedup" -> (d19_line_dedup _),
    "d17_substring_spans" -> (d17_substring_spans _),
    "d18_persisted_minhash" -> (d18_persisted_minhash _),
    "d16_editdist_join" -> (d16_editdist_join _),
    "d15_semdedup" -> (d15_semdedup _),
    "d12_passage_stats" -> (d12_passage_stats _),
    "d14_passage_dedup_apply" -> (d14_passage_dedup_apply _),
    "d01_dedup_exact" -> (d01_dedup_exact _),
    "d09_dedup_apply_exact" -> (d09_dedup_apply_exact _),
    "d10_dedup_clusters" -> (d10_dedup_clusters _),
    "d13_dedup_clusters_star" -> (d13_dedup_clusters_star _),
    "d11_incremental_dedup" -> (d11_incremental_dedup _),
    "d07_embed_neardup_lsh" -> (d07_embed_neardup_lsh _),
    "d08_dedup_apply" -> (d08_dedup_apply _),
    "d02_dedup_content_hash" -> (d02_dedup_content_hash _),
    "d39_norm_recall" -> (d39_norm_recall _),
    "d38_mutation_recall" -> (d38_mutation_recall _),
    "d03_dedup_minhash_lsh" -> (d03_dedup_minhash_lsh _),
    "d04_dedup_simhash" -> (d04_dedup_simhash _),
    "d05_ngram_jaccard" -> (d05_ngram_jaccard _),
    "d22_containment" -> (d22_containment _),
    "d23_canonical_pick" -> (d23_canonical_pick _),
    "d24_ppjoin" -> (d24_ppjoin _),
    "d06_embed_neardup" -> (d06_embed_neardup _),
  )

  /** Shared oracle CTE prefixes. Every oracle string must be self-contained
    * SQL for the driver, so the common trigram-index chain is interpolated
    * (with [[DfCap]]) rather than copy-pasted — d05/d09/d10 here and c04 in
    * CurationQueries can then never drift from the Spark-side parameters.
    */
  private[operators] val ShingleIndexCte: String =
    s"""t AS (
       |  SELECT doc_id, lang, source,
       |         list_distinct(list_transform(range(1, len(toks)-1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
       |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
       |        FROM documents)
       |  WHERE len(toks) >= 3),
       |e AS (
       |  SELECT doc_id, lang, source, len(shingles) AS n,
       |         unnest(shingles) AS shingle
       |  FROM t),
       |hot AS (
       |  SELECT lang, source, shingle FROM e
       |  GROUP BY 1, 2, 3 HAVING count(*) > $DfCap),
       |f AS (
       |  SELECT e.* FROM e ANTI JOIN hot
       |    USING (lang, source, shingle))""".stripMargin

  /** Index + per-pair intersection counts (lang-less pair key). */
  private[operators] val PairScoresCte: String =
    s"""$ShingleIndexCte,
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.n AS na, b.n AS nb, count(*) AS inter
       |  FROM f a JOIN f b
       |    ON a.shingle = b.shingle AND a.lang = b.lang
       |   AND a.source = b.source AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** Pairs -> connected components (recursive; must follow WITH RECURSIVE). */
  private[operators] val ClustersCte: String =
    s"""$PairScoresCte,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM p
       |  WHERE inter / (na + nb - inter) >= 0.1),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach AS (
       |  SELECT doc_id, doc_id AS lbl FROM nodes
       |  UNION
       |  SELECT e2.dst AS doc_id, r.lbl
       |  FROM reach r JOIN edges e2 ON e2.src = r.doc_id),
       |cc AS (
       |  SELECT doc_id, min(lbl) AS cluster_rep
       |  FROM reach GROUP BY doc_id)""".stripMargin

  /** DuckDB rebuild of the MinHash signature list for d03's oracle: the
    * permutation coefficients are deterministic JVM constants
    * ([[graft.functions.MinHashSignature.coeffA]]), embedded verbatim —
    * the s02/duckBucket recipe for the minhash family. `hh` must be a
    * list of poly31 base hashes.
    */
  private def duckMinhashSig(hh: String): String = {
    val as = graft.functions.MinHashSignature.coeffA(16)
    val bs = graft.functions.MinHashSignature.coeffB(16)
    (0 until 16).map(j =>
      s"list_min(list_transform($hh, h -> (${as(j)} * h + ${bs(j)}) % 2147483647))")
      .mkString("[", ",\n          ", "]")
  }

  /** poly31 over a string expression — the DuckDB twin of
    * [[graft.functions.TokenHash.poly31]] (d28's proven list_reduce
    * phrasing).
    */
  private def duckPoly(base: Int, mod: Long, t: String): String =
    s"""list_reduce(list_prepend(0, list_transform(range(1, length($t) + 1),
       |             ci -> CAST(ascii(substring($t, ci, 1)) AS BIGINT))),
       |           (acc, ch) -> (acc * $base + ch) % $mod)""".stripMargin

  /** The shingle → signature → band CTE chain shared by d03's oracle, the
    * apply step (d08) and the persisted-index split (d18).
    */
  private def minhashChain(tokSrc: String): String =
    s"""f AS (SELECT doc_id, toks FROM $tokSrc WHERE len(toks) >= 3),
       |sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(toks) - 1), i ->
       |           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
       |  FROM f),
       |hs AS (
       |  SELECT doc_id, shingles,
       |         list_transform(shingles, sg -> ${duckPoly(31, 1000000007L, "sg")})
       |           AS hh
       |  FROM sh),
       |sigs AS (
       |  SELECT doc_id, shingles, ${duckMinhashSig("hh")} AS sig FROM hs),
       |bands AS (
       |  SELECT doc_id, b AS band_no,
       |         sig[4*b+1] * 2147483647 + sig[4*b+2] AS b_lo,
       |         sig[4*b+3] * 2147483647 + sig[4*b+4] AS b_hi
       |  FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS b) bb)""".stripMargin

  /** The original chain instantiated on raw `documents` (d03/d08/d18). */
  private lazy val minhashCtes: String =
    s"""docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |${minhashChain("docs")}""".stripMargin

  /** ...and the verified-pair tail (band collisions → exact jaccard). */
  private lazy val minhashPairCtes: String =
    s"""$minhashCtes,
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_no = y.band_no AND x.b_lo = y.b_lo AND x.b_hi = y.b_hi
       |   AND x.doc_id < y.doc_id),
       |j AS (
       |  SELECT doc_a, doc_b,
       |         CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       |           / (len(a.shingles) + len(b.shingles)
       |              - len(list_intersect(a.shingles, b.shingles))) AS jaccard
       |  FROM cands JOIN sigs a ON a.doc_id = doc_a
       |             JOIN sigs b ON b.doc_id = doc_b)""".stripMargin

  private lazy val d03Oracle: String =
    s"""WITH $minhashPairCtes
       |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.05""".stripMargin

  private lazy val d08Oracle: String =
    s"""WITH $minhashPairCtes,
       |drops AS (SELECT DISTINCT doc_b AS drop_id FROM j WHERE jaccard >= 0.8),
       |kept AS (
       |  SELECT d.lang, d.n_chars FROM documents d
       |  LEFT JOIN drops ON d.doc_id = drops.drop_id
       |  WHERE drops.drop_id IS NULL)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       |       CAST(sum(n_chars) AS BIGINT) AS kept_chars
       |FROM kept GROUP BY lang""".stripMargin

  private lazy val d18Oracle: String =
    s"""WITH $minhashCtes,
       |bx AS (SELECT * FROM bands WHERE doc_id % 17 = 0),
       |by AS (SELECT * FROM bands WHERE doc_id % 17 <> 0),
       |cands AS (
       |  SELECT DISTINCT bx.doc_id AS new_doc, by.doc_id AS corpus_doc
       |  FROM bx JOIN by
       |    ON bx.band_no = by.band_no AND bx.b_lo = by.b_lo
       |   AND bx.b_hi = by.b_hi),
       |j AS (
       |  SELECT new_doc, corpus_doc,
       |         CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       |           / (len(a.shingles) + len(b.shingles)
       |              - len(list_intersect(a.shingles, b.shingles))) AS jaccard
       |  FROM cands JOIN sigs a ON a.doc_id = new_doc
       |             JOIN sigs b ON b.doc_id = corpus_doc)
       |SELECT new_doc, corpus_doc, jaccard FROM j WHERE jaccard >= 0.05""".stripMargin

  private lazy val d07Oracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sig AS (SELECT vec_id, emb, ${SimilarityQueries.duckBucket("emb")} AS bucket
       |        FROM e),
       |p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${SimilarityQueries.duckCosine("a.emb", "b.emb")} AS sim
       |  FROM sig a JOIN sig b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, sim FROM p WHERE sim > 0.3""".stripMargin

  private lazy val d04Oracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |f AS (SELECT doc_id, toks FROM docs WHERE len(toks) >= 3),
       |th AS (
       |  SELECT doc_id,
       |         list_transform(toks, t ->
       |           ${duckPoly(31, 1000000007L, "t")}
       |           | (${duckPoly(131, 1000000009L, "t")} << 30)) AS hh
       |  FROM f),
       |sh AS (
       |  SELECT doc_id,
       |         CAST(list_sum(list_transform(range(0, 60), b ->
       |           CASE WHEN 2 * len(list_filter(hh, h -> ((h >> b) & 1) = 1))
       |                     - len(hh) >= 0
       |                THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END))
       |              AS BIGINT) AS sh64
       |  FROM th),
       |chunks AS (
       |  SELECT doc_id, sh64, c AS chunk_no,
       |         (sh64 >> (16 * c)) & 65535 AS chunk_val
       |  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS c) cc),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, x.sh64 AS sa,
       |                  y.doc_id AS doc_b, y.sh64 AS sb
       |  FROM chunks x JOIN chunks y
       |    ON x.chunk_no = y.chunk_no AND x.chunk_val = y.chunk_val
       |   AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cands WHERE bit_count(xor(sa, sb)) <= 8""".stripMargin

  /** d33's oracle CTEs through the per-source `agg` — shared with c41's
    * mixture oracle so the composed pipeline re-runs the identical stage.
    */
  private[operators] val d33OracleCtes: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         string_split(lower(text), ' ') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
      |  FROM (SELECT doc_id, toks,
      |               unnest(generate_series(1, len(toks) - 12)) AS i
      |        FROM t WHERE len(toks) >= 13) u),
      |dfreq AS (SELECT ng, count(*) AS n_docs FROM g GROUP BY ng),
      |common AS (
      |  SELECT g.doc_id,
      |         CAST(sum(dfreq.n_docs) AS BIGINT) * 1000 // count(*)
      |           AS commonness_pm
      |  FROM g JOIN dfreq USING (ng) GROUP BY g.doc_id),
      |w AS (
      |  SELECT t.source, t.n_tokens,
      |         1000000 // coalesce(common.commonness_pm, 1000) AS w_pm
      |  FROM t LEFT JOIN common USING (doc_id)),
      |agg AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
      |         CAST(sum(n_tokens * w_pm // 1000) AS BIGINT) AS eff_tokens
      |  FROM w GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "d33_soft_dedup" -> (d33OracleCtes +
      """
        |SELECT source, n_docs, raw_tokens, eff_tokens,
        |       eff_tokens * 1000 // raw_tokens AS retention_pm
        |FROM agg""".stripMargin),
    "d39_norm_recall" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |sl AS (SELECT doc_id, text FROM base WHERE doc_id % 9 = 4),
        |plants AS (
        |  SELECT doc_id + 10000000 AS doc_id,
        |         replace(text, ' ', '  ') AS text FROM sl
        |  UNION ALL SELECT doc_id + 20000000, text || ' !!' FROM sl
        |  UNION ALL SELECT doc_id + 30000000, upper(text) FROM sl),
        |corpus AS (
        |  SELECT doc_id, md5(text) AS raw_h,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 .,]', ' ', 'g'), ' {2,}', ' ', 'g'))) AS norm_h
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM plants) u),
        |kk AS (SELECT unnest([1, 2, 3]) AS k),
        |pairs AS (
        |  SELECT kk.k,
        |         CASE WHEN a.raw_h = b.raw_h THEN 1 ELSE 0 END AS raw_same,
        |         CASE WHEN a.norm_h = b.norm_h THEN 1 ELSE 0 END AS norm_same
        |  FROM corpus a CROSS JOIN kk
        |  JOIN corpus b ON b.doc_id = a.doc_id + kk.k * 10000000
        |  WHERE a.doc_id < 10000000)
        |SELECT CASE k WHEN 1 THEN 'double_space' WHEN 2 THEN 'trailing_punct'
        |            ELSE 'uppercased' END AS variant,
        |       count(*) AS n_pairs,
        |       CAST(sum(raw_same) AS BIGINT) AS caught_raw,
        |       CAST(sum(norm_same) AS BIGINT) AS caught_norm
        |FROM pairs GROUP BY k""".stripMargin,
    "d38_mutation_recall" ->
      s"""WITH raw AS (SELECT doc_id, text FROM documents),
         |sl AS (SELECT doc_id, string_split(text, ' ') AS toks FROM raw
         |       WHERE doc_id % 5 = 0),
         |mut AS (
         |  SELECT doc_id + 10000000 AS doc_id,
         |         array_to_string(toks, ' ') AS text FROM sl
         |  UNION ALL
         |  SELECT doc_id + 20000000,
         |         array_to_string(list_transform(
         |           list_filter(range(1, len(toks) + 1), i -> i % 7 != 0),
         |           i -> toks[i]), ' ') FROM sl
         |  UNION ALL
         |  SELECT doc_id + 30000000, array_to_string(list_reverse(toks), ' ')
         |  FROM sl
         |  UNION ALL
         |  SELECT doc_id + 40000000,
         |         array_to_string(toks[1:greatest(3, len(toks) * 3 // 5)], ' ')
         |  FROM sl),
         |corpus AS (SELECT doc_id, text FROM raw
         |           UNION ALL SELECT doc_id, text FROM mut),
         |docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
         |${minhashChain("docs")},
         |cands AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y
         |    ON x.band_no = y.band_no AND x.b_lo = y.b_lo AND x.b_hi = y.b_hi
         |   AND y.doc_id > x.doc_id),
         |kk AS (SELECT unnest([1, 2, 3, 4]) AS k),
         |pairs AS (
         |  SELECT kk.k, sa.doc_id AS a, sb.doc_id AS b,
         |         len(list_intersect(sa.shingles, sb.shingles)) AS inter,
         |         len(sa.shingles) + len(sb.shingles) AS tot
         |  FROM sh sa CROSS JOIN kk
         |  JOIN sh sb ON sb.doc_id = sa.doc_id + kk.k * 10000000
         |  WHERE sa.doc_id < 10000000),
         |pj AS (SELECT k, a, b,
         |              1000 * inter // (tot - inter) AS j_milli FROM pairs)
         |SELECT CASE k WHEN 1 THEN 'identical' WHEN 2 THEN 'drop7'
         |            WHEN 3 THEN 'reverse' ELSE 'prefix60' END AS mutation,
         |       count(*) AS n_pairs,
         |       CAST(sum(CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_band_caught,
         |       CAST(sum(CASE WHEN j_milli >= 500 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_neardup_500,
         |       CAST(sum(j_milli) AS BIGINT) AS sum_jaccard_milli
         |FROM pj p LEFT JOIN cands c ON c.a = p.a AND c.b = p.b
         |GROUP BY k""".stripMargin,
    "d03_dedup_minhash_lsh" -> d03Oracle,
    "d04_dedup_simhash" -> d04Oracle,
    "d07_embed_neardup_lsh" -> d07Oracle,
    "d08_dedup_apply" -> d08Oracle,
    "d18_persisted_minhash" -> d18Oracle,
    // the bitwise-OR must not start a line: d32Sql applies stripMargin to
    // the assembled template, which would eat a leading `|` as margin
    "d32_allpairs_cosine" -> d32Sql(
      s"(${duckPoly(31, 1000000007L, "term")} | " +
        s"(${duckPoly(131, 1000000009L, "term")} << 30))")
      .replace("$GRAMS$", duckGrams),
    "d31_blocking_audit" -> d31Sql("//"),
    "d29_phonetic_keys" -> d29Sql("unnest(string_split(text, ' '))"),
    "d27_snm_linkage" ->
      """WITH recs AS (
        |  SELECT 0 AS side, c_custkey AS key, CAST(c_nationkey AS BIGINT) AS nat,
        |         coalesce(TRY_CAST(regexp_extract(c_name, '(\d+)', 1) AS BIGINT), -1)
        |           % 50 AS suffix,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer
        |  UNION ALL
        |  SELECT 1, s_suppkey, CAST(s_nationkey AS BIGINT),
        |         coalesce(TRY_CAST(regexp_extract(s_name, '(\d+)', 1) AS BIGINT), -1)
        |           % 50,
        |         CAST(round(s_acctbal * 100) AS BIGINT)
        |  FROM supplier),
        |p AS (
        |  SELECT *, row_number() OVER (ORDER BY suffix, cents, side, key) - 1
        |           AS position
        |  FROM recs),
        |pairs AS (
        |  SELECT a.side, a.key, a.nat, a.suffix, a.cents,
        |         b.side AS b_side, b.key AS b_key, b.nat AS b_nat,
        |         b.suffix AS b_suffix, b.cents AS b_cents,
        |         b.position - a.position AS o
        |  FROM p a JOIN p b
        |    ON b.position BETWEEN a.position + 1 AND a.position + 6
        |  WHERE a.side <> b.side),
        |scored AS (
        |  SELECT CASE WHEN side = 0 THEN key ELSE b_key END AS c_custkey,
        |         CASE WHEN side = 0 THEN b_key ELSE key END AS s_suppkey,
        |         (CASE WHEN suffix = b_suffix THEN 22 ELSE -5 END)
        |       + (CASE WHEN (cents + 10000000) // 200000
        |                  = (b_cents + 10000000) // 200000 THEN 8 ELSE -3 END)
        |       + (CASE WHEN (cents >= 0) = (b_cents >= 0) THEN 4 ELSE -2 END)
        |         AS score,
        |         o,
        |         CASE WHEN nat <> b_nat THEN 1 ELSE 0 END AS cross_nation
        |  FROM pairs)
        |SELECT c_custkey, s_suppkey, CAST(score AS BIGINT) AS score,
        |       CAST(o AS BIGINT) AS pos_gap,
        |       CAST(cross_nation AS BIGINT) AS cross_nation
        |FROM scored WHERE score >= 26""".stripMargin,
    "d28_winnowing" ->
      """WITH c AS (
        |  SELECT doc_id, length(text) - 7 AS g, text
        |  FROM documents WHERE length(text) - 7 >= 4),
        |codes AS (
        |  SELECT doc_id, g,
        |         list_transform(range(1, g + 1), i ->
        |           list_reduce(
        |             list_prepend(0, list_transform(range(0, 8),
        |               o -> CAST(ascii(substring(text, i + o, 1)) AS BIGINT))),
        |             (acc, ch) -> (acc * 31 + ch) % 1000000007)
        |           * 8589934592 + i) AS codes
        |  FROM c),
        |f AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_transform(range(1, g - 2), j ->
        |           list_min(codes[j:j+3]) // 8589934592))) AS fp
        |  FROM codes),
        |keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) BETWEEN 2 AND 16),
        |fk AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp))
        |SELECT a.doc_id AS da, b.doc_id AS db,
        |       CAST(count(*) AS BIGINT) AS n_shared_fps
        |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "d26_jaro_linkage" ->
      """WITH sc AS (
        |  SELECT c.c_custkey, s.s_suppkey,
        |         CAST(round(1000000 * jaro_winkler_similarity(c.c_name, s.s_name))
        |              AS BIGINT) AS jw_micro
        |  FROM customer c JOIN supplier s ON s.s_nationkey = c.c_nationkey),
        |f AS (SELECT * FROM sc WHERE jw_micro >= 600000)
        |SELECT c_custkey, s_suppkey, jw_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey
        |              ORDER BY jw_micro DESC, s_suppkey) AS rk
        |  FROM f) t
        |WHERE rk = 1""".stripMargin,
    "d25_lsh_tuning_curve" -> sCurveSql,
    "d36_lsh_auto_tune" -> lshAutoTuneSql,
    "d21_multiblock_linkage" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(regexp_extract(c_name, '(\d+)', 1) AS BIGINT) % 50 AS suffix,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |         (CAST(round(c_acctbal * 100) AS BIGINT) + 10000000) // 200000 AS bkt
        |  FROM customer),
        |s AS (
        |  SELECT s_suppkey, s_nationkey,
        |         CAST(regexp_extract(s_name, '(\d+)', 1) AS BIGINT) % 50 AS suffix,
        |         CAST(round(s_acctbal * 100) AS BIGINT) AS cents,
        |         (CAST(round(s_acctbal * 100) AS BIGINT) + 10000000) // 200000 AS bkt
        |  FROM supplier),
        |cand AS (
        |  SELECT c_custkey, s_suppkey, 1 AS blk, c.suffix AS cs, s.suffix AS ss,
        |         c.bkt AS cb, s.bkt AS sb, c.cents AS cc, s.cents AS sc
        |  FROM c JOIN s ON c.c_nationkey = s.s_nationkey
        |  UNION ALL
        |  SELECT c_custkey, s_suppkey, 2 AS blk, c.suffix, s.suffix,
        |         c.bkt, s.bkt, c.cents, s.cents
        |  FROM c JOIN s ON c.bkt = s.bkt AND c.suffix = s.suffix),
        |g AS (
        |  SELECT c_custkey, s_suppkey, CAST(bit_or(blk) AS BIGINT) AS blocks,
        |         CAST(min((CASE WHEN cs = ss THEN 22 ELSE -5 END)
        |            + (CASE WHEN cb = sb THEN 8 ELSE -3 END)
        |            + (CASE WHEN (cc >= 0) = (sc >= 0) THEN 4 ELSE -2 END))
        |           AS BIGINT) AS score
        |  FROM cand GROUP BY 1, 2)
        |SELECT c_custkey, s_suppkey, score, blocks
        |FROM g WHERE score >= 26""".stripMargin,
    "d20_record_linkage" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(regexp_extract(c_name, '(\d+)', 1) AS BIGINT) % 50 AS suffix,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |s AS (
        |  SELECT s_suppkey, s_nationkey,
        |         CAST(regexp_extract(s_name, '(\d+)', 1) AS BIGINT) % 50 AS suffix,
        |         CAST(round(s_acctbal * 100) AS BIGINT) AS cents
        |  FROM supplier),
        |scored AS (
        |  SELECT c_custkey, s_suppkey,
        |         (CASE WHEN c.suffix = s.suffix THEN 22 ELSE -5 END)
        |       + (CASE WHEN (c.cents + 10000000) // 200000
        |                  = (s.cents + 10000000) // 200000 THEN 8 ELSE -3 END)
        |       + (CASE WHEN (c.cents >= 0) = (s.cents >= 0) THEN 4 ELSE -2 END)
        |         AS score
        |  FROM c JOIN s ON c.c_nationkey = s.s_nationkey),
        |m AS (SELECT * FROM scored WHERE score >= 26),
        |r AS (
        |  SELECT c_custkey, s_suppkey, CAST(score AS BIGINT) AS score,
        |         count(*) OVER (PARTITION BY c_custkey) AS n_candidates,
        |         row_number() OVER (PARTITION BY c_custkey
        |                            ORDER BY score DESC, s_suppkey) AS rn
        |  FROM m)
        |SELECT c_custkey, s_suppkey, score, n_candidates FROM r WHERE rn = 1""".stripMargin,
    "d19_line_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS toks,
        |         (len(string_split(text, ' ')) + 3) // 4 AS n_lines
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, i, array_to_string(toks[(i*4+1):(i*4+4)], ' ') AS line
        |  FROM t, unnest(range(0, n_lines)) AS u(i)),
        |dup AS (SELECT line FROM l GROUP BY line
        |        HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (
        |  SELECT doc_id, string_agg(line, ' ' ORDER BY i) AS clean_text,
        |         count(*) AS n_kept
        |  FROM l ANTI JOIN dup USING (line) GROUP BY doc_id)
        |SELECT t.doc_id, t.lang, coalesce(kept.clean_text, '') AS clean_text,
        |       t.n_lines, t.n_lines - coalesce(kept.n_kept, 0) AS n_dropped
        |FROM t LEFT JOIN kept USING (doc_id)""".stripMargin,
    // pure exact-string semantics: the Spark side's hash60 level-1 prune
    // provably loses no df>=2 gram and the exact band/join run on
    // strings, so the oracle needs no hash at all — the gate proves the
    // two-level execution equals the one-level exact algorithm
    "d17_substring_spans" ->
      """WITH sh0 AS (
        |  SELECT doc_id, text, unnest(range(1, greatest(n_chars - 38, 1))) AS pos
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, pos, substr(text, CAST(pos AS INTEGER), 40) AS gram
        |  FROM sh0),
        |keep AS (SELECT gram FROM sh GROUP BY gram
        |         HAVING count(*) BETWEEN 2 AND 16),
        |sk AS (SELECT sh.* FROM sh JOIN keep USING (gram)),
        |m AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
        |  FROM sk a JOIN sk b ON a.gram = b.gram AND a.doc_id < b.doc_id),
        |isl AS (
        |  SELECT da, db, pa, pb, pa - pb AS diag,
        |         pa - row_number() OVER (PARTITION BY da, db, pa - pb
        |                                 ORDER BY pa) AS island
        |  FROM m)
        |SELECT da, db, min(pa) AS start_a, min(pb) AS start_b,
        |       count(*) + 39 AS span_len
        |FROM isl GROUP BY da, db, diag, island
        |HAVING count(*) + 39 >= 60""".stripMargin,
    "d16_editdist_join" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name AS name FROM part
        |  WHERE length(p_name) >= 7),
        |g0 AS (
        |  SELECT name, unnest(range(1, length(name))) AS i FROM names),
        |g AS (
        |  SELECT name, substr(name, CAST(i AS INTEGER), 2) AS gram,
        |         count(*) AS cnt
        |  FROM g0 GROUP BY 1, 2),
        |cand AS (
        |  SELECT a.name AS name_a, b.name AS name_b,
        |         sum(least(a.cnt, b.cnt)) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.name < b.name
        |  WHERE abs(length(a.name) - length(b.name)) <= 2
        |  GROUP BY 1, 2
        |  HAVING sum(least(a.cnt, b.cnt)) >=
        |         greatest(length(a.name), length(b.name)) - 5)
        |SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
        |FROM cand WHERE levenshtein(name_a, name_b) <= 2""".stripMargin,
    "d12_passage_stats" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks) - 12)) AS i
        |        FROM t WHERE len(toks) >= 13) u),
        |dfreq AS (SELECT ng, count(*) AS n_docs FROM g GROUP BY ng)
        |SELECT g.doc_id, count(*) AS n_grams,
        |       CAST(sum(CASE WHEN dfreq.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_shared,
        |       CAST(sum(CASE WHEN dfreq.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS dup_frac,
        |       CASE WHEN CAST(sum(CASE WHEN dfreq.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |                   / count(*) > 0.5
        |            THEN 'prune' ELSE 'keep' END AS verdict
        |FROM g JOIN dfreq USING (ng)
        |GROUP BY g.doc_id""".stripMargin,
    "d14_passage_dedup_apply" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |pg AS (
        |  SELECT doc_id, i, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks) - 12)) AS i
        |        FROM t WHERE len(toks) >= 13) u),
        |dfreq AS (
        |  SELECT ng, count(DISTINCT doc_id) AS n_docs FROM pg GROUP BY ng),
        |st AS (
        |  SELECT doc_id, list(i) AS starts
        |  FROM pg SEMI JOIN (SELECT ng FROM dfreq WHERE n_docs >= 2) s USING (ng)
        |  GROUP BY doc_id),
        |k AS (
        |  SELECT t.doc_id, t.toks,
        |         list_filter(range(1, len(t.toks) + 1),
        |           j -> st.starts IS NULL OR
        |                len(list_filter(st.starts,
        |                      i -> i <= j AND j <= i + 12)) = 0) AS kept
        |  FROM t LEFT JOIN st USING (doc_id))
        |SELECT doc_id,
        |       coalesce(array_to_string(list_transform(kept, j -> toks[j]), ' '),
        |                '') AS cleaned_text,
        |       len(toks) - len(kept) AS n_removed_tokens,
        |       (len(toks) - len(kept)) / len(toks) AS removed_frac
        |FROM k""".stripMargin,
    "d01_dedup_exact" ->
      """SELECT user_id, event_type, min(event_id) AS first_event_id,
        |       count(*) AS n_dupes
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "d02_dedup_content_hash" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keeper_doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY sha256(text)""".stripMargin,
    "d24_ppjoin" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |           AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |dd AS (SELECT doc_id, shingles, len(shingles) AS n FROM t),
        |e AS (SELECT doc_id, n, unnest(shingles) AS shingle FROM dd),
        |f AS (SELECT shingle, count(*) AS df FROM e GROUP BY 1),
        |r AS (
        |  SELECT e.doc_id, e.n, e.shingle,
        |         row_number() OVER (PARTITION BY e.doc_id
        |                            ORDER BY f.df, e.shingle) AS rk
        |  FROM e JOIN f USING (shingle)),
        |p AS (SELECT doc_id, shingle FROM r
        |      WHERE rk <= n - (4 * n + 4) // 5 + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM p a JOIN p b ON a.shingle = b.shingle
        |                   AND a.doc_id < b.doc_id),
        |v AS (
        |  SELECT c.doc_a, c.doc_b,
        |         CAST(len(list_intersect(da.shingles, db.shingles))
        |              AS BIGINT) AS inter,
        |         da.n AS na, db.n AS nb
        |  FROM cand c JOIN dd da ON da.doc_id = c.doc_a
        |              JOIN dd db ON db.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, inter / (na + nb - inter) AS jaccard
        |FROM v WHERE inter / (na + nb - inter) >= 0.8""".stripMargin,
    "d22_containment" ->
      s"""WITH $PairScoresCte,
         |o AS (
         |  SELECT CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS doc_small,
         |         CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS doc_big,
         |         least(na, nb) AS n_small, greatest(na, nb) AS n_big,
         |         inter / least(na, nb) AS containment,
         |         inter / (na + nb - inter) AS jaccard
         |  FROM p)
         |SELECT doc_small, doc_big, n_small, n_big, containment, jaccard
         |FROM o WHERE containment >= 0.8""".stripMargin,
    "d35_chaining_audit" ->
      s"""WITH RECURSIVE $ClustersCte,
         |pj AS (
         |  SELECT cc1.cluster_rep,
         |         p.inter / (p.na + p.nb - p.inter) AS jaccard
         |  FROM p JOIN cc cc1 ON cc1.doc_id = p.doc_a
         |  WHERE p.inter / (p.na + p.nb - p.inter) >= 0.1),
         |sz AS (
         |  SELECT cluster_rep, count(*) AS size FROM cc GROUP BY 1
         |  HAVING count(*) >= 2),
         |pg AS (
         |  SELECT cluster_rep, count(*) AS n_pairs,
         |         min(jaccard) AS min_jaccard
         |  FROM pj GROUP BY 1)
         |SELECT sz.cluster_rep, sz.size, pg.n_pairs, pg.min_jaccard,
         |       pg.n_pairs * 2000 // (sz.size * (sz.size - 1)) AS density_pm
         |FROM sz JOIN pg USING (cluster_rep)""".stripMargin,
    "d34_dedup_roi" ->
      s"""WITH $ShingleIndexCte,
         |pl AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.n AS na, b.n AS nb, count(*) AS inter
         |  FROM f a JOIN f b
         |    ON a.shingle = b.shingle AND a.lang = b.lang
         |   AND a.source = b.source AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4),
         |taus AS (SELECT CAST(unnest([100, 300, 500, 700, 900]) AS BIGINT)
         |                  AS tau_pm),
         |hits AS (
         |  SELECT taus.tau_pm, pl.doc_b
         |  FROM pl CROSS JOIN taus
         |  WHERE pl.inter * 1000 >= taus.tau_pm * (pl.na + pl.nb - pl.inter)),
         |pc AS (SELECT tau_pm, count(*) AS n_pairs FROM hits GROUP BY 1),
         |tok AS (SELECT doc_id AS doc_b,
         |               CAST(len(string_split(text, ' ')) AS BIGINT)
         |                 AS n_tokens
         |        FROM documents),
         |dr AS (
         |  SELECT tau_pm, count(*) AS n_docs_dropped,
         |         CAST(sum(n_tokens) AS BIGINT) AS tokens_dropped
         |  FROM (SELECT DISTINCT tau_pm, doc_b FROM hits) h
         |  JOIN tok USING (doc_b) GROUP BY 1)
         |SELECT taus.tau_pm, coalesce(pc.n_pairs, 0) AS n_pairs,
         |       coalesce(dr.n_docs_dropped, 0) AS n_docs_dropped,
         |       coalesce(dr.tokens_dropped, 0) AS tokens_dropped
         |FROM taus LEFT JOIN pc USING (tau_pm)
         |LEFT JOIN dr USING (tau_pm)""".stripMargin,
    "d05_ngram_jaccard" ->
      s"""WITH $ShingleIndexCte,
         |pl AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
         |         a.n AS na, b.n AS nb, count(*) AS inter
         |  FROM f a JOIN f b
         |    ON a.shingle = b.shingle AND a.lang = b.lang
         |   AND a.source = b.source AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT doc_a, doc_b, lang, inter / (na + nb - inter) AS jaccard
         |FROM pl WHERE inter / (na + nb - inter) >= 0.1""".stripMargin,
    "d11_incremental_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         list_distinct(list_transform(range(1, len(toks)),
        |           i -> toks[i] || ' ' || toks[i+1])) AS shingles
        |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 2),
        |e AS (
        |  SELECT doc_id, lang, source, len(shingles) AS n,
        |         unnest(shingles) AS shingle
        |  FROM t),
        |scores AS (
        |  SELECT b.doc_id AS new_doc, c.doc_id AS corpus_doc,
        |         b.n AS nb, c.n AS nc, count(*) AS inter
        |  FROM e b JOIN e c
        |    ON b.shingle = c.shingle AND b.lang = c.lang AND b.source = c.source
        |  WHERE b.doc_id % 7 = 0 AND c.doc_id % 7 <> 0
        |  GROUP BY 1, 2, 3, 4),
        |j AS (
        |  SELECT new_doc, corpus_doc,
        |         inter / (nb + nc - inter) AS jaccard
        |  FROM scores)
        |SELECT new_doc, corpus_doc, jaccard,
        |       CASE WHEN jaccard >= 0.5 THEN 'duplicate' ELSE 'novel' END AS verdict
        |FROM (SELECT *, row_number() OVER (PARTITION BY new_doc
        |        ORDER BY jaccard DESC, corpus_doc) AS rk FROM j) t
        |WHERE rk <= 1""".stripMargin,
    "d10_dedup_clusters" ->
      s"""WITH RECURSIVE $ClustersCte
         |SELECT doc_id, cluster_rep FROM cc""".stripMargin,
    "d23_canonical_pick" ->
      s"""WITH RECURSIVE $ClustersCte,
         |q AS (
         |  SELECT doc_id,
         |         1000 - (CAST(len(list_filter(toks, x -> length(x) <= 2))
         |                      AS BIGINT) * 1000)
         |                // CAST(len(toks) AS BIGINT) AS q_pm
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
         |        FROM documents)),
         |j AS (SELECT cc.cluster_rep, cc.doc_id, q.q_pm
         |      FROM cc JOIN q USING (doc_id)),
         |m AS (SELECT cluster_rep, count(*) AS n_members FROM j GROUP BY 1),
         |b AS (
         |  SELECT cluster_rep, doc_id AS canonical_doc,
         |         q_pm AS canonical_q_pm,
         |         row_number() OVER (PARTITION BY cluster_rep
         |                            ORDER BY q_pm DESC, doc_id) AS rk
         |  FROM j)
         |SELECT b.cluster_rep, b.canonical_doc, b.canonical_q_pm, m.n_members
         |FROM b JOIN m USING (cluster_rep) WHERE rk = 1""".stripMargin,
    "d13_dedup_clusters_star" ->
      s"""WITH RECURSIVE $ClustersCte
         |SELECT doc_id, cluster_rep FROM cc""".stripMargin,
    "d09_dedup_apply_exact" ->
      s"""WITH $PairScoresCte,
         |drops AS (
         |  SELECT DISTINCT doc_b AS drop_id FROM p
         |  WHERE inter / (na + nb - inter) >= 0.5)
         |SELECT lang, count(*) AS n_kept,
         |       CAST(sum(n_chars) AS BIGINT) AS kept_chars
         |FROM documents ANTI JOIN drops ON doc_id = drop_id
         |GROUP BY lang""".stripMargin,
    "d15_semdedup" ->
      """WITH p AS (
        |  SELECT b.vec_id AS vec_id, b.label AS label,
        |         list_sum(list_transform(list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_id, label, max(sim) AS max_sim_earlier
        |FROM p GROUP BY 1, 2 HAVING max(sim) > 0.33""".stripMargin,
    "d06_embed_neardup" ->
      """WITH p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
        |         list_sum(list_transform(list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, label, sim FROM p WHERE sim > 0.35""".stripMargin,
  )
}
