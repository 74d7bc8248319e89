package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.TopKPerGroup
import graft.plans.TopKPerGroup.Ord

/** Dataset-curation operators for a training-data pipeline (brief
  * §extended): the selection steps that run BETWEEN dedup/scoring and
  * training — stratified sampling and quality-threshold budgeting.
  * Both are oracle-checked end to end.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  import org.apache.spark.sql.Column

  /** Knuth-style multiplicative hash, mod-reduced BEFORE the multiply: the
    * raw product overflows Long past id ~3.5e9, where Spark would wrap
    * silently while the DuckDB twin errors — mod-first keeps the product
    * under 2^62 and both engines exact at any id. Every sampling/split
    * query derives its hash from here so the invariant lives in one place
    * (the oracle SQL strings stay inline but mirror this exact shape).
    */
  private def hashCol(id: Column, salt: Long, mod: Long): Column =
    ((id % 1000003L) * 2654435761L + salt) % mod

  /** Deterministic stratified sample: k docs per language, chosen by a
    * Knuth-style multiplicative hash of doc_id (uniform, engine-agnostic
    * 64-bit arithmetic — no RNG state, no sampling seed to ship).
    *
    * Spark shape: the native TopKPerGroup operator — per-partition heaps
    * keep k rows per (partition, lang), so the shuffle carries at most
    * k x partitions x strata rows; no per-stratum reducer ever sees a full
    * stratum (the rank-window formulation would).
    */
  def c01_stratified_sample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        hashCol(col("doc_id"), 40503L, 1000000007L).as("h"))
    TopKPerGroup.topK(docs, Seq("lang"), Seq(Ord("h"), Ord("doc_id")), 20)
  }

  /** Token-budget selection by quality quantile: keep the top 20% of docs
    * by the t02 quality score, report kept docs + token volume per lang.
    *
    * Scale shape: the threshold is ONE number from a percentile aggregate
    * (broadcast back as a 1-row cross join) — no global sort, no running
    * sum through a single reducer, which is how the naive "sort by quality,
    * take until budget" formulation dies at 100 TB. Exact interpolated
    * percentile matches DuckDB quantile_cont bit-for-bit (proven by q40);
    * scores are bit-identical cross-engine (t02). The exact percentile's
    * final merge is itself a single-buffer scale bound, so c02 is the
    * small-SF oracle twin — c06 is the same selection with the
    * sketch-based threshold that survives 100 TB.
    */
  def c02_token_budget(s: SparkSession, d: String): DataFrame = {
    val scored = qualityScored(s, d)
    val thr = scored.agg(expr("percentile(score, 0.8D)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("score") >= col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
  }

  /** Deterministic train/val/test split (80/10/10) by doc_id hash — no
    * sampling seed, no RNG: the same doc lands in the same split on every
    * engine, every run, every cluster size. Pure projection + 3-row agg.
    */
  def c03_hash_split(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h", hashCol(col("doc_id"), 97L, 1000L))
      .withColumn("split",
        when(col("h") < 800, "train").when(col("h") < 900, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  /** Leakage-safe split: near-duplicate documents must land in the SAME
    * split or eval contamination follows — so hash the d10 cluster
    * representative, not the doc itself (singletons fall back to their own
    * id). The join is keys-only; component resolution comes from the
    * iterative min-label propagation, so the whole thing stays
    * oracle-checkable via the recursive-CTE twin.
    */
  def c04_split_by_cluster(s: SparkSession, d: String): DataFrame = {
    val clusters = DedupQueries.d10_dedup_clusters(s, d)
    Tables.documents(s, d)
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("h", hashCol(col("rep"), 97L, 1000L))
      .withColumn("split",
        when(col("h") < 800, "train").when(col("h") < 900, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
  }

  /** The quality-scored projection shared by c02 (exact threshold) and
    * c06 (approximate threshold): one codegen'd pass over documents.
    */
  private[graft] def qualityScored(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // single-file scan = ONE partition; the per-row scoring below (split
      // + an interpreted HOF filter) is CPU-heavy, so without this the
      // whole pass serializes on one task (r13 flight sweep: c06's
      // checkpoint stage ran 1 task x 1.5 s CPU)
      .repartition(Tables.scanPartitions(s))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("short_ratio",
        expr("size(filter(toks, x -> length(x) <= 2))") / col("n_tokens"))
      .withColumn("avg_token_len",
        (col("n_chars") - col("n_tokens") + 1) / col("n_tokens"))
      .withColumn("score",
        sqrt(col("n_tokens")) - col("short_ratio") * 2.0 +
          col("avg_token_len") * 0.1)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"))

  /** c02's 100 TB twin: the SAME token-budget selection, but the
    * threshold comes from `approx_percentile` (a KLL-style mergeable
    * sketch) instead of the exact interpolated percentile. The exact
    * aggregate's final merge holds every distinct score in one task's
    * buffer — at 100 TB of continuous doubles that single buffer IS the
    * corpus and the reducer OOMs. The sketch buffer is bounded
    * (accuracy-parameter-sized), partial-aggregates map-side, and one
    * tiny sketch per partition crosses the shuffle.
    *
    * Round-9 (verdict item 6): the sketch threshold (and so the kept set)
    * is engine-specific, but its CONTRACT is not — approx_percentile with
    * accuracy 1e4 DETERMINISTICALLY guarantees the returned value's rank
    * is within n/1e4 of 0.8n. The gated output carries exact per-lang
    * corpus stats plus `rank_ok`: the threshold re-ranked against the
    * scored corpus (tie-safe bracket, pure counts — the exact percentile
    * buffer stays out of the plan, which is c06's whole scale point; the
    * pin in PlanInvariantsSpec still holds). A sketch regression flips
    * the bit → hash red. The kept-set selection itself stays covered by
    * exact-twin c02's hash gate and the c06-vs-c02 accuracy spec.
    */
  def c06_token_budget_approx(s: SparkSession, d: String): DataFrame = {
    val scored = qualityScored(s, d).localCheckpoint()
    val thr = scored.agg(
      expr("approx_percentile(score, 0.8D, 10000)").as("thr"),
      count(lit(1)).as("n_total"))
    val audit = scored.crossJoin(broadcast(thr))
      .groupBy(col("n_total"))
      .agg(SketchQueries.rankOk(0.8, col("thr"), col("score"), col("n_total"),
        eps = 1.0 / 10000.0).as("rank_ok"))
      .select(col("rank_ok"))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
      .crossJoin(broadcast(audit))
  }

  /** Mixture sampling: downsample each source to a TARGET proportion
    * (keep-all / half / fifth here) via a hash threshold — the "rebalance
    * the corpus mix before training" op. Seedless and exact: keep iff
    * h < frac * M, so the same doc survives on every engine and the kept
    * fraction concentrates tightly around the target. Pure scan-side
    * filter + aggregate; no sampling shuffle, no RNG state.
    */
  def c05_mixture_sample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h", hashCol(col("doc_id"), 12289L, 1000000007L))
      .withColumn("keep_frac",
        when(col("source").isin("src0", "src1"), 1.0)
          .when(col("source").isin("src2", "src3", "src4"), 0.5)
          .otherwise(0.2))
      .filter(col("h") < col("keep_frac") * 1000000007L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))

  /** Sequence packing — assign docs to fixed-token-budget packs (the
    * "fill 1024-token training sequences" preprocessing step). Greedy
    * sequential packing is inherently order-dependent, so the order is
    * pinned: docs fill packs by doc_id within a (lang, shard) stream,
    * pack = cumulative-token start offset DIV budget. The running sum is
    * a window — which would funnel a whole language through one reducer
    * at 100 TB, so the stream is pre-sharded by doc_id hash (32 shards
    * per lang here; a real run picks shards ~ executor count): packing
    * parallelism is (langs x shards), each shard's window is
    * corpus/shards-sized, and the result is still fully deterministic —
    * the same doc lands in the same pack on every engine and cluster
    * size. Reports per-pack doc/token totals.
    */
  def c07_pack_sequences(s: SparkSession, d: String): DataFrame = {
    val budget = 1024L
    val docs = Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("shard", hashCol(col("doc_id"), 271L, 32L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) DIV $budget"))
      .groupBy(col("lang"), col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
  }

  /** Eval-set decontamination — flag corpus documents whose bigram
    * Jaccard overlap with any held-out eval document crosses 0.3 (train/
    * eval contamination is the classic benchmark-inflation bug; this is
    * the scan that must run before every training mix ships). The eval
    * set is tiny by nature, so its inverted index BROADCASTS and the
    * corpus side probes map-side — no corpus self-join anywhere, the same
    * asymmetric economics as d11's ingest probe but cross-lang/source
    * (contamination doesn't respect metadata). Emits (corpus_doc, its
    * worst eval match, jaccard) for flagged docs.
    */
  def c08_decontaminate(s: SparkSession, d: String): DataFrame = {
    // the fixture has no separate eval suite, so one is DERIVED (1/19 of
    // docs) — but it enters through the parameterized API below exactly as
    // an independent eval frame would, so the broadcast bound is enforced
    // structurally, not by fixture luck
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)) // single-file fixture
      .localCheckpoint() // both derived sides read one materialized scan
    decontaminateJaccard(
      docs.filter(col("doc_id") % 19 =!= 0),
      docs.filter(col("doc_id") % 19 === 0))
  }

  /** Eval suites are fixed, small artifacts (a few thousand prompts); the
    * broadcast-the-eval-index plan is only valid under that bound, so it
    * is ASSERTED, not assumed — an eval frame that grew corpus-shaped
    * fails loudly before the broadcast OOMs an executor.
    */
  private val MaxEvalDocs = 100000L

  /** Lowercased 13-gram stream (`keep` columns + `ng`) — the shared gram
    * projection of the decontamination family (c08/c09/c13/c15).
    */
  private def grams13(df: DataFrame, keep: String*): DataFrame = {
    import graft.functions.TextFunctions.word_shingles
    df.select(keep.map(col) :+
      explode(word_shingles(split(lower(col("text")), " "), 13)).as("ng"): _*)
  }

  private[graft] def requireEvalBounded(evalDocs: DataFrame,
                                            cap: Long = MaxEvalDocs): Unit = {
    val n = evalDocs.count()
    require(n <= cap,
      s"eval side has $n docs (cap $cap): the broadcast decontamination " +
        "plan needs a fixed small eval suite — a corpus-sized eval side means " +
        "the inputs are swapped or the plan must switch to a shuffle join")
  }

  /** Fuzzy (bigram-jaccard) decontamination of `corpusDocs` against an
    * independent `evalDocs` frame — both (doc_id, lang, source, text).
    */
  private[operators] def decontaminateJaccard(corpusDocs: DataFrame,
                                              evalDocs: DataFrame): DataFrame = {
    requireEvalBounded(evalDocs)
    val idx = DedupQueries.bigramIndex(corpusDocs)
      .select(col("doc_id"), col("n"), col("shingle"))
      .localCheckpoint() // hot-df guard + probe derive from one kernel pass
    val eval = DedupQueries.bigramIndex(evalDocs)
      .select(col("doc_id"), col("n"), col("shingle"))
    // d05's hot-shingle guard, probe-shaped: a boilerplate bigram shared
    // by df corpus docs meets every eval doc carrying it as df x |eval|
    // pairs in one reducer — drop shingles with corpus df > DfCap before
    // the join (they carry no discrimination signal; `n` stays the full
    // set size, so jaccard only ever under-counts — the d05 trade)
    val hot = idx
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > DedupQueries.DfCap).select(col("shingle"))
    val corpus = idx.join(broadcast(hot), Seq("shingle"), "left_anti")
    val scores = corpus.as("c")
      .join(broadcast(eval.as("v")), col("c.shingle") === col("v.shingle"))
      .groupBy(col("c.doc_id").as("corpus_doc"), col("v.doc_id").as("eval_doc"),
        col("c.n").as("nc"), col("v.n").as("nv"))
      .agg(count(lit(1)).as("inter"))
      .select(col("corpus_doc"), col("eval_doc"),
        (col("inter") / (col("nc") + col("nv") - col("inter"))).as("jaccard"))
    TopKPerGroup.topK(scores, Seq("corpus_doc"),
      Seq(Ord("jaccard", desc = true), Ord("eval_doc")), 1)
      .filter(col("jaccard") >= 0.3)
  }

  /** Exact 13-gram collision decontamination — the complement of c08's
    * fuzzy jaccard screen and the method most eval suites actually specify
    * (a corpus doc is contaminated if it shares ANY 13-token run with an
    * eval doc; cf. GPT-3's 13-gram dedup, arXiv:2005.14165 §C). Exact
    * string equality means this needs no similarity threshold and stays
    * fully hash-checkable.
    *
    * Shape at scale: per-doc DISTINCT 13-grams come from the native
    * word_shingles kernel (one scan-side pass, no shuffle); the eval side
    * is tiny by nature so its gram set BROADCASTS, and the corpus probes
    * it map-side — the only shuffle is the per-doc count aggregate, keyed
    * by doc_id (no hot reducer). Linear in corpus tokens, the floor.
    */
  def c09_decontaminate_ngram(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)) // single-file fixture
      .localCheckpoint() // both derived sides read one materialized scan
    decontaminateExact(
      docs.filter(col("doc_id") % 19 =!= 0),
      docs.filter(col("doc_id") % 19 === 0))
  }

  /** c09 with a Bloom-filter pre-probe — the 100 TB refinement of the
    * broadcast-gram-set plan. At scale the eval 13-gram SET is hundreds of
    * MB of strings; the Bloom filter summarizing it is a few KB of longs,
    * so every corpus gram is first screened by k=3 xxhash64 bit tests
    * (a codegen'd scalar filter in the scan stage) and only the surviving
    * ~FP-rate fraction reaches the string-equality broadcast join. Bloom
    * filters have NO false negatives, so the exact join output — and hence
    * the oracle — is identical to c09's; the bits are deterministic
    * (fixed seeds, fixed width), not sampled. The filter words are built
    * with one bit_or aggregate over the eval grams and collected to the
    * driver bounded by the filter width (2048 longs), the same
    * driver-held-small-model pattern as KMeans centroids.
    */
  def c13_decontaminate_bloom(s: SparkSession, d: String): DataFrame = {
    val mBits = 1 << 17 // 131072 bits = 2048 longs = 16 KB broadcast
    val kHash = 3
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .localCheckpoint()
    val evalDocs = docs.filter(col("doc_id") % 19 === 0)
    requireEvalBounded(evalDocs)
    val evalGrams = grams13(evalDocs, "doc_id").select(col("ng")).distinct()
      .localCheckpoint() // feeds the bloom build AND the exact verify join
    val bloomWords: Array[Long] = {
      val positions = evalGrams.select(explode(array(
        (0 until kHash).map(j =>
          pmod(xxhash64(lit(j), col("ng")), lit(mBits.toLong))): _*)).as("p"))
      val rows = positions
        .groupBy(expr("cast(p div 64 as int)").as("w"))
        .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("bits"))
        .collect() // <= 2048 rows by construction
      val words = new Array[Long](mBits / 64)
      rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
      words
    }
    val bloomLit = typedLit(bloomWords.toSeq)
    // bind each bit position ONCE per hash function (the review finding:
    // inlining pmod(xxhash64) into both the word index and the bit index
    // doubled the hashing in the hot scan filter), and keep the position
    // arithmetic textually identical to the build side above
    val withPos = (0 until kHash).foldLeft(
        grams13(docs.filter(col("doc_id") % 19 =!= 0), "doc_id")
          .withColumn("bf", bloomLit)) {
      (df, j) => df.withColumn(s"p$j",
        pmod(xxhash64(lit(j), col("ng")), lit(mBits.toLong)))
    }
    val screened = withPos
      .filter((0 until kHash).map(j => expr(
        s"(element_at(bf, cast(p$j div 64 as int) + 1)" +
          s" & shiftleft(1L, cast(p$j % 64 as int))) != 0L"))
        .reduce(_ && _))
      .select(col("doc_id"), col("ng"))
    screened
      .join(broadcast(evalGrams), "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_ngrams"))
  }

  /** Exact 13-gram decontamination of `corpusDocs` against an independent
    * `evalDocs` frame — both (doc_id, text, ...). Same structural eval
    * bound as the jaccard screen.
    */
  private[operators] def decontaminateExact(corpusDocs: DataFrame,
                                            evalDocs: DataFrame): DataFrame = {
    requireEvalBounded(evalDocs)
    val eval = grams13(evalDocs, "doc_id").select(col("ng")).distinct()
    grams13(corpusDocs, "doc_id")
      .join(broadcast(eval), "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_ngrams")) // grams are per-doc distinct
  }

  /** Sliding-window document chunking — split every document into
    * overlapping ≤40-token chunks on a 32-token stride (8-token overlap),
    * the preprocessing step both RAG indexing and fixed-context
    * pretraining run before anything else sees the text. Pure per-row
    * explode: zero shuffle, scan-speed, output linear in corpus tokens;
    * chunk boundaries are integer arithmetic so the emitted text itself
    * is hash-checked cross-engine.
    */
  def c10_chunk_documents(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, CAST((size(toks) - 1) DIV 32 AS INT)), " +
            "k -> array_join(slice(toks, 32 * k + 1, 40), ' '))"))
          .as(Seq("chunk_no", "chunk_text")))
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        size(split(col("chunk_text"), " ")).cast("long").as("chunk_tokens"),
        col("chunk_text"))

  /** Temperature-scaled mixture weights — the multilingual/domain
    * rebalancing rule (Conneau & Lample '19 §3.1; the DoReMi-style domain
    * reweighting shape): sampling weight w_i ∝ p_i^alpha flattens the
    * head so low-resource strata aren't drowned. alpha = 0.5 here because
    * p^0.5 = sqrt is CORRECTLY ROUNDED on every IEEE platform (general
    * pow is not) — the engine-portability trade the repo's t02 documents;
    * w_i ∝ sqrt(tokens_i) orders identically to sqrt(p_i) since the
    * corpus total is a constant factor. Each sqrt is rounded to 9dp and
    * the normalizer summed as DECIMAL(38,9) (exactly associative at any
    * partitioning), so the weights and expected token allocations
    * hash-check. Spark shape: one tokenize+agg pass (5 strata rows) + a
    * broadcast 1-row normalizer.
    */
  def c14_mixture_weights(s: SparkSession, d: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val lt = Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
      .withColumn("sq", round(sqrt(col("n_tokens")), 9).cast(dec9))
    val tot = lt.agg(sum(col("sq")).cast("double").as("t"))
    lt.crossJoin(broadcast(tot))
      .withColumn("weight", round(col("sq").cast("double") / col("t"), 9))
      .select(col("lang"), col("n_tokens"), col("weight"),
        round(lit(100000) * col("weight"), 9).as("expected_tokens"))
  }

  /** Cross-split leakage audit — the hygiene check behind c04's existence:
    * measure how many val/test docs of the NAIVE per-doc hash split (c03)
    * share at least one 13-gram with some train doc. Near-duplicates
    * split apart by a doc-level hash leak verbatim passages from train
    * into eval — the contamination that inflates benchmark scores (GPT-3
    * §C measured exactly this post-hoc). Shape: one gram pass, the train
    * gram set probes the val/test grams through a distinct semi join —
    * at 100 TB the train side is the big one, so the join is keyed on
    * gram with map-side-partial distincts, never doc x doc.
    */
  def c15_split_leakage(s: SparkSession, d: String): DataFrame = {
    val docs = grams13(
      Tables.documents(s, d)
        .repartition(Tables.scanPartitions(s))
        .withColumn("h", hashCol(col("doc_id"), 97L, 1000L))
        .withColumn("split",
          when(col("h") < 800, "train").when(col("h") < 900, "val").otherwise("test")),
      "doc_id", "split")
      .localCheckpoint() // train grams + eval probe read one gram pass
    val trainGrams = docs.filter(col("split") === "train")
      .select(col("ng")).distinct()
    val leaked = docs.filter(col("split") =!= "train")
      .join(trainGrams, Seq("ng"), "left_semi")
      .select(col("split"), col("doc_id")).distinct()
      .groupBy(col("split")).agg(count(lit(1)).as("n_leaked"))
    docs.filter(col("split") =!= "train")
      .select(col("split"), col("doc_id")).distinct()
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .join(leaked, Seq("split"), "left")
      .select(col("split"), col("n_docs"), coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
  }

  /** c23: leakage REPAIR — c15 measures cross-split 13-gram contamination;
    * this one fixes it the way corpus builds actually do (move the leaked
    * eval docs back to train — shrinking eval is safe, polluting it is
    * not) and emits the repaired split census: docs, moved-in count, and
    * char mass per final split. Same single gram pass as c15 (train grams
    * probe the eval side through a distinct semi join); the repair itself
    * is a keys-only left join + CASE — no second text scan. Determinism:
    * c03's multiplicative doc_id hash assigns splits, gram equality does
    * the rest -> hash-green. Docs under 13 tokens can't leak by
    * construction and simply keep their split.
    */
  def c23_split_repair(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .withColumn("h", hashCol(col("doc_id"), 97L, 1000L))
      .withColumn("split", when(col("h") < 800, "train")
        .when(col("h") < 900, "val").otherwise("test"))
      .localCheckpoint() // feeds the gram pass AND the final census
    val grams = grams13(base, "doc_id", "split").localCheckpoint()
    val trainGrams = grams.filter(col("split") === "train")
      .select(col("ng")).distinct()
    val leaked = grams.filter(col("split") =!= "train")
      .join(trainGrams, Seq("ng"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("leaked", lit(1L))
    base.join(leaked, Seq("doc_id"), "left")
      .withColumn("final_split",
        when(col("split") =!= "train" && col("leaked").isNotNull, "train")
          .otherwise(col("split")))
      .groupBy(col("final_split").as("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("leaked").isNotNull && col("split") =!= "train", 1L)
          .otherwise(0L)).as("n_moved_in"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** c24: quality-threshold SWEEP — the ablation curve behind every filter
    * decision (t12 reports ONE fixed rule chain; this reports the whole
    * tradeoff: for each candidate threshold, how many docs/tokens survive
    * — the table you read before picking t12's constants). Quality is the
    * integer per-mille non-short-token score (t02's family, scaled-integer
    * so no doc sits on a float boundary); docs bucket by score/100 in the
    * scan, the sweep is a cumulative sum DOWN the buckets. The cumulative
    * window is global but runs over <= 11 BUCKET rows (metadata-sized,
    * m10's file-listing economics) — the corpus itself never crosses a
    * global window. All-integer counts + one final share -> hash-green.
    */
  def c24_filter_sweep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nshort",
        expr("CAST(size(filter(toks, x -> length(x) <= 2)) AS BIGINT)"))
      .withColumn("q_pm", expr("1000 - (nshort * 1000) div nt"))
      .withColumn("bucket", expr("q_pm div 100"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byBucket.agg(sum(col("n_tokens")).cast("double").as("tt"))
    byBucket
      .withColumn("docs_kept", sum(col("n_docs")).over(w))
      .withColumn("tokens_kept", sum(col("n_tokens")).over(w))
      .crossJoin(broadcast(tot))
      .select((col("bucket") * 100).cast("long").as("min_q_pm"),
        col("n_docs"), col("n_tokens"), col("docs_kept"), col("tokens_kept"),
        round(col("tokens_kept").cast("double") / col("tt"), 9)
          .as("token_share_kept"))
  }

  /** c25: DSIR importance weights — Xie et al., "Data Selection via
    * Importance Resampling" (NeurIPS'23): score every raw document by how
    * much more likely its hashed-feature bag is under the TARGET
    * distribution than under the RAW distribution, then keep the top of
    * the ranking. Features are hashed unigrams (8192 buckets via the t04
    * polynomial hash — the paper's hashed n-gram trick, which is what
    * keeps the model size FIXED at any corpus scale); both distributions
    * are Laplace-smoothed bucket unigram models, and a document's log
    * importance weight is the sum of its occurrences' bucket log-ratios.
    *
    * Determinism: the log-ratio is ONE double division of exact int64
    * products passed through ln and rounded to 9dp (t05/t11's recipe),
    * per-occurrence weights are DECIMAL(38,9) so the per-doc sum is
    * exactly associative, and the final top-100 breaks ties on doc_id —
    * the whole selection hash-checks. (Real DSIR adds Gumbel noise to
    * sample rather than rank; the deterministic top-k is the auditable
    * twin and the noise would be one extra column.) Scale shape: tokenize
    * once (checkpointed), bucket-hash the VOCABULARY not the occurrence
    * stream, per-bucket counts collapse to <= 8192 rows map-side, the
    * lambda table rides a broadcast join back over the occurrence stream,
    * and the top-100 is a k-bounded TakeOrdered — no corpus-sized sort or
    * window anywhere.
    */
  def c25_dsir_weights(s: SparkSession, d: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val nBuckets = 8192L
    val tok = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"), (col("doc_id") % 19 === 0).as("is_target"),
        explode(split(lower(col("text")), " ")).as("term"))
      .localCheckpoint() // feeds vocab hashing, bucket counts, and scoring
    val vocab = tok.select(col("term")).distinct()
      .withColumn("b", when(length(col("term")) === 0, lit(0L)).otherwise(expr(
        "aggregate(transform(sequence(1, length(term)), " +
          "i -> CAST(ascii(substring(term, i, 1)) AS LONG)), " +
          s"0L, (acc, c) -> (acc * 31 + c) % 1000000007) % $nBuckets")))
    val counts = tok.join(vocab, "term")
      .groupBy(col("b"))
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("cr"))
    val lam = counts
      .crossJoin(broadcast(counts.agg(
        sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))))
      .select(col("b"),
        round(log(((col("ct") + 1) * (col("nr") + nBuckets)).cast("double") /
          ((col("cr") + 1) * (col("nt") + nBuckets))), 9).cast(dec9).as("lam"))
    val termLam = vocab.join(broadcast(lam), "b").select(col("term"), col("lam"))
    tok.filter(!col("is_target"))
      .join(termLam, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lam")).cast("double").as("dsir_weight"))
      .orderBy(col("dsir_weight").desc, col("doc_id"))
      .limit(100)
  }

  /** c28: deterministic global TRAINING ORDER — the data-ordering step a
    * training run consumes after curation: every document gets an exact
    * global position under a seedless Knuth-hash shuffle (reproducible
    * across runs and engines — the "shuffle with a receipt" a data card
    * can cite). The hash order statistically interleaves sources — the
    * property (no long single-source runs) QueriesSpec pins on the
    * fixture — and the POSITION assignment is the honest 100 TB part:
    * a naive row_number over the full corpus is a single-reducer global
    * sort, so positions come from c17's two-phase distributed prefix
    * scan instead (range-partition on the hash key, per-partition counts
    * to the driver, broadcast offsets, within-partition window),
    * plan-pinned pid-keyed with the single-reducer degeneration asserted
    * absent. Pure integer arithmetic -> hash-green.
    */
  def c28_training_order(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables.documents(s, d).select(col("doc_id"), col("source"))
      .withColumn("k",
        expr("((doc_id % 1000003) * 2654435761 + 40503) % 1000000007"))
      .repartitionByRange(32, col("k"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical in both passes
    val subtotals = keyed.groupBy(col("pid"))
      .agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val offDf = s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off")
    val w = Window.partitionBy(col("pid")).orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offDf), "pid")
      .withColumn("position", col("off") + count(lit(1)).over(w) - 1)
      .select(col("position"), col("doc_id"), col("source"))
  }

  /** c29: WATERFILLING mixture allocation — the solver c05/c14/c16 stop
    * short of: distribute a token budget across sources proportionally to
    * a desired weight, but no source can supply more than it HAS; surplus
    * demand redistributes to the others (the classic capped-proportional /
    * water-filling problem every real mixture hits, because targets are
    * set before availability is known). Closed form: sort sources by
    * availability-to-weight ratio ascending — saturation is then a PREFIX
    * — and a source saturates iff avail·(W − SWpre) ≤ w·(B − SApre), an
    * exact cross-multiplied integer test over prefix sums (no float ever
    * decides a branch; the sort key's one division is a deterministic
    * double, ties broken on source). Unsaturated sources split the
    * remaining budget by integer division with c16's largest-remainder
    * repair, so Σ allocation == B EXACTLY (spec-pinned). Weights here are
    * avail² (temperature-2 sharpening — big sources demand
    * super-proportionally, so both branches exercise on near-uniform
    * fixtures). The per-source table is metadata-sized at any corpus
    * scale (the windows run over |sources| rows); the integer products
    * bound at ~5e15 for million-token sources — rescale weights via div
    * before the multiply if sources reach petatoken mass.
    */
  def c29_waterfill_mixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSrc = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("avail"))
      .withColumn("w", col("avail") * col("avail"))
    val tot = perSrc.agg(sum(col("avail")).as("ta"), sum(col("w")).as("tw"))
    val wOrd = Window.orderBy(
      (col("avail").cast("double") / col("w")), col("source"))
    val pre = perSrc.crossJoin(broadcast(tot))
      .withColumn("b", expr("(9 * ta) div 10"))
      .withColumn("sa_pre", coalesce(sum(col("avail")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("sw_pre", coalesce(sum(col("w")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("saturated",
        col("avail") * (col("tw") - col("sw_pre")) <=
          col("w") * (col("b") - col("sa_pre")))
      .localCheckpoint() // feeds the residual aggregate AND the final select
    val rem = pre.agg(
      (first(col("b")) - sum(when(col("saturated"), col("avail")).otherwise(0L)))
        .as("b_rem"),
      sum(when(!col("saturated"), col("w")).otherwise(0L)).as("w_rem"))
    val wRem = Window.orderBy(col("lr_rem").desc, col("source"))
    val based = pre.crossJoin(broadcast(rem))
      .withColumn("base", when(col("saturated"), col("avail"))
        .otherwise(expr("(b_rem * w) div w_rem")))
      .withColumn("lr_rem", when(col("saturated"), lit(-1L))
        .otherwise(expr("(b_rem * w) % w_rem")))
    based
      .crossJoin(broadcast(based.agg(
        (first(col("b_rem")) -
          sum(when(!col("saturated"), col("base")).otherwise(0L)))
          .as("leftover"))))
      .withColumn("rk", row_number().over(wRem))
      .select(col("source"), col("avail"), col("saturated"),
        (col("base") + when(!col("saturated") && col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("allocation"))
  }

  /** c27: the dataset DATASHEET — "Datasheets for Datasets" (Gebru et
    * al. '18) as a one-scan operator: the per-source statistics bundle a
    * training-data release ships (volume, token mass, language spread,
    * exact-duplicate rate, length profile, short-doc share). Everything
    * reduces in ONE aggregation pass over the corpus scan (count /
    * decimal sum / distinct md5 / conditional count) — at 100 TB this is
    * a single map-side-partial aggregate per source, the same economics
    * as q69's data-quality audit. Duplicate rate via count(distinct
    * md5(text)) is the d01/d02 content-hash criterion folded into the
    * aggregate; mean length rides the DECIMAL(38,6) sum; the short-doc
    * share is an integer per-mille. All hash-green.
    */
  def c27_datasheet(s: SparkSession, d: String): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
    Tables.documents(s, d)
      .withColumn("nt", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"),
        (sum(col("nt").cast(dec6)).cast("double") / count(lit(1)))
          .as("mean_tokens"),
        min(col("nt")).as("min_tokens"), max(col("nt")).as("max_tokens"),
        sum(when(col("nt") < 20, 1L).otherwise(0L)).as("n_short"))
      .withColumn("short_pm", expr("(n_short * 1000) div n_docs"))
  }

  private val BloomBits = 1 << 17 // 131072 bits = 2048 longs = 16 KB
  private val BloomHashes = 3

  /** c26: PERSISTED Bloom decontamination index — c13's bloom pre-probe
    * under s17/d18's build-once / probe-stored economics, completing the
    * persisted-index trilogy (vectors: s17, text LSH: d18, eval grams:
    * c26). The offline build reads the eval suite ONCE and persists two
    * tables under a corpus-identity-keyed dir committed by a `_complete`
    * marker:
    *
    *   {{{<dir>/bloom  (w int, bits long)   — 2048 words of the k=3 filter}}}
    *   {{{<dir>/grams  (ng string)          — the exact distinct eval 13-grams}}}
    *
    * The query path never touches the eval corpus again: the 16 KB bloom
    * loads from the stored words (a 2048-row bounded collect), screens the
    * incoming batch's grams inside the scan stage, and the surviving
    * sliver verifies against the stored exact gram table — so false
    * positives die in a broadcast join against STORED data and the result
    * is exact (shares c09/c13's oracle verbatim). PlanInvariantsSpec pins
    * the probe plan scanning documents.parquet exactly once (the batch
    * side) with the eval side coming only from the store. At 100 TB this
    * is the production decontamination shape: eval suites change rarely,
    * batches arrive daily, and the per-batch cost is one scan + a 16 KB
    * broadcast + a join against a few-hundred-thousand-row gram table.
    */
  private[graft] def ensureBloomIndex(s: SparkSession, d: String): String = {
    val f = new java.io.File(d, "documents.parquet")
    val dir = SketchQueries.partialsDir(
      s"bloom13_v1_${f.length()}_${f.lastModified()}", d)
    if (!new java.io.File(dir, "_complete").exists()) {
      val evalDocs = Tables.documents(s, d)
        .repartition(Tables.scanPartitions(s))
        .filter(col("doc_id") % 19 === 0)
      requireEvalBounded(evalDocs)
      val evalGrams = grams13(evalDocs, "doc_id").select(col("ng")).distinct()
        .localCheckpoint() // one gram pass feeds both stored tables
      evalGrams
        .select(explode(array((0 until BloomHashes).map(j =>
          pmod(xxhash64(lit(j), col("ng")), lit(BloomBits.toLong))): _*)).as("p"))
        .groupBy(expr("cast(p div 64 as int)").as("w"))
        .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("bits"))
        .write.mode("overwrite").parquet(s"$dir/bloom")
      evalGrams.write.mode("overwrite").parquet(s"$dir/grams")
      new java.io.File(dir, "_complete").createNewFile()
    }
    dir
  }

  /** The probe half over an arbitrary batch frame — the stored bloom
    * screens in the scan, the stored exact grams settle the survivors.
    */
  private[graft] def probeBloomIndex(
      s: SparkSession, batchDocs: DataFrame, dir: String): DataFrame = {
    val words = new Array[Long](BloomBits / 64)
    s.read.parquet(s"$dir/bloom").collect() // <= 2048 rows by construction
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    val bloomLit = typedLit(words.toSeq)
    val withPos = (0 until BloomHashes).foldLeft(
        grams13(batchDocs, "doc_id").withColumn("bf", bloomLit)) {
      (df, j) => df.withColumn(s"p$j",
        pmod(xxhash64(lit(j), col("ng")), lit(BloomBits.toLong)))
    }
    withPos
      .filter((0 until BloomHashes).map(j => expr(
        s"(element_at(bf, cast(p$j div 64 as int) + 1)" +
          s" & shiftleft(1L, cast(p$j % 64 as int))) != 0L"))
        .reduce(_ && _))
      .select(col("doc_id"), col("ng"))
      .join(broadcast(s.read.parquet(s"$dir/grams")), "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_ngrams"))
  }

  def c26_persisted_bloom(s: SparkSession, d: String): DataFrame = {
    val dir = ensureBloomIndex(s, d)
    probeBloomIndex(s,
      Tables.documents(s, d)
        .repartition(Tables.scanPartitions(s))
        .filter(col("doc_id") % 19 =!= 0), dir)
  }

  /** Largest-remainder apportionment of an exact token budget across
    * strata — c05 rebalances by proportion and c14 by temperature, but a
    * real sampling job needs INTEGER per-stratum quotas that sum EXACTLY
    * to the budget (naive rounding drifts by up to |strata| tokens).
    * Hamilton's method: integer base quota per stratum, then the leftover
    * units go to the largest remainders (lang tie-break). Pure integer
    * arithmetic over a 1-row broadcast total -> hash-green; the rank
    * window runs over |strata| rows only.
    */
  def c16_token_apportion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 100000L
    val lt = Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
    val withQuota = lt
      .crossJoin(broadcast(lt.agg(sum(col("n_tokens")).as("tot"))))
      .withColumn("base", expr(s"(${budget}L * n_tokens) div tot"))
      .withColumn("rem", expr(s"(${budget}L * n_tokens) % tot"))
    withQuota
      .crossJoin(broadcast(
        withQuota.agg((lit(budget) - sum(col("base"))).as("leftover"))))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
      .select(col("lang"), col("n_tokens"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /** PPS (probability-proportional-to-size) systematic weighted sampling —
    * the survey-sampling classic a mixture pipeline uses to draw documents
    * with probability ∝ size (chars here; tokens in production) without
    * any per-row randomness: lay the docs on the cumulative-weight line in
    * doc_id order and take one at every W/n-th position (a doc is chosen
    * iff its weight span crosses a grid boundary — pure integer div, so
    * the sample hash-checks cross-engine).
    *
    * The interesting part at 100 TB is the EXACT GLOBAL PREFIX SUM: the
    * naive formulation is one unpartitioned running-sum window (a single
    * reducer over the corpus — the thing this repo pins against). Here it
    * is the standard two-phase distributed scan: range-partition by the
    * order key, per-partition subtotals to the driver (one row per
    * partition — driver-tiny like KMeans' centroids), broadcast the
    * partition-offset table back, and run the running sum INSIDE each
    * partition (32-way parallel window keyed by pid). Range partitioning
    * preserves the global order, so offset + local running sum == the
    * global cumulative weight exactly, whatever the boundary placement.
    */
  def c17_weighted_sample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = 200L
    val ranged = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .repartitionByRange(32, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical in both passes
    val subtotals = ranged.groupBy(col("pid"))
      .agg(sum(col("n_chars")).as("psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val total = offsets.last
    val offDf = s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off")
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), "pid")
      .withColumn("cum", col("off") + sum(col("n_chars")).over(w))
      .filter(expr(s"(cum * ${n}L) div ${total}L > ((cum - n_chars) * ${n}L) div ${total}L"))
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"), col("cum"))
  }

  /** c22: the full preprocessing RECIPE as one operator — normalize →
    * exact-dedup → decontaminate, chained the way a real corpus build
    * runs them, with the final rewritten text hash-checked end to end.
    * This is the composability claim made concrete: stage 1 is t14's
    * C4-style rewrite (drop <20 clean chars), stage 2 is d01's exact
    * dedup ON THE REWRITTEN text (normalize-then-dedup collapses docs
    * that differed only in case/punctuation — ordering the stages the
    * other way misses them), stage 3 is c09's 13-gram eval-set
    * decontamination on the deduped survivors. Per-stage scale stories
    * carry over unchanged (scan-local rewrite; hash-agg dedup; broadcast
    * gram probe): chaining adds ONE localCheckpoint so the normalize pass
    * feeds all three consumers without recompute. Output is the
    * surviving (doc_id, lang, n_tokens, cleaned) — the frame a tokenizer
    * would consume next.
    */
  def c22_preprocess_recipe(s: SparkSession, d: String): DataFrame =
    preprocessRecipe(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** The recipe over any (doc_id, lang, text) frame — QueriesSpec drives
    * it with a planted corpus where every stage provably bites (the sf
    * fixture's texts are all distinct post-normalize, so the dedup stage
    * is exercised by the plant, not fixture luck).
    */
  private[graft] def preprocessRecipe(docsIn: DataFrame): DataFrame = {
    val cleaned = docsIn
      .withColumn("text", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 .,]", " "),
        " {2,}", " ")))
      .filter(length(col("text")) >= 20)
      .select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint() // one normalize pass feeds dedup + both gram sides
    val keep = cleaned.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = cleaned.join(keep, Seq("text", "doc_id"))
    val corpus = deduped.filter(col("doc_id") % 19 =!= 0)
    val evalDocs = cleaned.filter(col("doc_id") % 19 === 0)
    requireEvalBounded(evalDocs)
    val evalG = grams13(evalDocs).select(col("ng")).distinct()
    val contaminated = grams13(corpus, "doc_id")
      .join(broadcast(evalG), "ng")
      .select(col("doc_id")).distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("text").as("cleaned"))
  }

  /** Number of greedy exemplar picks and the candidate pool bound for
    * c30 (candidates = vec_id < [[C30Cands]] — a fixed serving-sized pool,
    * the shape any coreset selector uses so the per-round gain aggregate
    * is |corpus| x |pool|, never |corpus|²).
    */
  private val C30K = 5
  private val C30Cands = 32

  /** c30: EXEMPLAR (coreset) selection by greedy facility location — the
    * "pick k representative documents" curation step (active-learning
    * seeds, few-shot exemplar pools, dataset cards): maximize
    *
    *   {{{F(S) = sum_v max(0, max_{c in S} sim(v, c))}}}
    *
    * the classic monotone-submodular objective whose greedy optimizer
    * carries the Nemhauser 1-1/e guarantee. Determinism: similarities
    * quantize ONCE to integer micro-units (round agrees across engines —
    * the s07 playbook), so every coverage sum is exact int64 arithmetic
    * and the argmax (total desc, then candidate id) is a full order —
    * the whole greedy trajectory hash-checks against a DuckDB oracle
    * unrolling the same five rounds. Scale shape: the sims frame is one
    * corpus scan against the broadcast 32-candidate pool (checkpointed —
    * all rounds reuse it); each round is one keyed join + hash aggregate
    * over |corpus| x |pool| rows plus a 1-row argmax collect (k-bounded
    * driver traffic); the cover vector is corpus-sized but only ever
    * joined by key, never collected.
    */
  def c30_exemplar_selection(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.cosine_similarity
    val e = Tables.embeddings(s, d)
    val cand = e.filter(col("vec_id") < C30Cands)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val simsQ = e.crossJoin(broadcast(cand))
      .select(col("vec_id").as("v"), col("c_id"),
        (round(cosine_similarity(col("embedding"), col("c_emb")) * 1000000)
          .cast("long")).as("sim"))
      .localCheckpoint()
    var cover = simsQ.select(col("v")).distinct().withColumn("cov", lit(0L))
    var picked = List.empty[(Long, Long, Long)] // (rank, c_id, coverage)
    for (k <- 1 to C30K) {
      val gains = simsQ
        .filter(!col("c_id").isin(picked.map(_._2): _*))
        .join(cover, "v")
        .groupBy(col("c_id"))
        .agg(sum(greatest(col("sim"), col("cov"))).as("total"))
      val best = gains.orderBy(col("total").desc, col("c_id")).limit(1)
        .collect().head // 1 row per round: k-bounded driver traffic
      val (cId, total) = (best.getLong(0), best.getLong(1))
      picked ::= ((k.toLong, cId, total))
      cover = simsQ.filter(col("c_id") === cId)
        .join(cover, "v")
        .select(col("v"), greatest(col("sim"), col("cov")).as("cov"))
        .localCheckpoint()
    }
    import s.implicits._
    picked.reverse.toDF("rank", "c_id", "coverage_micro")
  }

  /** c31: PADDING-WASTE sweep over length-bucket counts — the tuning
    * table behind bucketed batching (c07 packs greedily; serving and
    * many training stacks instead pad each sequence to its bucket's
    * upper bound, and the operational question is "how many buckets
    * until padding stops mattering"): for B in 1/2/4/8/16 static
    * equi-width buckets over a 128-token cap, every document pads to its
    * bucket boundary and the sweep reports wasted vs useful tokens in
    * integer per-mille. One token-length scan crossed with the 5-row
    * broadcast spine, then a 5-group aggregate — all integers ->
    * hash-green; QueriesSpec pins the curve monotone (more buckets never
    * wastes more).
    */
  def c31_padding_sweep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(least(size(split(col("text"), " ")).cast("long"), lit(128L))
        .as("len"))
    docs.crossJoin(broadcast(Seq(1, 2, 4, 8, 16).toDF("n_buckets")))
      .withColumn("width", expr("128 div n_buckets"))
      .withColumn("ub", expr("(((len - 1) div width) + 1) * width"))
      .groupBy(col("n_buckets"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("useful_tokens"),
        sum(expr("ub - len")).as("padding_tokens"))
      .withColumn("waste_pm", expr("(padding_tokens * 1000) div useful_tokens"))
  }

  /** c32: tokenizer FERTILITY audit — the per-language tokenizer-equity
    * readout every multilingual pipeline publishes (a language whose
    * words shatter into many pieces pays more sequence budget for the
    * same content, trains worse, and costs more to serve): per language,
    * pieces per 1000 whitespace words (fertility) and chars per 1000
    * pieces (compression) under t10's real rank-ordered BPE — not a
    * whitespace estimate. One zero-shuffle tokenize pass (the merge
    * table is compiled constants), one map-side aggregate; integer
    * per-mille ratios → hash-green against DuckDB running the identical
    * merge chain.
    */
  def c32_tokenizer_fertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("pieces",
        size(TextQueries.bpePieces(col("text"))).cast("long"))
      .withColumn("words", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(col("pieces")).as("n_pieces"),
        sum(col("words")).as("n_words"))
      .withColumn("fertility_pm", expr("(n_pieces * 1000) div n_words"))
      .withColumn("chars_per_1000_pieces", expr("(n_chars * 1000) div n_pieces"))

  /** c33: the full training-data ASSEMBLY — c22's preprocess recipe
    * (normalize → exact-dedup-on-the-rewrite → 13-gram decontaminate)
    * extended with the two remaining production stages so ONE operator
    * emits the ordered manifest a trainer actually consumes: a quality
    * GATE (≥10 tokens and ≥20% distinct-token ratio — the integer-exact
    * repetition screen; degenerate "spam spam spam" docs fail it) and
    * c28's deterministic seedless INTERLEAVE (Knuth-hash scramble +
    * exact global positions from the two-phase distributed prefix scan).
    * Every stage is the already-oracle-checked building block — the
    * point of this row is that the COMPOSITION is itself hash-green end
    * to end, the "could a reference user run their whole pipeline"
    * claim made checkable. Scale: each stage inherits its component's
    * audit (normalize scan-bound, dedup hash-agg, decont broadcast
    * probe, gate scan-bound, order two-phase).
    */
  def c33_assembly(s: SparkSession, d: String): DataFrame =
    assemble(s, Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** The assembly over any (doc_id, lang, text) frame — QueriesSpec
    * drives it with a planted corpus where the quality gate provably
    * bites (a degenerate repeated-token doc survives c22's stages but
    * fails the distinct-ratio rule; a short doc fails the token floor).
    */
  private[graft] def assemble(s: SparkSession, docsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rec = preprocessRecipe(docsIn)
    val gated = rec
      .withColumn("n_distinct",
        size(array_distinct(split(col("cleaned"), " "))).cast("long"))
      .filter(col("n_tokens") >= 10 &&
        col("n_distinct") * 1000 >= col("n_tokens") * 200)
    val keyed = gated
      .withColumn("k",
        expr("((doc_id % 1000003) * 2654435761 + 40503) % 1000000007"))
      .repartitionByRange(32, col("k"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical in both passes
    val subtotals = keyed.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val offDf = s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off")
    val w = Window.partitionBy(col("pid")).orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offDf), "pid")
      .withColumn("position", col("off") + count(lit(1)).over(w) - 1)
      .select(col("position"), col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** c34: SPLIT-BALANCE audit — the covariate-shift check run BEFORE
    * trusting any eval number: c03's seedless hash split is unbiased by
    * construction, but "unbiased" is a claim about expectation, and a
    * finite corpus can still deal an unlucky language mix into val/test.
    * This measures it: per-language counts per split, per-mille shares,
    * and the q119 PSI between train and each eval split (same 9dp-ln +
    * decimal-sum discipline, keyed per split pair) — PSI > 0.1 means the
    * eval set is distributionally stale before a single model run.
    * Inner-join semantics: languages present in both sides (a language
    * MISSING from one side is c15/c23's leakage-family problem, not a
    * drift number). All corpus-sized work is one hash + one count
    * aggregate; everything after runs on |splits|×|langs| rows.
    */
  private def c34Sql(div: String): String = {
    def side(pair: String, a: String, b: String) =
      s"""SELECT '$pair' AS pair, a.lang, a.n AS n_a, b.n AS n_b,
         |       ta.t AS t_a, tb.t AS t_b
         |FROM cnt a JOIN cnt b ON b.lang = a.lang
         |  AND a.split = '$a' AND b.split = '$b'
         |JOIN tot ta ON ta.split = '$a'
         |JOIN tot tb ON tb.split = '$b'""".stripMargin
    s"""WITH h AS (
       |  SELECT lang, ((doc_id % 1000003) * 2654435761 + 97) % 1000 AS h
       |  FROM documents),
       |sp AS (
       |  SELECT lang, CASE WHEN h < 800 THEN 'train'
       |                    WHEN h < 900 THEN 'val' ELSE 'test' END AS split
       |  FROM h),
       |cnt AS (SELECT split, lang, CAST(count(*) AS BIGINT) AS n
       |        FROM sp GROUP BY 1, 2),
       |tot AS (SELECT split, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
       |pairs AS (
       |${side("train_vs_val", "train", "val")}
       |UNION ALL
       |${side("train_vs_test", "train", "test")}),
       |c AS (
       |  SELECT pair, lang, n_a, n_b,
       |         (n_a * 1000) $div t_a AS a_pm,
       |         (n_b * 1000) $div t_b AS b_pm,
       |         CAST(round(
       |           (CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE)
       |            - CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE))
       |           * round(ln((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE))
       |                      / (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE))), 9),
       |           9) AS DECIMAL(20,9)) AS psi_part
       |  FROM pairs)
       |SELECT pair, lang, n_a, n_b, a_pm, b_pm,
       |       CAST(psi_part AS DOUBLE) AS psi_part,
       |       CAST(CAST(sum(psi_part) OVER (PARTITION BY pair) AS DECIMAL(38,9))
       |            AS DOUBLE) AS psi_total
       |FROM c""".stripMargin
  }

  def c34_split_balance(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(c34Sql("div"))
  }

  /** The audit over whatever `documents` view is registered — split out
    * so the spec can plant an identical-mix control that must read zero.
    */
  private[graft] def splitBalanceFromViews(s: SparkSession): DataFrame =
    s.sql(c34Sql("div"))

  /** c35: MIXTURE DRIFT under dedup — the audit c05/c14/c16 all assume
    * away: mixture weights are set on the RAW corpus, but exact dedup
    * strikes different sources unevenly (a crawl with 40% boilerplate
    * dupes shrinks; a curated source doesn't), so the REALIZED training
    * mixture drifts from the plan the moment d01/d02 runs. Per source:
    * raw vs post-dedup docs and tokens (keep-smallest-doc_id policy, the
    * d02 rule), per-mille shares of each pool, and the signed drift —
    * the number that says "your 20% code split is actually 26% now".
    * One md5 aggregate + one keyed semi-join + two count aggregates; all
    * integers → hash-green with identical SQL text.
    */
  private def c35Sql(div: String): String =
    s"""WITH keep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |per_doc AS (
       |  SELECT d.doc_id, d.source,
       |         CAST(length(d.text) - length(replace(d.text, ' ', '')) + 1
       |              AS BIGINT) AS n_toks,
       |         CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS kept
       |  FROM documents d LEFT JOIN keep k ON k.doc_id = d.doc_id),
       |agg AS (
       |  SELECT source,
       |         CAST(count(*) AS BIGINT) AS raw_docs,
       |         CAST(sum(n_toks) AS BIGINT) AS raw_toks,
       |         CAST(sum(kept) AS BIGINT) AS kept_docs,
       |         CAST(sum(kept * n_toks) AS BIGINT) AS kept_toks
       |  FROM per_doc GROUP BY source),
       |tot AS (
       |  SELECT CAST(sum(raw_toks) AS BIGINT) AS tot_raw,
       |         CAST(sum(kept_toks) AS BIGINT) AS tot_kept
       |  FROM agg)
       |SELECT source, raw_docs, kept_docs, raw_toks, kept_toks,
       |       (raw_toks * 1000) $div tot_raw AS raw_share_pm,
       |       (kept_toks * 1000) $div tot_kept AS kept_share_pm,
       |       (kept_toks * 1000) $div tot_kept
       |         - (raw_toks * 1000) $div tot_raw AS drift_pm
       |FROM agg CROSS JOIN tot""".stripMargin

  def c35_mixture_drift(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(c35Sql("div"))
  }

  /** c36: SEMANTIC decontamination — the embedding-space complement of
    * the n-gram family (c08/c09/c13): an eval item leaks into training
    * data through paraphrase with zero 13-gram overlap, so modern
    * contamination audits ALSO screen by embedding similarity. Shape:
    * the eval side is k-bounded and asserted so before use
    * ([[requireEvalBounded]]'s contract — here a 50-vector slice of the
    * fixture entering through the same parameterized seam), broadcast
    * against ONE corpus scan scored by the native sequential-double
    * cosine kernel; every (corpus, eval) pair at sim >= 0.35 is flagged
    * with its best-matching eval item. The threshold is corpus-tuned
    * (max cross-sim in the synthetic fixture is 0.49); real deployments
    * sweep it against c24's filter-sweep harness. Hash-green: the
    * kernel's fold is bit-identical to the DuckDB twin (s01's proven
    * parity). At 100 TB: broadcast-eval × one scan — c13's economics
    * with vectors instead of grams.
    */
  def c36_decontaminate_semantic(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.cosine_similarity
    val emb = Tables.embeddings(s, d)
    decontaminateSemantic(s,
      emb.filter(col("vec_id") >= 50),
      emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("eval_id"), col("embedding").as("eval_emb")))
  }

  /** The parameterized core — corpus frame × independent eval frame. */
  private[graft] def decontaminateSemantic(s: SparkSession,
      corpus: DataFrame, evalSide: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.cosine_similarity
    requireEvalBounded(evalSide)
    corpus.join(broadcast(evalSide))
      .select(col("vec_id").as("corpus_vec"), col("eval_id"),
        cosine_similarity(col("embedding"), col("eval_emb")).as("sim"))
      .filter(col("sim") >= 0.35)
  }

  /** c37: the CONTAMINATION PANEL — one eval identity (id % 19 = 0),
    * BOTH screens, one verdict per corpus document: exact 13-gram
    * collisions (c09's screen) and embedding similarity (c36's screen,
    * vec_id ≡ doc_id — d15's modeling) left-joined onto the corpus with
    * a 'both'/'ngram'/'semantic'/'clean' verdict. This is the report a
    * contamination audit actually ships: the union matters (paraphrase
    * leaks have zero 13-gram overlap; verbatim leaks of rare strings can
    * sit far apart in embedding space), and per-method hit counts say
    * WHY each doc was flagged. Shape: the two screens' own plans
    * (broadcast eval side each) + two left joins on the doc key —
    * scan-bound at any corpus size.
    */
  def c37_contamination_panel(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .localCheckpoint()
    val corpus = docs.filter(col("doc_id") % 19 =!= 0)
    val ngram = decontaminateExact(corpus, docs.filter(col("doc_id") % 19 === 0))
      .select(col("doc_id"), col("n_hit_ngrams").as("ngram_hits"))
    val emb = Tables.embeddings(s, d)
    val sem = decontaminateSemantic(s,
        emb.filter(col("vec_id") % 19 =!= 0),
        emb.filter(col("vec_id") % 19 === 0)
          .select(col("vec_id").as("eval_id"), col("embedding").as("eval_emb")))
      .groupBy(col("corpus_vec").as("doc_id"))
      .agg(count(lit(1)).as("semantic_hits"))
    corpus.select(col("doc_id"), col("lang"))
      .join(ngram, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("ngram_hits"), lit(0L)).as("ngram_hits"),
        coalesce(col("semantic_hits"), lit(0L)).as("semantic_hits"),
        when(col("ngram_hits").isNotNull && col("semantic_hits").isNotNull, "both")
          .when(col("ngram_hits").isNotNull, "ngram")
          .when(col("semantic_hits").isNotNull, "semantic")
          .otherwise("clean").as("verdict"))
  }

  /** c38: WATERFILLING budget allocation — the mixture-planning step
    * c16's apportionment cannot express: c16 splits a budget by quota
    * alone, but real sources have CAPS (a 2%-of-web source cannot supply
    * a 20% share), and the standard fix is iterative waterfilling —
    * allocate proportionally among UNCAPPED sources, cap out the ones
    * that fill, re-spread the shortfall over the rest. Three unrolled
    * rounds (equal weights over 20 sources converge in 2; the third
    * proves the fixpoint), every round = one |sources|-row state CTE +
    * one global (active count, remaining) aggregate — metadata-sized at
    * any corpus scale; the only corpus pass is the per-source avail
    * aggregate. Budget = 90% of total corpus chars (sweep-chosen so the fixture's
    * smallest sources genuinely CAP and their shortfall spreads — at 60%
    * the near-uniform fixture never exercises the redistribution);
    * floor division
    * leaves an explicit integer `unallocated` residual column rather
    * than hiding rounding. All int64 → hash-green with the identical
    * unrolled SQL on both engines.
    */
  private def c38Sql(div: String): String = {
    val rounds = (1 to 3).map { r =>
      s"""a$r AS (
         |  SELECT source, avail, alloc,
         |         CASE WHEN alloc < avail THEN 1 ELSE 0 END AS active
         |  FROM s${r - 1}),
         |g$r AS (
         |  SELECT CAST(sum(active) AS BIGINT) AS na,
         |         (SELECT budget FROM b) - CAST(sum(alloc) AS BIGINT)
         |           AS remaining
         |  FROM a$r),
         |s$r AS (
         |  SELECT a.source, a.avail,
         |         a.alloc + CASE WHEN a.active = 1 AND g.na > 0
         |                        THEN least(a.avail - a.alloc,
         |                                   g.remaining $div g.na)
         |                        ELSE 0 END AS alloc
         |  FROM a$r a CROSS JOIN g$r g)""".stripMargin
    }.mkString(",\n")
    s"""WITH src AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
       |  FROM documents GROUP BY source),
       |b AS (SELECT CAST(sum(avail) * 9 $div 10 AS BIGINT) AS budget FROM src),
       |s0 AS (SELECT source, avail, CAST(0 AS BIGINT) AS alloc FROM src),
       |$rounds,
       |res AS (
       |  SELECT (SELECT budget FROM b) - CAST(sum(alloc) AS BIGINT)
       |           AS unallocated
       |  FROM s3)
       |SELECT f.source, f.avail, f.alloc,
       |       (f.alloc = f.avail) AS capped,
       |       r.unallocated
       |FROM s3 f CROSS JOIN res r""".stripMargin
  }

  def c38_waterfill_budget(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    waterfillFromView(s)
  }

  /** The allocation over whatever `documents` view is registered — split
    * out so the spec can plant a capping structure with a hand-computed
    * fixpoint.
    */
  private[graft] def waterfillFromView(s: SparkSession): DataFrame =
    s.sql(c38Sql("div"))

  /** c39: PERSISTED-MODEL corpus filter — the production lifecycle of
    * t36's trained quality classifier: train ONCE into a marker-committed
    * model store ([[TextQueries.ensureRocchioModel]] — the
    * s17/t24/d18/CoGraph recipe applied to a model), then APPLY the
    * stored 33 numbers as a corpus filter with per-source keep
    * accounting (the "what did the filter do to my mixture" audit every
    * quality-filtered pretraining corpus publishes). The apply path
    * featurizes and scores in one broadcast join + keyed agg and NEVER
    * re-runs the training reduce; the DuckDB oracle RETRAINS inline from
    * scratch, so the hash gate cross-checks the stored model's
    * losslessness on every run. Docs with no tokens score null and are
    * dropped (never silently kept) in both engines.
    */
  def c39_persisted_model_apply(s: SparkSession, d: String): DataFrame = {
    val dir = TextQueries.ensureRocchioModel(s, d)
    val model = s.read.parquet(s"$dir/model")
    val theta2 = model.filter(col("dim") === -1L)
      .collect()(0).getAs[Long]("wt")
    val wDf = broadcast(model.filter(col("dim") >= 0))
    val (_, feats) = TextQueries.rocchioFeatures(s, d)
    val scored = feats.join(wDf, "dim")
      .groupBy(col("doc_id")).agg(sum(col("wt") * col("pm")).as("score"))
    Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") * 2000 > theta2, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("keep_pm", expr("(n_kept * 1000) div n_docs"))
  }

  /** c40: post-FILTER mixture repair — c35's drift audit pointed at the
    * LEARNED filter instead of dedup, closed with the repair number: a
    * quality filter strikes sources unevenly (boilerplate-heavy crawls
    * lose more than curated text), so the surviving token mixture drifts
    * from the plan; per source this emits before/after token pools,
    * per-mille shares of each, and the resampling CORRECTION factor
    * (share_before/share_after, per-mille) a loader multiplies into its
    * sampling rate to restore the planned mixture — c23's split-repair
    * idea applied to mixtures. Keep decisions come from the STORED
    * Rocchio model (c39's store); the oracle retrains inline, so model
    * persistence is cross-checked here too. Null-scoring docs (no
    * tokens) count as dropped in both engines. Shape: one feature scan +
    * broadcast-model join, two keyed aggregates, one broadcast-scalar
    * total.
    */
  def c40_filter_mixture_repair(s: SparkSession, d: String): DataFrame = {
    val dir = TextQueries.ensureRocchioModel(s, d)
    val model = s.read.parquet(s"$dir/model")
    val theta2 = model.filter(col("dim") === -1L)
      .collect()(0).getAs[Long]("wt")
    val wDf = broadcast(model.filter(col("dim") >= 0))
    val (_, feats) = TextQueries.rocchioFeatures(s, d)
    val scored = feats.join(wDf, "dim")
      .groupBy(col("doc_id")).agg(sum(col("wt") * col("pm")).as("score"))
    val per = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)")
          .as("n_toks"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("kept", when(col("score") * 2000 > theta2, 1L).otherwise(0L))
    val agg = per.groupBy(col("source"))
      .agg(sum(col("n_toks")).as("toks_before"),
        sum(col("kept") * col("n_toks")).as("toks_after"))
    val tot = agg.agg(sum(col("toks_before")).as("tb"),
      sum(col("toks_after")).as("ta"))
    agg.crossJoin(broadcast(tot))
      .select(col("source"), col("toks_before"), col("toks_after"),
        expr("(toks_before * 1000) div tb").as("share_before_pm"),
        expr("(toks_after * 1000) div greatest(ta, 1)").as("share_after_pm"))
      .withColumn("correction_pm",
        expr("(share_before_pm * 1000) div greatest(share_after_pm, 1)"))
  }

  /** c41: the mixture a pipeline ACTUALLY trains on — c14's temperature
    * weights computed over d33's soft-dedup EFFECTIVE tokens instead of
    * raw counts. Boilerplate-heavy sources lose mixture share exactly in
    * proportion to how much of their mass is repeated (raw-token mixtures
    * over-sample them; the d33 reweighting corrects the denominator
    * before the sqrt-temperature flattening). Composition is the point:
    * the d33 stage is reused verbatim, so the hash gate checks the whole
    * two-stage pipeline end-to-end, same discipline as c33's assembly.
    * One extra keyed rollup over d33's 5-source output — the gram pass
    * dominates and is paid once.
    */
  def c41_softdedup_mixture(s: SparkSession, d: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val st = DedupQueries.d33_soft_dedup(s, d)
      .select(col("source"), col("eff_tokens"))
      .withColumn("sq", round(sqrt(col("eff_tokens")), 9).cast(dec9))
    val tot = st.agg(sum(col("sq")).cast("double").as("t"))
    st.crossJoin(broadcast(tot))
      .withColumn("weight", round(col("sq").cast("double") / col("t"), 9))
      .select(col("source"), col("eff_tokens"), col("weight"),
        round(lit(100000) * col("weight"), 9).as("expected_tokens"))
  }

  /** c42: REJECTION SAMPLING to a target length distribution — the
    * distribution-matching gate (balance a corpus whose length histogram
    * is lopsided toward a uniform target before packing, so no length
    * bucket dominates the curriculum): per length octile (n_tokens DIV
    * 32, capped at 7), the acceptance rate that maps the ACTUAL histogram
    * onto the uniform TARGET while keeping as much data as possible —
    * with a uniform target that is accept_pm = 1000·min_bucket_count /
    * bucket_count (the scarcest bucket keeps everything, every other
    * bucket thins to match it). Acceptance itself is the c03
    * multiplicative doc_id hash against the per-bucket per-mille gate —
    * no RNG state, so accepted counts and token mass hash-check.
    * Shape: one tokenize scan → 8-row census → broadcast min → one
    * hash-filter pass; the decision table is metadata-sized at any scale.
    */
  def c42_rejection_to_target(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", least(expr("n_tokens DIV 32"), lit(7L)))
      .localCheckpoint() // census + filter pass share one tokenize
    val census = docs.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val minDf = census.agg(min(col("n_docs")).as("n_min"))
    docs.join(broadcast(census), "bucket")
      .crossJoin(broadcast(minDf))
      .withColumn("accept_pm", expr("n_min * 1000 DIV n_docs"))
      .withColumn("accepted",
        (hashCol(col("doc_id"), 733L, 1000L) < col("accept_pm"))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(max(col("n_docs")).as("n_docs"), // constant within bucket
        max(col("accept_pm")).as("accept_pm"),
        sum(col("accepted")).as("n_accepted"),
        sum(col("accepted") * col("n_tokens")).as("accepted_tokens"))
  }

  /** c43: decontamination CANARY recall — the validation every decontam
    * deployment owes itself (the practice behind published canary GUIDs:
    * plant known sentinel strings, then prove the pipeline would catch
    * them): ten 15-token canaries with globally-unique vocabulary, the
    * even-numbered five COPIED into the training side (the planted leak),
    * the odd five kept clean. Detection is the family's own 13-gram
    * machinery (c08/c09/c13's gram projection, canary grams broadcast,
    * train grams probe map-side). Ground truth is known by construction,
    * so the output is the 2×2 audit: every leak must land `caught_leak`
    * and every clean canary `clean_pass` — `missed_leak` (a false
    * negative: the decontam screen has a hole) and `false_flag` (gram
    * collision with real text) rows are defects the hash gate AND the
    * spec both surface.
    */
  def c43_canary_recall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val canaries = (0L until 10L).map { k =>
      (k, k % 2 == 0,
        (0 until 15).map(j => s"c${k}canary$j").mkString(" "))
    }.toDF("canary_id", "leaked", "text")
    val train = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(canaries.filter(col("leaked"))
        .select((col("canary_id") + 2000000L).as("doc_id"), col("text")))
    val canaryGrams = grams13(
      canaries.select(col("canary_id").as("doc_id"), col("text")), "doc_id")
      .select(col("doc_id").as("canary_id"), col("ng"))
    val det = grams13(train, "doc_id")
      .join(broadcast(canaryGrams), "ng")
      .groupBy(col("canary_id"))
      .agg(countDistinct(col("doc_id")).as("n_hit_docs"))
    canaries.join(det, Seq("canary_id"), "left")
      .select(col("canary_id"), col("leaked").cast("long").as("leaked"),
        coalesce(col("n_hit_docs"), lit(0L)).as("n_hit_docs"),
        when(col("leaked") && coalesce(col("n_hit_docs"), lit(0L)) > 0,
          "caught_leak")
          .when(col("leaked"), "missed_leak")
          .when(coalesce(col("n_hit_docs"), lit(0L)) > 0, "false_flag")
          .otherwise("clean_pass").as("verdict"))
  }

  /** c44: corpus RELEASE DIFF — the delta datasheet every corpus version
    * ships beside itself (what changed since v1: how many documents were
    * added, removed, edited, and what happened to the token mass, per
    * source) — q93's CDC snapshot-diff discipline applied to the corpus
    * itself. Versions are derived deterministically (v1 drops doc_id ≡ 0
    * mod 17 — "added later"; v2 drops ≡ 3 mod 19 — "removed" — and
    * appends an edit marker to ≡ 0 mod 13 — "modified"); classification
    * is one full outer join on doc_id with text equality deciding
    * modified vs unchanged, then a keyed per-(source, class) rollup with
    * both versions' token mass and the delta. At 100 TB the join keys on
    * doc_id and the text compare can ride content hashes — same plan.
    */
  def c44_corpus_diff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .localCheckpoint() // both derived versions read one scan
    val v1 = base.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"), col("source").as("src1"),
        col("text").as("t1"), col("n_tokens").as("k1"))
    val v2 = base.filter(col("doc_id") % 19 =!= 3)
      .withColumn("text2",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2edit")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source").as("src2"), col("text2").as("t2"),
        (col("n_tokens") +
          when(col("doc_id") % 13 === 0, 1L).otherwise(0L)).as("k2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .withColumn("source", coalesce(col("src2"), col("src1")))
      .withColumn("class",
        when(col("t1").isNull, "added")
          .when(col("t2").isNull, "removed")
          .when(col("t1") =!= col("t2"), "modified")
          .otherwise("unchanged"))
      .groupBy(col("source"), col("class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("k1"), lit(0L))).as("tokens_v1"),
        sum(coalesce(col("k2"), lit(0L))).as("tokens_v2"))
      .withColumn("token_delta", col("tokens_v2") - col("tokens_v1"))
  }

  /** c45: K-ANONYMITY audit (Sweeney 2002) — the privacy gate a dataset
    * release runs beside t06's PII redaction: redaction strips direct
    * identifiers, but a row can still be re-identified through its
    * QUASI-IDENTIFIER combination. Each customer's QI tuple is audited at
    * three generalization levels — (nation, segment, balance-band),
    * (nation, segment), (segment) — and for each k ∈ {2, 5, 10} the
    * report counts equivalence classes below k and the rows at risk
    * inside them (risk as per-mille of the table). Reading DOWN the
    * levels is the generalization ladder itself: risk falls as the QI
    * coarsens, and the release picks the coarsest level meeting its k
    * target. Scan-bound grouped counts (the class-size frame is
    * |classes| rows, re-aggregated against a 3-literal broadcast k
    * ladder); at 100 TB each level is one map-side-combined groupBy.
    */
  def c45_k_anonymity(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    def classes(level: Int, keys: Seq[Column]): DataFrame =
      c.groupBy(keys: _*).agg(count(lit(1)).as("class_size"))
        .select(lit(level).as("qi_level"), col("class_size"))
    val all = classes(0, Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_kb")))
      .unionByName(classes(1, Seq(col("c_nationkey"), col("c_mktsegment"))))
      .unionByName(classes(2, Seq(col("c_mktsegment"))))
    all.crossJoin(broadcast(
        s.range(1).select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"))))
      .groupBy(col("qi_level"), col("k"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < col("k"), 1L).otherwise(0L))
          .as("classes_below_k"),
        sum(when(col("class_size") < col("k"), col("class_size"))
          .otherwise(0L)).as("rows_at_risk"),
        expr("(sum(CASE WHEN class_size < k THEN class_size ELSE 0 END)" +
          " * 1000) div sum(class_size)").as("risk_pm"))
  }

  /** c46: LEAVE-ONE-OUT SOURCE VALUATION — data valuation made EXACT by
    * the model's algebra: Rocchio's sufficient statistics are sums, so
    * the model trained without source S is (total stats − S's stats),
    * no retraining pass per source (the economics that make per-source
    * ablation feasible at 100 TB: one distributed stats reduce, then
    * |sources|+1 models assembled from ≤ |sources|·2·32 driver-held
    * numbers). Every LOO model is evaluated on the SAME held-out split
    * (h ≥ 800) and reported as balanced accuracy beside its delta vs the
    * full model — delta > 0 means the corpus is better off without the
    * source, the signal a mixture step (c14/c40) consumes. The DuckDB
    * oracle rebuilds every LOO model inline from the same integer
    * arithmetic, so model assembly, scoring, and the verdict all
    * hash-check. Scoring joins the test features against the broadcast
    * (model, dim) weight table once — one pass however many sources.
    */
  def c46_loo_source_value(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (docs, feats) = TextQueries.rocchioFeatures(s, d)
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val featsS = feats.join(src, "doc_id")
    // per-(source, class, dim) train-split sufficient stats — bounded by
    // |sources| * 2 * dims rows at any corpus size
    val sums = featsS.filter(col("h") < 800)
      .groupBy(col("source"), col("y"), col("dim"))
      .agg(sum(col("pm")).as("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val nDocs = docs.join(src, "doc_id").filter(col("h") < 800)
      .groupBy(col("source"), col("y")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sources = nDocs.keys.map(_._1).toSeq.distinct.sorted
    val dims = 0L until TextQueries.RocchioDims.toLong
    def statsFor(excluded: Option[String]): Map[(Long, Long), Long] = {
      val kept = sources.filterNot(excluded.contains)
      val m = scala.collection.mutable.Map[(Long, Long), Long]()
      for (y <- Seq(1L, -1L)) {
        m((y, -2L)) = kept.map(s0 => nDocs.getOrElse((s0, y), 0L)).sum
        for (k <- dims)
          m((y, k)) = kept.map(s0 => sums.getOrElse((s0, y, k), 0L)).sum
      }
      m.toMap
    }
    val models = (sources.map(Option(_)) :+ None).map { ex =>
      val (w, theta2) = TextQueries.rocchioModelFromSums(statsFor(ex))
      (ex.getOrElse("__full__"), w, theta2)
    }
    val wDf = broadcast(models.flatMap { case (name, w, _) =>
      dims.map(k => (name, k, w(k.toInt)))
    }.toDF("model", "dim", "wt"))
    val thetas = models.map { case (name, _, t) => name -> t }.toMap
    val thDf = broadcast(thetas.toSeq.toDF("model", "theta2"))
    val conf = featsS.filter(col("h") >= 800)
      .join(wDf, "dim")
      .groupBy(col("model"), col("doc_id"), col("y"))
      .agg(sum(col("wt") * col("pm")).as("score"))
      .join(thDf, "model")
      .select(col("model"), col("y"),
        when(col("score") * 2000 > col("theta2"), 1L).otherwise(-1L).as("pred"))
      .groupBy(col("model"))
      .agg(
        sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1 && col("y") === -1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("pred") === -1 && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("pred") === -1 && col("y") === -1, 1L).otherwise(0L)).as("tn"))
      .withColumn("balacc_pm", expr(
        "((tp * 1000) div greatest(tp + fn, 1)" +
          " + (tn * 1000) div greatest(fp + tn, 1)) div 2"))
      .collect().map(r => r.getAs[String]("model") -> r.getAs[Long]("balacc_pm"))
      .toMap
    val full = conf("__full__")
    sources.map { s0 =>
      (s0, Seq(1L, -1L).map(y => nDocs.getOrElse((s0, y), 0L)).sum,
        conf(s0), conf(s0) - full)
    }.toDF("source", "n_train", "balacc_pm", "delta_pm")
  }

  /** c47: QUANTILE NORMALIZATION across sources — the cross-source
    * distribution-matching step (microarray's classic, applied to corpus
    * stats): each document's token count is replaced by the POOLED
    * distribution's value at the document's within-source quantile, so
    * every source ends up with the same marginal length distribution
    * while preserving each source's internal ordering — the fair way to
    * compare/mix sources whose length profiles differ (a source of long
    * docs would otherwise dominate any length-gated filter). Mapping is
    * nearest-rank: idx = ⌊(2r−1)(N−1)/(2n_s)⌋, all integer. Both rank
    * passes (global pooled positions, within-source positions) run as
    * m20's two-phase (pid[, source]) prefix scans — no global-sort
    * reducer at any scale; the final step is one keyed join on the
    * pooled index.
    */
  def c47_quantile_normalize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(32, col("n_tokens"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid stable across the subtotal + window passes
    // global pooled positions
    val sub = docs.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = sub.map(_._2).sum
    val offDf = broadcast(sub.map(_._1)
      .zip(sub.map(_._2).scanLeft(0L)(_ + _)).toSeq.toDF("pid", "goff"))
    val wg = Window.partitionBy(col("pid")).orderBy(col("n_tokens"), col("doc_id"))
    val pooled = docs.join(offDf, "pid")
      .withColumn("gpos", col("goff") + row_number().over(wg) - 1)
      .select(col("gpos"), col("n_tokens").as("pooled_tokens"))
    // within-source positions (pid, source) two-phase
    val sub2 = docs.groupBy(col("pid"), col("source"))
      .agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val off2 = sub2.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, o) => (pid, src, o) }
    }
    val srcN = broadcast(sub2.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toSeq.toDF("source", "ns"))
    val off2Df = broadcast(off2.toDF("pid", "source", "soff"))
    val ws = Window.partitionBy(col("pid"), col("source"))
      .orderBy(col("n_tokens"), col("doc_id"))
    docs.join(off2Df, Seq("pid", "source")).join(srcN, "source")
      .withColumn("r", col("soff") + row_number().over(ws))
      .withColumn("gpos", expr(s"((2 * r - 1) * (${n}L - 1)) div (2 * ns)"))
      .join(pooled, "gpos")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("pooled_tokens").as("n_norm"))
  }

  /** c48: CHAT/CONVERSATION ASSEMBLY — the SFT-data prep step that turns a
    * raw interaction log into trainable multi-turn conversations. The event
    * stream is sessionized into conversations (q74's gap rule at a 24-hour
    * threshold — a day of silence closes the conversation),
    * each event is assigned a role (`click`/`view` → user, everything else
    * → assistant) and a deterministic token estimate, then the four
    * normalizations every chat-template pipeline applies run in order:
    *
    *   1. MERGE consecutive same-role messages into one turn (tokens sum,
    *      message count kept) — gaps-and-islands run numbering;
    *   2. TRIM leading assistant turns (a conversation must open with the
    *      user; orphan assistant prefixes are untrainable);
    *   3. TRUNCATE to a token budget keeping the MOST RECENT complete
    *      turns (suffix running sum over a descending window — the
    *      standard "keep the tail that fits the context" rule);
    *   4. RE-TRIM: the kept suffix may now open mid-exchange, so leading
    *      assistant turns are dropped again and turns are re-indexed.
    *
    * Output is one row per kept turn with an `alt_ok` audit column
    * (role == user on odd turn indices) that the pipeline guarantees by
    * construction — the spec pins it all-green, that truncation really
    * bites at sf0.01, and that every conversation's kept tokens fit the
    * budget. Scale: every pass is a window over (user_id[, conv_idx]) —
    * one shuffle key family, no global sort, no driver state; at 100 TB
    * conversations are bounded by the session gap so no partition key is
    * data-sized. Reference scope: §2C extension (the reference has no
    * conversational surface; sessionization semantics shared with q74).
    */
  def c48_chat_assembly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 64L
    val wU = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val runU = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wC = Window.partitionBy(col("user_id"), col("conv_idx"))
      .orderBy(col("us"), col("event_id"))
    val wCR = Window.partitionBy(col("user_id"), col("conv_idx"), col("role"))
      .orderBy(col("us"), col("event_id"))
    val turns = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type").isin("click", "view"), "user")
          .otherwise("assistant").as("role"),
        expr("CAST(length(event_type) AS BIGINT) + CAST(length(props) AS BIGINT) div 4 + 2")
          .as("tok"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(wU).isNull ||
          col("us") - lag(col("us"), 1).over(wU) > 86400000000L, 1L).otherwise(0L))
      .withColumn("conv_idx", sum(col("new_s")).over(runU))
      .withColumn("grp", row_number().over(wC) - row_number().over(wCR))
      .groupBy(col("user_id"), col("conv_idx"), col("role"), col("grp"))
      .agg(sum(col("tok")).as("tokens"), count(lit(1)).as("n_msgs"),
        min(col("us")).as("fus"), min(col("event_id")).as("lead_event_id"))
    val wT = Window.partitionBy(col("user_id"), col("conv_idx"))
      .orderBy(col("fus"), col("lead_event_id"))
    val wAll = Window.partitionBy(col("user_id"), col("conv_idx"))
    val wDesc = Window.partitionBy(col("user_id"), col("conv_idx"))
      .orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT2 = Window.partitionBy(col("user_id"), col("conv_idx"))
      .orderBy(col("turn_idx"))
    turns
      .withColumn("turn_idx", row_number().over(wT).cast("long"))
      .withColumn("first_user",
        min(when(col("role") === "user", col("turn_idx"))).over(wAll))
      .where(col("turn_idx") >= col("first_user"))
      .withColumn("suffix_tokens", sum(col("tokens")).over(wDesc))
      .where(col("suffix_tokens") <= budget)
      .withColumn("first_user2",
        min(when(col("role") === "user", col("turn_idx"))).over(wAll))
      .where(col("turn_idx") >= col("first_user2"))
      .withColumn("turn_out", row_number().over(wT2).cast("long"))
      .withColumn("kept_tokens", sum(col("tokens")).over(wAll))
      .withColumn("alt_ok",
        (col("role") === when(col("turn_out") % 2 === 1, "user")
          .otherwise("assistant")).cast("long"))
      .select(col("user_id"), col("conv_idx"), col("turn_out"), col("role"),
        col("n_msgs"), col("tokens"), col("lead_event_id"),
        col("kept_tokens"), col("alt_ok"))
  }

  /** c49: DROP-LINEAGE attribution — "why is this document not in the
    * training set?", answered per document rather than per stage. t12's
    * funnel reports sequential stage counts; this operator emits, for
    * EVERY doc, the first-failing gate (the sequential verdict), the full
    * independent-failure bitmask (which gates would each reject the doc
    * on their own — the marginal view sequential attribution hides), the
    * failure count, and a `rescuable` flag (fails exactly one gate, so
    * relaxing that single threshold recovers it — the set a threshold
    * tuner looks at first). Gate definitions are t12's, bit-for-bit, so
    * funnel counts and lineage rows reconcile by construction. Pure
    * per-row projection — scan-speed, zero shuffle at any scale.
    */
  def c49_drop_lineage(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nshort",
        expr("size(filter(toks, x -> length(x) <= 2))").cast("long"))
      .withColumn("nstop", expr(
        "size(filter(toks, x -> array_contains(array('the','a','of','and'), x)))")
        .cast("long"))
      .withColumn("ndist", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("b1", (col("nt") < 15).cast("long"))
      .withColumn("b2", (col("nt") > 90).cast("long"))
      .withColumn("b3", (col("nshort") * 100 > col("nt") * 6).cast("long"))
      .withColumn("b4", (col("nstop") * 1000 < col("nt") * 20).cast("long"))
      .withColumn("b5",
        ((col("nt") - col("ndist")) * 100 > col("nt") * 65).cast("long"))
      .withColumn("fail_bits",
        col("b1") + col("b2") * 2 + col("b3") * 4 + col("b4") * 8 + col("b5") * 16)
      .withColumn("n_fails",
        col("b1") + col("b2") + col("b3") + col("b4") + col("b5"))
      .withColumn("verdict",
        when(col("b1") === 1, "r1_too_short")
          .when(col("b2") === 1, "r2_too_long")
          .when(col("b3") === 1, "r3_short_tokens")
          .when(col("b4") === 1, "r4_low_stopword")
          .when(col("b5") === 1, "r5_repetitive")
          .otherwise("z_kept"))
      .withColumn("rescuable", (col("n_fails") === 1).cast("long"))
      .select(col("doc_id"), col("verdict"), col("fail_bits"),
        col("n_fails"), col("rescuable"))

  /** c50: BUDGET SELECTION WITH AN OPTIMALITY CERTIFICATE — token-budget
    * curation (c02's problem) is a knapsack: value = lexical diversity
    * (distinct tokens), weight = token count, capacity = 5 000 tokens.
    * The selector is density-greedy (value-per-token order, the Dantzig
    * rule); the NEW content is the certificate: the LP relaxation's
    * optimum is the greedy prefix value plus the fractional take of the
    * first non-fitting ("critical") item, so `gap_milli = lp_bound −
    * chosen_value` bounds how far ANY selection under this budget could
    * possibly improve on the greedy one — the number that tells a
    * curation owner whether smarter selection is worth building.
    *
    * Scale shape: the density order's running token sum is the c28
    * two-phase distributed prefix scan (range-partition by (−density,
    * doc_id), per-pid window, ≤32 driver subtotals) — never a
    * single-reducer global window; the critical item is a k=1
    * TakeOrdered. All-integer arithmetic (densities and bounds in
    * milli/micro units), so the certificate itself is hash-checked.
    */
  def c50_budget_certificate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 5000L
    val items = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), size(col("toks")).cast("long").as("wt"),
        size(array_distinct(col("toks"))).cast("long").as("value"))
      .withColumn("density", expr("value * 1000000L div wt"))
      .withColumn("nk", -col("density"))
      .repartitionByRange(32, col("nk"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid stable across subtotal + window passes
    val sub = items.groupBy(col("pid")).agg(sum(col("wt")).as("pw"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offDf = broadcast(s.createDataFrame(
      sub.map(_._1).zip(sub.map(_._2).scanLeft(0L)(_ + _)).toSeq)
      .toDF("pid", "off"))
    val w = Window.partitionBy(col("pid")).orderBy(col("nk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = items.join(offDf, "pid")
      .withColumn("cum", col("off") + sum(col("wt")).over(w))
    val chosen = cum.where(col("cum") <= budget)
      .agg(count(lit(1)).as("n_chosen"), sum(col("wt")).as("chosen_tokens"),
        sum(col("value")).as("chosen_value"))
    val crit = cum.where(col("cum") > budget)
      .orderBy(col("nk"), col("doc_id")).limit(1)
      .agg(coalesce(min(col("value")), lit(0L)).as("v_c"),
        coalesce(min(col("wt")), lit(1L)).as("w_c"))
    chosen.crossJoin(broadcast(crit))
      .select(lit(budget).as("budget"), col("n_chosen"), col("chosen_tokens"),
        col("chosen_value"),
        expr(s"chosen_value * 1000 + ($budget - chosen_tokens) * v_c * 1000 div w_c")
          .as("lp_bound_milli"),
        expr(s"($budget - chosen_tokens) * v_c * 1000 div w_c").as("gap_milli"))
  }

  /** c51: LICENSE PROPAGATION through packing — the governance audit that
    * must run before any packed corpus ships: each source carries a
    * license (mapped to a restrictiveness rank: public_domain < cc_by <
    * cc_by_sa < proprietary), documents inherit it, and a PACKED SEQUENCE
    * (c07's packing, re-derived assignment-identical) inherits the MOST
    * restrictive license among its members — one proprietary doc poisons
    * the whole pack, because the pack is the training unit. Emits one row
    * per pack with its license census, the effective (max-rank) license,
    * a `shippable` verdict (policy: rank ≤ cc_by_sa), and the restricted
    * member count — the remediation worklist. Same window shape as c07
    * (per-(lang, shard) prefix sums — shard-bounded, no global sort);
    * license rank is a broadcast-free pure projection of the source key.
    */
  def c51_license_audit(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("shard", hashCol(col("doc_id"), 271L, 32L))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr("(cum - n_tokens) DIV 1024"))
      .withColumn("lrank",
        expr("CAST(CAST(substring(source, 4) AS INT) % 4 AS BIGINT)"))
      .groupBy(col("lang"), col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lrank")).as("n_licenses"),
        max(col("lrank")).as("max_rank"),
        sum(when(col("lrank") === 3L, 1L).otherwise(0L)).as("n_restricted"))
      .withColumn("effective_license",
        expr("CASE max_rank WHEN 0 THEN 'public_domain' WHEN 1 THEN 'cc_by' " +
          "WHEN 2 THEN 'cc_by_sa' ELSE 'proprietary' END"))
      .withColumn("shippable", (col("max_rank") <= 2L).cast("long"))
  }

  /** c52: SFT LOSS-MASK span assembly — the tensor-side artifact c48's
    * conversations still need before a trainer can consume them: each
    * kept turn becomes a [span_start, span_end) token span within its
    * conversation's packed sequence, with mask = 1 on ASSISTANT turns
    * (the tokens the loss trains on) and 0 on user turns (context only) —
    * the "train on completions only" rule every chat-SFT recipe applies.
    * Span starts are an exclusive running sum over turn order (window,
    * conversation-keyed); `trainable_tokens` rides every row so a batch
    * builder can drop conversations whose mask is empty without a second
    * pass. Same single shuffle-key family as c48; the oracle wraps c48's
    * own text as a CTE, so the spans are checked against the exact
    * conversation assembly the gate already proves.
    */
  def c52_loss_mask(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy(col("user_id"), col("conv_idx"))
      .orderBy(col("turn_out"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wAll = Window.partitionBy(col("user_id"), col("conv_idx"))
    c48_chat_assembly(s, d)
      .withColumn("span_start", coalesce(sum(col("tokens")).over(wc), lit(0L)))
      .withColumn("span_end", col("span_start") + col("tokens"))
      .withColumn("mask", when(col("role") === "assistant", 1L).otherwise(0L))
      .withColumn("trainable_tokens",
        sum(when(col("role") === "assistant", col("tokens")).otherwise(0L))
          .over(wAll))
      .select(col("user_id"), col("conv_idx"), col("turn_out"), col("role"),
        col("span_start"), col("span_end"), col("mask"),
        col("trainable_tokens"))
  }

  /** c53: ANNEALING (mid-training) ORDER — the two-phase schedule modern
    * pretraining runs use: the bulk phase streams the WHOLE corpus in
    * deterministic hash order (c28's spine), then the final "annealing"
    * tail re-visits only the TOP-QUINTILE quality documents (exact 0.8
    * percentile threshold, c02's cross-engine quantile) so the last
    * gradient steps see the best data — emitted as one global position
    * sequence (phase 1 = 1..N, phase 2 = N+1..N+|top|) with phase and
    * quality riding each row. Both phases' positions come from ONE
    * two-phase prefix scan (the annealed rank is a running conditional
    * sum over the same per-pid window — no second shuffle); quality =
    * lexical density, all integer. Selection is threshold-based, not
    * top-k: at 100 TB a "top quintile" heap is data-sized, a percentile
    * threshold is a scalar broadcast.
    */
  def c53_annealing_order(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val items = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        expr("CAST(size(array_distinct(toks)) AS BIGINT) * 1000000 div size(toks)")
          .as("quality"),
        expr("((doc_id % 1000003) * 2654435761 + 40503) % 1000000007").as("k"))
    val thr = items.agg(expr("percentile(quality, 0.8D)").as("thr"))
    val keyed = items.crossJoin(broadcast(thr))
      .withColumn("annealed", (col("quality") >= col("thr")).cast("long"))
      .repartitionByRange(32, col("k"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val sub = keyed.groupBy(col("pid"))
      .agg(count(lit(1)).as("pn"), sum(col("annealed")).as("an"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n = sub.map(_._2).sum
    val offDf = broadcast(s.createDataFrame(
      sub.map(_._1)
        .zip(sub.map(_._2).scanLeft(0L)(_ + _).zip(sub.map(_._3).scanLeft(0L)(_ + _)))
        .map { case (pid, (oa, ob)) => (pid, oa, ob) }.toSeq)
      .toDF("pid", "off_all", "off_ann"))
    val w = Window.partitionBy(col("pid")).orderBy(col("k"), col("doc_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = keyed.join(offDf, "pid")
      .withColumn("pos1", col("off_all") + row_number().over(w))
      .withColumn("r2", sum(col("annealed")).over(run))
    val phase1 = ranked.select(col("pos1").as("position"), col("doc_id"),
      lit(1L).as("phase"), col("quality"))
    val phase2 = ranked.where(col("annealed") === 1)
      .select((lit(n) + col("off_ann") + col("r2")).as("position"),
        col("doc_id"), lit(2L).as("phase"), col("quality"))
    phase1.unionByName(phase2)
  }

  /** c54: SMOOTH source INTERLEAVE — c28 gives a deterministic global
    * order, but hash order leaves source RUNS (several consecutive docs
    * from one source), which batch-level loss curves see as mixture
    * noise. The smooth schedule places the i-th item of source s at
    * fractional key i/n_s (computed as the integer i·10⁶ div n_s — the
    * Bresenham line-drawing construction), so every prefix of the global
    * order carries each source in proportion within a ±2 drift bound
    * (spec-measured at stride 50). Two two-phase prefix scans: the
    * within-source rank rides a (pid, source) window (c47's shape), the
    * global position a (key, source, doc_id) range partition — no global
    * sort reducer, no source-sized partition anywhere.
    */
  def c54_smooth_interleave(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      .repartitionByRange(32, col("source"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val sub = docs.groupBy(col("pid"), col("source"))
      .agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val off = sub.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, o) => (pid, src, o) }
    }
    val srcN = broadcast(sub.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toSeq.toDF("source", "ns"))
    val offDf = broadcast(off.toDF("pid", "source", "soff"))
    val ws = Window.partitionBy(col("pid"), col("source")).orderBy(col("doc_id"))
    val keyed = docs.join(offDf, Seq("pid", "source")).join(srcN, "source")
      .withColumn("i", col("soff") + row_number().over(ws))
      .withColumn("k", expr("i * 1000000L div ns"))
      .select(col("doc_id"), col("source"), col("i").cast("long").as("i"),
        col("k"))
      .repartitionByRange(32, col("k"), col("source"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val sub2 = keyed.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val off2 = broadcast(s.createDataFrame(
      sub2.map(_._1).zip(sub2.map(_._2).scanLeft(0L)(_ + _)).toSeq)
      .toDF("pid", "goff"))
    val wg = Window.partitionBy(col("pid"))
      .orderBy(col("k"), col("source"), col("doc_id"))
    keyed.join(off2, "pid")
      .withColumn("position", col("goff") + row_number().over(wg))
      .select(col("position"), col("doc_id"), col("source"), col("i"))
  }

  /** c55 oracle — eight Bradley-Terry MM iterations UNROLLED as chained
    * `AS MATERIALIZED` CTEs (each s_k is referenced twice by dn_{k+1};
    * without materialization CTE inlining triplicates the whole prefix
    * per iteration — 3^8 plan blowup, which is also why the Spark side
    * runs the iteration driver-side instead of through this SQL). Every
    * step is int64: den_i = Σ_j floor(n_ij·1e12/(s_i+s_j)), raw_i =
    * floor(wins_i·1e12/den_i), renormalized to mean 1e6 so the fixed
    * point is scale-pinned — the exact twin of [[btFit]]'s Long loop.
    */
  private lazy val c55Oracle: String =
    s"""WITH $c55StrengthCtes
       |SELECT pl.p AS player, pl.wins, pl.games, s8.st AS strength_micros,
       |       row_number() OVER (ORDER BY s8.st DESC, pl.p) AS rnk
       |FROM players pl JOIN s8 ON s8.p = pl.p""".stripMargin

  /** The c55 WITH-body (bouts → win matrix → eight MATERIALIZED MM
    * iterations, final strengths in `s8(p, st)`) — shared by the c55
    * oracle and c56's pair-assembly oracle so both engines provably
    * consume the same fit.
    */
  private lazy val c55StrengthCtes: String = {
    val iters = (1 to 8).map { k =>
      val prev = if (k == 1) "s0" else s"s${k - 1}"
      s"""dn$k AS MATERIALIZED (
         |  SELECT pr.i AS p,
         |         CAST(sum(pr.n * 1000000000000 // (si.st + sj.st))
         |              AS BIGINT) AS den
         |  FROM pairs pr
         |  JOIN $prev si ON si.p = pr.i
         |  JOIN $prev sj ON sj.p = pr.j
         |  GROUP BY 1),
         |u$k AS MATERIALIZED (
         |  SELECT pl.p, greatest(CAST(1 AS BIGINT),
         |           CAST(pl.wins * 1000000000000
         |                // greatest(d.den, 1) AS BIGINT)) AS raw
         |  FROM players pl JOIN dn$k d ON d.p = pl.p),
         |t$k AS MATERIALIZED (
         |  SELECT CAST(sum(raw) AS BIGINT) AS tot,
         |         CAST(count(*) AS BIGINT) AS np FROM u$k),
         |s$k AS MATERIALIZED (
         |  SELECT u.p, greatest(CAST(1 AS BIGINT),
         |           CAST(u.raw * 1000000 * t.np // t.tot AS BIGINT)) AS st
         |  FROM u$k u CROSS JOIN t$k t)""".stripMargin
    }.mkString(",\n")
    s"""b0 AS MATERIALIZED (
       |  SELECT a.source AS pa, b.source AS pb,
       |         CASE WHEN a.n_chars > b.n_chars THEN a.source
       |              WHEN b.n_chars > a.n_chars THEN b.source
       |              WHEN a.source < b.source THEN a.source
       |              ELSE b.source END AS win
       |  FROM documents a
       |  JOIN documents b ON b.doc_id = a.doc_id + 1 + a.doc_id % 7
       |  WHERE a.source <> b.source),
       |dd AS (SELECT pa AS i, pb AS j, win FROM b0
       |       UNION ALL SELECT pb, pa, win FROM b0),
       |pairs AS MATERIALIZED (
       |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN win = i THEN 1 ELSE 0 END) AS BIGINT)
       |           AS w
       |  FROM dd GROUP BY 1, 2),
       |players AS MATERIALIZED (
       |  SELECT i AS p, CAST(sum(w) AS BIGINT) AS wins,
       |         CAST(sum(n) AS BIGINT) AS games
       |  FROM pairs GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT p, CAST(1000000 AS BIGINT) AS st FROM players),
       |$iters""".stripMargin
  }

  /** Eight MM iterations over the collected win matrix — exact int64
    * twin of the oracle's CTE chain (Long `/` floors identically to
    * DuckDB `//` on the all-positive operands; bounds: wins·1e12 ≤ 5e14,
    * raw·1e6·np ≤ ~1e15 — headroom everywhere).
    */
  private[graft] def btFit(pairs: Seq[(String, String, Long, Long)])
      : Seq[(String, Long, Long, Long)] = {
    val players = pairs.groupBy(_._1).map { case (p, ps) =>
      p -> (ps.map(_._4).sum, ps.map(_._3).sum)
    }
    var st: Map[String, Long] = players.map { case (p, _) => p -> 1000000L }
    for (_ <- 1 to 8) {
      val den = pairs.groupBy(_._1).map { case (p, ps) =>
        p -> ps.map { case (i, j, n, _) =>
          n * 1000000000000L / (st(i) + st(j))
        }.sum
      }
      val raw = players.map { case (p, (wins, _)) =>
        p -> math.max(1L,
          wins * 1000000000000L / math.max(den.getOrElse(p, 0L), 1L))
      }
      val tot = raw.values.sum
      val np = raw.size.toLong
      st = raw.map { case (p, r) =>
        // multiplyExact: a degenerate win matrix (den near zero) can push
        // raw toward wins*1e12, where r*1e6*np exceeds Long range — the
        // DuckDB twin raises on BIGINT overflow, so silent Scala wrap
        // would trade the claimed hash parity for a quiet divergence.
        // Out-of-domain inputs must fail loudly on BOTH engines.
        p -> math.max(1L,
          Math.multiplyExact(Math.multiplyExact(r, 1000000L), np) / tot)
      }
    }
    players.toSeq.map { case (p, (wins, games)) => (p, wins, games, st(p)) }
      .sortBy { case (p, _, _, s) => (-s, p) }
  }

  /** c55: BRADLEY-TERRY preference fit — the pairwise-comparison strength
    * model under RLHF preference data, Chatbot-Arena-style model ranking,
    * and LLM-judge win matrices (Bradley & Terry 1952; MM algorithm per
    * Hunter 2004). Bouts are derived deterministically from the corpus
    * (doc_id vs doc_id+1+doc_id%7 — the varying stride CONNECTS the
    * source comparison graph; a fixed stride leaves round-robin-assigned
    * sources in disjoint 2-cliques where BT degenerates to win rate),
    * winner = longer doc, ties broken lexicographically. The shape is
    * the production one: a corpus-sized bout log reduced distributedly
    * to a players×players win matrix (one co-partitioned self-join on
    * doc_id + one groupBy pair), then MM iterations over the k-bounded
    * matrix — collected at ≤ |sources|² ≤ 400 rows (the trained-ANN
    * house pattern) and iterated in exact int64 on the driver, so
    * iteration cost is independent of corpus size at any scale. Integer
    * fixed-point throughout: strengths are int64 micros, every division
    * floors identically in both engines — hash-green, not rows-only.
    */
  def c55_bradley_terry(s: SparkSession, d: String): DataFrame =
    c55FitFrame(s, c55PairPartials(c55Bouts(s, d)))

  /** Distributed bout reduction + driver MM fit, shared by c55 and c56
    * (strength-sorted: player, wins, games, strength_micros).
    */
  private[graft] def c55Fitted(s: SparkSession, d: String)
      : Seq[(String, Long, Long, Long)] =
    btFitFromPairs(c55PairPartials(c55Bouts(s, d)))

  /** Directed win-matrix partials over a bout frame — ADDITIVE: partials
    * from ANY partition of the bout log merge by per-(i, j) sum, which is
    * what st23 maintains under a stream.
    */
  private[graft] def c55PairPartials(bouts: DataFrame): DataFrame = {
    val b0 = bouts
      .select(col("sa").as("pa"), col("sb").as("pb"),
        when(col("a_wins"), col("sa")).otherwise(col("sb")).as("win"))
    val dd = b0.select(col("pa").as("i"), col("pb").as("j"), col("win"))
      .unionAll(b0.select(col("pb").as("i"), col("pa").as("j"), col("win")))
    dd.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("win") === col("i"), 1L).otherwise(0L)).as("w"))
  }

  /** Collect the k-bounded win matrix and fit (≤ |sources|² rows). */
  private[operators] def btFitFromPairs(pairs: DataFrame)
      : Seq[(String, Long, Long, Long)] =
    btFit(pairs.collect() // k-bounded: |sources|^2 directed pairs
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq)

  /** Fit + rank as the c55 output frame. */
  private[graft] def c55FitFrame(s: SparkSession,
      pairs: DataFrame): DataFrame = {
    import s.implicits._
    btFitFromPairs(pairs).zipWithIndex.map {
      case ((p, wins, games, stm), idx) => (p, wins, games, stm, idx + 1L)
    }.toDF("player", "wins", "games", "strength_micros", "rnk")
  }

  /** The deterministic bout log: varying-stride doc pairs, `a_wins` =
    * the c55 winner rule (longer doc, tie to the lexicographically
    * smaller source).
    */
  private[graft] def c55Bouts(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.as("a")
      .join(docs.as("b"), col("b.doc_id") ===
        col("a.doc_id") + lit(1L) + col("a.doc_id") % lit(7L))
      .filter(col("a.source") =!= col("b.source"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.source").as("sa"), col("b.source").as("sb"),
        (col("a.n_chars") > col("b.n_chars") ||
          (col("a.n_chars") === col("b.n_chars") &&
            col("a.source") < col("b.source"))).as("a_wins"))
  }

  /** c56: PREFERENCE-PAIR assembly (the DPO/RLHF dataset step that sits
    * downstream of c55's fit): each bout becomes a (chosen, rejected)
    * training pair, then the pair is RETAINED only when the global
    * Bradley-Terry model agrees with the local label by a confident
    * margin (chosen source at least 0.04 stronger in micros-scaled
    * strength) — the label-noise screen preference-data pipelines run
    * before training, dropping bouts that contradict or barely match
    * the fitted model (202 of 496 fixture bouts contradict it). Shape:
    * the bout log is corpus-sized (same co-partitioned self-join as
    * c55); strengths arrive as a broadcast of the k-bounded fit, so the
    * screen is one broadcast-joined scan — no second shuffle at any
    * corpus size. Margins are exact int64 micros end to end.
    */
  def c56_preference_pairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE materialized bout log feeds both the fit and the pair assembly
    // — without the checkpoint the corpus-sized stride self-join runs
    // twice (once under c55PairPartials, once for pp)
    val bouts = c55Bouts(s, d).localCheckpoint()
    val st = btFitFromPairs(c55PairPartials(bouts))
      .map { case (p, _, _, stm) => (p, stm) }
      .toDF("p", "st")
    val pp = bouts.select(
      when(col("a_wins"), col("da")).otherwise(col("db"))
        .as("chosen_doc_id"),
      when(col("a_wins"), col("db")).otherwise(col("da"))
        .as("rejected_doc_id"),
      when(col("a_wins"), col("sa")).otherwise(col("sb"))
        .as("chosen_source"),
      when(col("a_wins"), col("sb")).otherwise(col("sa"))
        .as("rejected_source"))
    pp.join(broadcast(st.as("cw")),
        col("chosen_source") === col("cw.p"))
      .join(broadcast(st.as("cl")),
        col("rejected_source") === col("cl.p"))
      .withColumn("margin_micros", col("cw.st") - col("cl.st"))
      .filter(col("margin_micros") >= 40000L)
      .select(col("chosen_doc_id"), col("rejected_doc_id"),
        col("chosen_source"), col("rejected_source"), col("margin_micros"))
  }

  val queries: Map[String, Q] = Map(
    "c56_preference_pairs" -> (c56_preference_pairs _),
    "c55_bradley_terry" -> (c55_bradley_terry _),
    "c54_smooth_interleave" -> (c54_smooth_interleave _),
    "c53_annealing_order" -> (c53_annealing_order _),
    "c52_loss_mask" -> (c52_loss_mask _),
    "c51_license_audit" -> (c51_license_audit _),
    "c50_budget_certificate" -> (c50_budget_certificate _),
    "c49_drop_lineage" -> (c49_drop_lineage _),
    "c48_chat_assembly" -> (c48_chat_assembly _),
    "c47_quantile_normalize" -> (c47_quantile_normalize _),
    "c46_loo_source_value" -> (c46_loo_source_value _),
    "c45_k_anonymity" -> (c45_k_anonymity _),
    "c44_corpus_diff" -> (c44_corpus_diff _),
    "c43_canary_recall" -> (c43_canary_recall _),
    "c42_rejection_to_target" -> (c42_rejection_to_target _),
    "c41_softdedup_mixture" -> (c41_softdedup_mixture _),
    "c40_filter_mixture_repair" -> (c40_filter_mixture_repair _),
    "c39_persisted_model_apply" -> (c39_persisted_model_apply _),
    "c38_waterfill_budget" -> (c38_waterfill_budget _),
    "c37_contamination_panel" -> (c37_contamination_panel _),
    "c36_decontaminate_semantic" -> (c36_decontaminate_semantic _),
    "c35_mixture_drift" -> (c35_mixture_drift _),
    "c34_split_balance" -> (c34_split_balance _),
    "c33_assembly" -> (c33_assembly _),
    "c32_tokenizer_fertility" -> (c32_tokenizer_fertility _),
    "c31_padding_sweep" -> (c31_padding_sweep _),
    "c30_exemplar_selection" -> (c30_exemplar_selection _),
    "c22_preprocess_recipe" -> (c22_preprocess_recipe _),
    "c21_sample_k_per_group" -> (c21_sample_k_per_group _),
    "c17_weighted_sample" -> (c17_weighted_sample _),
    "c16_token_apportion" -> (c16_token_apportion _),
    "c23_split_repair" -> (c23_split_repair _),
    "c24_filter_sweep" -> (c24_filter_sweep _),
    "c25_dsir_weights" -> (c25_dsir_weights _),
    "c26_persisted_bloom" -> (c26_persisted_bloom _),
    "c27_datasheet" -> (c27_datasheet _),
    "c28_training_order" -> (c28_training_order _),
    "c29_waterfill_mixture" -> (c29_waterfill_mixture _),
    "c15_split_leakage" -> (c15_split_leakage _),
    "c14_mixture_weights" -> (c14_mixture_weights _),
    "c10_chunk_documents" -> (c10_chunk_documents _),
    "c09_decontaminate_ngram" -> (c09_decontaminate_ngram _),
    "c01_stratified_sample" -> (c01_stratified_sample _),
    "c02_token_budget" -> (c02_token_budget _),
    "c03_hash_split" -> (c03_hash_split _),
    "c04_split_by_cluster" -> (c04_split_by_cluster _),
    "c05_mixture_sample" -> (c05_mixture_sample _),
    "c06_token_budget_approx" -> (c06_token_budget_approx _),
    "c07_pack_sequences" -> (c07_pack_sequences _),
    "c08_decontaminate" -> (c08_decontaminate _),
    "c11_decontaminate_apply" -> (c11_decontaminate_apply _),
    "c12_token_budget_bpe" -> (c12_token_budget_bpe _),
    "c13_decontaminate_bloom" -> (c13_decontaminate_bloom _),
    "c18_curriculum_order" -> (c18_curriculum_order _),
    "c19_epoch_mixture" -> (c19_epoch_mixture _),
    "c20_domain_cap" -> (c20_domain_cap _),
  )

  /** c02's budget computed over REAL tokenizer output: the kept set is
    * c02's exact quality-percentile selection, but the thing being
    * budgeted — kept tokens per lang — comes from t10's BPE piece counts
    * instead of whitespace estimates (what an actual token-budget pipeline
    * bills against; the estimate can be ~2x off on subword-heavy text).
    * The tokenizer column joins by doc_id — one extra keyed join, no new
    * shuffle shape vs c02.
    */
  def c12_token_budget_bpe(s: SparkSession, d: String): DataFrame = {
    val bpe = TextQueries.t10_bpe_tokenize(s, d)
      .select(col("doc_id"), col("n_tokens").as("n_bpe"))
    val scored = qualityScored(s, d)
    val thr = scored.agg(expr("percentile(score, 0.8D)").as("thr"))
    scored.join(bpe, "doc_id")
      .crossJoin(broadcast(thr))
      .filter(col("score") >= col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_bpe")).as("kept_bpe_tokens"))
  }

  /** The APPLY step c09 stops short of: the decontaminated corpus itself.
    * Any corpus doc sharing an exact 13-gram with the eval suite is
    * dropped (the GPT-3 remedy), and the kept corpus rolls up per lang —
    * d09's left-anti-on-ids shape driven by the decontamination screen,
    * so the whole screen -> drop -> restat chain is one lineage. The
    * anti join carries ids only; document bodies never shuffle.
    */
  def c11_decontaminate_apply(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .localCheckpoint() // screen + apply both read one materialized scan
    val corpus = docs.filter(col("doc_id") % 19 =!= 0)
    val flagged = decontaminateExact(corpus,
        docs.filter(col("doc_id") % 19 === 0))
      .select(col("doc_id"))
    corpus.join(flagged, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
  }

  /** Curriculum ordering (Bengio et al. '09 shape): emit the start of the
    * training order — documents sequenced easy-to-hard by length tier,
    * deterministically shuffled WITHIN each tier by the Knuth hash (a
    * curriculum with no within-tier shuffle feeds the model each tier in
    * storage order, a well-known correlation bug). The global sort is a
    * k-bounded TakeOrderedAndProject (top 50 positions), so no executor
    * ever sorts the full corpus and the driver holds only k rows; the
    * row_number that stamps positions runs AFTER the limit, over 50 rows.
    * At 100 TB the full training order is never materialized with a global
    * sort at all — each tier is written as its own partition and position
    * assignment is c17's two-phase prefix-sum over per-partition counts;
    * this query is the head-of-curriculum audit view of that order.
    */
  def c18_curriculum_order(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = Tables.documents(s, d)
      .withColumn("tier",
        when(col("n_chars") < 200, 0).when(col("n_chars") < 350, 1).otherwise(2))
      .withColumn("h", hashCol(col("doc_id"), 54321L, 1000000007L))
      .orderBy(col("tier"), col("h"), col("doc_id"))
      .limit(50)
    ordered.withColumn("position",
        row_number().over(Window.orderBy(col("tier"), col("h"), col("doc_id"))))
      .select(col("position"), col("doc_id"), col("tier"), col("n_chars"))
  }

  /** Epoch-weighted mixture replication (LLaMA/DoReMi-style "repeat
    * factors"): each source carries a fractional epoch weight — 2.4 means
    * every doc appears twice and a hash-chosen 40% of docs a third time;
    * 0.3 means downsampling to a 30% single pass. The replicated rows ARE
    * the operator's product (explode over sequence(1, replicas) — a
    * zero-shuffle fan-out the scan absorbs); the per-(source, epoch)
    * rollup emitted here is its deterministic audit. Hash selection of
    * the partial epoch reuses the split hash, so the same doc is chosen
    * on every engine and run — no sampling seed to ship. Thresholds are
    * integer literals (400/1000, not 2.4 - 2) to stay off the IEEE
    * double-literal trap.
    */
  def c19_epoch_mixture(s: SparkSession, d: String): DataFrame = {
    val weighted = Tables.documents(s, d)
      .withColumn("full_epochs",
        when(col("source").isin("src0", "src1"), 2L)
          .when(col("source").isin("src2", "src3", "src4"), 1L)
          .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 1L)
          .otherwise(0L))
      .withColumn("frac_thresh",
        when(col("source").isin("src0", "src1"), 400L)
          .when(col("source").isin("src2", "src3", "src4"), 500L)
          .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 0L)
          .when(col("source").isin("src10", "src11", "src12", "src13", "src14"), 700L)
          .otherwise(300L))
      .withColumn("h", hashCol(col("doc_id"), 7919L, 1000L))
      .withColumn("replicas",
        col("full_epochs") + when(col("h") < col("frac_thresh"), 1L).otherwise(0L))
    // Spark's sequence(1, 0) REVERSES into [1, 0] instead of emptying —
    // guard to match DuckDB's empty generate_series(1, 0)
    weighted
      .withColumn("epoch", explode(when(col("replicas") >= 1L,
        sequence(lit(1L), col("replicas"))).otherwise(array().cast("array<bigint>"))))
      .groupBy(col("source"), col("epoch"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("epoch_chars"))
  }

  /** c20: per-domain document cap — the CommonCrawl-pipeline rule that no
    * single domain may dominate the corpus (C4 and RefinedWeb both cap
    * per-host contributions; Penedo et al. '23 §3.1). Keep the 5 largest
    * docs per source (n_chars desc, doc_id asc tie-break), report the
    * kept rows themselves.
    *
    * Scale shape: routes through the native two-phase heap operator
    * (TopKPerGroup) — per-partition bounded heaps, then one shuffle
    * carrying at most k rows per (partition, source), never a full sort
    * and never a Window over the whole corpus. A hot domain with 10^9
    * pages costs the same shuffle bytes as one with 10 pages.
    */
  def c20_domain_cap(s: SparkSession, d: String): DataFrame =
    TopKPerGroup.topK(
      Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")),
      Seq("source"), Seq(Ord("n_chars", desc = true), Ord("doc_id")), 5)

  /** c21: deterministic k-per-group sampling — "exactly 20 docs per
    * language, reproducibly" is the curation request c01's fractional
    * sampler can't satisfy (fractions drift with group size; audits need
    * the same sample every run). Rank by a Knuth multiplicative scramble
    * of the key — (doc_id · 2654435761) mod 2³², uniform-ish, engine-
    * replicable integer arithmetic, so unlike an RNG sample the SELECTION
    * itself hash-checks — and keep the k smallest per group through the
    * native [[TopKPerGroup]] heap: no rank window, no per-group single-
    * reducer funnel, the same partial-heap exchange every top-k in the
    * engine rides. At 100 TB this is one scan + one k-bounded shuffle
    * regardless of group skew.
    */
  def c21_sample_k_per_group(s: SparkSession, d: String): DataFrame =
    TopKPerGroup.topK(
      Tables.documents(s, d).select(col("lang"), col("doc_id"),
        pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)).as("rnd")),
      Seq("lang"), Seq(Ord("rnd"), Ord("doc_id")), 20)

  /** Shared by c09 and its Bloom-screened twin c13 (same output set). */
  private val ngramDecontOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
      |  FROM (SELECT doc_id, toks,
      |               unnest(generate_series(1, len(toks) - 12)) AS i
      |        FROM t WHERE len(toks) >= 13) u),
      |ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 19 = 0)
      |SELECT g.doc_id, count(*) AS n_hit_ngrams
      |FROM g JOIN ev USING (ng)
      |WHERE g.doc_id % 19 <> 0
      |GROUP BY g.doc_id""".stripMargin

  /** DuckDB twin of c30's greedy trajectory, unrolled round by round
    * (g10's generated-CTE pattern): identical quantized sims, identical
    * greatest-folds, identical (total desc, c_id) argmax.
    */
  private lazy val c30Oracle: String = {
    val simExpr =
      """CAST(round(1000000 * (
        |    list_sum(list_transform(list_zip(e.emb, c.c_emb), x -> x[1] * x[2]))
        |    / (sqrt(list_sum(list_transform(e.emb, v -> v * v)))
        |       * sqrt(list_sum(list_transform(c.c_emb, v -> v * v)))))) AS BIGINT)""".stripMargin
    val head =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |cand AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < $C30Cands),
         |sims AS (
         |  SELECT e.vec_id AS v, c.c_id, $simExpr AS sim
         |  FROM e, cand c),
         |g1 AS (SELECT c_id, CAST(sum(greatest(sim, 0)) AS BIGINT) AS total
         |       FROM sims GROUP BY c_id),
         |p1 AS (SELECT c_id, total FROM g1 ORDER BY total DESC, c_id LIMIT 1),
         |cov1 AS (SELECT s.v, greatest(s.sim, 0) AS cov
         |         FROM sims s CROSS JOIN p1 WHERE s.c_id = p1.c_id)""".stripMargin
    val rounds = (2 to C30K).map { k =>
      val exclusion = (1 until k).map(i => s"SELECT c_id FROM p$i")
        .mkString(" UNION ALL ")
      s"""g$k AS (
         |  SELECT s.c_id, CAST(sum(greatest(s.sim, c.cov)) AS BIGINT) AS total
         |  FROM sims s JOIN cov${k - 1} c ON c.v = s.v
         |  WHERE s.c_id NOT IN ($exclusion)
         |  GROUP BY s.c_id),
         |p$k AS (SELECT c_id, total FROM g$k ORDER BY total DESC, c_id LIMIT 1),
         |cov$k AS (
         |  SELECT c.v, greatest(c.cov, s.sim) AS cov
         |  FROM cov${k - 1} c JOIN sims s ON s.v = c.v
         |  CROSS JOIN p$k WHERE s.c_id = p$k.c_id)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to C30K).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, c_id, total AS coverage_micro FROM p$i")
      .mkString("\nUNION ALL\n")
    s"$head,\n$rounds\n$sel"
  }

  /** The c22 recipe's DuckDB CTE chain (normalize → length gate → dedup
    * → corpus/eval split → 13-gram contamination) — shared verbatim by
    * the c22 oracle and c33's extended-assembly oracle.
    */
  private val recipeOracleCtes: String =
    """WITH c AS (
      |  SELECT doc_id, lang,
      |         trim(regexp_replace(regexp_replace(lower(text),
      |           '[^a-z0-9 .,]', ' ', 'g'), ' {2,}', ' ', 'g')) AS cleaned
      |  FROM documents),
      |f AS (SELECT * FROM c WHERE length(cleaned) >= 20),
      |keep AS (SELECT cleaned, min(doc_id) AS doc_id FROM f GROUP BY cleaned),
      |dd AS (
      |  SELECT f.doc_id, f.lang, f.cleaned
      |  FROM f JOIN keep ON f.cleaned = keep.cleaned AND f.doc_id = keep.doc_id),
      |corpus AS (SELECT * FROM dd WHERE doc_id % 19 <> 0),
      |evald AS (SELECT * FROM f WHERE doc_id % 19 = 0),
      |cg AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
      |  FROM (SELECT doc_id, toks,
      |               unnest(generate_series(1, len(toks) - 12)) AS i
      |        FROM (SELECT doc_id, string_split(cleaned, ' ') AS toks
      |              FROM corpus) z
      |        WHERE len(toks) >= 13) u),
      |eg AS (
      |  SELECT DISTINCT array_to_string(toks[i:i+12], ' ') AS ng
      |  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 12)) AS i
      |        FROM (SELECT string_split(cleaned, ' ') AS toks FROM evald) z
      |        WHERE len(toks) >= 13) u),
      |bad AS (SELECT DISTINCT doc_id FROM cg JOIN eg USING (ng))""".stripMargin

  /** c48's oracle text — factored so c52 can wrap it as a CTE. */
  private lazy val c48Oracle: String =
    """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us,
        |         CASE WHEN event_type IN ('click','view') THEN 'user'
        |              ELSE 'assistant' END AS role,
        |         length(event_type) + length(props) // 4 + 2 AS tok
        |  FROM events),
        |sess AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |conv AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS conv_idx
        |  FROM sess),
        |runs AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, conv_idx
        |                               ORDER BY us, event_id)
        |          - row_number() OVER (PARTITION BY user_id, conv_idx, role
        |                               ORDER BY us, event_id) AS grp
        |  FROM conv),
        |merged AS (
        |  SELECT user_id, CAST(conv_idx AS BIGINT) AS conv_idx, role,
        |         CAST(sum(tok) AS BIGINT) AS tokens, count(*) AS n_msgs,
        |         min(us) AS fus, min(event_id) AS lead_event_id
        |  FROM runs GROUP BY user_id, conv_idx, role, grp),
        |idx AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id, conv_idx
        |                                    ORDER BY fus, lead_event_id) AS BIGINT) AS turn_idx
        |  FROM merged),
        |trimmed AS (
        |  SELECT * FROM (
        |    SELECT *, min(CASE WHEN role = 'user' THEN turn_idx END)
        |                OVER (PARTITION BY user_id, conv_idx) AS first_user
        |    FROM idx) WHERE turn_idx >= first_user),
        |fitted AS (
        |  SELECT * FROM (
        |    SELECT *, sum(tokens) OVER (PARTITION BY user_id, conv_idx
        |                                ORDER BY turn_idx DESC
        |                                ROWS UNBOUNDED PRECEDING) AS suffix_tokens
        |    FROM trimmed) WHERE suffix_tokens <= 64),
        |retrim AS (
        |  SELECT * FROM (
        |    SELECT *, min(CASE WHEN role = 'user' THEN turn_idx END)
        |                OVER (PARTITION BY user_id, conv_idx) AS first_user2
        |    FROM fitted) WHERE turn_idx >= first_user2)
        |SELECT user_id, conv_idx,
        |       CAST(row_number() OVER (PARTITION BY user_id, conv_idx
        |                               ORDER BY turn_idx) AS BIGINT) AS turn_out,
        |       role, n_msgs, tokens, lead_event_id,
        |       CAST(sum(tokens) OVER (PARTITION BY user_id, conv_idx) AS BIGINT)
        |         AS kept_tokens,
        |       CAST(CASE WHEN role = (CASE WHEN (row_number() OVER (
        |                PARTITION BY user_id, conv_idx ORDER BY turn_idx)) % 2 = 1
        |              THEN 'user' ELSE 'assistant' END)
        |            THEN 1 ELSE 0 END AS BIGINT) AS alt_ok
        |FROM retrim""".stripMargin

  val oracles: Map[String, String] = Map(
    "c55_bradley_terry" -> c55Oracle,
    "c56_preference_pairs" ->
      s"""WITH $c55StrengthCtes,
         |bd AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         a.source AS sa, b.source AS sb,
         |         (a.n_chars > b.n_chars OR
         |          (a.n_chars = b.n_chars AND a.source < b.source))
         |           AS a_wins
         |  FROM documents a
         |  JOIN documents b ON b.doc_id = a.doc_id + 1 + a.doc_id % 7
         |  WHERE a.source <> b.source),
         |pp AS (
         |  SELECT CASE WHEN a_wins THEN da ELSE db END AS chosen_doc_id,
         |         CASE WHEN a_wins THEN db ELSE da END AS rejected_doc_id,
         |         CASE WHEN a_wins THEN sa ELSE sb END AS chosen_source,
         |         CASE WHEN a_wins THEN sb ELSE sa END AS rejected_source
         |  FROM bd),
         |sp AS (
         |  SELECT pp.*, cw.st - cl.st AS margin_micros
         |  FROM pp JOIN s8 cw ON cw.p = pp.chosen_source
         |          JOIN s8 cl ON cl.p = pp.rejected_source)
         |SELECT chosen_doc_id, rejected_doc_id, chosen_source,
         |       rejected_source, margin_micros
         |FROM sp WHERE margin_micros >= 40000""".stripMargin,
    "c54_smooth_interleave" ->
      """WITH d AS (SELECT doc_id, source FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i,
        |         count(*) OVER (PARTITION BY source) AS ns
        |  FROM d),
        |k AS (SELECT doc_id, source, i, i * 1000000 // ns AS key FROM r)
        |SELECT CAST(row_number() OVER (ORDER BY key, source, doc_id)
        |            AS BIGINT) AS position,
        |       doc_id, source, CAST(i AS BIGINT) AS i
        |FROM k""".stripMargin,
    "c53_annealing_order" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |q AS (
        |  SELECT doc_id,
        |         CAST(len(list_distinct(toks)) AS BIGINT) * 1000000
        |           // len(toks) AS quality,
        |         ((doc_id % 1000003) * 2654435761 + 40503) % 1000000007 AS k
        |  FROM t),
        |th AS (SELECT quantile_cont(quality, 0.8) AS thr FROM q),
        |m AS (SELECT q.*, CASE WHEN quality >= thr THEN 1 ELSE 0 END AS ann
        |      FROM q CROSS JOIN th),
        |nn AS (SELECT count(*) AS n FROM m),
        |p1 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT)
        |           AS position,
        |         doc_id, CAST(1 AS BIGINT) AS phase, quality
        |  FROM m),
        |p2 AS (
        |  SELECT CAST(nn.n + row_number() OVER (ORDER BY k, doc_id) AS BIGINT),
        |         doc_id, CAST(2 AS BIGINT), quality
        |  FROM m CROSS JOIN nn WHERE ann = 1)
        |SELECT * FROM p1 UNION ALL SELECT * FROM p2""".stripMargin,
    "c52_loss_mask" ->
      s"""WITH c48 AS ($c48Oracle)
         |SELECT user_id, conv_idx, turn_out, role,
         |       CAST(coalesce(sum(tokens) OVER (
         |              PARTITION BY user_id, conv_idx ORDER BY turn_out
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |            AS BIGINT) AS span_start,
         |       CAST(coalesce(sum(tokens) OVER (
         |              PARTITION BY user_id, conv_idx ORDER BY turn_out
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |            + tokens AS BIGINT) AS span_end,
         |       CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS BIGINT)
         |         AS mask,
         |       CAST(sum(CASE WHEN role = 'assistant' THEN tokens ELSE 0 END)
         |              OVER (PARTITION BY user_id, conv_idx) AS BIGINT)
         |         AS trainable_tokens
         |FROM c48""".stripMargin,
    "c51_license_audit" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         ((doc_id % 1000003) * 2654435761 + 271) % 32 AS shard
        |  FROM documents),
        |p AS (
        |  SELECT lang, shard, source,
        |         CAST((CAST(sum(n_tokens) OVER (PARTITION BY lang, shard
        |            ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          - n_tokens) // 1024 AS BIGINT) AS pack_id,
        |         CAST(CAST(substring(source, 4) AS INT) % 4 AS BIGINT) AS lrank
        |  FROM t),
        |a AS (
        |  SELECT lang, shard, pack_id, count(*) AS n_docs,
        |         CAST(count(DISTINCT lrank) AS BIGINT) AS n_licenses,
        |         CAST(max(lrank) AS BIGINT) AS max_rank,
        |         CAST(sum(CASE WHEN lrank = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_restricted
        |  FROM p GROUP BY 1, 2, 3)
        |SELECT lang, shard, pack_id, n_docs, n_licenses, max_rank,
        |       n_restricted,
        |       CASE max_rank WHEN 0 THEN 'public_domain' WHEN 1 THEN 'cc_by'
        |            WHEN 2 THEN 'cc_by_sa' ELSE 'proprietary' END
        |         AS effective_license,
        |       CAST(CASE WHEN max_rank <= 2 THEN 1 ELSE 0 END AS BIGINT)
        |         AS shippable
        |FROM a""".stripMargin,
    "c50_budget_certificate" ->
      """WITH it AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS wt,
        |         len(list_distinct(string_split(text, ' '))) AS value
        |  FROM documents),
        |o AS (SELECT *, value * 1000000 // wt AS density FROM it),
        |c AS (
        |  SELECT *, sum(wt) OVER (ORDER BY density DESC, doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM o),
        |ch AS (
        |  SELECT count(*) AS n_chosen, CAST(sum(wt) AS BIGINT) AS chosen_tokens,
        |         CAST(sum(value) AS BIGINT) AS chosen_value
        |  FROM c WHERE cum <= 5000),
        |cr AS (
        |  SELECT value AS v_c, wt AS w_c FROM c WHERE cum > 5000
        |  ORDER BY density DESC, doc_id LIMIT 1),
        |cra AS (
        |  SELECT CAST(coalesce(min(v_c), 0) AS BIGINT) AS v_c,
        |         CAST(coalesce(min(w_c), 1) AS BIGINT) AS w_c
        |  FROM cr)
        |SELECT CAST(5000 AS BIGINT) AS budget, n_chosen, chosen_tokens,
        |       chosen_value,
        |       CAST(chosen_value * 1000
        |            + (5000 - chosen_tokens) * v_c * 1000 // w_c AS BIGINT)
        |         AS lp_bound_milli,
        |       CAST((5000 - chosen_tokens) * v_c * 1000 // w_c AS BIGINT)
        |         AS gap_milli
        |FROM ch CROSS JOIN cra""".stripMargin,
    "c49_drop_lineage" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, len(toks) AS nt,
        |         len(list_filter(toks, x -> len(x) <= 2)) AS nshort,
        |         len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS nstop,
        |         len(list_distinct(toks)) AS ndist
        |  FROM t),
        |b AS (
        |  SELECT doc_id,
        |         CASE WHEN nt < 15 THEN 1 ELSE 0 END AS b1,
        |         CASE WHEN nt > 90 THEN 1 ELSE 0 END AS b2,
        |         CASE WHEN nshort * 100 > nt * 6 THEN 1 ELSE 0 END AS b3,
        |         CASE WHEN nstop * 1000 < nt * 20 THEN 1 ELSE 0 END AS b4,
        |         CASE WHEN (nt - ndist) * 100 > nt * 65 THEN 1 ELSE 0 END AS b5
        |  FROM s)
        |SELECT doc_id,
        |       CASE WHEN b1 = 1 THEN 'r1_too_short'
        |            WHEN b2 = 1 THEN 'r2_too_long'
        |            WHEN b3 = 1 THEN 'r3_short_tokens'
        |            WHEN b4 = 1 THEN 'r4_low_stopword'
        |            WHEN b5 = 1 THEN 'r5_repetitive'
        |            ELSE 'z_kept' END AS verdict,
        |       CAST(b1 + b2 * 2 + b3 * 4 + b4 * 8 + b5 * 16 AS BIGINT) AS fail_bits,
        |       CAST(b1 + b2 + b3 + b4 + b5 AS BIGINT) AS n_fails,
        |       CAST(CASE WHEN b1 + b2 + b3 + b4 + b5 = 1 THEN 1 ELSE 0 END
        |            AS BIGINT) AS rescuable
        |FROM b""".stripMargin,
    "c48_chat_assembly" -> c48Oracle,
    "c47_quantile_normalize" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM d),
        |pooled AS (
        |  SELECT row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS gpos,
        |         n_tokens AS pooled_tokens
        |  FROM d),
        |ns AS (SELECT source, count(*) AS ns FROM d GROUP BY 1),
        |r AS (
        |  SELECT d.doc_id, d.source, d.n_tokens, s.ns,
        |         row_number() OVER (PARTITION BY d.source
        |                            ORDER BY d.n_tokens, d.doc_id) AS r
        |  FROM d JOIN ns s ON s.source = d.source)
        |SELECT r.doc_id, r.source, r.n_tokens,
        |       CAST(p.pooled_tokens AS BIGINT) AS n_norm
        |FROM r CROSS JOIN nn
        |JOIN pooled p
        |  ON p.gpos = ((2 * r.r - 1) * (nn.n - 1)) // (2 * r.ns)""".stripMargin,
    "c46_loo_source_value" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text, source,
         |    CASE WHEN 10 * len(list_filter(string_split(text, ' '),
         |              w -> w IN ('the', 'a', 'of', 'and')))
         |              >= len(string_split(text, ' ')) THEN 1 ELSE -1 END AS y,
         |    ((doc_id % 1000003) * 2654435761 + 97) % 1000 AS h
         |  FROM documents),
         |wd AS (
         |  SELECT doc_id, source, y, h,
         |         unnest(string_split(text, ' ')) AS w
         |  FROM docs),
         |dimmed AS (
         |  SELECT doc_id, source, y, h,
         |         list_reduce(list_prepend(0, list_transform(
         |             range(1, length(w) + 1),
         |             ci -> CAST(ascii(substring(w, ci, 1)) AS BIGINT))),
         |           (acc, ch) -> (acc * 31 + ch) % 1000000007)
         |           % 32 AS dim
         |  FROM wd WHERE length(w) > 0),
         |cnt AS (SELECT doc_id, source, y, h, dim, count(*) AS c
         |        FROM dimmed GROUP BY 1, 2, 3, 4, 5),
         |tot AS (SELECT doc_id, count(*) AS tot FROM dimmed GROUP BY 1),
         |feats AS (
         |  SELECT c.doc_id, c.source, c.y, c.h, c.dim,
         |         (c.c * 1000) // t.tot AS pm
         |  FROM cnt c JOIN tot t USING (doc_id)),
         |dims AS (SELECT unnest(generate_series(0, 31)) AS dim),
         |yy AS (SELECT 1 AS y UNION ALL SELECT -1),
         |mods AS (SELECT DISTINCT source AS model FROM docs
         |         UNION ALL SELECT '__full__'),
         |ncls AS (SELECT source, y, CAST(count(*) AS BIGINT) AS n
         |         FROM docs WHERE h < 800 GROUP BY 1, 2),
         |ssum AS (SELECT source, y, dim, CAST(sum(pm) AS BIGINT) AS s
         |         FROM feats WHERE h < 800 GROUP BY 1, 2, 3),
         |tn AS (SELECT y, CAST(sum(n) AS BIGINT) AS n FROM ncls GROUP BY 1),
         |ts AS (SELECT y, dim, CAST(sum(s) AS BIGINT) AS s
         |       FROM ssum GROUP BY 1, 2),
         |loo_n AS (
         |  SELECT m.model, t.y, t.n - coalesce(nc.n, 0) AS n
         |  FROM mods m CROSS JOIN tn t
         |  LEFT JOIN ncls nc ON nc.source = m.model AND nc.y = t.y),
         |loo_s AS (
         |  SELECT m.model, d.dim, yy.y,
         |         coalesce(t.s, 0) - coalesce(st.s, 0) AS s
         |  FROM mods m CROSS JOIN dims d CROSS JOIN yy
         |  LEFT JOIN ts t ON t.dim = d.dim AND t.y = yy.y
         |  LEFT JOIN ssum st ON st.source = m.model AND st.dim = d.dim
         |                    AND st.y = yy.y),
         |cent AS (
         |  SELECT l.model, l.dim,
         |    CAST((1000 * max(CASE WHEN l.y = 1 THEN l.s END))
         |      // greatest(max(CASE WHEN n.y = 1 THEN n.n END), 1)
         |      AS BIGINT) AS cp,
         |    CAST((1000 * max(CASE WHEN l.y = -1 THEN l.s END))
         |      // greatest(max(CASE WHEN n.y = -1 THEN n.n END), 1)
         |      AS BIGINT) AS cn
         |  FROM loo_s l JOIN loo_n n ON n.model = l.model AND n.y = l.y
         |  GROUP BY 1, 2),
         |w AS (SELECT model, dim, cp - cn AS wt, cp, cn FROM cent),
         |th AS (SELECT model,
         |              CAST(sum(wt * cp) + sum(wt * cn) AS BIGINT) AS theta2
         |       FROM w GROUP BY 1),
         |scored AS (
         |  SELECT w.model, f.doc_id, f.y, sum(w.wt * f.pm) AS score
         |  FROM feats f JOIN w ON w.dim = f.dim
         |  WHERE f.h >= 800 GROUP BY 1, 2, 3),
         |pred AS (
         |  SELECT s.model, s.y,
         |         CASE WHEN s.score * 2000 > t.theta2 THEN 1 ELSE -1 END
         |           AS pred
         |  FROM scored s JOIN th t ON t.model = s.model),
         |conf AS (
         |  SELECT model,
         |    sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS tp,
         |    sum(CASE WHEN pred = 1 AND y = -1 THEN 1 ELSE 0 END) AS fp,
         |    sum(CASE WHEN pred = -1 AND y = 1 THEN 1 ELSE 0 END) AS fn,
         |    sum(CASE WHEN pred = -1 AND y = -1 THEN 1 ELSE 0 END) AS tn
         |  FROM pred GROUP BY 1),
         |ba AS (
         |  SELECT model,
         |    CAST(((tp * 1000) // greatest(tp + fn, 1)
         |          + (tn * 1000) // greatest(fp + tn, 1)) // 2 AS BIGINT)
         |      AS balacc_pm
         |  FROM conf)
         |SELECT b.model AS source,
         |       CAST((SELECT sum(n) FROM ncls WHERE source = b.model)
         |            AS BIGINT) AS n_train,
         |       b.balacc_pm,
         |       b.balacc_pm - f.balacc_pm AS delta_pm
         |FROM ba b CROSS JOIN (SELECT balacc_pm FROM ba
         |                      WHERE model = '__full__') f
         |WHERE b.model <> '__full__'""".stripMargin,
    "c45_k_anonymity" ->
      """WITH l0 AS (
        |  SELECT 0 AS qi_level, count(*) AS class_size FROM customer
        |  GROUP BY c_nationkey, c_mktsegment,
        |           CAST(floor(c_acctbal / 1000) AS BIGINT)),
        |l1 AS (
        |  SELECT 1 AS qi_level, count(*) AS class_size FROM customer
        |  GROUP BY c_nationkey, c_mktsegment),
        |l2 AS (
        |  SELECT 2 AS qi_level, count(*) AS class_size FROM customer
        |  GROUP BY c_mktsegment),
        |cls AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1
        |        UNION ALL SELECT * FROM l2),
        |ks AS (SELECT CAST(unnest([2, 5, 10]) AS BIGINT) AS k)
        |SELECT qi_level, k, count(*) AS n_classes,
        |       CAST(sum(CASE WHEN class_size < k THEN 1 ELSE 0 END)
        |            AS BIGINT) AS classes_below_k,
        |       CAST(sum(CASE WHEN class_size < k THEN class_size ELSE 0 END)
        |            AS BIGINT) AS rows_at_risk,
        |       CAST((sum(CASE WHEN class_size < k THEN class_size ELSE 0 END)
        |             * 1000) // sum(class_size) AS BIGINT) AS risk_pm
        |FROM cls CROSS JOIN ks GROUP BY 1, 2""".stripMargin,
    "c44_corpus_diff" ->
      """WITH base AS (
        |  SELECT doc_id, source, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |v1 AS (
        |  SELECT doc_id, source AS src1, text AS t1, n_tokens AS k1
        |  FROM base WHERE doc_id % 17 <> 0),
        |v2 AS (
        |  SELECT doc_id, source AS src2,
        |         CASE WHEN doc_id % 13 = 0 THEN text || ' v2edit'
        |              ELSE text END AS t2,
        |         n_tokens + CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END
        |           AS k2
        |  FROM base WHERE doc_id % 19 <> 3),
        |j AS (
        |  SELECT coalesce(v2.src2, v1.src1) AS source,
        |         CASE WHEN v1.t1 IS NULL THEN 'added'
        |              WHEN v2.t2 IS NULL THEN 'removed'
        |              WHEN v1.t1 <> v2.t2 THEN 'modified'
        |              ELSE 'unchanged' END AS class,
        |         coalesce(v1.k1, 0) AS k1, coalesce(v2.k2, 0) AS k2
        |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT source, class, count(*) AS n_docs,
        |       CAST(sum(k1) AS BIGINT) AS tokens_v1,
        |       CAST(sum(k2) AS BIGINT) AS tokens_v2,
        |       CAST(sum(k2) AS BIGINT) - CAST(sum(k1) AS BIGINT)
        |         AS token_delta
        |FROM j GROUP BY 1, 2""".stripMargin,
    "c43_canary_recall" ->
      """WITH can AS (
        |  SELECT k AS canary_id, k % 2 = 0 AS leaked,
        |         array_to_string(list_transform(range(0, 15),
        |           j -> 'c' || k || 'canary' || j), ' ') AS text
        |  FROM (SELECT unnest(generate_series(0, 9)) AS k)),
        |train AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT canary_id + 2000000 AS doc_id, text FROM can WHERE leaked),
        |cg AS (
        |  SELECT DISTINCT canary_id, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT canary_id, string_split(lower(text), ' ') AS toks
        |        FROM can) t,
        |       (SELECT unnest(generate_series(1, 3)) AS i)),
        |tg AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks) - 12)) AS i
        |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |              FROM train) u
        |        WHERE len(toks) >= 13) v),
        |det AS (
        |  SELECT cg.canary_id, count(DISTINCT tg.doc_id) AS n_hit_docs
        |  FROM tg JOIN cg USING (ng) GROUP BY 1)
        |SELECT CAST(can.canary_id AS BIGINT) AS canary_id,
        |       CAST(CASE WHEN can.leaked THEN 1 ELSE 0 END AS BIGINT)
        |         AS leaked,
        |       CAST(coalesce(det.n_hit_docs, 0) AS BIGINT) AS n_hit_docs,
        |       CASE WHEN can.leaked AND coalesce(det.n_hit_docs, 0) > 0
        |              THEN 'caught_leak'
        |            WHEN can.leaked THEN 'missed_leak'
        |            WHEN coalesce(det.n_hit_docs, 0) > 0 THEN 'false_flag'
        |            ELSE 'clean_pass' END AS verdict
        |FROM can LEFT JOIN det USING (canary_id)""".stripMargin,
    "c42_rejection_to_target" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens, least(n_tokens // 32, 7) AS bucket
        |  FROM t),
        |census AS (SELECT bucket, count(*) AS n_docs FROM b GROUP BY 1),
        |mn AS (SELECT min(n_docs) AS n_min FROM census),
        |acc AS (
        |  SELECT b.bucket, b.n_tokens, census.n_docs,
        |         mn.n_min * 1000 // census.n_docs AS accept_pm,
        |         CASE WHEN ((b.doc_id % 1000003) * 2654435761 + 733) % 1000
        |                   < mn.n_min * 1000 // census.n_docs
        |              THEN 1 ELSE 0 END AS accepted
        |  FROM b JOIN census USING (bucket) CROSS JOIN mn)
        |SELECT bucket, max(n_docs) AS n_docs, max(accept_pm) AS accept_pm,
        |       CAST(sum(accepted) AS BIGINT) AS n_accepted,
        |       CAST(sum(accepted * n_tokens) AS BIGINT) AS accepted_tokens
        |FROM acc GROUP BY 1""".stripMargin,
    // d33's stage text shared verbatim — the composition is what's checked
    "c41_softdedup_mixture" -> (DedupQueries.d33OracleCtes +
      """,
        |sq AS (
        |  SELECT source, eff_tokens,
        |         CAST(round(sqrt(eff_tokens), 9) AS DECIMAL(38,9)) AS sq
        |  FROM agg),
        |tot AS (SELECT CAST(sum(sq) AS DOUBLE) AS t FROM sq)
        |SELECT source, eff_tokens,
        |       round(CAST(sq AS DOUBLE) / t, 9) AS weight,
        |       round(100000 * round(CAST(sq AS DOUBLE) / t, 9), 9)
        |         AS expected_tokens
        |FROM sq CROSS JOIN tot""".stripMargin),
    "c40_filter_mixture_repair" -> (TextQueries.rocchioOracleCtes +
      """,
        |scored AS (
        |  SELECT f.doc_id, sum(w.wt * f.pm) AS score
        |  FROM feats f JOIN w USING (dim) GROUP BY 1),
        |per AS (
        |  SELECT d.doc_id, d.source,
        |         CAST(length(d.text) - length(replace(d.text, ' ', '')) + 1
        |              AS BIGINT) AS n_toks,
        |         CASE WHEN s.score * 2000 > (SELECT theta2 FROM th)
        |              THEN 1 ELSE 0 END AS kept
        |  FROM documents d LEFT JOIN scored s USING (doc_id)),
        |agg AS (
        |  SELECT source, CAST(sum(n_toks) AS BIGINT) AS toks_before,
        |         CAST(sum(kept * n_toks) AS BIGINT) AS toks_after
        |  FROM per GROUP BY 1),
        |tt AS (SELECT CAST(sum(toks_before) AS BIGINT) AS tb,
        |              CAST(sum(toks_after) AS BIGINT) AS ta FROM agg)
        |SELECT source, toks_before, toks_after,
        |       (toks_before * 1000) // tb AS share_before_pm,
        |       (toks_after * 1000) // greatest(ta, 1) AS share_after_pm,
        |       (((toks_before * 1000) // tb) * 1000)
        |         // greatest((toks_after * 1000) // greatest(ta, 1), 1)
        |         AS correction_pm
        |FROM agg CROSS JOIN tt""".stripMargin),
    "c39_persisted_model_apply" -> (TextQueries.rocchioOracleCtes +
      """,
        |scored AS (
        |  SELECT f.doc_id, sum(w.wt * f.pm) AS score
        |  FROM feats f JOIN w USING (dim) GROUP BY 1),
        |k AS (SELECT doc_id, CASE WHEN score * 2000 > (SELECT theta2 FROM th)
        |              THEN 1 ELSE 0 END AS kept FROM scored)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(coalesce(k.kept, 0)) AS BIGINT) AS n_kept,
        |       (CAST(sum(coalesce(k.kept, 0)) AS BIGINT) * 1000) // count(*)
        |         AS keep_pm
        |FROM documents d LEFT JOIN k USING (doc_id)
        |GROUP BY 1""".stripMargin),
    "c38_waterfill_budget" -> c38Sql("//"),
    "c37_contamination_panel" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
         |  FROM (SELECT doc_id, toks,
         |               unnest(generate_series(1, len(toks) - 12)) AS i
         |        FROM t WHERE len(toks) >= 13) u),
         |ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 19 = 0),
         |nh AS (
         |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS ngram_hits
         |  FROM g JOIN ev USING (ng)
         |  WHERE g.doc_id % 19 <> 0
         |  GROUP BY g.doc_id),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |q AS (SELECT vec_id AS eid, emb AS qe FROM e WHERE vec_id % 19 = 0),
         |sh AS (
         |  SELECT c.vec_id AS doc_id, CAST(count(*) AS BIGINT) AS semantic_hits
         |  FROM e c CROSS JOIN q
         |  WHERE c.vec_id % 19 <> 0
         |    AND ${SimilarityQueries.duckCosine("c.emb", "q.qe")} >= 0.35
         |  GROUP BY c.vec_id),
         |corpus AS (SELECT doc_id, lang FROM documents WHERE doc_id % 19 <> 0)
         |SELECT c.doc_id, c.lang,
         |       coalesce(nh.ngram_hits, 0) AS ngram_hits,
         |       coalesce(sh.semantic_hits, 0) AS semantic_hits,
         |       CASE WHEN nh.doc_id IS NOT NULL AND sh.doc_id IS NOT NULL
         |              THEN 'both'
         |            WHEN nh.doc_id IS NOT NULL THEN 'ngram'
         |            WHEN sh.doc_id IS NOT NULL THEN 'semantic'
         |            ELSE 'clean' END AS verdict
         |FROM corpus c LEFT JOIN nh ON nh.doc_id = c.doc_id
         |              LEFT JOIN sh ON sh.doc_id = c.doc_id""".stripMargin,
    "c36_decontaminate_semantic" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |q AS (SELECT vec_id AS eval_id, emb AS qe FROM e WHERE vec_id < 50),
         |p AS (
         |  SELECT c.vec_id AS corpus_vec, q.eval_id,
         |         ${SimilarityQueries.duckCosine("c.emb", "q.qe")} AS sim
         |  FROM e c CROSS JOIN q WHERE c.vec_id >= 50)
         |SELECT corpus_vec, eval_id, sim FROM p WHERE sim >= 0.35""".stripMargin,
    "c35_mixture_drift" -> c35Sql("//"),
    "c34_split_balance" -> c34Sql("//"),
    "c32_tokenizer_fertility" ->
      s"""WITH p AS (
         |  SELECT lang, length(text) AS nc,
         |         len(regexp_split_to_array(trim(${TextQueries.duckBpeEncode}), ' +'))
         |           AS pieces,
         |         len(string_split(text, ' ')) AS words
         |  FROM documents),
         |a AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(nc) AS BIGINT) AS n_chars,
         |         CAST(sum(pieces) AS BIGINT) AS n_pieces,
         |         CAST(sum(words) AS BIGINT) AS n_words
         |  FROM p GROUP BY lang)
         |SELECT lang, n_docs, n_chars, n_pieces, n_words,
         |       (n_pieces * 1000) // n_words AS fertility_pm,
         |       (n_chars * 1000) // n_pieces AS chars_per_1000_pieces
         |FROM a""".stripMargin,
    "c31_padding_sweep" ->
      """WITH dd AS (
        |  SELECT least(len(string_split(text, ' ')), 128) AS len FROM documents),
        |j AS (
        |  SELECT dd.len, b.n_buckets, 128 // b.n_buckets AS width
        |  FROM dd, (SELECT unnest([1, 2, 4, 8, 16]) AS n_buckets) b),
        |u AS (SELECT n_buckets, len,
        |             (((len - 1) // width) + 1) * width AS ub FROM j)
        |SELECT n_buckets, count(*) AS n_docs,
        |       CAST(sum(len) AS BIGINT) AS useful_tokens,
        |       CAST(sum(ub - len) AS BIGINT) AS padding_tokens,
        |       (CAST(sum(ub - len) AS BIGINT) * 1000)
        |         // CAST(sum(len) AS BIGINT) AS waste_pm
        |FROM u GROUP BY n_buckets""".stripMargin,
    "c30_exemplar_selection" -> c30Oracle,
    "c22_preprocess_recipe" ->
      s"""$recipeOracleCtes
         |SELECT c2.doc_id, c2.lang,
         |       CAST(len(string_split(c2.cleaned, ' ')) AS BIGINT) AS n_tokens,
         |       c2.cleaned
         |FROM corpus c2 LEFT JOIN bad ON c2.doc_id = bad.doc_id
         |WHERE bad.doc_id IS NULL""".stripMargin,
    "c33_assembly" ->
      s"""$recipeOracleCtes,
         |rec AS (
         |  SELECT c2.doc_id, c2.lang,
         |         CAST(len(string_split(c2.cleaned, ' ')) AS BIGINT) AS n_tokens,
         |         c2.cleaned
         |  FROM corpus c2 LEFT JOIN bad ON c2.doc_id = bad.doc_id
         |  WHERE bad.doc_id IS NULL),
         |g AS (
         |  SELECT doc_id, lang, n_tokens
         |  FROM rec
         |  WHERE n_tokens >= 10
         |    AND CAST(len(list_distinct(string_split(cleaned, ' '))) AS BIGINT)
         |        * 1000 >= n_tokens * 200),
         |sk AS (
         |  SELECT doc_id, lang, n_tokens,
         |         ((doc_id % 1000003) * 2654435761 + 40503) % 1000000007 AS k
         |  FROM g)
         |SELECT row_number() OVER (ORDER BY k, doc_id) - 1 AS position,
         |       doc_id, lang, n_tokens
         |FROM sk""".stripMargin,
    "c21_sample_k_per_group" ->
      """SELECT lang, doc_id,
        |       (doc_id * 2654435761) % 4294967296 AS rnd
        |FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |                           ORDER BY rnd, doc_id) <= 20""".stripMargin,
    "c20_domain_cap" ->
      """SELECT source, doc_id, n_chars
        |FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |                           ORDER BY n_chars DESC, doc_id) <= 5""".stripMargin,
    "c18_curriculum_order" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN n_chars < 200 THEN 0
        |              WHEN n_chars < 350 THEN 1 ELSE 2 END AS tier,
        |         ((doc_id % 1000003) * 2654435761 + 54321) % 1000000007 AS h
        |  FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY tier, h, doc_id) AS INT)
        |         AS position,
        |       doc_id, tier, n_chars
        |FROM t ORDER BY tier, h, doc_id LIMIT 50""".stripMargin,
    "c19_epoch_mixture" ->
      """WITH w AS (
        |  SELECT doc_id, source, n_chars,
        |         CASE WHEN source IN ('src0', 'src1') THEN 2
        |              WHEN source IN ('src2', 'src3', 'src4') THEN 1
        |              WHEN source IN ('src5', 'src6', 'src7', 'src8', 'src9') THEN 1
        |              ELSE 0 END AS full_epochs,
        |         CASE WHEN source IN ('src0', 'src1') THEN 400
        |              WHEN source IN ('src2', 'src3', 'src4') THEN 500
        |              WHEN source IN ('src5', 'src6', 'src7', 'src8', 'src9') THEN 0
        |              WHEN source IN ('src10', 'src11', 'src12', 'src13', 'src14')
        |                THEN 700
        |              ELSE 300 END AS frac_thresh,
        |         ((doc_id % 1000003) * 2654435761 + 7919) % 1000 AS h
        |  FROM documents),
        |r AS (
        |  SELECT source, n_chars,
        |         full_epochs + CASE WHEN h < frac_thresh THEN 1 ELSE 0 END
        |           AS replicas
        |  FROM w),
        |e AS (
        |  SELECT source, n_chars, unnest(generate_series(1, replicas)) AS epoch
        |  FROM r WHERE replicas >= 1)
        |SELECT source, epoch, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS epoch_chars
        |FROM e GROUP BY 1, 2""".stripMargin,
    "c17_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |         CAST(sum(n_chars) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum
        |  FROM documents),
        |t AS (SELECT sum(n_chars) AS tw FROM documents)
        |SELECT doc_id, n_chars, cum
        |FROM w CROSS JOIN t
        |WHERE (cum * 200) // tw > ((cum - n_chars) * 200) // tw""".stripMargin,
    "c11_decontaminate_apply" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks) - 12)) AS i
        |        FROM t WHERE len(toks) >= 13) u),
        |ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 19 = 0),
        |flagged AS (
        |  SELECT DISTINCT g.doc_id FROM g JOIN ev USING (ng)
        |  WHERE g.doc_id % 19 <> 0)
        |SELECT lang, count(*) AS n_kept,
        |       CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM documents ANTI JOIN flagged USING (doc_id)
        |WHERE doc_id % 19 <> 0
        |GROUP BY lang""".stripMargin,
    "c10_chunk_documents" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |k AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(0, (len(toks) - 1) // 32)) AS chunk_no
        |  FROM t)
        |SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
        |       CAST(len(toks[32 * chunk_no + 1 : 32 * chunk_no + 40]) AS BIGINT)
        |         AS chunk_tokens,
        |       array_to_string(toks[32 * chunk_no + 1 : 32 * chunk_no + 40], ' ')
        |         AS chunk_text
        |FROM k""".stripMargin,
    "c16_token_apportion" ->
      """WITH lt AS (
        |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM lt),
        |q AS (
        |  SELECT lang, n_tokens,
        |         (100000 * n_tokens) // tot AS base,
        |         (100000 * n_tokens) % tot AS rem
        |  FROM lt CROSS JOIN tot),
        |lo AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS leftover FROM q),
        |r AS (SELECT q.*, row_number() OVER (ORDER BY rem DESC, lang) AS rk
        |      FROM q)
        |SELECT lang, n_tokens,
        |       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |         AS alloc_tokens
        |FROM r CROSS JOIN lo""".stripMargin,
    "c24_filter_sweep" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |q AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt,
        |         CAST(len(list_filter(toks, x -> length(x) <= 2)) AS BIGINT)
        |           AS nshort
        |  FROM d),
        |b AS (
        |  SELECT (1000 - (nshort * 1000) // nt) // 100 AS bucket,
        |         count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        |  FROM q GROUP BY 1),
        |c AS (
        |  SELECT bucket, n_docs, n_tokens,
        |         CAST(sum(n_docs) OVER win AS BIGINT) AS docs_kept,
        |         CAST(sum(n_tokens) OVER win AS BIGINT) AS tokens_kept
        |  FROM b WINDOW win AS (ORDER BY bucket DESC
        |                        ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tt FROM b)
        |SELECT bucket * 100 AS min_q_pm, n_docs, n_tokens, docs_kept,
        |       tokens_kept, round(tokens_kept / tt, 9) AS token_share_kept
        |FROM c CROSS JOIN t""".stripMargin,
    "c23_split_repair" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN ((doc_id % 1000003) * 2654435761 + 97) % 1000 < 800
        |              THEN 'train'
        |              WHEN ((doc_id % 1000003) * 2654435761 + 97) % 1000 < 900
        |              THEN 'val' ELSE 'test' END AS split,
        |         string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, split, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT doc_id, split, toks,
        |               unnest(generate_series(1, len(toks) - 12)) AS i
        |        FROM t WHERE len(toks) >= 13) u),
        |tr AS (SELECT DISTINCT ng FROM g WHERE split = 'train'),
        |lk AS (
        |  SELECT DISTINCT g.doc_id FROM g JOIN tr USING (ng)
        |  WHERE g.split <> 'train'),
        |r AS (
        |  SELECT t.doc_id, t.n_chars, t.split,
        |         CASE WHEN t.split <> 'train' AND lk.doc_id IS NOT NULL
        |              THEN 'train' ELSE t.split END AS final_split,
        |         CASE WHEN t.split <> 'train' AND lk.doc_id IS NOT NULL
        |              THEN 1 ELSE 0 END AS moved
        |  FROM t LEFT JOIN lk ON lk.doc_id = t.doc_id)
        |SELECT final_split AS split, count(*) AS n_docs,
        |       CAST(sum(moved) AS BIGINT) AS n_moved_in,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM r GROUP BY 1""".stripMargin,
    "c15_split_leakage" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN ((doc_id % 1000003) * 2654435761 + 97) % 1000 < 800
        |              THEN 'train'
        |              WHEN ((doc_id % 1000003) * 2654435761 + 97) % 1000 < 900
        |              THEN 'val' ELSE 'test' END AS split,
        |         string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, split, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT doc_id, split, toks,
        |               unnest(generate_series(1, len(toks) - 12)) AS i
        |        FROM t WHERE len(toks) >= 13) u),
        |tr AS (SELECT DISTINCT ng FROM g WHERE split = 'train'),
        |lk AS (
        |  SELECT split, count(DISTINCT doc_id) AS n_leaked
        |  FROM g JOIN tr USING (ng) WHERE split <> 'train' GROUP BY 1),
        |nd AS (
        |  SELECT split, count(DISTINCT doc_id) AS n_docs
        |  FROM g WHERE split <> 'train' GROUP BY 1)
        |SELECT nd.split, nd.n_docs, COALESCE(lk.n_leaked, 0) AS n_leaked
        |FROM nd LEFT JOIN lk ON lk.split = nd.split""".stripMargin,
    "c14_mixture_weights" ->
      """WITH lt AS (
        |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |sq AS (
        |  SELECT lang, n_tokens,
        |         CAST(round(sqrt(n_tokens), 9) AS DECIMAL(38,9)) AS sq FROM lt),
        |tot AS (SELECT CAST(sum(sq) AS DOUBLE) AS t FROM sq)
        |SELECT lang, n_tokens,
        |       round(CAST(sq AS DOUBLE) / t, 9) AS weight,
        |       round(100000 * round(CAST(sq AS DOUBLE) / t, 9), 9) AS expected_tokens
        |FROM sq CROSS JOIN tot""".stripMargin,
    "c09_decontaminate_ngram" -> ngramDecontOracle,
    // identical output by construction: the Bloom screen has no false
    // negatives and the exact verify join removes its false positives
    "c13_decontaminate_bloom" -> ngramDecontOracle,
    "c26_persisted_bloom" -> ngramDecontOracle,
    "c29_waterfill_mixture" ->
      """WITH ps AS (
        |  SELECT source,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
        |  FROM documents GROUP BY source),
        |pw AS (SELECT source, avail, avail * avail AS w FROM ps),
        |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS ta,
        |               CAST(sum(w) AS BIGINT) AS tw FROM pw),
        |pre AS (
        |  SELECT pw.source, pw.avail, pw.w, tot.tw, (9 * tot.ta) // 10 AS b,
        |         CAST(coalesce(sum(pw.avail) OVER (
        |           ORDER BY CAST(pw.avail AS DOUBLE) / pw.w, pw.source
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS sa_pre,
        |         CAST(coalesce(sum(pw.w) OVER (
        |           ORDER BY CAST(pw.avail AS DOUBLE) / pw.w, pw.source
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS sw_pre
        |  FROM pw, tot),
        |st AS (SELECT *,
        |              avail * (tw - sw_pre) <= w * (b - sa_pre) AS saturated
        |       FROM pre),
        |rem AS (SELECT min(b) -
        |          CAST(sum(CASE WHEN saturated THEN avail ELSE 0 END) AS BIGINT)
        |            AS b_rem,
        |          CAST(sum(CASE WHEN NOT saturated THEN w ELSE 0 END) AS BIGINT)
        |            AS w_rem
        |        FROM st),
        |base AS (
        |  SELECT st.*, rem.b_rem, rem.w_rem,
        |         CASE WHEN saturated THEN avail
        |              ELSE (rem.b_rem * w) // rem.w_rem END AS base,
        |         CASE WHEN saturated THEN -1
        |              ELSE (rem.b_rem * w) % rem.w_rem END AS lr_rem
        |  FROM st, rem),
        |lo AS (SELECT min(b_rem) -
        |         CAST(sum(CASE WHEN NOT saturated THEN base ELSE 0 END) AS BIGINT)
        |           AS leftover
        |       FROM base)
        |SELECT source, avail, saturated,
        |       CAST(base + CASE WHEN NOT saturated AND
        |         row_number() OVER (ORDER BY lr_rem DESC, source) <= lo.leftover
        |         THEN 1 ELSE 0 END AS BIGINT) AS allocation
        |FROM base, lo""".stripMargin,
    "c28_training_order" ->
      """SELECT row_number() OVER (ORDER BY k, doc_id) - 1 AS position,
        |       doc_id, source
        |FROM (SELECT doc_id, source,
        |             ((doc_id % 1000003) * 2654435761 + 40503) % 1000000007 AS k
        |      FROM documents) t""".stripMargin,
    "c27_datasheet" ->
      """SELECT source,
        |       count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
        |       CAST(sum(CAST(len(string_split(text, ' ')) AS DECIMAL(38,6)))
        |            AS DOUBLE) / count(*) AS mean_tokens,
        |       CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
        |       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
        |       CAST(sum(CASE WHEN len(string_split(text, ' ')) < 20
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |       CAST(sum(CASE WHEN len(string_split(text, ' ')) < 20
        |                     THEN 1 ELSE 0 END) AS BIGINT) * 1000 // count(*)
        |         AS short_pm
        |FROM documents
        |GROUP BY source""".stripMargin,
    "c25_dsir_weights" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 19 = 0 AS is_target,
        |         unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |vb AS (
        |  SELECT term,
        |         CASE WHEN length(term) = 0 THEN 0
        |              ELSE list_reduce(
        |                list_prepend(CAST(0 AS BIGINT),
        |                  list_transform(range(1, length(term) + 1),
        |                    i -> CAST(ord(substring(term, i, 1)) AS BIGINT))),
        |                (acc, c) -> (acc * 31 + c) % 1000000007) % 8192 END AS b
        |  FROM (SELECT DISTINCT term FROM t) v),
        |cnt AS (
        |  SELECT b,
        |         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |         CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
        |  FROM t JOIN vb USING (term) GROUP BY b),
        |tot AS (
        |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
        |  FROM cnt),
        |lam AS (
        |  SELECT b, CAST(round(ln(CAST((ct + 1) * (nr + 8192) AS DOUBLE)
        |                           / ((cr + 1) * (nt + 8192))), 9)
        |                 AS DECIMAL(38,9)) AS lam
        |  FROM cnt, tot),
        |tl AS (SELECT term, lam FROM vb JOIN lam USING (b))
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(lam) AS DOUBLE) AS dsir_weight
        |FROM t JOIN tl USING (term)
        |WHERE NOT is_target
        |GROUP BY doc_id
        |ORDER BY dsir_weight DESC, doc_id
        |LIMIT 100""".stripMargin,
    "c01_stratified_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |         ((doc_id % 1000003) * 2654435761 + 40503) % 1000000007 AS h
        |  FROM documents)
        |SELECT lang, doc_id, h FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |              ORDER BY h, doc_id) AS rk FROM h) t
        |WHERE rk <= 20""".stripMargin,
    "c03_hash_split" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |         ((doc_id % 1000003) * 2654435761 + 97) % 1000 AS h
        |  FROM documents)
        |SELECT CASE WHEN h < 800 THEN 'train'
        |            WHEN h < 900 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM h GROUP BY 1""".stripMargin,
    "c04_split_by_cluster" ->
      s"""WITH RECURSIVE ${DedupQueries.ClustersCte},
         |s AS (
         |  SELECT d.doc_id, d.n_chars,
         |         ((coalesce(cc.cluster_rep, d.doc_id) % 1000003) * 2654435761 + 97)
         |           % 1000 AS h
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id)
         |SELECT CASE WHEN h < 800 THEN 'train'
         |            WHEN h < 900 THEN 'val' ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM s GROUP BY 1""".stripMargin,
    "c05_mixture_sample" ->
      """WITH h AS (
        |  SELECT source, n_chars,
        |         ((doc_id % 1000003) * 2654435761 + 12289) % 1000000007 AS h,
        |         CASE WHEN source IN ('src0', 'src1') THEN 1.0
        |              WHEN source IN ('src2', 'src3', 'src4') THEN 0.5
        |              ELSE 0.2 END AS keep_frac
        |  FROM documents)
        |SELECT source, count(*) AS n_kept,
        |       CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM h WHERE h < keep_frac * 1000000007
        |GROUP BY source""".stripMargin,
    "c08_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(toks)),
        |           i -> toks[i] || ' ' || toks[i+1])) AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 2),
        |e AS (
        |  SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle FROM t),
        |hot AS (
        |  SELECT shingle FROM e WHERE doc_id % 19 <> 0
        |  GROUP BY shingle HAVING count(*) > 64),
        |ec AS (
        |  SELECT * FROM e
        |  WHERE doc_id % 19 <> 0
        |    AND shingle NOT IN (SELECT shingle FROM hot)),
        |scores AS (
        |  SELECT c.doc_id AS corpus_doc, v.doc_id AS eval_doc,
        |         c.n AS nc, v.n AS nv, count(*) AS inter
        |  FROM ec c JOIN e v ON c.shingle = v.shingle
        |  WHERE v.doc_id % 19 = 0
        |  GROUP BY 1, 2, 3, 4),
        |j AS (
        |  SELECT corpus_doc, eval_doc,
        |         inter / (nc + nv - inter) AS jaccard
        |  FROM scores)
        |SELECT corpus_doc, eval_doc, jaccard
        |FROM (SELECT *, row_number() OVER (PARTITION BY corpus_doc
        |        ORDER BY jaccard DESC, eval_doc) AS rk FROM j) t
        |WHERE rk <= 1 AND jaccard >= 0.3""".stripMargin,
    "c07_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         ((doc_id % 1000003) * 2654435761 + 271) % 32 AS shard
        |  FROM documents),
        |p AS (
        |  SELECT lang, shard, n_tokens,
        |         CAST((CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          - n_tokens) // 1024 AS BIGINT) AS pack_id
        |  FROM t)
        |SELECT lang, shard, pack_id, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM p GROUP BY 1, 2, 3""".stripMargin,
    "c02_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         sqrt(len(toks))
        |           - len(list_filter(toks, x -> length(x) <= 2)) / len(toks) * 2.0
        |           + (n_chars - len(toks) + 1) / len(toks) * 0.1 AS score
        |  FROM t)
        |SELECT lang, count(*) AS n_kept,
        |       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
        |FROM u
        |WHERE score >= (SELECT quantile_cont(score, 0.8) FROM u)
        |GROUP BY lang""".stripMargin,
    // c06's verdict gate (round-8 item 6): exact per-lang stats + the
    // sketch threshold's rank contract asserted as literal 1
    "c06_token_budget_approx" ->
      """WITH t AS (
        |  SELECT lang, string_split(text, ' ') AS toks FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(len(toks)) AS BIGINT) AS lang_tokens,
        |       CAST(1 AS BIGINT) AS rank_ok
        |FROM t GROUP BY lang""".stripMargin,
    "c12_token_budget_bpe" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
         |  FROM documents),
         |u AS (
         |  SELECT doc_id, lang,
         |         sqrt(len(toks))
         |           - len(list_filter(toks, x -> length(x) <= 2)) / len(toks) * 2.0
         |           + (n_chars - len(toks) + 1) / len(toks) * 0.1 AS score
         |  FROM t),
         |bpe AS (
         |  SELECT doc_id,
         |         CAST(len(regexp_split_to_array(
         |           trim(${TextQueries.duckBpeEncode}), ' +')) AS BIGINT) AS n_bpe
         |  FROM documents)
         |SELECT lang, count(*) AS n_kept,
         |       CAST(sum(n_bpe) AS BIGINT) AS kept_bpe_tokens
         |FROM u JOIN bpe USING (doc_id)
         |WHERE score >= (SELECT quantile_cont(score, 0.8) FROM u)
         |GROUP BY lang""".stripMargin,
  )
}
