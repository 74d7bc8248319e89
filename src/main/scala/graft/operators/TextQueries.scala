package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline (brief §extended):
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. All are single-pass, codegen'd expression pipelines over
  * the scan — no shuffle at all until an (optional) aggregate, so they
  * stream at parquet-scan speed regardless of corpus size.
  *
  * Every query here is oracle-checked: the expression trees are written
  * identically on both engines (same op order), so double results match
  * bit-for-bit without tolerance.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** N-gram/stopword language-ID heuristic. The fixture text is synthetic
    * word soup, so the interesting output is the deterministic score
    * pipeline, not classifier accuracy; `agrees_label` records agreement
    * with the labeled lang for audit.
    */
  def t01_lang_id(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("en_stop_ratio", expr(
        "size(filter(toks, x -> array_contains(array('the', 'a', 'of', 'and'), x)))") /
        col("n_tokens"))
      .withColumn("predicted_lang",
        when(col("en_stop_ratio") >= 0.04, "en").otherwise("other"))
      .select(col("doc_id"), col("n_tokens"), col("en_stop_ratio"),
        col("predicted_lang"),
        (col("predicted_lang") === col("lang")).as("agrees_label"))

  /** Quality scoring: length/stopword/short-token ratios folded into a
    * deterministic score + bucket.
    */
  def t02_quality_score(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("short_ratio",
        expr("size(filter(toks, x -> length(x) <= 2))") / col("n_tokens"))
      .withColumn("avg_token_len",
        (col("n_chars") - col("n_tokens") + 1) / col("n_tokens"))
      // sqrt, not ln: Math.log and libm log can differ by 1 ulp, sqrt is
      // correctly-rounded everywhere -> bit-identical scores cross-engine
      .withColumn("score",
        sqrt(col("n_tokens")) - col("short_ratio") * 2.0 +
          col("avg_token_len") * 0.1)
      .select(col("doc_id"), col("n_tokens"), col("short_ratio"),
        col("avg_token_len"), col("score"),
        when(col("score") >= 7.5, "keep").otherwise("drop").as("verdict"))

  /** Token counting three ways: whitespace split, alpha-run regex, and a
    * BPE-ish bounded-piece regex (greedy 1-4 char pieces — the token-budget
    * estimator shape).
    */
  def t03_token_stats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).cast("long").as("n_alpha_runs"),
        regexp_count(col("text"), lit("[a-z]{1,4}")).cast("long").as("n_bpeish"))

  /** Polynomial rolling-hash fingerprint over the character stream
    * (mod 1e9+7, base 31) — built from `aggregate`/`transform` HOFs so the
    * whole thing stays inside codegen; identical fold on the DuckDB side via
    * list_reduce with a prepended zero accumulator.
    */
  def t04_fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(
        "aggregate(transform(sequence(1, length(text)), i -> CAST(ascii(substring(text, i, 1)) AS LONG)), " +
          "0L, (acc, c) -> (acc * 31 + c) % 1000000007)").as("fingerprint"))

  /** TF-IDF top terms per document: tokenize -> term frequencies ->
    * document frequencies -> idf join -> rank window. The inverted-index
    * shape again (explode + two hash aggregates + a shuffle join on the
    * term-df side, AQE-broadcast when small); corpus size N arrives via a
    * broadcast 1-row aggregate
    * (scalar-subquery shape). idf is rounded to 9dp before the multiply:
    * ln() differs by 1 ulp across libm implementations (~1e-16, far below
    * the 0.5e-9 boundary), and long * exact-rounded-double is then
    * bit-identical on both engines.
    */
  def t05_tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    // no broadcast hint on dfreq: vocabulary grows with the corpus (Heaps'
    // law) — let AQE pick broadcast only when the df side is actually small
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * round(log(col("n_docs") / col("df")), 9))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("tfidf"))
  }

  /** PII-style redaction: emails, long digit runs, and (so the synthetic
    * word-soup fixture actually exercises a rewrite) 12+-char words, each
    * replaced by a tag. Pure per-row regexp projection — scan-speed, no
    * shuffle; patterns are deliberately RE2-and-Java compatible (character
    * classes + bounded repetition only) so both engines rewrite
    * identically, letting the oracle compare the redacted TEXT, not just
    * the counts.
    */
  def t06_redact(s: SparkSession, d: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val num = "[0-9]{6,}"
    val longw = "[a-z]{12,}"
    Tables.documents(s, d)
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          email, "[EMAIL]"), num, "[NUM]"), longw, "[LONG]"))
      .select(col("doc_id"),
        regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(num)).cast("long").as("n_longnums"),
        regexp_count(col("text"), lit(longw)).cast("long").as("n_longwords"),
        col("redacted"),
        length(col("redacted")).cast("long").as("redacted_chars"))
  }

  /** BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed keyword query —
    * the lexical-search ranking a data pipeline runs to mine relevant
    * documents. Inverted-index shapes again: per-(doc, term) tf, per-term
    * df, corpus stats via a broadcast 1-row aggregate; top-10 docs per
    * term through the native partial-heap top-k. avgdl goes through the
    * exact decimal mean and idf is rounded to 9dp before the multiply
    * (t05's ln-ulp containment), so even this log-based score is fully
    * hash-checked. Emits per-(term, doc) scores — the cross-term sum
    * would re-order float addition; a consumer sums the k1-normalized
    * term scores per doc downstream.
    */
  def t07_bm25(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("data", "hash", "scan")
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        split(col("text"), " ").as("toks"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(stats))
      .withColumn("idf9",
        expr("round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9)"))
      .withColumn("bm25", expr(
        "idf9 * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("bm25"))
    graft.plans.TopKPerGroup.topK(scored, Seq("term"),
      Seq(graft.plans.TopKPerGroup.Ord("bm25", desc = true),
        graft.plans.TopKPerGroup.Ord("doc_id")), 10)
  }

  /** Repetition-based quality rules (the Gopher/MassiveText family —
    * Rae et al. 2021, arXiv:2112.11446 §A1.1): fraction of duplicate word
    * occurrences plus the mass of the most-frequent 2-gram and 3-gram.
    * Boilerplate and template spam score high on all three long before a
    * near-dup pass would catch them, so this is the cheap first filter in
    * a curation pipeline.
    *
    * Shape at scale: the n-gram frequency aggregates key on
    * (doc_id, ngram) — partial-aggregated map-side, and doc_id in the key
    * means no hot reducer regardless of how skewed the ngram vocabulary
    * is. Cost is linear in corpus tokens, the floor for any repetition
    * scorer. All ratios are exact-int divisions, so doubles match the
    * oracle bit-for-bit.
    */
  def t08_repetition(s: SparkSession, d: String): DataFrame = {
    // three consumers (dup-word base, bigram frac, trigram frac) read this
    // projection — checkpoint so the corpus is scanned and tokenized ONCE,
    // not three times (the d03 lesson)
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .localCheckpoint()
    // top n-gram mass per doc: count every (overlapping) n-gram occurrence,
    // then max/sum within the doc. Docs shorter than n tokens are dropped
    // BEFORE the sequence: sequence(0, -1) is a descending array in Spark,
    // and slice(toks, 0, n) then aborts the query — and the oracle's
    // generate_series is simply empty for them (the inner joins below drop
    // them from the result on both engines, consistently)
    def topFrac(n: Int, outCol: String): DataFrame =
      docs.filter(size(col("toks")) >= n)
        .select(col("doc_id"),
          explode(expr(s"transform(sequence(0, size(toks) - $n), i -> " +
            s"array_join(slice(toks, i + 1, $n), ' '))")).as("ng"))
        .groupBy(col("doc_id"), col("ng")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg((max(col("cnt")) / sum(col("cnt"))).as(outCol))
    docs
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")) / col("n_tokens"))
          .as("dup_word_frac"))
      .join(topFrac(2, "top_bigram_frac"), "doc_id")
      .join(topFrac(3, "top_trigram_frac"), "doc_id")
      .withColumn("verdict",
        when(col("dup_word_frac") > 0.7 or col("top_bigram_frac") > 0.11 or
          col("top_trigram_frac") > 0.09, "drop").otherwise("keep"))
  }

  /** Lexical diversity via the Simpson index: the probability two token
    * positions drawn without replacement hold the SAME word,
    * sum c·(c-1) / (n·(n-1)) over per-doc term counts c — an
    * information-density signal like entropy but built from pure integer
    * arithmetic, so the score itself is hash-checked (entropy's ln would
    * need ulp containment). High repetition → high index; the inverse
    * (1 - index) is the diversity score curation thresholds use. One
    * (doc_id, term) hash aggregate then a per-doc fold — linear, keyed,
    * no hot reducer.
    */
  def t09_diversity(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * (col("c") - 1)).as("coll"))
      .filter(col("n_tokens") >= 2)
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        (col("coll") / (col("n_tokens") * (col("n_tokens") - 1)))
          .as("simpson_index"))

  /** Fixed greedy-match vocabulary for t15 — the WordPiece-style longest-
    * match tokenizer (kept next to t10's true BPE as the contrast every
    * tokenizer survey draws): a mix of whole-word pieces and sub-word
    * stems. Deterministic and engine-shareable; unknown characters fall
    * back to single-symbol pieces.
    */
  private[graft] val BpeVocab: Seq[String] = Seq(
    // whole-word pieces
    "the", "data", "join", "scan", "hash", "sort", "merge", "query",
    "batch", "value", "order", "stream", "filter", "window", "spark",
    // sub-word merges
    "cust", "omer", "col", "umn", "tab", "le", "part", "row", "key",
    "group", "agg", "line", "fast", "slow", "small", "big", "vec", "tor",
    "er", "st", "an", "on", "re", "in", "at", "al", "en", "es")

  /** Greedy longest-match tokenization as ONE regex alternation: pieces
    * sorted longest-first, single-symbol fallbacks last. Regex scanning is
    * leftmost-first in both Java (Spark) and RE2 (DuckDB), and with the
    * alternation length-ordered, leftmost-first IS longest-match — the
    * entire vocab walk becomes a codegen'd single pass with no UDF and an
    * exact SQL twin.
    */
  private[graft] val BpePattern: String =
    BpeVocab.sortBy(v => (-v.length, v))
      .mkString("(?:", "|", "|[a-z0-9]|[^a-z0-9 ])")

  /** Greedy longest-match tokenization (WordPiece-style) as ONE regex
    * alternation: pieces sorted longest-first, single-symbol fallbacks
    * last. Regex scanning is leftmost-first in both Java (Spark) and RE2
    * (DuckDB), and with the alternation length-ordered, leftmost-first IS
    * longest-match — the entire vocab walk is a codegen'd single pass with
    * no UDF and an exact SQL twin. (Previously misnamed t10 "BPE"; the
    * true rank-ordered merge tokenizer is t10 below.)
    */
  def t15_wordpiece_greedy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("pieces",
        expr(s"regexp_extract_all(lower(text), '$BpePattern', 0)"))
      .select(col("doc_id"),
        size(col("pieces")).cast("long").as("n_tokens"),
        expr("array_join(slice(pieces, 1, 12), '|')").as("head_pieces"),
        (length(col("text")) / size(col("pieces"))).as("chars_per_token"))

  /** TRUE BPE merge table for t10, in rank order (the merges.txt a real
    * tokenizer ships, GPT-2 shape). Well-formedness invariant: each rank's
    * operands are base characters or products of STRICTLY earlier ranks —
    * which is what makes one ascending pass over ranks (each to fixpoint)
    * equivalent to the reference iterative algorithm that repeatedly
    * merges the lowest-rank pair present (a later merge can never create
    * an occurrence of an earlier-rank pair).
    */
  private[graft] val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
    "o" -> "r", "s" -> "t", "a" -> "r", "o" -> "u", "i" -> "t",
    "in" -> "g")

  /** Sweeps per rank to reach the merge's fixpoint with non-overlapping
    * left-to-right `replace`: a run of n identical adjacent pairs loses
    * the shared boundary space at every other occurrence, halving per
    * sweep — 6 sweeps cover runs past any real word length.
    */
  private val BpeSweeps = 6

  /** Symbol-sequence encoding: one space AFTER every character plus one
    * leading space, so a word-internal adjacent pair (x, y) is the
    * substring " x y " while word boundaries widen to 3+ spaces that no
    * merge pattern can cross. Each merge rank is then plain (non-regex)
    * `replace(" x y " -> " xy ")` — identical left-to-right
    * non-overlapping semantics in Spark and DuckDB, so the whole
    * tokenizer sits under the hash gate.
    */
  private[graft] def bpeEncode(text: Column): Column = {
    var s = concat(lit(" "), regexp_replace(lower(text), "(.)", "$1 "))
    for ((a, b) <- BpeMerges; _ <- 1 to BpeSweeps)
      s = call_function("replace", s, lit(s" $a $b "), lit(s" $a$b "))
    s
  }

  /** Final pieces: symbols are single-space separated, boundaries 2+. */
  private[graft] def bpePieces(text: Column): Column =
    split(trim(bpeEncode(text)), " +")

  /** The DuckDB twin of [[bpeEncode]] — the same 16 ranks x 6 sweeps as
    * nested `replace` calls over the same char-spaced encoding.
    */
  private[graft] def duckBpeEncode: String = {
    var s = "' ' || regexp_replace(lower(text), '(.)', '\\1 ', 'g')"
    for ((a, b) <- BpeMerges; _ <- 1 to BpeSweeps)
      s = s"replace($s, ' $a $b ', ' $a$b ')"
    s
  }

  /** Rank-ordered BPE tokenizer APPLICATION over the corpus (the real
    * token-budget input — t03's regex only estimates): per-doc piece
    * count, the first pieces themselves (hash-checking the actual merge
    * walk, not just totals), and the chars-per-token compression ratio.
    * Zero-shuffle projection; the merge table compiles to a chain of
    * codegen'd constant-pattern `replace` kernels (a broadcast table +
    * join once vocabs reach 50k learned merges). QueriesSpec pins
    * hand-computed rank-order tokenizations, including a case where rank
    * order and greedy longest-match (t15) disagree.
    */
  def t10_bpe_tokenize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("pieces", bpePieces(col("text")))
      .select(col("doc_id"),
        size(col("pieces")).cast("long").as("n_tokens"),
        expr("array_join(slice(pieces, 1, 12), '|')").as("head_pieces"),
        (length(col("text")) / size(col("pieces"))).as("chars_per_token"))

  /** Bigram language-model quality scoring — the CCNet/KenLM filter shape
    * (Wenzek et al. 2020, arXiv:1911.00359 §3.2: docs are ranked by LM
    * perplexity and the worst tail dropped). The LM here is self-trained
    * on the corpus: P(w2|w1) = c(w1 w2) / c(w1 ·), and a doc's score is
    * its mean bigram log-probability. Low scores = improbable word
    * transitions = gibberish/boilerplate.
    *
    * Determinism: ln is ulp-contained by round-to-9dp (the t05 playbook),
    * and the per-doc mean sums those 9dp values through DECIMAL(38,9) —
    * exact, order-independent — before ONE final double division.
    *
    * Shape at scale: bigram counts are two map-side-partial hash
    * aggregates; the probability table joins back onto the occurrence
    * stream by its (w1, w2) key — linear in token count, vocabulary-sized
    * build sides, no hot reducer. The occurrence stream is checkpointed
    * so tokenization runs once for counts and scoring.
    */
  def t11_lm_quality(s: SparkSession, d: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val bi = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(" +
          "element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint() // LM training + scoring share one tokenize pass
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val lm = c2.join(c1, "w1")
      .select(col("w1"), col("w2"),
        round(log(col("c12") / col("c1")), 9).cast(dec9).as("lp"))
    bi.join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")).cast("double") / count(lit(1))).as("avg_logprob"))
  }

  /** Quality-filter FUNNEL with first-failing-rule attribution — the
    * ablation table every curation pipeline publishes (C4 §2.2, Gopher
    * §A1.1, FineWeb's per-filter token accounting): an ordered rule chain
    * where each dropped doc is attributed to the FIRST rule that rejected
    * it, plus surviving doc/token mass. One pass over the corpus: all five
    * rule signals are codegen'd array expressions in the scan stage, the
    * verdict is a single CASE, and the funnel is one 6-group hash
    * aggregate (map-side partials) — no per-rule re-scans. Every rule
    * compares scaled INTEGERS (nshort*100 > nt*6, never nshort/nt > 0.06),
    * so no doc sits on a float threshold boundary and the funnel
    * hash-checks cross-engine.
    */
  def t12_filter_funnel(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nshort",
        expr("size(filter(toks, x -> length(x) <= 2))").cast("long"))
      .withColumn("nstop", expr(
        "size(filter(toks, x -> array_contains(array('the','a','of','and'), x)))")
        .cast("long"))
      .withColumn("ndist", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("verdict",
        when(col("nt") < 15, "r1_too_short")
          .when(col("nt") > 90, "r2_too_long")
          .when(col("nshort") * 100 > col("nt") * 6, "r3_short_tokens")
          .when(col("nstop") * 1000 < col("nt") * 20, "r4_low_stopword")
          .when((col("nt") - col("ndist")) * 100 > col("nt") * 65, "r5_repetitive")
          .otherwise("z_kept"))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))

  /** Classifier evaluation as an operator: the confusion matrix of t01's
    * n-gram language detector against the labeled corpus, plus per-cell
    * corpus share — the quality-loop artifact every classifier-driven
    * curation step (lang-ID, quality filters, toxicity) reports before
    * its thresholds are trusted. One pass, one grouped count; the share
    * divides by a broadcast scalar total.
    */
  def t13_lang_confusion(s: SparkSession, d: String): DataFrame = {
    val pred = t01_lang_id(s, d).select(col("doc_id"), col("predicted_lang"))
    val labeled = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val cells = labeled.join(pred, "doc_id")
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val total = labeled.agg(count(lit(1)).as("n_total"))
    cells.crossJoin(broadcast(total))
      .select(col("lang"), col("predicted_lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_total"), 9).as("share"))
  }

  /** C4-style normalization APPLY (Raffel et al. §2.2's cleanup stage made
    * concrete): lowercase, squash every non-[a-z0-9 .,] character to a
    * space, collapse runs, trim, and drop docs that clean down to under 20
    * chars — emitting the REWRITTEN text (hash-checked verbatim, like d14
    * and c10), not just counts. Pure per-row regexp projection —
    * scan-speed, zero shuffle; patterns are RE2-and-Java compatible
    * (classes + bounded repetition) so both engines rewrite identically.
    */
  def t14_normalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("cleaned", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 .,]", " "),
        " {2,}", " ")))
      .filter(length(col("cleaned")) >= 20)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(col("cleaned")).cast("long").as("n_chars_clean"),
        col("cleaned"))

  /** Per-language vocabulary statistics — the corpus-health dashboard
    * numbers (vocabulary size, hapax-legomena mass, type-token ratio) a
    * curation pipeline tracks per shard to spot boilerplate floods (TTR
    * collapses) or OCR noise (hapax ratio spikes). One explode + two
    * keyed aggregates, the word-count shape Spark's codegen eats; the
    * per-(lang, token) intermediate is bounded by vocabulary size, never
    * corpus size, so the second aggregate is tiny at any SF. All counts
    * are exact integers; the two ratios are single divisions of exact
    * ints (correctly rounded in both engines) guarded to 9dp ->
    * hash-green.
    */
  def t16_vocab_stats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
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

  /** t20: ZIPF power-law fit of the token-frequency curve — the vocabulary
    * health diagnostic (natural text follows freq ∝ rank^-1; synthetic or
    * template-heavy corpora bend the slope, so a drifting fit flags
    * machine-generated/boilerplate contamination before training). Per
    * language: token counts, top-[[ZipfRanks]] ranks via the native
    * [[graft.plans.TopKPerGroup]] partial heaps (never a full vocabulary
    * sort — at 100 TB the per-language vocab is huge and the heap shuffle
    * carries k rows per partition), then an exact-moment least squares
    * over FIXED-POINT INTEGER logs ([[graft.functions.Log2Micros]] — the
    * t41 hardening: round(ln, 9) is libm-boundary-fragile across
    * environments, integer logs are identical on both engines and every
    * moment is exact int64). Slope is base-invariant; the intercept is
    * reported base-2. Rank ties break on token text — deterministic on
    * both engines (ASCII binary collation).
    */
  def t20_zipf_fit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val top = graft.plans.TopKPerGroup.topK(counts, Seq("lang"),
      Seq(graft.plans.TopKPerGroup.Ord("cnt", desc = true),
        graft.plans.TopKPerGroup.Ord("tok")), ZipfRanks)
    // rank assignment runs on <= ZipfRanks rows per language — bounded
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("tok"))
    // FIXED-POINT INTEGER logs (t41's round-8 hardening applied here too:
    // round(ln(x), 9) is libm-boundary-fragile across environments; the
    // digit-by-digit log2 is the identical integer on both engines, the
    // moments are exact int64, and the final division/round of identical
    // integers is IEEE-deterministic). The slope is base-invariant; the
    // intercept is reported base-2 (lg_intercept = log2 of the rank-1 fit)
    val xy = top.withColumn("rank", row_number().over(w))
      .select(col("lang"),
        graft.functions.TextFunctions.log2_micros(
          col("rank").cast("long")).as("x"),
        graft.functions.TextFunctions.log2_micros(col("cnt")).as("y"))
    xy.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sx2"),
        sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"))
      .select(col("lang"), col("n").as("n_ranks"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sx2") - col("sx") * col("sx")).cast("double"), 9)
          .as("slope"),
        round((col("sy").cast("double") -
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sx2") - col("sx") * col("sx")).cast("double") *
          col("sx").cast("double")) / col("n").cast("double") / lit(1000000.0D),
          9).as("lg_intercept"))
  }

  /** Ranks fitted by t20 (the Zipf head; the tail bends anyway). */
  private val ZipfRanks = 100

  /** t21: LEXICAL-COMPLEXITY (readability) scoring — the
    * Flesch/Gunning-fog family's corpus-scale core: syllables approximated
    * as vowel GROUPS per word (the standard heuristic), per-doc totals,
    * mean syllables/word, and the complex-word (3+ syllable) share. The
    * fixture corpus carries no sentence punctuation, so the sentence-rate
    * term is deliberately absent — what remains is the lexical half every
    * readability formula shares, and the useful curation signal (complex
    * share correlates with domain register). One scan, all codegen'd
    * regex/HOF work, zero shuffles; the complex share is per-mille
    * INTEGER so no doc sits on a float threshold.
    */
  def t21_readability(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("sylls", expr(
        "transform(toks, w -> size(filter(split(w, '[^aeiouy]+'), " +
          "p -> p <> '')))"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        expr("aggregate(sylls, 0L, (a, x) -> a + x)").as("n_syllables"),
        expr("CAST(size(filter(sylls, x -> x >= 3)) AS BIGINT) * 1000 " +
          "div size(toks)").as("complex_pm"))
      .withColumn("avg_syllables",
        round(col("n_syllables").cast("double") / col("n_words"), 9))

  /** t17: distributed BPE merge TRAINING — the other half of the tokenizer
    * story (t10 APPLIES a fixed merge table; this LEARNS one from the
    * corpus, the job SentencePiece/HF tokenizers do single-node). Eight
    * rounds of the classic loop: count adjacent symbol pairs, take the
    * global argmax, merge it corpus-wide, repeat — later rounds merge
    * symbols built by earlier ones (the fixture learns e+r, then m+er).
    * Distribution shape: each round is one explode + one map-side-partial
    * hash aggregate over (pair) keys, then a LIMIT-1 collect (a single
    * driver row — the same k-bounded budget as the IVF seeds), then a
    * chain of codegen'd constant-pattern `replace` kernels; the corpus
    * re-encoding is checkpointed per round so lineage stays flat. Word
    * boundaries cost nothing: the char-spaced encoding leaves 2+ spaces
    * between words, so single-space pair patterns never cross them, and
    * the pair counter skips the empty tokens those boundaries produce.
    * Counts are integers, the argmax tie-break is (count DESC, a, b) in
    * binary string order on both engines, and the merge rewrite is the
    * t10 sweep trick — the learned table itself is hash-checked against
    * DuckDB running the identical eight rounds unrolled as a CTE chain.
    */
  def t17_bpe_train(s: SparkSession, d: String): DataFrame =
    bpeTrain(s, d, sampleMod = 1)

  /** t50: SAMPLED BPE training — the production shape of t17's knob: real
    * tokenizer training runs on a corpus SAMPLE, never the corpus (GPT-2 /
    * SentencePiece train on 10-50 GB slices of TB-scale corpora; merge
    * statistics converge long before the full pair census does). The
    * sample is a deterministic hash slice (doc_id % 4 == 0 — ~25% of
    * docs), so the oracle is the identical eight unrolled rounds over the
    * same WHERE, and the learned table stays hash-checkable. The apply
    * step (t10) is corpus-wide by construction — it takes a fixed merge
    * table. At 100 TB this entry IS the trainer: each generation's
    * checkpoint holds the SAMPLE, not the corpus, so the generational
    * footprint is sampleFrac x corpus regardless of round count (and the
    * eager gen-release below makes it ~ONE sample generation).
    */
  def t50_bpe_train_sampled(s: SparkSession, d: String): DataFrame =
    bpeTrain(s, d, sampleMod = 4)

  /** Shared BPE merge-training loop (t17 full corpus, t50 sampled).
    * Checkpoint lifecycle (round-10 verdict item 1): each round
    * localCheckpoints the re-encoded corpus — semantically REQUIRED
    * materialization (round N+1's pair counts read round N's rewrite;
    * without a checkpoint the lineage re-runs all previous sweeps per
    * round) — but generation N-1 is dead the instant N is materialized,
    * so its blocks are released EAGERLY ([[graft.Checkpoints.release]])
    * instead of pinning all 8 corpus-sized generations until scope exit.
    * Peak pinned footprint: ~2 generations during the swap, flat in round
    * count — KernelPropertiesSpec pins it and the Scale100Probe records it
    * at 25x. Safe because nothing ever reads a released generation again:
    * `best` is collected before the rewrite, and `enc` is reassigned.
    */
  private def bpeTrain(s: SparkSession, d: String, sampleMod: Int): DataFrame = {
    val rounds = 8
    import s.implicits._
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
    val sampled =
      if (sampleMod > 1) docs.filter(col("doc_id") % sampleMod === 0) else docs
    var enc = sampled
      .select(col("doc_id"),
        concat(lit(" "), regexp_replace(lower(col("text")), "(.)", "$1 ")).as("enc"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      // native kernel, not transform(sequence(...)): the HOF spelling is
      // an interpreted lambda with two O(n) element_at walks per position
      // — this is the per-round hot stage (8 full-corpus passes), and the
      // kernel emits the identical non-empty (a, b) census in one walk
      val best = enc
        .select(explode(graft.functions.TextFunctions.adjacent_pairs(
          split(col("enc"), " "))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)
        .collect()(0)
      val (a, b, c) = (best.getString(0), best.getString(1), best.getLong(2))
      learned += ((r.toLong, a, b, c))
      if (r < rounds) {
        var e = col("enc")
        for (_ <- 1 to BpeSweeps)
          e = call_function("replace", e, lit(s" $a $b "), lit(s" $a$b "))
        val next = enc.select(col("doc_id"), e.as("enc")).localCheckpoint()
        graft.Checkpoints.release(enc) // gen r-1: r is materialized (eager)
        enc = next
      }
    }
    graft.Checkpoints.release(enc) // the final generation
    learned.toSeq.toDF("rank", "token_a", "token_b", "n_pairs")
  }

  private def bpeTrainOracle(rounds: Int, where: String = ""): String = {
    val sb = new StringBuilder("WITH enc1 AS (SELECT doc_id, " +
      "' ' || regexp_replace(lower(text), '(.)', '\\1 ', 'g') AS enc " +
      s"FROM documents$where)")
    for (r <- 1 to rounds) {
      sb ++= s""",
        |t$r AS (SELECT doc_id, string_split(enc, ' ') AS toks FROM enc$r),
        |i$r AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM t$r
        |        WHERE len(toks) >= 2),
        |p$r AS (SELECT toks[i] AS a, toks[i+1] AS b, count(*) AS c FROM i$r
        |        WHERE toks[i] <> '' AND toks[i+1] <> '' GROUP BY 1, 2),
        |b$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
      if (r < rounds) {
        var e = "e.enc"
        for (_ <- 1 to BpeSweeps)
          e = s"replace($e, ' ' || b.a || ' ' || b.b || ' ', ' ' || b.a || b.b || ' ')"
        sb ++= s""",
          |enc${r + 1} AS (SELECT e.doc_id, $e AS enc
          |               FROM enc$r e CROSS JOIN b$r b)""".stripMargin
      }
    }
    sb ++= (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, a AS token_a, b AS token_b, " +
        s"c AS n_pairs FROM b$r").mkString("\n", "\nUNION ALL\n", "")
    sb.toString
  }

  /** t18: multinomial naive-Bayes text classifier — train AND score in one
    * operator (the fastText-style quality/domain classifier step every
    * modern curation pipeline runs: CCNet's LM filter's sibling, GPT-3's
    * WebText-vs-CommonCrawl logistic screen, FineWeb-Edu's quality
    * scorer). Docs with doc_id % 5 != 0 train per-class token counts;
    * the held-out 20% are scored with Laplace-smoothed log-likelihoods
    * `ln((c(tok,cls)+1)/(c(cls)+|V|))` plus a document-frequency prior,
    * and the argmax class (ties -> lexicographically first) is the
    * prediction. OOV score tokens drop on both engines (inner join to
    * the vocabulary), the standard NB treatment.
    *
    * The synthetic corpus draws text independently of `lang`, so accuracy
    * sits at chance BY CONSTRUCTION — what the oracle verifies is the
    * training/scoring arithmetic; QueriesSpec additionally plants a
    * class-correlated micro-corpus where the classifier must be right.
    *
    * Determinism: each ln is round-to-9dp ulp-contained (t05/t11
    * playbook), summed through DECIMAL(38,9) — exact and
    * order-independent — so scores AND the argmax hash-check.
    *
    * Scale shape: training = two map-side-partial hash aggregates; the
    * model is |V| x |classes| rows (model-sized, broadcast); scoring is
    * one linear join of the token stream against the broadcast model +
    * a per-doc aggregate. Nothing is quadratic in corpus size.
    */
  def t18_nb_classifier(s: SparkSession, d: String): DataFrame =
    nbClassify(Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s)))

  /** The train+score pipeline over any (doc_id, lang, text) frame —
    * QueriesSpec drives it with a planted class-correlated micro-corpus
    * where the prediction must be right.
    */
  private[graft] def nbClassify(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .localCheckpoint() // one tokenize pass feeds training aggs + scoring
    val train = toks.filter(col("doc_id") % 5 =!= 0)
    val test = toks.filter(col("doc_id") % 5 === 0)
    val classes = train.groupBy(col("lang"))
      .agg(count(lit(1)).as("c_lang"), countDistinct(col("doc_id")).as("n_docs"))
    val vocabN = train.agg(countDistinct(col("tok")).as("v"))
    val totDocs = classes.agg(sum(col("n_docs")).as("tot"))
    val tc = train.groupBy(col("lang").as("cls"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val lp = train.select(col("tok")).distinct()
      .crossJoin(broadcast(classes.select(col("lang").as("cls"), col("c_lang"))))
      .join(tc, Seq("cls", "tok"), "left")
      .crossJoin(broadcast(vocabN))
      .select(col("cls"), col("tok"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("c_lang") + col("v"))), 9).cast(dec9).as("lp"))
    val prior = classes.crossJoin(broadcast(totDocs))
      .select(col("lang").as("cls"),
        round(log(col("n_docs") / col("tot")), 9).cast(dec9).as("lp0"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls"))
    test.join(lp, Seq("tok"))
      .groupBy(col("doc_id"), col("lang"), col("cls"))
      .agg(count(lit(1)).as("n_toks"), sum(col("lp")).as("sl"))
      .join(broadcast(prior), Seq("cls"))
      // one double addition of two exact decimals — Spark's decimal `+`
      // would drop to scale 8 (38,9 + 38,9 needs precision 39)
      .withColumn("score", col("lp0").cast("double") + col("sl").cast("double"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang").as("true_lang"),
        col("cls").as("pred_lang"),
        col("score").cast("double").as("log_prob"), col("n_toks"))
  }

  /** t19: exact AUC at scale (Mann–Whitney U with proper tie credit) —
    * the eval metric every filter/classifier in the pipeline (t02's
    * quality score, t18's classifier, s21's votes) should be judged by,
    * computed WITHOUT sampling or sklearn round-trips: per source, how
    * well does document length separate English from non-English. All
    * integer arithmetic until one final division: group docs per
    * (source, score) into positive/negative counts, one running sum over
    * the score order gives each score level its count of lower-scored
    * negatives, and 2U = Σ pos·(2·neg_below + neg_at) — the "+neg_at"
    * term IS the standard half-credit for ties, kept integral by working
    * with 2U. AUC = 2U / (2PN) as the single double division both
    * engines evaluate identically → hash-green. At 100 TB: one grouped
    * aggregate (score levels, not docs, enter the window) and one
    * per-source running sum — no pairwise comparisons, no global sort of
    * raw documents.
    */
  def t19_auc(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lv = Tables.documents(s, d)
      .withColumn("pos", when(col("lang") === "en", 1L).otherwise(0L))
      .groupBy(col("source"), col("n_chars"))
      .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("n"))
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    lv.withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("u2_part", col("p") * (lit(2L) * (col("cum_n") - col("n")) + col("n")))
      .groupBy(col("source"))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("u2_part")).as("u2"))
      .select(col("source"), col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** The fixed phrase workload for t22 — multi-word queries whose words
    * all occur in the synthetic vocabulary, including one with a REPEATED
    * word (the case where naive distinct-slot counting would break).
    */
  private[graft] val SearchPhrases = Seq("table scan", "hash join", "batch batch")

  /** t22: exact PHRASE search through a positional inverted index — the
    * retrieval primitive BM25 (t07) cannot express: "hash join" must match
    * the two words ADJACENT and ordered, not co-present. Classic IR
    * positional-index query (Manning et al. IIR §2.4) as relational
    * algebra: tokens explode with positions once, phrase words explode
    * with slot indexes, one equi-join on the word aligns candidates, and
    * d17's diagonal trick finishes it — a phrase occurrence at start p is
    * a (phrase, doc, p - slot) group containing ALL slots, so one integer
    * group-count + filter finds every occurrence with no per-phrase
    * scanning. The repeated-word phrase works because a token at (doc,
    * pos) feeds slot i only through start = pos - i: each slot is its own
    * diagonal. Per-phrase top-10 docs ride the native heap operator
    * (count desc, doc_id) — integer counts, hash-green. At 100 TB the
    * positional index is the linear-in-tokens cost every search engine
    * pays; the word join is keyed (broadcastable phrase side), and no
    * window or sort ever sees the corpus.
    */
  def t22_phrase_search(s: SparkSession, d: String): DataFrame = {
    import graft.plans.TopKPerGroup
    import graft.plans.TopKPerGroup.Ord
    import s.implicits._
    val tok = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("term"))
    val pw = SearchPhrases.toDF("phrase")
      .withColumn("ws", split(col("phrase"), " "))
      .withColumn("plen", size(col("ws")).cast("long"))
      .select(col("phrase"), col("plen"), posexplode(col("ws")))
      .select(col("phrase"), col("plen"), (col("pos") + 1).as("slot"),
        col("col").as("word"))
    val occ = tok.join(broadcast(pw), col("term") === col("word"))
      .groupBy(col("phrase"), col("plen"), col("doc_id"),
        (col("pos") - col("slot")).as("start"))
      .agg(count(lit(1)).as("n_slots"))
      .filter(col("n_slots") === col("plen"))
    TopKPerGroup.topK(
      occ.groupBy(col("phrase"), col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences")),
      Seq("phrase"), Seq(Ord("n_occurrences", desc = true), Ord("doc_id")), 10)
  }

  /** t23: n-gram NOVELTY audit — for each document, the share of its
    * distinct 13-grams that first appear in the corpus AT that document
    * (doc_id as arrival order): the per-doc form of the duplication-order
    * question behind dedup ablations (Lee et al. ACL'22) — a doc whose
    * grams all appeared earlier contributes nothing new and is pure
    * memorization surface. One distinct-gram projection, one min(doc_id)
    * aggregate per gram (the "first occurrence" index), one join back and
    * one per-doc count — linear in gram occurrences, never pairwise, the
    * d12 economics. Integer per-mille share -> hash-green.
    */
  def t23_novelty(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.word_shingles
    val g = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"),
        explode(word_shingles(split(lower(col("text")), " "), 13)).as("ng"))
      .distinct()
      .localCheckpoint() // feeds the first-occurrence index AND the join back
    // two-level (DedupQueries.sharedGramDf): a df=1 gram is novel by
    // construction, so only the SHARED sliver needs its first-occurrence
    // index — n_novel = n_grams − |shared grams first seen elsewhere|;
    // the corpus-sized aggregate keys on 8-byte hashes, the min-index
    // and join back run on the duplicated sliver alone
    val sharedFirst = g
      .join(DedupQueries.sharedGramDf(g).select(col("ng")), "ng")
      .groupBy(col("ng")).agg(min(col("doc_id")).as("first_doc"))
    val seenBefore = g.join(sharedFirst, "ng")
      .filter(col("first_doc") =!= col("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_old"))
    g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(seenBefore, Seq("doc_id"), "left")
      .withColumn("n_novel",
        col("n_grams") - coalesce(col("n_old"), lit(0L)))
      .select(col("doc_id"), col("n_grams"), col("n_novel"))
      .withColumn("novelty_pm", expr("(n_novel * 1000) div n_grams"))
  }

  /** t24: PERSISTED BM25 inverted index — the persisted-index family
    * (s17 vectors, d18 minhash, c26 eval bloom) reaching text RETRIEVAL:
    * t07 re-tokenizes the corpus and recounts df/avgdl on every query,
    * which is the prototype shape, not the production one. The offline
    * build tokenizes ONCE and persists the three tables every search
    * engine stores, under a corpus-identity-keyed marker-committed dir:
    *
    *   {{{<dir>/postings  (term, doc_id, dl, tf)  — the inverted index}}}
    *   {{{<dir>/dfreq     (term, df)              — document frequencies}}}
    *   {{{<dir>/stats     (n_docs, avgdl)         — collection statistics}}}
    *
    * The query path probes STORED postings for the query terms (at 100 TB
    * this is a pushed-down term-key lookup against a term-partitioned
    * store — bytes read scale with the POSTING LISTS touched, not the
    * corpus), joins stored df, broadcasts stored stats, and scores with
    * t07's exact formula through the native top-k heaps. Sharing t07's
    * oracle verbatim makes the hash check prove persistence is LOSSLESS:
    * stored-index scoring == recompute-from-text scoring, bit for bit.
    * PlanInvariantsSpec pins the query plan never scanning
    * documents.parquet.
    */
  private[graft] def ensureInvertedIndex(s: SparkSession, d: String): String = {
    val f = new java.io.File(d, "documents.parquet")
    val dir = SketchQueries.partialsDir(
      s"bm25idx_v1_${f.length()}_${f.lastModified()}", d)
    if (!new java.io.File(dir, "_complete").exists()) {
      val docs = Tables.documents(s, d)
        .repartition(Tables.scanPartitions(s))
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl"),
          split(col("text"), " ").as("toks"))
        .localCheckpoint() // one tokenize pass feeds all three tables
      val postings = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint() // feeds the store AND the df rollup
      postings.write.mode("overwrite").parquet(s"$dir/postings")
      postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$dir/dfreq")
      docs.agg(
          count(lit(1)).as("n_docs"),
          (sum(col("dl").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .cast("double") / count(lit(1))).as("avgdl"))
        .write.mode("overwrite").parquet(s"$dir/stats")
      new java.io.File(dir, "_complete").createNewFile()
    }
    dir
  }

  def t24_persisted_bm25(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("data", "hash", "scan")
    val dir = ensureInvertedIndex(s, d)
    val tf = s.read.parquet(s"$dir/postings")
      .filter(col("term").isin(terms: _*))
    val scored = tf
      .join(s.read.parquet(s"$dir/dfreq"), "term")
      .crossJoin(broadcast(s.read.parquet(s"$dir/stats")))
      .withColumn("idf9",
        expr("round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9)"))
      .withColumn("bm25", expr(
        "idf9 * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("bm25"))
    graft.plans.TopKPerGroup.topK(scored, Seq("term"),
      Seq(graft.plans.TopKPerGroup.Ord("bm25", desc = true),
        graft.plans.TopKPerGroup.Ord("doc_id")), 10)
  }

  /** t25: KWIC (keyword-in-context) concordance — the audit view behind
    * every term-level decision in a corpus pipeline (is "scan" the verb or
    * the noun? what surrounds the PII the redactor missed?): for each
    * query term, every occurrence with its ±3-token context window,
    * capped at 20 hits per term through the native heaps (doc_id, pos
    * order — deterministic). One positional explode (the source array
    * rides along, so the context slices are zero-join array ops in the
    * scan), one broadcast-able term filter — linear in matching tokens,
    * no shuffle before the k-bounded heap. String output hash-checks
    * verbatim (the d14/t14 rewritten-text discipline).
    */
  def t25_kwic(s: SparkSession, d: String): DataFrame = {
    import graft.plans.TopKPerGroup
    import graft.plans.TopKPerGroup.Ord
    val terms = Seq("data", "hash", "scan")
    val tok = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), posexplode(col("toks")))
      .select(col("doc_id"), col("toks"), (col("pos") + 1).as("p"),
        col("col").as("term"))
      .filter(col("term").isin(terms: _*))
      .withColumn("lstart", greatest(lit(1), col("p") - 3))
      .select(col("term"), col("doc_id"), col("p").cast("long").as("pos"),
        array_join(slice(col("toks"), col("lstart"), col("p") - col("lstart")), " ")
          .as("left_ctx"),
        array_join(slice(col("toks"), col("p") + 1, lit(3)), " ").as("right_ctx"))
    TopKPerGroup.topK(tok, Seq("term"), Seq(Ord("doc_id"), Ord("pos")), 20)
  }

  /** t26: COLLOCATION mining — statistically-bound word pairs via the
    * Dice coefficient, the pre-tokenizer vocabulary probe ("should
    * `new york` be ONE token?") and the phrase-detection pass word2vec-
    * style pipelines run before training: adjacent-token bigrams from
    * one positional pass (zero joins — the transform/slice lambda rides
    * the scan), unigram and bigram hash aggregates, then
    *
    *   {{{dice_micro = 2 * c(ab) * 1e6  div  (c(a) + c(b))}}}
    *
    * in integer micro-units (count arithmetic only -> hash-green; Dice
    * over PMI because PMI's N²-scaled ratio overflows int64 where Dice
    * stays bounded, and log-free means no cross-engine libm exposure).
    * Support floor c(ab) >= 5 (Mikolov et al.'s min-count) keeps rare-pair
    * noise out; top-20 by (dice, a, b) is a full deterministic order.
    * Scale shape: two map-side-combinable aggregates over the token scan
    * + two keyed joins of the bigram table against the unigram table —
    * vocabulary-sized frames, never corpus-sized; no broadcast hint so
    * AQE decides when the unigram side actually fits (Heaps' law, t05's
    * argument).
    */
  def t26_collocations(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val big = toks.select(explode(expr(
        "transform(slice(ts, 1, size(ts) - 1), (w, i) -> struct(w AS a, ts[i + 1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 5)
    big.join(uni.select(col("w").as("a"), col("cw").as("ca")), "a")
      .join(uni.select(col("w").as("b"), col("cw").as("cb")), "b")
      .withColumn("dice_micro", expr("(2 * cab * 1000000) div (ca + cb)"))
      .orderBy(col("dice_micro").desc, col("a"), col("b"))
      .limit(20)
      .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
        col("dice_micro"))
  }

  /** t27: RAKE keyphrase extraction (Rose et al. 2010) — the unsupervised
    * keyphrase pass document-understanding pipelines run for indexing and
    * topic audit: candidate phrases are the maximal runs of non-stopword
    * tokens (the classic gaps-and-islands rewrite: positional tokens,
    * stopwords filtered, run key = pos − row_number), capped at RAKE's
    * standard 4 words; each word scores deg/freq (deg = summed length of
    * phrases containing it — co-occurrence weighted, freq = its candidate
    * occurrences) and a phrase scores the sum of its words' scores.
    * Scores in integer micro-units (counts only, no floats -> hash-green);
    * top-20 under a full (score, phrase) order. Scale shape: one
    * positional explode rides the scan; the islands window partitions BY
    * DOCUMENT (parallel at any corpus size — never a global window); word
    * stats and phrase re-scores are vocabulary-/phrase-keyed hash
    * aggregates and joins, all map-side combinable.
    */
  def t27_rake_keyphrases(s: SparkSession, d: String): DataFrame =
    rakeFrom(Tables.documents(s, d))

  /** The RAKE pipeline over any (doc_id, text) frame — separated so the
    * spec can pin the hand-computed scores of a planted two-phrase doc.
    */
  private[graft] def rakeFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = graft.Tables.widen(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "w")
    val runs = pos
      .filter(!col("w").isin("the", "a", "of", "and"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .withColumn("run", col("pos") - col("rn"))
    val ph = runs.groupBy(col("doc_id"), col("run"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, w))), " +
        "x -> x.w), ' ')").as("phrase"),
        count(lit(1)).as("n_words"))
      .filter(col("n_words") <= 4)
    val ws = ph.select(col("n_words"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
      .withColumn("sc", expr("(deg * 1000000) div freq"))
    val pc = ph.groupBy(col("phrase"))
      .agg(min(col("n_words")).as("n_words"), count(lit(1)).as("n_occur"))
    pc.withColumn("w", explode(split(col("phrase"), " ")))
      .join(ws.select(col("w"), col("sc")), "w")
      .groupBy(col("phrase"), col("n_words"), col("n_occur"))
      .agg(sum(col("sc")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(20)
      .select(col("phrase"), col("n_words"), col("n_occur"), col("score_micro"))
  }

  /** Substring patterns for t28 — chosen from the fixture vocabulary so
    * matches exist, with one crossing a word boundary (the case a
    * token-level index like t22 cannot serve).
    */
  private[graft] val TrigramPatterns =
    Seq("window", "vector", "merge slow", "the fast")

  /** t28: TRIGRAM-indexed substring search — the pg_trgm idea: arbitrary
    * `LIKE '%pattern%'` predicates are unindexable for a token index
    * (t22/t24 serve WORDS), but every occurrence of a pattern must
    * contain all of the pattern's character trigrams, so a trigram
    * inverted index prunes the corpus to docs matching ALL query trigrams
    * (zero false negatives by construction — pinned in the spec), and the
    * exact `contains` check runs only on that sliver. Non-overlapping
    * occurrence counts come from the replace-length identity — pure
    * integer arithmetic; top-20 docs per pattern through the native
    * heaps. The DuckDB oracle is the INDEPENDENT brute-force scan
    * (position() over every doc), so the hash gate proves the index path
    * loses nothing. Scale: the trigram index is linear in chars (the cost
    * every substring-search engine pays); the candidate join is keyed on
    * trigram with the 4-pattern side broadcast; the verify join touches
    * only candidate docs. Patterns under 3 chars fall back to the scan by
    * contract (pg_trgm pads; we document instead).
    */
  def t28_trigram_search(s: SparkSession, d: String): DataFrame = {
    import graft.plans.TopKPerGroup
    import graft.plans.TopKPerGroup.Ord
    import s.implicits._
    val docs = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"), col("text"))
      .localCheckpoint() // feeds the index build AND the verify join
    val tri = docs
      .withColumn("i", explode(expr("sequence(1, length(text) - 2)")))
      .select(col("doc_id"), expr("substring(text, i, 3)").as("tg"))
      .distinct()
    val pats = TrigramPatterns.toDF("pattern")
      .withColumn("i", explode(expr("sequence(1, length(pattern) - 2)")))
      .select(col("pattern"), expr("substring(pattern, i, 3)").as("tg"))
      .distinct()
      .withColumn("n_tris", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("pattern"))))
    val cand = tri.join(broadcast(pats), "tg")
      .groupBy(col("pattern"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), min(col("n_tris")).as("n_tris"))
      .filter(col("n_hit") === col("n_tris"))
      .select(col("pattern"), col("doc_id"))
    val verified = cand.join(docs, "doc_id")
      .filter(expr("instr(text, pattern) > 0"))
      .select(col("pattern"), col("doc_id"),
        expr("(length(text) - length(replace(text, pattern, ''))) div length(pattern)")
          .as("n_occ"))
    TopKPerGroup.topK(verified, Seq("pattern"),
      Seq(Ord("n_occ", desc = true), Ord("doc_id")), 20)
  }

  /** The index-vs-scan candidate frames over any (doc_id, text) corpus —
    * split out so the spec can pin the zero-false-negative containment on
    * a planted corpus.
    */
  private[graft] def trigramCandidates(docs: DataFrame, pattern: String): DataFrame = {
    val tri = docs
      .withColumn("i", explode(expr("sequence(1, length(text) - 2)")))
      .select(col("doc_id"), expr("substring(text, i, 3)").as("tg"))
      .distinct()
    val pats = docs.sparkSession.createDataFrame(
      Seq(Tuple1(pattern))).toDF("pattern")
      .withColumn("i", explode(expr("sequence(1, length(pattern) - 2)")))
      .select(col("pattern"), expr("substring(pattern, i, 3)").as("tg"))
      .distinct()
      .withColumn("n_tris", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("pattern"))))
    tri.join(broadcast(pats), "tg")
      .groupBy(col("pattern"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), min(col("n_tris")).as("n_tris"))
      .filter(col("n_hit") === col("n_tris"))
      .select(col("doc_id"))
  }

  /** t29: TextRank keyword extraction (Mihalcea & Tarau EMNLP'04) — the
    * graph-based complement of t27's RAKE and t05's TF-IDF: words vote
    * for their neighbors through weighted PageRank over the adjacency
    * graph (edge weight = corpus-wide count of the two words appearing
    * adjacent), so a word is important when important words sit next to
    * it — frequency alone doesn't win. Arithmetic is g01's integer
    * micro-rank scheme, weighted: each round every node distributes its
    * whole rank proportionally to edge weights ((w·r) div strength —
    * mass-conserving, so ranks stay bounded), damping 0.85 as
    * 150000 + 85·c div 100, four rounds unrolled identically in the
    * DuckDB oracle's CTE chain → hash-green. Scale: the adjacency
    * aggregate is one map-side count over the token scan (|V|² keys at
    * worst — vocabulary-sized, Heaps' law); each round is one keyed join
    * + partial-agg sum over |E| rows; top-10 through the native heaps.
    */
  def t29_textrank(s: SparkSession, d: String): DataFrame = {
    import graft.plans.TopKPerGroup
    import graft.plans.TopKPerGroup.Ord
    val rounds = 4
    val tok = Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
    val co = tok.alias("a")
      .join(tok.alias("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + 1 && col("a.w") =!= col("b.w"))
      .groupBy(col("a.w").as("u"), col("b.w").as("v"))
      .agg(count(lit(1)).as("n"))
    // symmetrize: adjacency is undirected, weights add across directions
    val edges = co.select(col("u").as("src"), col("v").as("dst"), col("n"))
      .unionByName(co.select(col("v").as("src"), col("u").as("dst"), col("n")))
      .groupBy(col("src"), col("dst")).agg(sum(col("n")).as("wgt"))
      .localCheckpoint() // feeds strength, nodes, and every round
    val strength = edges.groupBy(col("src")).agg(sum(col("wgt")).as("st"))
    val nodes = edges.select(col("src").as("word")).distinct()
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to rounds) {
      val contrib = edges
        .join(strength, "src")
        .join(ranks.select(col("word").as("src"), col("r")), "src")
        .groupBy(col("dst").as("word"))
        .agg(sum(expr("(wgt * r) div st")).as("c"))
      ranks = nodes.join(contrib, Seq("word"), "left")
        .select(col("word"),
          expr("150000L + (85L * coalesce(c, 0L)) div 100L").as("r"))
    }
    TopKPerGroup.topK(
      ranks.join(strength.select(col("src").as("word"), col("st")), "word")
        .select(lit(1).as("g"), col("word"), col("r").as("rank"), col("st")),
      Seq("g"), Seq(Ord("rank", desc = true), Ord("word")), 10)
      .select(col("word"), col("rank"), col("st"))
  }

  /** t30: cross-source VOCABULARY-OVERLAP matrix — the governance view
    * next to c27's per-source datasheet: pairwise Jaccard between source
    * vocabularies says which feeds are near-mirrors (candidate dedup
    * targets at the SOURCE level, before any doc-level pass) and which
    * contribute genuinely novel language. Distinct (source, word) is one
    * hash aggregate over the token scan; the pair join runs on the
    * vocabulary sliver (Heaps' law — vocab grows ~√corpus) and the
    * matrix is |sources|² rows. Exact integers → hash-green.
    */
  private[graft] def t30Sql(div: String): String =
    s"""WITH v AS (
       |  SELECT DISTINCT source, word
       |  FROM (SELECT source, $$SPLIT$$ AS word FROM documents) t),
       |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS vs FROM v GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |  FROM v a JOIN v b ON b.word = a.word AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT i.source_a, i.source_b, sa.vs AS vocab_a, sb.vs AS vocab_b,
       |       i.n_shared,
       |       (i.n_shared * 1000) $div (sa.vs + sb.vs - i.n_shared) AS jaccard_pm
       |FROM inter i
       |JOIN sz sa ON sa.source = i.source_a
       |JOIN sz sb ON sb.source = i.source_b""".stripMargin

  private val t30Seq = new java.util.concurrent.atomic.AtomicLong(0)

  def t30_vocab_overlap(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .createOrReplaceTempView("documents")
    // Round 14 (verdict item 7): the `v` CTE (tokenize + distinct over the
    // full corpus scan) is referenced THREE times (sz, inter a, inter b)
    // and Spark's CTE inlining re-evaluated it per reference — 3 corpus
    // tokenization passes per execution. Materialize the vocabulary once
    // (vocab-sized — Heaps' law, ~√corpus) and run the unchanged tail over
    // it; the oracle keeps the literal t30Sql text.
    val vV = s"t30_v_mat_${t30Seq.incrementAndGet()}"
    val v = s.sql(
      """SELECT DISTINCT source, word
        |FROM (SELECT source, explode(split(text, ' ')) AS word
        |      FROM documents) t""".stripMargin).localCheckpoint()
    v.createOrReplaceTempView(vV)
    val out = s.sql(
      s"""WITH v AS (SELECT source, word FROM $vV),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS vs FROM v GROUP BY 1),
         |inter AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |         CAST(count(*) AS BIGINT) AS n_shared
         |  FROM v a JOIN v b ON b.word = a.word AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT i.source_a, i.source_b, sa.vs AS vocab_a, sb.vs AS vocab_b,
         |       i.n_shared,
         |       (i.n_shared * 1000) div (sa.vs + sb.vs - i.n_shared) AS jaccard_pm
         |FROM inter i
         |JOIN sz sa ON sa.source = i.source_a
         |JOIN sz sb ON sb.source = i.source_b""".stripMargin)
    s.catalog.dropTempView(vV)
    out
  }

  /** t31: term BURSTINESS (Church & Gale's cf/df dispersion) — the
    * one-number term characterization IR weighting schemes lean on:
    * function words spread evenly (cf ≈ df, ratio → 1000 pm) while
    * content words clump (a doc that mentions a topic mentions it
    * repeatedly, cf ≫ df) — the empirical justification for t05's
    * idf and t07's BM25 saturation, made measurable per term. One
    * aggregate over the token scan (collection frequency + document
    * frequency per term), integer per-mille ratio, full deterministic
    * order over the vocabulary-sized result → hash-green.
    */
  private def t31Sql(split: String, div: String): String =
    s"""WITH occ AS (SELECT doc_id, $split AS term FROM documents),
       |st AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS cf,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM occ GROUP BY term)
       |SELECT term, cf, df, (cf * 1000) $div df AS burst_pm
       |FROM st
       |ORDER BY burst_pm DESC, term""".stripMargin

  def t31_burstiness(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .createOrReplaceTempView("documents")
    s.sql(t31Sql("explode(split(text, ' '))", "div"))
  }

  /** t32: classifier CALIBRATION (reliability diagram + ECE) — before a
    * quality/lang filter threshold is trusted at corpus scale, the score
    * must be calibrated: per score-bin, mean predicted vs observed
    * positive rate, plus the Expected Calibration Error rollup
    * Σ_b (n_b/N)·|mean_p − obs| = Σ_b |Σp − n_pos| / N. t01's
    * en-stopword ratio is the score, the labeled lang the truth —
    * the same pair t13's confusion matrix and t19's AUC audit, giving
    * the eval panel its third leg. Per-bin mean scores ride
    * DECIMAL(38,9) sums (q67's discipline) so binning, means and the
    * ECE all hash-check. One scan + a 5-group aggregate.
    */
  /** t32/t42's shared calibration CTEs through `g` (per-bin counts). */
  private def t32Ctes(toks: String, sz: String, flt: String,
      contains: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, $toks AS toks FROM documents),
       |u AS (
       |  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
       |         $sz($flt(toks, x -> $contains)) / $sz(toks) AS p
       |  FROM t),
       |b AS (
       |  SELECT least(CAST(floor(p * 25) AS BIGINT), 4) AS bin, y, p FROM u),
       |g AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(y) AS BIGINT) AS n_pos,
       |         CAST(sum(CAST(p AS DECIMAL(38,9))) AS DOUBLE) AS sum_p
       |  FROM b GROUP BY bin)""".stripMargin

  private def t32Sql(toks: String, sz: String, flt: String,
      contains: String): String =
    t32Ctes(toks, sz, flt, contains) + s""",
       |tt AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM g),
       |e AS (
       |  SELECT CAST(sum(CAST(abs(sum_p - n_pos) AS DECIMAL(38,9))) AS DOUBLE)
       |           AS ece_num
       |  FROM g)
       |SELECT bin, n, n_pos,
       |       round(sum_p / n, 9) AS mean_p,
       |       CAST(n_pos AS DOUBLE) / n AS obs_rate,
       |       round(abs(sum_p / n - CAST(n_pos AS DOUBLE) / n), 9) AS gap,
       |       round(e.ece_num / tt.n_total, 9) AS ece
       |FROM g CROSS JOIN tt CROSS JOIN e""".stripMargin

  /** t42: AUTO-PICKED quality threshold — the s34/d36 calibration-loop
    * pattern for the text-quality filter: from t32's calibration bins,
    * choose the LOWEST score bin whose kept set (that bin and above)
    * clears 800‰ precision on the en-label proxy, i.e. the most
    * permissive filter meeting the quality bar — the operating point an
    * operator otherwise eyeballs off the calibration table. The pick is
    * a cross-multiplied integer test + ORDER BY LIMIT 1 inside the
    * checked query, totalized with a best-achievable fallback (no bin
    * meets the bar: the highest-precision cut ships with met_target=0
    * -- an empty threshold table would misread as no-filter-needed);
    * output is the chosen bin with its achieved precision and kept
    * fraction. Shares t32's CTE text verbatim, so calibration
    * and decision are gated together.
    */
  private def t42Sql(toks: String, sz: String, flt: String,
      contains: String, div: String): String =
    t32Ctes(toks, sz, flt, contains) + s""",
       |cum AS (
       |  SELECT bin,
       |         (SELECT CAST(sum(n_pos) AS BIGINT) FROM g g2
       |          WHERE g2.bin >= g.bin) AS kept_pos,
       |         (SELECT CAST(sum(n) AS BIGINT) FROM g g2
       |          WHERE g2.bin >= g.bin) AS kept_n
       |  FROM g),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM g),
       |pick AS (
       |  SELECT bin, kept_pos, kept_n,
       |         CASE WHEN kept_pos * 1000 >= 800 * kept_n
       |              THEN 1 ELSE 0 END AS met_target
       |  FROM cum
       |  ORDER BY met_target DESC,
       |           CASE WHEN kept_pos * 1000 >= 800 * kept_n THEN bin
       |                ELSE -(kept_pos * 1000 $div kept_n) END,
       |           bin
       |  LIMIT 1)
       |SELECT p.bin AS threshold_bin, CAST(p.met_target AS BIGINT)
       |         AS met_target, p.kept_n, p.kept_pos,
       |       p.kept_pos * 1000 $div p.kept_n AS precision_pm,
       |       p.kept_n * 1000 $div t.n_total AS kept_pm
       |FROM pick p CROSS JOIN tot t""".stripMargin

  /** t42's Spark-dialect SQL over whatever `documents` view is registered
    * — exposed so the spec can plant a corpus that MEETS the bar.
    */
  private[graft] def t42SparkSql: String =
    t42Sql("split(text, ' ')", "size", "filter",
      "array_contains(array('the', 'a', 'of', 'and'), x)", "div")

  def t42_quality_threshold(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(t42SparkSql)
  }

  def t32_calibration(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(t32Sql("split(text, ' ')", "size", "filter",
      "array_contains(array('the', 'a', 'of', 'and'), x)"))
  }

  /** t33: COHEN'S KAPPA — chance-corrected agreement between t01's
    * binary en/other prediction and the labeled lang, the one-number
    * follow-up to t13's confusion matrix (accuracy alone flatters any
    * classifier on an imbalanced corpus; kappa subtracts the agreement
    * expected by chance). Closed-form over the 2x2 cells:
    * κ = (N·(tp+tn) − [(tp+fp)(tp+fn) + (fn+tn)(fp+tn)]) /
    *     (N² − [...]) — exact int64 numerator/denominator, ONE double
    * division at the end → hash-green. One scan, one global aggregate.
    */
  private def t33Sql(toks: String, sz: String, flt: String,
      contains: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, $toks AS toks FROM documents),
       |u AS (
       |  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
       |         CAST(CASE WHEN $sz($flt(toks, x -> $contains)) / $sz(toks)
       |                        >= 0.04
       |              THEN 1 ELSE 0 END AS BIGINT) AS yhat
       |  FROM t),
       |c AS (
       |  SELECT CAST(sum(y * yhat) AS BIGINT) AS tp,
       |         CAST(sum((1 - y) * yhat) AS BIGINT) AS fp,
       |         CAST(sum(y * (1 - yhat)) AS BIGINT) AS fn,
       |         CAST(sum((1 - y) * (1 - yhat)) AS BIGINT) AS tn
       |  FROM u)
       |SELECT tp, fp, fn, tn,
       |       tp + fp + fn + tn AS n,
       |       CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS po,
       |       CAST((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS DOUBLE)
       |         / ((tp + fp + fn + tn) * (tp + fp + fn + tn)) AS pe,
       |       CAST((tp + fp + fn + tn) * (tp + tn)
       |            - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) AS DOUBLE)
       |         / ((tp + fp + fn + tn) * (tp + fp + fn + tn)
       |            - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) AS kappa
       |FROM c""".stripMargin

  def t33_kappa(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(t33Sql("split(text, ' ')", "size", "filter",
      "array_contains(array('the', 'a', 'of', 'and'), x)"))
  }

  /** t34: SEGMENT-level language ID — code-switching detection, the
    * per-document flag t01's whole-doc classifier cannot express (a doc
    * that is half en / half de classifies as one or the other; mixed
    * documents need per-segment labels). Each doc splits into 20-token
    * non-overlapping segments; a segment is 'en' iff it contains ≥1 en
    * stopword (exactly t01's 0.04 ratio rule at the 20-token grain,
    * applied as an integer count so partial tail segments get the same
    * rule). Per doc: segment counts per class, the number of adjacent
    *-segment LANGUAGE SWITCHES (one lag window partitioned by doc — the
    * code-switching statistic), and the mixed flag. All integers →
    * hash-green. One scan + explode + per-doc window/agg; segments ride
    * the scan stage, the window partitions per document.
    */
  private def t34Sql(segCte: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, $$SPLIT$$ AS toks FROM documents),
       |seg AS ($segCte),
       |sw AS (
       |  SELECT doc_id, seg_no, is_en,
       |         CASE WHEN lag(is_en) OVER (PARTITION BY doc_id ORDER BY seg_no)
       |                   IS NOT NULL
       |               AND lag(is_en) OVER (PARTITION BY doc_id ORDER BY seg_no)
       |                   <> is_en
       |              THEN 1 ELSE 0 END AS switched
       |  FROM seg)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_segments,
       |       CAST(sum(is_en) AS BIGINT) AS n_en_segments,
       |       CAST(sum(1 - is_en) AS BIGINT) AS n_other_segments,
       |       CAST(sum(switched) AS BIGINT) AS n_switches,
       |       (sum(is_en) > 0 AND sum(1 - is_en) > 0) AS is_mixed
       |FROM sw GROUP BY doc_id""".stripMargin

  private val t34SegSpark: String =
    """SELECT doc_id, CAST(k AS BIGINT) AS seg_no,
      |       CAST(CASE WHEN size(filter(slice(toks, 20 * k + 1, 20),
      |                        x -> array_contains(array('the', 'a', 'of', 'and'), x)))
      |                      >= 1
      |            THEN 1 ELSE 0 END AS BIGINT) AS is_en
      |FROM t
      |LATERAL VIEW explode(sequence(0, CAST((size(toks) - 1) DIV 20 AS INT))) s AS k""".stripMargin

  private val t34SegDuck: String =
    """SELECT doc_id, CAST(k AS BIGINT) AS seg_no,
      |       CAST(CASE WHEN len(list_filter(toks[20 * k + 1 : 20 * k + 20],
      |                        x -> list_contains(['the', 'a', 'of', 'and'], x)))
      |                      >= 1
      |            THEN 1 ELSE 0 END AS BIGINT) AS is_en
      |FROM (SELECT doc_id, toks,
      |             unnest(generate_series(0, CAST((len(toks) - 1) // 20 AS INT)))
      |               AS k
      |      FROM t) u""".stripMargin

  def t34_segment_lang(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    segmentLangFromView(s)
  }

  /** The segment classifier over whatever `documents` view is registered —
    * split out so the spec can plant a known code-switching structure.
    */
  private[graft] def segmentLangFromView(s: SparkSession): DataFrame =
    s.sql(t34Sql(t34SegSpark).replace("$SPLIT$", "split(text, ' ')"))

  /** t35: CCNet head/middle/tail PERPLEXITY BUCKETS (Wenzek et al. 2020
    * §3.3 — the split that became the de-facto quality stratification for
    * web-corpus training data: per language, the best-scoring third of
    * documents is 'head', the next 'middle', the rest 'tail', and
    * downstream mixtures sample the strata at different rates). Scores
    * are t11's bigram-LM mean log-probs; the cuts are per-language exact
    * 1/3 and 2/3 quantiles (Spark `percentile` ↔ DuckDB `quantile_cont`,
    * q40's proven interpolation parity) broadcast back onto the scored
    * stream — value-based assignment, so no per-language rank window
    * funnels a whole language through one reducer. The boundary rule is
    * explicit (>= cut goes to the better bucket). Hash-green end to end.
    */
  def t35_ccnet_buckets(s: SparkSession, d: String): DataFrame = {
    val scored = t11_lm_quality(s, d)
      .select(col("doc_id"), col("avg_logprob"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
      .localCheckpoint() // one scoring pass feeds cuts + assignment
    val cuts = scored.groupBy(col("lang"))
      .agg(expr("percentile(avg_logprob, CAST(1 AS DOUBLE) / 3)").as("c_lo"),
        expr("percentile(avg_logprob, CAST(2 AS DOUBLE) / 3)").as("c_hi"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("avg_logprob"),
        when(col("avg_logprob") >= col("c_hi"), "head")
          .when(col("avg_logprob") >= col("c_lo"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Feature-hash width for t36 — word buckets via poly31 mod 1e9+7. */
  private[operators] val RocchioDims = 32

  /** t36: TRAINED linear quality classifier — Rocchio / nearest-centroid
    * over hashed bag-of-words features, the fastText-filter recipe
    * (CCNet / GPT-3 train a cheap linear model to MIMIC an expensive
    * quality labeler, then run it over the whole corpus): the teacher
    * label here is the stopword-density heuristic (10·stopwords ≥ words
    * — t02's family), the student is a linear scorer over word-hash
    * buckets that never tokenizes beyond a split. Features are per-mille
    * word-bucket frequencies (poly31 word hash mod [[RocchioDims]] —
    * d28's dialect-shared fold, so both engines bucket identically);
    * training is CLOSED-FORM: w = per-mille positive centroid − negative
    * centroid, threshold = the midpoint of the projected centroids —
    * ONE distributed aggregation pass over the train split (h<800 of
    * c03's doc_id hash), no driver loop at all, every quantity int64
    * and overflow-proof at any corpus size (centroids are per-mille ≤
    * 10^6 per dim regardless of row count). Output is the ENTIRE model
    * plus its evaluation in one long-format frame — w_00..w_31, theta,
    * and the held-out confusion counts with balanced accuracy in
    * per-mille (the honest metric under the filter's 1:6 class skew) —
    * so the gate pins training AND generalization bit-for-bit. Scale:
    * feature build is one word scan + keyed agg; train reduce is 32
    * rows; scoring is a broadcast join (the model is 33 numbers at any
    * scale) + one aggregate. The batch perceptron was tried and
    * rejected here: on near-collinear per-mille features its
    * whole-population updates cycle between majority predictors
    * (Gallant's pocket caveat) — the closed form is the scale-sane
    * trainer.
    */
  /** Labeled docs (doc_id, y, h) + per-mille word-bucket features
    * (doc_id, y, h, dim, pm) — shared by t36 (train + eval) and c39's
    * persisted-model apply path.
    */
  private[operators] def rocchioFeatures(
      s: SparkSession, d: String): (DataFrame, DataFrame) =
    rocchioFeaturesFrom(Tables.documents(s, d))

  /** The same featurizer over any (doc_id, text) frame — split out so the
    * streaming spec can featurize each micro-batch batch-locally
    * (per-doc features have no cross-doc dependency, so any batching of
    * the corpus yields mergeable partials).
    */
  private[graft] def rocchioFeaturesFrom(raw: DataFrame): (DataFrame, DataFrame) = {
    val docs = raw
      .select(col("doc_id"), col("text"))
      // single-file fixture: the label HOF and the per-word hash below are
      // CPU-heavy per-row work that otherwise serializes on the scan's one
      // task (r13 flight sweep: c39/c40's feature stage at 1 task x 1.7 s)
      .repartition(graft.Tables.scanPartitions(raw.sparkSession))
      .withColumn("y",
        when(expr("10 * size(filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'and')))") >=
          size(split(col("text"), " ")), 1L).otherwise(-1L))
      .withColumn("h",
        ((col("doc_id") % 1000003L) * 2654435761L + 97L) % 1000L)
    val words = docs
      .select(col("doc_id"), col("y"), col("h"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      // native Poly31 kernel: the aggregate(transform(sequence)) spelling
      // is two nested interpreted lambdas with an O(n) substring per
      // position; the oracle keeps the unrolled SQL. The kernel folds
      // CODEPOINTS — matching the DuckDB oracle's ascii() (codepoint)
      // semantics, and INTENTIONALLY diverging from the replaced Spark
      // spelling's ascii() (first UTF-8 byte) on non-ASCII input (round
      // 14, ADVICE: the fixture corpus is ASCII-only, where all three
      // agree; the oracle gate is what pins the values)
      .select(col("doc_id"), col("y"), col("h"),
        (graft.functions.TextFunctions.poly31(col("w"))
          % RocchioDims).as("dim"))
    val cnt = words.groupBy(col("doc_id"), col("y"), col("h"), col("dim"))
      .agg(count(lit(1)).as("c"))
    val tot = words.groupBy(col("doc_id")).agg(count(lit(1)).as("tot"))
    val feats = cnt.join(tot, "doc_id")
      .select(col("doc_id"), col("y"), col("h"), col("dim"),
        expr("(c * 1000) div tot").as("pm"))
      .localCheckpoint() // feeds the train reduce AND both scoring passes
    (docs, feats)
  }

  /** Closed-form Rocchio train over the h<800 split: the 32 per-dim
    * weights and the doubled midpoint threshold. Driver holds 33 numbers
    * at any corpus size.
    */
  private[operators] def trainRocchio(
      docs: DataFrame, feats: DataFrame): (Array[Long], Long) = {
    val sums = feats.filter(col("h") < 800)
      .groupBy(col("y"), col("dim")).agg(sum(col("pm")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nByClass = docs.filter(col("h") < 800)
      .groupBy(col("y")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dims = (0L until RocchioDims).toArray
    def centroid(y: Long): Array[Long] =
      dims.map(k => 1000L * sums.getOrElse((y, k), 0L) /
        math.max(nByClass.getOrElse(y, 0L), 1L))
    val cp = centroid(1L)
    val cn = centroid(-1L)
    val w = dims.map(k => cp(k.toInt) - cn(k.toInt))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, yv) => x * yv }.sum
    // midpoint threshold kept UNDIVIDED (theta2 = 2*theta): score is
    // compared as 2000*score > theta2, so no negative-operand division
    // ever happens (Spark div truncates, DuckDB // floors — q85's hazard)
    (w, dot(w, cp) + dot(w, cn))
  }

  /** Model from merged sufficient statistics — per-(class, dim) pm sums
    * with class counts as dim −2 rows. Shared by st15's partial-merge
    * path and the streaming spec; the arithmetic is [[trainRocchio]]'s.
    */
  private[graft] def rocchioModelFromSums(
      m: Map[(Long, Long), Long]): (Array[Long], Long) = {
    val dims = (0L until RocchioDims.toLong).toArray
    def centroid(y: Long): Array[Long] =
      dims.map(k => 1000L * m.getOrElse((y, k), 0L) /
        math.max(m.getOrElse((y, -2L), 0L), 1L))
    val cp = centroid(1L)
    val cn = centroid(-1L)
    val w = dims.map(k => cp(k.toInt) - cn(k.toInt))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, yv) => x * yv }.sum
    (w, dot(w, cp) + dot(w, cn))
  }

  /** Marker-committed Rocchio MODEL store keyed by the documents corpus
    * identity (size + mtime — the ivfPqIndexDir discipline): the
    * s17/t24/d18/CoGraph persistence recipe applied to a TRAINED MODEL.
    * Training's distributed reduce runs ONCE per corpus version; every
    * apply thereafter reads 33 parquet rows. A regenerated corpus at the
    * same path orphans the store rather than serving a stale model.
    */
  private[graft] def ensureRocchioModel(s: SparkSession, d: String): String = {
    val f = new java.io.File(d, "documents.parquet")
    val dir = SketchQueries.partialsDir(
      s"rocchio_v1_${f.length()}_${f.lastModified()}", d)
    if (new java.io.File(dir, "_complete").exists()) return dir
    val (docs, feats) = rocchioFeatures(s, d)
    val (w, theta2) = trainRocchio(docs, feats)
    import s.implicits._
    ((-1L, theta2) +: (0L until RocchioDims).map(k => (k, w(k.toInt))))
      .toDF("dim", "wt").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/model")
    new java.io.File(dir, "_complete").createNewFile()
    dir
  }

  def t36_rocchio_classifier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (docs, feats) = rocchioFeatures(s, d)
    val (w, theta2) = trainRocchio(docs, feats)
    val dims = (0L until RocchioDims).toArray
    // score every doc: broadcast the 32-number model, one keyed agg
    val wDf = broadcast(dims.map(k => (k, w(k.toInt))).toSeq.toDF("dim", "wt"))
    val conf = feats.join(wDf, "dim")
      .groupBy(col("doc_id"), col("y"), col("h"))
      .agg(sum(col("wt") * col("pm")).as("score"))
      .select(col("y"), col("h"),
        when(col("score") * 2000 > theta2, 1L).otherwise(-1L).as("pred"))
      .groupBy(when(col("h") < 800, "train").otherwise("test").as("part"))
      .agg(
        sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1 && col("y") === -1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("pred") === -1 && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("pred") === -1 && col("y") === -1, 1L).otherwise(0L)).as("tn"))
      .collect().map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      }
    val model = dims.map(k => ("model", f"w_$k%02d", w(k.toInt))) :+
      (("model", "theta2", theta2))
    val eval = conf.flatMap { case (part, tp, fp, fn, tn) =>
      val balacc = (tp * 1000 / math.max(tp + fn, 1L) +
        tn * 1000 / math.max(fp + tn, 1L)) / 2
      Seq((part, "tp", tp), (part, "fp", fp), (part, "fn", fn),
        (part, "tn", tn), (part, "balacc_pm", balacc))
    }
    (model ++ eval).toSeq.toDF("part", "metric", "value")
  }

  /** t37's span plan over either dialect — `posGen` is the only divergent
    * spelling (explode(sequence) vs unnest(generate_series)).
    */
  private def t37Sql(posGen: String): String =
    s"""WITH docs AS (
       |  SELECT doc_id, $$N$$ AS n FROM documents),
       |pos AS (SELECT doc_id, $posGen AS i FROM docs WHERE n >= 1),
       |st AS (
       |  SELECT doc_id, i,
       |    CASE WHEN (((doc_id % 1000003) * 31 + i) * 2654435761 + 13) % 97 < 5
       |         THEN 1 ELSE 0 END AS s
       |  FROM pos),
       |mk AS (
       |  SELECT doc_id, i,
       |    max(s) OVER (PARTITION BY doc_id ORDER BY i
       |                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m
       |  FROM st),
       |isl AS (
       |  SELECT doc_id, i,
       |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
       |  FROM mk WHERE m = 1),
       |sp AS (
       |  SELECT doc_id, g, CAST(min(i) AS BIGINT) AS start_tok,
       |    CAST(max(i) AS BIGINT) AS end_tok,
       |    CAST(count(*) AS BIGINT) AS span_len
       |  FROM isl GROUP BY 1, 2)
       |SELECT doc_id,
       |       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok)
       |            - 1 AS BIGINT) AS sentinel_id,
       |       start_tok, end_tok, span_len
       |FROM sp""".stripMargin

  /** t37: SPAN-CORRUPTION manifest — T5's denoising objective as a data
    * op (Raffel et al. JMLR'20 §3.1.4): deterministically select ~15% of
    * each document's tokens in mean-length-3 spans and emit the
    * (sentinel_id, start, end) plan a training loader replaces with
    * sentinel tokens. Span starts come from a dialect-shared
    * multiplicative hash of (doc_id, position) (~5% of positions start a
    * 3-token span — T5's 15%/3 defaults), overlapping spans MERGE via
    * the d17 gaps-and-islands trick (position − row_number over masked
    * positions), and sentinel ids number the merged islands in order —
    * exactly the contract sentinel replacement needs (no nested or
    * overlapping spans, ids dense per doc). All integers; one explode +
    * three per-doc windows — scan-shaped, no joins at all.
    */
  def t37_span_corruption(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(t37Sql("explode(sequence(1, n))")
      .replace("$N$", "size(split(text, ' '))"))
  }

  /** t38's sweep plan — `split` and `div` are the dialect-divergent
    * spellings; the k ladder is a shared literal.
    */
  private def t38Sql(split: String, un: String, div: String): String =
    s"""WITH words AS (SELECT $split AS w FROM documents),
       |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
       |       FROM words WHERE length(w) > 0 GROUP BY 1),
       |rk AS (SELECT w, cnt,
       |         row_number() OVER (ORDER BY cnt DESC, w) AS r FROM wc),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM wc),
       |ks AS (SELECT $un AS k)
       |SELECT k.k AS vocab_size,
       |  CAST(coalesce(sum(CASE WHEN r.r > k.k THEN r.cnt END), 0)
       |       AS BIGINT) AS oov_tokens,
       |  CAST(coalesce(sum(CASE WHEN r.r > k.k THEN 1 END), 0)
       |       AS BIGINT) AS oov_types,
       |  (CAST(coalesce(sum(CASE WHEN r.r > k.k THEN r.cnt END), 0)
       |        AS BIGINT) * 1000) $div t.t AS oov_pm
       |FROM ks k CROSS JOIN rk r CROSS JOIN tot t
       |GROUP BY k.k, t.t""".stripMargin

  /** t38: VOCABULARY-size sweep — the "how big must the vocab be" table a
    * tokenizer design reads before t17 trains anything: for each
    * candidate vocab size k, the OOV token rate (per-mille) and stranded
    * type count if the vocab were the top-k words by corpus frequency.
    * Rank ties break lexicographically (dialect-shared). The word-count
    * table IS the sketch — |types| rows at any corpus size — so the
    * sweep's cross join is |types|·|ks|, metadata-sized; the one corpus
    * scan is the only data-sized work. Complements t16 (point stats)
    * and c32 (fertility under a FIXED vocab).
    */
  def t38_vocab_sweep(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(t38Sql("explode(split(text, ' '))",
      "explode(array(1, 2, 4, 8, 16, 32, 64))", "div"))
  }

  /** t39's gate plan — `split`/`div` are the dialect-divergent spellings;
    * the blocklist itself is a shared literal IN-list.
    */
  private def t39Sql(split: String, div: String): String =
    s"""WITH words AS (SELECT doc_id, $split AS w FROM documents),
       |hits AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM words WHERE w IN ('slow', 'broken', 'kill') GROUP BY 1),
       |per AS (
       |  SELECT d.doc_id, d.source, coalesce(h.n_hits, 0) AS n_hits
       |  FROM documents d LEFT JOIN hits h USING (doc_id))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(sum(n_hits) AS BIGINT) AS total_hits,
       |  (CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
       |    $div count(*) AS drop_pm
       |FROM per GROUP BY 1""".stripMargin

  /** t39: BLOCKLIST document gate — C4's "bad words" filter (Raffel et
    * al. JMLR'20 §2.2: drop any document containing a listed word) as a
    * per-source audit: docs are TOKENIZED and matched on whole words —
    * never substring-scanned, which is the classic false-positive bug
    * this formulation structurally avoids — and a single listed token
    * sinks the document (C4's any-hit rule). The list rides the query as
    * a literal IN-list (a real deployment broadcasts a list table; same
    * plan shape). Output: per-source doc counts, drop counts, total
    * hits, and the per-mille drop rate the corpus datasheet publishes.
    * One token scan + keyed count + left join back — scan-shaped.
    */
  def t39_blocklist_filter(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    blocklistFromView(s)
  }

  /** The gate over whatever `documents` view is registered — split out so
    * the spec can plant whole-word vs substring cases (the scunthorpe
    * check).
    */
  private[graft] def blocklistFromView(s: SparkSession): DataFrame =
    s.sql(t39Sql("explode(split(text, ' '))", "div"))

  /** t40's census — `cnt` is the dialect-divergent occurrence counter
    * (Spark `regexp_count`, DuckDB `len(regexp_extract_all(...))`); the
    * regex patterns are shared RE2/Java-compatible text (2-digit `\xNN`
    * class ranges, braced `\x{FFFD}`).
    */
  private def t40Sql(cnt: (String, String) => String, div: String): String =
    s"""WITH per AS (
       |  SELECT source, length(text) AS n_chars,
       |         ${cnt("text", "[^\\x00-\\x7F]")} AS nonascii,
       |         ${cnt("text", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")}
       |           AS ctrl,
       |         ${cnt("text", "\\x{FFFD}")} AS repl
       |  FROM documents)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(nonascii) AS BIGINT) AS nonascii_chars,
       |       CAST(sum(CASE WHEN nonascii > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS docs_nonascii,
       |       CAST(sum(ctrl) AS BIGINT) AS control_chars,
       |       CAST(sum(repl) AS BIGINT) AS replacement_chars,
       |       (CAST(sum(n_chars) AS BIGINT) - CAST(sum(nonascii) AS BIGINT))
       |         * 1000 $div CAST(sum(n_chars) AS BIGINT) AS ascii_pm
       |FROM per GROUP BY 1""".stripMargin

  /** t40: CHARSET / MOJIBAKE audit — the encoding-hygiene census every
    * crawled-text ingest runs before anything downstream trusts the
    * bytes: per source, non-ASCII mass (expected for non-English, a red
    * flag for `source=en` config errors), C0/C1-style control characters
    * (terminal escapes, nulls from truncated reads), and U+FFFD
    * replacement characters — the smoking gun of a wrong-charset decode
    * (mojibake), since FFFD only enters text when a decoder already gave
    * up. Patterns are engine-shared RE2/Java text so the per-mille ASCII
    * ratio and all counts hash-check; one scan, vocabulary-bounded agg.
    * The fixture is clean (zeros), so the spec plants control bytes and
    * FFFD docs to prove each arm fires.
    */
  def t40_charset_audit(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    charsetFromView(s)
  }

  /** The audit over whatever `documents` view is registered — split out
    * for the planted-mojibake spec.
    */
  private[graft] def charsetFromView(s: SparkSession): DataFrame =
    // Spark SQL string literals process C-style escapes, so the regex
    // backslashes must be doubled; DuckDB standard strings are raw
    s.sql(t40Sql((c, p) =>
      s"regexp_count($c, '${p.replace("\\", "\\\\")}')", "div"))

  /** t41: HEAPS'-LAW fit — the other classic corpus power law (t20 fits
    * Zipf's rank-frequency; this fits vocabulary GROWTH, V = k·N^β): how
    * fast the type count grows as tokens accumulate in arrival order.
    * The measured β feeds capacity planning everywhere a vocabulary is
    * materialized (tokenizer training corpus sizing, t17's merge-table
    * growth, embedding-table budgets) and a β drifting toward 1 flags
    * machine-generated text (unbounded novel types). Corpus prefix
    * checkpoints come from the c28/q136 two-phase DOC-position scan (8
    * equal-depth arrival octiles — the window runs over per-doc rows,
    * never tokens); each word's first-occurrence octile is one
    * min-aggregate (t23's first-seen economics at word level); the 8
    * cumulative (N, V) points then take an exact-moment least squares on
    * FIXED-POINT INTEGER logs ([[graft.functions.Log2Micros]] — binary
    * digit-by-digit, no libm), so every regression sum is exact int64 on
    * both engines and β / lg k hash-check with zero transcendental-
    * boundary risk (the round-7 red row was a cross-libm ln() ulp flip at
    * a 9dp rounding boundary; see the dialect checklist in SURVEY §6).
    * The slope is base-invariant, so β is unchanged; the intercept is
    * reported in base 2 (lg_k = log2 k).
    */
  def t41_heaps_fit(s: SparkSession, d: String): DataFrame =
    heapsFitFrom(s, Tables.documents(s, d))

  /** t41 over any (doc_id, text) frame — the fixture's closed 31-word
    * synthetic vocabulary saturates in the first octile (β = 0, itself a
    * meaningful verdict: no type growth), so the spec plants an
    * open-vocabulary corpus to exercise the fit.
    */
  private[graft] def heapsFitFrom(s: SparkSession, documents: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = documents
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .repartitionByRange(32, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid identical in subtotal and window passes
    val subtotals = docs.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val dd = subtotals.map(_._2).sum
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val offDf = broadcast(s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off"))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bk = docs.join(offDf, "pid")
      .withColumn("pos", col("off") + count(lit(1)).over(w) - 1)
      .withColumn("ckpt", expr(s"pos * 8 DIV $dd") + lit(1))
      .localCheckpoint() // token-mass rollup + first-seen share positions
    val bt = bk.groupBy(col("ckpt")).agg(sum(col("n")).as("bt"))
    val nv = bk.select(col("ckpt"), explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(min(col("ckpt")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("nv"))
    val ck = broadcast((1L to 8L).toDF("ckpt"))
    val cumN = ck.as("c").join(bt.as("b"), expr("b.ckpt <= c.ckpt"))
      .groupBy(col("c.ckpt").as("ckpt")).agg(sum(col("bt")).as("n_tokens"))
    val cumV = ck.as("c").join(nv.as("f"), expr("f.fb <= c.ckpt"))
      .groupBy(col("c.ckpt").as("ckpt")).agg(sum(col("nv")).as("vocab"))
    val pts = cumN.join(cumV, "ckpt")
      .withColumn("x", graft.functions.TextFunctions.log2_micros(col("n_tokens")))
      .withColumn("y", graft.functions.TextFunctions.log2_micros(col("vocab")))
      .localCheckpoint() // the 8 points feed the fit and ride the output
    // all five moments are EXACT int64 (x,y <= 63e6; 8 points), so the
    // final double division + 9dp round is IEEE-deterministic cross-engine
    val fit = pts.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sx2"),
        sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"))
      .select(
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sx2") - col("sx") * col("sx")).cast("double"), 9)
          .as("beta"),
        round((col("sy").cast("double") -
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sx2") - col("sx") * col("sx")).cast("double") *
          col("sx").cast("double")) / col("n").cast("double") / lit(1000000.0D),
          9).as("lg_k"))
    pts.crossJoin(broadcast(fit))
      .select(col("ckpt"), col("n_tokens"), col("vocab"),
        col("beta"), col("lg_k"))
  }

  /** t43: "Fightin' Words" DISTINGUISHING TERMS (Monroe, Colaresi &
    * Quinn 2008) — per language, the terms most over-represented vs the
    * rest of the corpus, scored by log-odds-ratio with an INFORMATIVE
    * Dirichlet prior (α_w = α0 · corpus share; α0 = 1000 total prior
    * mass): the prior shrinks rare-word noise that raw log-odds or PMI
    * would rank first, and the z-score (delta / sqrt(1/(y+α) + 1/(y_r+α)))
    * is the paper's variance normalization. This is the corpus-comparison
    * report a curation run reads to see WHAT distinguishes a source/slice
    * before deciding weights — t05's tf-idf ranks within-doc, this ranks
    * between-slice. Determinism: each ln is rounded at 9 dp and pinned to
    * DECIMAL(18,9) (t20's discipline) so the delta subtraction is exact;
    * the z lands as integer MICROS via floor. One token scan, vocab-keyed
    * joins (never broadcast — at 100 TB the vocab is huge; lang totals and
    * the corpus scalar broadcast), top-3 per lang through the partial
    * heaps.
    */
  def t43_log_odds(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val lw = toks.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("y"))
    val wt = lw.groupBy(col("tok")).agg(sum(col("y")).as("yw"))
    val lt = lw.groupBy(col("lang")).agg(sum(col("y")).as("nl"))
    val nt = lw.agg(sum(col("y")).as("n"))
    val scored = lw.join(wt, "tok").join(broadcast(lt), "lang")
      .crossJoin(broadcast(nt))
      .withColumn("aw", expr("1000.0D * yw / n"))
      .withColumn("l1", expr(
        "CAST(round(ln((y + aw) / (nl + 1000.0D - y - aw)), 9) AS DECIMAL(18,9))"))
      .withColumn("l2", expr(
        "CAST(round(ln((yw - y + aw) / (n - nl + 1000.0D - (yw - y) - aw)), 9) AS DECIMAL(18,9))"))
      .withColumn("z_micro", expr(
        "floor(CAST(l1 - l2 AS DOUBLE) / sqrt(1.0D / (y + aw) + 1.0D / (yw - y + aw)) * 1000000.0D)"))
      .select(col("lang"), col("tok"), col("y"), col("yw"), col("z_micro"))
    graft.plans.TopKPerGroup.topK(scored, Seq("lang"),
      Seq(graft.plans.TopKPerGroup.Ord("z_micro", desc = true),
        graft.plans.TopKPerGroup.Ord("tok")), 3)
  }

  /** t44: PII CANARY RECALL — c43's planted-ground-truth discipline
    * applied to t06's redaction: one synthetic PII instance per class
    * (email / long number / 12+-char word) is appended to a deterministic
    * doc slice, and detection is measured as the COUNT DELTA between
    * planted and base text — the word-soup fixture has natural long-word
    * and digit hits, so the delta (exactly +1 in the planted class,
    * exactly 0 elsewhere) is what isolates the canary from background.
    * This is the validation a redaction deployment owes itself before
    * release: recall per class with the false-positive background
    * reported beside it. One scan, all regex work codegen'd per row.
    */
  def t44_pii_canary(s: SparkSession, d: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val num = "[0-9]{6,}"
    val longw = "[a-z]{12,}"
    def cnt(c: Column, p: String) = regexp_count(c, lit(p)).cast("long")
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .withColumn("pii_class",
        when(col("doc_id") % 13 === 0, "email")
          .when(col("doc_id") % 13 === 1, "number")
          .when(col("doc_id") % 13 === 2, "longword")
          .otherwise("none"))
      .withColumn("planted", expr(
        "CASE WHEN doc_id % 13 = 0 THEN concat(text, ' contact bob@example.com now')" +
          " WHEN doc_id % 13 = 1 THEN concat(text, ' call 5551234567 today')" +
          " WHEN doc_id % 13 = 2 THEN concat(text, ' ref antidisestablishment case')" +
          " ELSE text END"))
      .select(col("pii_class"),
        (cnt(col("planted"), email) - cnt(col("text"), email)).as("de"),
        (cnt(col("planted"), num) - cnt(col("text"), num)).as("dn"),
        (cnt(col("planted"), longw) - cnt(col("text"), longw)).as("dl"),
        (cnt(col("text"), email) + cnt(col("text"), num) +
          cnt(col("text"), longw)).as("bg"))
      .groupBy(col("pii_class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("de") === 1, 1L).otherwise(0L)).as("caught_email"),
        sum(when(col("dn") === 1, 1L).otherwise(0L)).as("caught_number"),
        sum(when(col("dl") === 1, 1L).otherwise(0L)).as("caught_longword"),
        sum(col("bg")).as("background_hits"))
  }

  /** t45: CODE/PROSE detection — the routing gate a mixed-corpus pipeline
    * runs before choosing a tokenizer, a quality model and a mixture slot
    * for each document (code and prose get different everything). The
    * detector is the standard symbol-density heuristic (share of
    * characters from the code-punctuation class); ground truth follows
    * t44's PLANTED discipline: every 19th document is re-rendered as
    * code (tokens joined with `;` inside a function skeleton) so the
    * confusion census has a known answer — word-soup prose carries ZERO
    * code symbols, so the spec can pin perfect separation (exactly two
    * confusion cells, pred == truth). Pure scan-side projection + grouped
    * count; the one dialect trap is regexp_replace's global flag (DuckDB
    * needs explicit 'g'; Spark is global by default).
    */
  def t45_code_detect(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), lit(0L).as("is_code"))
    val planted = Tables.documents(s, d)
      .where(pmod(col("doc_id"), lit(19L)) === 3)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("def fn(a) { "), expr("replace(text, ' ', '; ')"),
          lit(" }")).as("text"),
        lit(1L).as("is_code"))
    base.unionByName(planted)
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("sym", (col("n") -
        length(regexp_replace(col("text"), "[{}();=+*>]", ""))).cast("long"))
      .withColumn("sym_pm", expr("sym * 1000 div greatest(n, 1)"))
      .withColumn("pred_code", (col("sym_pm") >= 50L).cast("long"))
      .groupBy(col("is_code"), col("pred_code"))
      .agg(count(lit(1)).as("n_docs"), sum(col("sym_pm")).as("sum_sym_pm"))
  }

  /** t46: HAPAX-NOISE flag — the per-document OCR/mojibake screen t16's
    * corpus-level hapax ratio cannot give: a document whose tokens are
    * disproportionately corpus-hapaxes (words nothing else in the corpus
    * uses) is the classic scanner-noise / encoding-damage signature. One
    * explode + corpus-level token df (vocabulary-sized, never
    * corpus-sized), one keyed join back, per-doc hapax share in integer
    * per-mille with a 200‰ flag threshold. The same join shape a real
    * pipeline reuses for any df-derived doc feature.
    */
  def t46_hapax_noise(s: SparkSession, d: String): DataFrame = {
    // planted ground truth: the fixture's word-soup vocabulary is tiny
    // (no natural corpus hapax exists), so every 13th doc gets one third
    // of its length appended as unique gibberish tokens — the OCR-noise
    // signature the screen must flag, and ONLY it (spec pins exactness)
    // the >= 3 guard matters cross-engine: for a 1-2 token doc Spark's
    // sequence(1, 0) is the DESCENDING [1, 0] while DuckDB's range(1, 1)
    // is empty — guard both sides so short planted docs stay unmodified
    val corpus = Tables.documents(s, d)
      .withColumn("text", when(pmod(col("doc_id"), lit(13L)) === 6 &&
          size(split(col("text"), " ")) >= 3,
        concat(col("text"), lit(" "), expr(
          "concat_ws(' ', transform(sequence(1, size(split(text, ' ')) div 3)," +
            " i -> concat('zq', doc_id, 'x', i)))")))
        .otherwise(col("text")))
    val toks = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val df = toks.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    toks.join(df, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_pm", expr("n_hapax * 1000 div n_tokens"))
      .withColumn("flagged", (col("hapax_pm") > 200L).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_hapax"),
        col("hapax_pm"), col("flagged"))
  }

  /** t47: REPETITION screen — the Gopher/MassiveText-style boilerplate
    * filter the quality family lacked (Rae et al. 2021 table A1: "fraction
    * of characters in duplicate n-grams"): machine-generated spam and
    * template boilerplate repeat short n-grams at rates natural text never
    * reaches. Per doc: top-bigram occupancy and duplicate-trigram
    * occupancy (occurrences of trigrams appearing >= 2x in the doc), both
    * in integer per-mille (the t46 discipline — no float fractions).
    * Shape: the gram lists are built per row with ONE zip_with pass
    * (k-bounded per-row HOF, not a corpus-sized interpreted fold), then
    * one explode + (doc_id, gram) map-side-partial aggregate each — two
    * shuffles total, both keyed by doc so the reduce is per-doc-local.
    *
    * Planted ground truth (the t46/c43 pattern): the fixture soup's
    * trigram space is too sparse for natural repetition, so every 11th
    * doc gets `size div 4 + 2` copies of a 3-word phrase appended — the
    * boilerplate signature, sized so the duplicate-trigram occupancy
    * lands near (3k−2)/(n+3k) ≈ 430‰ at EVERY doc length (a plain
    * `div 4` left an 11-word doc at 133‰, under the flag). The 200‰
    * duplicate-trigram flag must catch exactly the planted docs
    * (QueriesSpec pins set equality).
    */
  def t47_repetition_screen(s: SparkSession, d: String): DataFrame = {
    val corpus = Tables.documents(s, d)
      .withColumn("text", when(pmod(col("doc_id"), lit(11L)) === 7 &&
          size(split(col("text"), " ")) >= 4,
        concat(col("text"), lit(" "), expr(
          "concat_ws(' ', transform(sequence(1, size(split(text, ' ')) div 4 + 2)," +
            " i -> 'buy gold now'))")))
        .otherwise(col("text")))
    val w = corpus.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .localCheckpoint() // one scan feeds both gram pipelines
    val bstat = w.select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> concat(a, '~', b))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"), max(col("n")).as("top_bigram_n"))
    val tstat = w.select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 2), zip_with(slice(w, 2, size(w) - 2)," +
          " slice(w, 3, size(w) - 2), (b, c) -> concat(b, '~', c))," +
          " (a, bc) -> concat(a, '~', bc))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_trigrams"),
        sum(when(col("n") >= 2L, col("n")).otherwise(0L)).as("dup_tri_occ"))
    bstat.join(tstat, "doc_id")
      .withColumn("top_bigram_pm", expr("top_bigram_n * 1000 div n_bigrams"))
      .withColumn("dup_tri_pm", expr("dup_tri_occ * 1000 div n_trigrams"))
      .withColumn("flagged", (col("dup_tri_pm") >= 200L).cast("long"))
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_n"),
        col("top_bigram_pm"), col("n_trigrams"), col("dup_tri_occ"),
        col("dup_tri_pm"), col("flagged"))
  }

  /** Shared t48 template — splice points are the dialect-divergent
    * spellings only: `nwords` (word-array length), `alpha` (count of
    * words containing an ASCII letter), `stops` (count of stop-word
    * occurrences), `div` (integer division). Every rule compares
    * through integer cross-multiplication — no float ratios anywhere, so
    * the per-source pass counts hash-check bit-exactly across engines.
    */
  private def t48Sql(nwords: String, alpha: String, stops: String,
      div: String): String =
    s"""WITH per AS (
       |  SELECT source,
       |         $nwords AS n_words,
       |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS wchars,
       |         CAST(length(text) - length(replace(text, '#', ''))
       |              AS BIGINT)
       |           + (length(text) - length(replace(text, '...', '')))
       |             $div 3 AS symbols,
       |         $alpha AS alpha_words,
       |         $stops AS stop_occ
       |  FROM documents),
       |r AS (
       |  SELECT source,
       |         CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
       |           AS ok_words,
       |         CASE WHEN wchars BETWEEN 3 * n_words AND 10 * n_words
       |              THEN 1 ELSE 0 END AS ok_wordlen,
       |         CASE WHEN 10 * symbols <= n_words THEN 1 ELSE 0 END
       |           AS ok_symbols,
       |         CASE WHEN 5 * alpha_words >= 4 * n_words THEN 1 ELSE 0 END
       |           AS ok_alpha,
       |         CASE WHEN stop_occ >= 2 THEN 1 ELSE 0 END AS ok_stop
       |  FROM per)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(ok_words) AS BIGINT) AS pass_words,
       |       CAST(sum(ok_wordlen) AS BIGINT) AS pass_wordlen,
       |       CAST(sum(ok_symbols) AS BIGINT) AS pass_symbols,
       |       CAST(sum(ok_alpha) AS BIGINT) AS pass_alpha,
       |       CAST(sum(ok_stop) AS BIGINT) AS pass_stopwords,
       |       CAST(sum(ok_words * ok_wordlen * ok_symbols * ok_alpha
       |                * ok_stop) AS BIGINT) AS pass_all
       |FROM r GROUP BY 1""".stripMargin

  private val t48Stopwords =
    "('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')"

  /** t48: GOPHER quality ruleset — the published MassiveText document
    * filter (Rae et al. 2021, "Scaling Language Models", table A1) that
    * every crawled-corpus pipeline reimplements; t47 already covers the
    * table's repetition half, this is the length/lexical half: word count
    * in [50, 100k], mean word length in [3, 10] chars, symbol-to-word
    * ratio ('#' chars + '...' runs) <= 0.1, >= 80% of words containing an
    * alphabetic character, and >= 2 stop-word occurrences from the
    * paper's 8-word list (occurrence-counted, the common RedPajama/Dolma
    * reading of the "actual English sentence" screen). Bullet/
    * ellipsis LINE-ratio rules are inapplicable to the single-line
    * fixture and are covered by t47's boilerplate screen instead.
    * Per-source rule funnel: how many docs pass each rule and how many
    * pass all — the yield census a corpus owner reads before committing
    * to the filter. One scan, per-row lambda work only (no explode, no
    * second shuffle); the aggregate is source-keyed (vocabulary-bounded),
    * so at 100 TB this is a pure map-side-partial scan shape.
    */
  def t48_gopher_rules(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(t48Sql(
      "CAST(size(split(text, ' ')) AS BIGINT)",
      "CAST(size(filter(split(text, ' '), w -> w rlike '[A-Za-z]'))" +
        " AS BIGINT)",
      s"CAST(size(filter(split(text, ' ')," +
        s" w -> w IN $t48Stopwords)) AS BIGINT)",
      "div"))
  }

  /** t49: UNIGRAM-LM VITERBI segmentation — the SentencePiece-style
    * lattice step (Kudo 2018) that completes the tokenizer-training
    * family next to BPE merges (t17) and WordPiece greedy longest-match
    * (t15): every word is segmented by the MAX-LIKELIHOOD path through
    * its substring lattice, not greedily. Lexicon: all substrings of
    * length 1–4 of corpus words, counted occurrence-weighted; piece
    * score = log2_micros(count) − log2_micros(total) (the exact integer
    * log kernel the t41/t20/g09 fits use — no libm anywhere), so DP
    * scores are int64 micros and the argmax path is bit-deterministic
    * (ties broken by lexicographically smaller path, identical in both
    * engines over ASCII pieces). Shape: ONE distributed aggregate (word
    * counts — vocabulary-bounded, the t38 discipline) feeds a driver-side
    * DP over the k-bounded lexicon (the trained-ANN house pattern: at
    * 100 TB the corpus pass is the only corpus-sized stage; lattice work
    * is |vocab|·L·4). The DuckDB twin replays the SAME DP as 12 unrolled
    * MATERIALIZED CTE steps over the same integer-log scores (recursive
    * binary-digit lg loop, the t41 spelling) — hash-green end to end.
    */
  def t49_unigram_segment(s: SparkSession, d: String): DataFrame = {
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1) // consecutive spaces yield "" tokens
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect() // vocabulary-bounded (31 distinct fixture words)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the oracle's DP is unrolled to 12 positions and the '.'-separated
    // path tie-break assumes every word char sorts above the separator —
    // fail LOUDLY at the operator if a corpus ever leaves that domain,
    // instead of silently hash-diverging from the oracle
    wc.keys.foreach { w =>
      require(w.length <= 12,
        s"t49_unigram_segment: word '$w' exceeds the 12-position DP " +
          "unroll — raise maxL in t49Oracle alongside")
      require(w.forall(_ > '.'),
        s"t49_unigram_segment: word '$w' contains a char at or below " +
          "'.' (0x2E) — the path separator/tie-break contract breaks")
    }
    val pieceCounts =
      scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      (w, c) <- wc
      i <- 0 until w.length
      l <- 1 to 4
      if i + l <= w.length
    } pieceCounts(w.substring(i, i + l)) += c
    val total = pieceCounts.values.sum
    val lgT = graft.functions.Log2Micros.log2Micros(total)
    val score: Map[String, Long] = pieceCounts.iterator.map { case (p, c) =>
      p -> (graft.functions.Log2Micros.log2Micros(c) - lgT)
    }.toMap
    val rows = wc.toSeq.map { case (w, c) =>
      val L = w.length
      val dp = Array.fill[(Long, String)](L + 1)((Long.MinValue, ""))
      dp(0) = (0L, "")
      for (j <- 1 to L) {
        val cands = for {
          k <- 1 to math.min(4, j)
          i = j - k
          if dp(i)._1 != Long.MinValue
        } yield {
          val piece = w.substring(i, j)
          val path = if (dp(i)._2.isEmpty) piece else dp(i)._2 + "." + piece
          (dp(i)._1 + score(piece), path)
        }
        // max score, tie -> lexicographically smaller path (the exact
        // twin of the oracle's ORDER BY score DESC, path)
        dp(j) = cands.minBy { case (sc2, path) => (-sc2, path) }
      }
      val (bs, bp) = dp(L)
      (w, c, L.toLong, bp.split('.').length.toLong, bs, bp)
    }
    import s.implicits._
    rows.toDF("word", "n_occ", "word_len", "n_pieces", "score_micros",
      "segmentation")
  }

  /** t49 oracle: counts + the recursive integer-log loop + 12 unrolled
    * DP steps (dp_j keeps exactly the rk=1 row per word — the same
    * intermediate pruning the Scala DP performs, so tie-breaks compose
    * identically).
    */
  private lazy val t49Oracle: String = {
    val maxL = 12
    val steps = (1 to maxL).map { j =>
      val branches = (1 to math.min(4, j)).map { k =>
        val i = j - k
        s"""SELECT word, score, path, substr(word, ${i + 1}, $k) AS pp
           |      FROM dp$i WHERE length(word) >= $j""".stripMargin
      }.mkString("\n      UNION ALL\n      ")
      s"""dp$j AS MATERIALIZED (
         |  SELECT word, score, path FROM (
         |    SELECT word, score, path,
         |           row_number() OVER (PARTITION BY word
         |                              ORDER BY score DESC, path) AS rk
         |    FROM (
         |      SELECT z.word, z.score + sc.s AS score,
         |             CASE WHEN z.path = '' THEN z.pp
         |                  ELSE z.path || '.' || z.pp END AS path
         |      FROM (
         |      $branches) z
         |      JOIN sc ON sc.piece = z.pp) c) r
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val best = (1 to maxL).map(j =>
      s"SELECT word, score, path FROM dp$j WHERE length(word) = $j")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE w0 AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wc AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM w0
       |  WHERE length(w) >= 1 GROUP BY 1),
       |pc AS MATERIALIZED (
       |  SELECT piece, CAST(sum(c) AS BIGINT) AS pcount
       |  FROM (SELECT substr(wc.w, CAST(i AS INT), CAST(l AS INT)) AS piece,
       |               wc.c
       |        FROM wc, range(1, ${maxL + 1}) t(i), range(1, 5) t2(l)
       |        WHERE i + l - 1 <= length(wc.w)) z
       |  GROUP BY 1),
       |tot AS (SELECT CAST(sum(pcount) AS BIGINT) AS t FROM pc),
       |uv AS (
       |  SELECT piece AS key, pcount AS v,
       |         CAST(length(bin(pcount)) - 1 AS BIGINT) AS e FROM pc
       |  UNION ALL
       |  SELECT '<TOTAL>', t, CAST(length(bin(t)) - 1 AS BIGINT) FROM tot),
       |lg AS (
       |  SELECT key, e,
       |         CASE WHEN e >= 30 THEN v // CAST(power(2, e - 30) AS BIGINT)
       |              ELSE v * CAST(power(2, 30 - e) AS BIGINT) END AS m,
       |         CAST(0 AS BIGINT) AS acc, 0 AS i
       |  FROM uv
       |  UNION ALL
       |  SELECT key, e,
       |         CASE WHEN (m * m) // 1073741824 >= 2147483648
       |              THEN ((m * m) // 1073741824) // 2
       |              ELSE (m * m) // 1073741824 END,
       |         acc * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
       |                        THEN 1 ELSE 0 END,
       |         i + 1
       |  FROM lg WHERE i < 30),
       |lgv AS MATERIALIZED (
       |  SELECT key, (e * 1073741824 + acc) * 1000000 // 1073741824 AS lg
       |  FROM lg WHERE i = 30),
       |sc AS MATERIALIZED (
       |  SELECT l.key AS piece, l.lg - t.lg AS s
       |  FROM lgv l
       |  CROSS JOIN (SELECT lg FROM lgv WHERE key = '<TOTAL>') t
       |  WHERE l.key <> '<TOTAL>'),
       |dp0 AS (SELECT w AS word, CAST(0 AS BIGINT) AS score, '' AS path
       |        FROM wc),
       |$steps,
       |best AS (
       |  $best)
       |SELECT b.word, wc.c AS n_occ,
       |       CAST(length(b.word) AS BIGINT) AS word_len,
       |       CAST(len(string_split(b.path, '.')) AS BIGINT) AS n_pieces,
       |       b.score AS score_micros, b.path AS segmentation
       |FROM best b JOIN wc ON wc.w = b.word""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "t49_unigram_segment" -> (t49_unigram_segment _),
    "t48_gopher_rules" -> (t48_gopher_rules _),
    "t47_repetition_screen" -> (t47_repetition_screen _),
    "t46_hapax_noise" -> (t46_hapax_noise _),
    "t45_code_detect" -> (t45_code_detect _),
    "t44_pii_canary" -> (t44_pii_canary _),
    "t43_log_odds" -> (t43_log_odds _),
    "t41_heaps_fit" -> (t41_heaps_fit _),
    "t40_charset_audit" -> (t40_charset_audit _),
    "t39_blocklist_filter" -> (t39_blocklist_filter _),
    "t38_vocab_sweep" -> (t38_vocab_sweep _),
    "t37_span_corruption" -> (t37_span_corruption _),
    "t36_rocchio_classifier" -> (t36_rocchio_classifier _),
    "t42_quality_threshold" -> (t42_quality_threshold _),
    "t32_calibration" -> (t32_calibration _),
    "t33_kappa" -> (t33_kappa _),
    "t34_segment_lang" -> (t34_segment_lang _),
    "t35_ccnet_buckets" -> (t35_ccnet_buckets _),
    "t31_burstiness" -> (t31_burstiness _),
    "t30_vocab_overlap" -> (t30_vocab_overlap _),
    "t29_textrank" -> (t29_textrank _),
    "t28_trigram_search" -> (t28_trigram_search _),
    "t27_rake_keyphrases" -> (t27_rake_keyphrases _),
    "t26_collocations" -> (t26_collocations _),
    "t25_kwic" -> (t25_kwic _),
    "t24_persisted_bm25" -> (t24_persisted_bm25 _),
    "t23_novelty" -> (t23_novelty _),
    "t22_phrase_search" -> (t22_phrase_search _),
    "t20_zipf_fit" -> (t20_zipf_fit _),
    "t21_readability" -> (t21_readability _),
    "t19_auc" -> (t19_auc _),
    "t18_nb_classifier" -> (t18_nb_classifier _),
    "t17_bpe_train" -> (t17_bpe_train _),
    "t50_bpe_train_sampled" -> (t50_bpe_train_sampled _),
    "t16_vocab_stats" -> (t16_vocab_stats _),
    "t14_normalize" -> (t14_normalize _),
    "t13_lang_confusion" -> (t13_lang_confusion _),
    "t12_filter_funnel" -> (t12_filter_funnel _),
    "t11_lm_quality" -> (t11_lm_quality _),
    "t10_bpe_tokenize" -> (t10_bpe_tokenize _),
    "t15_wordpiece_greedy" -> (t15_wordpiece_greedy _),
    "t09_diversity" -> (t09_diversity _),
    "t08_repetition" -> (t08_repetition _),
    "t07_bm25" -> (t07_bm25 _),
    "t05_tfidf" -> (t05_tfidf _),
    "t06_redact" -> (t06_redact _),
    "t01_lang_id" -> (t01_lang_id _),
    "t02_quality_score" -> (t02_quality_score _),
    "t03_token_stats" -> (t03_token_stats _),
    "t04_fingerprint" -> (t04_fingerprint _),
  )

  /** Shared by t07 (inline recompute) and t24 (persisted index): both
    * hash-checking against ONE recompute-from-text oracle proves the
    * stored index reproduces inline scoring exactly.
    */
  private val bm25Oracle: String =
    """WITH docs AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |         string_split(text, ' ') AS toks
      |  FROM documents),
      |stats AS (
      |  SELECT count(*) AS n_docs,
      |         CAST(sum(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avgdl
      |  FROM docs),
      |tf AS (
      |  SELECT doc_id, dl, term, count(*) AS tf FROM (
      |    SELECT doc_id, dl, unnest(toks) AS term FROM docs) u
      |  WHERE term IN ('data', 'hash', 'scan')
      |  GROUP BY doc_id, dl, term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |scored AS (
      |  SELECT tf.term, tf.doc_id, tf.tf, tf.dl,
      |         round(ln((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0), 9)
      |           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))
      |           AS bm25
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s)
      |SELECT term, doc_id, tf, dl, bm25 FROM (
      |  SELECT *, row_number() OVER (PARTITION BY term
      |              ORDER BY bm25 DESC, doc_id) AS rk
      |  FROM scored) t
      |WHERE rk <= 10""".stripMargin

  /** t29's oracle: identical integer arithmetic with the four rounds
    * unrolled as a CTE chain (the g01 oracle pattern).
    */
  private val textrankOracle: String = {
    val rounds = (1 to 4).map { i =>
      s"""r$i AS (
         |  SELECT n.word,
         |         CAST(150000 + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS word, CAST(sum((e.wgt * r.r) // st.st) AS BIGINT) AS c
         |    FROM edges e
         |    JOIN strength st ON st.src = e.src
         |    JOIN r${i - 1} r ON r.word = e.src
         |    GROUP BY e.dst) s ON s.word = n.word)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |pos AS (
       |  SELECT doc_id, i AS pos, ts[i] AS w
       |  FROM toks, unnest(range(1, len(ts) + 1)) AS u(i)),
       |co AS (
       |  SELECT a.w AS u, b.w AS v, CAST(count(*) AS BIGINT) AS n
       |  FROM pos a JOIN pos b
       |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND a.w <> b.w
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT src, dst, CAST(sum(n) AS BIGINT) AS wgt FROM (
       |    SELECT u AS src, v AS dst, n FROM co
       |    UNION ALL
       |    SELECT v AS src, u AS dst, n FROM co) GROUP BY 1, 2),
       |strength AS (SELECT src, CAST(sum(wgt) AS BIGINT) AS st
       |             FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS word FROM edges),
       |r0 AS (SELECT word, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$rounds,
       |fin AS (
       |  SELECT n.word, n.r AS rank, st.st,
       |         row_number() OVER (ORDER BY n.r DESC, n.word) AS rn
       |  FROM r4 n JOIN strength st ON st.src = n.word)
       |SELECT word, rank, st FROM fin WHERE rn <= 10""".stripMargin
  }

  /** t11's LM-scoring chain, shared with t35's bucket assignment. */
  private lazy val t11Ctes: String =
    """t AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |b AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM (SELECT doc_id, toks,
      |               unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM t WHERE len(toks) >= 2) u),
      |c2 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
      |lm AS (
      |  SELECT w1, w2,
      |         CAST(round(ln(CAST(c12 AS DOUBLE) / c1), 9) AS DECIMAL(38,9)) AS lp
      |  FROM c2 JOIN c1 USING (w1)),
      |scored AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |         CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob
      |  FROM b JOIN lm USING (w1, w2)
      |  GROUP BY doc_id)""".stripMargin

  /** The featurize→train CTE chain of the Rocchio model (docs, feats,
    * weights `w`, threshold `th`) — shared by t36's oracle and c39's
    * persisted-model-apply oracle, which retrains INLINE so the hash gate
    * cross-checks the stored model's losslessness on every run.
    */
  private[operators] val rocchioOracleCtes: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text,
       |    CASE WHEN 10 * len(list_filter(string_split(text, ' '),
       |              w -> w IN ('the', 'a', 'of', 'and')))
       |              >= len(string_split(text, ' ')) THEN 1 ELSE -1 END AS y,
       |    ((doc_id % 1000003) * 2654435761 + 97) % 1000 AS h
       |  FROM documents),
       |wd AS (
       |  SELECT doc_id, y, h, unnest(string_split(text, ' ')) AS w
       |  FROM docs),
       |dimmed AS (
       |  SELECT doc_id, y, h,
       |         list_reduce(list_prepend(0, list_transform(
       |             range(1, length(w) + 1),
       |             ci -> CAST(ascii(substring(w, ci, 1)) AS BIGINT))),
       |           (acc, ch) -> (acc * 31 + ch) % 1000000007)
       |           % $RocchioDims AS dim
       |  FROM wd WHERE length(w) > 0),
       |cnt AS (SELECT doc_id, y, h, dim, count(*) AS c
       |        FROM dimmed GROUP BY 1, 2, 3, 4),
       |tot AS (SELECT doc_id, count(*) AS tot FROM dimmed GROUP BY 1),
       |feats AS (
       |  SELECT c.doc_id, c.y, c.h, c.dim, (c.c * 1000) // t.tot AS pm
       |  FROM cnt c JOIN tot t USING (doc_id)),
       |dims AS (SELECT unnest(generate_series(0, ${RocchioDims - 1})) AS dim),
       |ncls AS (SELECT y, count(*) AS n FROM docs WHERE h < 800 GROUP BY 1),
       |tsum AS (SELECT dim, y, sum(pm) AS s
       |         FROM feats WHERE h < 800 GROUP BY 1, 2),
       |cent AS (
       |  SELECT d.dim,
       |    CAST((1000 * coalesce(sp.s, 0)) // greatest(
       |      coalesce((SELECT n FROM ncls WHERE y = 1), 0), 1) AS BIGINT) AS cp,
       |    CAST((1000 * coalesce(sn.s, 0)) // greatest(
       |      coalesce((SELECT n FROM ncls WHERE y = -1), 0), 1) AS BIGINT) AS cn
       |  FROM dims d
       |  LEFT JOIN tsum sp ON sp.dim = d.dim AND sp.y = 1
       |  LEFT JOIN tsum sn ON sn.dim = d.dim AND sn.y = -1),
       |w AS (SELECT dim, cp - cn AS wt, cp, cn FROM cent),
       |th AS (SELECT CAST(sum(wt * cp) + sum(wt * cn) AS BIGINT) AS theta2
       |       FROM w)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t49_unigram_segment" -> t49Oracle,
    "t48_gopher_rules" -> t48Sql(
      "CAST(len(string_split(text, ' ')) AS BIGINT)",
      "CAST(len(list_filter(string_split(text, ' ')," +
        " w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)",
      s"CAST(len(list_filter(string_split(text, ' ')," +
        s" w -> w IN $t48Stopwords)) AS BIGINT)",
      "//"),
    "t47_repetition_screen" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 11 = 7
        |              AND len(string_split(text, ' ')) >= 4 THEN text || ' ' ||
        |           array_to_string(list_transform(
        |             range(1, len(string_split(text, ' ')) // 4 + 3),
        |             i -> 'buy gold now'), ' ')
        |         ELSE text END AS text
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM c
        |      WHERE len(string_split(text, ' ')) >= 3),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |                i -> w[i] || '~' || w[i+1])) AS g FROM w),
        |bc AS (SELECT doc_id, g, count(*) AS n FROM bg GROUP BY 1, 2),
        |bstat AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |                 CAST(max(n) AS BIGINT) AS top_bigram_n
        |          FROM bc GROUP BY 1),
        |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |                i -> w[i] || '~' || w[i+1] || '~' || w[i+2])) AS g FROM w),
        |tc AS (SELECT doc_id, g, count(*) AS n FROM tg GROUP BY 1, 2),
        |tstat AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_trigrams,
        |                 CAST(coalesce(sum(n) FILTER (n >= 2), 0) AS BIGINT)
        |                   AS dup_tri_occ
        |          FROM tc GROUP BY 1)
        |SELECT b.doc_id, n_bigrams, top_bigram_n,
        |       top_bigram_n * 1000 // n_bigrams AS top_bigram_pm,
        |       n_trigrams, dup_tri_occ,
        |       dup_tri_occ * 1000 // n_trigrams AS dup_tri_pm,
        |       CAST(CASE WHEN dup_tri_occ * 1000 // n_trigrams >= 200
        |                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id""".stripMargin,
    "t46_hapax_noise" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 13 = 6
        |              AND len(string_split(text, ' ')) >= 3 THEN text || ' ' ||
        |           array_to_string(list_transform(
        |             range(1, len(string_split(text, ' ')) // 3 + 1),
        |             i -> 'zq' || doc_id || 'x' || i), ' ')
        |         ELSE text END AS text
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM c),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |j AS (
        |  SELECT t.doc_id,
        |         CASE WHEN df.df = 1 THEN 1 ELSE 0 END AS is_hapax
        |  FROM toks t JOIN df ON df.tok = t.tok),
        |a AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         CAST(sum(is_hapax) AS BIGINT) AS n_hapax
        |  FROM j GROUP BY 1)
        |SELECT doc_id, n_tokens, n_hapax,
        |       CAST(n_hapax * 1000 // n_tokens AS BIGINT) AS hapax_pm,
        |       CAST(CASE WHEN n_hapax * 1000 // n_tokens > 200
        |            THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM a""".stripMargin,
    "t45_code_detect" ->
      """WITH base AS (
        |  SELECT doc_id, text, CAST(0 AS BIGINT) AS is_code FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000,
        |         'def fn(a) { ' || replace(text, ' ', '; ') || ' }',
        |         CAST(1 AS BIGINT)
        |  FROM documents WHERE doc_id % 19 = 3),
        |feat AS (
        |  SELECT is_code, length(text) AS n,
        |         length(text)
        |           - length(regexp_replace(text, '[{}();=+*>]', '', 'g')) AS sym
        |  FROM base),
        |p AS (SELECT is_code,
        |             sym * 1000 // greatest(n, 1) AS sym_pm FROM feat)
        |SELECT is_code,
        |       CAST(CASE WHEN sym_pm >= 50 THEN 1 ELSE 0 END AS BIGINT)
        |         AS pred_code,
        |       count(*) AS n_docs, CAST(sum(sym_pm) AS BIGINT) AS sum_sym_pm
        |FROM p GROUP BY 1, 2""".stripMargin,
    "t44_pii_canary" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 13 = 0 THEN 'email'
        |         WHEN doc_id % 13 = 1 THEN 'number'
        |         WHEN doc_id % 13 = 2 THEN 'longword' ELSE 'none' END
        |      AS pii_class,
        |    CASE WHEN doc_id % 13 = 0 THEN concat(text, ' contact bob@example.com now')
        |         WHEN doc_id % 13 = 1 THEN concat(text, ' call 5551234567 today')
        |         WHEN doc_id % 13 = 2 THEN concat(text, ' ref antidisestablishment case')
        |         ELSE text END AS planted
        |  FROM documents),
        |c AS (
        |  SELECT pii_class,
        |    len(regexp_extract_all(planted, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
        |      - len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS de,
        |    len(regexp_extract_all(planted, '[0-9]{6,}'))
        |      - len(regexp_extract_all(text, '[0-9]{6,}')) AS dn,
        |    len(regexp_extract_all(planted, '[a-z]{12,}'))
        |      - len(regexp_extract_all(text, '[a-z]{12,}')) AS dl,
        |    len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
        |      + len(regexp_extract_all(text, '[0-9]{6,}'))
        |      + len(regexp_extract_all(text, '[a-z]{12,}')) AS bg
        |  FROM p)
        |SELECT pii_class, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN de = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS caught_email,
        |       CAST(sum(CASE WHEN dn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS caught_number,
        |       CAST(sum(CASE WHEN dl = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS caught_longword,
        |       CAST(sum(bg) AS BIGINT) AS background_hits
        |FROM c GROUP BY 1""".stripMargin,
    "t43_log_odds" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |lw AS (SELECT lang, tok, count(*) AS y FROM toks GROUP BY 1, 2),
        |wt AS (SELECT tok, CAST(sum(y) AS BIGINT) AS yw FROM lw GROUP BY 1),
        |lt AS (SELECT lang, CAST(sum(y) AS BIGINT) AS nl FROM lw GROUP BY 1),
        |nt AS (SELECT CAST(sum(y) AS BIGINT) AS n FROM lw),
        |sc AS (
        |  SELECT lw.lang, lw.tok, lw.y, wt.yw, lt.nl, nt.n,
        |         1000.0 * wt.yw / nt.n AS aw
        |  FROM lw JOIN wt USING (tok) JOIN lt ON lt.lang = lw.lang
        |  CROSS JOIN nt),
        |z AS (
        |  SELECT lang, tok, y, yw,
        |         CAST(floor(CAST(
        |             CAST(round(ln((y + aw) / (nl + 1000.0 - y - aw)), 9)
        |                  AS DECIMAL(18,9))
        |             - CAST(round(ln((yw - y + aw)
        |                             / (n - nl + 1000.0 - (yw - y) - aw)), 9)
        |                    AS DECIMAL(18,9)) AS DOUBLE)
        |           / sqrt(1.0 / (y + aw) + 1.0 / (yw - y + aw))
        |           * 1000000.0) AS BIGINT) AS z_micro
        |  FROM sc)
        |SELECT lang, tok, y, yw, z_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |              ORDER BY z_micro DESC, tok) AS rk FROM z) t
        |WHERE rk <= 3""".stripMargin,
    "t37_span_corruption" -> t37Sql("unnest(generate_series(1, n))")
      .replace("$N$", "len(string_split(text, ' '))"),
    "t38_vocab_sweep" -> t38Sql("unnest(string_split(text, ' '))",
      "unnest([1, 2, 4, 8, 16, 32, 64])", "//"),
    "t39_blocklist_filter" ->
      t39Sql("unnest(string_split(text, ' '))", "//"),
    "t40_charset_audit" ->
      t40Sql((c, p) => s"len(regexp_extract_all($c, '$p'))", "//"),
    // The pts logs are FIXED-POINT INTEGERS (floor(log2(v)*1e6)): the
    // recursive `lg` CTE is the DuckDB spelling of Log2Micros's binary
    // digit-by-digit loop (30 exact integer squarings), so both engines
    // feed the regression the identical int64 moments — no libm anywhere.
    "t41_heaps_fit" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |         row_number() OVER (ORDER BY doc_id) - 1 AS pos,
        |         count(*) OVER () AS dd
        |  FROM t),
        |bk AS (SELECT doc_id, toks, n, pos * 8 // dd + 1 AS ckpt FROM p),
        |bt AS (SELECT ckpt, CAST(sum(n) AS BIGINT) AS bt FROM bk GROUP BY 1),
        |fw AS (
        |  SELECT w, min(ckpt) AS fb
        |  FROM (SELECT ckpt, unnest(toks) AS w FROM bk) u GROUP BY 1),
        |nv AS (SELECT fb, count(*) AS nv FROM fw GROUP BY 1),
        |ck AS (SELECT CAST(unnest([1, 2, 3, 4, 5, 6, 7, 8]) AS BIGINT)
        |                AS ckpt),
        |cum AS (
        |  SELECT ck.ckpt,
        |         (SELECT CAST(sum(bt.bt) AS BIGINT) FROM bt
        |          WHERE bt.ckpt <= ck.ckpt) AS n_tokens,
        |         (SELECT CAST(sum(nv.nv) AS BIGINT) FROM nv
        |          WHERE nv.fb <= ck.ckpt) AS vocab
        |  FROM ck),
        |uv AS (
        |  SELECT ckpt, ax, v, CAST(length(bin(v)) - 1 AS BIGINT) AS e
        |  FROM (SELECT ckpt, unnest(['x', 'y']) AS ax,
        |               unnest([n_tokens, vocab]) AS v FROM cum) z),
        |lg AS (
        |  SELECT ckpt, ax, e,
        |         CASE WHEN e >= 30 THEN v // CAST(power(2, e - 30) AS BIGINT)
        |              ELSE v * CAST(power(2, 30 - e) AS BIGINT) END AS m,
        |         CAST(0 AS BIGINT) AS acc, 0 AS i
        |  FROM uv
        |  UNION ALL
        |  SELECT ckpt, ax, e,
        |         CASE WHEN (m * m) // 1073741824 >= 2147483648
        |              THEN ((m * m) // 1073741824) // 2
        |              ELSE (m * m) // 1073741824 END,
        |         acc * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
        |                        THEN 1 ELSE 0 END,
        |         i + 1
        |  FROM lg WHERE i < 30),
        |xy AS (
        |  SELECT ckpt,
        |         max(CASE WHEN ax = 'x' THEN
        |           (e * 1073741824 + acc) * 1000000 // 1073741824 END) AS x,
        |         max(CASE WHEN ax = 'y' THEN
        |           (e * 1073741824 + acc) * 1000000 // 1073741824 END) AS y
        |  FROM lg WHERE i = 30 GROUP BY 1),
        |ft AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x * x) AS BIGINT) AS sx2,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM xy)
        |SELECT c.ckpt, c.n_tokens, c.vocab,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |             CAST(n * sx2 - sx * sx AS DOUBLE), 9) AS beta,
        |       round((CAST(sy AS DOUBLE) -
        |              CAST(n * sxy - sx * sy AS DOUBLE) /
        |              CAST(n * sx2 - sx * sx AS DOUBLE) *
        |              CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0,
        |             9) AS lg_k
        |FROM cum c CROSS JOIN ft""".stripMargin,
    "t36_rocchio_classifier" -> (rocchioOracleCtes +
      s""",
         |scored AS (
         |  SELECT f.doc_id, f.y, f.h, sum(w.wt * f.pm) AS score
         |  FROM feats f JOIN w USING (dim) GROUP BY 1, 2, 3),
         |pred AS (
         |  SELECT y, h, CASE WHEN score * 2000 > (SELECT theta2 FROM th)
         |               THEN 1 ELSE -1 END AS pred
         |  FROM scored),
         |conf AS (
         |  SELECT CASE WHEN h < 800 THEN 'train' ELSE 'test' END AS part,
         |    CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN pred = 1 AND y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN pred = -1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN pred = -1 AND y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM pred GROUP BY 1)
         |SELECT 'model' AS part, printf('w_%02d', dim) AS metric,
         |       CAST(wt AS BIGINT) AS value FROM w
         |UNION ALL
         |SELECT 'model', 'theta2', theta2 FROM th
         |UNION ALL
         |SELECT part, m.metric,
         |  CAST(CASE m.metric
         |    WHEN 'tp' THEN tp WHEN 'fp' THEN fp
         |    WHEN 'fn' THEN fn WHEN 'tn' THEN tn
         |    ELSE ((tp * 1000 // greatest(tp + fn, 1))
         |        + (tn * 1000 // greatest(fp + tn, 1))) // 2 END AS BIGINT) AS value
         |FROM conf CROSS JOIN (SELECT unnest(
         |  ['tp', 'fp', 'fn', 'tn', 'balacc_pm']) AS metric) m""".stripMargin),
    "t32_calibration" -> t32Sql("string_split(text, ' ')", "len",
      "list_filter", "list_contains(['the', 'a', 'of', 'and'], x)"),
    "t42_quality_threshold" -> t42Sql("string_split(text, ' ')", "len",
      "list_filter", "list_contains(['the', 'a', 'of', 'and'], x)", "//"),
    "t33_kappa" -> t33Sql("string_split(text, ' ')", "len",
      "list_filter", "list_contains(['the', 'a', 'of', 'and'], x)"),
    "t34_segment_lang" ->
      t34Sql(t34SegDuck).replace("$SPLIT$", "string_split(text, ' ')"),
    "t31_burstiness" ->
      t31Sql("unnest(string_split(text, ' '))", "//"),
    "t30_vocab_overlap" ->
      t30Sql("//").replace("$SPLIT$", "unnest(string_split(text, ' '))"),
    "t29_textrank" -> textrankOracle,
    "t28_trigram_search" ->
      """WITH q(pattern) AS (VALUES ('window'), ('vector'), ('merge slow'), ('the fast')),
        |m AS (
        |  SELECT pattern, doc_id,
        |         CAST((length(text) - length(replace(text, pattern, '')))
        |              // length(pattern) AS BIGINT) AS n_occ
        |  FROM documents, q
        |  WHERE instr(text, pattern) > 0),
        |r AS (
        |  SELECT pattern, doc_id, n_occ,
        |         row_number() OVER (PARTITION BY pattern
        |                            ORDER BY n_occ DESC, doc_id) AS rn
        |  FROM m)
        |SELECT pattern, doc_id, n_occ FROM r WHERE rn <= 20""".stripMargin,
    "t27_rake_keyphrases" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |pos AS (
        |  SELECT doc_id, i - 1 AS pos, ts[i] AS w
        |  FROM toks, unnest(generate_series(1, len(ts))) AS g(i)),
        |ns AS (
        |  SELECT doc_id, pos, w,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM pos WHERE w NOT IN ('the','a','of','and')),
        |ph AS (
        |  SELECT doc_id, pos - rn AS run,
        |         string_agg(w, ' ' ORDER BY pos) AS phrase,
        |         count(*) AS n_words
        |  FROM ns GROUP BY doc_id, pos - rn
        |  HAVING count(*) <= 4),
        |wo AS (SELECT n_words, unnest(string_split(phrase, ' ')) AS w FROM ph),
        |ws AS (SELECT w, count(*) AS freq,
        |              CAST(sum(n_words) AS BIGINT) AS deg FROM wo GROUP BY w),
        |wsc AS (SELECT w, (deg * 1000000) // freq AS sc FROM ws),
        |pc AS (SELECT phrase, CAST(min(n_words) AS BIGINT) AS n_words,
        |              count(*) AS n_occur FROM ph GROUP BY phrase),
        |psc AS (
        |  SELECT pc.phrase, pc.n_words, pc.n_occur,
        |         CAST(sum(w.sc) AS BIGINT) AS score_micro
        |  FROM pc, unnest(string_split(pc.phrase, ' ')) AS u(tw), wsc w
        |  WHERE w.w = u.tw
        |  GROUP BY pc.phrase, pc.n_words, pc.n_occur)
        |SELECT phrase, n_words, n_occur, score_micro FROM psc
        |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin,
    "t26_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |uni AS (
        |  SELECT u.w AS w, count(*) AS cw
        |  FROM toks, unnest(ts) AS u(w) GROUP BY 1),
        |big AS (
        |  SELECT ts[i] AS a, ts[i + 1] AS b, count(*) AS cab
        |  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |sc AS (
        |  SELECT big.a, big.b, cab, ua.cw AS ca, ub.cw AS cb,
        |         (2 * cab * 1000000) // (ua.cw + ub.cw) AS dice_micro
        |  FROM big JOIN uni ua ON ua.w = big.a JOIN uni ub ON ub.w = big.b)
        |SELECT a, b, cab, ca, cb, dice_micro FROM sc
        |ORDER BY dice_micro DESC, a, b LIMIT 20""".stripMargin,
    "t25_kwic" ->
      """WITH t AS (
        |  SELECT doc_id, toks, i AS p, toks[i] AS term
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
        |               unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        |        FROM documents) u),
        |h AS (
        |  SELECT term, doc_id, CAST(p AS BIGINT) AS pos,
        |         coalesce(array_to_string(
        |           toks[CASE WHEN p - 3 < 1 THEN 1 ELSE p - 3 END : p - 1], ' '),
        |           '') AS left_ctx,
        |         coalesce(array_to_string(toks[p + 1 : p + 3], ' '), '') AS right_ctx
        |  FROM t WHERE term IN ('data', 'hash', 'scan'))
        |SELECT term, doc_id, pos, left_ctx, right_ctx FROM (
        |  SELECT *, row_number() OVER (PARTITION BY term
        |              ORDER BY doc_id, pos) AS rk FROM h) r
        |WHERE rk <= 20""".stripMargin,
    "t23_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS ng
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks) - 12)) AS i
        |        FROM t WHERE len(toks) >= 13) u),
        |f AS (SELECT ng, min(doc_id) AS first_doc FROM g GROUP BY ng)
        |SELECT g.doc_id, count(*) AS n_grams,
        |       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) * 1000 // count(*) AS novelty_pm
        |FROM g JOIN f USING (ng)
        |GROUP BY g.doc_id""".stripMargin,
    "t22_phrase_search" ->
      s"""WITH t AS (
        |  SELECT doc_id, i AS pos, toks[i] AS term
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
        |               unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        |        FROM documents) u),
        |pw AS (
        |  SELECT phrase, CAST(len(ws) AS BIGINT) AS plen, slot, ws[slot] AS word
        |  FROM (SELECT phrase, string_split(phrase, ' ') AS ws,
        |               unnest(generate_series(1, len(string_split(phrase, ' ')))) AS slot
        |        FROM (VALUES ${SearchPhrases.map(p => s"('$p')").mkString(", ")}) p(phrase)) v),
        |occ AS (
        |  SELECT phrase, doc_id, pos - slot AS start
        |  FROM t JOIN pw ON t.term = pw.word
        |  GROUP BY phrase, plen, doc_id, pos - slot
        |  HAVING count(*) = plen),
        |hits AS (
        |  SELECT phrase, doc_id, count(*) AS n_occurrences
        |  FROM occ GROUP BY phrase, doc_id)
        |SELECT phrase, doc_id, n_occurrences FROM (
        |  SELECT *, row_number() OVER (PARTITION BY phrase
        |              ORDER BY n_occurrences DESC, doc_id) AS rk FROM hits) r
        |WHERE rk <= 10""".stripMargin,
    "t21_readability" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |         list_transform(toks, w ->
        |           len(list_filter(regexp_split_to_array(w, '[^aeiouy]+'),
        |                           p -> p <> ''))) AS sylls
        |  FROM t)
        |SELECT doc_id,
        |       CAST(len(toks) AS BIGINT) AS n_words,
        |       CAST(list_sum(sylls) AS BIGINT) AS n_syllables,
        |       CAST(len(list_filter(sylls, x -> x >= 3)) AS BIGINT) * 1000
        |         // len(toks) AS complex_pm,
        |       round(CAST(list_sum(sylls) AS DOUBLE) / len(toks), 9)
        |         AS avg_syllables
        |FROM s""".stripMargin,
    // integer fixed-point logs via the 30-step recursive CTE (t41's
    // Log2Micros twin) — no libm in the fit on either engine
    "t20_zipf_fit" ->
      """WITH RECURSIVE tk AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT lang, tok, count(*) AS cnt FROM tk GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, cnt,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY cnt DESC, tok) AS rank
        |  FROM c QUALIFY rank <= 100),
        |uvq AS (
        |  SELECT lang, rank, ax, v, CAST(length(bin(v)) - 1 AS BIGINT) AS e
        |  FROM (SELECT lang, rank, unnest(['x', 'y']) AS ax,
        |               unnest([CAST(rank AS BIGINT), CAST(cnt AS BIGINT)]) AS v
        |        FROM r) z),
        |lgi AS (
        |  SELECT lang, rank, ax, e,
        |         CASE WHEN e >= 30 THEN v // CAST(power(2, e - 30) AS BIGINT)
        |              ELSE v * CAST(power(2, 30 - e) AS BIGINT) END AS m,
        |         CAST(0 AS BIGINT) AS acc, 0 AS i
        |  FROM uvq
        |  UNION ALL
        |  SELECT lang, rank, ax, e,
        |         CASE WHEN (m * m) // 1073741824 >= 2147483648
        |              THEN ((m * m) // 1073741824) // 2
        |              ELSE (m * m) // 1073741824 END,
        |         acc * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
        |                        THEN 1 ELSE 0 END,
        |         i + 1
        |  FROM lgi WHERE i < 30),
        |xy AS (
        |  SELECT lang, rank,
        |         max(CASE WHEN ax = 'x' THEN
        |           (e * 1073741824 + acc) * 1000000 // 1073741824 END) AS x,
        |         max(CASE WHEN ax = 'y' THEN
        |           (e * 1073741824 + acc) * 1000000 // 1073741824 END) AS y
        |  FROM lgi WHERE i = 30 GROUP BY 1, 2),
        |s AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x * x) AS BIGINT) AS sx2,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM xy GROUP BY 1)
        |SELECT lang, n AS n_ranks,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |             CAST(n * sx2 - sx * sx AS DOUBLE), 9) AS slope,
        |       round((CAST(sy AS DOUBLE) -
        |              CAST(n * sxy - sx * sy AS DOUBLE) /
        |              CAST(n * sx2 - sx * sx AS DOUBLE) *
        |              CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0,
        |             9) AS lg_intercept
        |FROM s""".stripMargin,
    "t19_auc" ->
      """WITH lv AS (
        |  SELECT source, n_chars,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
        |         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n
        |  FROM documents GROUP BY 1, 2),
        |r AS (
        |  SELECT source, p, n,
        |         sum(n) OVER (PARTITION BY source ORDER BY n_chars
        |                      ROWS UNBOUNDED PRECEDING) AS cum_n
        |  FROM lv),
        |a AS (
        |  SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
        |         CAST(sum(n) AS BIGINT) AS n_neg,
        |         CAST(sum(p * (2 * (cum_n - n) + n)) AS BIGINT) AS u2
        |  FROM r GROUP BY 1)
        |SELECT source, n_pos, n_neg, u2,
        |       CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg) AS auc
        |FROM a""".stripMargin,
    "t18_nb_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
        |test AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
        |classes AS (SELECT lang AS cls, count(*) AS c_lang,
        |                   count(DISTINCT doc_id) AS n_docs
        |            FROM train GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM train),
        |tot AS (SELECT sum(n_docs) AS tot FROM classes),
        |tc AS (SELECT lang AS cls, tok, count(*) AS c FROM train GROUP BY 1, 2),
        |vocab AS (SELECT DISTINCT tok FROM train),
        |lp AS (
        |  SELECT c.cls, vb.tok,
        |         CAST(round(ln((coalesce(tc.c, 0) + 1.0) / (c.c_lang + v.v)), 9)
        |              AS DECIMAL(38,9)) AS lp
        |  FROM vocab vb CROSS JOIN classes c CROSS JOIN v
        |  LEFT JOIN tc ON tc.cls = c.cls AND tc.tok = vb.tok),
        |prior AS (
        |  SELECT cls, CAST(round(ln(n_docs / tot), 9) AS DECIMAL(38,9)) AS lp0
        |  FROM classes CROSS JOIN tot),
        |sc AS (
        |  SELECT t.doc_id, t.lang AS true_lang, lp.cls,
        |         count(*) AS n_toks, sum(lp.lp) AS sl
        |  FROM test t JOIN lp ON t.tok = lp.tok
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, true_lang, cls AS pred_lang,
        |       CAST(p.lp0 AS DOUBLE) + CAST(sc.sl AS DOUBLE) AS log_prob, n_toks
        |FROM sc JOIN prior p USING (cls)
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |  ORDER BY CAST(p.lp0 AS DOUBLE) + CAST(sc.sl AS DOUBLE) DESC, cls) <= 1""".stripMargin,
    "t17_bpe_train" -> bpeTrainOracle(8),
    "t50_bpe_train_sampled" -> bpeTrainOracle(8, " WHERE doc_id % 4 = 0"),
    "t16_vocab_stats" ->
      """WITH tk AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (
        |  SELECT lang, tok, count(*) AS cnt FROM tk GROUP BY 1, 2)
        |SELECT lang,
        |       CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |       count(*) AS n_types,
        |       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_hapax,
        |       round(CAST(count(*) AS DOUBLE)
        |             / CAST(sum(cnt) AS BIGINT), 9) AS type_token_ratio,
        |       round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 9) AS hapax_ratio
        |FROM c GROUP BY lang""".stripMargin,
    "t14_normalize" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 .,]', ' ', 'g'), ' {2,}', ' ', 'g')) AS cleaned
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars_raw,
        |       CAST(length(cleaned) AS BIGINT) AS n_chars_clean,
        |       cleaned
        |FROM c WHERE length(cleaned) >= 20""".stripMargin,
    "t13_lang_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |p AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN len(list_filter(toks, x -> list_contains(['the','a','of','and'], x)))
        |                     / len(toks) >= 0.04
        |              THEN 'en' ELSE 'other' END AS predicted_lang
        |  FROM t),
        |c AS (SELECT lang, predicted_lang, count(*) AS n_docs FROM p GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_total FROM p)
        |SELECT lang, predicted_lang, n_docs,
        |       round(CAST(n_docs AS DOUBLE) / n_total, 9) AS share
        |FROM c CROSS JOIN n""".stripMargin,
    "t12_filter_funnel" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, len(toks) AS nt,
        |         len(list_filter(toks, x -> len(x) <= 2)) AS nshort,
        |         len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS nstop,
        |         len(list_distinct(toks)) AS ndist
        |  FROM t)
        |SELECT CASE WHEN nt < 15 THEN 'r1_too_short'
        |            WHEN nt > 90 THEN 'r2_too_long'
        |            WHEN nshort * 100 > nt * 6 THEN 'r3_short_tokens'
        |            WHEN nstop * 1000 < nt * 20 THEN 'r4_low_stopword'
        |            WHEN (nt - ndist) * 100 > nt * 65 THEN 'r5_repetitive'
        |            ELSE 'z_kept' END AS verdict,
        |       count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1""".stripMargin,
    "t11_lm_quality" ->
      s"""WITH $t11Ctes
        |SELECT doc_id, n_bigrams, avg_logprob FROM scored""".stripMargin,
    "t35_ccnet_buckets" ->
      s"""WITH $t11Ctes,
        |sl AS (
        |  SELECT s.doc_id, d.lang, s.avg_logprob
        |  FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
        |cuts AS (
        |  SELECT lang,
        |         quantile_cont(avg_logprob, CAST(1 AS DOUBLE) / 3) AS c_lo,
        |         quantile_cont(avg_logprob, CAST(2 AS DOUBLE) / 3) AS c_hi
        |  FROM sl GROUP BY lang)
        |SELECT sl.doc_id, sl.lang, sl.avg_logprob,
        |       CASE WHEN sl.avg_logprob >= c.c_hi THEN 'head'
        |            WHEN sl.avg_logprob >= c.c_lo THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM sl JOIN cuts c ON c.lang = sl.lang""".stripMargin,
    "t10_bpe_tokenize" ->
      s"""SELECT doc_id, CAST(len(pieces) AS BIGINT) AS n_tokens,
         |       array_to_string(pieces[1:12], '|') AS head_pieces,
         |       length(text) / len(pieces) AS chars_per_token
         |FROM (SELECT doc_id, text,
         |             regexp_split_to_array(trim($duckBpeEncode), ' +') AS pieces
         |      FROM documents)""".stripMargin,
    "t15_wordpiece_greedy" ->
      s"""SELECT doc_id, CAST(len(pieces) AS BIGINT) AS n_tokens,
         |       array_to_string(pieces[1:12], '|') AS head_pieces,
         |       length(text) / len(pieces) AS chars_per_token
         |FROM (SELECT doc_id, text,
         |             regexp_extract_all(lower(text), '$BpePattern', 0) AS pieces
         |      FROM documents)""".stripMargin,
    "t09_diversity" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents) u
        |  GROUP BY doc_id, term),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         count(*) AS n_types,
        |         CAST(sum(c * (c - 1)) AS BIGINT) AS coll
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types,
        |       CAST(coll AS DOUBLE) / (n_tokens * (n_tokens - 1)) AS simpson_index
        |FROM agg WHERE n_tokens >= 2""".stripMargin,
    "t08_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
        |  FROM t),
        |bi AS (
        |  SELECT doc_id, ng, count(*) AS cnt FROM (
        |    SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS ng
        |    FROM (SELECT doc_id, toks,
        |                 unnest(generate_series(1, len(toks) - 1)) AS i FROM t) u) g
        |  GROUP BY doc_id, ng),
        |bif AS (SELECT doc_id, CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
        |               AS top_bigram_frac FROM bi GROUP BY doc_id),
        |tri AS (
        |  SELECT doc_id, ng, count(*) AS cnt FROM (
        |    SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS ng
        |    FROM (SELECT doc_id, toks,
        |                 unnest(generate_series(1, len(toks) - 2)) AS i FROM t) u) g
        |  GROUP BY doc_id, ng),
        |trif AS (SELECT doc_id, CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
        |                AS top_trigram_frac FROM tri GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens,
        |       CAST(b.n_tokens - b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
        |         AS dup_word_frac,
        |       bif.top_bigram_frac, trif.top_trigram_frac,
        |       CASE WHEN CAST(b.n_tokens - b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) > 0.7
        |              OR bif.top_bigram_frac > 0.11
        |              OR trif.top_trigram_frac > 0.09
        |            THEN 'drop' ELSE 'keep' END AS verdict
        |FROM base b
        |JOIN bif USING (doc_id) JOIN trif USING (doc_id)""".stripMargin,
    "t24_persisted_bm25" -> bm25Oracle,
    "t07_bm25" -> bm25Oracle,
    "t06_redact" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_longnums,
        |       CAST(len(regexp_extract_all(text, '[a-z]{12,}')) AS BIGINT) AS n_longwords,
        |       regexp_replace(regexp_replace(regexp_replace(text,
        |         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |         '[0-9]{6,}', '[NUM]', 'g'),
        |         '[a-z]{12,}', '[LONG]', 'g') AS redacted,
        |       length(regexp_replace(regexp_replace(regexp_replace(text,
        |         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |         '[0-9]{6,}', '[NUM]', 'g'),
        |         '[a-z]{12,}', '[LONG]', 'g')) AS redacted_chars
        |FROM documents""".stripMargin,
    "t05_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         tf.tf * round(ln((SELECT count(*) FROM documents) / dfreq.df), 9)
        |           AS tfidf
        |  FROM tf JOIN dfreq USING (term))
        |SELECT doc_id, rk, term, tf, tfidf FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |              ORDER BY tfidf DESC, term) AS BIGINT) AS rk
        |  FROM scored) t
        |WHERE rk <= 3""".stripMargin,
    "t01_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |u AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         len(list_filter(toks, x -> list_contains(['the','a','of','and'], x)))
        |           / len(toks) AS en_stop_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, en_stop_ratio,
        |       CASE WHEN en_stop_ratio >= 0.04 THEN 'en' ELSE 'other' END AS predicted_lang,
        |       (CASE WHEN en_stop_ratio >= 0.04 THEN 'en' ELSE 'other' END) = lang
        |         AS agrees_label
        |FROM u""".stripMargin,
    "t02_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
        |u AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         len(list_filter(toks, x -> length(x) <= 2)) / len(toks) AS short_ratio,
        |         (n_chars - len(toks) + 1) / len(toks) AS avg_token_len
        |  FROM t)
        |SELECT doc_id, n_tokens, short_ratio, avg_token_len,
        |       sqrt(n_tokens) - short_ratio * 2.0 + avg_token_len * 0.1 AS score,
        |       CASE WHEN sqrt(n_tokens) - short_ratio * 2.0 + avg_token_len * 0.1 >= 7.5
        |            THEN 'keep' ELSE 'drop' END AS verdict
        |FROM u""".stripMargin,
    "t03_token_stats" ->
      """SELECT doc_id, n_chars,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_runs,
        |       CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS n_bpeish
        |FROM documents""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(1, length(text) + 1),
        |             i -> CAST(ord(substring(text, i, 1)) AS BIGINT))),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
        |FROM documents""".stripMargin,
  )
}
