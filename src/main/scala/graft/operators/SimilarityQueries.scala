package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{cosine_similarity, dot_product}
import graft.plans.TopKPerGroup
import graft.plans.TopKPerGroup.Ord

/** Approximate / exact nearest-neighbor search over the `embeddings` table
  * (brief §extended: similarity search). Two paths:
  *
  *  - brute-force top-k (the correctness baseline): broadcast the query
  *    vectors, one scan of the corpus, codegen'd cosine kernel, per-query
  *    top-k via the native [[graft.plans.TopKPerGroup]] operator. At 100 TB
  *    the corpus scan is embarrassingly parallel and the only shuffle
  *    carries at most |queries| x k candidate rows per partition — the
  *    partial per-partition heaps mean NO single reducer ever sees all of a
  *    query's candidates (a rank window would funnel the whole corpus
  *    through one task per query id).
  *  - sign-LSH bucketed ANN (the scale path): 16 random-hyperplane buckets
  *    computed in the scan, bucket-equality join prunes the candidate set to
  *    ~1/16 of the corpus per query before the cosine kernel runs. Same
  *    structure generalizes to IVF with learned centroids.
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val NQueries = 10

  private def queriesSide(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Score candidates then keep per-query top-k via partial-heap shuffles
    * (k rows per (query, partition) enter the exchange — never the full
    * candidate set of a query through one reducer).
    */
  private def perQueryTopK(scored: DataFrame): DataFrame =
    TopKPerGroup.topK(scored.select(col("q_id"), col("vec_id"), col("sim")),
      Seq("q_id"), Seq(Ord("sim", desc = true), Ord("vec_id")), K)

  /** One corpus scan scored by `kernel` against the broadcast query side,
    * top-`n` per query through the partial heaps — the shortlist stage
    * shared by the fusion/re-rank family (s14/s15/s16).
    */
  private def scoredShortlist(s: SparkSession, d: String,
      kernel: (Column, Column) => Column, n: Int): DataFrame =
    TopKPerGroup.topK(
      Tables.embeddings(s, d)
        .join(broadcast(queriesSide(s, d)), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          kernel(col("q_emb"), col("embedding")).as("sim")),
      Seq("q_id"), Seq(Ord("sim", desc = true), Ord("vec_id")), n)

  /** Exact top-k cosine for each of the 10 query vectors. */
  def s01_knn_bruteforce(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = queriesSide(s, d)
    perQueryTopK(
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** s41: PER-QUERY-correlated filtered kNN — the filtered-ANN case s13
    * and s39 do NOT cover: there the predicate is a global constant
    * (label IN set) that pushes to the parquet scan once for all queries;
    * here each query carries its OWN predicate (candidates must differ
    * from the query's label — the "exclude my own cluster" serving
    * filter), so no single scan-filter exists. The right distributed
    * shape is predicate-in-join-condition: the broadcast query side
    * carries (q_emb, q_label) and the non-equi condition drops
    * disqualified candidates AT THE JOIN, before the cosine kernel or the
    * partial heaps see them — unlike post-filtering a top-k, which must
    * over-fetch and can come back short. Same kernel/tie-break discipline
    * as s01, so the result hash-checks exactly.
    */
  def s41_filtered_knn(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = Tables.embeddings(s, d).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    perQueryTopK(
      e.join(broadcast(q),
          col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** Deterministic +-1 hyperplanes for sign-LSH (fixed LCG — every executor,
    * session and round derives the same planes; no RNG state shipped).
    */
  private[operators] def planes(nPlanes: Int = 4, dim: Int = 64): Array[Array[Float]] = {
    var x = 0x51AF3B72C9D4E815L
    Array.fill(nPlanes, dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      if (x > 0) 1.0f else -1.0f
    }
  }

  private[operators] def bucketOf(emb: Column): Column = {
    val ps = planes()
    ps.zipWithIndex.map { case (p, j) =>
      val planeLit = typedLit(p.toSeq)
      when(dot_product(emb, planeLit) > 0, 1 << j).otherwise(0)
    }.reduce(_ + _)
  }

  /** ANN via sign-LSH: candidates share the query's 4-bit sign bucket.
    * Returns per-query in-bucket top-k (approximate by construction —
    * that's the trade: touch ~6% of the corpus instead of 100%).
    */
  def s02_ann_lsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("bucket", bucketOf(col("embedding")))
    val q = queriesSide(s, d)
      .withColumn("q_bucket", bucketOf(col("q_emb")))
    perQueryTopK(
      e.join(broadcast(q),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** s20: MULTIPROBE sign-LSH — the standard recall/latency dial on s02
    * (Lv et al., "Multi-Probe LSH", VLDB'07): each query probes its own
    * bucket plus every 1-bit-flip neighbor (the 4 nearest Hamming
    * perturbations of its sign pattern), 5 of 16 buckets, so the expected
    * candidate set is ~5/16 of the corpus instead of ~1/16 — recall rises
    * without adding tables or re-hashing the corpus. The probe fan-out
    * explodes on the 10-row broadcast QUERY side only (50 probe rows);
    * the corpus is still hashed and scanned exactly once. Because the
    * candidate set is a strict superset of s02's, per-query recall@5
    * against s01's exact truth is monotonically >= s02's — QueriesSpec
    * pins that ladder deterministically (fixed LCG planes).
    */
  def s20_multiprobe_lsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("bucket", bucketOf(col("embedding")))
    val probes = array(
      col("q_bucket") +: (0 until 4).map(p =>
        col("q_bucket").bitwiseXOR(lit(1 << p))): _*)
    val q = queriesSide(s, d)
      .withColumn("q_bucket", bucketOf(col("q_emb")))
      .withColumn("probe", explode(probes))
    perQueryTopK(
      e.join(broadcast(q),
          col("bucket") === col("probe") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** Dot-product scoring against a single broadcast query vector via the
    * native kernel — the "rank corpus by relevance" shape; top-20 overall
    * (TakeOrderedAndProject, no global sort).
    */
  def s03_dot_topk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        dot_product(col("q_emb"), col("embedding")).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(20)
  }

  /** Per-cell element-wise mean centroids in EXACT arithmetic: elements
    * quantize to 1e-6 fixed-point longs (`round` at scale 0 agrees across
    * engines — the s07 playbook), the per-dimension LONG sums are
    * order-independent (double summation is not — aggregation merge order
    * varies run to run AND engine to engine), and the single final
    * division is deterministic. That order-independence is what lets the
    * IVF family sit under the DuckDB hash gate. Magnitudes stay exact:
    * |elem| <= ~10 → qv <= 1e7; 1e9 rows/cell keeps the sum < 2^53 when
    * cast back to double. The 64x posexplode feeds a map-side partial agg
    * that collapses to cells x dims rows per partition — centroid
    * training is a keys-only shuffle even at 100 TB.
    */
  private def quantizedMeanCells(e: DataFrame): DataFrame =
    e.select(col("label").as("cell"),
        posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(expr("CAST(round(col * 1000000D, 0) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, s, n))), " +
        "x -> CAST(x.s AS DOUBLE) / (1000000D * x.n))").as("centroid"))

  /** IVF-style ANN: coarse-quantize the corpus into cells (centroid =
    * exact-arithmetic element-wise mean per label — stand-in for k-means
    * iterations, same shapes), route each query to its nearest centroid
    * (TopKPerGroup k=1, scales with query count), then search only that
    * cell. Every step is deterministic shared arithmetic → hash-checked
    * against the DuckDB unnest-and-average twin.
    */
  def s04_ivf_ann(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cells = quantizedMeanCells(e)
    val routed = TopKPerGroup.topK(
      queriesSide(s, d)
        .crossJoin(broadcast(cells))
        .withColumn("c_sim",
          cosine_similarity(col("q_emb").cast("array<double>"), col("centroid")))
        .select(col("q_id"), col("q_emb"), col("cell"), col("c_sim")),
      Seq("q_id"), Seq(Ord("c_sim", desc = true), Ord("cell")), 1) // nprobe = 1
      .select(col("q_id"), col("q_emb"), col("cell"))
    perQueryTopK(
      e.join(broadcast(routed), col("label") === col("cell") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** Cosine via built-in HOFs (`zip_with` + `aggregate`) instead of the
    * native expression — the compose-first variant on the brief's preference
    * ladder, kept registered so bench compares it against s01's codegen'd
    * kernel on identical work. Results are bit-identical (sequential double
    * fold on both paths).
    */
  def s05_zipwith_cosine(s: SparkSession, d: String): DataFrame = {
    // broadcast join inherits the single-file scan's ONE partition and the
    // per-pair HOF cosine serializes (r13 flight sweep); widen-if-narrow
    val e = Tables.widen(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")))
    val q = queriesSide(s, d)
    def fold(c: String): String =
      s"aggregate($c, 0D, (acc, v) -> acc + v)"
    perQueryTopK(
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("sim", expr(
          s"${fold("zip_with(CAST(q_emb AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y)")} / " +
            s"(sqrt(${fold("transform(CAST(q_emb AS ARRAY<DOUBLE>), v -> v * v)")}) * " +
            s"sqrt(${fold("transform(CAST(embedding AS ARRAY<DOUBLE>), v -> v * v)")}))"))
        .select(col("q_id"), col("vec_id"), col("sim")))
  }

  /** IVF with TRAINED centroids: 3 deterministic Lloyd iterations
    * (graft.functions.KMeans — EXACT fixed-point integer training, round 8)
    * build an 8-cell coarse quantizer, queries route to their nearest
    * learned cell via the same zero-shuffle argmin projection that assigns
    * the corpus, search happens in-cell only. The full two-stage ANN
    * pipeline: train -> assign -> probe. Hash-green: the DuckDB oracle
    * REBUILDS the 3 integer Lloyd iterations inline (unrolled CTEs), so
    * the gate re-proves the whole training loop every round.
    */
  def s06_ivf_kmeans(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KMeans
    val e = Tables.embeddings(s, d)
    val cells = KMeans.fit(e, "vec_id", "embedding", k = 8, iterations = 3)
    val assigned = KMeans.assign(e, cells, "embedding")
    val q = KMeans.assign(queriesSide(s, d), cells, "q_emb")
      .withColumnRenamed("cluster", "q_cluster")
    perQueryTopK(
      assigned.join(broadcast(q),
          col("cluster") === col("q_cluster") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** int8 scalar-quantized KNN — the storage-bound scale path: at 100 TB
    * of float32 embeddings, quantizing to int8 cuts the scanned bytes 4x
    * and turns the kernel into exact integer arithmetic. Per-vector
    * symmetric quantization (scale = 127/max|x|), integer dot product,
    * norm correction in double — every step is deterministic arithmetic
    * both engines implement identically, so unlike s02/s04's
    * LSH/k-means variants this APPROXIMATE method is still fully
    * oracle-checkable. Top-k via the native partial-heap operator.
    */
  def s07_quantized_cosine(s: SparkSession, d: String): DataFrame = {
    def quantized(df: DataFrame, vecCol: String, out: String): DataFrame =
      df.withColumn("__amax",
          expr(s"array_max(transform(CAST($vecCol AS ARRAY<DOUBLE>), v -> abs(v)))"))
        .withColumn(out, expr(
          s"transform(CAST($vecCol AS ARRAY<DOUBLE>), x -> CAST(round(x * (127.0D / __amax)) AS BIGINT))"))
        .drop("__amax", vecCol)
    val e = quantized(Tables.widen( // 1-partition scan, per-row quantize HOF
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))),
      "embedding", "qv")
    val q = quantized(
      Tables.embeddings(s, d).filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("embedding")),
      "embedding", "q_qv")
    perQueryTopK(
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("sim", expr(
          "CAST(aggregate(zip_with(q_qv, qv, (a, b) -> a * b), 0L, (acc, v) -> acc + v) AS DOUBLE)" +
            " / (sqrt(CAST(aggregate(transform(q_qv, v -> v * v), 0L, (acc, v) -> acc + v) AS DOUBLE))" +
            " * sqrt(CAST(aggregate(transform(qv, v -> v * v), 0L, (acc, v) -> acc + v) AS DOUBLE)))"))
        .select(col("q_id"), col("vec_id"), col("sim")))
  }

  /** IVF with nprobe=2 — the recall knob on s04's nprobe=1: each query
    * probes its TWO nearest cells (TopKPerGroup k=2 on the routing side),
    * the in-cell searches union before the final top-k. Cost scales
    * linearly in nprobe while recall approaches brute force; the plan
    * shape (broadcast routed queries, one corpus scan, partial-heap
    * top-k) is unchanged.
    */
  def s08_ivf_nprobe(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cells = quantizedMeanCells(e)
    val routed = TopKPerGroup.topK(
      queriesSide(s, d)
        .crossJoin(broadcast(cells))
        .withColumn("c_sim",
          cosine_similarity(col("q_emb").cast("array<double>"), col("centroid")))
        .select(col("q_id"), col("q_emb"), col("cell"), col("c_sim")),
      Seq("q_id"), Seq(Ord("c_sim", desc = true), Ord("cell")), 2) // nprobe = 2
      .select(col("q_id"), col("q_emb"), col("cell"))
    perQueryTopK(
      e.join(broadcast(routed), col("label") === col("cell") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** Product quantization ANN (PQ 8x16): split the 64-dim space into 8
    * subspaces, train a 16-centroid codebook per subspace (deterministic
    * Lloyd), encode every corpus vector as 8 small codes, and score with
    * asymmetric distance — each query precomputes a per-subspace
    * sim-to-centroid table on the driver and candidates are scored by 8
    * TABLE LOOKUPS instead of a 64-dim kernel. This is the
    * billion-vector-scale compression: the scan reads 8 codes per row
    * (vs 256 bytes of floats), the per-row cost is O(M) lookups, and the
    * codebooks/tables are broadcast literals. Round 8: codebooks train in
    * EXACT fixed-point integers (the KMeans recipe), so the DuckDB oracle
    * rebuilds training + encode + ADC inline and the family hash-checks.
    */
  private val PqM = 8; private val PqDsub = 8; private val PqK = 16

  /** Per-subspace PQ codebooks (centroid id -> dsub-dim QUANTIZED integer
    * vector, 1e-6 fixed point), trained on a deterministic QUARTER sample
    * of the corpus — quantizer quality saturates long before full-corpus
    * size, and at 100 TB training on everything is pure waste (only the
    * encode pass must touch every row).
    *
    * All 8 subspaces train in ONE Lloyd pass: each training row fans out
    * to (subspace, cluster, dim) and a single 1024-group integer-sum
    * aggregate comes back — 8 independent `KMeans.fit` calls cost ~3
    * driver-round-trip jobs each; this is the identical math (same
    * smallest-id seed vectors, same argmin primitive, same floor-div
    * update, empty clusters keep their seed) in 2 jobs total. Everything
    * is int64-exact, so the update is merge-order-independent and the
    * DuckDB oracle replays training bit-equal (the round-8 change that
    * moved the PQ family from rows-only to hash-green).
    */
  private def trainCodebooks(e: DataFrame): Array[Array[Seq[Long]]] = {
    import graft.functions.KMeans
    val train = e.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("qv"))
      .localCheckpoint()
    val seed = train.orderBy(col("vec_id")).limit(PqK)
      .select(col("qv")).collect().map(_.getSeq[Long](0))
    val books: Array[Array[Seq[Long]]] =
      Array.tabulate(PqM)(m => seed.map(v => v.slice(m * PqDsub, (m + 1) * PqDsub)))
    val sums = train.select(posexplode(array((0 until PqM).map { m =>
        val sub = expr(s"slice(qv, ${m * PqDsub + 1}, $PqDsub)")
        struct(lit(m).as("m"),
          KMeans.nearestQIdx(sub, books(m).toIndexedSeq).as("cluster"),
          sub.as("sub"))
      }: _*)))
      .select(col("col.m"), col("col.cluster"), posexplode(col("col.sub")))
      .groupBy(col("m"), col("cluster"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .collect() // ≤ 8·16·8 = 1024 exact integer rows — k-bounded
    // JVM long division truncates toward zero, same as DuckDB integer `//`
    val updated = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (k, rows) =>
        val arr = new Array[Long](PqDsub)
        rows.foreach(r => arr(r.getInt(2)) = r.getLong(3) / r.getLong(4))
        k -> arr.toSeq
      }
    Array.tabulate(PqM)(m =>
      Array.tabulate(PqK)(c => updated.getOrElse((m, c), books(m)(c))))
  }

  /** 8-code PQ encoding column — ONE compiled kernel call per row
    * ([[graft.functions.PqEncode]]: quantize + 8×16 integer argmins),
    * sharing [[graft.functions.KMeans.quantizeElem]] and the argmin loop
    * with the trainer so tie-break + null semantics can't diverge from
    * the quantizer.
    */
  private def pqCodes(codebooks: Array[Array[Seq[Long]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.PqEncode(expression(col("embedding")),
      codebooks.map(_.toSeq.map(_.toSeq)).toSeq, PqDsub))
  }

  /** The sequential-double cosine fold — mirrors
    * VectorFunctions.CosineSimilarity's accumulation order exactly (the
    * s01-proven cross-engine pairing with DuckDB's `list_sum`).
    */
  private def cosSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** A quantized integer codeword as the double vector both engines agree
    * on: qc/1e6 element-wise (IEEE division of identical integers).
    */
  private def deq(qc: Seq[Long]): Seq[Double] =
    qc.map(_.toDouble / graft.functions.KMeans.Scale)

  /** Asymmetric distance tables: query sub-slice vs every centroid, on
    * the driver (10 queries x 8 x 16 doubles — broadcast as literals).
    * Centroids are dequantized integers, so both engines compute the
    * identical table values from the identical inputs.
    */
  private def adcTables(s: SparkSession, d: String,
                        codebooks: Array[Array[Seq[Long]]]): DataFrame = {
    val spark = s
    import spark.implicits._
    queriesSide(s, d)
      .select(col("q_id"), col("q_emb").cast("array<double>"))
      .collect().map { r =>
        val emb = r.getSeq[Double](1)
        r.getLong(0) -> (0 until PqM).map { m =>
          val sub = emb.slice(m * PqDsub, (m + 1) * PqDsub)
          codebooks(m).map(c => cosSeq(sub, deq(c))).toSeq
        }
      }.toSeq.sortBy(_._1).toDF("q_id", "tables")
  }

  /** ADC score: 8 table lookups summed — the per-candidate cost. */
  private val adcScore: Column = expr(
    "aggregate(zip_with(codes, tables, (c, t) -> element_at(t, c + 1)), " +
      "0D, (acc, v) -> acc + v)")

  def s09_pq_ann(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val codebooks = trainCodebooks(e)
    // pqCodes is per-row argmin over codebook centroids — CPU-heavy work
    // that serialized on the single-file scan's one task (r13 sweep)
    val encoded = Tables.widen(e.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), pqCodes(codebooks).as("codes"))
    val q = adcTables(s, d, codebooks)
    perQueryTopK(
      encoded.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", adcScore)
        .select(col("q_id"), col("vec_id"), col("sim")))
  }

  /** IVF + PQ composed — the billion-vector ANN architecture s08 and s09
    * demonstrate as halves: nprobe=2 coarse routing prunes the corpus to
    * two cells per query, and the survivors are scored by 8 PQ table
    * lookups instead of the 64-dim float kernel. At 100 TB the scan
    * touches ~2/cells of the rows and reads 8 codes per row; the
    * codebooks, centroids and ADC tables are all broadcast literals and
    * the final top-k runs on partial heaps. Integer-trained codebooks →
    * the oracle rebuilds the whole pipeline inline (hash-green); recall
    * is pinned against s01's exact top-k in QueriesSpec.
    */
  def s10_ivf_pq(s: SparkSession, d: String): DataFrame =
    perQueryTopK(ivfPqAdcScores(s, d)
      .select(col("q_id"), col("vec_id"), col("adc").as("sim")))

  /** The shared IVF+PQ front half of s10/s12: train codebooks, route each
    * query to its 2 nearest cells, ADC-score every encoded row of the
    * routed cells. The base projection is localCheckpointed ONCE — codebook
    * training, centroid aggregation and the encode pass all read it (three
    * independent parquet scans otherwise).
    */
  private def ivfPqAdcScores(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint()
    val codebooks = trainCodebooks(e)
    val cells = quantizedMeanCells(e)
    val routed = TopKPerGroup.topK(
      queriesSide(s, d)
        .crossJoin(broadcast(cells))
        .withColumn("c_sim",
          cosine_similarity(col("q_emb").cast("array<double>"), col("centroid")))
        .select(col("q_id"), col("cell"), col("c_sim")),
      Seq("q_id"), Seq(Ord("c_sim", desc = true), Ord("cell")), 2) // nprobe = 2
      .select(col("q_id"), col("cell"))
    // (q_id, cell, tables): 2 probe rows per query, still driver-tiny
    val probes = routed.join(adcTables(s, d, codebooks), "q_id")
    val encoded = e.select(col("vec_id"), col("label"), pqCodes(codebooks).as("codes"))
    encoded.join(broadcast(probes),
        col("label") === col("cell") && col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcScore)
      .select(col("q_id"), col("vec_id"), col("adc"))
  }

  /** IVF+PQ with an exact RE-RANK tail — the production billion-vector
    * pipeline in full (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011 §V: ADC shortlists, exact re-ranking
    * recovers the quantization loss). s10 returns ADC scores directly; here
    * the ADC pass only SHORTLISTS the top-R (R = 10k) candidates per query,
    * the shortlist joins back its float vectors, and the exact kernel
    * rescores just those R rows before the final top-k. At 100 TB the
    * expensive exact kernel touches R rows per query instead of a cell's
    * millions, while recall climbs from PQ-lossy toward s08's exact-scoring
    * ceiling (same routing, so s08 bounds it above; QueriesSpec pins both
    * relations). Integer-trained codebooks -> oracle-rebuilt, hash-green.
    */
  private val RerankR = 10 * K

  def s12_ivf_pq_rerank(s: SparkSession, d: String): DataFrame = {
    val shortlist = TopKPerGroup.topK(ivfPqAdcScores(s, d),
      Seq("q_id"), Seq(Ord("adc", desc = true), Ord("vec_id")), RerankR)
      .select(col("q_id"), col("vec_id"))
    perQueryTopK(
      shortlist
        .join(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(queriesSide(s, d)), "q_id")
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** Graph-expansion ANN — the HNSW idea's bottom layer, batch-shaped: a
    * kNN GRAPH is prebuilt offline (top-3 in-bucket neighbors per node —
    * the pair generation stays LSH-bucket-bounded, never all-pairs); at
    * query time the query's bucket members SEED the search, expand one
    * hop along graph edges, and the seed∪expanded set is re-ranked with
    * the exact kernel. Candidates strictly contain s02's (same seeds), so
    * recall dominates s02 structurally — the graph hop buys back
    * neighbors that hash into adjacent buckets, the failure mode of pure
    * LSH. At 100 TB the graph build is the one expensive pass (standard
    * offline-index economics); per query the probe is two bounded joins.
    * LCG planes embedded as oracle literals (the s02/s20 recipe) →
    * hash-green; recall pinned vs s02 in QueriesSpec.
    */
  def s11_graph_ann(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("bucket", bucketOf(col("embedding")))
      .select(col("vec_id"), col("embedding"), col("bucket"))
      .localCheckpoint() // bucket kernel once; graph, seeds and re-rank reuse it
    val pairs = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        cosine_similarity(col("a.embedding"), col("b.embedding")).as("gsim"))
    val edges = TopKPerGroup.topK(pairs,
      Seq("src"), Seq(Ord("gsim", desc = true), Ord("dst")), 3)
      .select(col("src"), col("dst"))
    val q = queriesSide(s, d).withColumn("q_bucket", bucketOf(col("q_emb")))
    // the query itself stays in its seed set: ITS top-3 graph neighbors
    // are the best expansion candidates; self drops out post-expansion
    val seeds = e.join(broadcast(q.select(col("q_id"), col("q_bucket"))),
        col("bucket") === col("q_bucket"))
      .select(col("q_id"), col("vec_id"))
    val expanded = seeds.join(edges, seeds("vec_id") === edges("src"))
      .select(col("q_id"), col("dst").as("vec_id"))
    val candidates = seeds.union(expanded).distinct()
      .filter(col("vec_id") =!= col("q_id"))
    perQueryTopK(
      candidates
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(q.select(col("q_id"), col("q_emb"))), "q_id")
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** Filtered ("hybrid") vector search — top-k under a metadata predicate
    * (the filtered-ANN problem every production vector store exposes:
    * `WHERE label IN (...) ORDER BY sim LIMIT k`). This is the
    * PRE-filtering strategy: the predicate reaches the parquet scan
    * (pushed filter, plan-pinned), so the kernel only ever scores
    * qualifying rows — at 100 TB with a selective predicate that beats
    * post-filtering an ANN shortlist, which must over-fetch k/selectivity
    * candidates to survive the filter. Exact kernel -> hash-green.
    */
  def s13_filtered_knn(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).filter(col("label").isin(2, 5, 7))
    perQueryTopK(
      e.join(broadcast(queriesSide(s, d)), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke SIGIR'09) of two exact
    * rankers — the ensemble-retrieval step every hybrid RAG stack runs to
    * merge lexical and vector shortlists. Production RRF fuses each
    * ranker's top-N SHORTLIST, never full-corpus ranks, and the Spark
    * shape follows: each ranker keeps top-N per query via the partial-heap
    * [[TopKPerGroup]] (no corpus-sized rank window), the row_number that
    * assigns shortlist ranks runs over |queries| x N rows only, and the
    * fusion is a full outer join of two bounded shortlists. Scores are
    * 1/(C+rank) with integer ranks — a two-term IEEE sum in fixed order,
    * so the fused score itself hash-checks against DuckDB.
    */
  def s14_rrf_fusion(s: SparkSession, d: String): DataFrame = {
    val rrfN = 20 // per-ranker shortlist depth
    val rrfC = 60 // the paper's k; damps the head of each list
    def shortlist(kernel: (Column, Column) => Column, rankCol: String): DataFrame =
      scoredShortlist(s, d, kernel, rrfN)
        .select(col("q_id"), col("vec_id"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("q_id")
            .orderBy(col("sim").desc, col("vec_id"))).as(rankCol))
    val byCos = shortlist(cosine_similarity, "rank_cos")
    val byDot = shortlist(dot_product, "rank_dot")
    val fused = byCos.join(byDot, Seq("q_id", "vec_id"), "full")
      .select(col("q_id"), col("vec_id"),
        (coalesce(lit(1.0) / (lit(rrfC) + col("rank_cos")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfC) + col("rank_dot")), lit(0.0))).as("rrf"))
    TopKPerGroup.topK(fused, Seq("q_id"), Seq(Ord("rrf", desc = true), Ord("vec_id")), K)
  }

  /** Truncated-dimension shortlist + exact re-rank (the Matryoshka /
    * dimension-reduction retrieval economics, Kusupati et al. NeurIPS'22):
    * score the corpus on only the FIRST 16 of 64 dimensions (4x less
    * arithmetic and — with a column layout storing the prefix separately —
    * 4x fewer scanned bytes), shortlist top-50 per query, then re-rank
    * just the shortlist with the full-dimension exact kernel. Both stages
    * are deterministic float arithmetic, so unlike PQ/LSH variants the
    * whole two-stage pipeline hash-checks against DuckDB. Same partial-heap
    * top-k in both stages; the full-vector join back touches only
    * |queries| x 50 rows.
    */
  def s15_truncated_rerank(s: SparkSession, d: String): DataFrame = {
    val shortlist = scoredShortlist(s, d,
      (a, b) => cosine_similarity(slice(a, 1, 16), slice(b, 1, 16)), 50)
    perQueryTopK(
      shortlist.select(col("q_id"), col("vec_id"))
        .join(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(queriesSide(s, d)), "q_id")
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** MMR diversified re-rank (Carbonell & Goldstein SIGIR'98) — the
    * redundancy-removal step RAG retrievers run after similarity search:
    * greedily pick 5 of the top-20 shortlist, each step maximizing
    * lambda * sim(q, d) - (1 - lambda) * max_{s in selected} sim(d, s).
    * The greedy chain is inherently sequential, but each step touches
    * only |q| x 20 shortlist rows and |q| x 20 x 19 candidate-pair sims
    * (computed ONCE, checkpointed) — so the five steps are five tiny
    * keyed join+agg rounds over broadcast-scale frames, while the only
    * corpus-sized work is the initial shortlist through the partial-heap
    * top-k. Determinism: max over exact doubles is order-independent and
    * the MMR score is two multiplies and a subtract on identical IEEE
    * doubles, so the diversified ranking hash-checks against a DuckDB
    * oracle that unrolls the same five steps.
    */
  def s16_mmr_rerank(s: SparkSession, d: String): DataFrame = {
    // written as two literals, NOT (1 - lambda): 1.0 - 0.7 is
    // 0.30000000000000004 in IEEE — the oracle's 0.3 literal would differ
    val (lambda, oneMinusLambda) = (0.7, 0.3)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val short = scoredShortlist(s, d, cosine_similarity, 20)
      .withColumnRenamed("sim", "simq")
      .localCheckpoint() // every greedy step re-reads the shortlist
    val pairSims = short.select(col("q_id"), col("vec_id").as("va"))
      .join(short.select(col("q_id"), col("vec_id").as("vb")), "q_id")
      .filter(col("va") =!= col("vb"))
      .join(e.select(col("vec_id").as("va"), col("embedding").as("ea")), "va")
      .join(e.select(col("vec_id").as("vb"), col("embedding").as("eb")), "vb")
      .select(col("q_id"), col("va"), col("vb"),
        cosine_similarity(col("ea"), col("eb")).as("s"))
      .localCheckpoint() // candidate-pair kernel computed once, reused 4x
    var picked = TopKPerGroup.topK(short,
        Seq("q_id"), Seq(Ord("simq", desc = true), Ord("vec_id")), 1)
      .select(col("q_id"), col("vec_id"), col("simq").as("score"))
      .withColumn("rank", lit(1L))
    var selected = picked.select(col("q_id"), col("vec_id"))
    for (k <- 2 to 5) {
      val mx = pairSims
        .join(selected.select(col("q_id"), col("vec_id").as("vb")), Seq("q_id", "vb"))
        .groupBy(col("q_id"), col("va").as("vec_id"))
        .agg(max(col("s")).as("mx"))
      val cand = short
        .join(selected, Seq("q_id", "vec_id"), "left_anti")
        .join(mx, Seq("q_id", "vec_id"))
        .select(col("q_id"), col("vec_id"),
          (lit(lambda) * col("simq") - lit(oneMinusLambda) * col("mx")).as("score"))
      // checkpoint the (q-count-sized) pick: cand_k references
      // selected_{k-1} TWICE (anti-join + max-sim join), so without
      // materialization the greedy lineage DOUBLES per round — 2^4
      // re-executions of the early rounds under the final action
      // (measured: 33 jobs / 2.5 s at bench SF for 100 output rows)
      val pick = TopKPerGroup.topK(cand,
          Seq("q_id"), Seq(Ord("score", desc = true), Ord("vec_id")), 1)
        .withColumn("rank", lit(k.toLong))
        .localCheckpoint()
      picked = picked.unionByName(pick)
      selected = selected.unionByName(pick.select(col("q_id"), col("vec_id")))
    }
    picked.select(col("q_id"), col("rank"), col("vec_id"), col("score"))
  }

  // -------------------------------------------------------------------
  // s17: PERSISTED IVF+PQ index — the offline-build / online-query split
  // -------------------------------------------------------------------

  /** On-disk index layout/math version; baked into the directory name so a
    * change to the training or encoding arithmetic orphans old indexes
    * instead of silently serving stale codes to a newer query path.
    */
  private val IvfPqIndexVersion = "v2" // v2: integer-trained codebooks (round 8)

  private[graft] def ivfPqIndexDir(d: String): String = {
    // key the stored index by the corpus file's identity (size + mtime),
    // not just its path: a regenerated dataset at the same path must
    // orphan the old index, never serve stale codes under a valid marker
    val f = new java.io.File(d, "embeddings.parquet")
    SketchQueries.partialsDir(
      s"ivfpq_${IvfPqIndexVersion}_${f.length()}_${f.lastModified()}", d)
  }

  /** OFFLINE index build: train the PQ codebooks and coarse centroids,
    * encode every corpus vector ONCE, and persist the three index tables
    *
    *   {{{<dir>/centroids     (cell int, centroid double[dim])}}}
    *   {{{<dir>/pq_codebooks  (m int, c int, centroid double[dsub])}}}
    *   {{{<dir>/pq_codes      (vec_id long, label int, codes int[M])}}}
    *
    * committed by a `_complete` marker (interrupted builds rebuild; a
    * present marker skips the build entirely, so repeated queries pay
    * zero training cost). This is q65's persist→merge pattern applied to
    * vectors: at 100 TB the train+encode pass is the one expensive corpus
    * scan, paid once per corpus version, and every query thereafter reads
    * 8 small codes per row instead of 256 bytes of floats — the split
    * s10/s12 (which re-train inline per call) only simulate. Parquet
    * round-trips doubles exactly, so the stored index is bit-identical
    * to the in-memory one s10 trains.
    */
  private[graft] def ensureIvfPqIndex(s: SparkSession, d: String): String = {
    val dir = ivfPqIndexDir(d)
    if (new java.io.File(dir, "_complete").exists()) return dir
    buildIvfPqIndex(s,
      Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding")),
      dir)
    dir
  }

  /** The build pass over an arbitrary corpus frame — shared by the
    * full-corpus index (s17) and the base index of the incremental-append
    * path (s18), which trains on yesterday's corpus only.
    */
  private def buildIvfPqIndex(s: SparkSession, corpus: DataFrame, dir: String): Unit = {
    val e = corpus.localCheckpoint() // training, centroids and encode share one scan
    val codebooks = trainCodebooks(e)
    import s.implicits._
    (for (m <- 0 until PqM; c <- 0 until PqK) yield (m, c, codebooks(m)(c)))
      .toDF("m", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pq_codebooks")
    quantizedMeanCells(e)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    e.select(col("vec_id"), col("label"), pqCodes(codebooks).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/pq_codes")
    new java.io.File(dir, "_complete").createNewFile()
  }

  /** Stored codebooks read back into [[pqCodes]]'s in-memory shape (128
    * small rows — the same driver-side budget the inline trainer spends).
    * Integer codewords round-trip parquet losslessly, so the stored path
    * is bit-identical to the inline trainer by construction.
    */
  private def readCodebooks(s: SparkSession, dir: String): Array[Array[Seq[Long]]] = {
    val m = s.read.parquet(s"$dir/pq_codebooks").collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("c")) ->
        r.getSeq[Long](r.fieldIndex("centroid"))).toMap
    Array.tabulate(PqM)(i => Array.tabulate(PqK)(c => m((i, c))))
  }

  /** ONLINE query path over the persisted index — reads ONLY the stored
    * tables, never the corpus's raw embedding floats (PlanInvariantsSpec
    * pins `embeddings.parquet` absent from the executed plan). Query
    * routing and ADC-table construction are driver-side arithmetic over
    * k-bounded reads — 8 centroid rows, 128 codebook rows, 10 query
    * vectors, all constants at any corpus size (the same collect budget
    * the inline [[adcTables]] already spends). The only corpus-sized work
    * is one scan of `pq_codes` joined against the broadcast probe set,
    * then the partial-heap top-k. Every fold and tie-break mirrors s10's
    * inline path exactly (routing: sim desc then cell asc; ADC: the
    * sequential-double cosine), so QueriesSpec pins result equality with
    * s10 — persistence is lossless and s17 inherits s10's pinned recall.
    */
  def s17_persisted_ivfpq(s: SparkSession, d: String): DataFrame = {
    val dir = ensureIvfPqIndex(s, d)
    queryStoredIndex(s, d, dir, s.read.parquet(s"$dir/pq_codes"))
  }

  /** The online path over a stored index dir and a codes frame — shared by
    * s17 (base codes only) and s18 (base ∪ appended delta codes).
    */
  private def queryStoredIndex(s: SparkSession, d: String, dir: String,
                               codes: DataFrame): DataFrame =
    queryStoredIndexWith(s,
      queriesSide(s, d).select(col("q_id"), col("q_emb")), dir, codes)

  /** The same online path over an ARBITRARY (q_id, q_emb) query frame —
    * the serving interface: per-query results depend only on the query
    * vector and the stored index, so micro-batched query arrivals probe
    * identically to a one-shot set (StreamingSpec runs exactly that under
    * readStream/foreachBatch). The query side is collected driver-side to
    * build routing + ADC tables — a |batch| x (dim + M·K) budget, which
    * is the per-request arithmetic any ANN server does; batches are
    * expected serving-sized, not corpus-sized.
    */
  private[graft] def queryStoredIndexWith(s: SparkSession, queries: DataFrame,
                                          dir: String, codes: DataFrame): DataFrame = {
    // cosSeq is the same sequential fold as VectorFunctions.
    // CosineSimilarity and the inline adcTables — routing/scoring must
    // not diverge from s10's
    val cents = s.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Double](r.fieldIndex("centroid"))))
    val cb = readCodebooks(s, dir)
    val qs = queries
      .select(col("q_id"), col("q_emb").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val probes = qs.flatMap { case (qid, emb) =>
      // nprobe=2 routing under TopKPerGroup's (c_sim desc, cell) contract
      val routed = cents.map { case (cell, cen) => (cell, cosSeq(emb, cen)) }
        .sortBy { case (cell, sim) => (-sim, cell) }.take(2).map(_._1)
      val tables = (0 until PqM).map { m =>
        val sub = emb.slice(m * PqDsub, (m + 1) * PqDsub)
        (0 until PqK).map(c => cosSeq(sub, deq(cb(m)(c)))).toSeq
      }
      routed.map(cell => (qid, cell, tables))
    }
    import s.implicits._
    val probesDf = probes.toSeq.toDF("q_id", "cell", "tables")
    perQueryTopK(
      codes
        .join(broadcast(probesDf),
          col("label") === col("cell") && col("vec_id") =!= col("q_id"))
        .withColumn("sim", adcScore)
        .select(col("q_id"), col("vec_id"), col("sim")))
  }

  /** s18: INCREMENTAL index append — the daily-ingest economics d11 gives
    * text dedup, applied to the vector index: the expensive train+encode
    * pass ran once over the base corpus (vec_id % 17 != 0, "yesterday");
    * today's batch (vec_id % 17 == 0) is encoded with the STORED
    * codebooks — no retrain, no base re-encode — and written as a delta
    * codes table beside the base. Queries then probe base ∪ delta through
    * the identical online path. At 100 TB this is the only sane index
    * lifecycle: retraining on every append would rescan the corpus daily,
    * while quantizer drift accrues slowly and is repaid by scheduled full
    * rebuilds (the version-keyed dir makes that rebuild atomic).
    * QueriesSpec pins: the delta never rewrites base files, append is
    * idempotent, and every appended vector is served from the index.
    */
  private[graft] def ensureIncrementalIndex(s: SparkSession, d: String): String = {
    val f = new java.io.File(d, "embeddings.parquet")
    val dir = SketchQueries.partialsDir(
      s"ivfpq_inc_${IvfPqIndexVersion}_${f.length()}_${f.lastModified()}", d)
    if (!new java.io.File(dir, "_complete").exists()) {
      buildIvfPqIndex(s,
        Tables.embeddings(s, d)
          .filter(col("vec_id") % 17 =!= 0)
          .select(col("vec_id"), col("label"), col("embedding")),
        dir)
    }
    if (!new java.io.File(dir, "_delta_complete").exists()) {
      val cb = readCodebooks(s, dir)
      Tables.embeddings(s, d)
        .filter(col("vec_id") % 17 === 0)
        .select(col("vec_id"), col("label"), pqCodes(cb).as("codes"))
        .write.mode("overwrite").parquet(s"$dir/pq_codes_delta")
      new java.io.File(dir, "_delta_complete").createNewFile()
    }
    dir
  }

  def s18_incremental_append(s: SparkSession, d: String): DataFrame = {
    val dir = ensureIncrementalIndex(s, d)
    queryStoredIndex(s, d, dir,
      s.read.parquet(s"$dir/pq_codes")
        .unionByName(s.read.parquet(s"$dir/pq_codes_delta")))
  }

  /** s30: index COMPACTION — the segment-merge step that closes s18's
    * lifecycle (Lucene merges segments; Delta/Iceberg compact small
    * files; an ANN index folds its append deltas back into the base on a
    * schedule): base ∪ delta codes rewrite ONCE into a compacted codes
    * table committed by its own marker, and queries thereafter read the
    * single table — no per-query two-table union, no delta file listing.
    * Codes are already encoded, so compaction MOVES rows and never
    * re-encodes: results are bit-identical to pre-compaction s18
    * (QueriesSpec pins equality, plus marker idempotence and that the
    * base/delta inputs survive untouched for audit/rollback). At 100 TB
    * this rewrite is one codes-table scan — 8 bytes/vector, not the
    * 256-byte floats — which is exactly why the compaction schedule is
    * affordable where full retrains are not (s18's scaladoc contract).
    */
  def s30_index_compaction(s: SparkSession, d: String): DataFrame = {
    val dir = ensureIncrementalIndex(s, d)
    if (!new java.io.File(dir, "_compact_complete").exists()) {
      s.read.parquet(s"$dir/pq_codes")
        .unionByName(s.read.parquet(s"$dir/pq_codes_delta"))
        .write.mode("overwrite").parquet(s"$dir/pq_codes_compacted")
      new java.io.File(dir, "_compact_complete").createNewFile()
    }
    queryStoredIndex(s, d, dir, s.read.parquet(s"$dir/pq_codes_compacted"))
  }

  /** s19: ColBERT-style late-interaction (MaxSim) retrieval. Each 64-d
    * embedding is viewed as 8 contiguous token sub-vectors of 8 dims (the
    * multi-vector-per-document representation late-interaction models emit;
    * same grid view m04 takes of media bytes), and
    *
    *   {{{score(q, d) = sum_i max_j <q_i, d_j>}}}
    *
    * — every query token matches its best document token, summed. The
    * kernel is the native codegen'd [[graft.functions.MaxSimScore]] triple
    * loop (the equivalent higher-order-function spelling — slice / zip_with
    * / aggregate / array_max — computes the identical value but
    * materializes 128 sub-arrays per candidate pair; swapping in the native
    * expression cut the sf0.1 wall 4.9 s → sub-second). One corpus scan
    * against the broadcast query side, no shuffle beyond the k-bounded
    * partial-heap top-k, so the plan shape and 100 TB story are identical
    * to s01. Hash-green: the inner dot is the sequential-double fold both
    * engines share, max is order-independent over exact doubles, and the
    * outer sum folds in fixed i-order.
    */
  def s19_late_interaction(s: SparkSession, d: String): DataFrame =
    perQueryTopK(
      Tables.embeddings(s, d)
        .join(broadcast(queriesSide(s, d)), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.VectorFunctions.maxsim_score(
            col("q_emb"), col("embedding"), 8).as("sim")))

  /** s28: IVF RECALL-vs-nprobe SWEEP — the tuning table an operator reads
    * before fixing an ANN deployment's nprobe (d25's LSH S-curve, for the
    * IVF family): for nprobe = 1..4, route each query to its n best
    * quantized-mean cells, take the in-cell exact top-5, and score
    * measured recall@5 against s01's exact truth, in integer per-mille.
    * Everything is shared deterministic arithmetic (the s04/s08 routing,
    * s01's cosine, integer hit counts), so unlike a sampled recall probe
    * this whole MEASUREMENT hash-checks cross-engine. Plan shape: routing
    * ranks over 10x8 rows, ONE corpus scan scores candidates for all four
    * sweep points (the nprobe spine explodes on the broadcast query side
    * only), per-(nprobe, query) top-5 through the partial heaps, and the
    * recall join touches 4 x 50 shortlist rows. QueriesSpec pins the
    * ladder: recall non-decreasing in nprobe, and the nprobe=2 row equals
    * s08's recall by construction.
    */
  def s28_recall_sweep(s: SparkSession, d: String): DataFrame =
    ivfSweepParts(s, d)._1

  /** s28/s34 shared internals: the (sweep table, per-nprobe top-5) pair —
    * s28 publishes the sweep, s34 reuses the already-scored shortlists so
    * the auto-tuned query provably serves the same rows the calibration
    * measured.
    */
  private def ivfSweepParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint() // centroids, candidate scan and exact truth share it
    val cells = quantizedMeanCells(e)
    val routed = TopKPerGroup.topK(
      queriesSide(s, d)
        .crossJoin(broadcast(cells))
        .withColumn("c_sim",
          cosine_similarity(col("q_emb").cast("array<double>"), col("centroid")))
        .select(col("q_id"), col("q_emb"), col("cell"), col("c_sim")),
      Seq("q_id"), Seq(Ord("c_sim", desc = true), Ord("cell")), 4)
      .withColumn("rk", row_number().over( // <= 4 rows per query
        Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("cell"))))
    import s.implicits._
    val probes = routed.crossJoin(broadcast(Seq(1, 2, 3, 4).toDF("nprobe")))
      .filter(col("rk") <= col("nprobe"))
      .select(col("nprobe"), col("q_id"), col("q_emb"), col("cell"))
    val top5 = TopKPerGroup.topK(
      e.join(broadcast(probes),
          col("label") === col("cell") && col("vec_id") =!= col("q_id"))
        .select(col("nprobe"), col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")),
      Seq("nprobe", "q_id"), Seq(Ord("sim", desc = true), Ord("vec_id")), K)
    val exact = s01_knn_bruteforce(s, d)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val sweep = top5.join(exact, Seq("q_id", "vec_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_shortlist"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("nprobe").cast("long").as("nprobe"), col("n_shortlist"),
        col("n_hits"),
        expr(s"(n_hits * 1000) div ${NQueries.toLong * K}").as("recall_pm"))
    (sweep, top5)
  }

  /** s34: AUTO-TUNED nprobe serving — close the calibration loop s28
    * opens: pick the CHEAPEST nprobe whose measured recall@5 clears the
    * 900‰ target (falling back to the deepest probe if none does) and
    * serve the top-5 at that setting. This is how an ANN deployment
    * actually picks its operating point — from the stored sweep, not a
    * guess — and because the pick rides a broadcast 1-row join (never a
    * driver branch), the whole decision is inside the plan and the
    * DuckDB twin makes the identical pick from the identical sweep: the
    * hash gate checks calibration, decision, and served rows end-to-end.
    */
  def s34_auto_nprobe(s: SparkSession, d: String): DataFrame = {
    val (sweep, top5) = ivfSweepParts(s, d)
    val pick = sweep.agg(
      coalesce(min(when(col("recall_pm") >= 900, col("nprobe"))),
        max(col("nprobe"))).as("np"))
    top5.join(broadcast(pick), col("nprobe") === col("np"))
      .select(col("nprobe").cast("long").as("nprobe"), col("q_id"),
        col("vec_id"))
  }

  /** Cosine threshold for s23 range search — chosen so each query returns
    * a non-trivial, non-exhaustive neighbor set on the fixture corpus.
    */
  private val RadiusTau = 0.25

  /** s23: RADIUS (range) search — every corpus vector within cosine >=
    * [[RadiusTau]] of each query, the other half of the vector-store query
    * surface (top-k answers "best k", range answers "all this similar":
    * dedup candidate pulls, recall-oriented retrieval, near-neighbor
    * audits). Plan is s01's scan shape minus the heaps: broadcast query
    * side, one corpus scan through the codegen'd cosine kernel, a codegen'd
    * filter — NO shuffle at all (the top-k exchange disappears because
    * range search has no global order), so output streams straight from
    * the scan and 100 TB cost is exactly one pass. Hash-green: the kernel
    * is s01's bit-identical double fold on both engines, so the threshold
    * selects identical sets (no tolerance window needed).
    */
  def s23_radius_search(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .join(broadcast(queriesSide(s, d)), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine_similarity(col("q_emb"), col("embedding")).as("sim"))
      .filter(col("sim") >= RadiusTau)

  /** One 32-bit half of the 64-bit sign signature: bit i set iff dim
    * `off + i` of the embedding is positive. This HOF spelling is the
    * readable reference formulation; the hot path uses the native
    * [[graft.functions.SignBits]] codegen kernel (FunctionsSpec pins the
    * two bit-identical). Summing distinct powers of two is exact bit-OR,
    * and each half stays below 2^32 so the DuckDB twin never touches
    * shift-overflow territory.
    */
  private[graft] def signHalf(v: Column, off: Int): Column =
    aggregate(sequence(lit(0), lit(31)), lit(0L),
      (acc, i) => acc + when(
        element_at(v, i + lit(off + 1)).cast("double") > lit(0d),
        call_function("shiftleft", lit(1L), i)).otherwise(lit(0L)))

  private def signSig(df: DataFrame, idCol: String, pre: String): DataFrame =
    df.withColumn("sig", graft.functions.VectorFunctions.sign_bits(col("embedding")))
      .select(col("vec_id").as(idCol),
        element_at(col("sig"), 1).as(s"${pre}_lo"),
        element_at(col("sig"), 2).as(s"${pre}_hi"))

  /** s24: BINARY (1-bit) quantization search — the 32x-compression end of
    * the quantization spectrum next to s07's int8 and s09's PQ codes: each
    * 64-d float vector collapses to a 64-bit sign signature (bit = is the
    * coordinate positive), candidates shortlist by HAMMING distance
    * (xor + popcount — the cheapest similarity kernel that exists), and
    * exact cosine re-ranks only the 50-deep shortlist (s22's split). For
    * random-ish directions Hamming distance is a monotone estimator of
    * angle (Goemans–Williamson / Charikar'02: P[sign differs] = θ/π per
    * dim), which is why modern vector stores ship exactly this as their
    * "binary quantization" tier. Everything is deterministic integer
    * arithmetic — signatures are exact bit sets, Hamming is exact, ties
    * break on vec_id, and the re-rank reuses s01's bit-identical cosine —
    * so the whole approximate method hash-checks against DuckDB building
    * identical signatures (the s07 trick at 1 bit per dim). At 100 TB the
    * signature pass rides the corpus scan (16 bytes/row through the
    * shortlist shuffle instead of 256), the Hamming kernel is two xors
    * and two popcounts per pair inside whole-stage codegen, and the exact
    * tail touches 50 raw vectors per query.
    */
  def s24_binary_quant(s: SparkSession, d: String): DataFrame =
    signatureSearch(s, d, signSig(Tables.embeddings(s, d), "vec_id", "c"))

  /** The Hamming-shortlist / exact-re-rank tail over an arbitrary corpus
    * signature frame (vec_id, c_lo, c_hi) — shared by s24 (signatures
    * computed in the scan) and s27 (signatures read from the store).
    */
  private def signatureSearch(s: SparkSession, d: String,
                              corpus: DataFrame): DataFrame = {
    val queries = signSig(
      Tables.embeddings(s, d).filter(col("vec_id") < NQueries), "q_id", "q")
    val hamming =
      call_function("bit_count", col("q_lo").bitwiseXOR(col("c_lo"))) +
        call_function("bit_count", col("q_hi").bitwiseXOR(col("c_hi")))
    val shortlist = TopKPerGroup.topK(
      corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), hamming.cast("long").as("hdist")),
      Seq("q_id"), Seq(Ord("hdist"), Ord("vec_id")), 50)
    perQueryTopK(
      shortlist.select(col("q_id"), col("vec_id"))
        .join(Tables.embeddings(s, d), "vec_id")
        .join(broadcast(queriesSide(s, d)), "q_id")
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** s27: PERSISTED binary-signature index — the 16-bytes-per-vector tier
    * of the persisted family (s17 stores 8 PQ codes + centroids; this
    * stores just the two sign halves): the offline build signs the corpus
    * ONCE into a marker-committed `signatures` table, and the query path
    * runs the Hamming scan over STORED signatures — the corpus's raw
    * floats are touched only to re-rank the 50-per-query shortlist (the
    * s12 economics: candidate generation never reads them). Shares s24's
    * oracle verbatim, so the hash check proves persistence is lossless.
    */
  private[graft] def ensureSignIndex(s: SparkSession, d: String): String = {
    val f = new java.io.File(d, "embeddings.parquet")
    val dir = SketchQueries.partialsDir(
      s"signidx_v1_${f.length()}_${f.lastModified()}", d)
    if (!new java.io.File(dir, "_complete").exists()) {
      signSig(Tables.embeddings(s, d), "vec_id", "c")
        .write.mode("overwrite").parquet(s"$dir/signatures")
      new java.io.File(dir, "_complete").createNewFile()
    }
    dir
  }

  def s27_persisted_signatures(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSignIndex(s, d)
    signatureSearch(s, d, s.read.parquet(s"$dir/signatures"))
  }

  /** s26: exact MAXIMUM-INNER-PRODUCT search via the norm-augmentation
    * reduction (Bachrach et al. RecSys'14; the order-preserving cousin of
    * Shrivastava–Li's ALSH): MIPS does not obey the triangle inequality,
    * so metric indexes cannot serve it directly — but appending ONE
    * dimension sqrt(M² − ‖x‖²) to every corpus vector (M = max corpus
    * norm) and 0 to every query makes all corpus vectors share norm M,
    * collapsing inner-product order into cosine order. After the
    * transform, EVERY cosine-based index in this family (sign-LSH, IVF,
    * PQ, binary signatures) serves MIPS unchanged — that is the point of
    * the reduction, and why recommender systems ship it. Here the
    * augmented space is scored with the exact cosine kernel (one scan,
    * broadcast queries, partial heaps); QueriesSpec pins the reduction
    * theorem empirically — augmented-cosine top-k equals raw dot-product
    * top-k for every query. sqrt is IEEE-correctly-rounded (unlike ln),
    * and the norm folds are the shared sequential-double formulation, so
    * the whole transform hash-checks.
    */
  def s26_mips_augmented(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
    val m2 = e.select(expr("aggregate(x, 0.0D, (a, v) -> a + v * v)").as("n2"))
      .agg(max(col("n2")).as("m2"))
    val corpus = e.crossJoin(broadcast(m2))
      .select(col("vec_id"), expr(
        "concat(x, array(sqrt(m2 - aggregate(x, 0.0D, (a, v) -> a + v * v))))")
        .as("x_aug"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"),
        expr("concat(x, array(0.0D))").as("q_aug"))
    perQueryTopK(
      corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_aug"), col("x_aug")).as("sim")))
  }

  /** s29: embedding CENTROID-DRIFT monitor — the vector-side twin of
    * q119's distribution PSI: per-label centroids (s04's exact
    * quantized-mean arithmetic — integer micro-unit sums, so the means
    * are order-independent) compared by cosine against the GLOBAL
    * centroid. A label whose centroid sits far from the global mean is a
    * cluster the next model will treat differently; tracked per ingest
    * batch it is the embedding-space drift alarm every feature store
    * wants next to its scalar PSI. One posexplode aggregate builds all
    * centroids (map-side partials, |labels|·dims rows out), the global
    * centroid broadcasts, and the cosine is the shared sequential-double
    * fold — micro-unit rounded → hash-green.
    */
  def s29_centroid_drift(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cells = quantizedMeanCells(e)
    val global = quantizedMeanCells(e.withColumn("label", lit(0)))
      .select(col("centroid").as("g_centroid"))
    val counts = e.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    cells.select(col("cell").cast("long").as("label"), col("centroid"))
      .join(counts, "label")
      .crossJoin(broadcast(global))
      .select(col("label"), col("n_vecs"),
        round(cosine_similarity(col("centroid"), col("g_centroid")) * 1000000)
          .cast("long").as("cos_micro"))
  }

  /** s31: COMPRESSION-RECALL frontier — the one-table summary an ANN
    * deployment reads before choosing its storage tier (d25/s28's
    * tuning-table idea for the whole quantization family): for each
    * hash-green member — exact float32 (256 B/vec), int8 scalar
    * quantization (64 B), JL ±1 projection (compute-compressed), 1-bit
    * sign signatures (8 B) — the measured recall@5 against the exact
    * truth, in integer per-mille. Each family's shortlist comes from its
    * own already-oracle-checked pipeline; the DuckDB twin re-runs the
    * component oracles verbatim as subqueries, so even this measurement
    * TABLE is hash-green. Spec pins the monotone storage/recall
    * trade-off ladder (exact ≥ int8 ≥ sign at these widths).
    *
    * ONE-action shape (round 10; the r9 version ran a count per family —
    * 6 jobs — whose multi-job footprint amplified ambient contention in
    * the bench capture into a false 13.9× reading): the four family
    * shortlists union with a family tag, left-join truth ONCE with a hit
    * flag, and a single 4-group aggregate emits the whole frontier.
    * n_truth needs no driver-side count — the float32_exact family IS
    * the truth set, so its hit count equals |truth| and a 4-row window
    * max rebroadcasts it to every family row. The only remaining
    * materialization is truth's localCheckpoint (it feeds both the
    * union arm and the join side; without it the brute-force scan would
    * run twice — exchange reuse does not unify the differently-projected
    * subtrees).
    */
  def s31_compression_frontier(s: SparkSession, d: String): DataFrame = {
    val truth = s01_knn_bruteforce(s, d)
      .select(col("q_id"), col("vec_id")).localCheckpoint()
    def arm(name: String, bytes: Long, df: DataFrame): DataFrame =
      df.select(lit(name).as("family"), lit(bytes).as("bytes_per_vec"),
        col("q_id"), col("vec_id"))
    val shortlists = arm("float32_exact", 256L, truth)
      .unionByName(arm("int8_sq", 64L, s07_quantized_cosine(s, d)))
      .unionByName(arm("jl_proj32", 256L, s22_jl_projection(s, d)))
      .unionByName(arm("sign_1bit", 8L, s24_binary_quant(s, d)))
    val counted = shortlists
      .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
      .groupBy(col("family"), col("bytes_per_vec"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    // a family whose shortlist came back EMPTY must still report a 0-hit
    // row (the oracle's UNION ALL literals always emit all four): anchor
    // the output on a literal 4-row family frame and left-join the counts
    import s.implicits._
    val familyRows = Seq(("float32_exact", 256L), ("int8_sq", 64L),
      ("jl_proj32", 256L), ("sign_1bit", 8L)).toDF("family", "bytes_per_vec")
    familyRows
      .join(counted, Seq("family", "bytes_per_vec"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("n_truth",
        max(when(col("family") === "float32_exact", col("n_hits")))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("recall_pm", expr("(n_hits * 1000) div n_truth"))
  }

  /** s32: k-NN GRAPH construction — the all-nodes neighbor manifest the
    * SemDeDup / kNN-LM / graph-ANN-build family starts from. Unlike the
    * query-side stack (s01-s26: ten broadcast queries against a corpus
    * scan), BOTH sides here are the corpus, so there is no broadcast
    * side at any scale: candidates come from a shuffle join
    * CO-PARTITIONED on the deterministic sign-LSH bucket ([[planes]] —
    * s02's fixed LCG hyperplanes), so pairs are only ever generated
    * within a bucket, and each node's top-3 runs through the native
    * partial heaps (never a full candidate set through one reducer).
    * Approximate by construction (bucket pruning) yet hash-green: the
    * planes are JVM constants the DuckDB twin embeds verbatim, so both
    * engines derive identical buckets, candidates, and cosines. Scale
    * dial: plane count grows with log2(n) to hold per-bucket population
    * (and the within-bucket quadratic) at a constant per-vector factor;
    * s20's multiprobe buys recall back at the same corpus-scan cost.
    */
  def s32_knn_graph(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", bucketOf(col("embedding")))
    val cand = e.alias("a").join(e.alias("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"),
        cosine_similarity(col("a.embedding"), col("b.embedding")).as("sim"))
    TopKPerGroup.topK(cand, Seq("vec_id"),
      Seq(Ord("sim", desc = true), Ord("nbr_id")), 3)
  }

  private val KnnGraphVersion = "v1"

  private[graft] def knnGraphDir(d: String): String = {
    // keyed by corpus identity (size + mtime), the ivfPqIndexDir rule: a
    // regenerated dataset must orphan the old graph, never serve stale
    // edges under a valid marker
    val f = new java.io.File(d, "embeddings.parquet")
    SketchQueries.partialsDir(
      s"knngraph_${KnnGraphVersion}_${f.length()}_${f.lastModified()}", d)
  }

  /** Build-once store for s32's k-NN graph plus an INCREMENTAL-APPEND
    * path (round 10, verdict item 4 — the HNSW-economics gap next to the
    * IVF-PQ index: s32 re-ran its bucket self-join on every call, but a
    * production neighbor graph is built once and maintained under
    * appends). Two marker-committed tables:
    *
    *   {{{<dir>/edges        base-corpus top-3 per node (vec_id % 17 != 0)}}}
    *   {{{<dir>/edges_delta  every candidate edge with a NEW endpoint}}}
    *
    * The delta holds, for the appended slice (vec_id % 17 == 0): each
    * new node's full same-bucket candidate list (new→base and new→new),
    * plus each affected BASE node's cross edges toward new nodes
    * (base→new) — cosine is symmetric and the sequential-double fold is
    * commutative per element, so the reversed rows reuse the one join's
    * sims bit-exactly. Append work is |new|·bucket-density, never a base
    * re-scan, and it NEVER rewrites base files (spec-pinned). Serving is
    * store-sized: union the two edge tables and re-take top-3 per node —
    * exact, because a stored base edge outside its node's base top-3 is
    * dominated by three edges that are all present in the union, and
    * every candidate involving a new node is in the delta by
    * construction. At 100 TB: the build pays the quadratic-within-bucket
    * once; nightly appends pay only the new slice; a scheduled rebuild
    * folds the delta back (the s30 compaction economics).
    */
  private[graft] def ensureKnnGraphStore(s: SparkSession, d: String): String = {
    val dir = knnGraphDir(d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", bucketOf(col("embedding")))
    if (!new java.io.File(dir, "_complete").exists()) {
      val base = e.filter(col("vec_id") % 17 =!= 0)
      val cand = base.alias("a").join(base.alias("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"),
          cosine_similarity(col("a.embedding"), col("b.embedding")).as("sim"))
      TopKPerGroup.topK(cand, Seq("vec_id"),
        Seq(Ord("sim", desc = true), Ord("nbr_id")), 3)
        .write.mode("overwrite").parquet(s"$dir/edges")
      new java.io.File(dir, "_complete").createNewFile()
    }
    if (!new java.io.File(dir, "_delta_complete").exists()) {
      val newV = e.filter(col("vec_id") % 17 === 0)
      // ONE join produces every edge with a new endpoint: direct rows are
      // x→n (x anything, n new — covers base→new and new→new in both
      // orientations); reversing the x-base rows adds new→base. No pair
      // appears twice (direct targets are new, reversed targets are base)
      // — a duplicate edge would double-count under the serve top-3.
      val cand1 = e.alias("a").join(newV.alias("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"),
          cosine_similarity(col("a.embedding"), col("b.embedding")).as("sim"))
        .localCheckpoint() // both orientation selects read one evaluation
      cand1.unionByName(
          cand1.filter(col("vec_id") % 17 =!= 0)
            .select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id"),
              col("sim")))
        .write.mode("overwrite").parquet(s"$dir/edges_delta")
      new java.io.File(dir, "_delta_complete").createNewFile()
    }
    dir
  }

  /** s42: the PERSISTED k-NN graph served from the store — pinned
    * bitwise-equal to inline [[s32_knn_graph]] (QueriesSpec) and reading
    * ONLY stored edge files (PlanInvariantsSpec). See
    * [[ensureKnnGraphStore]] for the build/append economics.
    */
  def s42_persisted_knn_graph(s: SparkSession, d: String): DataFrame = {
    val dir = ensureKnnGraphStore(s, d)
    TopKPerGroup.topK(
      s.read.parquet(s"$dir/edges")
        .unionByName(s.read.parquet(s"$dir/edges_delta")),
      Seq("vec_id"), Seq(Ord("sim", desc = true), Ord("nbr_id")), 3)
  }

  /** s33: HARD-NEGATIVE mining — the contrastive-retriever training
    * manifest (the DPR/ANCE recipe): for each query vector, the top-5
    * most-similar corpus vectors with a DIFFERENT label — confusable
    * enough to carry gradient, guaranteed non-positive — under a 0.95
    * cosine ceiling so near-duplicates (probable mislabeled positives;
    * the false-negative hazard every hard-negative miner filters) never
    * enter the pool. Shape: s01's broadcast-query corpus scan with the
    * label disqualifier folded into the join predicate and the ceiling
    * into the scan filter, per-query top-5 through the partial heaps.
    */
  def s33_hard_negatives(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    TopKPerGroup.topK(
      e.join(broadcast(q), col("label") =!= col("q_label"))
        .select(col("q_id"), col("vec_id").as("neg_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim"))
        .filter(col("sim") < 0.95),
      Seq("q_id"), Seq(Ord("sim", desc = true), Ord("neg_id")), K)
  }

  /** s36: margin-based BITEXT MINING (Artetxe & Schwenk, ACL 2019 — the
    * LASER/CCMatrix recipe): for a batch of "language A" sentences (even
    * labels, bounded mining batch) find their best "language B" match
    * (odd labels, full side scanned once), scored not by raw cosine but by
    * the RATIO MARGIN — sim(a,b) divided by the mean of a's and b's k-NN
    * similarity neighborhoods — which cancels hubness (a vector that is
    * everyone's neighbor gains no margin), plus the mutual-argmax flag
    * (forward-backward consistency). Kernel is s07's int8 quantization so
    * every similarity is exact integer per-mille arithmetic and this
    * approximate-by-nature miner still hash-checks end-to-end; candidate
    * pairs are checkpointed once so forward and backward neighborhoods
    * reuse one kernel pass (the d03 discipline). At 100 TB candidate
    * generation routes through s32's bucketed kNN graph instead of the
    * broadcast batch; margin rescoring (this operator's contribution) is
    * unchanged — it only ever touches top-k lists, k·|batch| rows.
    * Filters pin both margin operands positive so Spark's truncating
    * `div` and DuckDB's flooring `//` agree (the q85 hazard).
    */
  def s36_bitext_margin(s: SparkSession, d: String): DataFrame = {
    val k = 4
    // Round 14 (verdict item 4): the per-pair scorer ran THREE interpreted
    // aggregate/zip_with folds per candidate pair — the dot product plus
    // BOTH row norms, each norm recomputed once per pair although it is a
    // per-ROW quantity. Now each side computes its norm ONCE per row at
    // quantization time (same BIGINT fold, same cast-to-double-then-sqrt),
    // pre-casts the quantized vector to ARRAY<DOUBLE>, and pairs are
    // scored by the codegen'd dot_product kernel inside whole-stage
    // codegen. Bit-identical arithmetic: every quantized value is an
    // integer |q| <= 127, so dot and norm sums are exact integers far
    // below 2^53 in either accumulation, and the floor/div sees the same
    // doubles as the old spelling (pinned by SimilaritySpec).
    def quantized(df: DataFrame, vecCol: String, out: String): DataFrame =
      df.withColumn("__amax",
          expr(s"array_max(transform(CAST($vecCol AS ARRAY<DOUBLE>), v -> abs(v)))"))
        .withColumn("__q", expr(
          s"transform(CAST($vecCol AS ARRAY<DOUBLE>), x -> CAST(round(x * (127.0D / __amax)) AS BIGINT))"))
        .withColumn(out, expr("transform(__q, v -> CAST(v AS DOUBLE))"))
        .withColumn(s"${out}_nrm", expr(
          "sqrt(CAST(aggregate(transform(__q, v -> v * v), 0L, (acc, v) -> acc + v) AS DOUBLE))"))
        .drop("__amax", "__q", vecCol)
    val base = Tables.embeddings(s, d)
    val qa = quantized(
      base.filter(col("label") % 2 === 0 && col("vec_id") < 400)
        .select(col("vec_id").as("q_id"), col("embedding")), "embedding", "q_qv")
    val qb = quantized(
      base.filter(col("label") % 2 === 1)
        .select(col("vec_id"), col("embedding")), "embedding", "qv")
      // the mined side is the cross join's STREAM side and inherits the
      // single-file scan's one partition, serializing the per-pair
      // dot products — spread it to cluster width first
      .repartition(Tables.scanPartitions(s))
    val cand = qb.crossJoin(broadcast(qa))
      .withColumn("sim_pm",
        floor(lit(1000.0) * dot_product(col("q_qv"), col("qv"))
          / (col("q_qv_nrm") * col("qv_nrm"))).cast("long"))
      .select(col("q_id"), col("vec_id"), col("sim_pm"))
      .localCheckpoint()
    val fwd = TopKPerGroup.topK(cand, Seq("q_id"),
      Seq(Ord("sim_pm", desc = true), Ord("vec_id")), k)
    val fwdAgg = fwd.groupBy(col("q_id")).agg(
        sum(col("sim_pm")).as("fwd_sum"),
        max(struct(col("sim_pm"), (-col("vec_id")).as("nid"))).as("t1"))
      .select(col("q_id"), col("fwd_sum"),
        col("t1.sim_pm").as("top_sim"), (-col("t1.nid")).as("match_id"))
    val bwdTop = TopKPerGroup.topK(
      cand.join(broadcast(fwdAgg.select(col("match_id")).distinct()),
        col("vec_id") === col("match_id"), "left_semi"),
      Seq("vec_id"), Seq(Ord("sim_pm", desc = true), Ord("q_id")), k)
    val bwdAgg = bwdTop.groupBy(col("vec_id")).agg(
        sum(col("sim_pm")).as("bwd_sum"),
        max(struct(col("sim_pm"), (-col("q_id")).as("nq"))).as("b1"))
      .select(col("vec_id").as("b_id"), col("bwd_sum"),
        (-col("b1.nq")).as("b_top_q"))
    fwdAgg.join(broadcast(bwdAgg), col("match_id") === col("b_id"))
      .filter(col("top_sim") > 0 && col("fwd_sum") + col("bwd_sum") > 0)
      .select(col("q_id"), col("match_id"), col("top_sim").as("sim_pm"),
        expr(s"(${2 * k * 1000}L * top_sim) div (fwd_sum + bwd_sum)")
          .as("margin_pm"),
        when(col("b_top_q") === col("q_id"), 1L).otherwise(0L).as("mutual"))
  }

  /** s37: TOMBSTONE-AWARE index search — the q141 deletion-vector story
    * applied to the vector store: deletion requests (vec_id ≡ 3 mod 7 —
    * the deterministic stand-in for a user-deletion table) are served by
    * a broadcast anti-join against s27's PERSISTED signature index, the
    * index itself untouched — at 100 TB rebuilding a billion-vector
    * index for a few-permille delete set is the thing this path avoids;
    * a compaction pass (s30) eventually folds tombstones in. The
    * shortlist is generated over live signatures only, so every query
    * still comes back with a full top-k (deletes are replaced, not
    * holes); the oracle threads the same mask through s24's proven text.
    */
  def s37_tombstoned_search(s: SparkSession, d: String): DataFrame = {
    val store = s.read.parquet(s"${ensureSignIndex(s, d)}/signatures")
    val tomb = store.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
    signatureSearch(s, d,
      store.join(broadcast(tomb), Seq("vec_id"), "left_anti"))
  }

  /** s38: RANKING METRICS — the retrieval-evaluation suite (Recall@k, MRR,
    * nDCG@k) computed as an operator, with s01's exact brute-force top-5
    * as ground truth and s04's IVF(nprobe=1) as the system under test —
    * the eval loop every ANN deployment runs before trusting an index
    * configuration (s28's recall ladder reports set overlap only; this
    * adds the rank-sensitive metrics). nDCG stays integer-exact across
    * engines by embedding the position weights as ⌊1000/log₂(i+1)⌋
    * literals (1000/631/500/431/387) and their ideal prefix sums — the
    * q154 embedded-literal discipline applied to IR evaluation; MRR and
    * recall are plain floor divisions. Shape: two k-bounded result sets
    * (50 rows each) joined on (q_id, vec_id) — metric cost is
    * independent of corpus size by construction.
    */
  def s38_ranking_metrics(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    val gt = s01_knn_bruteforce(s, d)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit0"))
    val sys = s04_ivf_ann(s, d)
      .withColumn("srk", row_number().over(wq).cast("long"))
      .select(col("q_id"), col("vec_id"), col("srk"))
    sys.join(gt, Seq("q_id", "vec_id"), "left")
      .withColumn("hit", coalesce(col("hit0"), lit(0L)))
      .groupBy(col("q_id"))
      .agg(sum(col("hit")).as("h"),
        min(when(col("hit") === 1L, col("srk"))).as("first_hit"),
        sum(when(col("hit") === 1L,
          expr("CASE srk WHEN 1 THEN 1000L WHEN 2 THEN 631L WHEN 3 THEN 500L " +
            "WHEN 4 THEN 431L ELSE 387L END")).otherwise(0L)).as("dcg"))
      .select(col("q_id"),
        expr("h * 1000 div 5").as("recall_milli"),
        coalesce(expr("1000 div first_hit"), lit(0L)).as("mrr_milli"),
        expr("CASE WHEN h = 0 THEN 0L ELSE dcg * 1000 div " +
          "(CASE h WHEN 1 THEN 1000L WHEN 2 THEN 1631L WHEN 3 THEN 2131L " +
          "WHEN 4 THEN 2562L ELSE 2949L END) END").as("ndcg_milli"))
  }

  /** s39: PRE- vs POST-FILTER strategy audit — the planning decision every
    * filtered vector search makes (and every vector store documents):
    * PRE-filter scans the predicate's subset exactly (cost ∝ subset,
    * always complete); POST-filter reuses an unfiltered top-n shortlist
    * and filters it (cost ∝ n, but the shortlist may not contain 5
    * survivors of a selective predicate — the recall hole). For a ladder
    * of selectivities (vec_id mod {2, 10, 50}), both strategies run and
    * the audit reports, per filter: selectivity, how often POST came back
    * complete, how often a complete POST agreed EXACTLY with PRE's top-5
    * (it must — both are exact over the same order, the spec pins
    * n_agree == n_post_complete), and the decision a planner would take
    * (expected survivors n·sel ≥ k → post_filter). All three filter
    * ladders ride ONE scored scan (localCheckpoint) and the partial-heap
    * top-k operator with (m, q_id) group keys — filters are keys, not
    * passes.
    */
  def s39_filter_strategy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val filters = broadcast(Seq(2L, 10L, 50L).toDF("m"))
    val scored = Tables.embeddings(s, d)
      .join(broadcast(queriesSide(s, d)), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine_similarity(col("q_emb"), col("embedding")).as("sim"))
      .localCheckpoint()
    val pre = TopKPerGroup.topK(
      scored.crossJoin(filters).where(pmod(col("vec_id"), col("m")) === 0),
      Seq("m", "q_id"), Seq(Ord("sim", desc = true), Ord("vec_id")), K)
      .groupBy(col("m"), col("q_id"))
      .agg(sort_array(collect_list(col("vec_id"))).as("pre_ids"))
    val short = TopKPerGroup.topK(scored, Seq("q_id"),
      Seq(Ord("sim", desc = true), Ord("vec_id")), 50)
    val wp = Window.partitionBy(col("m"), col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val post = short.crossJoin(filters)
      .where(pmod(col("vec_id"), col("m")) === 0)
      .withColumn("rk", row_number().over(wp))
      .where(col("rk") <= K)
      .groupBy(col("m"), col("q_id"))
      .agg(sort_array(collect_list(col("vec_id"))).as("post_ids"),
        count(lit(1)).as("n_post"))
    val sel = Tables.embeddings(s, d).crossJoin(filters)
      .groupBy(col("m"))
      .agg(sum(when(pmod(col("vec_id"), col("m")) === 0, 1L).otherwise(0L))
        .as("n_match"), count(lit(1)).as("n_total"))
    pre.join(post, Seq("m", "q_id"), "left")
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("n_post") === K, 1L).otherwise(0L)).as("n_post_complete"),
        sum(when(col("n_post") === K && col("post_ids") === col("pre_ids"), 1L)
          .otherwise(0L)).as("n_agree"))
      .join(sel, "m")
      .withColumn("sel_pm", expr("n_match * 1000 div n_total"))
      .withColumn("decision",
        when(col("sel_pm") * 50 >= lit(1000L) * K, "post_filter")
          .otherwise("pre_filter"))
      .select(col("m"), col("n_queries"), col("n_post_complete"),
        col("n_agree"), col("sel_pm"), col("decision"))
  }

  /** s40: RETRIEVAL-CASCADE sweep — the two-stage tuning every RAG stack
    * does: a cheap bi-encoder (cosine) shortlist of depth n feeds the
    * expensive late-interaction reranker (s19's MaxSim), and the table
    * reports, per shortlist depth n ∈ {10, 20, 50}, the cascade's
    * recall@5 against EXACT MaxSim truth and the rerank cost it paid
    * (n per query) — the quality-per-FLOP frontier that decides n in
    * production. One cosine scan builds the deepest shortlist once; all
    * sweep points slice it by rank (depths are keys, not passes); MaxSim
    * runs once over the 50-deep shortlist and the per-depth top-5 goes
    * through the partial heaps.
    */
  def s40_cascade_sweep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    val short = scoredShortlist(s, d, (a, b) => cosine_similarity(a, b), 50)
      .withColumn("crk", row_number().over(wq).cast("long"))
      .select(col("q_id"), col("vec_id"), col("crk"))
    val reranked = short
      .join(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        "vec_id")
      .join(broadcast(queriesSide(s, d)), "q_id")
      .select(col("q_id"), col("vec_id"), col("crk"),
        graft.functions.VectorFunctions.maxsim_score(
          col("q_emb"), col("embedding"), 8).as("msim"))
      .localCheckpoint()
    val truth = s19_late_interaction(s, d)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    Seq(10, 20, 50).map { n =>
      TopKPerGroup.topK(
        reranked.where(col("crk") <= n)
          .select(col("q_id"), col("vec_id"), col("msim").as("sim")),
        Seq("q_id"), Seq(Ord("sim", desc = true), Ord("vec_id")), K)
        .join(truth, Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_results"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(lit(n.toLong).as("shortlist_n"),
          expr("n_hits * 1000 div n_results").as("recall_pm"),
          lit(n.toLong * NQueries).as("n_reranked"))
    }.reduce(_ unionByName _)
  }

  val queries: Map[String, Q] = Map(
    "s40_cascade_sweep" -> (s40_cascade_sweep _),
    "s39_filter_strategy" -> (s39_filter_strategy _),
    "s38_ranking_metrics" -> (s38_ranking_metrics _),
    "s37_tombstoned_search" -> (s37_tombstoned_search _),
    "s36_bitext_margin" -> (s36_bitext_margin _),
    "s32_knn_graph" -> (s32_knn_graph _),
    "s42_persisted_knn_graph" -> (s42_persisted_knn_graph _),
    "s33_hard_negatives" -> (s33_hard_negatives _),
    "s31_compression_frontier" -> (s31_compression_frontier _),
    "s30_index_compaction" -> (s30_index_compaction _),
    "s29_centroid_drift" -> (s29_centroid_drift _),
    "s26_mips_augmented" -> (s26_mips_augmented _),
    "s24_binary_quant" -> (s24_binary_quant _),
    "s27_persisted_signatures" -> (s27_persisted_signatures _),
    "s23_radius_search" -> (s23_radius_search _),
    "s22_jl_projection" -> (s22_jl_projection _),
    "s19_late_interaction" -> (s19_late_interaction _),
    "s20_multiprobe_lsh" -> (s20_multiprobe_lsh _),
    "s18_incremental_append" -> (s18_incremental_append _),
    "s16_mmr_rerank" -> (s16_mmr_rerank _),
    "s17_persisted_ivfpq" -> (s17_persisted_ivfpq _),
    "s15_truncated_rerank" -> (s15_truncated_rerank _),
    "s14_rrf_fusion" -> (s14_rrf_fusion _),
    "s13_filtered_knn" -> (s13_filtered_knn _),
    "s06_ivf_kmeans" -> (s06_ivf_kmeans _),
    "s07_quantized_cosine" -> (s07_quantized_cosine _),
    "s08_ivf_nprobe" -> (s08_ivf_nprobe _),
    "s09_pq_ann" -> (s09_pq_ann _),
    "s10_ivf_pq" -> (s10_ivf_pq _),
    "s12_ivf_pq_rerank" -> (s12_ivf_pq_rerank _),
    "s11_graph_ann" -> (s11_graph_ann _),
    "s01_knn_bruteforce" -> (s01_knn_bruteforce _),
    "s41_filtered_knn" -> (s41_filtered_knn _),
    "s02_ann_lsh" -> (s02_ann_lsh _),
    "s03_dot_topk" -> (s03_dot_topk _),
    "s04_ivf_ann" -> (s04_ivf_ann _),
    "s05_zipwith_cosine" -> (s05_zipwith_cosine _),
    "s21_knn_classify" -> (s21_knn_classify _),
    "s28_recall_sweep" -> (s28_recall_sweep _),
    "s34_auto_nprobe" -> (s34_auto_nprobe _),
    "s35_embedding_audit" -> (s35_embedding_audit _),
  )

  /** s21: k-NN label CLASSIFICATION — the label-transfer use of the
    * retrieval stack (weak labeling over an embedding space; t18's
    * naive-Bayes sibling on the vector side): a 10% held-out split is
    * classified by majority vote over its 5 nearest train-split
    * neighbors by cosine. Scoring is s01's shape exactly (one corpus
    * scan against the broadcast query side, per-query top-k through the
    * partial heaps); the vote is a |queries| x k aggregate + argmax
    * (ties -> smallest label). Votes are integers and the neighbor sets
    * deterministic (sim desc, vec_id tie-break), so the predictions
    * themselves hash-check cross-engine.
    */
  def s21_knn_classify(s: SparkSession, d: String): DataFrame =
    knnClassify(Tables.embeddings(s, d))

  /** The shared ±1 JL sign matrix — one array backs the native kernel, the
    * QueriesSpec Gram bound, and the DuckDB oracle literal (see
    * [[graft.functions.JlFunctions.signs]] for the construction story).
    */
  private[graft] def jlSigns: Array[Long] = graft.functions.JlFunctions.signs

  /** s22: Johnson–Lindenstrauss random-projection search — the
    * dimensionality-reduction path billion-vector systems lean on
    * (Achlioptas'01 ±1 projections): 64-d float vectors collapse to 32
    * integer coordinates, a 50-candidate shortlist forms on L2² in the
    * PROJECTED space (half the bytes per vector through the kernel and
    * the shuffle), and exact cosine re-ranks only the shortlist — the
    * JL-shortlist/exact-rerank split that s15 applies to score
    * truncation. The projection pipeline is exact integer arithmetic —
    * floats quantize to thousandths via floor() BEFORE projecting, the
    * sign matrix is the shared [[jlSigns]] array — so the whole
    * approximate method hash-checks against DuckDB replicating identical
    * integers (the s07 trick applied to projections), with the re-rank
    * reusing s01's bit-identical cosine formulation. Both kernels are
    * native codegen Expressions ([[graft.functions.JlProject]] /
    * [[graft.functions.SqDistLong]]) — the HOF spelling of the same
    * arithmetic ran interpreted at 19 s per sf0.1 scan; FunctionsSpec
    * keeps it as the equivalence oracle. At 100 TB the projection happens
    * once in the corpus scan (no shuffle, fused quantize+multiply),
    * queries broadcast, the shortlist rides the partial-heap
    * exchange with 32-long rows, and the re-rank touches 50 raw vectors
    * per query instead of the corpus. QueriesSpec pins recall@5 vs exact
    * s01 ≥ 0.4 — measured 0.58, the SAME as an ideal Gaussian projection
    * at this width (the data's margin, not the sign trick, is the
    * binding constraint).
    */
  def s22_jl_projection(s: SparkSession, d: String): DataFrame = {
    import graft.functions.JlFunctions.{jl_project, sq_dist_long}
    def projected(df: DataFrame, idCol: String, out: String): DataFrame =
      df.select(col("vec_id").as(idCol), jl_project(col("embedding")).as(out))
    val corpus = projected(Tables.embeddings(s, d), "vec_id", "c_proj")
    val queries = projected(
      Tables.embeddings(s, d).filter(col("vec_id") < NQueries), "q_id", "q_proj")
    val shortlist = TopKPerGroup.topK(
      corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          sq_dist_long(col("q_proj"), col("c_proj")).as("pdist")),
      Seq("q_id"), Seq(Ord("pdist"), Ord("vec_id")), 50)
    perQueryTopK(
      shortlist.select(col("q_id"), col("vec_id"))
        .join(Tables.embeddings(s, d), "vec_id")
        .join(broadcast(queriesSide(s, d)), "q_id")
        .select(col("q_id"), col("vec_id"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")))
  }

  /** The split+vote pipeline over any (vec_id, embedding, label) frame —
    * QueriesSpec drives it with planted separable clusters where the
    * majority vote must recover the cluster label (the fixture's labels
    * are embedding-independent, so s21 on it scores at chance BY DESIGN
    * and pins arithmetic, not fixture luck).
    */
  private[graft] def knnClassify(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val test = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("true_label"))
    val train = e.filter(col("vec_id") % 10 =!= 0)
    val top = TopKPerGroup.topK(
      train.crossJoin(broadcast(test))
        .select(col("q_id"), col("true_label"), col("vec_id"), col("label"),
          cosine_similarity(col("q_emb"), col("embedding")).as("sim")),
      Seq("q_id"), Seq(Ord("sim", desc = true), Ord("vec_id")), K)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("label"))
    top.groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("q_id").as("vec_id"), col("true_label"),
        col("label").as("pred_label"), col("n_votes"))
  }

  /** The manual DuckDB double formulations below are bit-identical to the
    * codegen'd sequential-double kernel (verified, see VectorFunctions
    * scaladoc); even the LCG-hashed family (s02/s20) is hash-checked, via
    * [[duckBucket]]'s embedded plane literals. The oracles rank with a
    * row_number window (fine at oracle scale); the Spark side uses
    * TopKPerGroup — same top-k set, same (sim desc, vec_id) order
    * contract, no rank column in either output.
    */
  /** DuckDB cosine fold over two DOUBLE[] expressions — the exact
    * sequential-double twin of the native kernel (see s01's oracle).
    */
  /** s35: EMBEDDING-QUALITY audit — the vector-QA gate that runs before
    * any index build or similarity job trusts a new embedding drop: per
    * label cell, vector counts, dimension consistency (a mixed-dim cell
    * breaks every kernel downstream), zero vectors (a dead encoder
    * output — cosine against it is undefined), NaN payloads, and the
    * norm profile (min/mean/max — un-normalized mixtures silently skew
    * dot-product rankings). Norms fold per-row in list order (the same
    * sequential fold both engines spell — duckCosine's discipline) and
    * round at 6dp before the decimal-summed mean, so the whole QA table
    * hash-checks. One scan, |labels| output rows.
    */
  def s35_embedding_audit(s: SparkSession, d: String): DataFrame =
    embeddingAuditFrom(Tables.embeddings(s, d))

  /** s35 over any (label, embedding) frame — the fixture is clean (unit
    * norms, one dim, no NaN/zero), so the spec plants each defect class.
    */
  private[graft] def embeddingAuditFrom(embeddings: DataFrame): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    embeddings
      .withColumn("dim", size(col("embedding")).cast("long"))
      .withColumn("norm2", expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .withColumn("n_nan",
        expr("size(filter(embedding, x -> isnan(x)))").cast("long"))
      .withColumn("norm", round(sqrt(col("norm2")), 6))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("dim")).as("dims_seen"),
        sum(when(col("norm2") === 0d, 1L).otherwise(0L)).as("n_zero"),
        sum(col("n_nan")).as("n_nan_values"),
        min(col("norm")).as("min_norm"),
        round(sum(col("norm").cast(dec6)).cast("double") / count(lit(1)), 6)
          .as("mean_norm"),
        max(col("norm")).as("max_norm"))
  }

  /** DuckDB twin of [[graft.functions.VectorFunctions.maxsim_score]] with
    * 8 chunks of 8 dims (shared by s19's oracle and s40's cascade).
    */
  private def duckMaxsim(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(0,7), i ->
       |           list_max(list_transform(generate_series(0,7), j ->
       |             list_sum(list_transform(
       |               list_zip(($a)[i*8+1:i*8+8],
       |                        ($b)[j*8+1:j*8+8]),
       |               x -> x[1]*x[2]))))))""".stripMargin

  private[operators] def duckCosine(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))
       |  / (sqrt(list_sum(list_transform($a, v -> v*v)))
       |     * sqrt(list_sum(list_transform($b, v -> v*v))))""".stripMargin

  /** The LCG hyperplanes' VALUES embedded as DuckDB list literals — the
    * planes are deterministic JVM constants (fixed-seed LCG, [[planes]]),
    * so the oracle carries the +-1 vectors verbatim while Spark derives
    * them; both engines then fold dot(emb, plane_j) over the identical
    * double sequence (s01's proven arithmetic parity) and the 4-bit
    * bucket is bit-equal. This is s24's signature-rebuild recipe applied
    * to the hashed family — it moves s02/s20 from rows-only to
    * hash-green.
    */
  private[operators] def duckBucket(emb: String): String =
    planes().zipWithIndex.map { case (p, j) =>
      val lit = p.map(v => if (v > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]::DOUBLE[]")
      s"""(CASE WHEN list_sum(list_transform(list_zip($emb, $lit),
         |        x -> x[1] * x[2])) > 0 THEN ${1 << j} ELSE 0 END)""".stripMargin
    }.mkString("\n + ")

  /** Sign-LSH oracle shared by s02 (probes = own bucket only) and s20
    * (multiprobe: own bucket + the four 1-bit flips).
    */
  private def signLshOracle(probeFlips: Seq[Int]): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sig AS (SELECT vec_id, emb, ${duckBucket("emb")} AS bucket FROM e),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket AS q_bucket
       |      FROM sig WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT q_id, q_emb, xor(q_bucket, f) AS probe
       |  FROM q, (SELECT unnest([${probeFlips.mkString(", ")}]) AS f) flips),
       |cand AS (
       |  SELECT p.q_id, c.vec_id, ${duckCosine("p.q_emb", "c.emb")} AS sim
       |  FROM probes p JOIN sig c ON c.bucket = p.probe AND c.vec_id <> p.q_id)
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM cand) t
       |WHERE rk <= $K""".stripMargin

  /** IVF oracle, parameterized by nprobe: quantized-mean centroids per
    * cell (integer sums — order-independent, matching quantizedMeanCells
    * exactly), route each query to its nprobe best cells, search only
    * those cells, top-5 per query.
    */
  /** s01's exact brute-force top-5 — factored out so s38 can reuse it as
    * the ranking-metrics ground truth.
    */
  private lazy val bruteforceOracle: String =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         list_sum(list_transform(list_zip(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(q.q_emb::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
        |WHERE rk <= 5""".stripMargin

  private def ivfOracle(nprobe: Int): String =
    s"""WITH ex AS (
       |  SELECT label AS cell, generate_subscripts(embedding, 1) AS pos,
       |         CAST(round(unnest(embedding::DOUBLE[]) * 1000000) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS (
       |  SELECT cell, list(sd ORDER BY pos) AS centroid FROM (
       |    SELECT cell, pos,
       |           CAST(sum(qv) AS DOUBLE) / CAST(1000000 * count(*) AS DOUBLE) AS sd
       |    FROM ex GROUP BY cell, pos) GROUP BY cell),
       |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
       |      FROM embeddings WHERE vec_id < 10),
       |r AS (
       |  SELECT q_id, q_emb, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |                ORDER BY c_sim DESC, cell) AS rk
       |    FROM (
       |      SELECT q.q_id, q.q_emb, c.cell,
       |             ${duckCosine("q.q_emb", "c.centroid")} AS c_sim
       |      FROM q CROSS JOIN cent c) s0) s1
       |  WHERE rk <= $nprobe),
       |p AS (
       |  SELECT r.q_id, e.vec_id,
       |         ${duckCosine("r.q_emb", "e.embedding::DOUBLE[]")} AS sim
       |  FROM r JOIN embeddings e ON e.label = r.cell AND e.vec_id <> r.q_id)
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
       |WHERE rk <= 5""".stripMargin

  // -------------------------------------------------------------------
  // Round-8 oracles for the TRAINED quantizer family: the DuckDB twins
  // REBUILD the integer Lloyd training inline (unrolled iterations of
  // exact int64 arithmetic — assignment by squared-L2 argmin, update by
  // integer sum + truncating division), so the hash gate re-proves the
  // whole train → encode → route → score pipeline every round. This is
  // what moved s06/s09/s10/s12/s17/s18/s30/s11 from rows-only to green.
  // -------------------------------------------------------------------

  /** Shared first CTE: embeddings with both the double view and the 1e-6
    * fixed-point integer view (KMeans.quantize's DuckDB twin).
    */
  private val qeCte: String =
    """qe AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
      |         list_transform(embedding::DOUBLE[],
      |           x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
      |  FROM embeddings)""".stripMargin

  /** Exact int64 squared-L2 between two BIGINT lists — KMeans.nearestQIdx's
    * distance, order-independent by construction.
    */
  private def duckD2(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> (x[1] - x[2]) * (x[1] - x[2])))"

  /** One unrolled Lloyd iteration: assign by (d2, cluster) rank-1, update
    * by per-(cluster, dim) integer sum + truncating `//` (the JVM `/`
    * twin), empty clusters keep the previous centroid.
    */
  private def lloydIter(i: Int): String =
    s"""d$i AS (
       |  SELECT v.vec_id, v.qv, c.cluster,
       |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |           ${duckD2("v.qv", "c.qc")}, c.cluster) AS rk
       |  FROM qe v CROSS JOIN c$i c),
       |a$i AS (SELECT vec_id, qv, cluster FROM d$i WHERE rk = 1),
       |u$i AS (
       |  SELECT cluster, pos, CAST(sum(qvi) AS BIGINT) AS s2,
       |         CAST(count(*) AS BIGINT) AS nn
       |  FROM (SELECT cluster, generate_subscripts(qv, 1) AS pos,
       |               unnest(qv) AS qvi FROM a$i) z
       |  GROUP BY 1, 2),
       |m$i AS (SELECT cluster, list(s2 // nn ORDER BY pos) AS qc
       |        FROM u$i GROUP BY 1),
       |c${i + 1} AS (SELECT c.cluster, coalesce(m.qc, c.qc) AS qc
       |              FROM c$i c LEFT JOIN m$i m USING (cluster))""".stripMargin

  /** s06's twin: 3 unrolled integer Lloyd iterations (k=8, smallest-id
    * seeds), final assignment, in-cell exact cosine top-5.
    */
  private lazy val ivfKmeansOracle: String = {
    val iters = (0 until 3).map(lloydIter).mkString(",\n")
    s"""WITH $qeCte,
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
       |           AS cluster,
       |         qv AS qc
       |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 8) seeds),
       |$iters,
       |fa AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT v.vec_id, c.cluster,
       |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |             ${duckD2("v.qv", "c.qc")}, c.cluster) AS rk
       |    FROM qe v CROSS JOIN c3 c) z
       |  WHERE rk = 1),
       |p AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
       |         ${duckCosine("ae.emb", "be.emb")} AS sim
       |  FROM fa a
       |  JOIN fa b ON b.cluster = a.cluster AND b.vec_id <> a.vec_id
       |  JOIN qe ae ON ae.vec_id = a.vec_id
       |  JOIN qe be ON be.vec_id = b.vec_id
       |  WHERE a.vec_id < $NQueries)
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
       |WHERE rk <= $K""".stripMargin
  }

  /** PQ training + encode + ADC-table CTEs, shared by s09/s10/s12/s17 and
    * (with the base-corpus filter) s18/s30. One integer Lloyd iteration
    * per subspace from the 16 smallest-id seeds of the quarter sample —
    * the exact twin of [[trainCodebooks]]; `enc` encodes the FULL corpus
    * with the trained books (base and delta encode identically since the
    * codebooks are shared); `adc` is the per-(query, subspace, code)
    * cosine table over dequantized integer codewords.
    */
  private def pqCtes(trainFilter: String): String = {
    def sub(of: String) = s"$of[b.m*$PqDsub+1 : b.m*$PqDsub+$PqDsub]"
    s"""tr AS (SELECT vec_id, qv FROM qe WHERE $trainFilter),
       |sdq AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
       |           AS sid, qv
       |  FROM (SELECT vec_id, qv FROM tr ORDER BY vec_id LIMIT $PqK) z),
       |mm AS (SELECT CAST(unnest(range(0, $PqM)) AS BIGINT) AS m),
       |bk0 AS (
       |  SELECT mm.m, sdq.sid AS cluster,
       |         sdq.qv[mm.m*$PqDsub+1 : mm.m*$PqDsub+$PqDsub] AS qc
       |  FROM sdq CROSS JOIN mm),
       |asg AS (
       |  SELECT m, cluster, sub FROM (
       |    SELECT t.vec_id, b.m, b.cluster, ${sub("t.qv")} AS sub,
       |           row_number() OVER (PARTITION BY t.vec_id, b.m ORDER BY
       |             ${duckD2(sub("t.qv"), "b.qc")}, b.cluster) AS rk
       |    FROM tr t CROSS JOIN bk0 b) z
       |  WHERE rk = 1),
       |upd AS (
       |  SELECT m, cluster, pos, CAST(sum(sv) AS BIGINT) AS s2,
       |         CAST(count(*) AS BIGINT) AS nn
       |  FROM (SELECT m, cluster, generate_subscripts(sub, 1) AS pos,
       |               unnest(sub) AS sv FROM asg) z
       |  GROUP BY 1, 2, 3),
       |updl AS (SELECT m, cluster, list(s2 // nn ORDER BY pos) AS qc
       |         FROM upd GROUP BY 1, 2),
       |bk AS (SELECT b.m, b.cluster, coalesce(u.qc, b.qc) AS qc
       |       FROM bk0 b LEFT JOIN updl u
       |         ON u.m = b.m AND u.cluster = b.cluster),
       |enc AS (
       |  SELECT vec_id, label, m, cluster AS code FROM (
       |    SELECT v.vec_id, v.label, b.m, b.cluster,
       |           row_number() OVER (PARTITION BY v.vec_id, b.m ORDER BY
       |             ${duckD2(sub("v.qv"), "b.qc")}, b.cluster) AS rk
       |    FROM qe v CROSS JOIN bk b) z
       |  WHERE rk = 1),
       |qq AS (SELECT vec_id AS q_id, emb AS q_emb FROM qe
       |       WHERE vec_id < $NQueries),
       |adc AS (
       |  SELECT qq.q_id, b.m, b.cluster AS code,
       |         ${duckCosine(s"qq.q_emb[b.m*$PqDsub+1 : b.m*$PqDsub+$PqDsub]",
                   "list_transform(b.qc, v -> CAST(v AS DOUBLE) / 1000000)")}
       |           AS t
       |  FROM qq CROSS JOIN bk b)""".stripMargin
  }

  /** nprobe=2 routing over quantized-mean cells of `baseWhere`-filtered
    * corpus + ADC scoring of the routed cells — the s10 shape; `sim` is
    * the per-candidate 8-lookup sum folded in subspace order (list ORDER
    * BY m — the exact twin of adcScore's sequential aggregate).
    */
  private def pqRoutedSimCtes(baseWhere: String): String =
    s"""cent AS (
       |  SELECT cell, list(sd ORDER BY pos) AS centroid FROM (
       |    SELECT cell, pos,
       |           CAST(sum(cqv) AS DOUBLE) / CAST(1000000 * count(*) AS DOUBLE) AS sd
       |    FROM (SELECT label AS cell, generate_subscripts(qv, 1) AS pos,
       |                 unnest(qv) AS cqv FROM qe $baseWhere) gx
       |    GROUP BY 1, 2) gy
       |  GROUP BY cell),
       |rt AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY c_sim DESC, cell) AS rk
       |    FROM (SELECT qq.q_id, c.cell,
       |                 ${duckCosine("qq.q_emb", "c.centroid")} AS c_sim
       |          FROM qq CROSS JOIN cent c) s0) s1
       |  WHERE rk <= 2),
       |sc AS (
       |  SELECT r.q_id, en.vec_id, en.m, ad.t
       |  FROM rt r
       |  JOIN enc en ON en.label = r.cell AND en.vec_id <> r.q_id
       |  JOIN adc ad ON ad.q_id = r.q_id AND ad.m = en.m
       |             AND ad.code = en.code),
       |sim AS (SELECT q_id, vec_id, list_sum(list(t ORDER BY m)) AS sim
       |        FROM sc GROUP BY 1, 2)""".stripMargin

  /** s09's twin: unrouted ADC over every candidate. */
  private lazy val pqAnnOracle: String =
    s"""WITH $qeCte,
       |${pqCtes("vec_id % 4 = 0")},
       |sc AS (
       |  SELECT ad.q_id, en.vec_id, en.m, ad.t
       |  FROM enc en JOIN adc ad ON ad.m = en.m AND ad.code = en.code
       |  WHERE en.vec_id <> ad.q_id),
       |sim AS (SELECT q_id, vec_id, list_sum(list(t ORDER BY m)) AS sim
       |        FROM sc GROUP BY 1, 2)
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM sim) t
       |WHERE rk <= $K""".stripMargin

  /** s10's twin (== s17's: the persisted index is a lossless parquet
    * round-trip of integers and exact doubles, and QueriesSpec pins
    * s17 == s10 row-for-row).
    */
  private lazy val ivfPqOracle: String =
    s"""WITH $qeCte,
       |${pqCtes("vec_id % 4 = 0")},
       |${pqRoutedSimCtes("")}
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM sim) t
       |WHERE rk <= $K""".stripMargin

  /** s12's twin: ADC top-50 shortlist, exact-cosine re-rank, top-5. */
  private lazy val ivfPqRerankOracle: String =
    s"""WITH $qeCte,
       |${pqCtes("vec_id % 4 = 0")},
       |${pqRoutedSimCtes("")},
       |short AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |                ORDER BY sim DESC, vec_id) AS rk FROM sim) z
       |  WHERE rk <= $RerankR),
       |rr AS (
       |  SELECT sh.q_id, sh.vec_id,
       |         ${duckCosine("qx.q_emb", "ev.emb")} AS sim
       |  FROM short sh
       |  JOIN qe ev ON ev.vec_id = sh.vec_id
       |  JOIN qq qx ON qx.q_id = sh.q_id)
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM rr) t
       |WHERE rk <= $K""".stripMargin

  /** s18's twin (== s30's: compaction moves rows, never re-encodes):
    * train + route on the BASE corpus only (vec_id % 17 <> 0), encode
    * base ∪ delta with the shared books — which is exactly the full
    * corpus, so `enc` over qe is the base-plus-delta codes union.
    */
  private lazy val incAppendOracle: String =
    s"""WITH $qeCte,
       |${pqCtes("vec_id % 4 = 0 AND vec_id % 17 <> 0")},
       |${pqRoutedSimCtes("WHERE vec_id % 17 <> 0")}
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM sim) t
       |WHERE rk <= $K""".stripMargin

  /** s11's twin: LCG planes embedded as literals (duckBucket — the
    * s02/s20 recipe), kNN-graph top-3 per src in-bucket, seed ∪ one-hop
    * expansion, exact re-rank.
    */
  private lazy val graphAnnOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sig AS (SELECT vec_id, emb, ${duckBucket("emb")} AS bucket FROM e),
       |pairs AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |         ${duckCosine("a.emb", "b.emb")} AS gsim
       |  FROM sig a JOIN sig b
       |    ON b.bucket = a.bucket AND b.vec_id <> a.vec_id),
       |edges AS (
       |  SELECT src, dst FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src
       |                ORDER BY gsim DESC, dst) AS rk FROM pairs) z
       |  WHERE rk <= 3),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket AS q_bucket
       |      FROM sig WHERE vec_id < $NQueries),
       |seeds AS (SELECT q.q_id, s.vec_id
       |          FROM q JOIN sig s ON s.bucket = q.q_bucket),
       |expanded AS (SELECT sd.q_id, ed.dst AS vec_id
       |             FROM seeds sd JOIN edges ed ON ed.src = sd.vec_id),
       |cand AS (
       |  SELECT DISTINCT q_id, vec_id FROM (
       |    SELECT * FROM seeds UNION ALL SELECT * FROM expanded) u
       |  WHERE vec_id <> q_id),
       |p AS (
       |  SELECT c.q_id, c.vec_id,
       |         ${duckCosine("qx.q_emb", "ee.emb")} AS sim
       |  FROM cand c
       |  JOIN e ee ON ee.vec_id = c.vec_id
       |  JOIN q qx ON qx.q_id = c.q_id)
       |SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
       |WHERE rk <= $K""".stripMargin

  /** s16's oracle unrolls the 5 greedy MMR steps as chained CTEs (the g01
    * unrolling pattern): selN picks step N's winner, allN accumulates the
    * selected set feeding step N+1's max-redundancy term.
    */
  private def mmrOracle: String = {
    val head =
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 10),
         |sc AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${duckCosine("q.q_emb::DOUBLE[]", "e.embedding::DOUBLE[]")} AS simq
         |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
         |short AS (SELECT q_id, vec_id, simq FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY simq DESC, vec_id) AS rk FROM sc) t WHERE rk <= 20),
         |ps AS (
         |  SELECT a.q_id, a.vec_id AS va, b.vec_id AS vb,
         |         ${duckCosine("ea.embedding::DOUBLE[]", "eb.embedding::DOUBLE[]")} AS s
         |  FROM short a JOIN short b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
         |sel1 AS (SELECT q_id, vec_id, simq AS score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY simq DESC, vec_id) AS rk FROM short) t WHERE rk = 1),
         |all1 AS (SELECT q_id, vec_id FROM sel1)""".stripMargin
    val steps = (2 to 5).map { k =>
      s"""cand$k AS (
         |  SELECT sh.q_id, sh.vec_id,
         |         CAST(0.7 AS DOUBLE) * sh.simq - CAST(0.3 AS DOUBLE) * m.mx AS score
         |  FROM short sh
         |  JOIN (SELECT p.q_id, p.va, max(p.s) AS mx
         |        FROM ps p JOIN all${k - 1} s ON s.q_id = p.q_id AND s.vec_id = p.vb
         |        GROUP BY 1, 2) m ON m.q_id = sh.q_id AND m.va = sh.vec_id
         |  LEFT JOIN all${k - 1} x ON x.q_id = sh.q_id AND x.vec_id = sh.vec_id
         |  WHERE x.vec_id IS NULL),
         |sel$k AS (SELECT q_id, vec_id, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY score DESC, vec_id) AS rk FROM cand$k) t WHERE rk = 1),
         |all$k AS (SELECT * FROM all${k - 1}
         |          UNION ALL SELECT q_id, vec_id FROM sel$k)""".stripMargin
    }.mkString(",\n")
    val tail = (1 to 5).map(k =>
      s"SELECT q_id, CAST($k AS BIGINT) AS rank, vec_id, score FROM sel$k")
      .mkString("\nUNION ALL ")
    s"$head,\n$steps\n$tail"
  }

  /** s28's sweep pipeline as shared oracle CTE text through `sweepagg`
    * (the measured recall table) — s28 publishes it, s34 picks its
    * operating point from it.
    */
  private lazy val ivfSweepOracleCtes: String =
    s"""WITH ex AS (
       |  SELECT label AS cell, generate_subscripts(embedding, 1) AS pos,
       |         CAST(round(unnest(embedding::DOUBLE[]) * 1000000) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS (
       |  SELECT cell, list(sd ORDER BY pos) AS centroid FROM (
       |    SELECT cell, pos,
       |           CAST(sum(qv) AS DOUBLE) / CAST(1000000 * count(*) AS DOUBLE) AS sd
       |    FROM ex GROUP BY cell, pos) GROUP BY cell),
       |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
       |      FROM embeddings WHERE vec_id < 10),
       |r AS (
       |  SELECT q_id, q_emb, cell, rk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |                ORDER BY c_sim DESC, cell) AS rk
       |    FROM (
       |      SELECT q.q_id, q.q_emb, c.cell,
       |             ${duckCosine("q.q_emb", "c.centroid")} AS c_sim
       |      FROM q CROSS JOIN cent c) s0) s1
       |  WHERE rk <= 4),
       |np AS (SELECT unnest([1, 2, 3, 4]) AS nprobe),
       |pr AS (SELECT np.nprobe, r.q_id, r.q_emb, r.cell
       |       FROM r CROSS JOIN np WHERE r.rk <= np.nprobe),
       |p AS (
       |  SELECT pr.nprobe, pr.q_id, e.vec_id,
       |         ${duckCosine("pr.q_emb", "e.embedding::DOUBLE[]")} AS sim
       |  FROM pr JOIN embeddings e ON e.label = pr.cell AND e.vec_id <> pr.q_id),
       |t5 AS (
       |  SELECT nprobe, q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY nprobe, q_id
       |                ORDER BY sim DESC, vec_id) AS rk FROM p) t
       |  WHERE rk <= 5),
       |ep AS (
       |  SELECT q.q_id, e.vec_id,
       |         ${duckCosine("q.q_emb", "e.embedding::DOUBLE[]")} AS sim
       |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |                ORDER BY sim DESC, vec_id) AS rk FROM ep) t
       |  WHERE rk <= 5)
       |,sweepagg AS (
       |  SELECT CAST(t5.nprobe AS BIGINT) AS nprobe,
       |         count(*) AS n_shortlist,
       |         CAST(sum(CASE WHEN exact.q_id IS NOT NULL THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_hits,
       |         (CAST(sum(CASE WHEN exact.q_id IS NOT NULL THEN 1 ELSE 0 END)
       |               AS BIGINT) * 1000) // 50 AS recall_pm
       |  FROM t5 LEFT JOIN exact
       |    ON exact.q_id = t5.q_id AND exact.vec_id = t5.vec_id
       |  GROUP BY t5.nprobe
       |)""".stripMargin

  private val baseOracles: Map[String, String] = Map(
    "s36_bitext_margin" ->
      """WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |qz AS (
        |  SELECT vec_id, label,
        |         list_transform(v, x -> CAST(round(x * (127.0 /
        |           list_max(list_transform(v, y -> abs(y))))) AS BIGINT)) AS qv
        |  FROM emb),
        |a AS (SELECT vec_id AS q_id, qv AS q_qv FROM qz
        |      WHERE label % 2 = 0 AND vec_id < 400),
        |b AS (SELECT vec_id, qv FROM qz WHERE label % 2 = 1),
        |cand AS (
        |  SELECT a.q_id, b.vec_id,
        |         CAST(floor(1000.0 * CAST(list_sum(list_transform(
        |                 list_zip(a.q_qv, b.qv), x -> x[1] * x[2])) AS DOUBLE)
        |           / (sqrt(CAST(list_sum(list_transform(a.q_qv, v -> v * v)) AS DOUBLE))
        |              * sqrt(CAST(list_sum(list_transform(b.qv, v -> v * v)) AS DOUBLE))))
        |           AS BIGINT) AS sim_pm
        |  FROM a CROSS JOIN b),
        |fwd AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |             ORDER BY sim_pm DESC, vec_id) AS rk FROM cand) t
        |  WHERE rk <= 4),
        |fa AS (SELECT q_id, sum(sim_pm) AS fwd_sum FROM fwd GROUP BY 1),
        |f1 AS (SELECT q_id, vec_id AS match_id, sim_pm AS top_sim
        |       FROM fwd WHERE rk = 1),
        |bw AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY sim_pm DESC, q_id) AS rk
        |  FROM cand WHERE vec_id IN (SELECT match_id FROM f1)) t
        |  WHERE rk <= 4),
        |ba AS (SELECT vec_id AS b_id, sum(sim_pm) AS bwd_sum FROM bw GROUP BY 1),
        |b1 AS (SELECT vec_id AS b_id, q_id AS b_top_q FROM bw WHERE rk = 1)
        |SELECT f1.q_id, f1.match_id, f1.top_sim AS sim_pm,
        |       CAST((8000 * f1.top_sim) // (fa.fwd_sum + ba.bwd_sum) AS BIGINT) AS margin_pm,
        |       CAST(CASE WHEN b1.b_top_q = f1.q_id THEN 1 ELSE 0 END AS BIGINT) AS mutual
        |FROM f1
        |JOIN fa USING (q_id)
        |JOIN ba ON ba.b_id = f1.match_id
        |JOIN b1 ON b1.b_id = f1.match_id
        |WHERE f1.top_sim > 0 AND fa.fwd_sum + ba.bwd_sum > 0""".stripMargin,
    "s35_embedding_audit" ->
      """WITH e AS (
        |  SELECT label, len(embedding) AS dim,
        |         list_sum(list_transform(embedding::DOUBLE[], x -> x * x))
        |           AS norm2,
        |         len(list_filter(embedding::DOUBLE[], x -> isnan(x)))
        |           AS n_nan
        |  FROM embeddings),
        |n AS (SELECT label, dim, norm2, n_nan,
        |             round(sqrt(norm2), 6) AS norm FROM e)
        |SELECT label, count(*) AS n_vecs,
        |       count(DISTINCT dim) AS dims_seen,
        |       CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_zero,
        |       CAST(sum(n_nan) AS BIGINT) AS n_nan_values,
        |       min(norm) AS min_norm,
        |       round(CAST(sum(CAST(norm AS DECIMAL(18,6))) AS DOUBLE)
        |             / count(*), 6) AS mean_norm,
        |       max(norm) AS max_norm
        |FROM n GROUP BY 1""".stripMargin,
    "s29_centroid_drift" ->
      s"""WITH ex AS (
         |  SELECT label, generate_subscripts(embedding, 1) AS pos,
         |         CAST(round(unnest(embedding::DOUBLE[]) * 1000000) AS BIGINT) AS qv
         |  FROM embeddings),
         |cent AS (
         |  SELECT CAST(label AS BIGINT) AS label, list(sd ORDER BY pos) AS centroid
         |  FROM (
         |    SELECT label, pos,
         |           CAST(sum(qv) AS DOUBLE) / CAST(1000000 * count(*) AS DOUBLE) AS sd
         |    FROM ex GROUP BY label, pos) GROUP BY label),
         |gcent AS (
         |  SELECT list(sd ORDER BY pos) AS g_centroid FROM (
         |    SELECT pos,
         |           CAST(sum(qv) AS DOUBLE) / CAST(1000000 * count(*) AS DOUBLE) AS sd
         |    FROM ex GROUP BY pos) ),
         |n AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs
         |      FROM embeddings GROUP BY label)
         |SELECT c.label, n.n_vecs,
         |       CAST(round((${duckCosine("c.centroid", "g.g_centroid")}) * 1000000)
         |            AS BIGINT) AS cos_micro
         |FROM cent c JOIN n USING (label) CROSS JOIN gcent g""".stripMargin,
    "s23_radius_search" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         list_sum(list_transform(list_zip(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(q.q_emb::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, sim FROM p WHERE sim >= 0.25""".stripMargin,
    "s22_jl_projection" ->
      s"""WITH sgn AS (SELECT ${jlSigns.mkString("[", ", ", "]")} AS s),
        |qq AS (
        |  SELECT e.vec_id, ti.i,
        |         CAST(floor(CAST(e.embedding[CAST(ti.i + 1 AS INT)]
        |                        AS DOUBLE) * 1000.0) AS BIGINT) AS v
        |  FROM embeddings e, range(64) ti(i)),
        |pr AS (
        |  SELECT qq.vec_id, tj.j,
        |         SUM(sgn.s[CAST(qq.i * 32 + tj.j + 1 AS INT)] * qq.v) AS p
        |  FROM qq, range(32) tj(j), sgn
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |         SUM((q.p - c.p) * (q.p - c.p)) AS pdist
        |  FROM pr q JOIN pr c ON q.j = c.j AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10
        |  GROUP BY 1, 2),
        |short AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY pdist, vec_id) AS rn
        |    FROM d) t
        |  WHERE rn <= 50),
        |rr AS (
        |  SELECT sh.q_id, sh.vec_id,
        |         list_sum(list_transform(list_zip(qe.embedding::DOUBLE[],
        |                                          ce.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(qe.embedding::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(ce.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM short sh
        |  JOIN embeddings ce ON ce.vec_id = sh.vec_id
        |  JOIN embeddings qe ON qe.vec_id = sh.q_id)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM rr) t
        |WHERE rk <= 5""".stripMargin,
    "s16_mmr_rerank" -> mmrOracle,
    "s15_truncated_rerank" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 10),
         |short AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT p.*, row_number() OVER (PARTITION BY q_id
         |                ORDER BY sim DESC, vec_id) AS rk
         |    FROM (
         |      SELECT q.q_id, e.vec_id,
         |             ${duckCosine("(q.q_emb::DOUBLE[])[1:16]", "(e.embedding::DOUBLE[])[1:16]")} AS sim
         |      FROM q JOIN embeddings e ON e.vec_id <> q.q_id) p) t
         |  WHERE rk <= 50),
         |rr AS (
         |  SELECT s.q_id, s.vec_id,
         |         ${duckCosine("q.q_emb::DOUBLE[]", "e.embedding::DOUBLE[]")} AS sim
         |  FROM short s
         |  JOIN embeddings e ON e.vec_id = s.vec_id
         |  JOIN q ON q.q_id = s.q_id)
         |SELECT q_id, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |              ORDER BY sim DESC, vec_id) AS rk FROM rr) t
         |WHERE rk <= 5""".stripMargin,
    "s14_rrf_fusion" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 10),
         |sc AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${duckCosine("q.q_emb::DOUBLE[]", "e.embedding::DOUBLE[]")} AS cs,
         |         list_sum(list_transform(list_zip(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]),
         |                                 x -> x[1] * x[2])) AS ds
         |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
         |fa AS (SELECT q_id, vec_id, rank_cos FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |           ORDER BY cs DESC, vec_id) AS rank_cos FROM sc) WHERE rank_cos <= 20),
         |fb AS (SELECT q_id, vec_id, rank_dot FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |           ORDER BY ds DESC, vec_id) AS rank_dot FROM sc) WHERE rank_dot <= 20),
         |fu AS (
         |  SELECT COALESCE(fa.q_id, fb.q_id) AS q_id,
         |         COALESCE(fa.vec_id, fb.vec_id) AS vec_id,
         |         COALESCE(CAST(1 AS DOUBLE) / (60 + fa.rank_cos), 0)
         |           + COALESCE(CAST(1 AS DOUBLE) / (60 + fb.rank_dot), 0) AS rrf
         |  FROM fa FULL JOIN fb ON fa.q_id = fb.q_id AND fa.vec_id = fb.vec_id)
         |SELECT q_id, vec_id, rrf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |              ORDER BY rrf DESC, vec_id) AS rk FROM fu) t
         |WHERE rk <= 5""".stripMargin,
    "s13_filtered_knn" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         list_sum(list_transform(list_zip(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(q.q_emb::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM q JOIN embeddings e
        |    ON e.vec_id <> q.q_id AND e.label IN (2, 5, 7))
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
        |WHERE rk <= 5""".stripMargin,
    "s04_ivf_ann" -> ivfOracle(1),
    "s08_ivf_nprobe" -> ivfOracle(2),
    "s28_recall_sweep" -> (ivfSweepOracleCtes +
      """
        |SELECT nprobe, n_shortlist, n_hits, recall_pm FROM sweepagg"""
        .stripMargin),
    // the identical sweep makes the identical pick — calibration,
    // decision and served shortlist all inside one checked query
    "s34_auto_nprobe" -> (ivfSweepOracleCtes +
      """,
        |pick AS (
        |  SELECT coalesce(min(nprobe) FILTER (WHERE recall_pm >= 900),
        |                  max(nprobe)) AS np
        |  FROM sweepagg)
        |SELECT CAST(t5.nprobe AS BIGINT) AS nprobe, t5.q_id, t5.vec_id
        |FROM t5 JOIN pick ON t5.nprobe = pick.np""".stripMargin),
    "s19_late_interaction" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         ${duckMaxsim("q.q_emb", "e.embedding::DOUBLE[]")} AS sim
        |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
        |WHERE rk <= 5""".stripMargin,
    "s21_knn_classify" ->
      s"""WITH te AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb,
         |         label AS true_label
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |tr AS (SELECT vec_id, embedding, label
         |       FROM embeddings WHERE vec_id % 10 <> 0),
         |p AS (
         |  SELECT te.q_id, te.true_label, tr.vec_id, tr.label,
         |         ${duckCosine("te.q_emb", "tr.embedding::DOUBLE[]")} AS sim
         |  FROM te CROSS JOIN tr),
         |k AS (
         |  SELECT q_id, true_label, label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |                ORDER BY sim DESC, vec_id) AS rk FROM p) t
         |  WHERE rk <= 5),
         |v AS (
         |  SELECT q_id, true_label, label, count(*) AS n_votes
         |  FROM k GROUP BY 1, 2, 3)
         |SELECT q_id AS vec_id, true_label, label AS pred_label, n_votes
         |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |             ORDER BY n_votes DESC, label) AS rk FROM v) t
         |WHERE rk <= 1""".stripMargin,
    "s01_knn_bruteforce" -> bruteforceOracle,
    "s41_filtered_knn" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
        |           FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         list_sum(list_transform(list_zip(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(q.q_emb::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM q JOIN embeddings e
        |    ON e.vec_id <> q.q_id AND e.label <> q.q_label)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
        |WHERE rk <= 5""".stripMargin,
    "s40_cascade_sweep" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
         |           FROM embeddings WHERE vec_id < 10),
         |cosall AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${duckCosine("q.q_emb", "e.embedding::DOUBLE[]")} AS csim
         |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
         |short AS (
         |  SELECT q_id, vec_id, crk FROM (
         |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |               ORDER BY csim DESC, vec_id) AS crk
         |    FROM cosall) t WHERE crk <= 50),
         |ms AS (
         |  SELECT sh.q_id, sh.vec_id, sh.crk,
         |         ${duckMaxsim("q.q_emb", "e.embedding::DOUBLE[]")} AS msim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.vec_id
         |  JOIN q ON q.q_id = sh.q_id),
         |tru AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT p.q_id, p.vec_id,
         |           row_number() OVER (PARTITION BY p.q_id
         |               ORDER BY p.sim DESC, p.vec_id) AS rk
         |    FROM (SELECT q.q_id, e.vec_id,
         |                 ${duckMaxsim("q.q_emb", "e.embedding::DOUBLE[]")} AS sim
         |          FROM q JOIN embeddings e ON e.vec_id <> q.q_id) p) t
         |  WHERE rk <= 5),
         |nn AS (SELECT unnest([10, 20, 50]) AS n),
         |c5 AS (
         |  SELECT n, q_id, vec_id FROM (
         |    SELECT nn.n, m.q_id, m.vec_id,
         |           row_number() OVER (PARTITION BY nn.n, m.q_id
         |               ORDER BY m.msim DESC, m.vec_id) AS rk
         |    FROM ms m CROSS JOIN nn WHERE m.crk <= nn.n) t
         |  WHERE rk <= 5),
         |agg AS (
         |  SELECT c.n, count(*) AS n_results,
         |         CAST(sum(CASE WHEN t2.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_hits
         |  FROM c5 c LEFT JOIN tru t2
         |    ON t2.q_id = c.q_id AND t2.vec_id = c.vec_id
         |  GROUP BY 1)
         |SELECT CAST(n AS BIGINT) AS shortlist_n,
         |       CAST(n_hits * 1000 // n_results AS BIGINT) AS recall_pm,
         |       CAST(n * 10 AS BIGINT) AS n_reranked
         |FROM agg""".stripMargin,
    "s39_filter_strategy" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 10),
         |sc AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${duckCosine("q.q_emb::DOUBLE[]", "e.embedding::DOUBLE[]")} AS sim
         |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
         |f AS (SELECT unnest([2, 10, 50]) AS m),
         |pre AS (
         |  SELECT m, q_id, list_sort(list(vec_id)) AS pre_ids FROM (
         |    SELECT f.m, s.q_id, s.vec_id,
         |           row_number() OVER (PARTITION BY f.m, s.q_id
         |               ORDER BY s.sim DESC, s.vec_id) AS rk
         |    FROM sc s CROSS JOIN f WHERE s.vec_id % f.m = 0) t
         |  WHERE rk <= 5 GROUP BY 1, 2),
         |short AS (SELECT q_id, vec_id, sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |               ORDER BY sim DESC, vec_id) AS rk FROM sc) t
         |  WHERE rk <= 50),
         |post AS (
         |  SELECT m, q_id, list_sort(list(vec_id)) AS post_ids,
         |         count(*) AS n_post FROM (
         |    SELECT f.m, sh.q_id, sh.vec_id,
         |           row_number() OVER (PARTITION BY f.m, sh.q_id
         |               ORDER BY sh.sim DESC, sh.vec_id) AS rk2
         |    FROM short sh CROSS JOIN f WHERE sh.vec_id % f.m = 0) t
         |  WHERE rk2 <= 5 GROUP BY 1, 2),
         |selq AS (
         |  SELECT f.m,
         |         CAST(sum(CASE WHEN e.vec_id % f.m = 0 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_match,
         |         count(*) AS n_total
         |  FROM embeddings e CROSS JOIN f GROUP BY 1),
         |agg AS (
         |  SELECT p.m, count(*) AS n_queries,
         |         CAST(sum(CASE WHEN po.n_post = 5 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_post_complete,
         |         CAST(sum(CASE WHEN po.n_post = 5 AND po.post_ids = p.pre_ids
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
         |  FROM pre p LEFT JOIN post po ON po.m = p.m AND po.q_id = p.q_id
         |  GROUP BY 1)
         |SELECT CAST(a.m AS BIGINT) AS m, a.n_queries, a.n_post_complete,
         |       a.n_agree,
         |       CAST((s2.n_match * 1000) // s2.n_total AS BIGINT) AS sel_pm,
         |       CASE WHEN ((s2.n_match * 1000) // s2.n_total) * 50 >= 5000
         |            THEN 'post_filter' ELSE 'pre_filter' END AS decision
         |FROM agg a JOIN selq s2 ON s2.m = a.m""".stripMargin,
    "s38_ranking_metrics" ->
      s"""WITH gt AS ($bruteforceOracle),
         |sys0 AS (${ivfOracle(1)}),
         |sys AS (
         |  SELECT q_id, vec_id,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY sim DESC, vec_id) AS srk
         |  FROM sys0),
         |marked AS (
         |  SELECT s.q_id, s.srk,
         |         CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM sys s LEFT JOIN gt g
         |    ON g.q_id = s.q_id AND g.vec_id = s.vec_id),
         |agg AS (
         |  SELECT q_id, sum(hit) AS h,
         |         min(CASE WHEN hit = 1 THEN srk END) AS fh,
         |         sum(CASE WHEN hit = 1 THEN
         |               CASE srk WHEN 1 THEN 1000 WHEN 2 THEN 631
         |                        WHEN 3 THEN 500 WHEN 4 THEN 431 ELSE 387 END
         |             ELSE 0 END) AS dcg
         |  FROM marked GROUP BY 1)
         |SELECT q_id, CAST(h * 1000 // 5 AS BIGINT) AS recall_milli,
         |       CAST(coalesce(1000 // fh, 0) AS BIGINT) AS mrr_milli,
         |       CAST(CASE WHEN h = 0 THEN 0 ELSE dcg * 1000 //
         |              (CASE h WHEN 1 THEN 1000 WHEN 2 THEN 1631
         |                      WHEN 3 THEN 2131 WHEN 4 THEN 2562
         |                      ELSE 2949 END) END AS BIGINT) AS ndcg_milli
         |FROM agg""".stripMargin,
    "s05_zipwith_cosine" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         list_sum(list_transform(list_zip(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(q.q_emb::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
        |WHERE rk <= 5""".stripMargin,
    "s07_quantized_cosine" ->
      """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(v, x -> CAST(round(x * (127.0 /
        |           list_max(list_transform(v, y -> abs(y))))) AS BIGINT)) AS qv
        |  FROM emb),
        |q AS (SELECT vec_id AS q_id, qv AS q_qv FROM qz WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         CAST(list_sum(list_transform(list_zip(q.q_qv, e.qv), x -> x[1] * x[2])) AS DOUBLE)
        |           / (sqrt(CAST(list_sum(list_transform(q.q_qv, v -> v * v)) AS DOUBLE))
        |              * sqrt(CAST(list_sum(list_transform(e.qv, v -> v * v)) AS DOUBLE))) AS sim
        |  FROM q JOIN qz e ON e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
        |WHERE rk <= 5""".stripMargin,
    "s26_mips_augmented" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |n AS (SELECT vec_id, x,
        |             list_sum(list_transform(x, v -> v * v)) AS n2 FROM e),
        |m AS (SELECT max(n2) AS m2 FROM n),
        |c AS (SELECT vec_id, list_append(x, sqrt(m.m2 - n2)) AS x_aug
        |      FROM n, m),
        |q AS (SELECT vec_id AS q_id, list_append(x, 0.0) AS q_aug
        |      FROM e WHERE vec_id < 10),
        |p AS (
        |  SELECT q.q_id, c.vec_id,
        |         list_sum(list_transform(list_zip(q.q_aug, c.x_aug),
        |                                 z -> z[1] * z[2]))
        |           / (sqrt(list_sum(list_transform(q.q_aug, v -> v*v)))
        |              * sqrt(list_sum(list_transform(c.x_aug, v -> v*v)))) AS sim
        |  FROM q JOIN c ON c.vec_id <> q.q_id)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM p) t
        |WHERE rk <= 5""".stripMargin,
    "s27_persisted_signatures" -> binaryQuantOracle,
    "s24_binary_quant" -> binaryQuantOracle,
    "s37_tombstoned_search" ->
      binaryQuantOracleWhere(" AND c.vec_id % 7 <> 3"),
    "s32_knn_graph" -> knnGraphOracle,
    // s42 serves the SAME graph from its store — one oracle proves the
    // persisted build+append path lossless vs the inline join
    "s42_persisted_knn_graph" -> knnGraphOracle,
    "s33_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label
         |           FROM embeddings),
         |q AS (SELECT vec_id AS q_id, emb AS q_emb, label AS q_label
         |      FROM e WHERE vec_id < $NQueries),
         |cand AS (
         |  SELECT q.q_id, e.vec_id AS neg_id,
         |         ${duckCosine("q.q_emb", "e.emb")} AS sim
         |  FROM q JOIN e ON e.label <> q.q_label)
         |SELECT q_id, neg_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |              ORDER BY sim DESC, neg_id) AS rk
         |  FROM cand WHERE sim < 0.95) t
         |WHERE rk <= $K""".stripMargin,
    "s02_ann_lsh" -> signLshOracle(Seq(0)),
    "s20_multiprobe_lsh" -> signLshOracle(Seq(0, 1, 2, 4, 8)),
    // the trained-quantizer family (round 8): oracles REBUILD the integer
    // Lloyd training inline — see the Round-8 oracle section above
    "s06_ivf_kmeans" -> ivfKmeansOracle,
    "s09_pq_ann" -> pqAnnOracle,
    "s10_ivf_pq" -> ivfPqOracle,
    "s17_persisted_ivfpq" -> ivfPqOracle,
    "s12_ivf_pq_rerank" -> ivfPqRerankOracle,
    "s18_incremental_append" -> incAppendOracle,
    "s30_index_compaction" -> incAppendOracle,
    "s11_graph_ann" -> graphAnnOracle,
    "s03_dot_topk" ->
      """WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |       list_sum(list_transform(list_zip(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]),
        |                               x -> x[1] * x[2])) AS score
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY score DESC, e.vec_id LIMIT 20""".stripMargin,
  )

  private lazy val knnGraphOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sig AS (SELECT vec_id, emb, ${duckBucket("emb")} AS bucket FROM e),
       |cand AS (
       |  SELECT a.vec_id, b.vec_id AS nbr_id,
       |         ${duckCosine("a.emb", "b.emb")} AS sim
       |  FROM sig a JOIN sig b
       |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
       |SELECT vec_id, nbr_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |              ORDER BY sim DESC, nbr_id) AS rk FROM cand) t
       |WHERE rk <= 3""".stripMargin

  /** s31's oracle reuses the component oracles verbatim as subqueries:
    * each family's stored twin recomputes its shortlist, truth comes from
    * the s01 twin, recall is an integer hit count.
    */
  private def frontierOracle(base: Map[String, String]): String = {
    def sq(name: String) = base(name).replace("\n", "\n  ")
    s"""WITH truth AS (SELECT q_id, vec_id FROM (
       |  ${sq("s01_knn_bruteforce")}) t),
       |f07 AS (SELECT q_id, vec_id FROM (
       |  ${sq("s07_quantized_cosine")}) t),
       |f22 AS (SELECT q_id, vec_id FROM (
       |  ${sq("s22_jl_projection")}) t),
       |f24 AS (SELECT q_id, vec_id FROM (
       |  ${sq("s24_binary_quant")}) t),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |hits AS (
       |  SELECT 'float32_exact' AS family, CAST(256 AS BIGINT) AS bytes_per_vec,
       |         CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_hits
       |  UNION ALL
       |  SELECT 'int8_sq', 64,
       |         CAST((SELECT count(*) FROM f07 JOIN truth USING (q_id, vec_id)) AS BIGINT)
       |  UNION ALL
       |  SELECT 'jl_proj32', 256,
       |         CAST((SELECT count(*) FROM f22 JOIN truth USING (q_id, vec_id)) AS BIGINT)
       |  UNION ALL
       |  SELECT 'sign_1bit', 8,
       |         CAST((SELECT count(*) FROM f24 JOIN truth USING (q_id, vec_id)) AS BIGINT))
       |SELECT family, bytes_per_vec, n_hits, n.n_truth,
       |       (n_hits * 1000) // n.n_truth AS recall_pm
       |FROM hits CROSS JOIN n""".stripMargin
  }

  val oracles: Map[String, String] =
    baseOracles + ("s31_compression_frontier" -> frontierOracle(baseOracles))

  /** Shared by s24 (inline signatures) and s27 (stored signatures): one
    * recompute oracle proving the persisted index lossless.
    */
  private lazy val binaryQuantOracle: String = binaryQuantOracleWhere("")

  /** s24's oracle with an optional corpus predicate — s37 threads the
    * tombstone mask through the SAME text, so the delete-aware variant
    * shares every other character with the proven base oracle.
    */
  private def binaryQuantOracleWhere(corpusPred: String): String =
      s"""WITH sig AS (
        |  SELECT vec_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN embedding[CAST(i + 1 AS INT)] > 0
        |                THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS lo,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN embedding[CAST(i + 33 AS INT)] > 0
        |                THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS hi
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, lo AS qlo, hi AS qhi FROM sig WHERE vec_id < 10),
        |h AS (
        |  SELECT q.q_id, c.vec_id,
        |         bit_count(xor(q.qlo, c.lo)) + bit_count(xor(q.qhi, c.hi)) AS hdist
        |  FROM q JOIN sig c ON c.vec_id <> q.q_id$corpusPred),
        |short AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY hdist, vec_id) AS rn
        |    FROM h) t
        |  WHERE rn <= 50),
        |rr AS (
        |  SELECT sh.q_id, sh.vec_id,
        |         list_sum(list_transform(list_zip(qe.embedding::DOUBLE[],
        |                                          ce.embedding::DOUBLE[]),
        |                                 x -> x[1] * x[2]))
        |           / (sqrt(list_sum(list_transform(qe.embedding::DOUBLE[], v -> v*v)))
        |              * sqrt(list_sum(list_transform(ce.embedding::DOUBLE[], v -> v*v)))) AS sim
        |  FROM short sh
        |  JOIN embeddings ce ON ce.vec_id = sh.vec_id
        |  JOIN embeddings qe ON qe.vec_id = sh.q_id)
        |SELECT q_id, vec_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY sim DESC, vec_id) AS rk FROM rr) t
        |WHERE rk <= 5""".stripMargin
}
