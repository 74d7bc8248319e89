package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Row carried into the partition-level "decode" kernel (m03). */
case class MediaBytes(doc_id: Long, media: Array[Byte])

/** Multimodal-column plumbing (brief §extended): media as opaque `binary`
  * columns with typed metadata, decode / feature-extract / frame-sample as
  * batch kernels.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecodeFeatures`); everything
  * around it — binary column handling, schema, partition-iterator batch
  * shape (the Scala twin of `mapInPandas`), explode-based frame sampling —
  * is real and oracle-checked. Swapping the stub for a JNI/codec call
  * changes no plumbing.
  *
  * Scale shape: all three queries are per-row/per-partition map work over
  * the scan — zero shuffles; the binary payload never crosses the network.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** documents.text re-encoded as a stand-in media payload + derived typed
    * metadata (width/height/frame-count a real decoder would read from the
    * container header).
    */
  private def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .withColumn("byte_len", octet_length(col("media")).cast("long"))
      .withColumn("width", lit(1L) + col("byte_len") % 64)
      .withColumn("height", lit(1L) + col("byte_len") % 48)
      .withColumn("n_frames", lit(1L) + col("byte_len") % 7)

  /** Metadata extraction over the binary column. */
  def m01_media_meta(s: SparkSession, d: String): DataFrame =
    media(s, d).select(col("doc_id"), col("byte_len"), col("width"),
      col("height"), col("n_frames"))

  /** Frame sampling: one output row per sampled frame, offset into the
    * payload — `explode(sequence(...))`, the distributed row-generator.
    */
  def m02_frame_sample(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(col("doc_id"), col("byte_len"), col("n_frames"),
        explode(expr("sequence(0L, n_frames - 1)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * expr("byte_len DIV n_frames")).as("frame_offset"))

  /** STUB "decoder": deterministic byte-residue histogram standing in for a
    * real image/audio feature extractor. A production build would replace
    * only the body of this function with the codec call.
    */
  private def fakeDecodeFeatures(bytes: Array[Byte]): Array[Long] = {
    val f = new Array[Long](4)
    var i = 0
    while (i < bytes.length) { f((bytes(i) & 0xff) % 4) += 1; i += 1 }
    f
  }

  /** Partition-iterator feature extraction — the Scala equivalent of
    * `mapInPandas`: the kernel sees a whole partition as an iterator (so a
    * real decoder could batch, reuse buffers, or pin an accelerator), and
    * output rows are independent of partitioning.
    */
  def m03_byte_features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    media(s, d).select(col("doc_id"), col("media")).as[MediaBytes]
      .mapPartitions { it =>
        it.map { r =>
          val f = fakeDecodeFeatures(r.media)
          (r.doc_id, f(0), f(1), f(2), f(3))
        }
      }
      .toDF("doc_id", "f0", "f1", "f2", "f3")
  }

  /** Arrow-BATCHED feature extraction — the zero-copy columnar twin of
    * m03's row-iterator kernel (PySpark calls this shape `mapInArrow`;
    * Scala exposes no public equivalent, so the batching is explicit).
    * Each partition's rows are staged into Arrow `VectorSchemaRoot`
    * batches and the "decoder" consumes the VarBinary vector's
    * offset/data BUFFERS directly — the exact interface an
    * accelerator-backed codec ingests (one contiguous payload buffer +
    * offsets per batch, reused across batches). Output rows and the
    * oracle are identical to m03: swapping the buffer-walking stub for a
    * real batch decoder changes no plumbing.
    */
  def m05_arrow_features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val batchRows = 512
    media(s, d).select(col("doc_id"), col("media")).as[MediaBytes]
      .mapPartitions { it =>
        import org.apache.arrow.memory.RootAllocator
        import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VectorSchemaRoot}
        import scala.jdk.CollectionConverters._
        val allocator = new RootAllocator()
        val ids = new BigIntVector("doc_id", allocator)
        val payload = new VarBinaryVector("media", allocator)
        val root = new VectorSchemaRoot(List[org.apache.arrow.vector.FieldVector](ids, payload).asJava)
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true; root.close(); allocator.close()
        }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeAll())
        val batches = it.grouped(batchRows).flatMap { chunk =>
          // stage the chunk into the (reused) Arrow batch
          root.allocateNew()
          var i = 0
          chunk.foreach { r =>
            ids.setSafe(i, r.doc_id)
            payload.setSafe(i, r.media)
            i += 1
          }
          root.setRowCount(i)
          // kernel: walk the batch's offset buffer + contiguous data
          // buffer — no per-row byte[] materialization
          val ob = payload.getOffsetBuffer
          val db = payload.getDataBuffer
          val out = (0 until i).map { r =>
            val start = ob.getInt(r.toLong * 4L)
            val end = ob.getInt((r + 1).toLong * 4L)
            val f = new Array[Long](4)
            var p = start
            while (p < end) { f((db.getByte(p.toLong) & 0xff) % 4) += 1; p += 1 }
            (ids.get(r), f(0), f(1), f(2), f(3))
          }
          out
        }
        // completion listener handles the task path; when TaskContext is
        // absent (direct local iterator consumption) free the Arrow
        // buffers on exhaustion instead of leaking them
        new Iterator[(Long, Long, Long, Long, Long)] {
          def hasNext: Boolean = {
            val h = batches.hasNext
            if (!h) closeAll()
            h
          }
          def next(): (Long, Long, Long, Long, Long) = batches.next()
        }
      }
      .toDF("doc_id", "f0", "f1", "f2", "f3")
  }

  /** Patch extraction plumbing: tile each medium's (width x height) grid
    * into 8x8 patches and emit one row per patch with its byte offset —
    * the 2D analogue of m02's frame sampling (vision-model preprocessing
    * emits exactly this row shape before the decode kernel fills pixels).
    * A doubly-nested `explode(sequence)` — the distributed 2D row
    * generator; zero shuffle.
    */
  def m04_patch_grid(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(col("doc_id"), col("width"), col("height"),
        explode(expr("sequence(0L, (height - 1) DIV 8)")).as("py"))
      .select(col("doc_id"), col("width"), col("py"),
        explode(expr("sequence(0L, (width - 1) DIV 8)")).as("px"))
      .select(col("doc_id"), col("py"), col("px"),
        (col("py") * 8 * col("width") + col("px") * 8).as("patch_offset"))

  /** Audio-style frame energy: the payload split into fixed 256-byte
    * frames, per-frame energy (sum of byte values) and peak — the windowed
    * feature-extraction shape an audio pipeline runs (RMS/peak per hop)
    * with the codec stubbed to raw bytes like m03. Same partition-iterator
    * kernel contract: a real DSP library would replace only the per-frame
    * fold. Integer arithmetic throughout, so even this "signal" path is
    * hash-checked (oracle reconstructs bytes from the hex dump, both
    * nibbles this time).
    */
  def m06_frame_energy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    media(s, d).select(col("doc_id"), col("media")).as[MediaBytes]
      .mapPartitions { it =>
        it.flatMap { r =>
          r.media.grouped(256).zipWithIndex.map { case (fr, i) =>
            var sum = 0L
            var mx = 0L
            var j = 0
            while (j < fr.length) {
              val v = (fr(j) & 0xff).toLong
              sum += v
              if (v > mx) mx = v
              j += 1
            }
            (r.doc_id, i.toLong, fr.length.toLong, sum, mx)
          }
        }
      }
      .toDF("doc_id", "frame_no", "frame_bytes", "energy", "peak")
  }

  /** Raw-file ingest through Spark's `binaryFile` source — the step that
    * puts image/audio/video FILES (not pre-extracted columns) into the
    * engine: list + read whole files as (path, length, content) rows,
    * then validate magic bytes and project metadata. This is the 100 TB
    * multimodal on-ramp: the source parallelizes over files (each file one
    * row, partitions packed by `maxPartitionBytes`), content bytes stay in
    * the executor that read them, and everything downstream (m02-m06
    * kernels) consumes the same binary column shape. Probed here against
    * the fixture's own parquet files (the only stable files in the
    * container); the DuckDB twin is `read_blob` over the same glob, so
    * even the file-listing source is oracle-checked.
    */
  def m07_binary_ingest(s: SparkSession, d: String): DataFrame =
    s.read.format("binaryFile").load(s"$d/*.parquet")
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
        col("length"),
        expr("decode(substring(content, 1, 4), 'UTF-8') = 'PAR1'").as("magic_ok"))

  /** m10: small-file COMPACTION plan — the table-maintenance operator
    * every parquet lake schedules (Iceberg `rewrite_data_files` binPack /
    * Delta OPTIMIZE): files ordered by name are packed into target-size
    * bins by cumulative-byte splitting (each bin closes when the running
    * total crosses 256 KiB — bins may overshoot by at most one file, the
    * standard binPack tolerance), and the plan emits each bin's file
    * count, byte total and name range — exactly what a rewrite job needs
    * to schedule one task per bin.
    *
    * Scale shape: the input is the file LISTING (one row per file, never
    * per record), so the global running sum is metadata-sized; past
    * millions of files the same prefix sum runs as c17's two-phase
    * distributed scan (per-partition subtotals -> broadcast offsets).
    * All-integer arithmetic over real file sizes -> hash-green against
    * DuckDB's read_blob over the same glob.
    */
  def m10_compaction_plan(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = 256L * 1024
    val files = s.read.format("binaryFile").load(s"$d/*.parquet")
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
        col("length"))
    val w = Window.orderBy(col("file_name"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.withColumn("cum", sum(col("length")).over(w))
      .withColumn("bin", expr(s"(cum - 1) div $target").cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).cast("long").as("bin_bytes"),
        min(col("file_name")).as("first_file"),
        max(col("file_name")).as("last_file"))
  }

  /** Exact media dedup by content digest — the first dedup pass every
    * multimodal corpus runs (byte-identical copies of the same image/clip
    * under different names/collections collapse to one canonical row
    * before any expensive perceptual hashing). Two "collections" are
    * simulated by tagging the same file listing twice, so every content
    * group genuinely has copies to collapse and the canonical-pick rule
    * (lexicographic min of collection/name) is exercised. The digest is
    * md5 over the hex expansion of the bytes — hex first because DuckDB's
    * md5 only accepts VARCHAR, and both engines print hex uppercase, so
    * the digests (and therefore the groups) match bit-for-bit; production
    * would digest raw bytes directly, same operator shape. Scale: digest
    * is computed where the bytes already sit (scan-local projection), and
    * only (digest, name, length) — never content — enters the shuffle.
    */
  def m08_media_dedup(s: SparkSession, d: String): DataFrame = {
    val files = s.read.format("binaryFile").load(s"$d/*.parquet")
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
        col("length"), md5(hex(col("content"))).as("digest"))
    val both = files.withColumn("collection", lit("a"))
      .unionByName(files.withColumn("collection", lit("b")))
    both.groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"),
        min(concat_ws("/", col("collection"), col("file_name"))).as("canonical"),
        sum(col("length")).as("total_bytes"))
  }

  /** Perceptual NEAR-dup over decoded media features — the second dedup
    * pass after m08's exact digest: byte-identical copies are gone, but
    * re-encoded/resized variants of the same asset survive and are caught
    * by comparing feature DISTRIBUTIONS, not bytes. Features come from
    * m03's kernel (the stub standing in for a real decoder — swapping in
    * CLIP/pHash features changes nothing downstream); similarity is the
    * L1 distance of the per-class proportions, kept in EXACT integer
    * arithmetic by cross-multiplying totals (|f_i·T_b − g_i·T_a| summed,
    * threshold ×50 ≡ 2% L1) — no floats anywhere, so the approximate
    * METHOD still hash-checks (the s07 trick). Pairs generate only inside
    * a total-count bucket (candidate blocking: 15.5k of 125k possible
    * pairs at sf0.01), the same banded economics as d05/g02 — at 100 TB
    * the bucket width is the knob that bounds join fan-out, and the
    * kernel pass runs ONCE (checkpointed) for both join sides.
    */
  /** m13: content-based VISUAL search — the retrieval use of the decoded
    * feature vectors (m09 finds near-duplicates; this answers "find media
    * like THIS one"): ~1% of items (doc_id % 97 == 0) act as query
    * images, and each retrieves its top-5 most-similar corpus items by
    * normalized L1 distance over the byte-class histograms. The
    * comparison is m09's cross-multiplied integer form with ONE final
    * int64 division as the sort key (correctly-rounded double — the c25
    * ratio discipline), so the whole retrieval hash-checks. Plan is the
    * s01 shape on the media side: one feature-kernel pass (checkpointed),
    * broadcast query side, codegen'd integer arithmetic, per-query top-5
    * through the partial heaps. A real deployment swaps
    * [[fakeDecodeFeatures]] for a learned visual encoder behind the SAME
    * mapPartitions/Arrow seam (m03/m05) and this query does not change.
    */
  def m13_visual_search(s: SparkSession, d: String): DataFrame = {
    import graft.plans.TopKPerGroup
    import graft.plans.TopKPerGroup.Ord
    val f = m03_byte_features(s, d)
      .withColumn("t", col("f0") + col("f1") + col("f2") + col("f3"))
      .localCheckpoint() // one kernel pass feeds query and corpus sides
    val q = f.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"), col("f0").as("q0"), col("f1").as("q1"),
        col("f2").as("q2"), col("f3").as("q3"), col("t").as("qt"))
    def xterm(i: Int) =
      abs(col(s"q$i") * col("t") - col(s"f$i") * col("qt"))
    TopKPerGroup.topK(
      f.join(broadcast(q), col("doc_id") =!= col("q_id"))
        .withColumn("l1x", xterm(0) + xterm(1) + xterm(2) + xterm(3))
        .select(col("q_id"), col("doc_id"),
          (col("l1x").cast("double") / (col("qt") * col("t"))).as("dist")),
      Seq("q_id"), Seq(Ord("dist"), Ord("doc_id")), 5)
  }

  /** m14: SHOT-BOUNDARY detection — the segmentation pass a video
    * pipeline runs over m06's per-frame energy series (cut detection by
    * feature discontinuity; the DSP sibling of q95's seasonal anomaly
    * screen): a boundary is a >=20% relative jump in mean byte energy
    * between consecutive frames. The compare is cross-multiplied exact
    * integers (energy x other-frame-bytes — the s07/m09 trick, which also
    * handles the shorter final frame without a float division), one lag()
    * window per doc ordered by frame_no — linear in frames, hash-green.
    */
  def m14_shot_boundaries(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    m06_frame_energy(s, d)
      .withColumn("pe", lag(col("energy"), 1).over(w))
      .withColumn("pb", lag(col("frame_bytes"), 1).over(w))
      .filter(col("pe").isNotNull)
      .filter(abs(col("energy") * col("pb") - col("pe") * col("frame_bytes")) * 5
        >= col("pe") * col("frame_bytes"))
      .select(col("doc_id"), col("frame_no"), col("energy"),
        col("pe").as("prev_energy"))
  }

  /** m16: VAD-style activity segmentation — the gating pass every audio
    * pipeline runs before transcription (WebRTC-VAD shape): frames whose
    * mean per-byte energy clears a threshold are "active", and maximal
    * RUNS of ≥ 2 consecutive active frames become segments (single active
    * frames are clicks, not speech). The threshold compare is
    * cross-multiplied exact integers (energy·10 ≥ bytes·950 ⇔ mean ≥
    * 95.0 — sweep-chosen against the fixture's 87..121 frame-mean range
    * so the gate genuinely splits: ~half the frames pass, single-frame
    * blips get dropped by the run-length floor); runs
    * merge via the q74/d17 gaps-and-islands trick (frame_no −
    * row_number per doc). One frame-kernel pass + one per-doc window +
    * one aggregate — all integers → hash-green against DuckDB running
    * the same passes over the shared frame-energy formulation. At scale
    * the window partitions by doc (frames-per-doc bounded), never a
    * global sort.
    */
  def m16_vad_segments(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    m06_frame_energy(s, d)
      .filter(col("energy") * 10 >= col("frame_bytes") * 950)
      .withColumn("island", col("frame_no") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("frame_no")).as("seg_start"),
        max(col("frame_no")).as("seg_end"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("seg_energy"))
      .filter(col("n_frames") >= 2)
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("n_frames"), col("seg_energy"))
  }

  /** m17: byte-ENTROPY gate — the payload classifier run before wasting
    * decode/dedup effort: Shannon entropy of the symbol distribution
    * separates degenerate/repetitive payloads (low H — stuck sensors,
    * zero-filled blobs) from plausibly-compressed-or-encrypted ones
    * (H at the alphabet ceiling — already-encoded media a text pipeline
    * must not re-tokenize). Per-symbol counts are one aggregate over the
    * char explode; each term −p·ln p follows the t11 discipline
    * (9dp-rounded ln, 9dp-rounded term, DECIMAL(38,9) summation — so
    * the per-doc entropy is order-independent and hash-checks), and the
    * two gate flags are integer comparisons on the nano-scaled value.
    * Scale: scan + two keyed aggregates, nothing else.
    */
  private def m17Sql(chars: String, div: String): String =
    s"""WITH ch AS ($chars),
       |cnt AS (
       |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
       |  FROM ch GROUP BY 1, 2),
       |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
       |terms AS (
       |  SELECT cnt.doc_id,
       |         CAST(round(-1.0 * (CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
       |              * round(ln(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)), 9), 9)
       |           AS DECIMAL(20,9)) AS term,
       |         n.n
       |  FROM cnt JOIN n ON n.doc_id = cnt.doc_id),
       |e AS (
       |  SELECT doc_id, CAST(min(n) AS BIGINT) AS n_symbols,
       |         CAST(count(*) AS BIGINT) AS n_distinct,
       |         CAST(CAST(sum(term) AS DECIMAL(38,9)) * 1000000000
       |              AS BIGINT) AS entropy_nano
       |  FROM terms GROUP BY doc_id)
       |SELECT doc_id, n_symbols, n_distinct, entropy_nano,
       |       CASE WHEN entropy_nano < 2500000000 THEN 1 ELSE 0 END AS flag_low,
       |       CASE WHEN entropy_nano > 3300000000 THEN 1 ELSE 0 END AS flag_high
       |FROM e""".stripMargin

  def m17_entropy_gate(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .repartition(Tables.scanPartitions(s))
      .createOrReplaceTempView("documents")
    entropyFromViews(s)
  }

  /** The gate over whatever `documents` view is registered — split out so
    * the spec can plant constant (H = 0) and uniform (H = ln k) payloads.
    */
  private[graft] def entropyFromViews(s: SparkSession): DataFrame =
    s.sql(m17Sql(
      "SELECT doc_id, explode(split(text, '')) AS ch FROM documents", "div"))

  def m09_feature_neardup(s: SparkSession, d: String): DataFrame = {
    val f = m03_byte_features(s, d)
      .withColumn("t", col("f0") + col("f1") + col("f2") + col("f3"))
      .withColumn("bucket", expr("t div 64L"))
      .localCheckpoint()
    def side(tag: String) =
      f.select(f.columns.map(c => col(c).as(s"${c}_$tag")): _*)
    def xterm(i: Int) =
      abs(col(s"f${i}_a") * col("t_b") - col(s"f${i}_b") * col("t_a"))
    side("a").join(side("b"),
        col("bucket_a") === col("bucket_b") && col("doc_id_a") < col("doc_id_b"))
      .withColumn("l1x", xterm(0) + xterm(1) + xterm(2) + xterm(3))
      .filter(col("l1x") * 50 <= col("t_a") * col("t_b"))
      .select(col("doc_id_a").as("doc_a"), col("doc_id_b").as("doc_b"),
        col("l1x"))
  }

  /** m18: media near-dup CLUSTERS — the resolution step after m09's pair
    * report (what d10/d13 are to d05 on text): connected components over
    * the perceptual near-dup pairs via the large/small-star contraction
    * ([[DedupQueries.starContract]], O(log n) rounds on adversarial
    * diameters), each media doc mapped to its component's min doc_id —
    * the keep-one-per-cluster key a media dedup APPLY joins on. Oracle
    * is the same recursive-CTE reachability as d10's over m09's pair SQL;
    * integer ids → hash-green. Scale: m09's bucket-banded pair join +
    * star rounds linear in edges.
    */
  def m18_media_clusters(s: SparkSession, d: String): DataFrame =
    DedupQueries.starContract(
      m09_feature_neardup(s, d).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("cluster_rep"))

  /** m19: KEYFRAME selection — the pass after m14's cut detection that a
    * video pipeline actually ships downstream: one representative frame
    * per SHOT (the frame embedded/captioned instead of all frames —
    * 10-100x fewer decode+embed calls). Shots are the runs between m14's
    * boundaries (shot_no = running count of boundary frames per doc, one
    * window over the frame stream); the keyframe is each shot's
    * max-energy frame (min frame_no on ties), selected through the
    * native partial-heap top-k — never a rank window funneling a doc's
    * frames through one reducer. Integers end to end → hash-green
    * against DuckDB running the same passes over the shared
    * frame-energy formulation.
    */
  def m19_keyframes(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val frames = m06_frame_energy(s, d)
      .withColumn("pe", lag(col("energy"), 1).over(w))
      .withColumn("pb", lag(col("frame_bytes"), 1).over(w))
      .withColumn("is_cut",
        when(col("pe").isNotNull &&
          abs(col("energy") * col("pb") - col("pe") * col("frame_bytes")) * 5
            >= col("pe") * col("frame_bytes"), 1L).otherwise(0L))
      .withColumn("shot_no", sum(col("is_cut")).over(w))
    graft.plans.TopKPerGroup.topK(
      frames.select(col("doc_id"), col("shot_no"), col("frame_no"),
        col("energy")),
      Seq("doc_id", "shot_no"),
      Seq(graft.plans.TopKPerGroup.Ord("energy", desc = true),
        graft.plans.TopKPerGroup.Ord("frame_no")), 1)
      .select(col("doc_id"), col("shot_no"),
        col("frame_no").as("keyframe_no"), col("energy"))
  }

  /** m11: CONTENT-DEFINED chunking (CDC) — the dedup primitive for big
    * binary payloads (backup systems, LLM-corpus media stores): chunk
    * boundaries are placed where a rolling hash of the last [[CdcW]]
    * symbols hits 0 mod [[CdcD]], so the SAME content produces the SAME
    * chunks even when its offset shifts (fixed-size blocks lose alignment
    * after one inserted byte; content-defined boundaries re-synchronize —
    * the rsync/LBFS insight). Pipeline, all inside the scan stage:
    * per-symbol codes -> per-position window hash (nested HOF lambdas,
    * codegen'd) -> boundary set -> exploded (start, len) chunk rows ->
    * md5 chunk fingerprint; then ONE shuffle keyed by fingerprint counts
    * cross-corpus copies. Expected chunk size is [[CdcD]] symbols; a
    * 100 TB corpus shuffles only (fp, doc, offset) tuples — payload bytes
    * never leave the scan. The fixture corpus carries real duplicate docs
    * (d01's), so `n_copies > 1` groups genuinely appear. Symbols are
    * codepoints (== bytes on this ASCII corpus), and the boundary rule,
    * chunk spans, and md5 fingerprints are all exact-integer/deterministic
    * -> hash-green.
    */
  def m11_cdc_chunks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("bnd"))
    // the boundary set is the native codegen'd CdcBoundaries kernel — the
    // HOF spelling (codes transform + per-position nested-lambda filter)
    // computed the same set but ran interpreted AND needed a checkpoint
    // barrier to stop CollapseProject inlining the O(n) codes array into
    // the per-position lambda (O(n^3)/doc, a wedged executor); the native
    // kernel is O(n*w) inside the scan stage with no barrier at all
    val spans = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.cdc_boundaries(
          col("text"), CdcW, CdcD).as("bnds"))
      .select(col("doc_id"), col("text"), explode(col("bnds")).as("bnd"))
      .withColumn("prev", coalesce(lag(col("bnd"), 1).over(w), lit(0)))
      .withColumn("chunk_idx", row_number().over(w).cast("long"))
      .withColumn("chunk_start", (col("prev") + 1).cast("long"))
      .withColumn("chunk_len", (col("bnd") - col("prev")).cast("long"))
      .withColumn("chunk_fp",
        md5(expr("substring(text, chunk_start, chunk_len)")))
    val copies = Window.partitionBy(col("chunk_fp"))
    spans
      .withColumn("n_copies", count(lit(1)).over(copies))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        col("chunk_len"), col("chunk_fp"), col("n_copies"))
  }

  /** CDC window width / boundary divisor (expected chunk = CdcD symbols). */
  private val CdcW = 8
  private val CdcD = 64

  /** m12: incremental-TRANSFER estimate — the rsync/backup question m11's
    * chunking exists to answer: after an edit pass (every 10th doc gets a
    * prefix insertion — the alignment-destroying edit), how many chunk
    * uploads does a dedup store actually need? Two schemes over identical
    * data: CDC boundaries re-synchronize after an insertion, so only each
    * modified doc's FIRST chunk is new; fixed-size 64-char blocks lose
    * alignment at the insertion point and re-upload essentially the whole
    * modified doc. The output is the two-row comparison (scheme, chunk
    * counts, new-chunk counts/bytes, transfer ratio) — the measured form
    * of the CDC design argument, hash-green end to end (md5 fp sets,
    * integer byte counts, one final ratio). Scale shape: both schemes are
    * scan-local chunkers + one fp-keyed anti-join; nothing pairwise.
    */
  def m12_delta_transfer(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v1 = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .localCheckpoint() // chunked twice (v1 side of both schemes)
    val v2 = v1.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, concat(lit("Z "), col("text")))
        .otherwise(col("text")).as("text"))
    def cdcFps(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("bnd"))
      df.select(col("doc_id"), col("text"),
          graft.functions.TextFunctions.cdc_boundaries(
            col("text"), CdcW, CdcD).as("bnds"))
        .select(col("doc_id"), col("text"), explode(col("bnds")).as("bnd"))
        .withColumn("prev", coalesce(lag(col("bnd"), 1).over(w), lit(0)))
        .select(md5(expr("substring(text, prev + 1, bnd - prev)")).as("fp"),
          (col("bnd") - col("prev")).cast("long").as("len"))
    }
    def fixedFps(df: DataFrame): DataFrame =
      df.select(col("text"),
          explode(expr("sequence(0, (length(text) - 1) div 64)")).as("i"))
        .select(md5(expr("substring(text, i * 64 + 1, 64)")).as("fp"),
          least(lit(64), length(col("text")) - col("i") * 64)
            .cast("long").as("len"))
    def summarize(scheme: String, v1f: DataFrame, v2f: DataFrame): DataFrame = {
      val known = v1f.select(col("fp")).distinct()
      val store = v2f.groupBy(col("fp")).agg(max(col("len")).as("len"))
        .localCheckpoint() // totals AND the anti-join read it
      val nu = store.join(known, Seq("fp"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_new"),
          coalesce(sum(col("len")), lit(0L)).as("new_bytes"))
      store.agg(count(lit(1)).as("n_chunks"),
          sum(col("len")).as("total_bytes"))
        .crossJoin(nu)
        .select(lit(scheme).as("scheme"), col("n_chunks"), col("total_bytes"),
          col("n_new"), col("new_bytes"),
          round(col("new_bytes").cast("double") / col("total_bytes"), 9)
            .as("transfer_ratio"))
    }
    summarize("cdc", cdcFps(v1), cdcFps(v2))
      .unionByName(summarize("fixed", fixedFps(v1), fixedFps(v2)))
  }

  /** 63-bit perceptual DIFFERENCE hash (Krawetz's dHash, the cheapest of
    * the perceptual-hash family): the payload is "downsampled" into 64
    * equal byte segments and bit i records whether segment i+1's mean
    * exceeds segment i's — compared by exact cross-multiplication
    * (sum·len vs sum·len), so no division and no float anywhere. The
    * defining property is LOCALITY: a same-length edit touching one
    * segment can flip at most the two comparisons adjacent to it, while
    * unrelated payloads differ in ~half of 63 bits.
    */
  private[operators] def dhash63(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val sums = new Array[Long](64)
    val lens = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val lo = (i.toLong * n / 64).toInt
      val hi = ((i + 1).toLong * n / 64).toInt
      var acc = 0L
      var j = lo
      while (j < hi) { acc += bytes(j) & 0xff; j += 1 }
      sums(i) = acc
      lens(i) = hi - lo
      i += 1
    }
    var h = 0L
    i = 0
    while (i < 63) {
      if (sums(i + 1) * lens(i) > sums(i) * lens(i + 1)) h |= 1L << i
      i += 1
    }
    h
  }

  /** m15: perceptual-hash NEAR-dup across collections — the image-dedup
    * flow every multimodal corpus runs (pHash/dHash the payloads, match in
    * Hamming space) posed as collection A vs its RE-ENCODED copy: each
    * payload reappears with one same-length byte edit (last symbol
    * case-flipped — the stand-in for a re-encode that perturbs a few
    * pixels), and the pipeline must pair every original with its variant
    * while rejecting all unrelated payloads. dHash locality makes the
    * planted pairs differ by <= 2 of 63 bits where unrelated word-soup
    * payloads differ by >= 13 (measured at sf0.01) — a clean margin under
    * the Hamming <= 6 accept threshold. Candidates come from a 3-band
    * LSH join (21 bits per band, exact-match on any band): by pigeonhole
    * every pair within Hamming 2 shares an error-free band, so planted
    * RECALL IS STRUCTURAL, not probabilistic — while the bucket join
    * never enumerates all pairs. At 100 TB: the hash rides the decode
    * scan (one pass, 8 bytes out per payload), the join touches only
    * band-colliding candidates, verification is xor+popcount in codegen.
    * All-integer arithmetic end to end -> hash-green (the DuckDB twin
    * rebuilds the same hashes from the hex dump, m06's trick).
    */
  def m15_dhash_neardup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val variant = base.select((col("doc_id") + 10000000L).as("doc_id"),
      expr("concat(substring(text, 1, length(text) - 1), " +
        "upper(substring(text, length(text), 1)))").as("text"))
    val hashes = base.unionByName(variant)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaBytes]
      .mapPartitions(it => it.map(r => (r.doc_id, dhash63(r.media))))
      .toDF("doc_id", "dh")
    val bands = hashes.select(col("doc_id"), col("dh"),
        explode(expr("sequence(0, 2)")).as("j"))
      .withColumn("band", expr("shiftright(dh, 21 * j) & 2097151"))
    bands.as("a").join(bands.as("b"),
        col("a.j") === col("b.j") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.dh").as("ha"),
        col("b.doc_id").as("doc_b"), col("b.dh").as("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= 6)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Fixed images-per-batch for m20 (the SDXL-style bucketing contract:
    * batches are homogeneous in aspect, constant in count).
    */
  private val AspectBatch = 8L

  /** m20: ASPECT-RATIO bucket batching manifest — the image/video
    * training loader's answer to "you can't batch a portrait with a
    * panorama": every asset is routed to the nearest bucket of a fixed
    * aspect ladder (50/75/100/133/200 per-cent width:height — the
    * SDXL-style bucketing recipe), and within a bucket assets are packed
    * into constant-size batches of [[AspectBatch]] in descending
    * byte-size order (big-first keeps per-batch decode cost even). The
    * nearest-bucket pick is argmin-by-sort over (|ar−L|, L) pairs —
    * array_sort of structs, lexicographic in BOTH engines, so ties
    * break identically. Within-bucket positions do NOT come from one
    * ORDER BY window (a global sort per bucket funnels the whole corpus
    * through |ladder| reducers): they come from d27/c28's two-phase
    * distributed prefix scan — range-partition on (bucket, size desc,
    * doc_id), per-(partition, bucket) subtotals to the driver (≤
    * 32·|ladder| rows at any corpus size), broadcast offsets back —
    * while the DuckDB oracle uses its native one-window row_number over
    * the same total order, cross-validating the two-phase positions
    * hash-for-hash. batch_no/slot are integer div/mod of the position.
    */
  def m20_aspect_buckets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ladder = Seq(50L, 75L, 100L, 133L, 200L)
    val pick = element_at(array_sort(array(ladder.map(l =>
      struct(abs(expr("(width * 100) div height") - lit(l)).as("dist"),
        lit(l).as("b"))): _*)), 1).getField("b")
    val recs = media(s, d)
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"))
      .withColumn("bucket", pick)
      .repartitionByRange(32, col("bucket"), col("byte_len").desc,
        col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be identical in both passes
    val subtotals = recs.groupBy(col("pid"), col("bucket"))
      .agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val offsets = subtotals.groupBy(_._2).toSeq.flatMap { case (b, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (pid, b, off) }
    }
    import s.implicits._
    val offDf = broadcast(offsets.toDF("pid", "bucket", "off"))
    val ww = Window.partitionBy(col("pid"), col("bucket"))
      .orderBy(col("byte_len").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    recs.join(offDf, Seq("pid", "bucket"))
      .withColumn("rk", col("off") + count(lit(1)).over(ww) - 1)
      .select(col("doc_id"), col("width"), col("height"), col("bucket"),
        expr(s"rk div $AspectBatch").as("batch_no"),
        expr(s"rk % $AspectBatch").as("slot"))
  }

  /** m21: INTERLEAVED multimodal sequence packing — the vision-language
    * pretraining shape (Flamingo, Alayrac et al. NeurIPS'22 §2; MM1:
    * interleaved image-text sequences): each sample's budget cost is its
    * text tokens PLUS the patch tokens its image expands to (m04's 8×8
    * grid: ceil(w/8)·ceil(h/8) — a ViT patch embedding consumes sequence
    * positions exactly like text), and samples pack greedily into
    * fixed 2048-token training sequences. c07 packs text alone; the
    * multimodal twist is that the image side DOMINATES the budget for
    * small captions, so per-pack per-modality accounting (text vs patch
    * share, fill rate) is what the curriculum/batching plan consumes.
    * Same streaming-pack idiom as c07: sharded cumulative window, pack
    * boundary at budget multiples — one shuffle per shard key, no global
    * sort, integer arithmetic end-to-end.
    */
  def m21_interleaved_packing(s: SparkSession, d: String): DataFrame =
    interleavedPackingFrom(Tables.documents(s, d))

  /** m21 over an arbitrary (doc_id, text) frame — split out so the spec
    * can plant exact patch-cost and pack-boundary cases.
    */
  private[graft] def interleavedPackingFrom(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048L
    // one scan: the media metadata derives from the same document row as
    // the caption, so no self-join — width/height inline like media()
    val t = documents
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("text_tokens"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"))
      .withColumn("width", lit(1L) + col("byte_len") % 64)
      .withColumn("height", lit(1L) + col("byte_len") % 48)
      .withColumn("image_tokens",
        (expr("(width - 1) DIV 8") + lit(1L)) *
          (expr("(height - 1) DIV 8") + lit(1L)))
      .withColumn("n_tokens", col("text_tokens") + col("image_tokens"))
      .withColumn("shard",
        ((col("doc_id") % 1000003L) * 2654435761L + 421L) % 32L)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) DIV $budget"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("text_tokens")).as("text_tokens"),
        sum(col("image_tokens")).as("image_tokens"),
        sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill_pm", expr(s"pack_tokens * 1000 DIV $budget"))
  }

  /** m22: FORMAT SNIFFING — the first gate of any binary ingest: classify
    * payloads by their magic bytes (JPEG FF D8 FF, PNG 89 50 4E 47, RIFF
    * containers, gzip 1F 8B), never by filename or declared MIME — the
    * mislabeled-extension problem every crawled-media pipeline hits. One
    * scan: 4-byte binary prefix → hex → CASE ladder, then the per-format
    * census (counts, byte mass, size range) a datasheet publishes. The
    * fixture's stub payloads are text bytes, so they all land in the
    * `data` arm and the census keys on the leading hex — the planted
    * spec feeds REAL signatures through the same ladder. Scan-shaped;
    * the agg keys on |formats| + |prefixes| which is vocabulary-bounded.
    */
  def m22_format_sniff(s: SparkSession, d: String): DataFrame =
    formatSniffFrom(media(s, d))

  /** m22 over any (media, byte_len) frame — split out so the spec can
    * plant true JPEG/PNG/RIFF/gzip signatures.
    */
  private[graft] def formatSniffFrom(recs: DataFrame): DataFrame =
    recs.select(col("byte_len"),
      hex(expr("substring(media, 1, 4)")).as("magic"))
      .withColumn("format",
        when(col("magic").startsWith("FFD8FF"), "jpeg")
          .when(col("magic") === "89504E47", "png")
          .when(col("magic") === "52494646", "riff")
          .when(col("magic").startsWith("1F8B"), "gzip")
          .otherwise("data"))
      .groupBy(col("format"), substring(col("magic"), 1, 2).as("lead_byte"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("byte_len")).as("min_bytes"),
        max(col("byte_len")).as("max_bytes"))

  /** m23: SHARD MANIFEST — the WebDataset/tar-shard assembly plan every
    * large multimodal corpus ships as (samples streamed in training order
    * into ~fixed-byte shards; trainers then read whole shards
    * sequentially): each sample's payload bytes accumulate in doc order
    * and a sample opens a new shard when its START crosses the byte
    * budget (c07's start-position rule applied to bytes). m10 bins
    * existing FILES for compaction; this bins SAMPLES into the shard
    * layout to be written. The global byte prefix-sum is the two-phase
    * pid-keyed scan (never a single-reducer window — pinned class);
    * output is the manifest a shard writer executes: samples, bytes,
    * fill, and the contiguous [first_key, last_key] range per shard
    * (contiguity spec-pinned — ranges must tile without overlap).
    */
  def m23_shard_manifest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = 65536L
    val docs = media(s, d).select(col("doc_id"), col("byte_len"))
      .repartitionByRange(32, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid identical in subtotal and window passes
    val subtotals = docs.groupBy(col("pid")).agg(sum(col("byte_len")).as("pb"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val offDf = broadcast(s.createDataFrame(
      subtotals.map(_._1).zip(offsets).toSeq).toDF("pid", "off"))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(offDf, "pid")
      .withColumn("cum", col("off") + sum(col("byte_len")).over(w))
      .withColumn("shard_id", expr(s"(cum - byte_len) DIV $target"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("byte_len")).as("shard_bytes"),
        min(col("doc_id")).as("first_key"),
        max(col("doc_id")).as("last_key"))
      .withColumn("fill_pm", expr(s"shard_bytes * 1000 DIV $target"))
  }

  /** m24: CONTRASTIVE BATCH ASSEMBLY with in-batch FALSE-NEGATIVE repair
    * — CLIP-style training treats every other caption in the batch as a
    * negative, so two near-identical captions in one batch poison the
    * loss (the known false-negative hazard of web-scale pair data). Here
    * (image, caption) pairs = (doc bytes, doc text), near-dup caption key
    * = the 3-token prefix (stand-in for a d03 MinHash key at production),
    * and the training order is deliberately CURRICULUM-like (similar
    * captions adjacent — c18's shape), i.e. the worst case the repair
    * exists for. Batches of 16 fill in order; within a (batch, key) only
    * the FIRST occurrence stays — later ones defer to overflow batches
    * with EXCLUSIVE per-occurrence-class ranges, which provably cannot
    * collide (within one class every caption key appears once; classes
    * never share a batch). Positions come from the m20 two-phase
    * (pid, class) prefix scan — no global-sort reducer at any scale; the
    * per-class batch offsets are a ≤3-row driver fold. Spec pins every
    * emitted batch all-distinct on the key and the overflow machinery
    * actually exercised.
    */
  /** m26: CROSS-IMAGE duplicate-PATCH census — m04's patch grid hashed and
    * joined across documents: which 8-byte tiles repeat in DIFFERENT media
    * payloads (the watermark / logo / letterbox detector — repeated tiles
    * across images are boilerplate pixels a vision-training pipeline
    * crops, exactly as d19 strips repeated LINES from text). Grid comes
    * from m04's geometry; each complete cell is content-hashed
    * (decode-stubbed to payload bytes, the m0x discipline) and the census
    * reports the duplicate-cluster histogram: how many tile hashes appear
    * in n distinct docs, and how many tile instances that covers. Scale
    * shape: one generator scan emits cells, one hash-keyed aggregate
    * clusters them — the d01 economics at tile granularity; the histogram
    * is cluster-bounded.
    */
  def m26_patch_neardup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("bl"))
      .withColumn("width", lit(1L) + col("bl") % 64)
      .withColumn("height", lit(1L) + col("bl") % 48)
      .select(col("doc_id"), col("text"), col("width"),
        explode(expr("sequence(0L, (height - 1) DIV 8)")).as("py"))
      .select(col("doc_id"), col("text"), col("width"), col("py"),
        explode(expr("sequence(0L, (width - 1) DIV 8)")).as("px"))
      .withColumn("patch",
        expr("substring(text, CAST(py * 8 * width + px * 8 + 1 AS INT), 8)"))
      .where(length(col("patch")) === 8)
      .select(col("doc_id"), md5(col("patch")).as("digest"))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= 2)
      .groupBy(col("n_docs"))
      .agg(count(lit(1)).as("n_digests"), sum(col("n_occ")).as("n_patches"))

  /** m27: A/V SYNC recovery — the alignment step a multimodal ingest runs
    * when audio and video tracks may be offset (container mux drift, VAD
    * trims): cross-correlate the two energy series over a small lag
    * window and take the argmax. Ground truth follows the planting
    * discipline: the "video" series is the audio series DELAYED by a
    * known per-doc lag (doc_id mod 5 − 2 — the decode stub standing in
    * for a real second track), and the operator must recover it; the
    * `recovered` audit column rides the hash-gated output. Correlation
    * scores are exact integer dot products over the token-length series
    * (the decode-stub signal — docs are too short for 256-byte frames); each
    * lag is one keyed self-join on (doc, frame index + lag) — lags are
    * keys from a 5-row broadcast, never passes. Docs need ≥ 12 samples for
    * the ±2 window to be meaningful (all fixture docs qualify).
    */
  def m27_av_sync(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("frame_no"),
        length(col("col")).cast("long").as("energy"))
      .createOrReplaceTempView("fe0")
    s.sql(m27Tail("SELECT explode(array(-2, -1, 0, 1, 2)) AS lag"))
  }

  private[operators] def m27Tail(lags: String): String =
    s"""WITH nf AS (SELECT doc_id, count(*) AS n_frames FROM fe0 GROUP BY 1),
       |docs AS (
       |  SELECT doc_id, n_frames, CAST(doc_id % 5 - 2 AS BIGINT) AS planted_lag
       |  FROM nf WHERE n_frames >= 12),
       |a AS (
       |  SELECT f.doc_id, f.frame_no, f.energy, d.n_frames, d.planted_lag
       |  FROM fe0 f JOIN docs d ON d.doc_id = f.doc_id),
       |video AS (
       |  SELECT doc_id, frame_no + planted_lag AS v_no, energy AS v_energy
       |  FROM a WHERE frame_no + planted_lag >= 0
       |          AND frame_no + planted_lag < n_frames),
       |lags AS (SELECT CAST(lag AS BIGINT) AS lag FROM ($lags) ll),
       |sc AS (
       |  SELECT x.doc_id, l.lag, CAST(sum(x.energy * v.v_energy) AS BIGINT)
       |           AS score
       |  FROM a x CROSS JOIN lags l
       |  JOIN video v ON v.doc_id = x.doc_id AND v.v_no = x.frame_no + l.lag
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, lag AS best_lag, score AS peak_score FROM (
       |    SELECT doc_id, lag, score,
       |           row_number() OVER (PARTITION BY doc_id
       |               ORDER BY score DESC, lag) AS rk
       |    FROM sc) t WHERE rk = 1)
       |SELECT d.doc_id, d.n_frames, d.planted_lag, b.best_lag, b.peak_score,
       |       CAST(CASE WHEN b.best_lag = d.planted_lag THEN 1 ELSE 0 END
       |            AS BIGINT) AS recovered
       |FROM docs d JOIN best b ON b.doc_id = d.doc_id""".stripMargin

  /** m25: GATED integrated loudness — EBU R128's two-gate structure over
    * m06's frame energies (decode stubbed to byte levels, the m0x
    * discipline; a real loudness meter replaces only the per-frame level
    * kernel). Per-frame mean level feeds two gates in sequence: an
    * ABSOLUTE gate (level > 90 000 milli-units — R128's −70 LUFS analog)
    * drops silence, then a RELATIVE gate keeps frames within 1% of the
    * ungated-mean (R128's −10 LU analog) — the self-referencing gate is
    * the interesting shape: the threshold is computed FROM the data per
    * document, so the plan is agg → join-back → agg, all keyed on doc_id
    * (one shuffle key family, exchange reusable; never a global pass).
    * Docs failing every gate report the −1 sentinel (R128's −inf).
    * Integer milli-unit arithmetic end to end — hash-checked.
    */
  def m25_gated_loudness(s: SparkSession, d: String): DataFrame = {
    val lv = m06_frame_energy(s, d)
      .select(col("doc_id"), expr("energy * 1000 div frame_bytes").as("level_milli"))
    val absPass = lv.where(col("level_milli") > 90000L)
    val mu1 = absPass.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_abs"),
        expr("sum(level_milli) div count(*)").as("mu1_milli"))
    val gated = absPass.join(mu1, "doc_id")
      .where(col("level_milli") * 100 >= col("mu1_milli") * 99)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rel"),
        expr("sum(level_milli) div count(*)").as("loudness_milli"),
        (max(col("level_milli")) - min(col("level_milli"))).as("range_milli"))
    lv.groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
      .join(mu1, Seq("doc_id"), "left")
      .join(gated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_abs"), lit(0L)).as("n_abs"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("loudness_milli"), lit(-1L)).as("loudness_milli"),
        coalesce(col("range_milli"), lit(-1L)).as("range_milli"))
  }

  def m24_contrastive_batches(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val B = 16L
    val recs = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, 3), ' ')").as("ckey"))
      .repartitionByRange(32, col("ckey"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid identical across subtotal + window passes
    val sub = recs.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = sub.map(_._2).sum
    val nMain = (total + B - 1) / B
    val offDf = broadcast(sub.map(_._1)
      .zip(sub.map(_._2).scanLeft(0L)(_ + _)).toSeq.toDF("pid", "off"))
    val wp = Window.partitionBy(col("pid")).orderBy(col("ckey"), col("doc_id"))
    val pos = recs.join(offDf, "pid")
      .withColumn("p", col("off") + row_number().over(wp) - 1)
      .withColumn("b0", expr(s"p div $B"))
    val wocc = Window.partitionBy(col("b0"), col("ckey")).orderBy(col("p"))
    val flagged = pos.withColumn("occ",
        (row_number().over(wocc) - 1).cast("long"))
      .localCheckpoint()
    val wslot = Window.partitionBy(col("b0")).orderBy(col("p"))
    val clean = flagged.filter(col("occ") === 0)
      .withColumn("slot", (row_number().over(wslot) - 1).cast("long"))
      .select(col("doc_id"), col("ckey"), col("b0").as("batch_no"),
        col("slot"), lit(0L).as("deferred"))
    // occurrence classes get exclusive overflow ranges (driver fold over
    // ≤ max-multiplicity rows)
    val jCounts = flagged.filter(col("occ") > 0)
      .groupBy(col("occ")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = nMain
    val jOff = jCounts.map { case (j, c) =>
      val o = acc; acc += (c + B - 1) / B; (j, o)
    }
    val jDf = broadcast(jOff.toSeq.toDF("occ", "joff"))
    val sub2 = flagged.filter(col("occ") > 0)
      .groupBy(col("pid"), col("occ")).agg(count(lit(1)).as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val off2 = sub2.groupBy(_._2).toSeq.flatMap { case (j, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, o) => (pid, j, o) }
    }
    val off2Df = broadcast(off2.toDF("pid", "occ", "doff"))
    val wd = Window.partitionBy(col("pid"), col("occ"))
      .orderBy(col("ckey"), col("doc_id"))
    val deferred = flagged.filter(col("occ") > 0)
      .join(off2Df, Seq("pid", "occ")).join(jDf, "occ")
      .withColumn("dp", col("doff") + row_number().over(wd) - 1)
      .select(col("doc_id"), col("ckey"),
        (col("joff") + expr(s"dp div $B")).as("batch_no"),
        expr(s"dp % $B").as("slot"), lit(1L).as("deferred"))
    clean.unionByName(deferred)
      .select(col("doc_id"), col("batch_no"), col("slot"), col("deferred"))
  }

  val queries: Map[String, Q] = Map(
    "m27_av_sync" -> (m27_av_sync _),
    "m26_patch_neardup" -> (m26_patch_neardup _),
    "m25_gated_loudness" -> (m25_gated_loudness _),
    "m24_contrastive_batches" -> (m24_contrastive_batches _),
    "m23_shard_manifest" -> (m23_shard_manifest _),
    "m22_format_sniff" -> (m22_format_sniff _),
    "m21_interleaved_packing" -> (m21_interleaved_packing _),
    "m20_aspect_buckets" -> (m20_aspect_buckets _),
    "m17_entropy_gate" -> (m17_entropy_gate _),
    "m16_vad_segments" -> (m16_vad_segments _),
    "m15_dhash_neardup" -> (m15_dhash_neardup _),
    "m12_delta_transfer" -> (m12_delta_transfer _),
    "m11_cdc_chunks" -> (m11_cdc_chunks _),
    "m09_feature_neardup" -> (m09_feature_neardup _),
    "m18_media_clusters" -> (m18_media_clusters _),
    "m19_keyframes" -> (m19_keyframes _),
    "m13_visual_search" -> (m13_visual_search _),
    "m14_shot_boundaries" -> (m14_shot_boundaries _),
    "m08_media_dedup" -> (m08_media_dedup _),
    "m10_compaction_plan" -> (m10_compaction_plan _),
    "m07_binary_ingest" -> (m07_binary_ingest _),
    "m01_media_meta" -> (m01_media_meta _),
    "m02_frame_sample" -> (m02_frame_sample _),
    "m03_byte_features" -> (m03_byte_features _),
    "m04_patch_grid" -> (m04_patch_grid _),
    "m05_arrow_features" -> (m05_arrow_features _),
    "m06_frame_energy" -> (m06_frame_energy _),
  )

  val oracles: Map[String, String] = Map(
    "m24_contrastive_batches" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         list_aggregate(string_split(text, ' ')[1:3],
        |                        'string_agg', ' ') AS ckey
        |  FROM documents),
        |pos AS (SELECT doc_id, ckey,
        |               row_number() OVER (ORDER BY ckey, doc_id) - 1 AS p
        |        FROM base),
        |b AS (SELECT *, p // 16 AS b0 FROM pos),
        |f AS (SELECT *, row_number() OVER (PARTITION BY b0, ckey
        |                                   ORDER BY p) - 1 AS occ
        |      FROM b),
        |nmain AS (SELECT (count(*) + 15) // 16 AS nm FROM base),
        |clean AS (
        |  SELECT doc_id, b0 AS batch_no,
        |         row_number() OVER (PARTITION BY b0 ORDER BY p) - 1 AS slot,
        |         0 AS deferred
        |  FROM f WHERE occ = 0),
        |jc AS (SELECT occ, count(*) AS c FROM f WHERE occ > 0 GROUP BY 1),
        |joff AS (
        |  SELECT occ, nm + coalesce(sum((c + 15) // 16) OVER
        |    (ORDER BY occ ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND 1 PRECEDING), 0) AS joff
        |  FROM jc CROSS JOIN nmain),
        |defr AS (
        |  SELECT f.doc_id,
        |         j.joff + ((row_number() OVER (PARTITION BY f.occ
        |            ORDER BY f.ckey, f.doc_id) - 1) // 16) AS batch_no,
        |         (row_number() OVER (PARTITION BY f.occ
        |            ORDER BY f.ckey, f.doc_id) - 1) % 16 AS slot,
        |         1 AS deferred
        |  FROM f JOIN joff j ON j.occ = f.occ
        |  WHERE f.occ > 0)
        |SELECT doc_id, CAST(batch_no AS BIGINT) AS batch_no,
        |       CAST(slot AS BIGINT) AS slot,
        |       CAST(deferred AS BIGINT) AS deferred
        |FROM clean
        |UNION ALL
        |SELECT doc_id, CAST(batch_no AS BIGINT), CAST(slot AS BIGINT),
        |       CAST(deferred AS BIGINT)
        |FROM defr""".stripMargin,
    "m23_shard_manifest" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, byte_len,
        |         CAST(sum(byte_len) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum
        |  FROM m),
        |sh AS (
        |  SELECT doc_id, byte_len,
        |         (cum - byte_len) // 65536 AS shard_id
        |  FROM p)
        |SELECT shard_id, count(*) AS n_samples,
        |       CAST(sum(byte_len) AS BIGINT) AS shard_bytes,
        |       min(doc_id) AS first_key, max(doc_id) AS last_key,
        |       CAST(sum(byte_len) AS BIGINT) * 1000 // 65536 AS fill_pm
        |FROM sh GROUP BY 1""".stripMargin,
    "m22_format_sniff" ->
      """WITH m AS (
        |  SELECT CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         upper(substring(hex(encode(text)), 1, 8)) AS magic
        |  FROM documents),
        |f AS (
        |  SELECT byte_len, magic,
        |         CASE WHEN magic LIKE 'FFD8FF%' THEN 'jpeg'
        |              WHEN magic = '89504E47' THEN 'png'
        |              WHEN magic = '52494646' THEN 'riff'
        |              WHEN magic LIKE '1F8B%' THEN 'gzip'
        |              ELSE 'data' END AS format
        |  FROM m)
        |SELECT format, magic[1:2] AS lead_byte, count(*) AS n_files,
        |       CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        |       CAST(min(byte_len) AS BIGINT) AS min_bytes,
        |       CAST(max(byte_len) AS BIGINT) AS max_bytes
        |FROM f GROUP BY 1, 2""".stripMargin,
    "m21_interleaved_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS text_tokens,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         ((doc_id % 1000003) * 2654435761 + 421) % 32 AS shard
        |  FROM documents),
        |m AS (
        |  SELECT shard, doc_id, text_tokens,
        |         ((1 + byte_len % 64 - 1) // 8 + 1)
        |           * ((1 + byte_len % 48 - 1) // 8 + 1) AS image_tokens
        |  FROM t),
        |p AS (
        |  SELECT shard, text_tokens, image_tokens,
        |         text_tokens + image_tokens AS n_tokens,
        |         CAST((CAST(sum(text_tokens + image_tokens) OVER (
        |            PARTITION BY shard ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          - (text_tokens + image_tokens)) // 2048 AS BIGINT) AS pack_id
        |  FROM m)
        |SELECT shard, pack_id, count(*) AS n_samples,
        |       CAST(sum(text_tokens) AS BIGINT) AS text_tokens,
        |       CAST(sum(image_tokens) AS BIGINT) AS image_tokens,
        |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |       CAST(sum(n_tokens) AS BIGINT) * 1000 // 2048 AS fill_pm
        |FROM p GROUP BY 1, 2""".stripMargin,
    "m20_aspect_buckets" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         1 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width,
        |         1 + CAST(octet_length(encode(text)) AS BIGINT) % 48 AS height
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, byte_len, width, height,
        |         list_sort([{'dist': abs((width * 100) // height - 50), 'b': 50},
        |                    {'dist': abs((width * 100) // height - 75), 'b': 75},
        |                    {'dist': abs((width * 100) // height - 100), 'b': 100},
        |                    {'dist': abs((width * 100) // height - 133), 'b': 133},
        |                    {'dist': abs((width * 100) // height - 200), 'b': 200}]
        |           )[1].b AS bucket
        |  FROM m),
        |r AS (
        |  SELECT doc_id, width, height, CAST(bucket AS BIGINT) AS bucket,
        |         row_number() OVER (PARTITION BY bucket
        |           ORDER BY byte_len DESC, doc_id) - 1 AS rk
        |  FROM b)
        |SELECT doc_id, width, height, bucket,
        |       CAST(rk // 8 AS BIGINT) AS batch_no,
        |       CAST(rk % 8 AS BIGINT) AS slot
        |FROM r""".stripMargin,
    "m17_entropy_gate" -> m17Sql(
      "SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents", "//"),
    "m16_vad_segments" ->
      s"""WITH fe AS ($frameEnergyOracle),
         |act AS (
         |  SELECT doc_id, frame_no, energy,
         |         frame_no - row_number() OVER (PARTITION BY doc_id
         |                                       ORDER BY frame_no) AS island
         |  FROM fe WHERE energy * 10 >= frame_bytes * 950)
         |SELECT doc_id,
         |       CAST(min(frame_no) AS BIGINT) AS seg_start,
         |       CAST(max(frame_no) AS BIGINT) AS seg_end,
         |       CAST(count(*) AS BIGINT) AS n_frames,
         |       CAST(sum(energy) AS BIGINT) AS seg_energy
         |FROM act GROUP BY doc_id, island
         |HAVING count(*) >= 2""".stripMargin,
    "m15_dhash_neardup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |allrows AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 10000000,
        |         substring(text, 1, length(text) - 1)
        |           || upper(substring(text, length(text), 1))
        |  FROM base),
        |c AS (SELECT doc_id, hex(encode(text)) AS h,
        |             octet_length(encode(text)) AS nb FROM allrows),
        |b AS (
        |  SELECT doc_id, nb,
        |         list_transform(range(1, nb + 1),
        |           i -> (strpos('0123456789ABCDEF', h[2*i-1:2*i-1]) - 1) * 16
        |                + (strpos('0123456789ABCDEF', h[2*i:2*i]) - 1)) AS bytes
        |  FROM c),
        |sg AS (
        |  SELECT doc_id,
        |         list_transform(range(0, 64), i ->
        |           coalesce(list_sum(bytes[(i*nb)//64 + 1:((i+1)*nb)//64]), 0)) AS sums,
        |         list_transform(range(0, 64), i ->
        |           ((i+1)*nb)//64 - (i*nb)//64) AS lens
        |  FROM b),
        |hs AS (
        |  SELECT doc_id,
        |         CAST(coalesce(list_sum(list_transform(range(0, 63), i ->
        |           CASE WHEN sums[i+2] * lens[i+1] > sums[i+1] * lens[i+2]
        |                THEN (1::BIGINT << i) ELSE 0 END)), 0) AS BIGINT) AS dh
        |  FROM sg),
        |bb AS (
        |  SELECT doc_id, dh, j, (dh >> (21*j)) & 2097151 AS band
        |  FROM (SELECT doc_id, dh, unnest(generate_series(0, 2)) AS j FROM hs) t),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, a.dh AS ha, b.doc_id AS doc_b, b.dh AS hb
        |  FROM bb a JOIN bb b ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 6""".stripMargin,
    "m12_delta_transfer" -> {
      // one CDC fp pipeline per corpus version (DuckDB has no macros in
      // this dialect path — the duplication is mechanical)
      def cdcCte(src: String, p: String) =
        s"""${p}c AS (
           |  SELECT doc_id, text, length(text) AS n,
           |         list_transform(range(1, length(text) + 1),
           |                        i -> ord(text[i:i])) AS codes
           |  FROM $src),
           |${p}b AS (
           |  SELECT doc_id, text,
           |         list_sort(list_distinct(list_concat(
           |           list_filter(range(8, n + 1), i ->
           |             list_sum(list_transform(range(0, 8), j ->
           |               codes[i - j] * ([1, 31, 961, 29791, 923521,
           |                 28629151, 887503681, 27512614111])[j + 1]))
           |             % 64 = 0),
           |           [n]))) AS bnds
           |  FROM ${p}c),
           |${p}e AS (SELECT doc_id, text, unnest(bnds) AS bnd FROM ${p}b),
           |${p}f AS (
           |  SELECT md5(text[coalesce(lag(bnd) OVER w, 0) + 1:bnd]) AS fp,
           |         CAST(bnd - coalesce(lag(bnd) OVER w, 0) AS BIGINT) AS len
           |  FROM ${p}e WINDOW w AS (PARTITION BY doc_id ORDER BY bnd))"""
          .stripMargin
      def fixedCte(src: String, p: String) =
        s"""${p}f AS (
           |  SELECT md5(text[i * 64 + 1:least((i + 1) * 64, length(text))])
           |           AS fp,
           |         CAST(least(64, length(text) - i * 64) AS BIGINT) AS len
           |  FROM (SELECT text,
           |               unnest(generate_series(0,
           |                 (length(text) - 1) // 64)) AS i
           |        FROM $src))""".stripMargin
      def summary(scheme: String, v1p: String, v2p: String) =
        s"""SELECT '$scheme' AS scheme, s.n_chunks, s.total_bytes,
           |       u.n_new, u.new_bytes,
           |       round(u.new_bytes / CAST(s.total_bytes AS DOUBLE), 9)
           |         AS transfer_ratio
           |FROM (SELECT count(*) AS n_chunks,
           |             CAST(sum(len) AS BIGINT) AS total_bytes
           |      FROM (SELECT fp, max(len) AS len FROM ${v2p}f GROUP BY 1)) s
           |CROSS JOIN
           |     (SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_new,
           |             CAST(coalesce(sum(len), 0) AS BIGINT) AS new_bytes
           |      FROM (SELECT fp, max(len) AS len FROM ${v2p}f GROUP BY 1) x
           |      ANTI JOIN (SELECT DISTINCT fp FROM ${v1p}f) k
           |        USING (fp)) u""".stripMargin
      s"""WITH v1 AS (SELECT doc_id, text FROM documents),
         |v2 AS (SELECT doc_id,
         |              CASE WHEN doc_id % 10 = 0 THEN 'Z ' || text
         |                   ELSE text END AS text
         |       FROM documents),
         |${cdcCte("v1", "a")},
         |${cdcCte("v2", "b")},
         |${fixedCte("v1", "x")},
         |${fixedCte("v2", "y")}
         |${summary("cdc", "a", "b")}
         |UNION ALL
         |${summary("fixed", "x", "y")}""".stripMargin
    },
    "m11_cdc_chunks" ->
      """WITH c AS (
        |  SELECT doc_id, text, length(text) AS n,
        |         list_transform(range(1, length(text) + 1),
        |                        i -> ord(text[i:i])) AS codes
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, text,
        |         list_sort(list_distinct(list_concat(
        |           list_filter(range(8, n + 1), i ->
        |             list_sum(list_transform(range(0, 8), j ->
        |               codes[i - j] * ([1, 31, 961, 29791, 923521, 28629151,
        |                                887503681, 27512614111])[j + 1]))
        |             % 64 = 0),
        |           [n]))) AS bnds
        |  FROM c),
        |e AS (SELECT doc_id, text, unnest(bnds) AS bnd FROM b),
        |sp AS (
        |  SELECT doc_id, text, bnd,
        |         coalesce(lag(bnd) OVER w, 0) AS prev,
        |         CAST(row_number() OVER w AS BIGINT) AS chunk_idx
        |  FROM e WINDOW w AS (PARTITION BY doc_id ORDER BY bnd)),
        |fp AS (
        |  SELECT doc_id, chunk_idx, CAST(prev + 1 AS BIGINT) AS chunk_start,
        |         CAST(bnd - prev AS BIGINT) AS chunk_len,
        |         md5(text[prev + 1:bnd]) AS chunk_fp
        |  FROM sp)
        |SELECT doc_id, chunk_idx, chunk_start, chunk_len, chunk_fp,
        |       count(*) OVER (PARTITION BY chunk_fp) AS n_copies
        |FROM fp""".stripMargin,
    // the one oracle with a literal path: read_blob has no table-view
    // indirection, and the driver's correctness gate always runs at sf0.01
    "m09_feature_neardup" -> featureNeardupOracle,
    "m18_media_clusters" ->
      s"""WITH RECURSIVE feat AS ($byteFeaturesOracle),
         |g AS (SELECT *, f0 + f1 + f2 + f3 AS t,
         |             (f0 + f1 + f2 + f3) // 64 AS bucket FROM feat),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         abs(a.f0*b.t - b.f0*a.t) + abs(a.f1*b.t - b.f1*a.t)
         |       + abs(a.f2*b.t - b.f2*a.t) + abs(a.f3*b.t - b.f3*a.t) AS l1x,
         |         a.t AS ta, b.t AS tb
         |  FROM g a JOIN g b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |pairs AS (SELECT doc_a, doc_b FROM p WHERE l1x * 50 <= ta * tb),
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
         |  FROM reach GROUP BY doc_id)
         |SELECT doc_id, cluster_rep FROM cc""".stripMargin,
    "m13_visual_search" -> visualSearchOracle,
    "m10_compaction_plan" ->
      """WITH f AS (
        |  SELECT regexp_extract(filename, '[^/]+$') AS file_name,
        |         size AS length
        |  FROM read_blob('/root/testdata/sf0.01/*.parquet')),
        |c AS (
        |  SELECT file_name, length,
        |         sum(length) OVER (ORDER BY file_name) AS cum FROM f)
        |SELECT CAST((cum - 1) // 262144 AS BIGINT) AS bin,
        |       count(*) AS n_files,
        |       CAST(sum(length) AS BIGINT) AS bin_bytes,
        |       min(file_name) AS first_file, max(file_name) AS last_file
        |FROM c GROUP BY 1""".stripMargin,
    "m08_media_dedup" ->
      """WITH f AS (
        |  SELECT regexp_extract(filename, '[^/]+$') AS file_name,
        |         size AS length, md5(hex(content)) AS digest
        |  FROM read_blob('/root/testdata/sf0.01/*.parquet')),
        |b AS (SELECT 'a' AS collection, * FROM f
        |      UNION ALL SELECT 'b', * FROM f)
        |SELECT digest, count(*) AS n_copies,
        |       min(collection || '/' || file_name) AS canonical,
        |       CAST(sum(length) AS BIGINT) AS total_bytes
        |FROM b GROUP BY digest""".stripMargin,
    "m07_binary_ingest" ->
      """SELECT regexp_extract(filename, '[^/]+$') AS file_name,
        |       size AS length,
        |       octet_length(content) > 0
        |         AND substring(CAST(content AS VARCHAR), 1, 4) = 'PAR1' AS magic_ok
        |FROM read_blob('/root/testdata/sf0.01/*.parquet')""".stripMargin,
    "m04_patch_grid" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         1 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width,
        |         1 + CAST(octet_length(encode(text)) AS BIGINT) % 48 AS height
        |  FROM documents),
        |py AS (
        |  SELECT doc_id, width, unnest(generate_series(0, (height - 1) // 8)) AS py
        |  FROM m),
        |px AS (
        |  SELECT doc_id, width, py, unnest(generate_series(0, (width - 1) // 8)) AS px
        |  FROM py)
        |SELECT doc_id, py, px, py * 8 * width + px * 8 AS patch_offset
        |FROM px""".stripMargin,
    "m01_media_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       1 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width,
        |       1 + CAST(octet_length(encode(text)) AS BIGINT) % 48 AS height,
        |       1 + CAST(octet_length(encode(text)) AS BIGINT) % 7 AS n_frames
        |FROM documents""".stripMargin,
    "m02_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         1 + CAST(octet_length(encode(text)) AS BIGINT) % 7 AS n_frames
        |  FROM documents)
        |SELECT doc_id,
        |       unnest(generate_series(0, n_frames - 1)) AS frame_idx,
        |       unnest(generate_series(0, n_frames - 1)) * (byte_len // n_frames)
        |         AS frame_offset
        |FROM m""".stripMargin,
    "m03_byte_features" -> byteFeaturesOracle,
    // m05 is m03's kernel re-expressed over Arrow batches — same rows,
    // same oracle (each check must be self-contained; the string is shared)
    "m05_arrow_features" -> byteFeaturesOracle,
    "m06_frame_energy" -> frameEnergyOracle,
    "m27_av_sync" -> {
      val tail = m27Tail("SELECT unnest([-2, -1, 0, 1, 2]) AS lag")
      s"""WITH fe0 AS (
         |  SELECT doc_id,
         |         CAST(generate_subscripts(toks, 1) - 1 AS BIGINT)
         |           AS frame_no,
         |         CAST(unnest(list_transform(toks, t -> length(t))) AS BIGINT)
         |           AS energy
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
         |        FROM documents) d0),
         |${tail.stripPrefix("WITH ")}""".stripMargin
    },
    "m26_patch_neardup" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |         1 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width,
        |         1 + CAST(octet_length(encode(text)) AS BIGINT) % 48 AS height
        |  FROM documents),
        |py AS (SELECT doc_id, text, width,
        |              unnest(generate_series(0, (height - 1) // 8)) AS py
        |       FROM m),
        |px AS (SELECT doc_id, text, width, py,
        |              unnest(generate_series(0, (width - 1) // 8)) AS px
        |       FROM py),
        |pt AS (SELECT doc_id,
        |              substr(text, CAST(py * 8 * width + px * 8 + 1 AS INT), 8)
        |                AS patch
        |       FROM px),
        |f AS (SELECT doc_id, md5(patch) AS digest FROM pt
        |      WHERE length(patch) = 8),
        |cl AS (SELECT digest, count(*) AS n_occ,
        |              count(DISTINCT doc_id) AS n_docs
        |       FROM f GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
        |SELECT CAST(n_docs AS BIGINT) AS n_docs, count(*) AS n_digests,
        |       CAST(sum(n_occ) AS BIGINT) AS n_patches
        |FROM cl GROUP BY 1""".stripMargin,

    "m25_gated_loudness" ->
      s"""WITH fe AS ($frameEnergyOracle),
        |lv AS (SELECT doc_id, energy * 1000 // frame_bytes AS level_milli FROM fe),
        |ap AS (SELECT * FROM lv WHERE level_milli > 90000),
        |mu AS (
        |  SELECT doc_id, count(*) AS n_abs,
        |         sum(level_milli) // count(*) AS mu1_milli
        |  FROM ap GROUP BY 1),
        |g AS (
        |  SELECT a.doc_id, count(*) AS n_rel,
        |         sum(a.level_milli) // count(*) AS loudness_milli,
        |         max(a.level_milli) - min(a.level_milli) AS range_milli
        |  FROM ap a JOIN mu m ON a.doc_id = m.doc_id
        |  WHERE a.level_milli * 100 >= m.mu1_milli * 99
        |  GROUP BY 1),
        |fr AS (SELECT doc_id, count(*) AS n_frames FROM lv GROUP BY 1)
        |SELECT fr.doc_id, fr.n_frames,
        |       CAST(coalesce(mu.n_abs, 0) AS BIGINT) AS n_abs,
        |       CAST(coalesce(g.n_rel, 0) AS BIGINT) AS n_rel,
        |       CAST(coalesce(g.loudness_milli, -1) AS BIGINT) AS loudness_milli,
        |       CAST(coalesce(g.range_milli, -1) AS BIGINT) AS range_milli
        |FROM fr LEFT JOIN mu ON fr.doc_id = mu.doc_id
        |LEFT JOIN g ON fr.doc_id = g.doc_id""".stripMargin,
    "m19_keyframes" ->
      s"""WITH fe AS ($frameEnergyOracle),
        |l AS (
        |  SELECT doc_id, frame_no, frame_bytes, energy,
        |         lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_no) AS pe,
        |         lag(frame_bytes) OVER (PARTITION BY doc_id ORDER BY frame_no) AS pb
        |  FROM fe),
        |c AS (
        |  SELECT doc_id, frame_no, energy,
        |         CASE WHEN pe IS NOT NULL
        |               AND abs(energy * pb - pe * frame_bytes) * 5
        |                   >= pe * frame_bytes
        |              THEN 1 ELSE 0 END AS is_cut
        |  FROM l),
        |sh AS (
        |  SELECT doc_id, frame_no, energy,
        |         CAST(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_no)
        |              AS BIGINT) AS shot_no
        |  FROM c)
        |SELECT doc_id, shot_no, frame_no AS keyframe_no, energy FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id, shot_no
        |              ORDER BY energy DESC, frame_no) AS rk
        |  FROM sh) t
        |WHERE rk = 1""".stripMargin,
    "m14_shot_boundaries" ->
      s"""WITH fe AS ($frameEnergyOracle),
        |l AS (
        |  SELECT doc_id, frame_no, frame_bytes, energy,
        |         lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_no) AS pe,
        |         lag(frame_bytes) OVER (PARTITION BY doc_id ORDER BY frame_no) AS pb
        |  FROM fe)
        |SELECT doc_id, frame_no, energy, CAST(pe AS BIGINT) AS prev_energy
        |FROM l
        |WHERE pe IS NOT NULL
        |  AND abs(energy * pb - pe * frame_bytes) * 5 >= pe * frame_bytes""".stripMargin,
  )

  // byte-based like the Spark kernels (UTF-8 bytes, not codepoints — the
  // two diverge on any non-ASCII text): DuckDB has no byte accessor for
  // BLOBs, but byte % 4 == (low hex nibble) % 4, so index the hex dump
  private lazy val byteFeaturesOracle: String =
    """WITH c AS (
      |  SELECT doc_id, hex(encode(text)) AS h,
      |         octet_length(encode(text)) AS nb
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |         list_transform(range(1, nb + 1),
      |           i -> (strpos('0123456789ABCDEF', h[2*i:2*i]) - 1) % 4) AS cs
      |  FROM c)
      |SELECT doc_id,
      |       CAST(len(list_filter(cs, x -> x = 0)) AS BIGINT) AS f0,
      |       CAST(len(list_filter(cs, x -> x = 1)) AS BIGINT) AS f1,
      |       CAST(len(list_filter(cs, x -> x = 2)) AS BIGINT) AS f2,
      |       CAST(len(list_filter(cs, x -> x = 3)) AS BIGINT) AS f3
      |FROM b""".stripMargin

  private lazy val frameEnergyOracle: String =
    """WITH c AS (
      |  SELECT doc_id, hex(encode(text)) AS h,
      |         octet_length(encode(text)) AS nb
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, h, nb,
      |         unnest(generate_series(0, (nb - 1) // 256)) AS frame_no
      |  FROM c WHERE nb > 0),
      |b AS (
      |  SELECT doc_id, frame_no,
      |         list_transform(
      |           range(256 * frame_no + 1, least(256 * frame_no + 256, nb) + 1),
      |           i -> (strpos('0123456789ABCDEF', h[2*i-1:2*i-1]) - 1) * 16
      |                + (strpos('0123456789ABCDEF', h[2*i:2*i]) - 1)) AS bytes
      |  FROM f)
      |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
      |       CAST(len(bytes) AS BIGINT) AS frame_bytes,
      |       CAST(list_sum(bytes) AS BIGINT) AS energy,
      |       CAST(list_max(bytes) AS BIGINT) AS peak
      |FROM b""".stripMargin

  private lazy val visualSearchOracle: String =
    s"""WITH feat AS ($byteFeaturesOracle),
       |g AS (SELECT *, f0 + f1 + f2 + f3 AS t FROM feat),
       |q AS (SELECT doc_id AS q_id, f0 AS q0, f1 AS q1, f2 AS q2, f3 AS q3,
       |             t AS qt
       |      FROM g WHERE doc_id % 97 = 0),
       |p AS (
       |  SELECT q.q_id, g.doc_id,
       |         abs(q.q0*g.t - g.f0*q.qt) + abs(q.q1*g.t - g.f1*q.qt)
       |       + abs(q.q2*g.t - g.f2*q.qt) + abs(q.q3*g.t - g.f3*q.qt) AS l1x,
       |         q.qt, g.t
       |  FROM q JOIN g ON g.doc_id <> q.q_id),
       |sc AS (SELECT q_id, doc_id,
       |              CAST(l1x AS DOUBLE) / (qt * t) AS dist FROM p)
       |SELECT q_id, doc_id, dist FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY dist, doc_id) AS rk FROM sc) r
       |WHERE rk <= 5""".stripMargin

  private lazy val featureNeardupOracle: String =
    s"""WITH feat AS ($byteFeaturesOracle),
       |g AS (SELECT *, f0 + f1 + f2 + f3 AS t,
       |             (f0 + f1 + f2 + f3) // 64 AS bucket FROM feat),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         abs(a.f0*b.t - b.f0*a.t) + abs(a.f1*b.t - b.f1*a.t)
       |       + abs(a.f2*b.t - b.f2*a.t) + abs(a.f3*b.t - b.f3*a.t) AS l1x,
       |         a.t AS ta, b.t AS tb
       |  FROM g a JOIN g b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, l1x FROM p WHERE l1x * 50 <= ta * tb""".stripMargin
}
