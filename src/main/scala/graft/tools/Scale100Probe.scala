package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** 100× scale evidence for the PAIR-GENERATOR tails (round-8 verdict
  * item 5): d17 exact substring spans, d24 PPJoin, d32 AllPairs cosine,
  * s36 bitext margins — the audited bench tail whose candidate-bound
  * arguments previously stopped at the 10× probe. Round 10 adds d13
  * star-contraction (d10's at-scale connected-components remedy).
  *
  *   runMain graft.tools.Scale100Probe [d17,d32,...]
  *
  * Corpus design — and the honesty caveat the 10× probe recorded, solved
  * differently here: naive replication DENSIFIES near-dup structure (100
  * verbatim clones put every gram at df=100, which d17's 2..16 pair band
  * and the prefix filters treat as boilerplate — the probe would measure
  * an EMPTY pair phase). Instead each original doc spawns 50 FAMILIES OF
  * 2: copies 2j and 2j+1 share text that is word-prefixed with the family
  * id (`f<j>x<word>`), so every character 40-gram and word shingle is
  * shared EXACTLY within its family (df=2 — inside every operator's pair
  * band) and shared nowhere else. The result: 100× the scan volume, pair
  * structure that grows LINEARLY with the corpus (250k families × C(2,2)
  * pairs), and zero cross-family candidate pollution — i.e. the shape the
  * candidate-bound math claims to survive. A knee (wall growing ≫ scan +
  * output) is exactly what this run would expose.
  *
  * Embeddings replicate by vec_id offset (labels/vectors unchanged):
  * s36's side-B corpus deepens 100× under the same fixed 400-query side,
  * so its cross-score stage must grow linearly in |B| and the k-bounded
  * margin joins must stay flat.
  */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val base = "/root/testdata/sf0.1"
    // GRAFT_PROBE_SCALE picks the clone count (default 100). The 25×
    // intermediate point exists because two operators' honest 100× cost
    // EXCEEDS ONE BOX: d32/d17 shuffle their corpus-sized gram frames
    // through ~10 stages, so cumulative shuffle bytes grow linearly with
    // the corpus (the right curve!) but 100× sf0.1 ≈ 70+ GB of concurrent
    // shuffle files — past this container's disk. Measuring 1× → 25×
    // confirms the linear curve; the 100× disk wall is a single-node
    // capacity fact, not an algorithmic knee (a 1000-executor cluster
    // holds 100× sf0.1's shuffle trivially).
    val scale = sys.env.getOrElse("GRAFT_PROBE_SCALE", "100").toInt
    val big = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_probe_sf1x$scale").toString
    val only: Option[Seq[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSeq) else None
    def want(name: String): Boolean = only.forall(_.exists(name.contains))

    val marker = new java.io.File(big, "_complete")
    if (!marker.exists()) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      // copy tagging: within each group of ten copies, copies 0 and 1
      // share a pair tag (true near-duplicate twins, df=2 grams) and
      // copies 2..9 get per-copy unique tags — so ~20% of the corpus has
      // a near-dup twin and ~80% is unique text. (The first cut paired
      // EVERY copy, which at scale made EVERY gram df>=2: d17/d32's
      // survivor pruning — the thing that makes them scale — was
      // structurally defeated by the probe corpus itself, and AQE even
      // tried to broadcast the "tiny" survivor list. Real corpora are
      // mostly unique text; the probe must be too.)
      (0 until scale).map { i =>
        val tag = if (i % 10 < 2) s"p${i / 10}" else s"u$i"
        docs
          .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", expr(
            s"array_join(transform(split(text, ' '), w -> concat('f${tag}x', w)), ' ')"))
      }.reduce(_ unionByName _)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until scale).map(i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
      marker.createNewFile()
    }

    val meter = new ProbeMetrics(spark)
    // release pinned checkpoint blocks after EVERY entry (the Bench/
    // StoreProbe discipline): at the 100× leg one entry's cached frames
    // are a double-digit-GB storage tenant, and a later entry timed
    // against that occupied store measures eviction, not the operator
    def time(name: String)(f: => Long): Unit =
      if (want(name)) {
        meter.timed("probe100", name)(f)
        graft.Checkpoints.releaseAll(spark)
        // deep-scale legs leave tens of GB of shuffle files that the
        // ContextCleaner only reaps when the referencing plans are GC'd
        // (periodic GC defaults to 30 min) — force it so entry N+1 gets
        // the disk entry N was measured with
        System.gc()
      }

    // THE measured knee from the first 100× run: with the sf0.1-sized 32
    // shuffle partitions, d32's per-partition external sorts (50M-row gram
    // table through the prefix window + candidate joins) spilled >50 GB
    // and ran past the disk budget — the knob a real 100× deployment turns
    // is partition count (smaller per-partition sorts fit in memory), so
    // the 100× leg runs at 512, exactly as the brief's "size
    // shuffle.partitions to the target SF" rule prescribes.
    for ((sf, tag, parts) <- Seq((base, "1x  ", 32),
        (big, s"${scale}x", math.max(64, scale * 5)))) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"$tag d13_dedup_clusters_star")(
        // d10's 100 TB remedy (round 10, verdict item 5): star-contraction
        // connected components over the near-dup pairs — O(log n) rounds
        // vs d10's O(diameter) label propagation. The families-of-2 corpus
        // keeps every cluster a 2-clique, so cluster count must grow
        // linearly and round count stay FLAT across the legs.
        graft.operators.DedupQueries.d13_dedup_clusters_star(spark, sf).count())
      time(s"$tag d17_substring_spans")(
        graft.operators.DedupQueries.d17_substring_spans(spark, sf).count())
      time(s"$tag d24_ppjoin")(
        graft.operators.DedupQueries.d24_ppjoin(spark, sf).count())
      time(s"$tag d32_allpairs_cosine")(
        graft.operators.DedupQueries.d32_allpairs_cosine(spark, sf).count())
      time(s"$tag s36_bitext_margin")(
        graft.operators.SimilarityQueries.s36_bitext_margin(spark, sf).count())
    }
    spark.stop()
  }
}
