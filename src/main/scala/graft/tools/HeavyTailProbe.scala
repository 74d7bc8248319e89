package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Round-11 probe campaign — the four fronts the round-10 verdict left
  * unprobed:
  *
  *  1. t17 BPE training's generational checkpoint chain: wall AND peak
  *     pinned-block bytes at 1× vs the deep leg — the eager gen-release
  *     must keep the pinned footprint ~one generation (flat in round
  *     count), where the old code pinned all 8 corpus-sized generations.
  *  2. d11 incremental dedup through its persisted corpus index: cold
  *     (index build + probe) vs warm (probe-only) — warm cost must track
  *     the batch kernel + probe join, never a corpus re-shingle.
  *  6. The relational heavy-tail (verdict item 6): q60 rolling distinct
  *     actives, q65/q83 sketch rollups from stored partials, q133-q135
  *     bucketed/partitioned/salted layouts — the q-family's
  *     scale-sensitive entries, previously unprobed past bench SF.
  *  7. The publish path (verdict item 7): `publishRegistry` over the 10
  *     heaviest BENCH_r10 operators at the deep leg — bounded-parallel
  *     dispatch + cell guard + sheets spool under real memory pressure.
  *
  *   runMain graft.tools.HeavyTailProbe [t17,d11,q60,...,publish]
  *
  * GRAFT_PROBE_SCALE picks the clone count (default 25). Run with
  * SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g (the Scale100Probe lesson:
  * deep legs die in local[4]/8g defaults).
  *
  * Corpus design per table (all linear-structure replication — the
  * Scale100Probe/StoreProbe lessons about densification):
  *  - documents: families-of-2 word-prefix tags (~20% of copies have a
  *    near-dup twin, 80% unique; cross-clone shingles distinct so pair
  *    structure and BPE pair counts grow LINEARLY with the corpus);
  *  - events: user_id/event_id offset per clone — same day spine, 25×
  *    the users, so q60's window fan-out and q65's per-day sketches see
  *    25× cardinality under an unchanged day count;
  *  - lineitem/orders: disjoint join-key offsets (orderkey, suppkey,
  *    custkey) — clones add orders instead of multiplying per-order pair
  *    counts; l_partkey is deliberately NOT offset so q135's part join
  *    keeps its fan-in (the hot-key shape salting exists for);
  *  - embeddings + small dims copied 1× (fresh mtimes orphan stale
  *    stores, the StoreProbe freshen rule).
  */
object HeavyTailProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val base = "/root/testdata/sf0.1"
    val scale = sys.env.getOrElse("GRAFT_PROBE_SCALE", "25").toInt
    val tmp = System.getProperty("java.io.tmpdir")
    val only: Option[Seq[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSeq) else None
    def want(name: String): Boolean = only.forall(_.exists(name.contains))

    val one = new java.io.File(tmp, "graft_heavytail_1x").toString
    val big = new java.io.File(tmp, s"graft_heavytail_${scale}x").toString

    def provision(dir: String, clones: Int): Unit = {
      val marker = new java.io.File(dir, "_complete")
      if (marker.exists()) return
      val docs = spark.read.parquet(s"$base/documents.parquet")
      (0 until clones).map { i =>
        val tag = if (i % 10 < 2) s"p${i / 10}" else s"u$i"
        docs
          .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", expr(
            s"array_join(transform(split(text, ' '), w -> concat('f${tag}x', w)), ' ')"))
      }.reduce(_ unionByName _)
        .repartition(math.max(8, clones * 2))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val ev = spark.read.parquet(s"$base/events.parquet")
      (0 until clones).map(i => ev
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
        .repartition(math.max(8, clones * 2))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val li = spark.read.parquet(s"$base/lineitem.parquet")
      (0 until clones).map(i => li
          .withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .repartition(math.max(8, clones * 2))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val or = spark.read.parquet(s"$base/orders.parquet")
      (0 until clones).map(i => or
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .repartition(math.max(8, clones * 2))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "embeddings"))
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      marker.createNewFile()
    }
    provision(one, 1)
    provision(big, scale)

    // stores key on (size, mtime): bump mtimes so every run builds fresh
    // (a reused store would time a warm serve in the cold slot)
    def freshen(dir: String): Unit = {
      val now = java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis())
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try st.forEach(p => java.nio.file.Files.setLastModifiedTime(p, now))
      finally st.close()
    }
    freshen(one)
    freshen(big)

    val meter = new ProbeMetrics(spark)
    def time(name: String)(f: => Long): Double = {
      val secs = meter.timed("heavytail", name)(f)
      graft.Checkpoints.releaseAll(spark)
      System.gc()
      secs
    }

    for ((dir, tag, parts) <- Seq((one, "1x  ", 32),
        (big, s"${scale}x", math.max(64, scale * 5)))) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)

      if (want("t17")) {
        // the flat-peak evidence: sample pinned bytes while training runs.
        // One-sided sound — the poller can only MISS a peak, never invent
        // one, so a fat reading is always a true regression.
        @volatile var peak = 0L
        @volatile var done = false
        val poller = new Thread(() => {
          while (!done) {
            peak = math.max(peak, graft.Checkpoints.pinnedBytes(spark))
            Thread.sleep(50)
          }
        }, "t17-pin-poller")
        poller.start()
        try time(s"$tag t17_bpe_train")(
          graft.operators.TextQueries.queries("t17_bpe_train")(spark, dir)
            .count())
        finally { done = true; poller.join() }
        println(s"[heavytail] $tag t17 peak_pinned=${meter.fmt(peak)}")
      }

      if (want("t50")) time(s"$tag t50_bpe_train_sampled")(
        graft.operators.TextQueries.queries("t50_bpe_train_sampled")(
          spark, dir).count())

      if (want("d11")) {
        val cold = time(s"$tag d11 cold(index build+probe)")(
          graft.operators.DedupQueries.d11_incremental_dedup(spark, dir)
            .count())
        val warm = time(s"$tag d11 warm(probe only)")(
          graft.operators.DedupQueries.d11_incremental_dedup(spark, dir)
            .count())
        println(f"[heavytail] $tag d11 build=${cold - warm}%.1fs probe=$warm%.1fs")
      }

      for (q <- Seq("q60_rolling_wau", "q65_hll_rollup", "q83_kll_rollup",
          "q133_bucketed_join", "q134_partitioned_scan", "q135_salted_join")
          if want(q)) {
        // store-backed entries (q133/q134) build on first touch; q65/q83
        // REBUILD their partials every run by design (the write is half
        // the measured operator) — cold/warm separates the two shapes
        val cold = time(s"$tag $q cold")(
          graft.SparkEntry.queries(q)(spark, dir).count())
        val warm = time(s"$tag $q warm")(
          graft.SparkEntry.queries(q)(spark, dir).count())
        println(f"[heavytail] $tag $q build=${cold - warm}%.1fs steady=$warm%.1fs")
      }

      if (want("graph") || Seq("g21", "g23", "g24", "m18", "st14", "d35")
          .exists(k => only.exists(_.exists(_.startsWith(k))))) {
        // round-11 verdict item 1: the LAST unprobed heavy-tail family —
        // g21's label-propagation chain and everything riding it (g23,
        // g24), the star-contraction media clusters (m18), the streaming
        // co-graph's batch twin (st14), and the chaining audit (d35).
        // cold/warm separates the persisted monthly co-graph build (first
        // touch after freshen) from the steady chain cost.
        for (q <- Seq("g21_labelprop", "g23_community_churn",
            "g24_community_graph", "m18_media_clusters",
            "st14_incremental_co_graph", "d35_chaining_audit")
            if want("graph") || want(q)) {
          meter.flightRecord = true
          meter.resetStages()
          val cold = time(s"$tag $q cold")(
            graft.SparkEntry.queries(q)(spark, dir).count())
          meter.dumpStages(10, s"$tag $q cold")
          meter.flightRecord = false
          meter.resetStages()
          val warm = time(s"$tag $q steady")(
            graft.SparkEntry.queries(q)(spark, dir).count())
          println(f"[heavytail] $tag $q build=${cold - warm}%.1fs " +
            f"steady=$warm%.1fs")
        }
      }

      if (want("d24")) {
        // round-11 verdict item 4: the 25x leg's wall (308 s) sat at the
        // 100x wall (325 s) while shuffle grew 72x across that decade —
        // flight-record the whole run and name the stage that binds
        meter.flightRecord = true
        meter.resetStages()
        time(s"$tag d24_ppjoin")(
          graft.SparkEntry.queries("d24_ppjoin")(spark, dir).count())
        meter.dumpStages(14, s"$tag d24")
        meter.flightRecord = false
        meter.resetStages()
      }

      if (want("r14")) {
        // Round-14 probe leg. (a) Verdict items 3/7: the g22/t30
        // duplicated-CTE rewrites trade one checkpoint sync (~0.1 s, flat)
        // for removing corpus-proportional re-evaluation — the OLD literal
        // SQL spelling (still the oracle's text) is timed against the NEW
        // registry path on the same session/dir so the gap's growth with
        // the corpus is measured, not asserted. (b) Verdict item 9: the
        // g19/g07/m18 floor rationales recorded in round 13 claim
        // "compute-bound and linear at scale" — cold/steady at 1x and the
        // deep leg makes that falsifiable. s36/d32 ride along as this
        // round's investigated entries.
        def coldSteady(q: String): Unit = {
          val cold = time(s"$tag $q cold")(
            graft.SparkEntry.queries(q)(spark, dir).count())
          val warm = time(s"$tag $q steady")(
            graft.SparkEntry.queries(q)(spark, dir).count())
          println(f"[heavytail] $tag $q build=${cold - warm}%.1fs " +
            f"steady=$warm%.1fs")
        }
        coldSteady("t30_vocab_overlap") // registers the documents view
        time(s"$tag t30 OLD(3x tokenize)")(spark.sql(
          graft.operators.TextQueries.t30Sql("div")
            .replace("$SPLIT$", "explode(split(text, ' '))")).count())
        coldSteady("g22_random_walks") // builds/refreshes the co store
        graft.operators.CoGraph.registerPairsView(spark, dir)
        time(s"$tag g22 OLD(4x adj)")(spark.sql(
          graft.operators.GraphQueries.g22Sql(
            graft.operators.GraphQueries.coStored)).count())
        for (q <- Seq("g19_hits", "g07_ppr", "m18_media_clusters",
            "s36_bitext_margin", "d32_allpairs_cosine"))
          coldSteady(q)
      }

      if (want("publish")) {
        // BENCH_r10's ten slowest steady entries, through the full
        // reference pipeline: discovery -> dispatch -> cell guard ->
        // bounded-parallel sheets upsert
        val names = Seq("d24_ppjoin", "t17_bpe_train", "d35_chaining_audit",
          "m18_media_clusters", "d11_incremental_dedup", "s36_bitext_margin",
          "g23_community_churn", "st14_incremental_co_graph", "g07_ppr",
          "d32_allpairs_cosine")
        val dest = java.nio.file.Files
          .createTempDirectory("heavytail_publish").toString
        val t0 = System.nanoTime()
        meter.reset()
        val out = graft.etl.EtlRunner.publishRegistry(spark, names, dir, dest)
        val secs = (System.nanoTime() - t0) / 1e9
        val (sw, sr) = meter.snapshot()
        val loaded = out.collect { case l: graft.etl.EtlLoaded => l }
        val skipped = out.collect { case s: graft.etl.EtlSkipped => s }
        println(f"[heavytail] $tag publish(top10): $secs%.1fs " +
          s"loaded=${loaded.size} skipped=${skipped.size} " +
          s"(shuffle w=${meter.fmt(sw)} r=${meter.fmt(sr)})")
        skipped.foreach(s =>
          println(s"[heavytail] $tag publish skip: ${s.name} (${s.reason})"))
        graft.Checkpoints.releaseAll(spark)
        System.gc()
      }
    }
    spark.stop()
  }
}
