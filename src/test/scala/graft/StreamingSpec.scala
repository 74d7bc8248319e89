package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Real Structured Streaming runs (readStream -> watermark -> windowed agg
  * -> memory sink), checked against the batch twins in StreamingQueries.
  * The parquet fixture drives the stream (one file = one micro-batch via
  * processAllAvailable).
  */
class StreamingSpec extends SparkTestBase {

  private def eventsStreamDir: String = {
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("tumbling window with watermark over the stream == batch result") {
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val normalized = stream.transform(Tables.normalizeTs)
    val agg = normalized
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_tumbling")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_tumbling")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = operators.StreamingQueries.st01_tumbling_window(spark, sf)
      .select(col("hour_start"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("real-stream session windows == q74's batch lag/running-sum sessionization") {
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .transform(Tables.normalizeTs)
    // complete mode: every session (sealed or not) is in the sink, so the
    // whole result must equal the batch formulation, no seal-region scoping
    val agg = stream
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    // session_window's end is last-event + gap: subtracting the gap must
    // recover q74's session_end exactly (µs arithmetic) — this pins the
    // gap-extension semantics, not just the grouping
    val streamed = spark.table("stream_sessions")
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format(col("session_window.end") - expr("INTERVAL 30 MINUTES"),
          "yyyy-MM-dd HH:mm:ss").as("e"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val batch = operators.RelationalQueries.q74_sessionize(spark, sf)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} sessions vs batch ${batch.size}; " +
        s"diff sample: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
  }

  test("checkpoint recovery: restart processes only new files, exactly once") {
    Sessions.tune(spark)
    val src = Files.createTempDirectory("ckpt_src")
    val out = Files.createTempDirectory("ckpt_out").toString
    val ckpt = Files.createTempDirectory("ckpt_meta").toString
    Files.copy(Paths.get(s"$sf/events.parquet"), src.resolve("batch1.parquet"))
    val schema = spark.read.parquet(src.toString).schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src.toString)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    runOnce()
    assert(spark.read.parquet(out).count() == n)
    // new file arrives; restart from the same checkpoint
    Files.copy(Paths.get(s"$sf/events.parquet"), src.resolve("batch2.parquet"))
    runOnce()
    // old file not reprocessed, new file processed exactly once
    assert(spark.read.parquet(out).count() == 2 * n)
  }

  test("streaming dedup: dropDuplicates with watermark matches batch distinct") {
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .transform(Tables.normalizeTs)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_dedup")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
  }

  test("streaming LSH near-dup dedup: band-signature dropDuplicates == batch band buckets") {
    // the streaming member of the d03 family: explode each incoming doc
    // into its 4 minhash band signatures, keep only first-seen buckets
    // (later docs colliding in a band are the near-dup candidates d03
    // pairs up in batch); watermark bounds the dedup state
    Sessions.tune(spark)
    val dir = Files.createTempDirectory("docs_stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"), dir.resolve("documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    def bandsOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .withColumn("sig", expr("minhash_signature(word_shingles(toks))"))
        .select(col("doc_id"), col("ts"), explode(expr(
          "transform(sequence(0, 3), b -> struct(b AS band_no, " +
            "xxhash64(element_at(sig, 4*b+1), element_at(sig, 4*b+2), " +
            "element_at(sig, 4*b+3), element_at(sig, 4*b+4)) AS band_hash))"))
          .as("band"))
        .select(col("doc_id"), col("ts"), col("band.band_no"), col("band.band_hash"))
    // synthetic deterministic event time (documents carry none)
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,CAST(doc_id AS INT))"))
    val schema = spark.read.parquet(dir.toString).schema
    val stream = bandsOf(withTs(spark.readStream.schema(schema).parquet(dir.toString)))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("band_no", "band_hash")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("stream_lsh_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_lsh_dedup")
      .select(col("band_no"), col("band_hash")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val batch = bandsOf(withTs(spark.read.parquet(dir.toString)))
      .select(col("band_no"), col("band_hash")).distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream join: clicks pair with same-user errors within 30 minutes") {
    // both sides watermarked + a time-range condition so the join state is
    // evictable — the only stream-stream join shape that survives unbounded
    // streams
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    def src() = spark.readStream.schema(schema).parquet(dir)
      .transform(Tables.normalizeTs)
    // identical shaping on both sides so the equality compares the JOIN, not
    // two accidentally-different queries
    def side(df: org.apache.spark.sql.DataFrame, kind: String, p: String) =
      df.filter(col("event_type") === kind)
        .select(col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"),
          col("event_id").as(s"${p}_id"))
    def cond(c: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) =
      c("c_user") === e("e_user") && e("e_ts") >= c("c_ts") &&
        e("e_ts") <= c("c_ts") + expr("INTERVAL 30 MINUTES")
    val clicks = side(src(), "click", "c").withWatermark("c_ts", "1 hour")
    val errors = side(src(), "error", "e").withWatermark("e_ts", "1 hour")
    val q = clicks.join(errors, cond(clicks, errors))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ss_join").select(col("c_id"), col("e_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, sf)
    val (bc, be) = (side(ev, "click", "c"), side(ev, "error", "e"))
    val batch = bc.join(be, cond(bc, be))
      .select(col("c_id"), col("e_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream LEFT OUTER join: unmatched clicks emit on watermark seal") {
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    def src() = spark.readStream.schema(schema).parquet(dir)
      .transform(Tables.normalizeTs)
      .withColumn("ts", date_trunc("second", col("ts")))
    def side(df: org.apache.spark.sql.DataFrame, kind: String, p: String) =
      df.filter(col("event_type") === kind)
        .select(col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"),
          col("event_id").as(s"${p}_id"))
    // outer rows only become final once the watermark passes the join
    // window's end, and the GLOBAL watermark is the min over both sides'
    // (type-filtered) watermark nodes — so the sealed region derives from
    // the lagging side's last event, the same scoping st09's batch twin
    // applies (2h = 1h watermark + 30min window + margin)
    val seal = spark.read.parquet(dir)
      .transform(Tables.normalizeTs)
      .withColumn("ts", date_trunc("second", col("ts")))
      .filter(col("event_type").isin("click", "error"))
      .groupBy(col("event_type")).agg(max(col("ts")).as("mx"))
      .agg(min(col("mx")) - expr("INTERVAL 2 HOURS")).head().getTimestamp(0)
    val clicks = side(src(), "click", "c").withWatermark("c_ts", "1 hour")
    val errors = side(src(), "error", "e").withWatermark("e_ts", "1 hour")
    val q = clicks.join(errors,
        clicks("c_user") === errors("e_user") &&
          errors("e_ts") >= clicks("c_ts") &&
          errors("e_ts") <= clicks("c_ts") + expr("INTERVAL 30 MINUTES"), "left")
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_left_join")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("c_id"), Option(r.getAs[java.lang.Long]("e_id")).map(_.toLong))
    val streamed = spark.table("ss_left_join")
      .filter(col("c_ts") <= lit(seal)).select(col("c_id"), col("e_id"))
      .collect().map(key).toSet
    val batch = operators.StreamingQueries.st09_stream_left_join(spark, sf)
      .select(col("c_id"), col("e_id")).collect().map(key).toSet
    assert(streamed == batch)
    // the interesting rows are the UNMATCHED ones — require some exist
    assert(batch.exists(_._2.isEmpty), "no unmatched clicks in fixture")
    assert(batch.exists(_._2.nonEmpty))
  }

  test("custom state: mapGroupsWithState running per-user max value") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id").as[Long], col("value").as[Double])
      .as[(Long, Double)]
    val updated = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) =>
          val hi = (rows.map(_._2) ++ state.getOption.iterator).max
          state.update(hi)
          (user, hi)
      }
    val q = updated.toDF("user_id", "max_value").writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("stream_state")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_state").groupBy(col("user_id"))
      .agg(max(col("max_value")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(max(col("value")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch)
  }

  test("streaming incremental dedup == batch d11 (foreachBatch probes the corpus index)") {
    // d11's daily-ingest shape run as a REAL stream: new docs arrive in
    // micro-batches, each batch probes the static corpus shingle index
    // (built once, localCheckpointed), and verdicts land in the sheets
    // sink — one sheet per micro-batch so replays stay idempotent. The
    // union of sheet outputs must equal the one-shot batch probe: each
    // new doc's verdict depends only on itself + the corpus, never on
    // which micro-batch carried it.
    Sessions.tune(spark)
    val docs = Tables.documents(spark, sf)
    val srcDir = Files.createTempDirectory("d11_stream").toString
    docs.filter(col("doc_id") % 7 === 0).repartition(3)
      .write.mode("overwrite").parquet(srcDir)
    val corpusIdx = operators.DedupQueries.bigramIndex(
      docs.filter(col("doc_id") % 7 =!= 0)).localCheckpoint()
    val dest = Files.createTempDirectory("d11_sheets").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        operators.DedupQueries
          .probeIndex(operators.DedupQueries.bigramIndex(b), corpusIdx)
          .write.format("sheets").option("path", dest)
          .option("name", s"verdicts_b$id").mode("overwrite").save()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, String)] = df
      .select(col("new_doc").cast("long"), col("corpus_doc").cast("long"),
        col("jaccard").cast("double"), col("verdict"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    val streamed = canon(spark.read.format("sheets").option("path", dest).load())
    val batch = canon(operators.DedupQueries.d11_incremental_dedup(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming persisted-minhash probe == batch d18 (stored index, micro-batched arrivals)") {
    // d18's production shape end-to-end: the index was built ONCE (stored
    // bands + shingle sets); today's docs then arrive in micro-batches and
    // each batch probes ONLY the stored tables. A doc's near-dup pairs
    // depend on itself + the store, never on batch boundaries, so the
    // union of per-batch probe outputs must equal the one-shot d18 result.
    Sessions.tune(spark)
    val dir = operators.DedupQueries.ensureMinhashIndex(spark, sf)
    val srcDir = Files.createTempDirectory("d18_stream").toString
    Tables.documents(spark, sf).filter(col("doc_id") % 17 === 0).repartition(3)
      .write.mode("overwrite").parquet(srcDir)
    val outDir = Files.createTempDirectory("d18_out").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        operators.DedupQueries.probeMinhashIndex(spark, b, dir)
          .write.mode("overwrite").parquet(s"$outDir/b$id")
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = df
      .select(col("new_doc").cast("long"), col("corpus_doc").cast("long"),
        col("jaccard").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = canon(spark.read.parquet(s"$outDir/b*"))
    val batch = canon(SparkEntry.queries("d18_persisted_minhash")(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming persisted-bloom probe == batch c26 (stored filter, micro-batched arrivals)") {
    // c26's production shape: the bloom + exact-gram tables were built
    // ONCE from the eval suite; corpus batches then arrive continuously
    // and each probes ONLY the stored index. A doc's hit count depends on
    // itself + the store, never on batch boundaries, so per-batch probe
    // outputs union to the one-shot c26 result with no error budget.
    Sessions.tune(spark)
    val dir = operators.CurationQueries.ensureBloomIndex(spark, sf)
    val srcDir = Files.createTempDirectory("c26_stream").toString
    Tables.documents(spark, sf).filter(col("doc_id") % 19 =!= 0).repartition(3)
      .write.mode("overwrite").parquet(srcDir)
    val outDir = Files.createTempDirectory("c26_out").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        operators.CurationQueries.probeBloomIndex(spark, b, dir)
          .write.mode("overwrite").parquet(s"$outDir/b$id")
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select(col("doc_id").cast("long"), col("n_hit_ngrams").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = canon(spark.read.parquet(s"$outDir/b*"))
    val batch = canon(SparkEntry.queries("c26_persisted_bloom")(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming ANN serving: query micro-batches against the stored IVF+PQ index == one-shot s17") {
    // the serving shape of the persisted vector index: the index was built
    // ONCE; QUERY vectors then arrive in micro-batches and each batch
    // probes only the stored tables. A query's top-k depends on its own
    // vector + the store, never on batch boundaries, so per-batch results
    // union to the one-shot s17 output.
    Sessions.tune(spark)
    val dir = operators.SimilarityQueries.ensureIvfPqIndex(spark, sf)
    val srcDir = Files.createTempDirectory("s17_qstream").toString
    Tables.embeddings(spark, sf).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .repartition(3)
      .write.mode("overwrite").parquet(srcDir)
    val outDir = Files.createTempDirectory("s17_qout").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) {
          operators.SimilarityQueries.queryStoredIndexWith(spark,
              b, dir, spark.read.parquet(s"$dir/pq_codes"))
            .write.mode("overwrite").parquet(s"$outDir/b$id")
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = df
      .select(col("q_id").cast("long"), col("vec_id").cast("long"),
        col("sim").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = canon(spark.read.parquet(s"$outDir/b*"))
    val batch = canon(SparkEntry.queries("s17_persisted_ivfpq")(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("continuous ETL: each micro-batch republishes the sheet; final state == batch publish") {
    // the reference's pipeline (query -> spreadsheet upsert-by-name) under
    // Structured Streaming: orders arrive in micro-batches, each batch
    // recomputes the running revenue-per-status summary from the data seen
    // so far and UPSERTS it into the same named sheet — the sink's
    // replace-by-name semantics make republication idempotent, so the
    // final sheet equals a one-shot batch publish of the full dataset.
    Sessions.tune(spark)
    val srcDir = Files.createTempDirectory("etl_stream_src").toString
    Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice")).repartition(3)
      .write.mode("overwrite").parquet(srcDir)
    val seenDir = Files.createTempDirectory("etl_stream_seen").toString
    val sheetDir = Files.createTempDirectory("etl_stream_sheets").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("append").parquet(seenDir) // accumulate arrivals
        spark.read.parquet(seenDir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"))
          .orderBy(col("o_orderstatus"))
          .write.format("sheets").option("path", sheetDir)
          .option("name", "revenue_by_status").mode("append").save()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] = df
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val streamed = canon(spark.read.format("sheets").option("path", sheetDir).load())
    val expectDir = Files.createTempDirectory("etl_stream_expect").toString
    spark.read.parquet(srcDir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"))
      .orderBy(col("o_orderstatus"))
      .write.format("sheets").option("path", expectDir)
      .option("name", "revenue_by_status").mode("append").save()
    val batch = canon(spark.read.format("sheets").option("path", expectDir).load())
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed sheet diverged from batch publish: ${streamed.diff(batch)}")
  }

  test("streaming HLL rollup: foreachBatch sketch partials merge to the one-shot estimate") {
    // q65's sketch-persistence architecture under a REAL stream: each
    // micro-batch appends its per-day Datasketches HLL partial to a
    // partials table; after ingest, one merge-only query unions the stored
    // sketches. Union-of-partials must estimate identically to sketching
    // the whole stream once — the property that lets a daily pipeline
    // append one day's partials instead of rescanning history.
    Sessions.tune(spark)
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val srcDir = Files.createTempDirectory("hll_stream_src").toString
    ev.repartition(4).write.mode("overwrite").parquet(srcDir)
    val partialsDir = Files.createTempDirectory("hll_stream_partials").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.groupBy(col("day"))
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sketch"))
          .write.mode("append").parquet(partialsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val merged = spark.read.parquet(partialsDir)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))"))
      .collect()(0).getLong(0)
    val oneShot = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
      .collect()(0).getLong(0)
    assert(merged == oneShot, s"merged $merged vs one-shot $oneShot")
    assert(merged > 0)
  }

  test("streaming theta rollup: per-batch partials answer cohort overlap == one-shot") {
    // q90's theta persistence under a REAL stream: micro-batches append
    // per-(day, event_type) theta partials; the merge-only read then
    // answers |A ∩ B| from stored blobs. A theta sketch is a deterministic
    // function of the input SET, so merged partials must agree with
    // one-shot sketching EXACTLY — including through the intersection,
    // not just the single-cohort estimate.
    import graft.functions.ThetaSketches._
    Sessions.tune(spark)
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
    val srcDir = Files.createTempDirectory("theta_stream_src").toString
    ev.repartition(4).write.mode("overwrite").parquet(srcDir)
    val partialsDir = Files.createTempDirectory("theta_stream_partials").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.groupBy(col("day"), col("event_type"))
          .agg(theta_agg(col("user_id")).as("sketch"))
          .write.mode("append").parquet(partialsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val merged = spark.read.parquet(partialsDir)
      .groupBy(col("event_type")).agg(theta_merge(col("sketch")).as("sk"))
    val streamed = merged.as("a").crossJoin(merged.as("b"))
      .filter(col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ca"), col("b.event_type").as("cb"),
        theta_intersect_est(col("a.sk"), col("b.sk")).as("ov"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val one = ev.groupBy(col("event_type")).agg(theta_agg(col("user_id")).as("sk"))
    val oneShot = one.as("a").crossJoin(one.as("b"))
      .filter(col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ca"), col("b.event_type").as("cb"),
        theta_intersect_est(col("a.sk"), col("b.sk")).as("ov"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(streamed.nonEmpty && streamed == oneShot,
      s"streamed $streamed vs one-shot $oneShot")
  }

  test("streaming PSI: per-batch count partials merge to one-shot q119 exactly") {
    // st13's architecture under a REAL stream: each micro-batch appends
    // its (event_type, half, n) count partial; merged counts through
    // q119's psiTail must equal the one-shot statistic EXACTLY — counts
    // add, so like the vocab rollup there is no error budget.
    Sessions.tune(spark)
    val ev = Tables.events(spark, sf).select(col("event_type"), col("ts"))
    val srcDir = Files.createTempDirectory("psi_stream_src").toString
    ev.repartition(4).write.mode("overwrite").parquet(srcDir)
    val partialsDir = Files.createTempDirectory("psi_stream_partials").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("event_type"),
            when(col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'"), lit("ref"))
              .otherwise(lit("cur")).as("half"))
          .groupBy(col("event_type"), col("half"))
          .agg(count(lit(1)).as("n"))
          .write.mode("append").parquet(partialsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(partialsDir)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("half") === "ref", col("n")).otherwise(0L))
          .cast("long").as("n_ref"),
        sum(when(col("half") === "cur", col("n")).otherwise(0L))
          .cast("long").as("n_cur"))
      .createOrReplaceTempView("psi_counts_spec")
    val merged = spark.sql(
      "WITH " + operators.RelationalQueries.psiTail("div", "psi_counts_spec"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val oneShot = SparkEntry.queries("q119_psi_drift")(spark, sf)
    assert(canon(merged) == canon(oneShot))
    assert(merged.count() > 0)
  }

  test("streaming vocab rollup: per-batch word-count partials merge to one-shot t16") {
    // st10's architecture under a REAL stream: each micro-batch appends
    // its (lang, token, count) partial; the merge-only rollup must equal
    // the one-shot t16 statistics EXACTLY — word counts add, so unlike
    // the sketch rollups there is no error budget at all, whatever the
    // batch slicing.
    Sessions.tune(spark)
    val docs = Tables.documents(spark, sf).select(col("lang"), col("text"))
    val srcDir = Files.createTempDirectory("vocab_stream_src").toString
    docs.repartition(4).write.mode("overwrite").parquet(srcDir)
    val partialsDir = Files.createTempDirectory("vocab_stream_partials").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
          .write.mode("append").parquet(partialsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val merged = spark.read.parquet(partialsDir)
      .groupBy(col("lang"), col("tok")).agg(sum(col("cnt")).as("cnt"))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("lang"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 9)
          .as("type_token_ratio"),
        round(col("n_hapax").cast("double") / col("n_types"), 9)
          .as("hapax_ratio"))
    val oneShot = SparkEntry.queries("t16_vocab_stats")(spark, sf)
    assert(canon(merged) == canon(oneShot))
    assert(merged.count() > 0)
  }

  test("streaming KLL rollup: per-batch quantile partials merge within the rank bound") {
    // q83's architecture under a real stream: each micro-batch appends its
    // KLL partial; the merge-only read must honor the sketch contract —
    // EXACT absorbed n (KLL tracks n exactly through merges, whatever the
    // batch slicing) and quantile estimates whose true rank sits within
    // the k=200 error bound of the target. Unlike HLL's exact
    // merge==one-shot identity, KLL compaction is randomized, so the
    // contract — not byte equality — is the right streaming pin.
    import graft.functions.KllQuantiles.{kll_agg, kll_merge, kll_n, kll_quantile}
    Sessions.tune(spark)
    val prices = Tables.orders(spark, sf).select(col("o_totalprice"))
    val srcDir = Files.createTempDirectory("kll_stream_src").toString
    prices.repartition(4).write.mode("overwrite").parquet(srcDir)
    val partialsDir = Files.createTempDirectory("kll_stream_partials").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.agg(kll_agg(col("o_totalprice")).as("sketch"))
          .write.mode("append").parquet(partialsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val merged = spark.read.parquet(partialsDir)
      .agg(kll_merge(col("sketch")).as("sk"))
      .select(kll_n(col("sk")).as("n"),
        kll_quantile(col("sk"), lit(0.5)).as("p50"))
      .collect()(0)
    val sorted = prices.collect().map(_.getDouble(0)).sorted
    assert(merged.getAs[Long]("n") == sorted.length.toLong)
    val trueRank = sorted.count(_ <= merged.getAs[Double]("p50")).toDouble / sorted.length
    assert(math.abs(trueRank - 0.5) <= 0.025, s"p50 true rank $trueRank")
  }

  test("streaming moments rollup: per-batch (n, sx, sx2) partials fold EXACTLY") {
    // q103's architecture under a real stream: every micro-batch appends
    // its algebraic triple; because the merge is component addition over
    // exact decimals, the streamed rollup must equal the batch aggregate
    // BIT FOR BIT, whatever the batch slicing — the strongest streaming
    // pin on the shelf (KLL gets a rank bound; moments get equality).
    Sessions.tune(spark)
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val prices = Tables.orders(spark, sf)
      .select(col("o_totalprice").cast(dec).as("x"))
    val srcDir = Files.createTempDirectory("mom_stream_src").toString
    prices.repartition(4).write.mode("overwrite").parquet(srcDir)
    val partialsDir = Files.createTempDirectory("mom_stream_partials").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(expr("x * x")).as("sx2"))
          .write.mode("append").parquet(partialsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(partialsDir)
      .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sx2")).as("sx2")).collect()(0)
    val direct = prices
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sx2")).collect()(0)
    assert(streamed.getAs[Long]("n") == direct.getAs[Long]("n"))
    assert(streamed.getAs[java.math.BigDecimal]("sx")
      .compareTo(direct.getAs[java.math.BigDecimal]("sx")) == 0)
    assert(streamed.getAs[java.math.BigDecimal]("sx2")
      .compareTo(direct.getAs[java.math.BigDecimal]("sx2")) == 0)
  }

  test("streaming trending: windowed counts + foreachBatch top-k == batch st07") {
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    val normalized = spark.readStream.schema(schema).parquet(dir)
      .transform(Tables.normalizeTs)
    // the stream maintains the per-(window, type) counts under a watermark;
    // the bounded top-3-per-window rank runs on each complete snapshot in
    // foreachBatch (|windows| x |types| rows — never the raw firehose)
    val counts = normalized
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    @volatile var streamed: Set[(String, String, Long)] = Set.empty
    val q = counts.writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import graft.plans.TopKPerGroup
        import graft.plans.TopKPerGroup.Ord
        streamed = TopKPerGroup.topK(
          batch.select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("n_events")),
          Seq("win_start"), Seq(Ord("n_events", desc = true), Ord("event_type")), 3)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val batch = operators.StreamingQueries.st07_trending(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-static enrichment: dim join inside the stream == batch st08") {
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .transform(Tables.normalizeTs)
    val dim = spark.read.parquet(s"$sf/customer.parquet") // STATIC side
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val agg = stream
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("volume"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_enrich")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val streamed = spark.table("stream_enrich").collect().map(key).toSet
    val batch = operators.StreamingQueries.st08_stream_enrich(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("custom-state sessionization: event-time timeout stream == batch st11") {
    // st11's sessionStep run as a REAL stream: three time-sliced source
    // files arrive as ordered micro-batches, the open session per user
    // parks in GroupState with an event-time timeout at last-event + 30min,
    // and the advancing watermark seals it (emission-on-eviction). Every
    // streamed session must match a batch session exactly, and every batch
    // session sealed well before the final watermark must have streamed.
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import operators.StreamingQueries.SessEvent
    Sessions.tune(spark)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("ts"))
    val (lo, hi) = {
      val r = ev.agg(min(col("us")), max(col("us"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val cuts = Seq(lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    val srcDir = Files.createTempDirectory("sess_stream")
    // one file per time slice, mtimes strictly increasing so the file
    // source replays them in event-time order (per-user order preserved)
    Seq(
      col("us") <= cuts(0),
      col("us") > cuts(0) && col("us") <= cuts(1),
      col("us") > cuts(1)
    ).zipWithIndex.foreach { case (pred, i) =>
      val tmp = Files.createTempDirectory(s"sess_slice$i")
      ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = srcDir.resolve(f"slice$i%02d.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(srcDir.toString).schema
    val sessions = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .withWatermark("ts", "1 hour")
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        operators.StreamingQueries.sessionStep(1800000000L, emitOpenAtEnd = false))
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("stateful_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    // batch bounds are whole-second formatted strings, streamed bounds are
    // exact µs — compare at shared second granularity (sessions of one
    // user are >= 30 min apart, so no second-level collisions)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("start_s"),
        r.getAs[Long]("end_s"), r.getAs[Long]("n_events"))
    val streamed = spark.table("stateful_sessions")
      .select(col("user_id"), expr("start_us div 1000000").as("start_s"),
        expr("end_us div 1000000").as("end_s"), col("n_events"))
      .collect().map(key).toSet
    val batch = operators.StreamingQueries.st11_stateful_sessions(spark, sf)
      .select(col("user_id"),
        unix_timestamp(to_timestamp(col("session_start"))).as("start_s"),
        unix_timestamp(to_timestamp(col("session_end"))).as("end_s"),
        col("n_events"))
      .collect().map(key).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch: ${(streamed diff batch).take(3)}")
    // sealed = deadline a safe margin before the final watermark (hi - 1h);
    // margin dodges the fire-at-exact-boundary comparison
    val finalWmUs = hi - 3600000000L
    val sealedSet = batch.filter { case (_, _, endS, _) =>
      endS * 1000000L + 1800000000L < finalWmUs - 61000000L
    }
    assert(sealedSet.nonEmpty, "fixture produced no clearly-sealed sessions")
    assert(sealedSet.subsetOf(streamed),
      s"sealed batch sessions missing from stream: ${(sealedSet diff streamed).take(3)}")
  }

  test("dropDuplicatesWithinWatermark: cross-batch at-least-once replays collapse") {
    // st04's streaming twin run for real: batch 1 delivers a slice of
    // events, batch 2 REPLAYS every one of them (at-least-once delivery)
    // plus a fresh slice; the watermark-scoped dedup state must swallow
    // all replays — streamed distinct ids == batch distinct ids, with
    // zero id seen twice downstream
    Sessions.tune(spark)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val first = ev.filter(col("event_id") % 2 === 0)
    val second = ev // replays ALL of batch 1's ids plus the odd half
    val srcDir = Files.createTempDirectory("dedup_stream")
    Seq(first, second).zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory(s"dd_b$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = srcDir.resolve(f"batch$i%02d.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(srcDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .withWatermark("ts", "30 days") // every replay lands inside the window
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wm_dedup").select(col("event_id"))
      .collect().map(_.getLong(0))
    assert(streamed.length == streamed.distinct.length,
      "an event id passed the watermark dedup twice")
    val batch = ev.select(col("event_id")).distinct().collect().map(_.getLong(0))
    assert(streamed.toSet == batch.toSet,
      s"streamed ${streamed.length} ids, batch ${batch.length}")
  }

  test("st12 view maintenance: foreachBatch read-apply-write loop == batch == recompute") {
    // the production loop for real: the changelog lands as three parquet
    // files, each micro-batch reads the CURRENT stored view, applies the
    // delta through the same one-join step, and writes the next view
    // version; the final stored view must equal one-shot q94 (whose
    // oracle is a full recompute — so this chain pins stream == batch ==
    // recompute end to end)
    import operators.RelationalQueries
    Sessions.tune(spark)
    val (va, vb) = RelationalQueries.orderSnapshots(spark, sf)
    val rows = RelationalQueries.changelogRows(va, vb).localCheckpoint()
    val srcDir = Files.createTempDirectory("cdc_stream")
    (0L until 3L).foreach { i =>
      val tmp = Files.createTempDirectory(s"cdc_b$i")
      rows.filter(pmod(col("o_orderkey"), lit(3L)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = srcDir.resolve(f"batch$i%02d.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1500000000000L + i * 60000L))
    }
    val viewRoot = Files.createTempDirectory("view_versions").toString
    RelationalQueries.revenueView(va)
      .write.mode("overwrite").parquet(s"$viewRoot/v0")
    var version = 0
    val schema = spark.read.parquet(srcDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sess = batch.sparkSession
        val cur = sess.read.parquet(s"$viewRoot/v$version")
        RelationalQueries.applyViewDelta(cur, batch)
          .write.mode("overwrite").parquet(s"$viewRoot/v${version + 1}")
        version += 1
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(version == 3, s"expected 3 micro-batches, saw $version")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = rowsOf(spark.read.parquet(s"$viewRoot/v$version")
      .select(col("o_custkey"), col("n_orders"), col("rev_cents")))
    val batch = rowsOf(operators.StreamingQueries.st12_view_maintain(spark, sf)
      .select(col("o_custkey"), col("n_orders"), col("rev_cents")))
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stored-view fold diverged: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
  }

  test("st16 replay safety: a redelivered batch folds to a no-op via the persisted ledger") {
    // foreachBatch is at-least-once: simulate the crash-between-swap-and-
    // offset-commit redelivery by invoking the guarded apply TWICE for
    // batch 1. The ledger is marker files persisted beside the view (the
    // transacted commit log a production sink keeps); the second delivery
    // must not advance the view version, and the final view must equal
    // the one-shot recompute (st16's oracle)
    import operators.RelationalQueries
    Sessions.tune(spark)
    val (va, vb) = RelationalQueries.orderSnapshots(spark, sf)
    val rows = RelationalQueries.changelogRows(va, vb).localCheckpoint()
    val srcDir = Files.createTempDirectory("replay_stream")
    (0L until 3L).foreach { i =>
      val tmp = Files.createTempDirectory(s"replay_b$i")
      rows.filter(pmod(col("o_orderkey"), lit(3L)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = srcDir.resolve(f"batch$i%02d.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1500000000000L + i * 60000L))
    }
    val viewRoot = Files.createTempDirectory("replay_view").toString
    val ledgerDir = Files.createTempDirectory("replay_ledger").toFile
    RelationalQueries.revenueView(va)
      .write.mode("overwrite").parquet(s"$viewRoot/v0")
    var version = 0
    var deliveries = 0
    def applyGuarded(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      deliveries += 1
      val marker = new java.io.File(ledgerDir, s"batch_$id")
      if (marker.exists()) return // ledger hit: replay dropped
      val cur = batch.sparkSession.read.parquet(s"$viewRoot/v$version")
      RelationalQueries.applyViewDelta(cur, batch)
        .write.mode("overwrite").parquet(s"$viewRoot/v${version + 1}")
      version += 1
      marker.createNewFile() // committed with the view swap
    }
    val schema = spark.read.parquet(srcDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        applyGuarded(batch, id)
        if (id == 1L) applyGuarded(batch, id) // the redelivery
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(deliveries == 4, s"expected 4 deliveries (3 + 1 replay), saw $deliveries")
    assert(version == 3, s"replay must not advance the view, version=$version")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_custkey"), col("n_orders"), col("rev_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = rowsOf(spark.read.parquet(s"$viewRoot/v$version"))
    val twin = rowsOf(operators.StreamingQueries.st16_replay_safe_apply(spark, sf))
    assert(streamed.nonEmpty && streamed == twin,
      s"replay-guarded fold diverged: ${(streamed diff twin).take(3)} / ${(twin diff streamed).take(3)}")
  }

  test("st11 state machine == q74 declarative formulation, row for row") {
    // the driver's oracle for st11 IS q74's SQL — pin the agreement locally
    // so a hash mismatch can never reach CORRECTNESS: both formulations of
    // gap sessionization must produce identical rows including session_idx.
    Sessions.tune(spark)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("session_start"), col("session_end"), col("duration_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))
      .toSet
    val machine = rows(operators.StreamingQueries.st11_stateful_sessions(spark, sf))
    val declarative = rows(operators.RelationalQueries.q74_sessionize(spark, sf))
    assert(machine.nonEmpty)
    assert(machine == declarative,
      s"disagreement: ${(machine diff declarative).take(3)} / ${(declarative diff machine).take(3)}")
  }

  test("streaming co-graph maintenance == one-shot rebuild (st14 under a real stream)") {
    // st14's architecture under a REAL readStream: lineitem arrives in
    // micro-batches, each batch computes ITS OWN monthly pair counts
    // (one batch-local self-join — never rescanning earlier arrivals)
    // and appends the partial; the maintained graph merges STORED
    // partials only. Ingest contract, stated not assumed: an order's
    // lines must co-arrive (the batch-local self-join counts pairs
    // within an order, so splitting an order across batches would lose
    // its cross-batch pairs) — hence the source files are hash-bucketed
    // by l_orderkey, the production "ingest complete orders" contract.
    Sessions.tune(spark)
    val srcDir = Files.createTempDirectory("cograph_stream_src").toString
    Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
      .repartition(3, col("l_orderkey")) // complete orders per file
      .write.mode("overwrite").parquet(srcDir)
    val partialsDir = Files.createTempDirectory("cograph_stream_parts").toString
    val om = Tables.orders(spark, sf).select(col("o_orderkey"),
      (((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
        .cast("long")).as("m"))
      .localCheckpoint()
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) {
          val lines = b.localCheckpoint()
          lines.alias("a")
            .join(lines.alias("b"),
              col("a.l_orderkey") === col("b.l_orderkey") &&
                col("a.l_suppkey") < col("b.l_suppkey"))
            .join(om, col("o_orderkey") === col("a.l_orderkey"))
            .groupBy(col("m"), col("a.l_suppkey").as("u"),
              col("b.l_suppkey").as("v"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(partialsDir)
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // merge-only over stored partials (counts add exactly across batches)
    val maintained = canon(spark.read.parquet(partialsDir)
      .groupBy(col("m"), col("u"), col("v"))
      .agg(sum(col("n")).cast("long").as("n"))
      .filter(col("n") >= 2))
    val oneShot = canon(operators.CoGraph.monthly(spark, sf)
      .filter(col("n") >= 2).select(col("m"), col("u"), col("v"),
        col("n").cast("long")))
    assert(maintained.nonEmpty)
    assert(maintained == oneShot,
      s"streamed co-graph diverged: ${maintained.diff(oneShot).take(3)} / ${oneShot.diff(maintained).take(3)}")
  }

  test("streaming classifier maintenance == one-shot train (st15 under a real stream)") {
    // st15's architecture under a REAL readStream: documents arrive in
    // micro-batches, each batch featurizes ITSELF (per-doc features have
    // no cross-doc dependency — any batching of the corpus works, unlike
    // st14's co-arrival contract) and appends its sufficient-statistic
    // partial (per-class per-dim pm sums + class counts); the maintained
    // model is derived from MERGED partials only and must equal the
    // one-shot train bit-for-bit.
    Sessions.tune(spark)
    val srcDir = Files.createTempDirectory("rocchio_stream_src").toString
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val partsDir = Files.createTempDirectory("rocchio_stream_parts").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) {
          val (docs, feats) = operators.TextQueries.rocchioFeaturesFrom(b)
          val fp = feats.filter(col("h") < 800)
            .groupBy(col("y"), col("dim")).agg(sum(col("pm")).as("v"))
          val np = docs.filter(col("h") < 800)
            .groupBy(col("y")).agg(count(lit(1)).as("v"))
            .select(col("y"), lit(-2L).as("dim"), col("v"))
          fp.unionByName(np).write.mode("append").parquet(partsDir)
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val merged = spark.read.parquet(partsDir)
      .groupBy(col("y"), col("dim")).agg(sum(col("v")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (wS, thS) = operators.TextQueries.rocchioModelFromSums(merged)
    val oneShot = SparkEntry.queries("t36_rocchio_classifier")(spark, sf)
      .filter(col("part") === "model").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    (0 until 32).foreach { k =>
      assert(wS(k) == oneShot(f"w_$k%02d"), s"streamed w_$k diverges")
    }
    assert(thS == oneShot("theta2"), "streamed theta2 diverges")
  }

  test("stateful stream: running per-user event count via groupBy on keys") {
    Sessions.tune(spark)
    val dir = eventsStreamDir
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val counts = stream.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("stream_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_counts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming layout maintenance == batch zone-mapped layout (st18 under a real stream)") {
    import operators.{Buckets, StreamingQueries}
    Sessions.tune(spark)
    val orders = Tables.orders(spark, sf)
    val srcDir = Files.createTempDirectory("layout_stream")
    val yr = year(col("o_orderdate"))
    val bands = Seq(yr < 1996, yr === 1996, yr === 1997, yr >= 1998)
    bands.zipWithIndex.foreach { case (p, i) =>
      val tmp = Files.createTempDirectory(s"layout_b$i")
      orders.filter(p).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = srcDir.resolve(f"batch$i%02d.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1500000000000L + i * 60000L))
    }
    val layout = Files.createTempDirectory("layout_store").toString
    val ledger = Files.createTempDirectory("layout_ledger").toFile
    var deliveries = 0
    def ingest(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      deliveries += 1
      val marker = new java.io.File(ledger, s"batch_$id")
      if (marker.exists()) return // at-least-once redelivery drops here
      batch.coalesce(1).write.mode("append").parquet(s"$layout/data")
      Buckets.appendFreshStats(batch.sparkSession, layout)
      marker.createNewFile()
    }
    val schema = spark.read.parquet(srcDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ingest(batch, id)
        if (id == 2L) ingest(batch, id) // the redelivery
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(deliveries == 5, s"expected 4 + 1 replay deliveries, saw $deliveries")
    // the manifest knows every data file exactly once
    val nFiles = spark.read.parquet(s"$layout/data").inputFiles.length
    val stats = spark.read.parquet(s"$layout/stats")
    assert(nFiles == 4 && stats.count() == 4,
      s"manifest drifted: $nFiles files, ${stats.count()} stats rows")
    // zone-pruned 1996 census over the STREAMED store == the batch twin
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-12-31 23:59:59").cast("timestamp")
    val files = stats.filter(col("max_date") >= lo && col("min_date") <= hi)
      .select(col("file_path")).collect().map(_.getString(0))
    assert(files.length == 1, s"1996 must prune to its band, got ${files.length}")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val streamedCensus = rowsOf(
      spark.read.parquet(files.toIndexedSeq: _*)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents")))
    val twin = rowsOf(StreamingQueries.st18_stream_layout(spark, sf))
    assert(streamedCensus.nonEmpty && streamedCensus == twin)
  }

  test("streaming delete requests need no replay ledger (st19 under a real stream)") {
    import operators.StreamingQueries
    Sessions.tune(spark)
    // three key-batch files: erasure requests by orderkey, mod-3 split
    val srcDir = Files.createTempDirectory("del_stream")
    val keys = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 83 === 0)
      .select(col("l_orderkey")).distinct()
    (0L until 3L).foreach { b =>
      val tmp = Files.createTempDirectory(s"del_b$b")
      keys.filter(col("l_orderkey") % 3 === b)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = srcDir.resolve(f"batch$b%02d.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1500000000000L + b * 60000L))
    }
    val dvDir = Files.createTempDirectory("del_dv").toString + "/dv"
    // NO ledger, deliberately: the redelivery lands twice and must not
    // matter — anti-join deletion is idempotent by semantics
    def ingest(batch: org.apache.spark.sql.DataFrame): Unit =
      Tables.lineitem(spark, sf)
        .join(org.apache.spark.sql.functions.broadcast(
          batch.select(col("l_orderkey").as("k"))), col("l_orderkey") === col("k"), "left_semi")
        .select(col("_metadata.file_path").as("file_path"),
          col("_metadata.row_index").as("row_index"))
        .coalesce(1).write.mode("append").parquet(dvDir)
    val schema = spark.read.parquet(srcDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ingest(batch)
        if (id == 1L) ingest(batch) // the redelivery — no guard on purpose
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val dv = spark.read.parquet(dvDir)
    assert(dv.count() > dv.distinct().count(),
      "the redelivery should be visible as duplicate DV rows")
    val live = Tables.lineitem(spark, sf)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"), col("l_linestatus"),
        col("l_quantity"))
      .join(org.apache.spark.sql.functions.broadcast(dv),
        Seq("file_path", "row_index"), "left_anti")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("l_quantity")).cast("long").as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val twin = StreamingQueries.st19_stream_deletes(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(live.nonEmpty && live == twin,
      s"streamed DV census diverged: ${(live diff twin).take(3)}")
  }

  test("streaming bootstrap-CI maintenance == one-shot (st20 under a real stream)") {
    // q154's Poisson partials are additive, so the stream maintains ONLY
    // a 100-row (rep, wsum, nw) state: each micro-batch appends its own
    // partial (never rescanning earlier arrivals), and the CI finalizes
    // from the merged store. Row-level independence means NO ingest
    // contract is needed at all (unlike st14's co-arriving orders) —
    // any partition of lineitem rows across batches folds identically.
    Sessions.tune(spark)
    val srcDir = Files.createTempDirectory("boot_stream_src").toString
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val partsDir = Files.createTempDirectory("boot_stream_parts").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty)
          operators.RelationalQueries.bootstrapPartials(b)
            .write.mode("append").parquet(partsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val stored = spark.read.parquet(partsDir)
    assert(stored.count() > 100,
      "expected multiple per-batch partials in the store")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val maintained = canon(operators.RelationalQueries.bootstrapFinalize(
      stored.groupBy(col("rep"))
        .agg(sum(col("wsum")).as("wsum"), sum(col("nw")).as("nw"))))
    val oneShot = canon(
      operators.RelationalQueries.q154_bootstrap_ci(spark, sf))
    assert(maintained.nonEmpty && maintained == oneShot,
      s"streamed bootstrap CI diverged: ${(maintained diff oneShot).take(3)}")
  }

  test("streaming pattern maintenance == one-shot q168 (st22 under a real stream)") {
    // CEP fold under a real readStream: each micro-batch contributes only
    // its own runs (batch-local numbering — no rescan of earlier
    // arrivals), keyed by the EVENT's UTC day, so stitching is
    // arrival-order independent. Source files are written one-per-day
    // (repartition by day + partitionBy), so maxFilesPerTrigger=1
    // delivers day-pure micro-batches — the boundary a production
    // ingest would cut anyway.
    Sessions.tune(spark)
    val srcDir = Files.createTempDirectory("cep_stream_src").toString
    Tables.events(spark, sf)
      .withColumn("bm", expr("unix_seconds(ts) div 86400"))
      .repartition(col("bm"))
      .write.partitionBy("bm").mode("overwrite").parquet(srcDir)
    val runsDir = Files.createTempDirectory("cep_stream_runs").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty)
          operators.StreamingQueries.st22BatchRuns(Tables.normalizeTs(b))
            .write.mode("append").parquet(runsDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val stored = spark.read.parquet(runsDir)
    assert(stored.select(col("batch")).distinct.count() > 1,
      "expected multiple day batches in the runs store")
    assert(stored.count() < Tables.events(spark, sf).count(),
      "runs store failed to compact below raw event count")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    val maintained = canon(operators.StreamingQueries.st22Finalize(stored))
    val oneShot = canon(operators.RelationalQueries
      .q168_match_recognize(spark, sf))
    assert(maintained.nonEmpty && maintained == oneShot,
      s"streamed CEP matches diverged: ${(maintained diff oneShot).take(3)}")
  }

  test("streaming BT leaderboard maintenance == one-shot c55 (st23 real stream)") {
    // the win matrix is additive, so the stream maintains ONLY |players|²
    // (i, j, n, w) partials: each micro-batch of BOUTS appends its own
    // directed-pair partial (never rescanning earlier arrivals), and the
    // MM fit runs over the merged matrix at emit time. Bout rows are the
    // stream unit (a preference record arrives whole — both sides and the
    // verdict), so any file split of the bout log folds identically.
    Sessions.tune(spark)
    val srcDir = Files.createTempDirectory("bt_stream_src").toString
    operators.CurationQueries.c55Bouts(spark, sf)
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val matDir = Files.createTempDirectory("bt_stream_matrix").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty)
          operators.CurationQueries.c55PairPartials(b)
            .write.mode("append").parquet(matDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val stored = spark.read.parquet(matDir)
    val merged = stored.groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("w")).as("w"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val maintained = canon(
      operators.CurationQueries.c55FitFrame(spark, merged))
    val oneShot = canon(
      operators.CurationQueries.c55_bradley_terry(spark, sf))
    assert(maintained.nonEmpty && maintained == oneShot,
      s"streamed BT leaderboard diverged: ${(maintained diff oneShot).take(3)}")
  }

  test("streaming bitmap-distinct maintenance survives redelivery (st21 real stream)") {
    // q158's day masks maintained under a real readStream with batch 1's
    // masks WRITTEN TWICE (the at-least-once crash-between-write-and-
    // commit shape) and no ledger anywhere: bitmap OR is idempotent, so
    // the duplicated partial cannot change any period's distinct count.
    Sessions.tune(spark)
    val srcDir = Files.createTempDirectory("bm_stream_src").toString
    Tables.events(spark, sf).select(col("ts"), col("user_id"))
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val masksDir = Files.createTempDirectory("bm_stream_masks").toString
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) {
          val masks = operators.RelationalQueries
            .bitmapDayMasks(Tables.normalizeTs(b)).localCheckpoint()
          masks.write.mode("append").parquet(masksDir)
          if (id == 1) masks.write.mode("append").parquet(masksDir) // replay
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val stored = spark.read.parquet(masksDir)
      .groupBy(col("period"), col("day"), col("chunk"))
      .agg(expr("bit_or(mask)").as("mask"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val maintained = canon(operators.RelationalQueries.bitmapFinalize(
      stored, Tables.events(spark, sf)))
    val oneShot = canon(
      operators.RelationalQueries.q158_bitmap_distinct(spark, sf))
    assert(maintained.nonEmpty && maintained == oneShot,
      s"streamed bitmap distinct diverged: ${(maintained diff oneShot).take(3)}")
  }
}
