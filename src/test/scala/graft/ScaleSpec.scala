package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkTestBase {

  test("saltedJoin is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"),
      col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Scale.saltedJoin(li, o, "l_orderkey", salts = 4)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salted shuffle key actually spreads rows across salt values") {
    val li = Tables.lineitem(spark, sf)
    val salted = li.withColumn("__salt",
      pmod(xxhash64(li.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
    val counts = salted.groupBy(col("__salt")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet)
    val (mn, mx) = (counts.values.min, counts.values.max)
    assert(mx < mn * 2, s"salt imbalance: $counts")
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a prior JVM's in-memory catalog is gone but its warehouse dirs survive;
    // clear the locations or CREATE TABLE fails with LOCATION_ALREADY_EXISTS
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "o_b").foreach { t =>
      val dir = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")
    val j = spark.table("li_b").join(spark.table("o_b"),
      col("l_orderkey") === col("o_orderkey"))
    j.count() // force AQE final plan
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("partition pruning: day-partitioned layout reads only the probed partition") {
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val days = ev.select(col("day")).distinct().count()
    assert(days > 1)
    val probe = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-02")
      .groupBy(col("event_type")).count()
    probe.collect()
    val scan = probe.queryExecution.executedPlan.toString
    // the partition filter must prune at planning, not scan-then-filter
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("2024-01-02"), scan)
  }

  test("range-sharded sorted export: disjoint quality ranges per shard file") {
    // the training-data export shape: repartitionByRange gives each shard a
    // disjoint key range (global order across files without a global sort on
    // one reducer), sortWithinPartitions orders inside each shard
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    o.repartitionByRange(4, col("o_totalprice"))
      .sortWithinPartitions(col("o_totalprice"))
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length == 4, files.mkString(", "))
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min(col("o_totalprice")), max(col("o_totalprice"))).head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    // strict <: range partitioning co-locates equal keys, so a key value
    // appearing in two files (hi == lo) would itself be the overlap bug
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"shard ranges overlap: $hi >= $lo")
    }
    assert(spark.read.parquet(dir).count() == o.count())
  }

  test("streaming foreachBatch drives the sheets sink (stream -> connector)") {
    // foreachBatch bridges a stream to any batch writer — here the repo's
    // own DSv2 sheets connector, one upserted sheet per micro-batch run
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("fb_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/nation.parquet"), src.resolve("nation.parquet"))
    val dest = java.nio.file.Files.createTempDirectory("fb_sheets").toString
    val schema = spark.read.parquet(src.toString).schema
    val q = spark.readStream.schema(schema).parquet(src.toString)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // one sheet PER BATCH ID: the sink's overwrite is upsert-by-name, so
        // a fixed name would keep only the LAST micro-batch of a multi-batch
        // run — the batch id in the name makes the bridge replay-safe
        batch.select(col("n_nationkey"), col("n_name"))
          .write.format("sheets").option("path", dest)
          .option("name", s"nations_b$id").mode("overwrite").save()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("sheets").option("path", dest).load()
    assert(back.count() == spark.read.parquet(src.toString).count())
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("AQE skew join: the hot key's partition is split at runtime") {
    // one key owning most rows would serialize a sort-merge join onto one
    // task; AQE must detect and split it (the runtime answer to skew when
    // salting isn't wired in). Thresholds lowered so test-sized data skews.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      import spark.implicits._
      // 90% of fact rows land on key 1 -> one shuffle partition dwarfs the
      // rest. NOTE: no aggregation on the join key downstream — a required
      // hash distribution would make AQE decline the split (it would break
      // the partitioning the consumer needs)
      val fact = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val j = fact.join(dim, "k").filter(col("payload") % 7 === 0)
      assert(j.collect().nonEmpty) // executes THIS plan -> AQE final plan
      val plan = j.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("skew"),
        s"AQE did not split the skewed partition:\n${plan.take(1500)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("dpp_fact").toString
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    // dim: one tag per day, stored as a table; the query filters the dim on
    // tag (NOT the join key), so only runtime pruning can skip fact
    // partitions — the canonical DPP shape
    ev.select(col("day")).distinct()
      .withColumn("tag", concat(lit("t"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("day"))).cast("string")))
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "t1")
    val j = fact.join(dim, "day").groupBy(col("event_type")).count()
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(1500)}")
  }

  test("runtime bloom-filter join reduction: fact rows screened before the shuffle") {
    // the row-level complement of DPP: a selective dim filter on a
    // NON-partition join key can't prune files, but Spark's runtime bloom
    // filter (built from the dim side, pushed into the fact scan stage)
    // screens fact rows before they pay the join shuffle — at 100 TB this
    // is the difference between shuffling the full fact table and
    // shuffling the ~matching slice. Thresholds are lowered only because
    // the fixture is tiny; the plan shape is what's pinned.
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // a broadcast join has no fact-side shuffle to protect, so the rule
      // (correctly) skips it; at 100 TB the dim wouldn't broadcast — model
      // that by disabling auto-broadcast inside the block
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n${plan.take(1500)}")
    }
  }

  test("topKPerGroup returns k rows per group in order") {
    val o = Tables.orders(spark, sf)
    val top = Scale.topKPerGroup(o, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
    val by = top.collect().groupBy(_.getAs[String]("o_orderpriority"))
    assert(by.values.forall(_.length == 2))
  }
}
