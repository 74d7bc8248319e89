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
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"shard ranges overlap: $hi > $lo")
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
        batch.select(col("n_nationkey"), col("n_name"))
          .write.format("sheets").option("path", dest)
          .option("name", "nations").mode("overwrite").save()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("sheets").option("path", dest).load()
    assert(back.count() == spark.read.parquet(src.toString).count())
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("topKPerGroup returns k rows per group in order") {
    val o = Tables.orders(spark, sf)
    val top = Scale.topKPerGroup(o, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
    val by = top.collect().groupBy(_.getAs[String]("o_orderpriority"))
    assert(by.values.forall(_.length == 2))
  }
}
