package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Persisted BUCKETED twins of the two fact tables, hash-clustered on the
  * join key — the storage-layout answer to the one shuffle the TPC-H-style
  * workload cannot otherwise avoid: orders ⋈ lineitem on orderkey. At
  * 100 TB that join shuffles both fact tables on every query; bucketing
  * both sides into the same bucket count on the same key pays the shuffle
  * ONCE at layout time, and every subsequent join is a zero-exchange
  * sort-merge over co-located buckets (Spark reads each bucket pair
  * independently — exactly the "co-locate joins via bucketing" play a
  * 1000-executor deployment makes for its hottest join key).
  *
  * Same store discipline as the co-graph/IVF-PQ/BM25 indexes (CoGraph
  * `ensure`): data identity-keyed by (size, mtime) of the source parquet,
  * `_complete`-marker committed, idempotent re-entry. The extra wrinkle is
  * that BUCKET METADATA lives in the session catalog, not the files, and
  * the default catalog is in-memory — so on a fresh session an existing
  * committed layout is re-REGISTERED (a metadata-only `CREATE TABLE ...
  * CLUSTERED BY ... LOCATION`) rather than rebuilt; a real deployment's
  * shared metastore makes that step a no-op.
  *
  * The build repartitions by the bucket hash before writing so each
  * bucket lands in exactly one file (Spark's bucket id and the shuffle
  * use the same Murmur3-mod hash), keeping the sorted-bucket read path
  * eligible. Bucket count is a layout dial: 16 here to exercise the
  * machinery at fixture scale; a 100 TB layout sizes it to target file
  * sizes (thousands), and the plan shape is identical.
  */
object Buckets {

  // v1: orders + lineitem clustered/sorted on orderkey, 16 buckets
  private val Version = "v1"
  private val NumBuckets = 16

  /** Ensure both bucketed tables exist (building or re-registering as
    * needed) and return their catalog names as (orders, lineitem).
    */
  private[graft] def tables(s: SparkSession, d: String): (String, String) =
    tablesTagged(s, d, "")

  private def tablesTagged(s: SparkSession, d: String, tag: String)
      : (String, String) = synchronized {
    def ident(f: String) = {
      val fl = new java.io.File(d, f)
      s"${fl.length()}_${fl.lastModified()}"
    }
    val dk = (d.hashCode & 0x7fffffff).toString
    val oT = s"orders_bkt$tag${Version}_${dk}_${ident("orders.parquet")}"
    val lT = s"lineitem_bkt$tag${Version}_${dk}_${ident("lineitem.parquet")}"
    val dir = SketchQueries.partialsDir(
      s"bkt$tag${Version}_${ident("orders.parquet")}_${ident("lineitem.parquet")}", d)
    ensureOne(s, oT, s"$dir/orders", Tables.orders(s, d), "o_orderkey")
    ensureOne(s, lT, s"$dir/lineitem", Tables.lineitem(s, d), "l_orderkey")
    (oT, lT)
  }

  /** The q139 pair: an independent bucketed layout (q133's tables stay
    * pristine) that then receives an incremental delta APPEND — s18's
    * discipline for the layout store. Spark buckets inserted rows by the
    * same hash, so the zero-exchange join survives growth (each bucket
    * just gains a file). Marker-guarded idempotent: re-entry (bench reps,
    * repeated Verify runs) must not double-append.
    */
  private[graft] def deltaTables(s: SparkSession, d: String)
      : (String, String) = synchronized {
    val (oT, lT) = tablesTagged(s, d, "d_")
    def ident(f: String) = {
      val fl = new java.io.File(d, f)
      s"${fl.length()}_${fl.lastModified()}"
    }
    val dir = SketchQueries.partialsDir(
      s"bktd_${Version}_${ident("orders.parquet")}_${ident("lineitem.parquet")}", d)
    val marker = new java.io.File(dir, "_delta1_complete")
    if (!marker.exists()) {
      new java.io.File(dir).mkdirs()
      val offset = 1000000000L
      Tables.orders(s, d).filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + offset)
        .write.insertInto(oT)
      Tables.lineitem(s, d).filter(col("l_orderkey") % 10 === 0)
        .withColumn("l_orderkey", col("l_orderkey") + offset)
        .write.insertInto(lT)
      marker.createNewFile()
    }
    (oT, lT)
  }

  /** The OTHER half of the storage-layout story: documents HIVE-PARTITIONED
    * by `lang` on disk (`.../lang=en/part-*.parquet`), so a
    * language-filtered scan opens only that language's directory —
    * partition pruning eliminates I/O before a single row is read, where
    * q02-style row-group pushdown still opens every file. At 100 TB the
    * corpus IS laid out this way (language, then source, is the universal
    * outer key of a multilingual training corpus); the q134 pin asserts
    * the pruning actually happens (PartitionFilters + inputFiles all under
    * one lang= directory). Same identity-keyed marker discipline as the
    * bucketed tables; path-returning because partition discovery needs no
    * catalog.
    */
  private[graft] def langPartitionedDocs(s: SparkSession, d: String): String =
    synchronized {
      val f = new java.io.File(d, "documents.parquet")
      val dir = SketchQueries.partialsDir(
        s"docs_bylang_${Version}_${f.length()}_${f.lastModified()}", d)
      val marker = new java.io.File(dir, "_complete")
      if (!marker.exists()) {
        // one shuffle by the partition key so each lang directory gets one
        // file per corpus-sized task wave, not one file per input split
        Tables.documents(s, d)
          .repartition(col("lang"))
          .write.mode("overwrite").partitionBy("lang").parquet(s"$dir/docs")
        marker.createNewFile()
      }
      s"$dir/docs"
    }

  /** ZONE-MAP layout for orders: data range-clustered on `o_orderdate`
    * into 16 files plus a per-file (min, max, n_rows) stats table — the
    * file-skipping index Delta/Iceberg keep in their manifests. Clustering
    * is what makes the map sharp: after `repartitionByRange` each file
    * covers a narrow disjoint date band, so a range predicate overlaps few
    * files and the rest are eliminated BEFORE any footer is opened (parquet
    * row-group stats still require opening every file; hive partitioning
    * (q134) forces a coarse categorical key — zone maps give per-file
    * pruning on a continuous column). Stats are harvested from the
    * committed files themselves (one scan at layout time, `_metadata`
    * grouping), so the map can never disagree with the data. Returns
    * (dataDir, statsDir); same identity-keyed `_complete`-marker
    * discipline as the bucketed tables.
    */
  private[graft] def zoneMapOrders(s: SparkSession, d: String)
      : (String, String) = synchronized {
    val f = new java.io.File(d, "orders.parquet")
    val dir = SketchQueries.partialsDir(
      s"orders_zonemap_${Version}_${f.length()}_${f.lastModified()}", d)
    val marker = new java.io.File(dir, "_complete")
    if (!marker.exists()) {
      Tables.orders(s, d)
        .repartitionByRange(16, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/data")
      s.read.parquet(s"$dir/data")
        .groupBy(col("_metadata.file_path").as("file_path"))
        .agg(min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/stats")
      marker.createNewFile()
    }
    (s"$dir/data", s"$dir/stats")
  }

  /** POSITIONAL DELETION VECTORS over lineitem — merge-on-read deletes
    * (Iceberg v2 position deletes / Delta deletion vectors): a retention
    * purge (`l_shipdate < 1995-07-01`) is recorded as (file_path,
    * row_index) pairs in a side table and the base parquet is NEVER
    * rewritten — at 100 TB rewriting TB-scale immutable files to drop a
    * few percent of rows is the thing this layout exists to avoid.
    * `_metadata.row_index` is the row's position within its file, stable
    * across split planning, so the vector remains valid however the scan
    * is parallelized. Readers anti-join the (small) vector; a compaction
    * pass (m10's economics) eventually folds vectors back into data files.
    */
  private[graft] def lineitemDeleteVectors(s: SparkSession, d: String)
      : String = synchronized {
    val f = new java.io.File(d, "lineitem.parquet")
    val dir = SketchQueries.partialsDir(
      s"li_dv_${Version}_${f.length()}_${f.lastModified()}", d)
    val marker = new java.io.File(dir, "_complete")
    if (!marker.exists()) {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
        .select(col("_metadata.file_path").as("file_path"),
          col("_metadata.row_index").as("row_index"))
        .write.mode("overwrite").parquet(s"$dir/dv")
      marker.createNewFile()
    }
    s"$dir/dv"
  }

  /** SNAPSHOT log for orders — time travel by manifest: immutable data
    * files plus versioned manifests (`v1.txt`, `v2.txt`), each listing
    * exactly the files visible at that version. v1 = orders before
    * 1997-01-01 (two files); the v2 commit APPENDS a delta file and
    * publishes a new manifest — the old manifest still names only the old
    * files, so a v1 reader after the v2 commit sees the v1 rows bit-for-
    * bit (snapshot isolation, the Delta/Iceberg transaction-log core).
    * Manifests are driver-side metadata (file lists), exactly what a
    * lakehouse driver reads at planning time.
    */
  private[graft] def ordersSnapshots(s: SparkSession, d: String): String =
    synchronized {
      val f = new java.io.File(d, "orders.parquet")
      val dir = SketchQueries.partialsDir(
        s"orders_snap_${Version}_${f.length()}_${f.lastModified()}", d)
      val marker = new java.io.File(dir, "_complete")
      if (!marker.exists()) {
        val cut = lit("1997-01-01").cast("timestamp")
        Tables.orders(s, d).filter(col("o_orderdate") < cut)
          .coalesce(2).write.mode("overwrite").parquet(s"$dir/base")
        Tables.orders(s, d).filter(col("o_orderdate") >= cut)
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/delta")
        def parts(sub: String): Seq[String] =
          new java.io.File(s"$dir/$sub").listFiles()
            .filter(x => x.getName.startsWith("part-") &&
              x.getName.endsWith(".parquet"))
            .map(_.getAbsolutePath).sorted.toSeq
        val base = parts("base")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/v1.txt"),
          base.mkString("\n").getBytes("UTF-8"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/v2.txt"),
          (base ++ parts("delta")).mkString("\n").getBytes("UTF-8"))
        marker.createNewFile()
      }
      dir
    }

  /** q155's SCHEMA-EVOLUTION layout: two epoch directories whose PHYSICAL
    * parquet schemas differ — e1 carries the original three columns, e2
    * (the "producer upgrade") adds `o_priority_class` and `o_channel` —
    * the situation every long-lived lake table reaches (columns are added
    * mid-history; old files are never rewritten). Marker-committed,
    * identity-keyed like every other store here. The READER is the
    * operator under test: `mergeSchema` must union the footers and
    * null-fill the old files.
    */
  private[graft] def evoSnapshots(s: SparkSession, d: String): String =
    synchronized {
      val f = new java.io.File(d, "orders.parquet")
      val dir = SketchQueries.partialsDir(
        s"orders_evo_${Version}_${f.length()}_${f.lastModified()}", d)
      val marker = new java.io.File(dir, "_complete")
      if (!marker.exists()) {
        val cut = lit("1997-01-01").cast("timestamp")
        Tables.orders(s, d).filter(col("o_orderdate") < cut)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .coalesce(2).write.mode("overwrite").parquet(s"$dir/e1")
        Tables.orders(s, d).filter(col("o_orderdate") >= cut)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            expr("CAST(substring(o_orderpriority, 1, 1) AS INT)")
              .as("o_priority_class"),
            expr("CASE o_orderkey % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'app' " +
              "ELSE 'store' END").as("o_channel"))
          .coalesce(2).write.mode("overwrite").parquet(s"$dir/e2")
        marker.createNewFile()
      }
      dir
    }

  /** q148's INCREMENTAL zone-map maintenance — an independent copy of the
    * q140 layout (that store stays pristine) that then receives a delta
    * file append, after which stats are computed ONLY for files missing
    * from the stats table (anti-join on file_path) and appended — the
    * incremental step that keeps a 100 TB layout's manifest current
    * without ever rescanning committed files. Delta = the orderkey%10==0
    * slice re-keyed past the base range (q139's discipline), dates
    * unchanged so the delta file genuinely lands inside query ranges.
    * Marker-committed idempotent per phase.
    */
  private[graft] def zoneMapOrdersWithDelta(s: SparkSession, d: String)
      : (String, String) = synchronized {
    val f = new java.io.File(d, "orders.parquet")
    val dir = SketchQueries.partialsDir(
      s"orders_zmd_${Version}_${f.length()}_${f.lastModified()}", d)
    val marker = new java.io.File(dir, "_complete")
    if (!marker.exists()) {
      Tables.orders(s, d)
        .repartitionByRange(16, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/data")
      s.read.parquet(s"$dir/data")
        .groupBy(col("_metadata.file_path").as("file_path"))
        .agg(min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/stats")
      marker.createNewFile()
    }
    val deltaMarker = new java.io.File(dir, "_delta1_complete")
    if (!deltaMarker.exists()) {
      Tables.orders(s, d).filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)
        .coalesce(1)
        .write.mode("append").parquet(s"$dir/data")
      appendFreshStats(s, dir)
      deltaMarker.createNewFile()
    }
    (s"$dir/data", s"$dir/stats")
  }

  /** Incremental stats maintenance shared by the delta-append layout and
    * the streamed layout: scan ONLY files the stats table doesn't know
    * yet and append their zone rows — committed files are never re-read
    * (the file listing is metadata). inputFiles spells file:///x where
    * _metadata wrote file:/x, so known-file comparison is on the
    * scheme-stripped path (the mismatch mode the hash gate caught as
    * doubled base stats until normalized).
    */
  private[graft] def appendFreshStats(s: SparkSession, dir: String): Unit = {
    def norm(p: String) = new java.net.URI(p).getPath
    val statsExist = new java.io.File(s"$dir/stats").exists()
    val known: Set[String] =
      if (!statsExist) Set.empty
      else s.read.parquet(s"$dir/stats")
        .select(col("file_path")).collect().map(r => norm(r.getString(0))).toSet
    val fresh = s.read.parquet(s"$dir/data").inputFiles
      .filterNot(p => known(norm(p)))
    if (fresh.nonEmpty)
      s.read.parquet(fresh.toIndexedSeq: _*)
        .groupBy(col("_metadata.file_path").as("file_path"))
        .agg(min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("append").parquet(s"$dir/stats")
  }

  /** st18's STREAMED layout — the zone-map manifest maintained by a
    * streaming ingest: order batches (orderkey mod 4) arrive one at a
    * time, each appending a data file and ONLY-new-file stats rows via
    * [[appendFreshStats]] — the foreachBatch body a production ingest
    * runs (StreamingSpec proves the same fold under a real readStream,
    * including idempotence when a batch is redelivered). The final
    * manifest serves zone-pruned reads exactly like the batch-built q140
    * layout.
    */
  private[graft] def streamedLayout(s: SparkSession, d: String)
      : (String, String) = synchronized {
    val f = new java.io.File(d, "orders.parquet")
    val dir = SketchQueries.partialsDir(
      s"orders_streamzm_${Version}_${f.length()}_${f.lastModified()}", d)
    val marker = new java.io.File(dir, "_complete")
    if (!marker.exists()) {
      // batches arrive in TIME order (the realistic ingest), so each data
      // file covers a narrow date band and the zone map stays sharp — a
      // random-key batching would give every file the full date range and
      // prune nothing
      val yr = year(col("o_orderdate"))
      val batches = Seq(yr < 1996, yr === 1996, yr === 1997, yr >= 1998)
      for (p <- batches) {
        Tables.orders(s, d).filter(p)
          .coalesce(1).write.mode("append").parquet(s"$dir/data")
        appendFreshStats(s, dir)
      }
      marker.createNewFile()
    }
    (s"$dir/data", s"$dir/stats")
  }

  /** st19's STREAMED deletion vectors — delete REQUESTS (by key:
    * orderkey ≡ 0 mod 83, the GDPR-erasure shape) arrive in three
    * batches; each batch resolves its keys to (file, row) positions
    * against the base scan and APPENDS them to the vector store. The
    * property st19 exists to prove: DV append is IDEMPOTENT BY
    * SEMANTICS — an anti-join cannot over-delete on duplicate positions
    * — so at-least-once redelivery needs no ledger for correctness
    * (unlike st16/st18, whose folds corrupt under replay); batch 1 is
    * therefore deliberately applied TWICE here, and the hash gate
    * proves the census unharmed. A ledger remains storage hygiene, not
    * a correctness requirement.
    */
  private[graft] def streamedDeleteVectors(s: SparkSession, d: String)
      : String = synchronized {
    val f = new java.io.File(d, "lineitem.parquet")
    val dir = SketchQueries.partialsDir(
      s"li_dvstream_${Version}_${f.length()}_${f.lastModified()}", d)
    val marker = new java.io.File(dir, "_complete")
    if (!marker.exists()) {
      val batches = Seq(0L, 1L, 1L, 2L) // batch 1 redelivered
      for (b <- batches)
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") % 83 === 0 && col("l_orderkey") % 3 === b)
          .select(col("_metadata.file_path").as("file_path"),
            col("_metadata.row_index").as("row_index"))
          .coalesce(1)
          .write.mode("append").parquet(s"$dir/dv")
      marker.createNewFile()
    }
    s"$dir/dv"
  }

  /** q153's MERGE-ON-READ change application — the full CRUD lifecycle
    * over an immutable base: one deterministic change set (updates:
    * quantity+5 where orderkey≡0 mod 97; deletes: orderkey≡0 mod 89;
    * upserts never rewrite the base) lands as TWO artifacts — a
    * positional deletion vector covering deleted AND updated rows
    * (an update is delete+reinsert, Iceberg v2's copy-on-write-free
    * path), and one appended delta file carrying the updated images.
    * Readers reconstruct the table as (base ∖ DV) ∪ delta. Same
    * marker-committed identity-keyed store discipline as everything
    * else; returns (dvDir, deltaDir).
    */
  private[graft] def lineitemMerge(s: SparkSession, d: String)
      : (String, String) = synchronized {
    val f = new java.io.File(d, "lineitem.parquet")
    val dir = SketchQueries.partialsDir(
      s"li_merge_${Version}_${f.length()}_${f.lastModified()}", d)
    val marker = new java.io.File(dir, "_complete")
    if (!marker.exists()) {
      val touched = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 97 === 0 || col("l_orderkey") % 89 === 0)
      touched
        .select(col("_metadata.file_path").as("file_path"),
          col("_metadata.row_index").as("row_index"))
        .write.mode("overwrite").parquet(s"$dir/dv")
      // updated images re-enter through the delta (deletes do not)
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 97 === 0 && col("l_orderkey") % 89 =!= 0)
        .withColumn("l_quantity", col("l_quantity") + 5)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/delta")
      marker.createNewFile()
    }
    (s"$dir/dv", s"$dir/delta")
  }

  /** q149's MATERIALIZED CUBE — the aggregate-navigator store: orders
    * pre-aggregated once at the finest useful grain (month × status ×
    * priority; additive measures only, so every coarser rollup is a
    * re-aggregation of cube rows, never of facts). At 100 TB the cube is
    * |grain| rows (thousands) versus billions of facts — the oldest
    * OLAP economics there is, same marker discipline as every store.
    */
  private[graft] def ordersCube(s: SparkSession, d: String): String =
    synchronized {
      val f = new java.io.File(d, "orders.parquet")
      val dir = SketchQueries.partialsDir(
        s"orders_cube_${Version}_${f.length()}_${f.lastModified()}", d)
      val marker = new java.io.File(dir, "_complete")
      if (!marker.exists()) {
        Tables.orders(s, d)
          .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .as("ym"),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/cube")
        marker.createNewFile()
      }
      s"$dir/cube"
    }

  /** Read one snapshot version: the manifest's file list, nothing else. */
  private[graft] def snapshotRead(s: SparkSession, dir: String, v: Int)
      : DataFrame = {
    val files = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/v$v.txt")), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
    s.read.parquet(files: _*)
  }

  private def ensureOne(s: SparkSession, name: String, loc: String,
      df: DataFrame, key: String): Unit = {
    if (s.catalog.tableExists(name)) return
    val marker = new java.io.File(loc, "_complete")
    if (marker.exists()) {
      // layout already committed by a prior session: metadata-only re-attach
      s.sql(s"CREATE TABLE $name (${df.schema.toDDL}) USING parquet " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS " +
        s"LOCATION '$loc'")
    } else {
      df.repartition(NumBuckets, col(key))
        .write.mode("overwrite")
        .bucketBy(NumBuckets, key).sortBy(key)
        .option("path", loc).saveAsTable(name)
      marker.createNewFile()
    }
  }
}
