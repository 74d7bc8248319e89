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
