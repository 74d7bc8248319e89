package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns as reusable operators (brief: "salting for skew, AQE for
  * runtime re-plan"; bucketing for co-located joins).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) is the first
  * line of defense and is enabled in Sessions. `saltedJoin` is the manual
  * pattern for the cases AQE can't rescue: a build side too big to
  * broadcast whose hot keys are known to dwarf a single task — e.g. joining
  * 100 TB of events against a dimension where 1% of keys carry 50% of rows.
  */
object Scale {

  /** Skew-safe equi-join: the big (probe) side gets a deterministic salt in
    * [0, salts); the small (build) side is replicated once per salt value.
    * The shuffle key becomes (key, salt), splitting each hot key across
    * `salts` reducers. Result is row-identical to `big.join(small, key)`.
    *
    * The salt derives from xxhash64 of the big side's whole row (seeded,
    * deterministic) — no RNG state, stable under retries and re-planning.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full would duplicate unmatched build-side rows once per salt
    // replica; only probe-side-preserving join types are sound here
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports probe-side-preserving join types only, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) &&
          saltedBig("__salt") === replicatedSmall("__salt"), joinType)
      .drop(replicatedSmall(key)).drop(saltedBig("__salt"))
      .drop(replicatedSmall("__salt"))
  }

  /** Top-k per group without a global sort: rank window + filter — the
    * pattern behind q12/s01; exposed as a utility.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .drop("__rk")
  }
}
