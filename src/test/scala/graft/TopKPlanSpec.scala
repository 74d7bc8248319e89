package graft

import org.apache.spark.sql.functions._
import graft.plans.{TopKPerGroup, TopKPerGroupExec}
import graft.plans.TopKPerGroup.Ord

class TopKPlanSpec extends SparkTestBase {

  private def joined = {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
  }

  test("native top-k matches the window formulation exactly") {
    val native = TopKPerGroup.topK(joined, Seq("c_mktsegment"),
      Seq(Ord("o_totalprice", desc = true), Ord("o_orderkey")), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val window = SparkEntry.queries("q12_window_rank")(spark, sf)
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native == window)
  }

  test("plan has partial + final heap phases with one exchange between") {
    val df = TopKPerGroup.topK(joined, Seq("c_mktsegment"),
      Seq(Ord("o_totalprice", desc = true), Ord("o_orderkey")), 3)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // AQE wrapper hides the real operators from collect
      case p => p
    }
    val execs = plan.collect { case t: TopKPerGroupExec => t }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final TopKPerGroupExec, got:\n$plan")
  }

  test("optimizer rule: discarded-rank window idiom rewrites to the heap operator") {
    import org.apache.spark.sql.expressions.Window
    Sessions.tune(spark) // installs TopKWindowRewrite + the strategy
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val idiom = joined
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice")) // rk dropped
    idiom.count()
    val plan = idiom.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case t: TopKPerGroupExec => t }.nonEmpty,
      s"window idiom not rewritten:\n$plan")
    assert(plan.collect {
      case we: org.apache.spark.sql.execution.window.WindowExec => we }.isEmpty,
      s"Window still in the rewritten plan:\n$plan")
    // identical rows to the un-rewritten formulation (rank kept => untouched)
    val kept = joined
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"),
      "rank-kept query must NOT be rewritten")
    val a = idiom.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val b = kept.select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("property: native top-k == window formulation on random data") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.choose(0, 300)
      k <- Gen.choose(1, 8)
      nGroups <- Gen.choose(1, 6)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nGroups - 1)
        v <- Gen.choose(-1000, 1000)
      } yield (g.toLong, v.toLong))
    } yield (k, rows)
    // the TopKWindowRewrite rule (if a prior test installed it) would turn
    // the window side into the operator under test — disable for a real
    // independent comparison
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.TopKWindowRewrite)
    val prop = Prop.forAll(gen) { case (k, rows) =>
      import spark.implicits._
      // unique tie-break via a synthetic id (the operator's rank contract)
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id")
      val native = TopKPerGroup.topK(df, Seq("g"),
          Seq(Ord("v", desc = true), Ord("id")), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val windowed = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).drop("rk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      native == windowed
    }
    try {
      val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
      assert(res.passed, res.status.toString)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("spill fallback: tiny in-memory row limit gives identical results") {
    // rowLimit=4 forces every partition past the heap bound into the
    // external-sorter path (5 segments x k=3 = 15 retained rows otherwise)
    spark.conf.set("spark.graft.topk.inMemoryRowLimit", "4")
    try {
      val spilled = TopKPerGroup.topK(joined, Seq("c_mktsegment"),
        Seq(Ord("o_totalprice", desc = true), Ord("o_orderkey")), 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val window = SparkEntry.queries("q12_window_rank")(spark, sf)
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(spilled == window)
    } finally spark.conf.unset("spark.graft.topk.inMemoryRowLimit")
  }

  test("k larger than any group returns everything; k=1 returns group maxima") {
    val all = TopKPerGroup.topK(joined, Seq("c_mktsegment"),
      Seq(Ord("o_orderkey")), 1000000).count()
    assert(all == joined.count())
    val tops = TopKPerGroup.topK(joined, Seq("c_mktsegment"),
      Seq(Ord("o_totalprice", desc = true), Ord("o_orderkey")), 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val expect = joined.groupBy(col("c_mktsegment")).agg(max(col("o_totalprice")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tops == expect)
  }
}
