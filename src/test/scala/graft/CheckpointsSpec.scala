package graft

/** Lifecycle owner for localCheckpoint blocks (round-8 verdict item 4):
  * the library's ~130 checkpoint sites are correct per query but pin
  * blocks until async GC cleaning in a long-lived session — the proven
  * failure was BENCH_r08's monotonic degradation. These specs pin the
  * helper's semantics: scoped release of only-what-the-scope-pinned,
  * releaseAll as the serial-harness hammer, and (in EtlSpec) the
  * end-to-end guarantee that a registry publish exits with zero pinned.
  */
class CheckpointsSpec extends SparkTestBase {
  import spark.implicits._

  private def pinNew(): org.apache.spark.sql.DataFrame = {
    val df = Seq.tabulate(100)(i => (i, i * 2)).toDF("a", "b").localCheckpoint()
    df.count()
    df
  }

  test("scoped: releases blocks pinned inside, leaves prior pins alone") {
    // drain anything a sibling suite left behind so counts are ours
    Checkpoints.releaseAll(spark)
    val outer = pinNew()
    val base = Checkpoints.pinnedCount(spark)
    assert(base >= 1)
    Checkpoints.scoped(spark) {
      // hold references: an unreferenced checkpoint is fair game for the
      // async ContextCleaner, which would race the count below
      val a = pinNew(); val b = pinNew()
      assert(Checkpoints.pinnedCount(spark) == base + 2)
      assert(a.count() + b.count() == 200)
    }
    assert(Checkpoints.pinnedCount(spark) == base,
      "scope exit must drop exactly the blocks the scope pinned")
    // the outer checkpoint is still readable (its blocks were NOT touched —
    // a localCheckpoint has no lineage to recompute from)
    assert(outer.count() == 100)
    Checkpoints.releaseAll(spark)
  }

  test("scoped: releases on exception paths too") {
    Checkpoints.releaseAll(spark)
    intercept[RuntimeException] {
      Checkpoints.scoped(spark) { pinNew(); throw new RuntimeException("boom") }
    }
    assert(Checkpoints.pinnedCount(spark) == 0)
  }

  test("releaseAll: drops everything and reports the count") {
    Checkpoints.releaseAll(spark)
    val a = pinNew(); val b = pinNew()
    assert(a.count() == 100 && b.count() == 100)
    assert(Checkpoints.releaseAll(spark) == 2)
    assert(Checkpoints.pinnedCount(spark) == 0)
  }
}
