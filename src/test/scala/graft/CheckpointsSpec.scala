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

  test("release(df): drops exactly the frame's own blocks, sibling pins survive") {
    Checkpoints.releaseAll(spark)
    val gen0 = pinNew()
    val gen1 = pinNew()
    assert(Checkpoints.pinnedCount(spark) == 2)
    Checkpoints.release(gen0)
    assert(Checkpoints.pinnedCount(spark) == 1,
      "release must target the one frame, not the context")
    assert(gen1.count() == 100, "the sibling generation must stay readable")
    Checkpoints.releaseAll(spark)
  }

  test("release(df) is root-only: a derived plan never releases its shared base") {
    // the accident root-only prevents: iterative loops pass release() their
    // round-1 state, which is often a LAZY plan layered on a shared
    // checkpointed base (the store-read edges frame feeding every round) —
    // leaf-walking release would unpersist the base out from under the
    // remaining rounds
    Checkpoints.releaseAll(spark)
    val base = pinNew()
    val derived = base.filter(org.apache.spark.sql.functions.col("a") < 50)
    Checkpoints.release(derived) // must be a no-op
    assert(Checkpoints.pinnedCount(spark) == 1,
      "derived-frame release must not touch the shared base's blocks")
    assert(base.count() == 100, "base must stay readable after the no-op")
    Checkpoints.releaseAll(spark)
  }

  test("t17 bpe_train: generational release keeps pinned footprint flat (round-10 verdict item 1)") {
    // Eager gen-release in bpeTrain: at any instant at most ~2 generations
    // (the swap window) are pinned, never all 8. The poller is ONE-SIDED
    // sound: sampling can only MISS a peak, never invent one, so a
    // failure here is always a true regression. Without the release the
    // loop holds 8 pinned RDDs by its last round — a 10ms poller cannot
    // miss that plateau at this fixture size.
    Checkpoints.releaseAll(spark)
    @volatile var peak = 0
    @volatile var done = false
    val poller = new Thread(() => {
      while (!done) {
        peak = math.max(peak, Checkpoints.pinnedCount(spark))
        Thread.sleep(5)
      }
    }, "t17-pin-poller")
    poller.start()
    try operators.TextQueries.queries("t17_bpe_train")(spark, sf).count()
    finally { done = true; poller.join() }
    assert(peak <= 3, s"t17 pinned $peak generations concurrently — eager release broken")
    assert(Checkpoints.pinnedCount(spark) == 0,
      "t17 must exit with zero pinned generations")
  }
}
