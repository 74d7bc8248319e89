package graft

import java.nio.file.{Files, Paths}
import graft.etl._

class CellGuardSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("cells counts header row like the reference (src/loader.py:241-246)") {
    // 1 data row x 2 cols -> 4 cells (incl. header)
    assert(CellGuard.cells(1, 2) == 4)
    assert(CellGuard.cells(0, 3) == 3) // header only
  }
  test("skip is >= limit, not > (src/loader.py:250)") {
    assert(CellGuard.exceeds(1999999, 1, 2000000L))
    assert(!CellGuard.exceeds(1999998, 1, 2000000L))
  }
  test("property: cells = (rows+1)*cols across random inputs") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val r = rnd.nextLong(1000000L)
      val c = 1 + rnd.nextInt(100)
      assert(CellGuard.cells(r, c) == (r + 1) * c)
      assert(CellGuard.exceeds(r, c, (r + 1) * c)) // boundary: >= skips
    }
  }
}

class HumanSizeSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("log-1024 bucketing mirrors convert_size (src/loader.py:61-75)") {
    assert(HumanSize.convertSize(0) == "0B")
    assert(HumanSize.convertSize(512) == "512.0B")
    assert(HumanSize.convertSize(1024) == "1.0KB")
    assert(HumanSize.convertSize(1536) == "1.5KB")
    assert(HumanSize.convertSize(1048576) == "1.0MB")
  }
}

class EtlRunnerSpec extends SparkTestBase {
  test("discover filters to .sql and strips suffix (src/loader.py:200,153)") {
    val dir = Files.createTempDirectory("sqlsrc")
    Files.writeString(dir.resolve("b_query.sql"), "SELECT 1 AS one")
    Files.writeString(dir.resolve("a_query.sql"), "SELECT 2 AS two")
    Files.writeString(dir.resolve("notes.txt"), "not sql")
    val specs = SqlFolderSource.discover(dir.toString)
    assert(specs.map(_.name) == Seq("a_query", "b_query"))
    assert(specs.head.sql.contains("SELECT 2"))
  }

  test("run: executes, isolates failures, enforces cell guard, upserts by name") {
    import spark.implicits._
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v").createOrReplaceTempView("t_src")
    val src = Files.createTempDirectory("sqlsrc")
    val dest = Files.createTempDirectory("sheets")
    Files.writeString(src.resolve("good.sql"), "SELECT k, v FROM t_src ORDER BY k")
    Files.writeString(src.resolve("broken.sql"), "SELEC k FROM") // parse error
    Files.writeString(src.resolve("too_big.sql"), "SELECT * FROM t_src CROSS JOIN t_src")
    // cellLimit 10: good = (3+1)*2 = 8 cells < 10; too_big = (9+1)*2 = 20 >= 10
    val out = EtlRunner.run(spark, src.toString, dest.toString, cellLimit = 10)
    val byName = out.map(o => o.name -> o).toMap
    assert(byName("good").isInstanceOf[EtlLoaded])
    assert(byName("broken").asInstanceOf[EtlSkipped].reason.startsWith("SQL error"))
    assert(byName("too_big").asInstanceOf[EtlSkipped].reason.startsWith("cell limit"))
    // loaded sheet: header + rows, no file for skipped queries
    val good = Files.readString(dest.resolve("good.csv"))
    assert(good == "k,v\n1,x\n2,y\n3,z\n")
    assert(!Files.exists(dest.resolve("too_big.csv")))
    assert(!Files.exists(dest.resolve("broken.csv")))
    // upsert-by-name: re-run overwrites in place (src/loader.py:159-179)
    Files.writeString(src.resolve("good.sql"), "SELECT k FROM t_src WHERE k = 1")
    EtlRunner.run(spark, src.toString, dest.toString, cellLimit = 10)
    assert(Files.readString(dest.resolve("good.csv")) == "k\n1\n")
  }

  test("concurrent sheet writes to different names don't cross-attribute commits") {
    import spark.implicits._
    val dest = Files.createTempDirectory("sheets_conc").toString
    val dfs = (1 to 4).map(i =>
      i -> (1 to i * 10).map(k => (k, s"v$k")).toDF("k", "v"))
    // parallel writes, one sheet name per thread
    val threads = dfs.map { case (i, df) =>
      val t = new Thread(() => df.write.format("sheets")
        .option("name", s"sheet_$i").mode("overwrite").save(dest))
      t.start(); t
    }
    threads.foreach(_.join())
    dfs.foreach { case (i, _) =>
      val meta = graft.sources.sheets.SheetsSink.takeCommit(s"sheet_$i")
      assert(meta.isDefined && meta.get.rows == i * 10,
        s"sheet_$i commit meta wrong: $meta")
      val lines = Files.readAllLines(Paths.get(dest, s"sheet_$i.csv"))
      assert(lines.size == i * 10 + 1) // header + rows
    }
  }

  test("runParallel: outcomes identical to serial, all sheets byte-equal, faster wall") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_etl")
    val src = Files.createTempDirectory("sqlsrc_par")
    val destSer = Files.createTempDirectory("sheets_ser")
    val destPar = Files.createTempDirectory("sheets_par")
    (0 until 8).foreach { i =>
      Files.writeString(src.resolve(f"q$i%02d.sql"),
        s"""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty
           |FROM lineitem_etl WHERE l_partkey % 8 = $i
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }
    Files.writeString(src.resolve("r_broken.sql"), "SELEC nope") // isolation
    val t0 = System.nanoTime()
    val ser = EtlRunner.run(spark, src.toString, destSer.toString)
    val serMs = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime()
    val par = EtlRunner.runParallel(spark, src.toString, destPar.toString,
      maxConcurrent = 4)
    val parMs = (System.nanoTime() - t1) / 1e6
    // identical outcome values, in discovery order — the serial contract
    assert(par == ser, s"parallel outcomes diverge:\n$par\nvs\n$ser")
    assert(par.count(_.isInstanceOf[EtlLoaded]) == 8)
    (0 until 8).foreach { i =>
      val a = Files.readString(destSer.resolve(f"q$i%02d.csv"))
      val b = Files.readString(destPar.resolve(f"q$i%02d.csv"))
      assert(a == b && a.nonEmpty, f"sheet q$i%02d bytes differ")
    }
    assert(!Files.exists(destPar.resolve("r_broken.csv")))
    info(f"serial $serMs%.0f ms vs parallel(4) $parMs%.0f ms")
    assert(parMs < serMs,
      f"parallel ($parMs%.0f ms) not faster than serial ($serMs%.0f ms)")
  }

  test("runRemote: the full reference loop over HTTP — list, download, dispatch, upload") {
    // the Drive-shaped pipeline end-to-end against the in-process stub:
    // folder listing + chunked resumable DOWNLOAD of each .sql (with one
    // mid-chunk kill), per-query isolation, chunked resumable UPLOAD of
    // each result (with one mid-chunk kill), bearer auth on every request
    import spark.implicits._
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
      .createOrReplaceTempView("t_remote")
    val sql = "SELECT k, v FROM t_remote ORDER BY k"
    val dest = Files.createTempDirectory("stub_remote_")
    val stub = new ResumableUploadStub(dest)
    try {
      stub.allowedTokens = Set("rtok")
      Files.writeString(dest.resolve("a_remote.sql"), sql)
      Files.writeString(dest.resolve("b_broken.sql"), "SELEC nope")
      Files.writeString(dest.resolve("notes.txt"), "not sql")
      stub.killDownloadAtByte = 5 // truncate one download chunk mid-body
      stub.killAtByte = 4 // abort one upload chunk mid-body
      stub.listPageSize = 1 // 3 files -> the discovery walks 3 pages
      val out = EtlRunner.runRemote(spark, stub.endpoint,
        authToken = Some("rtok"))
      assert(stub.listGets == 3,
        s"paginated discovery expected 3 page GETs, saw ${stub.listGets}")
      assert(out.map(_.name) == Seq("a_remote", "b_broken"))
      assert(out.head.isInstanceOf[EtlLoaded], s"remote load failed: $out")
      out(1) match {
        case EtlSkipped(_, reason, _) =>
          assert(reason.startsWith("SQL error"), reason)
        case other => fail(s"broken query not isolated: $other")
      }
      assert(stub.seenTokens.contains("rtok"), "auth never reached the wire")
      assert(stub.killAtByte == -1L && stub.killDownloadAtByte == -1L,
        "kill switches never fired")
      // transport-independence: the remotely published sheet is
      // byte-identical to the same query through the local folder path
      val src = Files.createTempDirectory("sqlsrc_remote_twin")
      Files.writeString(src.resolve("a_remote.sql"), sql)
      val localDest = Files.createTempDirectory("sheets_remote_twin")
      EtlRunner.run(spark, src.toString, localDest.toString)
      assert(Files.readString(dest.resolve("a_remote.csv")) ==
        Files.readString(localDest.resolve("a_remote.csv")),
        "remote and local publishes differ byte-wise")
    } finally stub.stop()
  }

  test("csv converter: timestamp_ntz is ISO local, nested types rejected by name") {
    import graft.sources.sheets.CsvFormat
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    // timestamp_ntz previously fell through to toString and published RAW
    // MICROS (deterministic, so same-converter fidelity could never flag
    // it); caught by the strict fallback on the first full-registry publish
    val ntz = CsvFormat.converter(TimestampNTZType)
    val micros = DateTimeUtils.localDateTimeToMicros(
      java.time.LocalDateTime.of(1997, 12, 4, 0, 0))
    assert(ntz(micros) == "1997-12-04T00:00")
    val e = intercept[UnsupportedOperationException](
      CsvFormat.converter(ArrayType(StringType)))
    assert(e.getMessage.contains("array<string>"),
      s"rejection must name the type: ${e.getMessage}")
  }

  test("csv quoting matches python csv.writer minimal style") {
    assert(etl.CellGuard.cells(0, 1) == 1)
    import graft.sources.sheets.CsvFormat
    assert(CsvFormat.quote("plain") == "plain")
    assert(CsvFormat.quote("a,b") == "\"a,b\"")
    assert(CsvFormat.quote("say \"hi\"") == "\"say \"\"hi\"\"\"")
  }

  test("publishRegistry: registry operators flow through discover→guard→upsert") {
    val dest = Files.createTempDirectory("etl_registry")
    // a mixed-shape sample; the cap sits between the biggest loadable
    // sheet (d02: 1503 cells at sf0.001) and t01's 2505, so exactly one
    // query must SKIP — proving the guard bites inside this path too
    val names = Seq("q01_pricing_summary", "q03_join_agg", "t01_lang_id",
      "d02_dedup_content_hash", "q02_filter_project")
    val outcomes = EtlRunner.publishRegistry(spark, names, sf,
      dest.toString, cellLimit = 1600L)
    assert(outcomes.map(_.name).sorted == names.sorted)
    val loaded = outcomes.collect { case l: EtlLoaded => l.name }.toSet
    val skipped = outcomes.collect { case s: EtlSkipped => s }
    assert(skipped.map(_.name) == Seq("t01_lang_id"),
      s"expected only the per-doc report to trip the cap: $outcomes")
    assert(skipped.head.reason.startsWith("cell limit"))
    assert(!Files.exists(dest.resolve("t01_lang_id.csv")))
    // every loaded sheet round-trips with exactly the operator's row count
    loaded.foreach { n =>
      val back = spark.read.format("sheets")
        .option("path", dest.toString).option("name", n).load().count()
      val direct = SparkEntry.queries(n)(spark, sf).count()
      assert(back == direct, s"$n: sheet has $back rows, operator $direct")
    }
  }

  test("sheet fidelity check: passes on a faithful publish, names a tampered sheet") {
    val dest = Files.createTempDirectory("etl_fidelity")
    val names = Seq("q01_pricing_summary", "q02_filter_project")
    val outcomes = EtlRunner.publishRegistry(spark, names, sf, dest.toString)
    assert(outcomes.collect { case l: EtlLoaded => l.name }.toSet == names.toSet)
    names.foreach { n =>
      assert(graft.tools.EtlDemo.sheetFidelity(spark, n, sf, dest.toString)
        .isEmpty, s"fidelity flagged an untouched sheet $n")
    }
    // corrupt ONE data cell of q01 (flip a digit in the last line) — the
    // multiset fingerprint must flag exactly that sheet, by name
    val f = dest.resolve("q01_pricing_summary.csv")
    val lines = Files.readAllLines(f)
    val last = lines.get(lines.size - 1)
    val idx = last.indexWhere(_.isDigit)
    val flipped = last.updated(idx, if (last(idx) == '9') '8' else '9')
    lines.set(lines.size - 1, flipped)
    Files.write(f, lines)
    val res = graft.tools.EtlDemo.sheetFidelity(
      spark, "q01_pricing_summary", sf, dest.toString)
    assert(res.exists(_.startsWith("q01_pricing_summary:")),
      s"tampered sheet not flagged: $res")
    // the untouched sibling still passes — the check localizes
    assert(graft.tools.EtlDemo.sheetFidelity(
      spark, "q02_filter_project", sf, dest.toString).isEmpty)
  }

  test("publishRegistry: a broken operator skips, the batch continues") {
    // construction-time isolation (round-9 review finding): an unknown /
    // throwing operator must become an EtlSkipped outcome, not abort the
    // batch — and the healthy names around it must still load
    val dest = Files.createTempDirectory("etl_registry_iso")
    val names = Seq("q01_pricing_summary", "zz_no_such_operator",
      "q02_filter_project")
    val outcomes = EtlRunner.publishRegistry(spark, names, sf, dest.toString)
    assert(outcomes.map(_.name).sorted == names.sorted)
    val bad = outcomes.collect {
      case s: EtlSkipped if s.name == "zz_no_such_operator" => s
    }
    assert(bad.nonEmpty && bad.head.reason.startsWith("operator build error"),
      s"broken operator not isolated: $outcomes")
    assert(outcomes.collect { case l: EtlLoaded => l.name }.toSet ==
      Set("q01_pricing_summary", "q02_filter_project"))
    // the scope must not leak reg_* views whose checkpoint blocks are gone
    assert(!spark.catalog.tableExists("reg_q01_pricing_summary"),
      "reg_* temp view leaked past the publish scope")
  }

  test("publishRegistry summary: guard skips are expected, failures are not") {
    // the full-registry flagship (round-8 verdict item 7 extended round 9:
    // EtlDemo --registry all) rolls outcomes into EtlSummary — a guard
    // skip keeps ok=true (the reference's skip-not-truncate contract), a
    // SQL/write failure flips it
    val sum = etl.EtlSummary.of(Seq(
      etl.EtlLoaded("a", 10, 110),
      etl.EtlSkipped("b", "cell limit: 2000001 >= 2000000", guard = true),
      etl.EtlLoaded("c", 5, 55)))
    assert(sum == etl.EtlSummary(2, Seq("b"), Nil) && sum.ok)
    val bad = etl.EtlSummary.of(Seq(
      etl.EtlSkipped("d", "SQL error: unresolved column")))
    assert(!bad.ok && bad.failed == Seq("d (SQL error: unresolved column)"))
    // and the real path produces a clean summary end-to-end
    val dest = Files.createTempDirectory("etl_reg_sum")
    val real = etl.EtlSummary.of(EtlRunner.publishRegistry(spark,
      Seq("q01_pricing_summary", "q02_filter_project"), sf, dest.toString))
    assert(real == etl.EtlSummary(2, Nil, Nil) && real.ok)
  }

  test("publishRegistry: exits with zero pinned checkpoint blocks") {
    // round-8 verdict item 4: a long-lived embedding running MANY registry
    // operators in one session must not accumulate localCheckpoint blocks.
    // The direct re-run above pins its own blocks, so drain first, publish,
    // then assert the context is clean.
    graft.Checkpoints.releaseAll(spark)
    val dest = Files.createTempDirectory("etl_reg_clean")
    EtlRunner.publishRegistry(spark,
      Seq("d02_dedup_content_hash", "q01_pricing_summary"), sf, dest.toString)
    assert(graft.Checkpoints.pinnedCount(spark) == 0,
      "publishRegistry leaked pinned RDD blocks past its scope")
  }

  test("runParallel hang isolation: a stalled query is skipped by name, siblings load") {
    // round-10 verdict item 3: one hung sink/query previously blocked the
    // whole batch forever (Await Duration.Inf). The stall stand-in is a
    // view whose scan blocks on a gate (same JVM in local mode) — the
    // recording-fake discipline: deterministic, no sleeps to "probably"
    // line up. The gate opens in finally so the orphaned job finishes and
    // the shared session stays clean for later suites.
    import scala.concurrent.duration._
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_etl_stall")
    spark.range(1)
      .filter { _: java.lang.Long => EtlStallGate.latch.await(); true }
      .toDF("x").createOrReplaceTempView("stall_view")
    val src = Files.createTempDirectory("sqlsrc_stall")
    Files.writeString(src.resolve("a_ok.sql"),
      "SELECT l_returnflag, count(*) AS n FROM lineitem_etl_stall GROUP BY 1")
    Files.writeString(src.resolve("b_stuck.sql"), "SELECT * FROM stall_view")
    Files.writeString(src.resolve("c_ok.sql"),
      "SELECT count(*) AS n FROM lineitem_etl_stall")
    val dest = Files.createTempDirectory("sheets_stall")
    val t0 = System.nanoTime()
    val out =
      try {
        val r = EtlRunner.runParallel(spark, src.toString, dest.toString,
          maxConcurrent = 3, perQueryTimeout = 3.seconds)
        // the straggler must not have published (checked BEFORE the gate
        // opens — afterwards its orphaned write may legitimately land)
        assert(!Files.exists(dest.resolve("b_stuck.csv")))
        r
      } finally EtlStallGate.latch.countDown()
    val wallSecs = (System.nanoTime() - t0) / 1e9
    assert(wallSecs < 60, f"batch took $wallSecs%.0fs — timeout did not fire")
    assert(out.map(_.name) == Seq("a_ok", "b_stuck", "c_ok"))
    out(1) match {
      case EtlSkipped("b_stuck", reason, _) =>
        assert(reason.startsWith("timeout after 3s"), s"wrong reason: $reason")
      case other => fail(s"straggler not skipped: $other")
    }
    assert(out.count(_.isInstanceOf[EtlLoaded]) == 2, s"siblings lost: $out")
    assert(Files.exists(dest.resolve("a_ok.csv")))
    assert(Files.exists(dest.resolve("c_ok.csv")))
  }

  test("timeout cancels the straggler's SPARK JOBS and replenishes the pool") {
    // round-11 verdict item 3 (cancel) + the dispatch-armed-budget fix:
    // with ONE worker, the old wave-indexed budget falsely skipped b_ok
    // (it could never dispatch behind the wedged thread); now the budget
    // arms at dispatch and a timeout grows the pool, so b_ok runs late
    // but LOADS. And the straggler's Spark job must STOP at budget expiry
    // even though the gate never opens — cancelJobGroup interrupts its
    // task, so an abandoned query cannot keep burning executors.
    import scala.concurrent.duration._
    spark.range(1)
      .filter { _: java.lang.Long => EtlCancelGate.latch.await(); true }
      .toDF("x").createOrReplaceTempView("cancel_view")
    val src = Files.createTempDirectory("sqlsrc_cancel")
    Files.writeString(src.resolve("a_stuck.sql"), "SELECT * FROM cancel_view")
    Files.writeString(src.resolve("b_ok.sql"), "SELECT 1 AS one")
    val dest = Files.createTempDirectory("sheets_cancel")
    try {
      val out = EtlRunner.runParallel(spark, src.toString, dest.toString,
        maxConcurrent = 1, perQueryTimeout = 3.seconds)
      assert(out.map(_.name) == Seq("a_stuck", "b_ok"))
      out(0) match {
        case EtlSkipped("a_stuck", reason, _) =>
          assert(reason.startsWith("timeout"), reason)
        case other => fail(s"straggler not skipped: $other")
      }
      assert(out(1).isInstanceOf[EtlLoaded],
        s"queued sibling falsely skipped behind the wedged worker: ${out(1)}")
      assert(Files.exists(dest.resolve("b_ok.csv")))
      assert(!Files.exists(dest.resolve("a_stuck.csv")))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def active = spark.sparkContext.statusTracker.getActiveJobIds().length
      while (active > 0 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(active == 0,
        "straggler's Spark job still running after cancelJobGroup")
    } finally EtlCancelGate.latch.countDown()
  }

  test("runRemote hang isolation: a hung upload is skipped, siblings publish") {
    // round-11 verdict item 2: the remote loop is precisely where a stuck
    // transport lives — a wedged chunked upload (the stub parks /start on
    // a gate, DRIVER-side commit hang, no Spark job to cancel) must yield
    // EtlSkipped(timeout) while the serial loop continues past it.
    import scala.concurrent.duration._
    import spark.implicits._
    Seq((1, "x"), (2, "y")).toDF("k", "v")
      .createOrReplaceTempView("t_remote_hang")
    val dest = Files.createTempDirectory("stub_remote_hang")
    val stub = new ResumableUploadStub(dest)
    try {
      Files.writeString(dest.resolve("a_fine.sql"),
        "SELECT k FROM t_remote_hang ORDER BY k")
      Files.writeString(dest.resolve("b_hang.sql"),
        "SELECT v FROM t_remote_hang ORDER BY v")
      Files.writeString(dest.resolve("c_fine.sql"),
        "SELECT k, v FROM t_remote_hang ORDER BY k")
      stub.stallUploadsFor = Set("b_hang")
      val t0 = System.nanoTime()
      val out = EtlRunner.runRemote(spark, stub.endpoint,
        perQueryTimeout = 3.seconds)
      val wall = (System.nanoTime() - t0) / 1e9
      assert(wall < 60, f"remote batch took $wall%.0fs — timeout never fired")
      assert(out.map(_.name) == Seq("a_fine", "b_hang", "c_fine"))
      out(1) match {
        case EtlSkipped("b_hang", reason, _) =>
          assert(reason.startsWith("timeout after 3s"), reason)
        case other => fail(s"straggler not skipped: $other")
      }
      assert(out.count(_.isInstanceOf[EtlLoaded]) == 2, s"siblings lost: $out")
      // checked BEFORE the gate opens — the orphaned upload may
      // legitimately land afterwards (remote upsert-by-name self-heals)
      assert(Files.exists(dest.resolve("a_fine.csv")))
      assert(Files.exists(dest.resolve("c_fine.csv")))
      assert(!Files.exists(dest.resolve("b_hang.csv")))
    } finally {
      stub.uploadGate.countDown()
      stub.stop()
    }
  }
}

/** Shared gate for the hang-isolation test: a static object so the task
  * closure captures nothing (local mode — one JVM).
  */
object EtlStallGate {
  val latch = new java.util.concurrent.CountDownLatch(1)
}

/** Gate for the job-cancellation test — separate from [[EtlStallGate]]:
  * each latch is one-shot and the suites must not couple.
  */
object EtlCancelGate {
  val latch = new java.util.concurrent.CountDownLatch(1)
}
