package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Round-trip coverage for the sheets READ path (connector symmetry with
  * the write-only reference sink): write via `format("sheets")`, read the
  * directory back, values and per-sheet partitioning must hold.
  */
class SheetsReadSpec extends SparkTestBase {

  test("commit streams the assembled sheet through the SheetTransport seam") {
    import graft.sources.sheets._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("sheets_transport").toString
    val part = Files.createTempFile("graft_part", "")
    Files.write(part, "a,1\nb,2\n".getBytes)
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType)))
    var published = Map.empty[String, String]
    val recording = new SheetTransport {
      override def upsert(name: String, content: java.io.Writer => Unit): Unit = {
        val sw = new java.io.StringWriter(); content(sw)
        published += name -> sw.toString
      }
    }
    // within the cell guard: the full header+parts stream reaches the
    // transport exactly once, under the sheet's name
    new SheetsBatchWrite(dir, "t_ok", 1000L, schema, recording)
      .commit(Array(SheetsCommitMessage(part.toString, 2L)))
    assert(published("t_ok") == "k,v\na,1\nb,2\n")
    assert(SheetsSink.takeCommit("t_ok").exists(!_.skipped))
    // over the guard: skip means the transport is NEVER invoked — no
    // partial sheet can exist on any transport implementation
    new SheetsBatchWrite(dir, "t_over", 2L, schema, recording)
      .commit(Array(SheetsCommitMessage(part.toString, 2L)))
    assert(!published.contains("t_over"))
    assert(SheetsSink.takeCommit("t_over").exists(_.skipped))
  }

  test("write -> read round-trip preserves values incl. CSV-hostile strings") {
    import spark.implicits._
    val dest = Files.createTempDirectory("sheets_rt").toString
    val df = Seq(
      (1L, "plain", 1.5),
      (2L, "comma, inside", -3.0),
      (3L, "quote \" inside", 0.25),
      (4L, "multi\nline", 101849260.91),
      (5L, null.asInstanceOf[String], 7.0)
    ).toDF("id", "note", "score")
    df.write.format("sheets").option("path", dest).option("name", "rt")
      .mode("overwrite").save()
    val back = spark.read.format("sheets").option("path", dest).load()
    assert(back.schema.fieldNames.toSeq == Seq("id", "note", "score"))
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    val got = back.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = Set(
      ("1", "plain", "1.5"),
      ("2", "comma, inside", "-3.0"),
      ("3", "quote \" inside", "0.25"),
      ("4", "multi\nline", "101849260.91"),
      ("5", null, "7.0"))
    assert(got == want)
  }

  test("one partition per sheet; name option narrows to a single sheet") {
    import spark.implicits._
    val dest = Files.createTempDirectory("sheets_parts").toString
    Seq((1, "a")).toDF("k", "v").write.format("sheets")
      .option("path", dest).option("name", "s1").mode("overwrite").save()
    Seq((2, "b")).toDF("k", "v").write.format("sheets")
      .option("path", dest).option("name", "s2").mode("overwrite").save()
    val all = spark.read.format("sheets").option("path", dest).load()
    assert(all.rdd.getNumPartitions == 2)
    assert(all.count() == 2)
    val one = spark.read.format("sheets").option("path", dest)
      .option("name", "s2").load()
    assert(one.collect().map(_.getString(0)).toSeq == Seq("2"))
  }

  test("column pruning reaches the scan (pruned columns never materialize)") {
    import spark.implicits._
    val dest = Files.createTempDirectory("sheets_prune").toString
    Seq((1, "a", "x"), (2, "b", "y")).toDF("k", "v", "w")
      .write.format("sheets").option("path", dest).option("name", "p")
      .mode("overwrite").save()
    val pruned = spark.read.format("sheets").option("path", dest).load()
      .select(col("v"))
    assert(pruned.collect().map(_.getString(0)).toSet == Set("a", "b"))
    pruned.queryExecution.executedPlan.collectLeaves().foreach { leaf =>
      assert(leaf.output.map(_.name) == Seq("v"),
        s"scan did not prune: ${leaf.output}")
    }
  }

  test("single-column null rows (blank CSV lines) don't truncate the read") {
    // a 1-column null row writes as an empty line; the parser must treat it
    // as a record, not EOF — or the row AND everything after it vanish
    import spark.implicits._
    val dest = Files.createTempDirectory("sheets_nulls").toString
    Seq(Some("a"), None, Some("b")).toDF("v")
      .write.format("sheets").option("path", dest).option("name", "n")
      .mode("overwrite").save()
    val got = spark.read.format("sheets").option("path", dest).load()
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got.sorted == Seq(None, Some("a"), Some("b")).sorted, got.toString)
  }

  test("reading a directory with no sheets fails loudly, not as 0 columns") {
    val empty = Files.createTempDirectory("sheets_none").toString
    val e = intercept[IllegalArgumentException] {
      spark.read.format("sheets").option("path", empty).load()
    }
    assert(e.getMessage.contains("no sheets"), e.getMessage)
  }

  test("header mismatch across sheets fails loudly") {
    import spark.implicits._
    val dest = Files.createTempDirectory("sheets_mix").toString
    Seq((1, "a")).toDF("k", "v").write.format("sheets")
      .option("path", dest).option("name", "s1").mode("overwrite").save()
    Seq((2, "b")).toDF("k", "OTHER").write.format("sheets")
      .option("path", dest).option("name", "s2").mode("overwrite").save()
    val e = intercept[IllegalArgumentException] {
      spark.read.format("sheets").option("path", dest).load()
    }
    assert(e.getMessage.contains("header mismatch"))
  }

  test("catalog DML: MERGE INTO / UPDATE / DELETE compile and rewrite the sheet") {
    import spark.implicits._
    val dest = Files.createTempDirectory("sheets_dml").toString
    val cat = s"sheets_dml_${Math.abs(dest.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.sheets.SheetsCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dest)
    Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
      .write.format("sheets").option("path", dest).option("name", "t")
      .mode("overwrite").save()
    // catalog resolution: the sheet is a SQL-addressable table
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 3)
    // MERGE: matched update, unmatched insert — through the v2 row-level API
    Seq(("b", "20"), ("d", "40")).toDF("k", "v").createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO $cat.t t USING dml_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    // UPDATE and DELETE statements against the same table
    spark.sql(s"UPDATE $cat.t SET v = '100' WHERE k = 'a'")
    spark.sql(s"DELETE FROM $cat.t WHERE k = 'c'")
    val got = spark.sql(s"SELECT k, v FROM $cat.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "100", "b" -> "20", "d" -> "40"),
      s"post-DML sheet state wrong: $got")
    // the rewrite went through the guarded transport: one CSV, atomic name
    assert(Files.exists(java.nio.file.Paths.get(dest, "t.csv")))
    // catalog surface: list/drop
    val cat2 = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.sheets.SheetsCatalog]
    assert(cat2.listTables(Array.empty).map(_.name()).contains("t"))
  }

  test("catalog: missing sheet signals NoSuchTable, not a hard failure") {
    val dest = Files.createTempDirectory("sheets_404").toString
    val cat = s"sheets_404_${Math.abs(dest.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.sheets.SheetsCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dest)
    // existence probes expect the TableCatalog not-found signal (round-8
    // advice): DROP IF EXISTS must no-op, tableExists must answer false,
    // and a direct loadTable must throw the typed exception
    spark.sql(s"DROP TABLE IF EXISTS $cat.ghost") // must not throw
    assert(!spark.catalog.tableExists(s"$cat.default.ghost"))
    val c = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.sheets.SheetsCatalog]
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
      c.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty[String], "ghost"))
    }
  }
}
