package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.sqlfolder.SqlFolderDataSource

class SqlFolderSourceSpec extends SparkTestBase {

  private def folder: String = {
    val dir = Files.createTempDirectory("manifest")
    Files.writeString(dir.resolve("alpha_report.sql"), "SELECT 1 AS one")
    Files.writeString(dir.resolve("beta_report.sql"), "SELECT 2 AS two")
    Files.writeString(dir.resolve("gamma_export.sql"), "SELECT 3 AS three")
    Files.writeString(dir.resolve("notes.txt"), "not sql")
    dir.toString
  }

  test("reads the manifest with the reference's extension filter") {
    val df = spark.read.format("sqlfolder").load(folder)
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("name")).sorted.toSeq ==
      Seq("alpha_report", "beta_report", "gamma_export"))
    assert(rows.forall(_.getAs[String]("sql").startsWith("SELECT")))
  }

  test("name filters are pushed into the listing (server-side, like Drive q=)") {
    val df = spark.read.format("sqlfolder").load(folder)
      .filter(col("name").endsWith("_report"))
    assert(df.count() == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[StringEndsWith(name,_report)]"), plan.take(600))
  }

  test("column pruning skips content IO entirely (fields= projection parity)") {
    val dir = folder
    SqlFolderDataSource.contentReads.set(0)
    val names = spark.read.format("sqlfolder").load(dir)
      .select(col("name")).collect()
    assert(names.length == 3)
    assert(SqlFolderDataSource.contentReads.get() == 0,
      "content was read despite sql column being pruned")
    // and the sql column DOES read content when requested
    spark.read.format("sqlfolder").load(dir).select(col("sql")).collect()
    assert(SqlFolderDataSource.contentReads.get() == 3)
  }
}
