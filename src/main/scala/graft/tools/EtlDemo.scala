package graft.tools

import java.nio.file.{Files, Paths}
import graft.{Sessions, Tables}
import graft.etl._

/** End-to-end demo of the reference pipeline shape (discover .sql folder ->
  * execute -> guard -> upsert sheets). Usage:
  *   runMain graft.tools.EtlDemo <sqlDir> <destDir> [sfDir]
  * With no args, self-provisions a sample sql folder over the sf0.001
  * fixture tables (registered as temp views) and prints each outcome.
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => Tables.table(spark, sfDir, t).createOrReplaceTempView(t))

    val (sqlDir, destDir) =
      if (args.length >= 2) (args(0), args(1))
      else {
        val s = Files.createTempDirectory("etl_sql")
        Files.writeString(s.resolve("revenue_by_segment.sql"),
          """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS volume
            |FROM orders JOIN customer ON o_custkey = c_custkey
            |GROUP BY c_mktsegment ORDER BY volume DESC""".stripMargin)
        Files.writeString(s.resolve("broken.sql"), "SELECT FROM WHERE")
        Files.writeString(s.resolve("all_lineitems.sql"),
          "SELECT * FROM lineitem") // 6k rows x 11 cols -> trips a 50k cell cap
        (s.toString, Files.createTempDirectory("etl_sheets").toString)
      }

    // bounded-parallel is the production form (the queries are
    // independent); pass GRAFT_ETL_SERIAL=1 to compare against the
    // reference's serial loop
    val outcomes =
      if (sys.env.contains("GRAFT_ETL_SERIAL"))
        EtlRunner.run(spark, sqlDir, destDir, cellLimit = 50000)
      else
        EtlRunner.runParallel(spark, sqlDir, destDir, cellLimit = 50000)
    outcomes.foreach {
      case EtlLoaded(n, rows, cells) =>
        val f = Paths.get(destDir, s"$n.csv")
        println(s"[etl] LOADED  $n rows=$rows cells=$cells " +
          s"size=${HumanSize.convertSize(Files.size(f))} -> $f")
      case EtlSkipped(n, why) => println(s"[etl] SKIPPED $n ($why)")
    }
    spark.stop()
  }
}
