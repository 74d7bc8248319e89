package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline parity with the reference ETL driver (SURVEY.md §2A).
  *
  * The reference listed a Drive folder for `.sql` files
  * (`/root/reference/src/loader.py:192-205`), ran each against MySQL
  * (`:228-234`), spooled to CSV (`:236-249`), enforced a 2M-cell cap
  * (`:250-253`) and upserted a sheet by name (`:144-189`). Here: a local
  * folder of `.sql` files, `spark.sql` execution with per-query failure
  * isolation, and the "sheets" DSv2 sink (graft.sources.sheets) carrying
  * the upsert-by-name + cell-guard semantics.
  */

/** A discovered query: the reference's `{id, name, mimeType, q}` dict
  * (`src/loader.py:114-119, 202-204`) minus transport details.
  */
final case class QuerySpec(id: String, name: String, sql: String)

/** P1-P3: folder listing + `.sql` predicate + content read (driver-side,
  * since the runner dispatches SQL text from the driver anyway).
  * The Drive variant's server-side pushdown (`q=` filter, `fields=`
  * projection, `src/loader.py:114-116`) is realized as a full DSv2 read
  * source in [[graft.sources.sqlfolder.SqlFolderDataSource]]
  * (`format("sqlfolder")`): SupportsPushDownFilters on the name,
  * SupportsPushDownRequiredColumns skipping content IO.
  */
object SqlFolderSource {
  def discover(dir: String): Seq[QuerySpec] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Seq.empty
    val stream = Files.list(p)
    val files =
      try stream.iterator().asScala
        .filter(f => Files.isRegularFile(f))
        .filter(_.getFileName.toString.endsWith(".sql")) // src/loader.py:200
        .toSeq
      finally stream.close() // directory streams hold an fd until closed
    files.sortBy(_.getFileName.toString)
      .map { f =>
        val name = f.getFileName.toString.stripSuffix(".sql") // src/loader.py:153
        QuerySpec(f.toString, name, Files.readString(f))
      }
  }
}

/** P8: byte-size humanization (`src/loader.py:61-75`) — log-1024 bucketing. */
object HumanSize {
  private val units = Array("B", "KB", "MB", "GB", "TB", "PB", "EB", "ZB", "YB")
  def convertSize(bytes: Long): String = {
    require(bytes >= 0, s"negative size: $bytes")
    if (bytes == 0) return "0B"
    val i = math.min((math.log(bytes.toDouble) / math.log(1024)).toInt, units.length - 1)
    val s = math.round(bytes / math.pow(1024, i) * 100.0) / 100.0
    s"$s${units(i)}"
  }
}

/** P7: the 2,000,000-cell output guard (`src/loader.py:241-253`,
  * `README.md:60-61`). The reference counts header + data rows; results
  * AT or over the limit are skipped entirely, not truncated.
  */
object CellGuard {
  val DefaultLimit: Long = 2000000L
  /** cells = (dataRows + 1 header) * columns — mirrors the running counter
    * at src/loader.py:241-246.
    */
  def cells(rows: Long, cols: Int): Long = (rows + 1L) * cols
  def exceeds(rows: Long, cols: Int, limit: Long = DefaultLimit): Boolean =
    cells(rows, cols) >= limit
}

sealed trait EtlOutcome { def name: String }
final case class EtlLoaded(name: String, rows: Long, cells: Long) extends EtlOutcome
final case class EtlSkipped(name: String, reason: String) extends EtlOutcome

/** P4 + P10: dispatch each discovered query through `spark.sql` with
  * per-query failure isolation (syntax error -> skip + continue,
  * `src/loader.py:232-234`; oversize -> skip, `:250-253`), then load via
  * the sheets sink (upsert-by-name overwrite).
  */
object EtlRunner {
  def run(spark: SparkSession, sqlDir: String, destDir: String,
          cellLimit: Long = CellGuard.DefaultLimit): Seq[EtlOutcome] =
    SqlFolderSource.discover(sqlDir).map { q =>
      Try(spark.sql(q.sql)) match {
        case Failure(e) =>
          EtlSkipped(q.name, s"SQL error: ${e.getMessage.linesIterator.next()}")
        case Success(df) =>
          Try {
            df.write.format("sheets")
              .option("name", q.name)
              .option("cellLimit", cellLimit.toString)
              .mode("overwrite")
              .save(destDir)
          } match {
            case Success(_) =>
              graft.sources.sheets.SheetsSink.takeCommit(q.name) match {
                case Some(meta) if meta.skipped =>
                  EtlSkipped(q.name, s"cell limit: ${meta.cells} >= $cellLimit")
                case Some(meta) => EtlLoaded(q.name, meta.rows, meta.cells)
                case None => EtlLoaded(q.name, -1, -1) // committed, counts unknown
              }
            case Failure(e) =>
              EtlSkipped(q.name, s"write error: ${e.getMessage.linesIterator.next()}")
          }
      }
    }
}
