package graft.sources.sqlfolder

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 READ source for the query-manifest folder — the Spark-first
  * form of the reference's Drive listing (SURVEY.md P1,
  * `/root/reference/src/loader.py:105-122`). The reference pushed a server-
  * side predicate (`q="'{folder}' in parents..."`) and a column projection
  * (`fields=...`) into the listing API; here the same two ideas are the DSv2
  * contracts:
  *
  *  - SupportsPushDownFilters: name predicates (equality / prefix / suffix /
  *    contains) are evaluated against the directory listing on the driver —
  *    non-matching files are never opened, let alone shipped to executors;
  *  - SupportsPushDownRequiredColumns: file CONTENT is only read when the
  *    `sql` column survives column pruning — `SELECT name FROM manifest`
  *    does zero content IO (observable via [[SqlFolderDataSource.contentReads]]).
  *
  * Schema: (id string, name string, sql string) = the reference's file dict
  * minus transport fields (`src/loader.py:114-119`). One InputPartition per
  * file: content reads parallelize across executors.
  */
class SqlFolderDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sqlfolder"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SqlFolderDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SqlFolderTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("sqlfolder: missing path")))
}

object SqlFolderDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("sql", StringType, nullable = false)))

  /** Test hook: number of file-content reads performed (column pruning
    * should keep this at zero for queries not touching `sql`).
    */
  val contentReads = new AtomicLong(0)
}

final class SqlFolderTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sqlfolder($path)"
  override def schema(): StructType = SqlFolderDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SqlFolderScanBuilder(path)
}

final class SqlFolderScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SqlFolderDataSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("name", _: String) => true
      case StringEndsWith("name", _) => true
      case StringStartsWith("name", _) => true
      case StringContains("name", _) => true
      case _ => false
    }
    pushed = supported
    rest // Spark re-evaluates the remainder above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SqlFolderScan(path, pushed, required)
}

final class SqlFolderScan(path: String, filters: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SqlFolderScan path=$path pushed=[${filters.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(", ")}]"

  private def nameMatches(name: String): Boolean = filters.forall {
    case EqualTo("name", v: String) => name == v
    case StringEndsWith("name", v) => name.endsWith(v)
    case StringStartsWith("name", v) => name.startsWith(v)
    case StringContains("name", v) => name.contains(v)
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    if (!Files.isDirectory(p)) return Array.empty
    val stream = Files.list(p)
    val files =
      try stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filter(_.getFileName.toString.endsWith(".sql")) // src/loader.py:200
        .map(_.toString).toSeq.sorted
      finally stream.close()
    files
      .filter(f => nameMatches(stripName(f)))
      .map(f => SqlFilePartition(f): InputPartition).toArray
  }

  private def stripName(file: String): String =
    Paths.get(file).getFileName.toString.stripSuffix(".sql")

  override def createReaderFactory(): PartitionReaderFactory =
    new SqlFolderReaderFactory(required.fieldNames)
}

final case class SqlFilePartition(file: String) extends InputPartition

final class SqlFolderReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SqlFilePartition].file
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      // all IO happens in next(); get() is a pure accessor (the DSv2
      // contract allows repeated get() calls per next())
      override def next(): Boolean = {
        if (done) return false
        done = true
        val name = Paths.get(file).getFileName.toString.stripSuffix(".sql")
        val values: Array[Any] = columns.map {
          case "id" => UTF8String.fromString(file)
          case "name" => UTF8String.fromString(name)
          case "sql" =>
            SqlFolderDataSource.contentReads.incrementAndGet()
            UTF8String.fromString(Files.readString(Paths.get(file)))
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
