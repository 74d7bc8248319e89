package graft.sources.sheets

import java.io.{BufferedWriter, FileWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** "Sheets"-shaped DataSource V2 sink (SURVEY.md §7 step 3): the one
  * genuinely custom connector in the reference's pipeline, re-expressed as a
  * Spark `TableProvider` + `SupportsWrite`.
  *
  * Semantics carried over from `/root/reference/src/loader.py`:
  *  - upsert-by-name: one logical spreadsheet per `name` option; an existing
  *    sheet with that name is replaced in place, else created
  *    (`src/loader.py:159-179`) — here `<dest>/<name>.csv` with an atomic
  *    temp-file + move;
  *  - all-string coercion: the reference spools through `csv.writer`
  *    (`src/loader.py:239-245`), so values are stringified at the sink
  *    boundary (timestamps UTC, null -> empty, minimal CSV quoting like
  *    Python's csv module);
  *  - 2,000,000-cell guard incl. header row: over-limit results are
  *    SKIPPED, not truncated (`src/loader.py:250-253`) — enforced in
  *    `BatchWrite.commit` from per-task row counts, so no second count job
  *    runs and no partial sheet is ever visible;
  *  - zero-egress: a local destination directory emulates the Drive folder
  *    through [[LocalFolderTransport]]; a production build swaps in a
  *    resumable-upload client (`src/loader.py:180-183`) behind the
  *    [[SheetTransport]] interface — a type, not a comment.
  *
  * Scale notes: tasks write CSV parts in parallel (no driver bottleneck);
  * `commit` concatenates parts in partition order — safe here because the
  * cell cap bounds every committed sheet to <2M cells, i.e. the merge is
  * O(bounded) regardless of cluster size. Oversize results are detected
  * from commit-message counts BEFORE any merge work happens.
  */
class SheetsSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sheets"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // only reads reach this (supportsExternalMetadata=true routes the
    // query's schema straight to getTable on writes), so a path with no
    // sheets must fail loudly here — not degrade to a 0-column frame
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("sheets read: missing path"))
    SheetsRead.inferSchema(path, Option(options.get("name")))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SheetsTable(schema,
      Option(properties.get("path")), Option(properties.get("name")))
}

final class SheetsTable(tblSchema: StructType, dir: Option[String],
    sheetName: Option[String]) extends Table
    with SupportsWrite with SupportsRead with SupportsRowLevelOperations {
  override def name(): String = "sheets"
  override def schema(): StructType = tblSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val d = Option(options.get("path")).orElse(dir).getOrElse(
      throw new IllegalArgumentException("sheets read: missing path"))
    new SheetsScanBuilder(d, Option(options.get("name")).orElse(sheetName), tblSchema)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    writeBuilder(info, rowLevel = false)

  private def writeBuilder(info: LogicalWriteInfo, rowLevel: Boolean): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // upsert-by-name IS the overwrite
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          val opts = info.options()
          // options first (the path/format API), then the catalog-bound
          // identity (SQL DML through SheetsCatalog carries no options)
          val dest = Option(opts.get("path")).orElse(dir).getOrElse(
            throw new IllegalArgumentException("sheets sink: missing path"))
          val sheet = Option(opts.get("name")).orElse(sheetName).getOrElse(
            throw new IllegalArgumentException("sheets sink: missing 'name' option"))
          val limit = Option(opts.get("cellLimit")).map(_.toLong)
            .getOrElse(graft.etl.CellGuard.DefaultLimit)
          // transport selection: an `endpoint` option routes publication
          // through the chunked resumable-upload client (an `authToken`
          // option becomes its per-request credential supplier — the
          // config-only production swap); default stays the zero-egress
          // local folder
          val auth: () => Option[String] = Option(opts.get("authToken")) match {
            case Some(tok) => () => Some(tok)
            case None => () => None
          }
          val transport: SheetTransport = Option(opts.get("endpoint"))
            .map(e => new ResumableHttpTransport(e, credentials = auth))
            .getOrElse(new LocalFolderTransport(dest))
          new SheetsBatchWrite(dest, sheet, limit, info.schema(), transport,
            rowLevel)
        }
      }
    }

  /** Row-level SQL (`MERGE INTO` / `UPDATE` / `DELETE`) as a GROUP-BASED
    * rewrite where the group is the WHOLE SHEET: the operation's scan
    * reads the sheet, Catalyst computes the surviving + updated + inserted
    * rows, and the operation's write atomically replaces the sheet through
    * the same cell-guarded upsert transport every other write takes. A
    * sheet is bounded by the 2M-cell guard, so whole-sheet-as-group is the
    * honest granularity (there are no per-file deltas to be finer than) —
    * the same reasoning that makes q153's merge-on-read the right shape
    * for unbounded parquet picks whole-group rewrite for bounded sheets.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    val table = this
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"sheets whole-sheet rewrite [${info.command()}]"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        table.newScanBuilder(options)
      // rowLevel = true: with no requiredMetadataAttributes, Spark's
      // group-based ReplaceData hands the writer the RAW rewrite rows —
      // a leading `__row_operation` int column ahead of the table columns
      // (only DataAndMetadataWritingSparkTask applies the row projection,
      // and it is chosen only when metadata attrs exist; verified against
      // ReplaceDataExec.writingTask in Spark 4.1) — so the writer must
      // skip field 0. The declared LogicalWriteInfo schema stays the
      // table schema, which is what the sheet header must carry anyway.
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
        table.writeBuilder(winfo, rowLevel = true)
    }
  }
}

final case class SheetsCommitMessage(partPath: String, rows: Long)
  extends WriterCommitMessage

/** Transport seam for the commit stage — WHERE an assembled sheet goes,
  * typed instead of documented: the sink streams the complete sheet body
  * through `content` and the transport publishes it under `name`,
  * atomically replacing any existing sheet of that name (the reference's
  * update-else-create upsert, `src/loader.py:159-179`).
  *
  * [[LocalFolderTransport]] is the zero-egress implementation (temp file +
  * atomic move into a local folder). A production deployment swaps in a
  * resumable-upload client (`src/loader.py:78-102,180-183` — start a
  * session, stream chunks, finalize-or-abort) behind this same interface;
  * the sink's assembly, cell-guard and commit bookkeeping don't change.
  */
trait SheetTransport {
  def upsert(name: String, content: java.io.Writer => Unit): Unit
}

/** `<dest>/<name>.csv` with temp-file + ATOMIC_MOVE — readers never see a
  * partially written sheet, matching the all-or-nothing finalize of a
  * resumable upload.
  */
final class LocalFolderTransport(dest: String) extends SheetTransport {
  override def upsert(name: String, content: java.io.Writer => Unit): Unit = {
    val target = Paths.get(dest, s"$name.csv")
    val tmp = Paths.get(dest, s".$name.csv.tmp")
    Files.createDirectories(Paths.get(dest))
    val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    try content(out) finally out.close()
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE) // update-in-place upsert (:168-174)
  }
}

final case class CommitMeta(name: String, rows: Long, cells: Long, skipped: Boolean)

object SheetsSink {
  /** Driver-side per-sheet commit records (read-and-removed by EtlRunner to
    * distinguish loaded vs cell-guard-skipped — the reference logged and
    * continued, `src/loader.py:250-253`). Keyed by sheet name so concurrent
    * or interleaved writes cannot misattribute another sheet's counts.
    */
  private val commits =
    new java.util.concurrent.ConcurrentHashMap[String, CommitMeta]()
  private[sheets] def recordCommit(m: CommitMeta): Unit = commits.put(m.name, m)
  def takeCommit(name: String): Option[CommitMeta] = Option(commits.remove(name))
}

final class SheetsBatchWrite(dest: String, sheet: String, cellLimit: Long,
    schema: StructType,
    transport: SheetTransport,
    rowLevel: Boolean = false) extends BatchWrite {

  def this(dest: String, sheet: String, cellLimit: Long, schema: StructType) =
    this(dest, sheet, cellLimit, schema, new LocalFolderTransport(dest))

  private val staging = Paths.get(dest, s".staging-$sheet-${java.util.UUID.randomUUID()}")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    new SheetsWriterFactory(staging.toString, schema,
      if (rowLevel) 1 else 0) // skip the leading __row_operation column
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[SheetsCommitMessage])
    val rows = msgs.map(_.rows).sum
    val cells = graft.etl.CellGuard.cells(rows, schema.length)
    if (cells >= cellLimit) {
      // reference behavior: log error, skip the upload entirely (:250-253)
      cleanup()
      SheetsSink.recordCommit(CommitMeta(sheet, rows, cells, skipped = true))
      return
    }
    transport.upsert(sheet, { out =>
      out.write(schema.fieldNames.map(CsvFormat.quote).mkString(",")) // header, src/loader.py:240
      out.write("\n")
      msgs.sortBy(_.partPath).foreach { m =>
        val p = Paths.get(m.partPath)
        if (Files.exists(p)) {
          val in = Files.newBufferedReader(p, StandardCharsets.UTF_8)
          try {
            val buf = new Array[Char](64 * 1024)
            var n = in.read(buf)
            while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        }
      }
    })
    cleanup()
    SheetsSink.recordCommit(CommitMeta(sheet, rows, cells, skipped = false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    if (Files.exists(staging)) {
      val stream = Files.list(staging)
      try stream.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally stream.close()
      Files.deleteIfExists(staging)
    }
}

final class SheetsWriterFactory(stagingDir: String, schema: StructType,
    fieldOffset: Int = 0) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SheetsDataWriter(stagingDir, partitionId, taskId, schema, fieldOffset)
}

/** Per-task CSV part writer: row-streamed like the reference's temp-file
  * spool (`src/loader.py:236-246`) — O(1) memory in rows. `fieldOffset` is
  * 1 for row-level rewrites, whose physical rows carry Spark's leading
  * `__row_operation` column ahead of the declared schema.
  */
final class SheetsDataWriter(stagingDir: String, partitionId: Int, taskId: Long,
    schema: StructType, fieldOffset: Int = 0) extends DataWriter[InternalRow] {

  // part file named so commit-time sort restores partition order
  private val path = Paths.get(stagingDir, f"part-$partitionId%05d-$taskId")
  private val out = new BufferedWriter(new FileWriter(path.toFile, StandardCharsets.UTF_8))
  private var rows = 0L
  private val converters: Array[Any => String] =
    schema.fields.map(f => CsvFormat.converter(f.dataType))

  override def write(row: InternalRow): Unit = {
    require(row.numFields == schema.length + fieldOffset,
      s"sheets writer: row arity ${row.numFields} != schema ${schema.length} " +
        s"+ offset $fieldOffset (${schema.fieldNames.mkString(",")})")
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(',')
      if (!row.isNullAt(i + fieldOffset)) // null -> empty cell, like csv.writer on None
        sb.append(CsvFormat.quote(
          converters(i)(row.get(i + fieldOffset, schema(i).dataType))))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    SheetsCommitMessage(path.toString, rows)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(path) }
  override def close(): Unit = ()
}

/** String coercion + minimal quoting emulating Python's `csv.writer`
  * defaults (quote only when needed; embedded quotes doubled).
  */
object CsvFormat {
  def quote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def converter(dt: DataType): Any => String = dt match {
    case StringType => v => v.asInstanceOf[UTF8String].toString
    case TimestampType => v =>
      DateTimeUtils.microsToInstant(v.asInstanceOf[Long]).toString // UTC ISO-8601
    // session-local timestamp without zone: ISO-8601 local form. Before the
    // strict fallback below existed this type fell through to toString and
    // published RAW MICROS as a number — deterministic, so the fidelity
    // check (same converter both sides) could never flag it; the strict
    // rejection surfaced it on the first full-registry publish
    case TimestampNTZType => v =>
      DateTimeUtils.microsToLocalDateTime(v.asInstanceOf[Long]).toString
    case DateType => v =>
      DateTimeUtils.daysToLocalDate(v.asInstanceOf[Int]).toString
    case _: DecimalType => v =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toPlainString
    case BinaryType => v =>
      java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]])
    case DoubleType | FloatType => v => {
      // plain decimal, not scientific: python csv.writer writes str(float)
      // ("101849260.91", never "1.0184926091E8"); keep shortest-repr digits.
      // NaN/Infinity have no BigDecimal form -> python-style literals
      val str = v.toString
      str match {
        case "NaN" => "nan"
        case "Infinity" => "inf"
        case "-Infinity" => "-inf"
        case _ => new java.math.BigDecimal(str).toPlainString
      }
    }
    case ByteType | ShortType | IntegerType | LongType | BooleanType =>
      v => v.toString
    // nested internal values (ArrayData / InternalRow / MapData) have no
    // stable string form — Object.toString varies per evaluation, so a
    // published cell could never round-trip (and the fidelity check would
    // report a spurious divergence instead of the real cause). Reject at
    // converter-construction time so the write fails naming the type,
    // before a single row is spooled.
    case other => throw new UnsupportedOperationException(
      s"sheets CSV cannot serialize a ${other.catalogString} column: " +
        "project nested values to a string (to_json / array_join) before " +
        "publishing")
  }
}
