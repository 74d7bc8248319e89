package graft.sources.sheets

import java.io.{BufferedReader, Reader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Batch READ side of the sheets connector — symmetry with the write path
  * (the reference's loader is write-only, `/root/reference/src/loader.py`;
  * reading sheets back is the natural round-trip a pipeline needs to
  * validate what it published).
  *
  * Layout mirrors the sink: one `<name>.csv` per logical sheet under the
  * destination directory. Schema comes from the header row (all-string,
  * nullable — sheets store strings; the sink stringified on the way in).
  * One InputPartition per sheet: a sheet is bounded by the 2M-cell guard,
  * so per-sheet parallelism is the right granularity and a reader never
  * splits a quoted record across tasks. Column pruning is pushed into the
  * parser (skipped fields are scanned, not materialized).
  *
  * Cell semantics: an empty unquoted cell reads as NULL (the sink writes
  * null that way; CSV cannot distinguish it from an empty string).
  */
object SheetsRead {
  /** Non-hidden `*.csv` files, one per sheet; `name` narrows to one sheet. */
  def sheetFiles(dir: String, name: Option[String]): Seq[Path] = {
    val base = Paths.get(dir)
    name match {
      case Some(n) =>
        val p = base.resolve(s"$n.csv")
        if (!Files.exists(p))
          throw new IllegalArgumentException(s"sheets read: no sheet '$n' in $dir")
        Seq(p)
      case None =>
        if (!Files.isDirectory(base)) return Seq.empty
        val stream = Files.list(base)
        try stream.iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".csv") &&
            !p.getFileName.toString.startsWith("."))
          .toSeq.sortBy(_.getFileName.toString)
        finally stream.close()
    }
  }

  /** Header-derived all-string schema; every selected sheet must agree. */
  def inferSchema(dir: String, name: Option[String]): StructType = {
    val files = sheetFiles(dir, name)
    if (files.isEmpty)
      throw new IllegalArgumentException(s"sheets read: no sheets in $dir")
    val headers = files.map { f =>
      val in = Files.newBufferedReader(f, StandardCharsets.UTF_8)
      try f -> Option(CsvRecordReader.read(in)).getOrElse(Array.empty[String])
      finally in.close()
    }
    val first = headers.head._2.toSeq
    headers.find(_._2.toSeq != first).foreach { case (f, h) =>
      throw new IllegalArgumentException(
        s"sheets read: header mismatch — ${headers.head._1} has $first, $f has ${h.toSeq}")
    }
    // duplicate header names would silently collapse onto one reader slot
    // (positions are resolved by name) — same loud-failure policy as the
    // header-mismatch check above
    val dups = first.groupBy(identity).collect { case (c, occ) if occ.size > 1 => c }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"sheets read: duplicate header column(s) ${dups.mkString(", ")} in ${headers.head._1}")
    StructType(first.map(c => StructField(c, StringType, nullable = true)))
  }
}

/** Streaming CSV record parser matching [[CsvFormat]]'s writer dialect
  * (minimal quoting, doubled embedded quotes, records may span lines when a
  * quoted cell contains newlines). Returns null at EOF.
  */
object CsvRecordReader {
  def read(in: Reader): Array[String] = {
    val fields = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var quoted = false   // currently inside a quoted cell
    var wasQuoted = false // current cell used quotes (""=empty string, not null)
    var c = in.read()
    if (c == -1) return null // true EOF — the writer ends every record with \n
    var done = false
    while (!done) {
      if (c == -1) {
        done = true
      } else if (quoted) {
        if (c == '"') {
          val n = in.read()
          if (n == '"') { cur.append('"'); c = in.read() }
          else { quoted = false; c = n }
        } else { cur.append(c.toChar); c = in.read() }
      } else c match {
        case '"' => quoted = true; wasQuoted = true; c = in.read()
        case ',' =>
          fields += (if (cur.length == 0 && !wasQuoted) null else cur.toString)
          cur.setLength(0); wasQuoted = false; c = in.read()
        case '\r' => c = in.read() // writer never emits bare \r; swallow
        case '\n' => done = true
        case ch => cur.append(ch.toChar); c = in.read()
      }
    }
    // NB: an empty line is a legitimate record — a single-column NULL row
    // writes as one (empty cell + newline); treating it as EOF would drop
    // that row and everything after it
    fields += (if (cur.length == 0 && !wasQuoted) null else cur.toString)
    fields.toArray
  }
}

final class SheetsScanBuilder(dir: String, name: Option[String], full: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SheetsScan(dir, name, full, required)
}

final case class SheetPartition(file: String) extends InputPartition

final class SheetsScan(dir: String, name: Option[String], full: StructType,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"sheets dir=$dir${name.map(n => s" name=$n").getOrElse("")}"
  override def planInputPartitions(): Array[InputPartition] =
    SheetsRead.sheetFiles(dir, name)
      .map(f => SheetPartition(f.toString): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SheetsReaderFactory(full, required)
}

final class SheetsReaderFactory(full: StructType, required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SheetsPartitionReader(p.asInstanceOf[SheetPartition].file, full, required)
}

/** One sheet, streamed record-at-a-time — O(1) memory in rows, like the
  * writer. Header is consumed and mapped once; pruned columns never become
  * UTF8Strings.
  */
final class SheetsPartitionReader(file: String, full: StructType,
    required: StructType) extends PartitionReader[InternalRow] {

  private val in: BufferedReader =
    Files.newBufferedReader(Paths.get(file), StandardCharsets.UTF_8)
  // header positions -> required-schema slots (-1 = pruned away)
  private val slotFor: Array[Int] = {
    val header = Option(CsvRecordReader.read(in)).getOrElse(Array.empty[String])
    header.map(h => required.fieldNames.indexOf(h))
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    val rec = CsvRecordReader.read(in)
    if (rec == null) { row = null; false }
    else {
      val values = new Array[Any](required.length)
      var i = 0
      while (i < rec.length && i < slotFor.length) {
        val slot = slotFor(i)
        if (slot >= 0 && rec(i) != null) values(slot) = UTF8String.fromString(rec(i))
        i += 1
      }
      row = new GenericInternalRow(values)
      true
    }
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
