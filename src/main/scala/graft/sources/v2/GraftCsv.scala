package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the engine's validated-CSV contract
  * (SURVEY.md §2.1 S7) — the "own a source end to end" demonstration the
  * file-format story needs: instead of reading everything and filtering in
  * the plan, the SCAN ITSELF prunes columns and evaluates pushed
  * predicates, which is the mechanism that makes "don't read what you
  * don't need" real at 100 TB (same contract Parquet honors via
  * PushedFilters/ReadSchema; here it is implemented, not just consumed).
  *
  * Surface: `spark.read.schema(s).format("graft.sources.v2.GraftCsv")
  * .load(dir)` over header-first, comma-separated, quote-free files (the
  * Sinks.writeCsv output shape). Supported types: int/long/double/string;
  * empty cell = NULL (the validated-source coercion contract).
  *
  * What Spark hands the implementation, and what it does with it:
  *  - `pruneColumns(required)` → the reader parses ONLY the required
  *    fields of each line (a row is never fully materialized; at scale
  *    this is the CSV analogue of Parquet column pruning — token-skipping
  *    instead of byte-skipping, the best a row format can do);
  *  - `pushFilters(filters)` → Eq/Gt/Ge/Lt/Le/IsNull/IsNotNull on any
  *    column are accepted and evaluated PER LINE inside the partition
  *    reader, before the row is emitted; unsupported shapes (And/Or/
  *    StringContains/...) are returned as postScanFilters and Spark keeps
  *    its own Filter node for them — the standard split contract;
  *  - partition planning → one InputPartition per data file (a real
  *    multi-executor source; a production variant would further split by
  *    byte range with line-boundary fixup, which header-bearing CSV makes
  *    offset-dependent — out of scope for the contract demo).
  *
  * Pushed-filter evaluation happens on the TYPED parsed value of only the
  * referenced columns, so a filtered scan parses `referenced ∪ required`
  * fields per line and drops failing lines without building output rows.
  */
class GraftCsv extends TableProvider {

  // user-supplied schema is the contract (never infer at scale); header
  // inference exists so schema-less exploration still works
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = GraftCsv.listDataFiles(options.get("path"))
    // empty/nonexistent target: no schema to infer — legal for the WRITE
    // path (the writer takes its schema from the incoming data); a read
    // of an empty table with a user schema yields an empty result
    if (files.isEmpty) return StructType(Nil)
    val fs = files.head.getFileSystem(new Configuration())
    val in = fs.open(files.head)
    val header = try {
      new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8")).readLine()
    } finally in.close()
    StructType(header.split(",", -1).map(n => StructField(n, StringType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftCsvTable(schema, properties.get("path"))
}

object GraftCsv {
  /** Data files under `path` (header-bearing part files; no _SUCCESS etc). */
  def listDataFiles(path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p)
    else fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .sortBy(_.getName.toString)
  }
}

class GraftCsvTable(tblSchema: StructType, path: String)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftcsv:$path"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCsvScanBuilder(tblSchema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftCsvWriteBuilder(info.schema(), path, info.queryId())
}

/** WRITE path of the V2 contract — the "own a sink end to end"
  * counterpart of the pruning/pushdown scan: executors stream rows to
  * per-task TEMP files under `_tmp-<queryId>/`; each task's commit message
  * carries its temp path; the DRIVER's `commit` renames them into place
  * (and under `overwrite`/truncate first deletes the previous
  * generation). Files therefore appear in the table only after every
  * task succeeded — speculative duplicates and failed attempts abort and
  * delete their own temp file, never the table. This is the same
  * rename-based two-phase protocol Hadoop FileOutputCommitter v1 uses;
  * on object stores a production variant substitutes multipart-upload
  * completion for rename, same shape.
  *
  * Cell contract matches the reader: int/long/double/string, NULL = empty
  * cell, quote-free — a cell containing the separator or a newline is
  * rejected LOUDLY at write time (the validated-source philosophy: fail
  * the job, don't corrupt the table). */
class GraftCsvWriteBuilder(schema: StructType, path: String, queryId: String)
  extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftCsvBatchWrite(schema, path, queryId, doTruncate)
  }
}

class GraftCsvBatchWrite(schema: StructType, path: String, queryId: String,
                         truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCsvWriterFactory(schema, path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(path)
    val fs = base.getFileSystem(new Configuration())
    if (truncate) GraftCsv.listDataFiles(path).foreach(f => fs.delete(f, false))
    messages.foreach { case GraftCsvCommit(tmp) =>
      val t = new Path(tmp)
      require(fs.rename(t, new Path(base, t.getName)),
        s"commit rename failed for $tmp")
    }
    fs.delete(new Path(base, s"_tmp-$queryId"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(path)
    base.getFileSystem(new Configuration())
      .delete(new Path(base, s"_tmp-$queryId"), true)
  }
}

case class GraftCsvCommit(tmpFile: String) extends WriterCommitMessage

class GraftCsvWriterFactory(schema: StructType, path: String, queryId: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCsvWriter(schema, path, queryId, partitionId, taskId)
}

class GraftCsvWriter(schema: StructType, path: String, queryId: String,
                     partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val tmp = new Path(
    new Path(path, s"_tmp-$queryId"),
    f"part-$partitionId%05d-$taskId.csv")
  private val fs = tmp.getFileSystem(new Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmp, true), "UTF-8"))
  out.write(schema.fieldNames.mkString(","))
  out.newLine()

  private def cell(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) ""
    else {
      val s = schema(i).dataType match {
        case IntegerType => row.getInt(i).toString
        case LongType => row.getLong(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => row.getUTF8String(i).toString
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
      require(!s.contains(',') && !s.contains('\n') && !s.contains('\r'),
        s"cell value contains the separator/newline (quote-free contract): '$s'")
      s
    }

  override def write(row: InternalRow): Unit = {
    out.write((0 until schema.length).map(cell(row, _)).mkString(","))
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftCsvCommit(tmp.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}

class GraftCsvScanBuilder(fullSchema: StructType, path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** A filter is pushable when it references one column with a
    * line-evaluable comparison; everything else stays with Spark. */
  private def pushable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull =>
      f.references.length == 1 && fullSchema.fieldNames.contains(f.references.head)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (p, rest) = filters.partition(pushable)
    pushed = p
    rest // residual: Spark keeps a post-scan Filter for these
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GraftCsvScan(fullSchema, required, pushed, path)
}

class GraftCsvScan(fullSchema: StructType, required: StructType,
                   pushed: Array[Filter], path: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCsvScan path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    GraftCsv.listDataFiles(path).map(f => GraftCsvPartition(f.toString)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCsvReaderFactory(fullSchema, required, pushed)
}

case class GraftCsvPartition(file: String) extends InputPartition

class GraftCsvReaderFactory(fullSchema: StructType, required: StructType,
                            pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftCsvReader(fullSchema, required, pushed,
      partition.asInstanceOf[GraftCsvPartition].file)
}

/** Per-partition reader: streams one file line by line, parses only the
  * fields the scan needs (required ∪ filter-referenced), applies pushed
  * filters on the typed values, and emits pruned InternalRows. */
class GraftCsvReader(fullSchema: StructType, required: StructType,
                     pushed: Array[Filter], file: String)
  extends PartitionReader[InternalRow] {

  private val fieldIdx: Map[String, Int] =
    fullSchema.fieldNames.zipWithIndex.toMap
  // field positions (in file order) that must be parsed at all
  private val neededNames: Set[String] =
    required.fieldNames.toSet ++ pushed.flatMap(_.references)
  private val outIdx: Array[Int] = required.fieldNames.map(fieldIdx)

  private val in = {
    val p = new Path(file)
    p.getFileSystem(new Configuration()).open(p)
  }
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, "UTF-8"))
  reader.readLine() // header

  private var current: InternalRow = _

  /** Typed parse of one cell; empty = NULL (validated-source contract). */
  private def parse(raw: String, dt: DataType): Any =
    if (raw.isEmpty) null
    else dt match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case DoubleType => raw.toDouble
      case StringType => UTF8String.fromString(raw)
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }

  /** Engine-side comparison on parsed values (types align with the
    * schema, so the cast in `compare` is total). */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue())
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue())
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
    case (x: UTF8String, y) => x.toString.compareTo(y.toString)
    case _ => throw new IllegalArgumentException(s"incomparable $a vs $b")
  }

  private def eval(f: Filter, vals: Array[Any]): Boolean = f match {
    case EqualTo(c, v) => vals(fieldIdx(c)) != null && cmp(vals(fieldIdx(c)), v) == 0
    case GreaterThan(c, v) => vals(fieldIdx(c)) != null && cmp(vals(fieldIdx(c)), v) > 0
    case GreaterThanOrEqual(c, v) => vals(fieldIdx(c)) != null && cmp(vals(fieldIdx(c)), v) >= 0
    case LessThan(c, v) => vals(fieldIdx(c)) != null && cmp(vals(fieldIdx(c)), v) < 0
    case LessThanOrEqual(c, v) => vals(fieldIdx(c)) != null && cmp(vals(fieldIdx(c)), v) <= 0
    case IsNull(c) => vals(fieldIdx(c)) == null
    case IsNotNull(c) => vals(fieldIdx(c)) != null
    case other => throw new IllegalStateException(s"unpushable filter $other")
  }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val cells = line.split(",", -1)
      val vals = new Array[Any](fullSchema.length)
      var i = 0
      while (i < fullSchema.length) {
        val f = fullSchema(i)
        if (neededNames.contains(f.name) && i < cells.length)
          vals(i) = parse(cells(i), f.dataType)
        i += 1
      }
      if (pushed.forall(eval(_, vals))) {
        current = InternalRow.fromSeq(outIdx.toSeq.map(vals))
        return true
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
