package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.jsonb.{Jsonb, JNum, JObj}

/** ForeignScan analog (SURVEY §2.1): a Spark DataSource V2 connector
  * for JSONL graph-element dumps — the interchange shape of the
  * reference's COPY/dump tooling: one JSON object per line with an
  * `id` and the remaining keys forming the jsonb `properties`
  * document.
  *
  * Spark-native structure: one InputPartition per file (parallel scan),
  * column pruning via SupportsPushDownRequiredColumns, and id-range
  * predicate pushdown via SupportsPushDownFilters (the graphid filters
  * MATCH compiles to), so `spark.read.format("graft-jsonl-graph")`
  * composes with the rest of the engine like any built-in source.
  *
  * Usage:
  *   spark.read.format("graft-jsonl-graph").load("/path/dir-or-file")
  * Schema: (id BIGINT, properties STRING /* canonical jsonb */).
  */
class JsonlGraphSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl-graph"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlGraphSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JsonlGraphTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-jsonl-graph requires a path")))
}

object JsonlGraphSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("properties", StringType, nullable = false)))

  private[sources] def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().toSeq.filter(_.isFile).map(_.getPath).sorted
    else Seq(path)
  }
}

final class JsonlGraphTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-jsonl-graph($path)"
  override def schema(): StructType = JsonlGraphSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonlWriteBuilder(path, info.schema())
}

/** ForeignScan's write half — the COPY TO / dump-sink analog: each
  * task streams its partition to one `part-*.jsonl` file (no driver
  * funnel, the same one-file-per-partition parallelism as the read
  * side), renders through the engine's jsonb model so output lines
  * are canonical, and follows the DSv2 commit protocol (task files
  * are deleted on abort; overwrite-mode truncates the directory on
  * the driver before tasks launch).
  */
final class JsonlWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new JsonlBatchWrite(path, schema, doTruncate)
  }
}

final class JsonlBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  private def idx(name: String): Int = {
    val i = schema.fieldNames.indexOf(name)
    require(i >= 0, s"graft-jsonl-graph write requires column '$name'; " +
      s"got ${schema.simpleString}")
    i
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val (idIdx, propsIdx) = (idx("id"), idx("properties"))
    require(schema(idIdx).dataType == LongType &&
      schema(propsIdx).dataType == StringType,
      s"graft-jsonl-graph write schema must be (id BIGINT, properties " +
        s"STRING); got ${schema.simpleString}")
    val dir = new java.io.File(path)
    if (dir.isFile) throw new IllegalArgumentException(
      s"graft-jsonl-graph write target is an existing file: $path")
    dir.mkdirs()
    if (truncate)
      dir.listFiles().filter(_.isFile).foreach(_.delete())
    new JsonlWriterFactory(path, idIdx, propsIdx)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case JsonlCommitMessage(f) => new java.io.File(f).delete()
      case _ =>
    }
}

final case class JsonlCommitMessage(file: String) extends WriterCommitMessage

final class JsonlWriterFactory(path: String, idIdx: Int, propsIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new JsonlDataWriter(
      s"$path/part-$partitionId-$taskId.jsonl", idIdx, propsIdx)
}

final class JsonlDataWriter(file: String, idIdx: Int, propsIdx: Int)
    extends DataWriter[InternalRow] {
  private lazy val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(file), java.nio.charset.StandardCharsets.UTF_8))
  private var any = false

  override def write(row: InternalRow): Unit = {
    val id = row.getLong(idIdx)
    val props = Jsonb.parse(row.getUTF8String(propsIdx).toString) match {
      case JObj(fields) => fields.filterNot(_._1 == "id")
      case other => throw new IllegalArgumentException(
        s"graft-jsonl-graph: properties must be a jsonb object, got " +
          s"${other.getClass.getSimpleName}")
    }
    // id leads each line, mirroring the read side's extraction
    out.write(JObj(("id" -> JNum(new JBigDecimal(id))) +: props).render)
    out.write("\n")
    any = true
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    // an empty partition still commits its (empty) file — harmless to
    // the reader, and keeps commit idempotent
    if (!any) new java.io.File(file).createNewFile()
    JsonlCommitMessage(file)
  }
  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    new java.io.File(file).delete()
  }
  override def close(): Unit = ()
}

final class JsonlScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = JsonlGraphSource.schema
  private var idFilters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // accept id-range/equality filters (evaluated while parsing, before
  // row materialization); everything else stays with Spark. Only LONG
  // comparison values are accepted: Spark does NOT re-evaluate pushed
  // filters post-scan, so accepting a value shape the reader's
  // idPasses can't apply would silently return unfiltered rows.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("id", _: java.lang.Long) |
        GreaterThan("id", _: java.lang.Long) |
        GreaterThanOrEqual("id", _: java.lang.Long) |
        LessThan("id", _: java.lang.Long) |
        LessThanOrEqual("id", _: java.lang.Long) | IsNotNull("id") => true
      case _ => false
    }
    idFilters = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = idFilters

  override def build(): Scan = new JsonlScan(path, required, idFilters)
}

final class JsonlScan(path: String, required: StructType,
    idFilters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"JsonlGraphScan PushedFilters: [${idFilters.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    JsonlGraphSource.listFiles(path).map(JsonlFilePartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(required.fieldNames, idFilters)
}

final case class JsonlFilePartition(file: String) extends InputPartition

final class JsonlReaderFactory(columns: Array[String],
    idFilters: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonlPartitionReader(
      partition.asInstanceOf[JsonlFilePartition].file, columns, idFilters)
}

/** Streams one file line by line; parses through the engine's jsonb
  * model so `properties` comes out in canonical form (identical to the
  * catalog's own label tables).
  */
final class JsonlPartitionReader(file: String, columns: Array[String],
    idFilters: Array[Filter]) extends PartitionReader[InternalRow] {
  private val lines = scala.io.Source.fromFile(file, "UTF-8")
  private val it = lines.getLines()
  private var current: InternalRow = _

  private def idPasses(id: Long): Boolean = idFilters.forall {
    case EqualTo("id", v: Long) => id == v
    case GreaterThan("id", v: Long) => id > v
    case GreaterThanOrEqual("id", v: Long) => id >= v
    case LessThan("id", v: Long) => id < v
    case LessThanOrEqual("id", v: Long) => id <= v
    case _ => true
  }

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val line = it.next().trim
      if (line.nonEmpty) {
        Jsonb.parse(line) match {
          case JObj(fields) =>
            val id = fields.collectFirst { case ("id", JNum(n)) => n } match {
              case Some(n) => n.longValueExact()
              case _ => throw new IllegalArgumentException(
                s"graft-jsonl-graph: line without numeric id in $file")
            }
            if (idPasses(id)) {
              val props = JObj(fields.filterNot(_._1 == "id")).render
              val values = columns.map {
                case "id" => id: Any
                case "properties" => UTF8String.fromString(props): Any
              }
              current = InternalRow.fromSeq(values.toIndexedSeq)
            }
          case _ => throw new IllegalArgumentException(
            s"graft-jsonl-graph: non-object line in $file")
        }
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
