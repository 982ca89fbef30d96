package graft.sources.pgcopy

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.codec.{PgBinaryReader, PgBinaryWriter}
import graft.types.PgType

/** DataSource V2 for PGCOPY binary **files**:
  * `df.write.format("pgcopy").save(path)` writes files a Postgres
  * server could ingest with `COPY ... FROM ... (FORMAT binary)`, and
  * `spark.read.format("pgcopy").schema(s).load(path)` reads them back.
  *
  * Mirrors the reference's `COPY ... TO 'f' (FORMAT postgres_binary)`
  * copy function (ref: src/postgres_binary_copy.cpp:8-103) as an
  * idiomatic Spark connector:
  *   - one InputPartition per file (PGCOPY has no internal split
  *     points — parallelism comes from writing many part files, which
  *     the write side does per task),
  *   - column pruning skips decoding of unneeded fields (the wire
  *     framing length-prefixes every value, so skipping is O(1) per
  *     field),
  *   - schema is caller-supplied (the format is schemaless on disk).
  */
class PgCopyDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pgcopy"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "pgcopy files carry no schema; call .schema(...) on the reader")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PgCopyTable(schema, properties.asScala.toMap)
}

final class PgCopyTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {

  private def path: String = props.getOrElse("path",
    throw new IllegalArgumentException("pgcopy requires a path"))

  override def name(): String = s"pgcopy:$path"
  override def schema(): StructType = schema

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PgCopyScanBuilder(schema, path, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PgCopyWriteBuilder(info.schema(), path)
}

final class PgCopyScanBuilder(
    fullSchema: StructType,
    path: String,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PgCopyScan(fullSchema, required, path)
}

final class PgCopyScan(fullSchema: StructType, required: StructType, path: String)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val hconf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files: Array[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => PgCopyInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val hconf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new PgCopyReaderFactory(fullSchema, required, hconf)
  }
}

final case class PgCopyInputPartition(file: String) extends InputPartition

final class PgCopyReaderFactory(
    fullSchema: StructType,
    required: StructType,
    hconf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PgCopyPartitionReader(
      partition.asInstanceOf[PgCopyInputPartition].file, fullSchema, required, hconf.value)
}

/** Streams one PGCOPY file; decodes only the required columns (the
  * rest are length-skipped). */
final class PgCopyPartitionReader(
    file: String,
    fullSchema: StructType,
    required: StructType,
    hconf: Configuration)
    extends PartitionReader[InternalRow] {

  private val pgTypes = fullSchema.fields.map(f => PgType.fromSpark(f.dataType))
  private val reader = new PgBinaryReader(pgTypes.toSeq, fullSchema.fields.map(_.dataType).toSeq)
  private val requiredIdx: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))
  private val posInRequired: Map[Int, Int] = requiredIdx.zipWithIndex.toMap

  private val in: graft.codec.PgBlockInput = {
    val p = new Path(file)
    val fs = p.getFileSystem(hconf)
    val s = new graft.codec.PgBlockInput(fs.open(p))
    reader.readHeader(s)
    s
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    val nfields =
      try in.readShort()
      catch { case _: java.io.EOFException => return false }
    if (nfields < 0) return false
    val row = new GenericInternalRow(requiredIdx.length)
    var i = 0
    while (i < nfields) {
      val len = in.readInt()
      posInRequired.get(i) match {
        case Some(outIdx) =>
          if (len < 0) row.setNullAt(outIdx)
          else {
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            row.update(outIdx,
              reader.readValue(bytes, pgTypes(i), fullSchema.fields(i).dataType))
          }
        case None =>
          if (len > 0) in.skipFully(len) // pruned column: skip, don't decode
      }
      i += 1
    }
    current = row
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()
}

// ------------------------------------------------------------------ //
// Write side
// ------------------------------------------------------------------ //

final class PgCopyWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new PgCopyBatchWrite(schema, path, doTruncate,
        new SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
  }
}

final class PgCopyBatchWrite(
    schema: StructType,
    path: String,
    truncate: Boolean,
    hconf: SerializableConfiguration)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf.value)
    if (truncate && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    new PgCopyWriterFactory(schema, path, hconf)
  }

  // Task files are written under a hidden staging dir and moved into
  // place on job commit — the standard Spark commit protocol shape.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(hconf.value)
    messages.foreach { case PgCopyCommitMessage(staged) =>
      val s = new Path(staged)
      fs.rename(s, new Path(path, s.getName.stripPrefix(".staged-")))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(hconf.value)
    messages.foreach {
      case PgCopyCommitMessage(staged) => fs.delete(new Path(staged), false)
      case _ =>
    }
  }
}

final case class PgCopyCommitMessage(stagedFile: String) extends WriterCommitMessage

final class PgCopyWriterFactory(
    schema: StructType,
    path: String,
    hconf: SerializableConfiguration)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PgCopyDataWriter(schema, path, partitionId, taskId, hconf.value)
}

final class PgCopyDataWriter(
    schema: StructType,
    path: String,
    partitionId: Int,
    taskId: Long,
    hconf: Configuration)
    extends DataWriter[InternalRow] {

  private val pgTypes = schema.fields.map(f => PgType.fromSpark(f.dataType)).toSeq
  private val writer = new PgBinaryWriter(pgTypes, schema.fields.map(_.dataType).toSeq)
  private val staged = new Path(path,
    f".staged-part-$partitionId%05d-${UUID.randomUUID().toString.take(8)}.pgcopy")
  private val out: DataOutputStream = {
    val fs = staged.getFileSystem(hconf)
    val s = new DataOutputStream(new BufferedOutputStream(fs.create(staged, true), 1 << 16))
    writer.writeHeader(s)
    s
  }

  override def write(record: InternalRow): Unit = writer.writeRow(out, record)

  override def commit(): WriterCommitMessage = {
    writer.writeTrailer(out)
    out.close()
    PgCopyCommitMessage(staged.toString)
  }

  override def abort(): Unit = {
    out.close()
    val fs = staged.getFileSystem(hconf)
    if (fs.exists(staged)) fs.delete(staged, false)
  }

  override def close(): Unit = ()
}
