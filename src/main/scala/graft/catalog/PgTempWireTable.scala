package graft.catalog

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.codec.{PgBinaryReader, PgBinaryWriter}
import graft.meta.PgTransport
import graft.sqlgen.PgSqlGen
import graft.types.PgType

/** `pg_temp` table surfaced through the attached catalog over a WIRE
  * DSN — only meaningful while a [[graft.functions.PgFunctions.withTransaction]]
  * block has a connection pinned for the DSN (the reference reaches
  * temp tables the same single-connection way; its own test is
  * `mode skip` upstream — ref: test/sql/storage/attach_temporary_table.test).
  *
  * A temporary table exists on ONE server connection, so no
  * distributed plan can touch it directly; the cluster-honest shape:
  *
  *  - READS fetch the whole (column-pruned) table DRIVER-SIDE at plan
  *    time over the pinned connection as one PGCOPY byte payload,
  *    embedded in a single InputPartition whose reader just decodes
  *    bytes — executors never need the session connection.
  *  - WRITES buffer each task's rows as a self-contained PGCOPY stream
  *    in its commit message; the driver-side commit replays them as
  *    COPY FROM STDIN on the pinned connection, INSIDE the session
  *    transaction.
  *
  * Both directions are bounded by driver memory — the semantics of
  * temp tables in ported scripts (bounded scratch state), not a bulk
  * data path; the snapshot-consistent parallel scan is for that. A
  * hard byte cap (`pgTempMaxBytes`, default 64 MB, read/write option)
  * turns the would-be driver OOM from piping a large relation through
  * pg_temp into an immediate, actionable error. */
final class PgTempWireTable(
    dsn: String,
    table: String,
    cols: Seq[(String, PgType)])
    extends Table with SupportsRead with SupportsWrite {

  private val sparkSchema = StructType(cols.map { case (n, t) =>
    org.apache.spark.sql.types.StructField(n, PgType.toSpark(t))
  })

  override def name(): String = s"pg_temp.$table"
  override def schema(): StructType = sparkSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  // ------------------------------ read ------------------------------ //

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = sparkSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        // keep table column order; an empty prune (count(*)) keeps one
        // column so the COPY stays well-formed
        required = StructType(sparkSchema.fields.filter(f =>
          requiredSchema.fieldNames.contains(f.name))) match {
          case s if s.isEmpty => StructType(sparkSchema.fields.take(1))
          case s => s
        }
      override def build(): Scan =
        new PgTempScan(required, PgTempWireTable.maxBytes(options.get _))
    }

  private final class PgTempScan(required: StructType, cap: Long) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      // plan time runs on the DRIVER — the only place the pinned
      // session connection exists
      val t = PgTempWireTable.pinned(dsn, s"scan pg_temp.$table")
      val colList = required.fields
        .map(f => PgSqlGen.quoteIdent(f.name)).mkString(", ")
      val in = t.copyOut(
        s"""COPY (SELECT $colList FROM "pg_temp".${PgSqlGen.quoteIdent(table)})""" +
          " TO STDOUT (FORMAT binary)")
      // capped incremental read: fail with the pointer at the staged
      // write path BEFORE the payload can exhaust driver memory
      val bytes = try {
        val bos = new ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) {
          bos.write(chunk, 0, n)
          if (bos.size() > cap)
            PgTempWireTable.oversized(s"read of pg_temp.$table", cap)
          n = in.read(chunk)
        }
        bos.toByteArray
      } finally in.close()
      Array(PgTempPayloadPartition(bytes))
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val pgTypes = required.fields.map(f => cols.find(_._1 == f.name).get._2).toSeq
      val targets = required.fields.map(_.dataType).toSeq
      new PgTempReaderFactory(pgTypes, targets)
    }
  }

  // ------------------------------ write ----------------------------- //

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new PgTempBatchWrite(info.schema(), doTruncate,
          PgTempWireTable.maxBytes(info.options().get _))
      }
    }

  private final class PgTempBatchWrite(writeSchema: StructType, doTruncate: Boolean,
      cap: Long) extends BatchWrite {

    private val writeTypes: Seq[PgType] = writeSchema.fields.toSeq.map { f =>
      cols.find(_._1 == f.name).map(_._2).getOrElse(throw new IllegalArgumentException(
        s"column ${f.name} does not exist in pg_temp.$table"))
    }

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new PgTempWriterFactory(writeSchema, writeTypes, table, cap)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val t = PgTempWireTable.pinned(dsn, s"write pg_temp.$table")
      if (doTruncate)
        t.execute(s"""TRUNCATE "pg_temp".${PgSqlGen.quoteIdent(table)}""")
      val colList = writeSchema.fields.map(f => PgSqlGen.quoteIdent(f.name)).mkString(", ")
      messages.collect { case m: PgTempPayload if m.bytes.nonEmpty => m }.foreach { m =>
        // unqualified target: the session resolves its own temp schema
        // (spelling pg_temp_N is not ours to guess on a real server)
        val sink = t.copyIn(
          s"""COPY ${PgSqlGen.quoteIdent(table)} ($colList) FROM STDIN (FORMAT binary)""")
        try sink.write(m.bytes) finally sink.close()
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
}

object PgTempWireTable {

  /** Default byte cap on the driver-memory pg_temp payloads (either
    * direction); override per read/write with option `pgTempMaxBytes`. */
  val DefaultMaxBytes: Long = 64L * 1024 * 1024

  private[catalog] def maxBytes(get: String => String): Long =
    Option(get("pgTempMaxBytes")).map(_.trim.toLong).getOrElse(DefaultMaxBytes)

  private[catalog] def oversized(what: String, cap: Long): Nothing =
    throw new IllegalStateException(
      s"$what exceeds pgTempMaxBytes=$cap: pg_temp over a wire DSN round-trips " +
        "through driver memory and is meant for bounded scratch state. For bulk " +
        "data use a regular table through the staged parallel COPY path " +
        "(df.writeTo(\"<catalog>.<schema>.<table>\") / the snapshot scan), or " +
        "raise the pgTempMaxBytes read/write option if the payload is truly " +
        "driver-sized")

  private[catalog] def pinned(dsn: String, what: String): PgTransport =
    graft.functions.PgTxnRegistry.lookup(dsn).getOrElse(
      throw new IllegalStateException(
        s"cannot $what: the session transaction pinning this pg_temp table has " +
          "ended — pg_temp over a wire DSN lives inside one " +
          "PgFunctions.withTransaction block"))

  /** Bind the temp table's shape over the pinned connection (the only
    * connection that can see it). */
  def discover(dsn: String, table: String): PgTempWireTable = {
    val t = pinned(dsn, s"resolve pg_temp.$table")
    val cols = t.describe(
      s"""SELECT * FROM "pg_temp".${PgSqlGen.quoteIdent(table)}""")
    new PgTempWireTable(dsn, table, cols)
  }
}

/** Whole-table PGCOPY payload fetched driver-side at plan time. */
final case class PgTempPayloadPartition(bytes: Array[Byte]) extends InputPartition

final class PgTempReaderFactory(pgTypes: Seq[PgType],
    targets: Seq[org.apache.spark.sql.types.DataType]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val bytes = partition.asInstanceOf[PgTempPayloadPartition].bytes
    new PartitionReader[InternalRow] {
      private val in = new graft.codec.PgBlockInput(new java.io.ByteArrayInputStream(bytes))
      private val reader = new PgBinaryReader(pgTypes, targets)
      reader.readHeader(in)
      private var current: InternalRow = _
      override def next(): Boolean = reader.readRow(in) match {
        case Some(r) => current = r; true
        case None => false
      }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

/** One task's rows as a self-contained PGCOPY binary stream. */
final case class PgTempPayload(bytes: Array[Byte]) extends WriterCommitMessage

final class PgTempWriterFactory(writeSchema: StructType, pgTypes: Seq[PgType],
    table: String, cap: Long) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val bos = new ByteArrayOutputStream()
      private val out = new DataOutputStream(bos)
      private val writer = new PgBinaryWriter(
        pgTypes, writeSchema.fields.map(_.dataType).toSeq)
      private var any = false
      override def write(record: InternalRow): Unit = {
        if (!any) { writer.writeHeader(out); any = true }
        writer.writeRow(out, record)
        // fail in the task, before an oversized commit message ships
        // to (and accumulates on) the driver
        if (bos.size() > cap)
          PgTempWireTable.oversized(s"write task $taskId into pg_temp.$table", cap)
      }
      override def commit(): WriterCommitMessage = {
        if (any) writer.writeTrailer(out)
        out.flush()
        PgTempPayload(if (any) bos.toByteArray else Array.emptyByteArray)
      }
      override def abort(): Unit = ()
      override def close(): Unit = out.close()
    }
}
