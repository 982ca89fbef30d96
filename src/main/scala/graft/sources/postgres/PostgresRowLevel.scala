package graft.sources.postgres

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.PgTransportFactory
import graft.sqlgen.PgSqlGen
import graft.types.PgType

/** Delta-based row-level operations (SQL `UPDATE` / `DELETE` / `MERGE`
  * on a connector table) keyed on the `_ctid` metadata row id — the
  * Spark `SupportsRowLevelOperations`+`SupportsDelta` shape of the
  * reference's physical UPDATE/DELETE sinks:
  *
  *   - DELETE: batched `DELETE ... WHERE ctid IN ('(p,r)', ...)`,
  *     flushed past ~3000 chars of tid list
  *     (ref: src/storage/postgres_delete.cpp:18-92, flush rule :75-78)
  *   - UPDATE: temp table + `UPDATE ... FROM tmp WHERE ctid =
  *     tmp.__page_id_string::tid`
  *     (ref: src/storage/postgres_update.cpp:31-153)
  *   - INSERT (from MERGE): COPY FROM STDIN like the append path.
  *
  * Each task runs its operations inside one transaction on its own
  * connection; ctid-keyed deletes/updates are idempotent, so Spark's
  * task retry is safe.
  */
final class PostgresRowLevelOperation(
    table: PostgresTable,
    cmd: RowLevelOperation.Command)
    extends SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PostgresScanBuilder(table)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new PostgresDeltaBatchWrite(table, info.schema())
      }
    }

  /** the physical row id the rewrite joins on */
  override def rowId(): Array[NamedReference] = Array(Expressions.column("_ctid"))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_ctid"))

  override def representUpdateAsDeleteAndInsert(): Boolean = false
}

final class PostgresDeltaBatchWrite(table: PostgresTable, writeSchema: StructType)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val opts = table.opts
    val tbl = opts.table.getOrElse(
      throw new IllegalArgumentException("row-level ops need a base table"))
    // data columns only; the row id travels separately in the delta API
    val dataFields = writeSchema.fields.toSeq.filter(_.name != "_ctid")
    val colNames = dataFields.map(_.name)
    val pgTypes = colNames.map(n => table.pgColumns.find(_._1 == n).getOrElse(
      throw new IllegalArgumentException(s"unknown column $n"))._2)
    new PostgresDeltaWriterFactory(opts.dsn, opts.schema, tbl,
      StructType(dataFields), colNames, pgTypes)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class PostgresDeltaWriterFactory(
    dsn: String,
    schema: String,
    table: String,
    dataSchema: StructType,
    colNames: Seq[String],
    pgTypes: Seq[PgType])
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new PostgresDeltaWriter(dsn, schema, table, dataSchema, colNames, pgTypes)
}

final class PostgresDeltaWriter(
    dsn: String,
    schema: String,
    table: String,
    dataSchema: StructType,
    colNames: Seq[String],
    pgTypes: Seq[PgType])
    extends DeltaWriter[InternalRow] {

  private val transport = PgTransportFactory.open(dsn)
  private val qname =
    s"${PgSqlGen.quoteIdent(schema)}.${PgSqlGen.quoteIdent(table)}"
  private val sparkTypes = dataSchema.fields.map(_.dataType).toSeq

  transport.execute("BEGIN")

  private def tidText(packed: Long): String =
    s"(${packed >>> 16},${packed & 0xffffL})"

  // ---- DELETE: batched ctid IN list ---- //
  private val delBuf = new StringBuilder
  private def flushDeletes(): Unit = if (delBuf.nonEmpty) {
    transport.execute(s"DELETE FROM $qname WHERE ctid IN ($delBuf)")
    delBuf.clear()
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (delBuf.nonEmpty) delBuf.append(", ")
    delBuf.append(s"'${tidText(id.getLong(0))}'::tid")
    if (delBuf.length > 3000) flushDeletes() // ref flush threshold
  }

  // ---- UPDATE: buffered, flushed through the temp-table protocol ---- //
  private val updBuf = ArrayBuffer.empty[(Long, InternalRow)]
  private val UpdFlushRows = 10000

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    updBuf += ((id.getLong(0), row.copy())) // Spark reuses row objects
    if (updBuf.length >= UpdFlushRows) flushUpdates()
  }

  /** COPY `rows` through whichever format the column set can
    * round-trip — binary unless an enum/bit/unknown column forces the
    * text form, the same `PgCopyFormat.forTypes` rule the ordinary
    * write path applies (a row-level UPDATE/MERGE on an enum table
    * must not hard-code binary the endpoint may reject). */
  private def copyRows(
      copySqlPrefix: String,
      pts: Seq[PgType],
      sts: Seq[org.apache.spark.sql.types.DataType],
      rows: Iterator[InternalRow]): Unit = {
    val fmt = graft.codec.PgCopyFormat.forTypes(pts)
    val out = new java.io.DataOutputStream(transport.copyIn(
      s"$copySqlPrefix (FORMAT ${if (fmt == graft.codec.PgCopyFormat.Binary) "binary" else "text"})"))
    if (fmt == graft.codec.PgCopyFormat.Binary) {
      val w = new graft.codec.PgBinaryWriter(pts, sts)
      w.writeHeader(out)
      rows.foreach(w.writeRow(out, _))
      w.writeTrailer(out)
    } else {
      val w = new graft.codec.PgTextWriter(pts, sts, None)
      rows.foreach { r =>
        out.write(w.rowText(r).getBytes("UTF-8")); out.write('\n')
      }
    }
    out.close()
  }

  private def flushUpdates(): Unit = if (updBuf.nonEmpty) {
    val tmp = "update_data_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val colDefs = colNames.zip(pgTypes).map { case (n, pt) =>
      s"${PgSqlGen.quoteIdent(n)} ${PgType.typeString(pt)}"
    }.mkString(", ") + ", \"__page_id_string\" VARCHAR"
    transport.execute(s"""CREATE TEMPORARY TABLE "$tmp" ($colDefs)""")
    copyRows(
      s"""COPY "$tmp" (${(colNames :+ "__page_id_string")
        .map(PgSqlGen.quoteIdent).mkString(", ")}) FROM STDIN""",
      pgTypes :+ PgType.PgVarchar,
      sparkTypes :+ org.apache.spark.sql.types.StringType,
      updBuf.iterator.map { case (packed, row) =>
        val vals = new Array[Any](colNames.length + 1)
        var i = 0
        while (i < colNames.length) {
          vals(i) = if (row.isNullAt(i)) null else row.get(i, sparkTypes(i))
          i += 1
        }
        vals(colNames.length) =
          org.apache.spark.unsafe.types.UTF8String.fromString(tidText(packed))
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      })
    val setList = colNames.map(c =>
      s"${PgSqlGen.quoteIdent(c)} = \"$tmp\".${PgSqlGen.quoteIdent(c)}").mkString(", ")
    transport.execute(
      s"""UPDATE $qname SET $setList FROM "$tmp" """ +
        s"""WHERE $qname.ctid = "$tmp"."__page_id_string"::tid""")
    transport.execute(s"""DROP TABLE "$tmp"""")
    updBuf.clear()
  }

  // ---- INSERT (MERGE): buffered COPY append ---- //
  private val insBuf = ArrayBuffer.empty[InternalRow]

  override def insert(row: InternalRow): Unit = insBuf += row.copy()

  private def flushInserts(): Unit = if (insBuf.nonEmpty) {
    copyRows(
      s"COPY $qname (${colNames.map(PgSqlGen.quoteIdent).mkString(", ")}) FROM STDIN",
      pgTypes, sparkTypes, insBuf.iterator)
    insBuf.clear()
  }

  override def commit(): WriterCommitMessage = {
    try {
      flushDeletes()
      flushUpdates()
      flushInserts()
      transport.execute("COMMIT")
    } finally transport.close()
    new WriterCommitMessage {}
  }

  /** closing with the transaction open rolls it back (pool reset), so a
    * failed task's deletes/updates/inserts never become visible */
  override def abort(): Unit = transport.close()

  override def close(): Unit = ()
}
