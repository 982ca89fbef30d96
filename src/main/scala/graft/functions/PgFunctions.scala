package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.{PgCatalogQueries, PgTransportFactory}
import graft.sqlgen.PgSqlGen

/** Active pinned session transactions, keyed by DSN. Registered for
  * the span of a [[PgFunctions.withTransaction]] block so the attached
  * catalog can route `pg_temp` operations — which only have meaning on
  * ONE connection — onto the pinned transport instead of the pool.
  * One active session per DSN: a second concurrent block on the same
  * DSN would make "the session's temp table" ambiguous. */
private[graft] object PgTxnRegistry {
  private val active =
    new java.util.concurrent.ConcurrentHashMap[String, graft.meta.PgTransport]()

  def register(dsn: String, t: graft.meta.PgTransport): Unit =
    if (active.putIfAbsent(dsn, t) != null)
      throw new IllegalStateException(
        s"a session transaction is already active for ${graft.meta.PgDsn.redact(dsn)}")

  def unregister(dsn: String): Unit = active.remove(dsn)

  /** Remove only if `t` is the registered transport — a belt-and-
    * braces guard against ever unregistering another block's session. */
  def unregister(dsn: String, t: graft.meta.PgTransport): Unit =
    active.remove(dsn, t)

  def lookup(dsn: String): Option[graft.meta.PgTransport] = Option(active.get(dsn))
}

/** Session-level helpers mirroring the reference's table functions
  * (SURVEY.md §7.1 `functions` module). */
object PgFunctions {

  /** `postgres_query(db, sql)` — run a remote query as a DataFrame
    * (ref: src/postgres_query.cpp:12-97). */
  def postgresQuery(spark: SparkSession, dsn: String, sql: String): DataFrame =
    spark.read.format("postgres").option("dsn", dsn).option("query", sql).load()

  /** `postgres_execute(db, sql)` — run DDL/DML for effect
    * (ref: src/postgres_execute.cpp:12-57). */
  def postgresExecute(dsn: String, sql: String): Unit = {
    val t = PgTransportFactory.open(dsn)
    try t.execute(sql) finally t.close()
  }

  /** legacy `postgres_attach`: register one temp view per table of a
    * schema (ref: src/postgres_attach.cpp:21-103). */
  def attachViews(
      spark: SparkSession,
      dsn: String,
      sourceSchema: String = "public",
      sinkSchema: Option[String] = None,
      overwrite: Boolean = false,
      filterPushdown: Boolean = true): Seq[String] = {
    val t = PgTransportFactory.open(dsn)
    val tables =
      try t.query(PgCatalogQueries.listTables(sourceSchema)).map(_.head)
      finally t.close()
    val created = tables.map { tbl =>
      val df = spark.read.format("postgres")
        .option("dsn", dsn).option("schema", sourceSchema).option("table", tbl)
        .option("filterPushdown", filterPushdown.toString)
        .load()
      // the reference's sink_schema targets a DuckDB schema; Spark temp
      // views are flat, so the sink schema becomes a name prefix
      val viewName = sinkSchema.map(s => s"${s}_$tbl").getOrElse(tbl)
      if (overwrite) df.createOrReplaceTempView(viewName)
      else df.createTempView(viewName)
      viewName
    }
    created
  }

  /** One pinned connection scoped inside a single server transaction —
    * the session handle [[withTransaction]] passes to its body. */
  final class PgTxnSession private[PgFunctions] (
      private[graft] val transport: graft.meta.PgTransport) {

    /** Run a statement for effect inside the transaction. */
    def execute(sql: String): Unit = transport.execute(sql)

    /** Run a query inside the transaction; text rows (discovery-style). */
    def query(sql: String): Seq[Seq[String]] = transport.query(sql)

    /** Run a SELECT inside the transaction and return a local
      * DataFrame: shape bound via the Parse/Describe handshake, rows
      * streamed over THIS connection as binary COPY and decoded with
      * the scan's own codec. Driver-side by nature — a transaction is
      * one connection, so reads here cannot parallelize; use it for
      * the bounded reads a BEGIN/SELECT/UPDATE/COMMIT script performs,
      * not for bulk extraction (that is what the snapshot-consistent
      * parallel scan is for). */
    def queryDf(spark: SparkSession, sql: String): DataFrame = {
      val cols = transport.describe(sql.trim.stripSuffix(";"))
      val fields = cols.map { case (n, pt) =>
        org.apache.spark.sql.types.StructField(n, graft.types.PgType.toSpark(pt))
      }
      val schema = org.apache.spark.sql.types.StructType(fields)
      val reader = new graft.codec.PgBinaryReader(
        cols.map(_._2), fields.map(_.dataType))
      // same COPY shape as the postgres_query scan path, so every
      // endpoint that serves `query` scans serves this too
      val in = new graft.codec.PgBlockInput(transport.copyOut(
        PgSqlGen.copyQuerySql(sql,
          cols.map { case (n, pt) => PgSqlGen.ScanColumn(n, pt) }, Nil)))
      val toScala = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(schema)
      val rows = try {
        reader.readHeader(in)
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        var row = reader.readRow(in)
        while (row.isDefined) {
          buf += toScala(row.get).asInstanceOf[org.apache.spark.sql.Row]
          row = reader.readRow(in)
        }
        buf.toSeq
      } finally in.close()
      spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
    }
  }

  /** Opt-in multi-statement session transaction — the closest Spark
    * analogue of the reference's single-transaction session scope
    * (ref: src/storage/postgres_transaction.cpp:34-50,
    * test/sql/storage/attach_transactions.test). One dedicated
    * connection (outside the pool budget) is pinned for the whole
    * block: BEGIN before the body, COMMIT after it, ROLLBACK on any
    * thrown exception — so a ported BEGIN/UPDATE/SELECT/COMMIT script
    * keeps its atomicity and read-your-own-writes semantics.
    *
    * What it deliberately CANNOT do (SURVEY §7.4): distributed scans
    * and parallel writes run on their own pooled connections and do
    * not join this transaction — they keep their snapshot-consistent /
    * per-write-job semantics. Everything inside the block runs on the
    * one pinned connection, driver-side. */
  def withTransaction[A](dsn: String,
      isolation: String = "READ COMMITTED")(body: PgTxnSession => A): A = {
    val t = PgTransportFactory.openUnpooled(dsn)
    // visible to the attached catalog for the block's span: pg_temp
    // DDL/reads/writes route onto THIS connection (session affinity).
    // A rejected registration (another block already active on this
    // DSN) must close the connection it just opened — the finally
    // below is only reached after a successful register.
    try PgTxnRegistry.register(dsn, t)
    catch {
      case e: Throwable =>
        try t.close() catch { case c: Throwable => e.addSuppressed(c) }
        throw e
    }
    try {
      t.execute(s"BEGIN ISOLATION LEVEL $isolation")
      try {
        val result = body(new PgTxnSession(t))
        t.execute("COMMIT")
        result
      } catch {
        case e: Throwable =>
          try t.execute("ROLLBACK")
          catch { case r: Throwable => e.addSuppressed(r) }
          throw e
      }
    } finally {
      PgTxnRegistry.unregister(dsn, t)
      t.close()
    }
  }

  /** `COPY FROM DATABASE` analogue (ref: test/sql/storage/
    * attach_copy_from_database.test): copy a schema — table definitions
    * + data — from one server to another in one call.
    *
    * Per table: the destination definition is rebuilt from the source's
    * catalog (`tableInfo` names/types/typmods/dims/nullability), then
    * rows stream as COPY OUT → COPY IN. In binary mode the PGCOPY
    * stream is a self-contained format, so the bytes pass through with
    * NO decode/re-encode; text mode decodes and re-emits text rows —
    * the same fallback the write sink offers for servers or poolers
    * that reject binary COPY. Each table copies inside ONE destination
    * transaction (BEGIN … COMMIT; a failure rolls that table back
    * without poisoning tables already copied). The SOURCE side runs
    * entirely inside one REPEATABLE READ READ ONLY transaction — table
    * list, catalog definitions, and every COPY OUT see a single
    * snapshot, so a concurrently-mutating source still yields a
    * cross-table-consistent clone (matching the reference, which scopes
    * COPY FROM DATABASE in one transaction —
    * ref: src/storage/postgres_transaction.cpp:34-50). Tables copy
    * sequentially on the driver — bulk catalog cloning is a one-off
    * admin operation; for a single huge table the parallel write path
    * (`df.write.format("postgres")`) is the scale tool.
    *
    * Returns the copied table names. */
  def copyDatabase(srcDsn: String, dstDsn: String,
      schema: String = "public",
      dstSchema: Option[String] = None,
      overwrite: Boolean = false,
      useTextFormat: Boolean = false): Seq[String] = {
    val target = dstSchema.getOrElse(schema)
    val src = PgTransportFactory.open(srcDsn)
    try {
      src.execute(PgCatalogQueries.beginReadOnly)
      val tables = src.query(PgCatalogQueries.listTables(schema)).map(_.head)
      locally {
        val d = PgTransportFactory.open(dstDsn)
        try d.execute(s"CREATE SCHEMA IF NOT EXISTS ${PgSqlGen.quoteIdent(target)}")
        finally d.close()
      }
      tables.foreach { tbl =>
        val info = src.query(PgCatalogQueries.tableInfo(schema, tbl))
        val pgTypes = info.map { r =>
          graft.types.PgType.fromName(r(1), r(2).toInt, r(3).toInt)
        }
        val colDefs = info.zip(pgTypes).map { case (r, pt) =>
          s"${PgSqlGen.quoteIdent(r.head)} ${graft.types.PgType.typeString(pt)}" +
            (if (r(4) == "t" || r(4) == "true") " NOT NULL" else "")
        }.mkString(", ")
        val colList = info.map(r => PgSqlGen.quoteIdent(r.head)).mkString(", ")
        val srcName = s"${PgSqlGen.quoteIdent(schema)}.${PgSqlGen.quoteIdent(tbl)}"
        val dstName = s"${PgSqlGen.quoteIdent(target)}.${PgSqlGen.quoteIdent(tbl)}"
        val dst = PgTransportFactory.open(dstDsn)
        try {
          dst.execute("BEGIN")
          try {
            if (overwrite) dst.execute(s"DROP TABLE IF EXISTS $dstName")
            dst.execute(s"CREATE TABLE $dstName ($colDefs)")
            val in = src.copyOut(
              s"COPY (SELECT $colList FROM $srcName) TO STDOUT (FORMAT binary)")
            try {
              if (!useTextFormat) {
                val out = dst.copyIn(
                  s"COPY $dstName ($colList) FROM STDIN (FORMAT binary)")
                try {
                  val buf = new Array[Byte](1 << 16)
                  var n = in.read(buf)
                  while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
                } finally out.close()
              } else {
                val sparkTypes = pgTypes.map(graft.types.PgType.toSpark)
                val reader = new graft.codec.PgBinaryReader(pgTypes, sparkTypes)
                val writer = new graft.codec.PgTextWriter(pgTypes, sparkTypes)
                val din = new graft.codec.PgBlockInput(in)
                reader.readHeader(din)
                val out = dst.copyIn(
                  s"COPY $dstName ($colList) FROM STDIN (FORMAT text)")
                try {
                  var row = reader.readRow(din)
                  while (row.isDefined) {
                    out.write(writer.rowText(row.get).getBytes("UTF-8"))
                    out.write('\n')
                    row = reader.readRow(din)
                  }
                } finally out.close()
              }
            } finally in.close()
            dst.execute("COMMIT")
          } catch {
            case e: Throwable =>
              try dst.execute("ROLLBACK") catch { case _: Throwable => () }
              throw e
          }
        } finally dst.close()
      }
      src.execute("COMMIT")
      tables
    } finally src.close()
  }

  /** UPDATE by row id, using the reference's update-sink protocol
    * (ref: src/storage/postgres_update.cpp:31-153): per partition,
    *   1. CREATE TEMPORARY TABLE update_data_<uuid>(cols…,
    *      __page_id_string VARCHAR)
    *   2. COPY the new column values + the row's ctid text into it
    *   3. UPDATE target SET col = tmp.col… FROM tmp
    *      WHERE target.ctid = tmp.__page_id_string::tid
    *   4. DROP the temp table.
    *
    * `updates` must carry `_ctid` (the metadata column from a connector
    * read) plus every column to set. Distributed: each partition runs
    * the protocol on its own connection — the server-side UPDATE joins
    * on ctid, so partitions never conflict on disjoint row sets.
    */
  def updateByCtid(
      dsn: String,
      schema: String,
      table: String,
      updates: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    val setCols = updates.schema.fields.filter(_.name != "_ctid")
    require(setCols.nonEmpty, "updateByCtid needs at least one non-_ctid column")
    val qname = s"${PgSqlGen.quoteIdent(schema)}.${PgSqlGen.quoteIdent(table)}"
    val sparkTypes = setCols.map(_.dataType).toSeq :+
      org.apache.spark.sql.types.StringType
    val pgTypes = setCols.map(f => graft.types.PgType.fromSpark(f.dataType)).toSeq :+
      graft.types.PgType.PgVarchar
    val colNames = setCols.map(_.name).toSeq
    val reordered = updates.selectExpr(colNames.map(c => s"`$c`") :+ "_ctid": _*)
    val rowSchema = reordered.schema
    reordered.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val t = PgTransportFactory.open(dsn)
        try {
          val tmp = "update_data_" + java.util.UUID.randomUUID().toString.replace("-", "")
          val colDefs = colNames.zip(pgTypes.init).map { case (n, pt) =>
            s"${PgSqlGen.quoteIdent(n)} ${graft.types.PgType.typeString(pt)}"
          }.mkString(", ") + ", \"__page_id_string\" VARCHAR"
          t.execute(s"""CREATE TEMPORARY TABLE "$tmp" ($colDefs)""")
          val writer = new graft.codec.PgBinaryWriter(pgTypes, sparkTypes)
          val out = new java.io.DataOutputStream(t.copyIn(
            s"""COPY "$tmp" (${(colNames :+ "__page_id_string")
              .map(PgSqlGen.quoteIdent).mkString(", ")}) FROM STDIN (FORMAT binary)"""))
          writer.writeHeader(out)
          val converters = rowSchema.fields.indices.map { i =>
            CatalystTypeConverters.createToCatalystConverter(rowSchema.fields(i).dataType)
          }
          rows.foreach { r =>
            val vals = new Array[Any](rowSchema.length)
            var i = 0
            while (i < rowSchema.length - 1) {
              vals(i) = if (r.isNullAt(i)) null else converters(i)(r.get(i))
              i += 1
            }
            val packed = r.getLong(rowSchema.length - 1)
            vals(rowSchema.length - 1) = org.apache.spark.unsafe.types.UTF8String
              .fromString(s"(${packed >>> 16},${packed & 0xffffL})")
            writer.writeRow(out,
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals))
          }
          writer.writeTrailer(out)
          out.close()
          val setList = colNames.map(c =>
            s"${PgSqlGen.quoteIdent(c)} = \"$tmp\".${PgSqlGen.quoteIdent(c)}").mkString(", ")
          t.execute(
            s"""UPDATE $qname SET $setList FROM "$tmp" """ +
              s"""WHERE $qname.ctid = "$tmp"."__page_id_string"::tid""")
          t.execute(s"""DROP TABLE "$tmp"""")
        } finally t.close()
      }
    }
  }

  /** DELETE by row id, batched like the reference's delete sink: the
    * generated `DELETE ... WHERE ctid IN (...)` statement is flushed
    * whenever the tid list exceeds ~3000 characters
    * (ref: src/storage/postgres_delete.cpp:18-92, flush rule :75-78).
    *
    * `ctids` is any DataFrame with a `_ctid` BIGINT column — typically
    * a filtered read of the table with the metadata column selected.
    * Runs distributed: each partition deletes its own ctids over its
    * own connection.
    */
  def deleteByCtid(
      dsn: String,
      schema: String,
      table: String,
      ctids: DataFrame): Unit = {
    val qname = s"${PgSqlGen.quoteIdent(schema)}.${PgSqlGen.quoteIdent(table)}"
    ctids.select("_ctid").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        // empty partitions must not open (and round-trip) a connection
        if (rows.nonEmpty) {
          val t = PgTransportFactory.open(dsn)
          try {
            val buf = new StringBuilder
            def flush(): Unit = if (buf.nonEmpty) {
              t.execute(s"DELETE FROM $qname WHERE ctid IN ($buf)")
              buf.clear()
            }
            rows.foreach { r =>
              val packed = r.getLong(0)
              // >>> like every other tid rendering: signed >> would
              // sign-extend a high-bit page into '(-N,row)'::tid
              val tid = s"'(${packed >>> 16},${packed & 0xffff})'::tid"
              if (buf.nonEmpty) buf.append(", ")
              buf.append(tid)
              if (buf.length > 3000) flush() // ref flush threshold
            }
            flush()
          } finally t.close()
        }
    }
  }
}
