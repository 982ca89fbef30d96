package graft.streaming

import java.io.DataInputStream

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType

import graft.meta.PgTransportFactory
import graft.sqlgen.PgSqlGen
import graft.sqlgen.PgSqlGen.ScanColumn
import graft.sources.postgres.{PostgresInputPartition, PostgresReaderFactory, PostgresTable}
import graft.types.PgType
import graft.types.PgType._

/** Micro-batch offset: the highest value of the stream-key column this
  * stream has consumed ("none" before the first batch). A plain number
  * keeps the checkpoint offset log human-readable and trivially stable
  * across versions. */
final case class PgKeyOffset(key: Option[Long]) extends Offset {
  override def json: String = key.fold("none")(_.toString)
}

object PgKeyOffset {
  def fromJson(s: String): PgKeyOffset =
    PgKeyOffset(if (s == "none") None else Some(s.toLong))
}

/** Structured Streaming over a postgres table, keyed on a monotonic
  * append-only column (`streamKey` option — serial/bigserial ids,
  * epoch columns). Each micro-batch covers the key interval
  * `(lastOffset, max(key)]` observed at planning time and scans it with
  * the same parallel binary-COPY machinery as the batch source.
  *
  * This is NEW functionality relative to the reference, which has no
  * streaming surface (SURVEY.md §2.4 marks it optional future work):
  * the incremental-ingest pattern every warehouse loader implements by
  * polling `WHERE id > :last` is expressed here as a first-class
  * `readStream`, gaining checkpointed exactly-once offsets, watermarks
  * and stateful aggregation for free from Spark.
  *
  * Contract and limits (same as any key-polling loader):
  *   - the key must be monotonic for committed rows: a row that commits
  *     with a key at or below an already-consumed offset is never seen.
  *     In-flight transactions below max(key) at planning time are the
  *     classic race — schedule the poll interval above the writer's
  *     commit latency, or use a commit-timestamp key with a lag guard.
  *   - deletes/updates are not captured (this is append ingestion, not
  *     CDC — logical replication is out of scope).
  *   - rows whose key is NULL are never ingested: max(key) ignores
  *     NULLs and the interval predicate excludes them, the same
  *     contract as any `WHERE id > :last` loader.
  *
  * At 100 TB the incremental property is the whole point: a micro-batch
  * ships only the new key interval, split into `streamTasks` parallel
  * key sub-ranges when the interval is wide (initial backfill), while
  * the steady state is a single cheap range scan.
  */
final class PostgresMicroBatchStream(
    table: PostgresTable,
    required: StructType,
    pushedSql: Seq[String])
    extends MicroBatchStream with SupportsAdmissionControl {

  private val opts = table.opts

  private val keyCol: String = opts.streamKey.getOrElse(throw new IllegalArgumentException(
    "streaming from postgres requires option 'streamKey' (a monotonic append-key column)"))

  private val keyPg: PgType = table.pgColumns.find(_._1 == keyCol)
    .map(_._2)
    .getOrElse(throw new IllegalArgumentException(
      s"streamKey column '$keyCol' not found in ${opts.schema}.${opts.table.getOrElse("?")}"))

  require(keyPg == PgInt2 || keyPg == PgInt4 || keyPg == PgInt8,
    s"streamKey column '$keyCol' must be an integer type (got ${keyPg.typeName})")

  private def qk = PgSqlGen.quoteIdent(keyCol)

  private def qname =
    s"${PgSqlGen.quoteIdent(opts.schema)}.${PgSqlGen.quoteIdent(opts.table.get)}"

  /** min/max of the key column via the same binary-COPY aggregate path
    * the batch source pushes; zero rows (empty table) → None. */
  private def fetchBound(fn: String): Option[Long] = {
    val t = PgTransportFactory.open(opts.dsn)
    try {
      val in = new graft.codec.PgBlockInput(t.copyOut(
        s"COPY (SELECT $fn($qk) FROM $qname) TO STDOUT (FORMAT binary)"))
      val reader = new graft.codec.PgBinaryReader(Seq(keyPg))
      reader.readHeader(in)
      val out = reader.readRow(in).flatMap { r =>
        if (r.isNullAt(0)) None
        else Some(r.get(0, PgType.toSpark(keyPg)) match {
          case s: Short => s.toLong
          case i: Int => i.toLong
          case l: Long => l
        })
      }
      in.close()
      out
    } finally t.close()
  }

  override def initialOffset(): Offset = opts.streamStart match {
    case "latest" => PgKeyOffset(fetchBound("max"))
    case "earliest" => PgKeyOffset(None)
    case other => throw new IllegalArgumentException(
      s"streamStart must be 'earliest' or 'latest', got '$other'")
  }

  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  /** Admission control: `streamMaxKeysPerBatch` caps how far a single
    * micro-batch's key interval may advance — during catch-up (a long
    * stop, or an `earliest` start against a big table) this turns one
    * giant recovery batch into bounded, checkpointable steps. Spark's
    * own ReadLimit rows semantics don't map onto a key interval, so the
    * cap is a source option; reportLatestOffset still surfaces the true
    * tail for lag metrics. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val max = fetchBound("max")
    val lo = start.asInstanceOf[PgKeyOffset].key
    val capped = (opts.streamMaxKeysPerBatch, max) match {
      case (Some(cap), Some(m)) =>
        val base = lo.orElse(fetchBound("min").map(_ - 1))
        base match {
          case Some(b) if b + cap < m => Some(b + cap)
          case _ => Some(m)
        }
      case (_, m) => m
    }
    PgKeyOffset(capped)
  }

  override def reportLatestOffset(): Offset = PgKeyOffset(fetchBound("max"))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset = PgKeyOffset.fromJson(json)

  private def scanColumns: Seq[ScanColumn] = required.fields.toSeq.map { f =>
    if (f.name == "_ctid") ScanColumn("_ctid", PgCtid)
    else ScanColumn(f.name, table.pgColumns.find(_._1 == f.name).get._2)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[PgKeyOffset].key
    val hi = end.asInstanceOf[PgKeyOffset].key
    val hiK = hi match {
      case Some(h) if lo.forall(_ < h) => h
      case _ => return Array.empty // nothing new in this interval
    }
    // wide interval (backfill) → split into numeric key sub-ranges;
    // steady state stays one range scan. Key-space splitting assumes
    // roughly uniform key density — the right trade for serial ids.
    val tasks = math.max(1, math.min(opts.streamTasks, opts.connectionLimit))
    val loK: Option[Long] = lo.orElse(if (tasks > 1) fetchBound("min").map(_ - 1) else None)
    val bounds: Seq[(Option[Long], Long)] = loK match {
      case Some(l) if tasks > 1 && hiK - l > tasks =>
        val span = hiK - l
        (0 until tasks).map { i =>
          val a = l + span * i / tasks
          val b = l + span * (i + 1) / tasks
          (Some(a), b)
        }
      case _ => Seq((loK, hiK))
    }
    bounds.map { case (a, b) =>
      val keyPreds = a.map(v => s"$qk > $v").toSeq :+ s"$qk <= $b"
      PostgresInputPartition(opts.dsn,
        PgSqlGen.copyTableSql(opts.schema, opts.table.get, scanColumns,
          None, pushedSql ++ keyPreds),
        None): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PostgresReaderFactory(scanColumns, required, opts.vectorizedRead)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"PostgresMicroBatchStream(${graft.meta.PgDsn.redact(opts.dsn)}/" +
      s"${opts.schema}.${opts.table.getOrElse("?")}, key=$keyCol)"
}
