package graft.sources.postgres

import java.io.EOFException

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

import graft.codec.{PgBinaryReader, PgBlockInput, PgWire}
import graft.sqlgen.PgSqlGen.ScanColumn
import graft.types.PgType
import graft.types.PgType._

/** Vectorized PGCOPY decode: fills 2048-row [[ColumnarBatch]]es the way
  * the reference's binary reader fills columnar chunks
  * (ref: src/postgres_scanner.cpp:430-432 — one DataChunk per
  * STANDARD_VECTOR_SIZE tuples; postgres_binary_reader.hpp:334-560 —
  * per-type decode straight into vectors).
  *
  * Why: the row reader materializes a boxed `GenericInternalRow` per
  * tuple — at sf10 a single catalog query moves 60M rows, and per-row
  * allocation + per-value boxing dominate the decode. Here primitives
  * land in flat arrays (`putInt`/`putLong`/...), strings copy once into
  * the vector's byte storage via a reused scratch buffer, and Spark
  * consumes the batch through `ColumnarToRow` inside whole-stage
  * codegen — the same shape as its Parquet vectorized reader.
  *
  * Only scans whose every projected type maps to a flat vector write
  * take this path ([[PostgresColumnarReader.supported]]); arrays,
  * composites, geometry, intervals and other nested shapes stay on the
  * row reader. The split is per-scan, decided in
  * [[PostgresReaderFactory.supportColumnarReads]].
  */
final class PostgresColumnarReader(
    dsn: String,
    sql: String,
    snapshot: Option[graft.meta.SnapshotRef],
    cols: Seq[ScanColumn],
    required: StructType)
    extends PartitionReader[ColumnarBatch] {

  import PostgresColumnarReader.BatchRows

  private val (transport, in) = PgScanOpen.open(dsn, sql, snapshot)

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(BatchRows, required)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  // scratch buffer for variable-width fields: one read off the stream,
  // one copy into the vector's storage — no per-value byte[] garbage
  private var scratch = new Array[Byte](1 << 16)
  private def ensure(len: Int): Array[Byte] = {
    if (scratch.length < len)
      scratch = new Array[Byte](math.max(len, scratch.length * 2))
    scratch
  }

  // numeric decode shares the row reader's base-10000 reconstruction
  private val numericReader = new PgBinaryReader(Seq.empty)

  private type Decoder = (PgBlockInput, WritableColumnVector, Int, Int) => Unit

  private def fixed(t: PgType, width: Int)(
      f: (PgBlockInput, WritableColumnVector, Int) => Unit): Decoder =
    (in, vec, row, len) => {
      // same framing guard as the row path: a mismatched wire length
      // read at the expected width would silently desync every
      // following field
      if (len != width) throw new IllegalStateException(
        s"PGCOPY field of type $t declared $len bytes, expected $width")
      f(in, vec, row)
    }

  private val decoders: Array[Decoder] =
    cols.zip(required.fields.map(_.dataType)).map { case (c, target) =>
      val t = c.pgType
      val d: Decoder = t match {
        case PgBool => fixed(t, 1)((in, v, r) => v.putBoolean(r, in.readByte() != 0))
        case PgInt2 => fixed(t, 2)((in, v, r) => v.putShort(r, in.readShort()))
        case PgInt4 => fixed(t, 4)((in, v, r) => v.putInt(r, in.readInt()))
        case PgInt8 => fixed(t, 8)((in, v, r) => v.putLong(r, in.readLong()))
        case PgOid => fixed(t, 4)((in, v, r) =>
          v.putLong(r, in.readInt().toLong & 0xffffffffL))
        case PgFloat4 => fixed(t, 4)((in, v, r) => v.putFloat(r, in.readFloat()))
        case PgFloat8 => fixed(t, 8)((in, v, r) => v.putDouble(r, in.readDouble()))
        case PgDate => fixed(t, 4) { (in, v, r) =>
          val d0 = in.readInt()
          v.putInt(r,
            if (d0 == PgWire.PgDateInf) Int.MaxValue
            else if (d0 == PgWire.PgDateNegInf) Int.MinValue
            else d0 + PgWire.DateEpochShiftDays)
        }
        case PgTime => fixed(t, 8)((in, v, r) => v.putLong(r, in.readLong()))
        case PgTimestamp | PgTimestampTz => fixed(t, 8) { (in, v, r) =>
          val us = in.readLong()
          v.putLong(r,
            if (us == PgWire.PgTsInf) Long.MaxValue
            else if (us == PgWire.PgTsNegInf) Long.MinValue
            else us + PgWire.TsEpochShiftMicros)
        }
        case PgCtid => fixed(t, 6) { (in, v, r) =>
          val page = in.readInt().toLong & 0xffffffffL
          val off = in.readShort().toLong & 0xffffL
          v.putLong(r, (page << 16) | off)
        }
        case PgUuid => fixed(t, 16) { (in, v, r) =>
          val hi = in.readLong(); val lo = in.readLong()
          val s = new java.util.UUID(hi, lo).toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          v.putByteArray(r, s, 0, s.length)
        }
        case _: PgNumeric => (in, vec, row, len) => {
          val buf = ensure(len)
          in.readFully(buf, 0, len)
          numericReader.readNumeric(
            java.nio.ByteBuffer.wrap(buf, 0, len), target) match {
            case null => vec.putNull(row) // NaN into a DECIMAL target
            case dec: org.apache.spark.sql.types.Decimal =>
              vec.putDecimal(row, dec,
                target.asInstanceOf[DecimalType].precision)
            case dbl: Double => vec.putDouble(row, dbl)
            case other => throw new IllegalStateException(
              s"unexpected numeric decode: $other")
          }
        }
        case _: PgBpchar => (in, vec, row, len) => {
          val buf = ensure(len)
          in.readFully(buf, 0, len)
          // trailing-space trim (ref: binary_reader.hpp:389-394)
          var end = len
          while (end > 0 && buf(end - 1) == ' ') end -= 1
          vec.putByteArray(row, buf, 0, end)
        }
        case PgJsonb => (in, vec, row, len) => {
          val buf = ensure(len)
          in.readFully(buf, 0, len)
          // strip the 1-byte version header (ref: binary_reader.hpp:381-387)
          vec.putByteArray(row, buf, 1, len - 1)
        }
        case PgText | PgVarchar | PgJson | _: PgUnknown | _: PgEnum | PgBytea =>
          (in, vec, row, len) => {
            val buf = ensure(len)
            in.readFully(buf, 0, len)
            vec.putByteArray(row, buf, 0, len)
          }
        case other => throw new IllegalStateException(
          s"type $other has no columnar decoder (supported() must gate this)")
      }
      d
    }.toArray

  private var finished = false

  override def next(): Boolean = {
    if (finished) return false
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var r = 0
    while (r < BatchRows && !finished) {
      val nfields =
        try in.readShort()
        catch { case _: EOFException => finished = true; -1 }
      if (nfields < 0) finished = true // -1 trailer (or clean EOF)
      else {
        if (nfields != decoders.length) throw new IllegalStateException(
          s"field count $nfields != expected ${decoders.length}")
        var c = 0
        while (c < decoders.length) {
          val len = in.readInt()
          if (len < 0) vectors(c).putNull(r)
          else decoders(c)(in, vectors(c), r, len)
          c += 1
        }
        r += 1
      }
    }
    batch.setNumRows(r)
    r > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    batch.close()
    in.close()
    transport.close()
  }
}

object PostgresColumnarReader {

  /** Reference chunk size (postgres_scanner.cpp:430-432): tuples per
    * ColumnarBatch. */
  val BatchRows = 2048

  /** Can (pgType → spark target) decode straight into a flat column
    * vector? Nested/exotic shapes (arrays, composites, geometry,
    * intervals, timetz, bit) stay on the row reader. */
  def supported(t: PgType, target: DataType): Boolean = (t, target) match {
    case (PgBool, BooleanType) => true
    case (PgInt2, ShortType) => true
    case (PgInt4, IntegerType) => true
    case (PgInt8 | PgOid | PgCtid | PgTime, LongType) => true
    case (PgFloat4, FloatType) => true
    case (PgFloat8, DoubleType) => true
    case (PgDate, DateType) => true
    case (PgTimestamp, TimestampNTZType) => true
    case (PgTimestampTz, TimestampType) => true
    case (_: PgNumeric, _: DecimalType) => true
    case (_: PgNumeric, DoubleType) => true
    case (PgText | PgVarchar | PgJson | PgJsonb | PgUuid, StringType) => true
    case (_: PgBpchar | _: PgUnknown | _: PgEnum, StringType) => true
    case (PgBytea, BinaryType) => true
    case _ => false
  }
}
