package graft.sources.postgres

import java.io.EOFException

import scala.annotation.switch

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
  * land in flat arrays (`putInt`/`putLong`/...), and Spark consumes the
  * batch through `ColumnarToRow` inside whole-stage codegen — the same
  * shape as its Parquet vectorized reader.
  *
  * The decode inner loop is a per-column OPCODE dispatched through one
  * `@switch` tableswitch — a lambda-per-column array makes the hot call
  * site megamorphic (one closure class per type, billions of vtable
  * dispatches per sf10 scan). Variable-width fields decode IN PLACE
  * from the block window ([[PgBlockInput.window]]): one copy
  * stream→window→vector storage instead of two through a scratch
  * buffer. DECIMAL(p ≤ 18) values take
  * [[graft.codec.PgWire.numericUnscaledLong]] — zero allocations,
  * written with `putLong`/`putInt` exactly as `putDecimal` stores
  * compact decimals — and fall back to the general base-10000 path on
  * the sentinel.
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

  import PostgresColumnarReader._

  private val (transport, in) = PgScanOpen.open(dsn, sql, snapshot)

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(BatchRows, required)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  // numeric decode shares the row reader's base-10000 reconstruction
  // (the non-fast-path shapes: NUMERIC_AS_DOUBLE, p > 18, NaN)
  private val numericReader = new PgBinaryReader(Seq.empty)

  // per-column decode opcode + expected fixed width (-1 = variable)
  private val ops = new Array[Int](cols.length)
  private val widths = new Array[Int](cols.length)
  private val precisions = new Array[Int](cols.length)
  private val scales = new Array[Int](cols.length)
  private val targets: Array[DataType] = required.fields.map(_.dataType)

  cols.zip(targets).zipWithIndex.foreach { case ((c, target), i) =>
    val (op, w) = c.pgType match {
      case PgBool => (OpBool, 1)
      case PgInt2 => (OpShort, 2)
      case PgInt4 => (OpInt, 4)
      case PgInt8 => (OpLong, 8)
      case PgOid => (OpOid, 4)
      case PgFloat4 => (OpFloat, 4)
      case PgFloat8 => (OpDouble, 8)
      case PgDate => (OpDate, 4)
      case PgTime => (OpLong, 8)
      case PgTimestamp | PgTimestampTz => (OpTimestamp, 8)
      case PgCtid => (OpCtid, 6)
      case PgUuid => (OpUuid, 16)
      case _: PgNumeric => target match {
        case dt: DecimalType if dt.precision <= 18 =>
          precisions(i) = dt.precision; scales(i) = dt.scale
          (OpDecimalCompact, -1)
        case dt: DecimalType =>
          precisions(i) = dt.precision; scales(i) = dt.scale
          (OpDecimalWide, -1)
        case _ => (OpNumericDouble, -1)
      }
      case _: PgBpchar => (OpBpchar, -1)
      case PgJsonb => (OpJsonb, -1)
      case PgText | PgVarchar | PgJson | _: PgUnknown | _: PgEnum | PgBytea =>
        (OpBytes, -1)
      case other => throw new IllegalStateException(
        s"type $other has no columnar decoder (supported() must gate this)")
    }
    ops(i) = op
    widths(i) = w
  }

  /** Same framing guard as the row path: a mismatched wire length read
    * at the expected width would silently desync every following
    * field. */
  private def badWidth(c: Int, len: Int): Nothing =
    throw new IllegalStateException(
      s"PGCOPY field of type ${cols(c).pgType} declared $len bytes, " +
        s"expected ${widths(c)}")

  private def decodeField(c: Int, vec: WritableColumnVector, row: Int, len: Int): Unit = {
    val op = ops(c)
    if (widths(c) >= 0 && len != widths(c)) badWidth(c, len)
    (op: @switch) match {
      case OpBool => vec.putBoolean(row, in.readByte() != 0)
      case OpShort => vec.putShort(row, in.readShort())
      case OpInt => vec.putInt(row, in.readInt())
      case OpLong => vec.putLong(row, in.readLong())
      case OpOid => vec.putLong(row, in.readInt().toLong & 0xffffffffL)
      case OpFloat => vec.putFloat(row, in.readFloat())
      case OpDouble => vec.putDouble(row, in.readDouble())
      case OpDate =>
        val d0 = in.readInt()
        vec.putInt(row,
          if (d0 == PgWire.PgDateInf) Int.MaxValue
          else if (d0 == PgWire.PgDateNegInf) Int.MinValue
          else d0 + PgWire.DateEpochShiftDays)
      case OpTimestamp =>
        val us = in.readLong()
        vec.putLong(row,
          if (us == PgWire.PgTsInf) Long.MaxValue
          else if (us == PgWire.PgTsNegInf) Long.MinValue
          else us + PgWire.TsEpochShiftMicros)
      case OpCtid =>
        val page = in.readInt().toLong & 0xffffffffL
        val off = in.readShort().toLong & 0xffffL
        vec.putLong(row, (page << 16) | off)
      case OpUuid =>
        val hi = in.readLong(); val lo = in.readLong()
        val s = new java.util.UUID(hi, lo).toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        vec.putByteArray(row, s, 0, s.length)
      case OpDecimalCompact =>
        val b = in.window(len); val off = in.windowPos
        val v = PgWire.numericUnscaledLong(b, off, len, precisions(c), scales(c))
        if (v != Long.MinValue) {
          // putDecimal's own compact layout: int storage under 10
          // digits, long storage under 19
          if (precisions(c) <= Decimal.MAX_INT_DIGITS) vec.putInt(row, v.toInt)
          else vec.putLong(row, v)
        } else putNumericGeneral(c, vec, row, b, off, len)
        in.skipWindow(len)
      case OpDecimalWide | OpNumericDouble =>
        val b = in.window(len); val off = in.windowPos
        putNumericGeneral(c, vec, row, b, off, len)
        in.skipWindow(len)
      case OpBpchar =>
        val b = in.window(len); val off = in.windowPos
        // trailing-space trim (ref: binary_reader.hpp:389-394)
        var end = len
        while (end > 0 && b(off + end - 1) == ' ') end -= 1
        vec.putByteArray(row, b, off, end)
        in.skipWindow(len)
      case OpJsonb =>
        val b = in.window(len); val off = in.windowPos
        // strip the 1-byte version header (ref: binary_reader.hpp:381-387)
        vec.putByteArray(row, b, off + 1, len - 1)
        in.skipWindow(len)
      case OpBytes =>
        val b = in.window(len); val off = in.windowPos
        vec.putByteArray(row, b, off, len)
        in.skipWindow(len)
    }
  }

  private def putNumericGeneral(c: Int, vec: WritableColumnVector, row: Int,
      b: Array[Byte], off: Int, len: Int): Unit =
    numericReader.readNumeric(
      java.nio.ByteBuffer.wrap(b, off, len), targets(c)) match {
      case null => vec.putNull(row) // NaN into a DECIMAL target
      case dec: org.apache.spark.sql.types.Decimal =>
        vec.putDecimal(row, dec, precisions(c))
      case dbl: Double => vec.putDouble(row, dbl)
      case other => throw new IllegalStateException(
        s"unexpected numeric decode: $other")
    }

  private var finished = false

  override def next(): Boolean = {
    if (finished) return false
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    val ncols = ops.length
    var r = 0
    while (r < BatchRows && !finished) {
      val nfields =
        try in.readShort()
        catch { case _: EOFException => finished = true; -1 }
      if (nfields < 0) finished = true // -1 trailer (or clean EOF)
      else {
        if (nfields != ncols) throw new IllegalStateException(
          s"field count $nfields != expected $ncols")
        var c = 0
        while (c < ncols) {
          val len = in.readInt()
          if (len < 0) vectors(c).putNull(r)
          else decodeField(c, vectors(c), r, len)
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

  // decode opcodes (tableswitch keys — keep dense from 0)
  private final val OpBool = 0
  private final val OpShort = 1
  private final val OpInt = 2
  private final val OpLong = 3
  private final val OpOid = 4
  private final val OpFloat = 5
  private final val OpDouble = 6
  private final val OpDate = 7
  private final val OpTimestamp = 8
  private final val OpCtid = 9
  private final val OpUuid = 10
  private final val OpDecimalCompact = 11
  private final val OpDecimalWide = 12
  private final val OpNumericDouble = 13
  private final val OpBpchar = 14
  private final val OpJsonb = 15
  private final val OpBytes = 16

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
