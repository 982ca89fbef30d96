package graft.codec

import java.io.{DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, MathContext}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

import graft.types.PgType
import graft.types.PgType._

/** PGCOPY binary wire format ↔ Catalyst internal values.
  *
  * Byte layout (public PostgreSQL COPY BINARY documentation; the
  * reference implements the same protocol in
  * src/include/postgres_binary_reader.hpp:17-567 and
  * postgres_binary_writer.hpp:18-443):
  *   header   = "PGCOPY\n\377\r\n\0" + int32 flags + int32 extLen
  *   tuple    = int16 nfields, then per field int32 len (-1 = NULL) + data
  *   trailer  = int16 -1
  * All integers are network (big-endian) order.
  *
  * Epoch shifts: PG dates count days from 2000-01-01 (JD 2451545),
  * Spark from 1970-01-01 (JD 2440588) → +10957 days; timestamps are
  * µs from 2000-01-01 → +946684800000000 µs
  * (ref: src/include/postgres_conversion.hpp:24-33,
  * binary_reader.hpp:131-161).
  */
object PgWire {
  val Signature: Array[Byte] =
    Array[Byte]('P', 'G', 'C', 'O', 'P', 'Y', '\n', -1, '\r', '\n', 0)
  val DateEpochShiftDays: Int = 10957
  val TsEpochShiftMicros: Long = 946684800000000L
  /** ±infinity sentinels (ref: binary_reader.hpp:131-140); Spark has no
    * ±infinity date/timestamp — mapped to min/max values, documented. */
  val PgDateInf: Int = Int.MaxValue
  val PgDateNegInf: Int = Int.MinValue
  val PgTsInf: Long = Long.MaxValue
  val PgTsNegInf: Long = Long.MinValue

  val NumericPos = 0x0000
  val NumericNeg = 0x4000
  val NumericNaN = 0xC000

  private val Pow10: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }

  /** Allocation-free numeric decode: the wire value's unscaled long at
    * `scale`, for DECIMAL(p ≤ 18) targets — the hot money-column shape
    * of every TPC-H/DS scan. The general [[PgBinaryReader.readNumeric]]
    * costs ~8 allocations per value (a BigInteger per digit group, two
    * BigDecimal rescales, a Decimal wrapper); at a 60M-row × 4-decimal
    * scan that is billions of allocations for values that fit a long.
    *
    * Returns [[Long.MinValue]] as the NOT-FAST sentinel (|unscaled| of
    * a p ≤ 18 decimal is < 10^18, so the sentinel is unreachable as a
    * real value): NaN/±inf signs, digit or exponent ranges that could
    * overflow, values exceeding `precision`, or a stored scale finer
    * than `scale` all fall back to the general path unchanged.
    *
    * `len` is the wire-declared field length: a corrupt/truncated
    * numeric whose digit count overruns it returns the sentinel too,
    * so the length-bounded general path raises the framing error —
    * without the check, the columnar caller (which hands over the
    * whole block window) would silently read the NEXT field's bytes
    * as digit groups and produce a wrong value. */
  def numericUnscaledLong(b: Array[Byte], off: Int, len: Int,
      precision: Int, scale: Int): Long = {
    def u16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    if (len < 8) return Long.MinValue
    val ndigits = u16(off)
    if (8 + 2 * ndigits > len) return Long.MinValue
    val weight = u16(off + 2).toShort.toInt // signed
    val sign = u16(off + 4)
    if (sign != NumericPos && sign != NumericNeg) return Long.MinValue
    var v = 0L
    var i = 0
    while (i < ndigits) {
      if (v > 922337203685476L) return Long.MinValue // v*10000+9999 overflows
      v = v * 10000L + u16(off + 8 + 2 * i)
      i += 1
    }
    val e = 4 * (weight - ndigits + 1) + scale
    if (e > 0) {
      if (e > 18 || v > Long.MaxValue / Pow10(e)) return Long.MinValue
      v *= Pow10(e)
    } else if (e < 0) {
      if (e < -18) return Long.MinValue
      val m = Pow10(-e)
      if (v % m != 0L) return Long.MinValue // finer stored scale: general path rounds
      v /= m
    }
    if (precision < 19 && v >= Pow10(precision)) return Long.MinValue // overflow → general path's error
    if (sign == NumericNeg) -v else v
  }

  /** Skip exactly `n` bytes. `DataInputStream.skipBytes` may skip fewer
    * than requested on socket streams, which would desync the PGCOPY
    * framing — loop until the full count is consumed. */
  def skipFully(in: DataInputStream, n: Int): Unit = {
    var remaining = n
    while (remaining > 0) {
      val skipped = in.skipBytes(remaining)
      if (skipped <= 0) { in.readByte(); remaining -= 1 } // EOFException if truncated
      else remaining -= skipped
    }
  }
}

/** Reads PGCOPY binary streams into `InternalRow`s shaped by `types`.
  *
  * (port of semantics, not code, of PostgresBinaryReader —
  * ref: src/include/postgres_binary_reader.hpp:17-567)
  */
final class PgBinaryReader(types: Seq[PgType], targets: Seq[DataType]) {
  require(types.length == targets.length)

  def this(types: Seq[PgType]) = this(types, types.map(PgType.toSpark))

  def readHeader(in: PgBlockInput): Unit = {
    val sig = new Array[Byte](11)
    in.readFully(sig)
    require(java.util.Arrays.equals(sig, PgWire.Signature),
      "not a PGCOPY binary stream")
    in.readInt() // flags
    val ext = in.readInt()
    if (ext > 0) in.skipFully(ext)
  }

  // Per-column readers compiled once: fixed-width primitives read
  // straight off the stream (no per-field byte-array + ByteBuffer
  // allocation — the decode loop runs per field per row on every scan
  // task); everything else falls back to the general byte-slice path.
  // Monomorphic array dispatch also replaces the per-field type match.
  private val fieldReaders: Array[(PgBlockInput, Int) => Any] =
    types.zip(targets).map { case (t, target) =>
      def slice: (PgBlockInput, Int) => Any = { (in, len) =>
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        readValue(bytes, t, target)
      }
      // A fixed-width reader verifies the wire-declared length before
      // trusting it: a mismatched len (corrupt stream or type-mapping
      // bug) read at the expected width would consume the wrong byte
      // count and silently desync the PGCOPY framing for every
      // following field. One int compare per field; a mismatch fails
      // locally naming the type instead of corrupting downstream rows.
      def fixed(width: Int)(f: PgBlockInput => Any): (PgBlockInput, Int) => Any =
        (in, len) => {
          if (len != width) throw new IllegalStateException(
            s"PGCOPY field of type $t declared $len bytes, expected $width")
          f(in)
        }
      val reader: (PgBlockInput, Int) => Any = t match {
        case PgBool => fixed(1)(_.readByte() != 0)
        case PgInt2 => fixed(2)(_.readShort())
        case PgInt4 => fixed(4)(_.readInt())
        case PgInt8 => fixed(8)(_.readLong())
        case PgOid => fixed(4)(_.readInt().toLong & 0xffffffffL)
        case PgFloat4 => fixed(4)(_.readFloat())
        case PgFloat8 => fixed(8)(_.readDouble())
        case PgDate => fixed(4) { in =>
          val d = in.readInt()
          if (d == PgWire.PgDateInf) Int.MaxValue
          else if (d == PgWire.PgDateNegInf) Int.MinValue
          else d + PgWire.DateEpochShiftDays
        }
        case PgTime => fixed(8)(_.readLong())
        case PgTimestamp | PgTimestampTz => fixed(8) { in =>
          val us = in.readLong()
          if (us == PgWire.PgTsInf) Long.MaxValue
          else if (us == PgWire.PgTsNegInf) Long.MinValue
          else us + PgWire.TsEpochShiftMicros
        }
        case PgCtid => fixed(6) { in =>
          val page = in.readInt().toLong & 0xffffffffL
          val off = in.readShort().toLong & 0xffffL
          (page << 16) | off
        }
        case PgText | PgVarchar | PgJson | _: PgUnknown | _: PgEnum =>
          (in, len) => {
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            UTF8String.fromBytes(bytes)
          }
        case _ => slice
      }
      reader
    }.toArray

  /** Read one tuple; None at the -1 trailer (or clean EOF). */
  def readRow(in: PgBlockInput): Option[InternalRow] = {
    val nfields =
      try in.readShort()
      catch { case _: EOFException => return None }
    if (nfields < 0) return None
    require(nfields == types.length,
      s"field count $nfields != expected ${types.length}")
    val row = new GenericInternalRow(types.length)
    var i = 0
    while (i < nfields) {
      val len = in.readInt()
      if (len < 0) row.setNullAt(i)
      else row.update(i, fieldReaders(i)(in, len))
      i += 1
    }
    Some(row)
  }

  def readValue(bytes: Array[Byte], t: PgType, target: DataType): Any = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    t match {
      case PgBool => bytes(0) != 0
      case PgInt2 => buf.getShort
      case PgInt4 => buf.getInt
      case PgInt8 => buf.getLong
      case PgOid => buf.getInt.toLong & 0xffffffffL
      case PgFloat4 => buf.getFloat
      case PgFloat8 => buf.getDouble
      case n: PgNumeric => readNumeric(buf, target)
      case PgText | PgVarchar | PgJson | _: PgUnknown | _: PgEnum =>
        UTF8String.fromBytes(bytes)
      case _: PgBpchar =>
        // trailing-space trim (ref: binary_reader.hpp:389-394)
        var end = bytes.length
        while (end > 0 && bytes(end - 1) == ' ') end -= 1
        UTF8String.fromBytes(bytes, 0, end)
      case PgJsonb =>
        // strip the 1-byte version header (ref: binary_reader.hpp:381-387)
        UTF8String.fromBytes(bytes, 1, bytes.length - 1)
      case PgDate =>
        val d = buf.getInt
        if (d == PgWire.PgDateInf) Int.MaxValue
        else if (d == PgWire.PgDateNegInf) Int.MinValue
        else d + PgWire.DateEpochShiftDays
      case PgTime => buf.getLong // µs since midnight
      case PgTimeTz =>
        val micros = buf.getLong
        val offSec = buf.getInt // seconds WEST of UTC
        UTF8String.fromString(formatTimeTz(micros, offSec))
      case PgTimestamp | PgTimestampTz =>
        val us = buf.getLong
        if (us == PgWire.PgTsInf) Long.MaxValue
        else if (us == PgWire.PgTsNegInf) Long.MinValue
        else us + PgWire.TsEpochShiftMicros
      case PgInterval =>
        val micros = buf.getLong; val days = buf.getInt; val months = buf.getInt
        new CalendarInterval(months, days, micros)
      case PgUuid =>
        val hi = buf.getLong; val lo = buf.getLong
        UTF8String.fromString(new java.util.UUID(hi, lo).toString)
      case PgBytea => bytes
      case PgBit =>
        val nbits = buf.getInt
        val sb = new java.lang.StringBuilder(nbits)
        var i = 0
        while (i < nbits) {
          val b = bytes(4 + i / 8)
          sb.append(if (((b >> (7 - i % 8)) & 1) == 1) '1' else '0')
          i += 1
        }
        UTF8String.fromString(sb.toString)
      case PgCtid =>
        // (page << 16) | row (ref: binary_reader.hpp:354-360)
        val page = buf.getInt.toLong & 0xffffffffL
        val off = buf.getShort.toLong & 0xffffL
        (page << 16) | off
      case PgPoint =>
        val r = new GenericInternalRow(2)
        r.update(0, buf.getDouble); r.update(1, buf.getDouble)
        r
      case PgLine | PgLseg | PgBox | PgCircle =>
        val n = bytes.length / 8
        new GenericArrayData(Array.fill(n)(buf.getDouble))
      case PgPath =>
        // closed flag (as 0.0/1.0) + flattened points
        val closed = buf.get().toDouble
        val npts = buf.getInt
        val out = new Array[Double](1 + npts * 2)
        out(0) = closed
        var i = 0
        while (i < npts * 2) { out(i + 1) = buf.getDouble; i += 1 }
        new GenericArrayData(out)
      case PgPolygon =>
        val npts = buf.getInt
        new GenericArrayData(Array.fill(npts * 2)(buf.getDouble))
      case a: PgArray => readArray(buf, a, target)
      case c: PgComposite => readComposite(buf, c, target)
    }
  }

  /** Positioned [[readValue]]: decode a field in place from a shared
    * page buffer — the packed-verbatim predicate path evaluates pushed
    * WHERE columns per tuple, and a per-value `copyOfRange` there is
    * allocation on a 60M-row loop. Fixed-layout and text shapes decode
    * zero-copy; exotic shapes (arrays, composites, geometry, bit) fall
    * back to the copying path. */
  def readValueAt(bytes: Array[Byte], off: Int, len: Int, t: PgType, target: DataType): Any = {
    def buf = java.nio.ByteBuffer.wrap(bytes, off, len)
    t match {
      case PgBool => bytes(off) != 0
      case PgInt2 => buf.getShort
      case PgInt4 => buf.getInt
      case PgInt8 => buf.getLong
      case PgOid => buf.getInt.toLong & 0xffffffffL
      case PgFloat4 => buf.getFloat
      case PgFloat8 => buf.getDouble
      case _: PgNumeric => readNumeric(buf, target)
      case PgText | PgVarchar | PgJson | _: PgUnknown | _: PgEnum =>
        UTF8String.fromBytes(bytes, off, len)
      case _: PgBpchar =>
        var end = off + len
        while (end > off && bytes(end - 1) == ' ') end -= 1
        UTF8String.fromBytes(bytes, off, end - off)
      case PgJsonb => UTF8String.fromBytes(bytes, off + 1, len - 1)
      case PgDate =>
        val d = buf.getInt
        if (d == PgWire.PgDateInf) Int.MaxValue
        else if (d == PgWire.PgDateNegInf) Int.MinValue
        else d + PgWire.DateEpochShiftDays
      case PgTime => buf.getLong
      case PgTimestamp | PgTimestampTz =>
        val us = buf.getLong
        if (us == PgWire.PgTsInf) Long.MaxValue
        else if (us == PgWire.PgTsNegInf) Long.MinValue
        else us + PgWire.TsEpochShiftMicros
      case PgCtid =>
        val b = buf
        val page = b.getInt.toLong & 0xffffffffL
        val row = b.getShort.toLong & 0xffffL
        (page << 16) | row
      case PgUuid =>
        val b = buf
        UTF8String.fromString(new java.util.UUID(b.getLong, b.getLong).toString)
      case _ => readValue(java.util.Arrays.copyOfRange(bytes, off, off + len), t, target)
    }
  }

  /** base-10000 numeric reconstruction
    * (ref: binary_reader.hpp:204-264). Public: the columnar fast path
    * decodes numerics through the same code. */
  def readNumeric(buf: java.nio.ByteBuffer, target: DataType): Any = {
    // allocation-light fast path for compact decimals (the row and
    // pushed-predicate paths; the columnar reader goes straight to
    // PgWire.numericUnscaledLong and skips even the Decimal wrapper)
    target match {
      case dt: DecimalType if dt.precision <= 18 && buf.hasArray =>
        val v = PgWire.numericUnscaledLong(
          buf.array, buf.arrayOffset + buf.position(), buf.remaining(),
          dt.precision, dt.scale)
        if (v != Long.MinValue) return Decimal(v, dt.precision, dt.scale)
      case _ =>
    }
    val ndigits = buf.getShort.toInt
    val weight = buf.getShort.toInt
    val sign = buf.getShort.toInt & 0xffff
    val dscale = buf.getShort.toInt
    if (sign == PgWire.NumericNaN) {
      return target match {
        case DoubleType => Double.NaN
        case _ => null // DECIMAL has no NaN; documented gap
      }
    }
    var unscaled = BigInteger.ZERO
    val tenK = BigInteger.valueOf(10000)
    var i = 0
    while (i < ndigits) {
      unscaled = unscaled.multiply(tenK).add(BigInteger.valueOf(buf.getShort.toLong))
      i += 1
    }
    // value = unscaled * 10000^(weight - ndigits + 1)
    val exp = (weight - ndigits + 1) * 4
    var bd = new JBigDecimal(unscaled, -exp)
    if (sign == PgWire.NumericNeg) bd = bd.negate()
    bd = bd.setScale(dscale)
    target match {
      case DoubleType => bd.doubleValue()
      case dt: DecimalType => Decimal(bd.setScale(dt.scale), dt.precision, dt.scale)
      case _ => Decimal(bd)
    }
  }

  /** N-dimensional array (ref: binary_reader.hpp:304-332, 504-534). */
  private def readArray(buf: java.nio.ByteBuffer, a: PgArray, target: DataType): Any = {
    val ndim = buf.getInt
    buf.getInt // has-null flag (recomputed on our side)
    buf.getInt // element oid
    if (ndim == 0) return new GenericArrayData(Array.empty[Any])
    val dims = new Array[Int](ndim)
    var i = 0
    while (i < ndim) {
      dims(i) = buf.getInt
      buf.getInt // lower bound — ignored (Spark arrays are 0-based)
      i += 1
    }
    val elemTarget = {
      var dt = target
      var d = 0
      while (d < ndim) { dt = dt.asInstanceOf[ArrayType].elementType; d += 1 }
      dt
    }
    val total = dims.product
    val flat = new Array[Any](total)
    i = 0
    while (i < total) {
      val len = buf.getInt
      flat(i) =
        if (len < 0) null
        else {
          val eb = new Array[Byte](len)
          buf.get(eb)
          readValue(eb, a.elem, elemTarget)
        }
      i += 1
    }
    // nest row-major flat values into ndim levels
    def nest(values: Array[Any], level: Int): Any =
      if (level == ndim - 1) new GenericArrayData(values)
      else {
        val stride = dims.drop(level + 1).product
        new GenericArrayData(
          values.grouped(stride).map(g => nest(g, level + 1)).toArray[Any])
      }
    nest(flat, 0)
  }

  private def readComposite(buf: java.nio.ByteBuffer, c: PgComposite, target: DataType): Any = {
    val st = target.asInstanceOf[StructType]
    val nf = buf.getInt
    require(nf == c.fields.length, s"composite arity $nf != ${c.fields.length}")
    val row = new GenericInternalRow(nf)
    var i = 0
    while (i < nf) {
      buf.getInt // member oid
      val len = buf.getInt
      if (len < 0) row.setNullAt(i)
      else {
        val fb = new Array[Byte](len)
        buf.get(fb)
        row.update(i, readValue(fb, c.fields(i)._2, st.fields(i).dataType))
      }
      i += 1
    }
    row
  }

  private def formatTimeTz(micros: Long, offSec: Int): String = {
    val s = micros / 1000000; val us = micros % 1000000
    val hh = s / 3600; val mm = (s % 3600) / 60; val ss = s % 60
    val frac = if (us == 0) "" else f".$us%06d".replaceAll("0+$", "")
    // PG reports offsets east-positive in text; wire is west-positive
    val east = -offSec
    val sign = if (east >= 0) "+" else "-"
    val oh = math.abs(east) / 3600; val om = (math.abs(east) % 3600) / 60
    f"$hh%02d:$mm%02d:$ss%02d$frac$sign$oh%02d" +
      (if (om != 0) f":$om%02d" else "")
  }
}

/** Writes `InternalRow`s as PGCOPY binary (mirror of the reader;
  * semantics of PostgresBinaryWriter — ref:
  * src/include/postgres_binary_writer.hpp:18-443). */
final class PgBinaryWriter(
    types: Seq[PgType],
    sources: Seq[DataType],
    nullByteReplacement: Option[String] = None) {

  def this(types: Seq[PgType], sources: Seq[DataType]) =
    this(types, sources, None)

  def this(types: Seq[PgType]) = this(types, types.map(PgType.toSpark), None)

  /** PG text types reject NUL bytes; the reference substitutes them
    * when `pg_null_byte_replacement` is set and errors otherwise
    * (ref: src/include/postgres_binary_writer.hpp:210-233). */
  private def cleanText(u: UTF8String): Array[Byte] = {
    val bytes = u.getBytes
    if (!bytes.contains(0: Byte)) bytes
    else nullByteReplacement match {
      case Some(rep) => u.toString.replace("\u0000", rep).getBytes("UTF-8")
      case None => throw new IllegalArgumentException(
        "string contains a NUL byte; set nullByteReplacement to substitute it")
    }
  }

  def writeHeader(out: DataOutputStream): Unit = {
    out.write(PgWire.Signature)
    out.writeInt(0) // flags
    out.writeInt(0) // header extension length
  }

  def writeTrailer(out: DataOutputStream): Unit = out.writeShort(-1)

  def writeRow(out: DataOutputStream, row: InternalRow): Unit = {
    out.writeShort(types.length)
    var i = 0
    while (i < types.length) {
      if (row.isNullAt(i)) out.writeInt(-1)
      else writeValue(out, row.get(i, sources(i)), types(i), sources(i))
      i += 1
    }
  }

  // single-value scratch for variable-width scalars whose byte length
  // is only known after encoding (numeric, bit, timetz, geometry) —
  // reset per value instead of allocating a fresh buffer pair. NEVER
  // used for nested types: arrays/composites recurse through
  // valueBytes, which would clobber a shared buffer mid-value.
  private val scratch = new java.io.ByteArrayOutputStream()
  private val scratchOut = new DataOutputStream(scratch)

  /** Write one length-prefixed field straight to `out`: fixed-width
    * scalars and byte-slice types skip the intermediate per-value
    * buffer `valueBytes` allocates (the write path's hot loop — one
    * COPY IN of a 60M-row seed runs this per field). */
  private def writeValue(out: DataOutputStream, v: Any, t: PgType, source: DataType): Unit = t match {
    case PgBool =>
      out.writeInt(1); out.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0)
    case PgInt2 => out.writeInt(2); out.writeShort(v.asInstanceOf[Short])
    case PgInt4 => out.writeInt(4); out.writeInt(v.asInstanceOf[Int])
    case PgInt8 => out.writeInt(8); out.writeLong(v.asInstanceOf[Long])
    case PgOid => out.writeInt(4); out.writeInt(v.asInstanceOf[Long].toInt)
    case PgFloat4 => out.writeInt(4); out.writeFloat(v.asInstanceOf[Float])
    case PgFloat8 => out.writeInt(8); out.writeDouble(v.asInstanceOf[Double])
    case PgDate =>
      out.writeInt(4); out.writeInt(v.asInstanceOf[Int] - PgWire.DateEpochShiftDays)
    case PgTime => out.writeInt(8); out.writeLong(v.asInstanceOf[Long])
    case PgTimestamp | PgTimestampTz =>
      out.writeInt(8); out.writeLong(v.asInstanceOf[Long] - PgWire.TsEpochShiftMicros)
    case PgCtid =>
      val packed = v.asInstanceOf[Long]
      out.writeInt(6)
      out.writeInt((packed >> 16).toInt)
      out.writeShort((packed & 0xffff).toInt)
    case PgUuid =>
      val u = java.util.UUID.fromString(v.asInstanceOf[UTF8String].toString)
      out.writeInt(16)
      out.writeLong(u.getMostSignificantBits); out.writeLong(u.getLeastSignificantBits)
    case PgInterval =>
      val ci = v.asInstanceOf[CalendarInterval]
      out.writeInt(16)
      out.writeLong(ci.microseconds); out.writeInt(ci.days); out.writeInt(ci.months)
    case PgText | PgVarchar | _: PgBpchar | PgJson | _: PgEnum | _: PgUnknown =>
      val b = cleanText(v.asInstanceOf[UTF8String])
      out.writeInt(b.length); out.write(b)
    case PgJsonb =>
      val b = cleanText(v.asInstanceOf[UTF8String])
      out.writeInt(b.length + 1); out.writeByte(1); out.write(b)
    case PgBytea =>
      val b = v.asInstanceOf[Array[Byte]]
      out.writeInt(b.length); out.write(b)
    case _: PgNumeric =>
      scratch.reset()
      writeNumeric(scratchOut, v, source)
      scratchOut.flush()
      out.writeInt(scratch.size())
      scratch.writeTo(out)
    case _ =>
      // nested/rare shapes (arrays, composites, geometry, bit, timetz)
      // keep the buffered form — safe under recursion
      val bytes = valueBytes(v, t, source)
      out.writeInt(bytes.length)
      out.write(bytes)
  }

  def valueBytes(v: Any, t: PgType, source: DataType): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    t match {
      case PgBool => o.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0)
      case PgInt2 => o.writeShort(v.asInstanceOf[Short])
      case PgInt4 => o.writeInt(v.asInstanceOf[Int])
      case PgInt8 => o.writeLong(v.asInstanceOf[Long])
      case PgOid => o.writeInt(v.asInstanceOf[Long].toInt)
      case PgFloat4 => o.writeFloat(v.asInstanceOf[Float])
      case PgFloat8 => o.writeDouble(v.asInstanceOf[Double])
      case n: PgNumeric => writeNumeric(o, v, source)
      case PgText | PgVarchar | _: PgBpchar | PgJson | _: PgEnum | _: PgUnknown =>
        o.write(cleanText(v.asInstanceOf[UTF8String]))
      case PgJsonb =>
        o.writeByte(1) // jsonb wire version
        o.write(cleanText(v.asInstanceOf[UTF8String]))
      case PgDate => o.writeInt(v.asInstanceOf[Int] - PgWire.DateEpochShiftDays)
      case PgTime => o.writeLong(v.asInstanceOf[Long])
      case PgTimeTz =>
        // inverse of the reader's canonical text form (Spark has no
        // TIMETZ type, so the column travels as its text literal)
        val (micros, offSec) = parseTimeTz(v.asInstanceOf[UTF8String].toString)
        o.writeLong(micros)
        o.writeInt(offSec)
      case PgTimestamp | PgTimestampTz =>
        o.writeLong(v.asInstanceOf[Long] - PgWire.TsEpochShiftMicros)
      case PgInterval =>
        val ci = v.asInstanceOf[CalendarInterval]
        o.writeLong(ci.microseconds); o.writeInt(ci.days); o.writeInt(ci.months)
      case PgUuid =>
        val u = java.util.UUID.fromString(v.asInstanceOf[UTF8String].toString)
        o.writeLong(u.getMostSignificantBits); o.writeLong(u.getLeastSignificantBits)
      case PgBytea => o.write(v.asInstanceOf[Array[Byte]])
      case PgBit =>
        val s = v.asInstanceOf[UTF8String].toString
        o.writeInt(s.length)
        var acc = 0; var nb = 0
        s.foreach { ch =>
          acc = (acc << 1) | (if (ch == '1') 1 else 0); nb += 1
          if (nb == 8) { o.writeByte(acc); acc = 0; nb = 0 }
        }
        if (nb > 0) o.writeByte(acc << (8 - nb))
      case PgCtid =>
        val packed = v.asInstanceOf[Long]
        o.writeInt((packed >> 16).toInt)
        o.writeShort((packed & 0xffff).toInt)
      case PgPoint =>
        val r = v.asInstanceOf[InternalRow]
        o.writeDouble(r.getDouble(0)); o.writeDouble(r.getDouble(1))
      case PgLine | PgLseg | PgBox | PgCircle =>
        val arr = v.asInstanceOf[ArrayData]
        (0 until arr.numElements()).foreach(i => o.writeDouble(arr.getDouble(i)))
      case PgPath =>
        val arr = v.asInstanceOf[ArrayData]
        o.writeByte(arr.getDouble(0).toInt)
        val npts = (arr.numElements() - 1) / 2
        o.writeInt(npts)
        (1 until arr.numElements()).foreach(i => o.writeDouble(arr.getDouble(i)))
      case PgPolygon =>
        val arr = v.asInstanceOf[ArrayData]
        o.writeInt(arr.numElements() / 2)
        (0 until arr.numElements()).foreach(i => o.writeDouble(arr.getDouble(i)))
      case a: PgArray => writeArray(o, v, a, source)
      case c: PgComposite => writeComposite(o, v, c, source)
    }
    o.flush()
    bos.toByteArray
  }

  private val TimeTzRe =
    """(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?([+-])(\d{2})(?::(\d{2}))?(?::(\d{2}))?""".r

  /** `HH:MM:SS[.ffffff](+|-)OH[:OM[:OS]]` → (µs since midnight,
    * seconds WEST of UTC) — the wire encoding. */
  private def parseTimeTz(s: String): (Long, Int) = s match {
    case TimeTzRe(hh, mm, ss, frac, sign, oh, om, os) =>
      val us = if (frac == null) 0L else (frac + "0" * (6 - frac.length)).toLong
      val micros = (hh.toLong * 3600 + mm.toLong * 60 + ss.toLong) * 1000000L + us
      val east = (oh.toInt * 3600 +
        (if (om == null) 0 else om.toInt) * 60 +
        (if (os == null) 0 else os.toInt)) * (if (sign == "+") 1 else -1)
      (micros, -east) // text is east-positive, wire west-positive
    case other =>
      throw new IllegalArgumentException(s"bad timetz literal: $other")
  }

  /** base-10000 numeric encoding (ref: binary_writer.hpp:141-201). */
  private def writeNumeric(o: DataOutputStream, v: Any, source: DataType): Unit = {
    val bd0: JBigDecimal = source match {
      case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN) {
          o.writeShort(0); o.writeShort(0)
          o.writeShort(PgWire.NumericNaN); o.writeShort(0)
          return
        }
        new JBigDecimal(d, MathContext.DECIMAL64)
      case _ => new JBigDecimal(v.toString)
    }
    val dscale = math.max(bd0.scale(), 0)
    val bd = bd0.setScale(dscale)
    val neg = bd.signum() < 0
    val abs = bd.abs()
    // left-pad integral digits and right-pad fractional digits to
    // multiples of 4, then slice base-10000 groups
    val plain = abs.toPlainString
    val (intPart0, fracPart0) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i => (plain.substring(0, i), plain.substring(i + 1))
    }
    val intPart = "0" * ((4 - intPart0.length % 4) % 4) + intPart0
    val fracPart = fracPart0 + "0" * ((4 - fracPart0.length % 4) % 4)
    val groups = (intPart + fracPart).grouped(4).map(_.toInt).toArray
    val intGroups = intPart.length / 4
    var lo = 0
    var hi = groups.length
    while (lo < hi && groups(lo) == 0) lo += 1
    while (hi > lo && groups(hi - 1) == 0) hi -= 1
    val ndigits = hi - lo
    val weight = intGroups - 1 - lo
    o.writeShort(ndigits)
    o.writeShort(if (ndigits == 0) 0 else weight)
    o.writeShort(if (neg) PgWire.NumericNeg else PgWire.NumericPos)
    o.writeShort(dscale)
    (lo until hi).foreach(i => o.writeShort(groups(i)))
  }

  private def writeArray(o: DataOutputStream, v: Any, a: PgArray, source: DataType): Unit = {
    // flatten the (possibly nested) ArrayData, collecting dims
    val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
    var level = 0
    def collect(x: Any, dt: DataType, lvl: Int): Seq[(Any, DataType)] = dt match {
      case ArrayType(et, _) if lvl < a.ndims =>
        val arr = x.asInstanceOf[ArrayData]
        if (dims.length <= lvl) dims += arr.numElements()
        else require(dims(lvl) == arr.numElements(),
          "ragged multi-dimensional array cannot round-trip to PG")
        (0 until arr.numElements()).flatMap { i =>
          val child = if (arr.isNullAt(i)) null else arr.get(i, et)
          if (lvl == a.ndims - 1) Seq((child, et)) else collect(child, et, lvl + 1)
        }
      case _ => Seq((x, dt))
    }
    val flat = collect(v, source, 0)
    o.writeInt(a.ndims)
    o.writeInt(if (flat.exists(_._1 == null)) 1 else 0)
    o.writeInt(a.elemOid)
    dims.foreach { d => o.writeInt(d); o.writeInt(1) } // lower bound 1
    flat.foreach { case (e, dt) =>
      if (e == null) o.writeInt(-1)
      else {
        val b = valueBytes(e, a.elem, dt)
        o.writeInt(b.length); o.write(b)
      }
    }
  }

  private def writeComposite(o: DataOutputStream, v: Any, c: PgComposite, source: DataType): Unit = {
    val st = source.asInstanceOf[StructType]
    val row = v.asInstanceOf[InternalRow]
    o.writeInt(c.fields.length)
    c.fields.zipWithIndex.foreach { case ((_, ft), i) =>
      o.writeInt(ft.oid)
      if (row.isNullAt(i)) o.writeInt(-1)
      else {
        val b = valueBytes(row.get(i, st.fields(i).dataType), ft, st.fields(i).dataType)
        o.writeInt(b.length); o.write(b)
      }
    }
  }
}
