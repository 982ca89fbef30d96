package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{PgBinaryReader, PgBinaryWriter, PgWire}
import graft.types.PgType
import graft.types.PgType._

class CodecSpec extends AnyFunSuite {

  private def roundTrip(types: Seq[PgType], rows: Seq[InternalRow]): Seq[InternalRow] = {
    val w = new PgBinaryWriter(types)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    w.writeHeader(out)
    rows.foreach(w.writeRow(out, _))
    w.writeTrailer(out)
    out.flush()
    val r = new PgBinaryReader(types)
    val in = new graft.codec.PgBlockInput(new ByteArrayInputStream(bos.toByteArray))
    r.readHeader(in)
    Iterator.continually(r.readRow(in)).takeWhile(_.isDefined).map(_.get).toSeq
  }

  private def row(vals: Any*): InternalRow = new GenericInternalRow(vals.toArray)

  test("scalar types round-trip") {
    val types = Seq(PgBool, PgInt2, PgInt4, PgInt8, PgFloat4, PgFloat8, PgText)
    val rows = Seq(
      row(true, 7.toShort, 42, 123456789012345L, 1.5f, math.Pi,
        UTF8String.fromString("héllo wörld")),
      row(false, Short.MinValue, Int.MaxValue, Long.MinValue,
        Float.MinPositiveValue, Double.MaxValue, UTF8String.fromString("")))
    val got = roundTrip(types, rows)
    assert(got.length == 2)
    assert(got(0).getBoolean(0))
    assert(got(0).getShort(1) == 7)
    assert(got(0).getInt(2) == 42)
    assert(got(0).getLong(3) == 123456789012345L)
    assert(got(0).getFloat(4) == 1.5f)
    assert(got(0).getDouble(5) == math.Pi)
    assert(got(0).getUTF8String(6).toString == "héllo wörld")
    assert(got(1).getInt(2) == Int.MaxValue)
  }

  test("nulls round-trip in every position") {
    val types = Seq(PgInt4, PgText, PgFloat8)
    val rows = Seq(row(null, null, null), row(1, UTF8String.fromString("x"), 2.0))
    val got = roundTrip(types, rows)
    assert(got(0).isNullAt(0) && got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(!got(1).isNullAt(0))
  }

  test("numeric base-10000 codec is exact across magnitudes") {
    val cases = Seq(
      "0", "1", "-1", "0.1", "-0.01", "9999", "10000", "10001.0001",
      "123456789012345678.123456", "-0.000001", "99999999.9999",
      "12345678901234567890123456789012.345678", "0.00000001")
    cases.foreach { s =>
      val bd = new java.math.BigDecimal(s)
      val p = math.max(bd.precision, bd.scale + 1)
      val t = PgNumeric(math.min(p, 38), bd.scale)
      val dt = DecimalType(math.min(p, 38), bd.scale)
      val w = new PgBinaryWriter(Seq(t), Seq(dt))
      val r = new PgBinaryReader(Seq(t), Seq(dt))
      val got = {
        val bos = new ByteArrayOutputStream(); val out = new DataOutputStream(bos)
        w.writeHeader(out)
        w.writeRow(out, row(Decimal(bd, math.min(p, 38), bd.scale)))
        w.writeTrailer(out)
        val in = new graft.codec.PgBlockInput(new ByteArrayInputStream(bos.toByteArray))
        r.readHeader(in); r.readRow(in).get
      }
      assert(got.getDecimal(0, math.min(p, 38), bd.scale).toJavaBigDecimal
        .compareTo(bd) == 0, s"mismatch for $s")
    }
  }

  test("unconstrained numeric reads as double (NUMERIC_AS_DOUBLE fallback)") {
    val t = PgNumeric(0, 0)
    val w = new PgBinaryWriter(Seq(PgNumeric(20, 4)), Seq(DecimalType(20, 4)))
    val bos = new ByteArrayOutputStream(); val out = new DataOutputStream(bos)
    w.writeHeader(out)
    w.writeRow(out, row(Decimal(new java.math.BigDecimal("12345.6789"), 20, 4)))
    w.writeTrailer(out)
    val r = new PgBinaryReader(Seq(t)) // unconstrained → DoubleType target
    val in = new graft.codec.PgBlockInput(new ByteArrayInputStream(bos.toByteArray))
    r.readHeader(in)
    assert(r.readRow(in).get.getDouble(0) == 12345.6789)
  }

  test("temporal types: epoch shifts and interval") {
    val types = Seq(PgDate, PgTimestamp, PgTime, PgInterval)
    // 2000-01-01 in Spark days = 10957; PG wire stores 0 for it
    val sparkDays2000 = 10957
    val microsAt2000 = PgWire.TsEpochShiftMicros
    val rows = Seq(row(sparkDays2000, microsAt2000, 3600000000L,
      new CalendarInterval(14, 3, 7500000L)))
    val got = roundTrip(types, rows)
    assert(got(0).getInt(0) == sparkDays2000)
    assert(got(0).getLong(1) == microsAt2000)
    assert(got(0).getLong(2) == 3600000000L)
    val ci = got(0).getInterval(3)
    assert(ci.months == 14 && ci.days == 3 && ci.microseconds == 7500000L)
  }

  test("uuid canonical form, bytea, jsonb version byte, bpchar trim") {
    val types = Seq(PgUuid, PgBytea, PgJsonb)
    val uuid = "123e4567-e89b-12d3-a456-426614174000"
    val rows = Seq(row(UTF8String.fromString(uuid), Array[Byte](1, 2, -1),
      UTF8String.fromString("""{"a":1}""")))
    val got = roundTrip(types, rows)
    assert(got(0).getUTF8String(0).toString == uuid)
    assert(got(0).getBinary(1).toSeq == Seq[Byte](1, 2, -1))
    assert(got(0).getUTF8String(2).toString == """{"a":1}""")

    // bpchar: reader trims what a PG server would have space-padded
    val bp = new PgBinaryReader(Seq(PgBpchar(5)))
    val w = new PgBinaryWriter(Seq(PgBpchar(5)))
    val bos = new ByteArrayOutputStream(); val out = new DataOutputStream(bos)
    w.writeHeader(out)
    w.writeRow(out, row(UTF8String.fromString("ab   ")))
    w.writeTrailer(out)
    val in = new graft.codec.PgBlockInput(new ByteArrayInputStream(bos.toByteArray))
    bp.readHeader(in)
    assert(bp.readRow(in).get.getUTF8String(0).toString == "ab")
  }

  test("ctid packs (page << 16) | row") {
    val types = Seq(PgCtid)
    val packed = (123456789L << 16) | 77L
    val got = roundTrip(types, Seq(row(packed)))
    assert(got(0).getLong(0) == packed)
  }

  test("1-d and 2-d arrays with nulls round-trip") {
    val t1 = PgArray(PgInt4)
    val got1 = roundTrip(Seq(t1),
      Seq(row(new GenericArrayData(Array[Any](1, null, 3)))))
    val a1 = got1(0).getArray(0)
    assert(a1.numElements() == 3 && a1.getInt(0) == 1 && a1.isNullAt(1) && a1.getInt(2) == 3)

    val t2 = PgArray(PgText, ndims = 2)
    val nested = new GenericArrayData(Array[Any](
      new GenericArrayData(Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b"))),
      new GenericArrayData(Array[Any](UTF8String.fromString("c"), null))))
    val got2 = roundTrip(Seq(t2), Seq(row(nested)))
    val outer = got2(0).getArray(0)
    assert(outer.numElements() == 2)
    val inner1 = outer.getArray(1)
    assert(inner1.getUTF8String(0).toString == "c" && inner1.isNullAt(1))
  }

  test("composite and point round-trip") {
    val comp = PgComposite("pair", Seq("i" -> PgInt4, "s" -> PgText))
    val types = Seq(comp, PgPoint)
    val rows = Seq(row(
      new GenericInternalRow(Array[Any](5, UTF8String.fromString("five"))),
      new GenericInternalRow(Array[Any](1.5, -2.5))))
    val got = roundTrip(types, rows)
    val c = got(0).getStruct(0, 2)
    assert(c.getInt(0) == 5 && c.getUTF8String(1).toString == "five")
    val p = got(0).getStruct(1, 2)
    assert(p.getDouble(0) == 1.5 && p.getDouble(1) == -2.5)
  }

  test("geometry shapes round-trip as double arrays") {
    val types = Seq(PgBox, PgPolygon, PgPath, PgCircle)
    val rows = Seq(row(
      new GenericArrayData(Array(1.0, 2.0, 3.0, 4.0)),
      new GenericArrayData(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0)),
      new GenericArrayData(Array(1.0, 5.0, 6.0, 7.0, 8.0)), // closed flag + 2 pts
      new GenericArrayData(Array(0.0, 0.0, 9.5))))
    val got = roundTrip(types, rows)
    assert(got(0).getArray(0).toDoubleArray.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(got(0).getArray(1).toDoubleArray.toSeq == Seq(0.0, 0.0, 1.0, 0.0, 1.0, 1.0))
    assert(got(0).getArray(2).toDoubleArray.toSeq == Seq(1.0, 5.0, 6.0, 7.0, 8.0))
    assert(got(0).getArray(3).toDoubleArray.toSeq == Seq(0.0, 0.0, 9.5))
  }

  test("bit strings round-trip") {
    val got = roundTrip(Seq(PgBit), Seq(row(UTF8String.fromString("101100111"))))
    assert(got(0).getUTF8String(0).toString == "101100111")
  }

  test("type bridge: pg→spark→pg narrowing stays consistent") {
    assert(PgType.toSpark(PgInt8) == LongType)
    assert(PgType.toSpark(PgNumeric(12, 2)) == DecimalType(12, 2))
    assert(PgType.toSpark(PgNumeric(0, 0)) == DoubleType)
    assert(PgType.toSpark(PgArray(PgFloat4, 2)) == ArrayType(ArrayType(FloatType)))
    assert(PgType.fromSpark(ByteType) == PgInt2) // TINYINT → SMALLINT
    assert(PgType.fromSpark(StringType) == PgVarchar)
    assert(PgType.typeString(PgArray(PgInt4, 2)) == "INTEGER[][]")
    assert(PgType.fromName("_float8", ndims = 1) == PgArray(PgFloat8, 1))
    // numeric typmod packing: ((p << 16) | s) + 4
    assert(PgType.fromName("numeric", ((12 << 16) | 2) + 4) == PgNumeric(12, 2))
    assert(PgType.fromName("bpchar", 9) == PgBpchar(5))
  }

  test("NUL bytes in strings: replaced when configured, rejected otherwise") {
    val t = Seq(PgVarchar)
    val strict = new PgBinaryWriter(t, Seq(StringType))
    intercept[IllegalArgumentException] {
      strict.valueBytes(UTF8String.fromString("a\u0000b"), PgVarchar, StringType)
    }
    val lenient = new PgBinaryWriter(t, Seq(StringType), Some("?"))
    val bytes = lenient.valueBytes(UTF8String.fromString("a\u0000b"), PgVarchar, StringType)
    assert(new String(bytes, "UTF-8") == "a?b")
  }
}
