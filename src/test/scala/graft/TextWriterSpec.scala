package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{PgCopyFormat, PgTextWriter}
import graft.types.PgType._

class TextWriterSpec extends AnyFunSuite {

  test("scalar text formatting matches PG input syntax") {
    val w = new PgTextWriter(Seq(PgBool, PgInt4, PgNumeric(10, 2), PgText,
      PgDate, PgTimestamp, PgBytea))
    val row = new GenericInternalRow(Array[Any](
      true, -5, Decimal(new java.math.BigDecimal("12.30"), 10, 2),
      UTF8String.fromString("tab\there\nnl"),
      18321, // 2020-02-29 epoch day
      graft.codec.PgWire.TsEpochShiftMicros, // 2000-01-01 00:00
      Array[Byte](0, -1)))
    assert(w.rowText(row) ==
      "t\t-5\t12.30\ttab\\there\\nnl\t2020-02-29\t2000-01-01 00:00\t\\\\x00ff")
  }

  test("null fields render as \\N") {
    val w = new PgTextWriter(Seq(PgInt4, PgText))
    val row = new GenericInternalRow(2)
    assert(w.rowText(row) == "\\N\t\\N")
  }

  test("array and composite literals with quoting") {
    val w = new PgTextWriter(
      Seq(PgArray(PgText), PgComposite("pair", Seq("a" -> PgInt4, "b" -> PgText))),
      Seq(ArrayType(StringType),
        StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))))
    val row = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](
        UTF8String.fromString("plain"), null, UTF8String.fromString("with space"),
        UTF8String.fromString("qu\"ote"))),
      new GenericInternalRow(Array[Any](7, UTF8String.fromString("x,y")))))
    // field-level COPY escaping applies on top of literal quoting, so
    // the literal `qu\"ote` arrives as `qu\\"ote` on the wire
    assert(w.rowText(row) ==
      """{plain,NULL,"with space","qu\\"ote"}	(7,"x,y")""")
  }

  test("format choice: binary unless a type cannot round-trip it") {
    import PgCopyFormat._
    assert(forTypes(Seq(PgInt4, PgNumeric(10, 2), PgArray(PgText))) == Binary)
    assert(forTypes(Seq(PgInt4, PgUnknown("macaddr"))) == Text)
    assert(forTypes(Seq(PgEnum("mood", Seq("happy", "sad")))) == Text)
    assert(forTypes(Seq(PgArray(PgUnknown("xml")))) == Text)
    assert(forTypes(Seq(PgBit)) == Text)
  }
}
