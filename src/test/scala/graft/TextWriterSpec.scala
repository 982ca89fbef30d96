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

  test("interval seconds render as plain decimal, never scientific notation") {
    val w = new PgTextWriter(Seq(PgInterval, PgInterval, PgInterval),
      Seq(CalendarIntervalType, CalendarIntervalType, CalendarIntervalType))
    val row = new GenericInternalRow(Array[Any](
      new CalendarInterval(0, 0, 100L),           // 1e-4 s — double would emit 1.0E-4
      new CalendarInterval(1, 2, 10800000000000L), // 3000 h — double would emit 1.08E13
      new CalendarInterval(0, 0, 0L)))
    assert(w.rowText(row) == "P0M0DT0.0001S\tP1M2DT10800000S\tP0M0DT0S")
  }

  test("time 24:00:00 (valid in PG, outside LocalTime) renders") {
    val w = new PgTextWriter(Seq(PgTime), Seq(LongType))
    val row = new GenericInternalRow(Array[Any](86400000000L))
    assert(w.rowText(row) == "24:00:00")
  }

  test("array elements spelled like null are quoted case-insensitively") {
    val w = new PgTextWriter(Seq(PgArray(PgText)), Seq(ArrayType(StringType)))
    val row = new GenericInternalRow(Array[Any](new GenericArrayData(Array[Any](
      UTF8String.fromString("null"), UTF8String.fromString("Null"), null))))
    // unquoted null/Null would be read back by PG as SQL NULL
    assert(w.rowText(row) == """{"null","Null",NULL}""")
  }

  test("format choice: binary unless a type cannot round-trip it") {
    import PgCopyFormat._
    assert(forTypes(Seq(PgInt4, PgNumeric(10, 2), PgArray(PgText))) == Binary)
    assert(forTypes(Seq(PgInt4, PgUnknown("macaddr"))) == Text)
    assert(forTypes(Seq(PgEnum("mood", Seq("happy", "sad")))) == Text)
    assert(forTypes(Seq(PgArray(PgUnknown("xml")))) == Text)
    assert(forTypes(Seq(PgBit)) == Text)
  }

  test("random string arrays survive writer -> endpoint parse -> writer (fixpoint)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // The text array literal has two codecs in this repo: PgTextWriter
    // renders, InMemoryPg parses on COPY IN. Rendering a parsed render
    // must be a fixpoint, or a text-format write would corrupt data on
    // its way into storage. Driven through a real table round trip.
    val pg = graft.meta.InMemoryPg.forName("textprop")
    pg.execute("""CREATE TABLE IF NOT EXISTS "public"."tp" ("id" INTEGER, "a" TEXT[])""")
    val t = pg.getTable("public", "tp")
    val w = new PgTextWriter(t.colTypes)
    val charGen = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', ',', '{', '}',
      ' ', '\t', '\u00e9', '(', ')'))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val arrGen = Gen.listOf(strGen)
    val samples = (0 until 80).flatMap(i => arrGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    samples.zipWithIndex.foreach { case (arr, i) =>
      val row = new GenericInternalRow(Array[Any](i,
        new GenericArrayData(arr.map(UTF8String.fromString).toArray[Any])))
      val line = w.rowText(row)
      // feed through the endpoint's text COPY input path
      val out = pg.copyIn("""COPY "public"."tp" ("id", "a") FROM STDIN (FORMAT text)""")
      out.write((line + "\n").getBytes("UTF-8")); out.close()
      val stored = t.slots.last.get
      val back = stored.getArray(1)
      val got = (0 until back.numElements()).map(j =>
        if (back.isNullAt(j)) null else back.getUTF8String(j).toString)
      assert(got == arr, s"sample $i: wrote <$line>")
    }
  }
}
