package graft.codec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

import graft.types.PgType
import graft.types.PgType._

/** COPY TEXT serializer — the fallback wire format for values whose
  * types don't round-trip PGCOPY binary (semantics of the reference's
  * PostgresTextWriter + the text-literal formatting of
  * src/postgres_copy_to.cpp:113-278; format choice rule from
  * GetCopyFormat, src/storage/postgres_table_entry.cpp:74-127).
  *
  * One tuple per line, tab-separated, `\N` for NULL, C-style escapes
  * for control characters; arrays as `{a,b,NULL}` literals with
  * element quoting, composites as `(x,y)` record literals.
  */
final class PgTextWriter(
    types: Seq[PgType],
    sources: Seq[DataType],
    nullByteReplacement: Option[String]) {

  def this(types: Seq[PgType], sources: Seq[DataType]) = this(types, sources, None)
  def this(types: Seq[PgType]) = this(types, types.map(PgType.toSpark), None)

  /** PG text types reject NUL bytes; substituted when the option is
    * set, an error otherwise — identical to the binary writer and to
    * the reference's text path (ref: src/include/
    * postgres_text_writer.hpp:65-74). */
  private def cleanText(s: String): String =
    if (s.indexOf('\u0000') < 0) s
    else nullByteReplacement match {
      case Some(rep) => s.replace("\u0000", rep)
      case None => throw new IllegalArgumentException(
        "string contains a NUL byte; set nullByteReplacement to substitute it")
    }

  /** Render one row as a COPY TEXT line (without the trailing \n). */
  def rowText(row: InternalRow): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append('\t')
      if (row.isNullAt(i)) sb.append("\\N")
      else sb.append(escapeField(valueText(row.get(i, sources(i)), types(i), sources(i))))
      i += 1
    }
    sb.toString
  }

  /** COPY TEXT field escaping: backslash, tab, newline, CR. */
  private def escapeField(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The unescaped text literal for a value (PG input syntax). */
  def valueText(v: Any, t: PgType, source: DataType): String = t match {
    case PgBool => if (v.asInstanceOf[Boolean]) "t" else "f"
    case PgInt2 | PgInt4 | PgInt8 | PgOid | PgFloat4 | PgFloat8 => v.toString
    case _: PgNumeric => source match {
      case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
      case _ => v.toString
    }
    case PgText | PgVarchar | _: PgBpchar | PgJson | PgJsonb | _: PgEnum |
      _: PgUnknown | PgBit | PgUuid => cleanText(v.toString)
    case PgBytea =>
      "\\x" + v.asInstanceOf[Array[Byte]].map(b => f"$b%02x").mkString
    case PgDate =>
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
    case PgTime =>
      val us = v.asInstanceOf[Long]
      // PG permits 24:00:00, one past LocalTime's domain
      if (us == 86400000000L) "24:00:00"
      else java.time.LocalTime.ofNanoOfDay(us * 1000).toString
    case PgTimeTz => v.toString // already the canonical PG text literal
    case PgTimestamp | PgTimestampTz =>
      val us = v.asInstanceOf[Long]
      val secs = Math.floorDiv(us, 1000000L)
      val nanos = Math.floorMod(us, 1000000L) * 1000
      java.time.LocalDateTime.ofEpochSecond(secs, nanos.toInt,
        java.time.ZoneOffset.UTC).toString.replace('T', ' ')
    case PgInterval =>
      val ci = v.asInstanceOf[CalendarInterval]
      // ISO-8601 interval input form, accepted by PG. Seconds render
      // through BigDecimal: double division would emit scientific
      // notation (1.0E-4, 1.08E13) that PG's interval parser rejects,
      // and loses microsecond precision on large values.
      val secs = java.math.BigDecimal.valueOf(ci.microseconds)
        .movePointLeft(6).stripTrailingZeros().toPlainString
      s"P${ci.months}M${ci.days}DT${secs}S"
    case PgCtid =>
      val p = v.asInstanceOf[Long]
      s"(${p >>> 16},${p & 0xffffL})"
    case a: PgArray => arrayLiteral(v.asInstanceOf[ArrayData], a, source)
    case c: PgComposite =>
      val st = source.asInstanceOf[StructType]
      val row = v.asInstanceOf[InternalRow]
      c.fields.indices.map { i =>
        if (row.isNullAt(i)) ""
        else quoteInComposite(valueText(
          row.get(i, st.fields(i).dataType), c.fields(i)._2, st.fields(i).dataType))
      }.mkString("(", ",", ")")
    case PgPoint =>
      val r = v.asInstanceOf[InternalRow]
      s"(${r.getDouble(0)},${r.getDouble(1)})"
    case PgLine | PgLseg | PgBox | PgPath | PgPolygon | PgCircle =>
      val arr = v.asInstanceOf[ArrayData]
      (0 until arr.numElements()).map(arr.getDouble).mkString("(", ",", ")")
  }

  private def arrayLiteral(arr: ArrayData, a: PgArray, source: DataType): String = {
    val et = source.asInstanceOf[ArrayType].elementType
    // element type of one dimension down: either a nested PgArray, or —
    // when dimensionality is tracked via ndims on a scalar elem — the
    // same PgArray with one fewer dimension
    val innerArray: Option[PgArray] = a.elem match {
      case inner: PgArray => Some(inner)
      case _ if a.ndims > 1 => Some(a.copy(ndims = a.ndims - 1))
      case _ => None
    }
    (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) "NULL"
      else {
        val e = arr.get(i, et)
        innerArray match {
          case Some(inner) => arrayLiteral(e.asInstanceOf[ArrayData], inner, et)
          case None => quoteInArray(valueText(e, a.elem, et))
        }
      }
    }.mkString("{", ",", "}")
  }

  /** Array elements containing specials must be double-quoted. The
    * NULL check is case-INsensitive: PG's array input reads any
    * unquoted spelling of null ("null", "Null", ...) as SQL NULL, so
    * a string element that IS one of those spellings must be quoted
    * or it silently round-trips as NULL. */
  private def quoteInArray(s: String): String =
    if (s.isEmpty || s.exists(c => c == ',' || c == '{' || c == '}' ||
      c == '"' || c == '\\' || c.isWhitespace) || s.equalsIgnoreCase("NULL"))
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    else s

  private def quoteInComposite(s: String): String =
    if (s.isEmpty || s.exists(c => c == ',' || c == '(' || c == ')' ||
      c == '"' || c == '\\' || c.isWhitespace))
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    else s
}

/** Which COPY wire format a write should use — binary unless some
  * column's type can't round-trip it (ref: GetCopyFormat,
  * src/storage/postgres_table_entry.cpp:74-127: enums, casts-to-
  * varchar and other text-only types force the text path). */
object PgCopyFormat {
  sealed trait Format
  case object Binary extends Format
  case object Text extends Format

  def binaryRoundTrips(t: PgType): Boolean = t match {
    case _: PgUnknown | _: PgEnum | PgBit => false
    case a: PgArray => binaryRoundTrips(a.elem)
    case c: PgComposite => c.fields.forall(f => binaryRoundTrips(f._2))
    case _ => true
  }

  def forTypes(types: Seq[PgType]): Format =
    if (types.forall(binaryRoundTrips)) Binary else Text
}
