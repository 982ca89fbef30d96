package graft.types

import org.apache.spark.sql.types._

/** Postgres type model for the connector.
  *
  * Mirrors the role of the reference's side-band `PostgresType{oid,
  * annotation, children}` tree (ref: src/include/postgres_utils.hpp:25-45)
  * but as an idiomatic Scala ADT. The annotation enum of the reference
  * (STANDARD, CAST_TO_VARCHAR, NUMERIC_AS_DOUBLE, CTID, JSONB,
  * FIXED_LENGTH_CHAR, GEOM_*) maps onto distinct ADT cases here.
  */
sealed abstract class PgType(val typeName: String, val oid: Int)
    extends Serializable {
  /** nested children for arrays/composites */
  def children: Seq[PgType] = Nil
}

object PgType {
  // scalar types — oids are the fixed pg_catalog.pg_type values
  case object PgBool extends PgType("bool", 16)
  case object PgInt2 extends PgType("int2", 21)
  case object PgInt4 extends PgType("int4", 23)
  case object PgInt8 extends PgType("int8", 20)
  case object PgOid extends PgType("oid", 26)
  case object PgFloat4 extends PgType("float4", 700)
  case object PgFloat8 extends PgType("float8", 701)

  /** numeric(p,s); precision<=0 means unconstrained → lossy DOUBLE
    * fallback (ref: src/postgres_utils.cpp:130-138 NUMERIC_AS_DOUBLE). */
  final case class PgNumeric(precision: Int, scale: Int) extends PgType("numeric", 1700) {
    def isUnconstrained: Boolean = precision <= 0 || precision > 38 || scale < 0
  }

  case object PgText extends PgType("text", 25)
  case object PgVarchar extends PgType("varchar", 1043)
  /** blank-padded char(n) — trailing spaces trimmed on read
    * (ref: src/include/postgres_binary_reader.hpp:389-394). */
  final case class PgBpchar(n: Int) extends PgType("bpchar", 1042)
  case object PgJson extends PgType("json", 114)
  /** jsonb — wire value carries a 1-byte version header
    * (ref: src/include/postgres_binary_reader.hpp:381-387). */
  case object PgJsonb extends PgType("jsonb", 3802)

  case object PgDate extends PgType("date", 1082)
  case object PgTime extends PgType("time", 1083)
  case object PgTimeTz extends PgType("timetz", 1266)
  case object PgTimestamp extends PgType("timestamp", 1114)
  case object PgTimestampTz extends PgType("timestamptz", 1184)
  case object PgInterval extends PgType("interval", 1186)

  case object PgUuid extends PgType("uuid", 2950)
  case object PgBytea extends PgType("bytea", 17)
  case object PgBit extends PgType("bit", 1560)

  /** physical row id (page, tuple) packed to one int64:
    * (page_index << 16) | row_in_page
    * (ref: src/include/postgres_binary_reader.hpp:354-360). */
  case object PgCtid extends PgType("tid", 27)

  // geometry (ref: src/postgres_utils.cpp:163-186)
  case object PgPoint extends PgType("point", 600)
  case object PgLine extends PgType("line", 628)
  case object PgLseg extends PgType("lseg", 601)
  case object PgBox extends PgType("box", 603)
  case object PgPath extends PgType("path", 602)
  case object PgPolygon extends PgType("polygon", 604)
  case object PgCircle extends PgType("circle", 718)

  /** N-dimensional array; PG wire format carries the dim count per value
    * (ref: src/postgres_utils.cpp:78-114, binary_reader.hpp:504-534). */
  final case class PgArray(elem: PgType, ndims: Int = 1, elemOid: Int = 0)
      extends PgType("array", 0) {
    override def children: Seq[PgType] = Seq(elem)
  }

  /** enum over pg_enum labels (ref: src/storage/postgres_type_set.cpp:23-82) */
  final case class PgEnum(name: String, labels: Seq[String]) extends PgType(name, 0)

  /** composite/row type (ref: src/storage/postgres_type_set.cpp:84-145) */
  final case class PgComposite(name: String, fields: Seq[(String, PgType)])
      extends PgType(name, 0) {
    override def children: Seq[PgType] = fields.map(_._2)
  }

  /** anything else (macaddr, ranges, xml, ...) — read as VARCHAR via a
    * ::VARCHAR cast injected into the remote SELECT
    * (ref: src/postgres_utils.cpp:187-203, postgres_scanner.cpp:212-221). */
  final case class PgUnknown(name: String) extends PgType(name, 705)

  // -------------------------------------------------------------- //
  // PG → Spark (ref: PostgresUtils::TypeToLogicalType,
  // src/postgres_utils.cpp:73-210; SURVEY.md §1.2 table)
  // -------------------------------------------------------------- //
  def toSpark(t: PgType): DataType = t match {
    case PgBool => BooleanType
    case PgInt2 => ShortType
    case PgInt4 => IntegerType
    case PgInt8 => LongType
    case PgOid => LongType // Spark has no unsigned int
    case PgFloat4 => FloatType
    case PgFloat8 => DoubleType
    case n: PgNumeric =>
      if (n.isUnconstrained) DoubleType // documented lossy fallback
      else DecimalType(n.precision, n.scale)
    case PgText | PgVarchar | _: PgBpchar | PgJson | PgJsonb => StringType
    case PgDate => DateType
    case PgTime => LongType // µs since midnight; Spark has no TIME
    case PgTimeTz => StringType // no equivalent; canonical text
    case PgTimestamp => TimestampNTZType
    case PgTimestampTz => TimestampType
    case PgInterval => CalendarIntervalType // exact months/days/micros
    case PgUuid => StringType // canonical 8-4-4-4-12 form
    case PgBytea => BinaryType
    case PgBit => StringType // '0'/'1' text
    case PgCtid => LongType
    case PgPoint => StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType)))
    case PgLine | PgLseg | PgBox | PgPath | PgPolygon | PgCircle =>
      ArrayType(DoubleType)
    case a: PgArray =>
      (0 until a.ndims).foldLeft(toSpark(a.elem))((dt, _) => ArrayType(dt))
    case _: PgEnum => StringType
    case c: PgComposite =>
      StructType(c.fields.map { case (n, ft) => StructField(n, toSpark(ft)) })
    case _: PgUnknown => StringType
  }

  // -------------------------------------------------------------- //
  // Spark → PG for the write path, with the reference's narrowing
  // rules (ref: ToPostgresType, src/postgres_utils.cpp:212-262)
  // -------------------------------------------------------------- //
  def fromSpark(dt: DataType): PgType = dt match {
    case BooleanType => PgBool
    case ByteType => PgInt2 // TINYINT → SMALLINT narrowing
    case ShortType => PgInt2
    case IntegerType => PgInt4
    case LongType => PgInt8
    case FloatType => PgFloat4
    case DoubleType => PgFloat8
    case d: DecimalType => PgNumeric(d.precision, d.scale)
    case StringType => PgVarchar
    case BinaryType => PgBytea
    case DateType => PgDate
    case TimestampType => PgTimestampTz
    case TimestampNTZType => PgTimestamp
    case CalendarIntervalType => PgInterval
    case DayTimeIntervalType(_, _) => PgInterval
    case YearMonthIntervalType(_, _) => PgInterval
    case ArrayType(et, _) => PgArray(fromSpark(et))
    case StructType(fs) =>
      PgComposite("record", fs.toSeq.map(f => f.name -> fromSpark(f.dataType)))
    case other => PgUnknown(other.simpleString)
  }

  /** DDL type name for generated SQL (ref: PostgresUtils::TypeToString,
    * src/postgres_utils.cpp:22-48). */
  def typeString(t: PgType): String = t match {
    case PgBool => "BOOLEAN"
    case PgInt2 => "SMALLINT"
    case PgInt4 => "INTEGER"
    case PgInt8 => "BIGINT"
    case PgOid => "OID"
    case PgFloat4 => "REAL"
    case PgFloat8 => "DOUBLE PRECISION"
    case n: PgNumeric =>
      if (n.isUnconstrained) "NUMERIC" else s"NUMERIC(${n.precision},${n.scale})"
    case PgText => "TEXT"
    case PgVarchar => "VARCHAR"
    case b: PgBpchar => s"CHAR(${b.n})"
    case PgJson => "JSON"
    case PgJsonb => "JSONB"
    case PgDate => "DATE"
    case PgTime => "TIME"
    case PgTimeTz => "TIME WITH TIME ZONE"
    case PgTimestamp => "TIMESTAMP"
    case PgTimestampTz => "TIMESTAMP WITH TIME ZONE"
    case PgInterval => "INTERVAL"
    case PgUuid => "UUID"
    case PgBytea => "BYTEA"
    case PgBit => "BIT"
    case PgCtid => "TID"
    case PgPoint => "POINT"
    case PgLine => "LINE"
    case PgLseg => "LSEG"
    case PgBox => "BOX"
    case PgPath => "PATH"
    case PgPolygon => "POLYGON"
    case PgCircle => "CIRCLE"
    case a: PgArray => typeString(a.elem) + "[]" * a.ndims
    case e: PgEnum => quoteIdent(e.name)
    case c: PgComposite => quoteIdent(c.name)
    case u: PgUnknown => "VARCHAR"
  }

  /** Parse a pg_catalog type name (as reported by format_type /
    * the discovery queries) into the ADT. `atttypmod` carries
    * numeric precision/scale and bpchar length. */
  def fromName(name: String, typmod: Int = -1, ndims: Int = 0): PgType = {
    val base = name.stripPrefix("_")
    val t: PgType = base match {
      case "bool" | "boolean" => PgBool
      case "int2" | "smallint" => PgInt2
      case "int4" | "int" | "integer" => PgInt4
      case "int8" | "bigint" => PgInt8
      case "oid" => PgOid
      case "float4" | "real" => PgFloat4
      case "float8" | "double precision" => PgFloat8
      case "numeric" | "decimal" =>
        if (typmod < 0) PgNumeric(0, 0)
        else {
          // typmod packs ((precision << 16) | scale) + 4
          // (ref: src/postgres_utils.cpp:58-71)
          val m = typmod - 4
          PgNumeric((m >> 16) & 0xffff, m & 0xffff)
        }
      case "text" => PgText
      case "varchar" | "character varying" => PgVarchar
      case "bpchar" | "char" | "character" =>
        PgBpchar(if (typmod >= 4) typmod - 4 else 1)
      case "json" => PgJson
      case "jsonb" => PgJsonb
      case "date" => PgDate
      case "time" => PgTime
      case "timetz" => PgTimeTz
      case "timestamp" => PgTimestamp
      case "timestamptz" => PgTimestampTz
      case "interval" => PgInterval
      case "uuid" => PgUuid
      case "bytea" => PgBytea
      case "bit" | "varbit" => PgBit
      case "tid" => PgCtid
      case "point" => PgPoint
      case "line" => PgLine
      case "lseg" => PgLseg
      case "box" => PgBox
      case "path" => PgPath
      case "polygon" => PgPolygon
      case "circle" => PgCircle
      case other => PgUnknown(other)
    }
    val isArray = name.startsWith("_")
    if (isArray) PgArray(t, math.max(ndims, 1)) else t
  }

  def quoteIdent(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  private val scalarByOid: Map[Int, PgType] = Seq(
    PgBool, PgInt2, PgInt4, PgInt8, PgOid, PgFloat4, PgFloat8, PgText,
    PgVarchar, PgJson, PgJsonb, PgDate, PgTime, PgTimeTz, PgTimestamp,
    PgTimestampTz, PgInterval, PgUuid, PgBytea, PgBit, PgCtid, PgPoint,
    PgLine, PgLseg, PgBox, PgPath, PgPolygon, PgCircle,
  ).map(t => t.oid -> t).toMap

  /** Standard `pg_type` array OIDs for the common element types —
    * what a server reports in RowDescription for `elem[]` columns. */
  val arrayOidByElemOid: Map[Int, Int] = Map(
    PgBool.oid -> 1000, PgInt2.oid -> 1005, PgInt4.oid -> 1007,
    PgInt8.oid -> 1016, PgFloat4.oid -> 1021, PgFloat8.oid -> 1022,
    PgText.oid -> 1009, PgVarchar.oid -> 1015, 1700 -> 1231,
    PgDate.oid -> 1182, PgTimestamp.oid -> 1115, PgTimestampTz.oid -> 1185,
    PgBytea.oid -> 1001, PgJsonb.oid -> 3807, PgJson.oid -> 199,
    PgUuid.oid -> 2951, PgBpchar(1).oid -> 1014,
  )
  private val elemOidByArrayOid: Map[Int, Int] =
    arrayOidByElemOid.map(_.swap)

  /** Resolve a wire type OID (+ typmod) as reported in a
    * RowDescription message — the client half of the `PQprepare`/
    * `PQdescribePrepared` handshake over the socket transport. */
  def fromOid(oid: Int, typmod: Int = -1): PgType = oid match {
    case 1700 =>
      if (typmod < 0) PgNumeric(0, 0)
      else { val m = typmod - 4; PgNumeric((m >> 16) & 0xffff, m & 0xffff) }
    case 1042 => PgBpchar(if (typmod >= 4) typmod - 4 else 1)
    case o if scalarByOid.contains(o) => scalarByOid(o)
    case o if elemOidByArrayOid.contains(o) =>
      PgArray(fromOid(elemOidByArrayOid(o), typmod), 1, elemOidByArrayOid(o))
    case o => PgUnknown(s"oid_$o")
  }

  /** The OID a server would report for `t` in RowDescription. */
  def wireOid(t: PgType): Int = t match {
    case PgArray(elem, _, _) => arrayOidByElemOid.getOrElse(wireOid(elem), 0)
    case other => other.oid
  }

  /** The typmod a server would report for `t` (-1 when unused). */
  def wireTypmod(t: PgType): Int = t match {
    case PgNumeric(p, s) if p > 0 => ((p << 16) | s) + 4
    case PgBpchar(n) => n + 4
    case _ => -1
  }
}
