package graft.meta

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream, OutputStream}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

import graft.codec.{PgBinaryReader, PgBinaryWriter}
import graft.types.PgType
import graft.types.PgType._

/** Offline stand-in for a Postgres server, used by tests and the
  * `mem:` DSN scheme. It speaks the same *byte-level* contract the
  * connector uses with a live server: catalog queries return text rows,
  * `copyOut` serves PGCOPY binary, `copyIn` accepts it, `execute`
  * handles the DDL/DML the connector forwards.
  *
  * Rows live in fixed-size pages so ctid-range parallel scans behave
  * like the real thing: a scan task for pages [lo,hi) sees exactly the
  * rows whose page falls in range, DELETE ... WHERE ctid IN removes by
  * (page,row) id leaving holes, and relpages drives task planning.
  */
/** Backend error that carries its SQLSTATE from the raise site. The
  * wire server forwards this state verbatim instead of inferring one
  * from rendered message text — text matching would reclassify any
  * unrelated error that merely mentions a missing relation (e.g. a
  * probe failing on a relation referenced inside a view) as 42P01.
  * Extends IllegalArgumentException so existing mem-DSN callers that
  * branch on IAE keep working. */
private[graft] final class PgBackendException(val sqlState: String, message: String)
  extends IllegalArgumentException(message)

final class InMemoryPg(val name: String) extends PgTransport {

  val RowsPerPage = 64

  final class MemTable(
      val schema: String,
      val table: String,
      val columns: Seq[(String, PgType)]) {
    /** slot i ↔ ctid (page = i/RowsPerPage, row = i%RowsPerPage + 1);
      * None = deleted (hole, like a dead tuple). */
    val slots: mutable.ArrayBuffer[Option[InternalRow]] = mutable.ArrayBuffer.empty
    /** PACKED storage (opt-in, scan-only): rows held as PGCOPY binary
      * tuples in sealed per-page byte blobs instead of boxed
      * InternalRows — 5-8x less heap per row, which is what lets a
      * 60M-row sf10 seed share one bench JVM. COPY IN appends here
      * when `packed`; scans decode pages lazily (see liveIter); DML
      * surfaces reject packed tables. */
    var packed: Boolean = false
    val packedPages: mutable.ArrayBuffer[Array[Byte]] = mutable.ArrayBuffer.empty
    private var openPage: ByteArrayOutputStream = _
    private var openPageOut: DataOutputStream = _
    private var openPageRows = 0
    private var packedRowCount: Long = 0L
    private lazy val packedWriter = new PgBinaryWriter(colTypes)
    /** append one row to packed storage; call under `synchronized`. */
    def appendPacked(row: InternalRow): Unit = {
      if (openPage == null) {
        openPage = new ByteArrayOutputStream()
        openPageOut = new DataOutputStream(openPage)
      }
      packedWriter.writeRow(openPageOut, row)
      openPageRows += 1
      packedRowCount += 1
      if (openPageRows == RowsPerPage) {
        openPageOut.flush()
        packedPages += openPage.toByteArray
        openPage = null; openPageOut = null; openPageRows = 0
      }
    }
    /** rows decodable from page p (the open tail page included).
      * All three accessors take the table lock: appends run under
      * `synchronized`, and an unlocked flush+toByteArray concurrent
      * with one could hand a reader a torn half-written tuple — and
      * even a sealed-page read races the ArrayBuffer resize a
      * concurrent append may trigger. The lock covers a reference
      * copy, not the decode. */
    def packedPageBytes(p: Int): Array[Byte] = this.synchronized {
      if (p < packedPages.length) packedPages(p)
      // tail page may be gone by the time a reader who saw it in
      // packedPagesCount fetches it (concurrent TRUNCATE, or an
      // exactly page-aligned seal moved it into packedPages): serve
      // an empty page, mirroring how the boxed path degrades
      else if (openPage == null) Array.emptyByteArray
      else { openPageOut.flush(); openPage.toByteArray }
    }
    def packedRowsInPage(p: Int): Int = this.synchronized {
      if (p < packedPages.length) RowsPerPage
      else if (openPage == null) 0
      else openPageRows
    }
    /** Atomic (bytes, decodable-row-count) snapshot of page p. Callers
      * that parse `rows` tuples out of `bytes` MUST use this rather
      * than the two single-value accessors: a concurrent append landing
      * between separate packedPageBytes/packedRowsInPage calls can
      * report one more row than the byte snapshot contains, sending the
      * length-parsing loop past the end of the buffer. */
    def packedPageSnapshot(p: Int): (Array[Byte], Int) = this.synchronized {
      if (p < packedPages.length) (packedPages(p), RowsPerPage)
      else if (openPage == null) (Array.emptyByteArray, 0)
      else { openPageOut.flush(); (openPage.toByteArray, openPageRows) }
    }
    def packedPagesCount: Int = this.synchronized {
      packedPages.length + (if (openPageRows > 0) 1 else 0)
    }
    def clearPacked(): Unit = {
      packedPages.clear(); openPage = null; openPageOut = null
      openPageRows = 0; packedRowCount = 0L
    }
    def pages: Long =
      if (packed) packedPagesCount.toLong
      else (slots.length + RowsPerPage - 1) / RowsPerPage
    def liveRows: Int =
      if (packed) packedRowCount.toInt else slots.count(_.isDefined)
    /** O(1) row figure for the copy-cache fingerprint: packed appends
      * don't move `slots.length`, boxed appends do. Deliberately NOT
      * liveRows — that walks every boxed slot, and the fingerprint
      * runs per copyOut (per scan task). In-place replacement without
      * a length change is caught by the execute-path generation bump,
      * as documented at dataFingerprint. */
    def fingerprintRows: Long =
      if (packed) packedRowCount else slots.length.toLong
    def colTypes: Seq[PgType] = columns.map(_._2)
    def colIndex(c: String): Int = columns.indexWhere(_._1 == c)
  }

  private val tables = new ConcurrentHashMap[(String, String), MemTable]()
  /** user-defined types (enums, composites) by name */
  val userTypes = new ConcurrentHashMap[String, PgType]()
  /** index name → (schema, table, unique, columns) */
  val indexes = new ConcurrentHashMap[String, (String, String, Boolean, Seq[String])]()
  private val schemas = ConcurrentHashMap.newKeySet[String]()
  schemas.add("public")

  val executedStatements: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty
  // read-path statements (query(), not execute()) — lets tests count
  // metadata probes like pg_is_in_recovery without changing semantics
  val queriedStatements: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty

  // spoofable instance identity for version/instance-gating tests
  @volatile var versionString: String = "PostgreSQL 16.3 (InMemoryPg graft)"
  @volatile var rdsSettingsCount: Long = 0L
  @volatile var inRecovery: Boolean = false

  def createTable(schema: String, table: String, columns: Seq[(String, PgType)]): MemTable = {
    schemas.add(schema)
    val t = new MemTable(schema, table, columns)
    tables.put((schema, table), t)
    t
  }

  /** A scan-only table whose rows live as PGCOPY byte blobs (5-8x less
    * heap than boxed rows) — what lets a 60M-row sf10 seed share one
    * bench JVM. COPY IN and every read path work; DML rejects. */
  def createPackedTable(schema: String, table: String,
      columns: Seq[(String, PgType)]): MemTable = {
    val t = createTable(schema, table, columns)
    t.packed = true
    t
  }

  def getTable(schema: String, table: String): MemTable = {
    val t = tables.get((schema, table))
    if (t == null) throw new PgBackendException("42P01",
      s"relation $schema.$table does not exist")
    t
  }

  def hasTable(schema: String, table: String): Boolean =
    tables.containsKey((schema, table))

  override def close(): Unit = ()

  // ---------------------------------------------------------------- //
  // metadata queries
  // ---------------------------------------------------------------- //
  private val TableInfoRe: Regex =
    """(?s).*pg_attribute.*nspname = '([^']*)' AND c\.relname = '([^']*)'.*""".r
  private val ListTablesRe: Regex =
    """(?s).*pg_class.*nspname = '([^']*)' AND c\.relkind.*""".r
  private val RelPagesRe: Regex =
    """(?s).*relpages.*nspname = '([^']*)' AND c\.relname = '([^']*)'.*""".r

  override def query(sql: String): Seq[Seq[String]] = {
    queriedStatements.synchronized { queriedStatements += sql }
    queryImpl(sql)
  }

  private def queryImpl(sql: String): Seq[Seq[String]] = sql match {
    case s if s.startsWith("SELECT version()") =>
      Seq(Seq(versionString))
    case s if s.contains("pg_settings") =>
      Seq(Seq(rdsSettingsCount.toString))
    case s if s.contains("pg_is_in_recovery") =>
      Seq(Seq(if (inRecovery) "t" else "f", "0"))
    case s if s.contains("pg_enum") =>
      import scala.jdk.CollectionConverters._
      userTypes.asScala.toSeq.sortBy(_._1).collect {
        case (n, PgEnum(_, labels)) => labels.map(l => Seq(n, l))
      }.flatten
    case s if s.contains("relkind = 'c'") =>
      import scala.jdk.CollectionConverters._
      userTypes.asScala.toSeq.sortBy(_._1).collect {
        case (n, PgComposite(_, fields)) => fields.map { case (fn, ft) =>
          val (typname, typmod, ndims) = wireTypeName(ft)
          Seq(n, fn, typname, typmod.toString, ndims.toString)
        }
      }.flatten
    case s if s.contains("pg_namespace") && !s.contains("JOIN") =>
      import scala.jdk.CollectionConverters._
      schemas.asScala.toSeq.sorted.map(Seq(_))
    case s if s.contains("pg_index") =>
      val re = """(?s).*nspname = '([^']*)' AND c\.relname = '([^']*)'.*""".r
      s match {
        case re(sch, tbl) =>
          import scala.jdk.CollectionConverters._
          indexes.asScala.toSeq.sortBy(_._1).collect {
            case (name, (s2, t2, _, cols)) if s2 == sch && t2 == tbl =>
              Seq(name, "btree", cols.mkString(","))
          }
        case _ => Seq.empty
      }
    case RelPagesRe(sch, tbl) =>
      Seq(Seq(getTable(sch, tbl).pages.toString))
    case TableInfoRe(sch, tbl) =>
      getTable(sch, tbl).columns.map { case (n, t) =>
        val (typname, typmod, ndims) = wireTypeName(t)
        Seq(n, typname, typmod.toString, ndims.toString, "f")
      }
    // session temp-namespace listing (pg_my_temp_schema()): the
    // in-memory backend stores its one session's temp tables literally
    // under 'pg_temp', so that IS the oid the function resolves to
    case s if s.contains("pg_my_temp_schema") =>
      import scala.jdk.CollectionConverters._
      tables.keySet.asScala.toSeq.filter(_._1 == "pg_temp").map(_._2).sorted.map(Seq(_))
    case ListTablesRe(sch) =>
      import scala.jdk.CollectionConverters._
      tables.keySet.asScala.toSeq.filter(_._1 == sch).map(_._2).sorted.map(Seq(_))
    case s if s.contains("pg_database_size") =>
      Seq(Seq("0"))
    case s if s.contains("pg_export_snapshot") =>
      Seq(Seq("00000003-00000001-1"))
    case other =>
      throw new IllegalArgumentException(s"InMemoryPg: unsupported query: $other")
  }

  /** (typname as pg_type reports it, atttypmod, attndims) */
  private def wireTypeName(t: PgType): (String, Int, Int) = t match {
    case PgNumeric(p, s) if p > 0 => ("numeric", ((p << 16) | s) + 4, 0)
    case _: PgNumeric => ("numeric", -1, 0)
    case PgBpchar(n) => ("bpchar", n + 4, 0)
    case PgArray(e, nd, _) =>
      val (en, tm, _) = wireTypeName(e)
      ("_" + en, tm, nd)
    case PgEnum(n, _) => (n, -1, 0)
    case PgComposite(n, _) => (n, -1, 0)
    case other => (other.typeName, -1, 0)
  }

  // ---------------------------------------------------------------- //
  // Describe + mini evaluator for arbitrary SELECT shapes — the offline
  // analogue of the PQprepare/PQdescribePrepared handshake the
  // reference uses to bind `postgres_query` result shapes
  // (ref: src/postgres_query.cpp:41-86). Supports: projection (cols,
  // aliases, *), count/min/max/sum aggregates, WHERE conjunctions of
  // simple comparisons, GROUP BY, ORDER BY, LIMIT. A live server binds
  // genuinely arbitrary SQL; this covers the shapes tests exercise.
  // ---------------------------------------------------------------- //

  private val SelectRe: Regex =
    ("""(?is)\s*SELECT\s+(.+?)\s+FROM\s+(?:"?([\w]+)"?\.)?"?([\w]+)"?""" +
      """(?:\s+WHERE\s+(.+?))?(?:\s+GROUP\s+BY\s+(.+?))?""" +
      """(?:\s+ORDER\s+BY\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*""").r

  private final case class MiniQuery(
      schema: String, table: String, itemsRaw: String,
      where: Option[String], groupBy: Option[String],
      orderBy: Option[String], limit: Option[Int])

  private sealed trait Item { def name: String }
  private final case class ColItem(col: String, name: String) extends Item
  private final case class AggI(fn: String, col: Option[String], name: String) extends Item

  private val AggSelRe: Regex =
    """(?i)(count|min|max|sum)\(\s*(\*|"[^"]+"|[\w]+)\s*\)(?:\s+(?:AS\s+)?"?([\w]+)"?)?""".r
  private val ColSelRe: Regex =
    """"?([\w]+)"?(?:\s+(?:AS\s+)?"?([\w]+)"?)?""".r
  private val PredRe: Regex =
    """(?s)"?([\w]+)"?\s*(=|<>|!=|<=|>=|<|>)\s*(.+)""".r

  private def parseSelect(sql: String): MiniQuery = sql match {
    case SelectRe(items, schOrNull, tbl, whereOrNull, gbOrNull, obOrNull, limOrNull) =>
      MiniQuery(Option(schOrNull).getOrElse("public"), tbl, items,
        Option(whereOrNull), Option(gbOrNull), Option(obOrNull),
        Option(limOrNull).map(_.toInt))
    case other =>
      throw new IllegalArgumentException(s"InMemoryPg: cannot bind query: $other")
  }

  private def unq(s: String): String =
    s.trim.stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\"")

  private def bindItems(q: MiniQuery, t: MemTable): Seq[Item] =
    splitTop(q.itemsRaw).flatMap {
      case "*" => t.columns.map { case (n, _) => ColItem(n, n) }
      case AggSelRe(fn, arg, aliasOrNull) =>
        val f = fn.toLowerCase
        val col = if (arg == "*") None else Some(unq(arg))
        col.foreach(c => require(t.colIndex(c) >= 0, s"column $c not found"))
        Seq(AggI(f, col, Option(aliasOrNull).getOrElse(f)))
      case ColSelRe(col, aliasOrNull) =>
        require(t.colIndex(col) >= 0, s"column $col not found in ${t.schema}.${t.table}")
        Seq(ColItem(col, Option(aliasOrNull).getOrElse(col)))
      case other =>
        throw new IllegalArgumentException(s"InMemoryPg: cannot bind select item: $other")
    }

  private def itemType(it: Item, t: MemTable): PgType = it match {
    case ColItem(c, _) => t.colTypes(t.colIndex(c))
    case AggI("count", _, _) => PgInt8
    case AggI("min" | "max", Some(c), _) => t.colTypes(t.colIndex(c))
    case AggI("sum", Some(c), _) => t.colTypes(t.colIndex(c)) match {
      // PG: sum(int2|int4) → int8, sum(float) → float8; sum(int8) →
      // numeric, unsupported offline (unconstrained numeric wire value)
      case PgInt2 | PgInt4 => PgInt8
      case PgFloat4 | PgFloat8 => PgFloat8
      case other => throw new IllegalArgumentException(
        s"InMemoryPg: sum over $other is not supported in offline describe")
    }
    case other => throw new IllegalArgumentException(s"cannot type $other")
  }

  /** PQdescribePrepared analogue: bind the result shape offline. */
  override def describe(sql: String): Seq[(String, PgType)] = {
    val q = parseSelect(sql)
    val t = getTable(q.schema, q.table)
    val items = bindItems(q, t)
    val names = items.map(_.name)
    require(names.distinct.length == names.length,
      s"duplicate output names $names — alias aggregate items")
    items.map(it => it.name -> itemType(it, t))
  }

  /** natural-order comparison used by WHERE/ORDER BY evaluation */
  /** Bind one (column, literal) comparison ONCE: hoists the Spark type
    * lookup and the literal's numeric parse out of the per-row path and
    * compares primitives where the semantics allow. Without this, a
    * pushed filter tree re-parsed BigDecimals from text for every row
    * of every COPY task (~µs/row/leaf — seconds on a 600k-row scan with
    * a 15-leaf OR-of-AND tree). Double columns compare as doubles,
    * which is also what the live server does (float8 ⋈ numeric-literal
    * resolves to the float8 operator). Anything unusual falls back to
    * the generic decimal-text compare with the type lookup hoisted. */
  private def compiledLeafCmp(t: MemTable, i: Int, l: Any): InternalRow => Int = {
    import org.apache.spark.sql.types._
    val dt = PgType.toSpark(t.colTypes(i))
    val integralLit = """[+-]?\d+""".r
    (dt, l) match {
      // timestamp/time instants pre-converted to micros by litValue;
      // all three types store Long micros in the row
      case (LongType | TimestampType | TimestampNTZType, lv: Long) =>
        r => java.lang.Long.compare(r.getLong(i), lv)
      case (IntegerType | DateType, lv: Int) => // date days
        r => java.lang.Integer.compare(r.getInt(i), lv)
      case (LongType, s: String) if integralLit.matches(s) =>
        val lv = s.toLong; r => java.lang.Long.compare(r.getLong(i), lv)
      case (IntegerType, s: String) if integralLit.matches(s) =>
        val lv = s.toLong; r => java.lang.Long.compare(r.getInt(i).toLong, lv)
      case (ShortType, s: String) if integralLit.matches(s) =>
        val lv = s.toLong; r => java.lang.Long.compare(r.getShort(i).toLong, lv)
      case (DoubleType, s: String) =>
        val lv = s.toDouble; r => java.lang.Double.compare(r.getDouble(i), lv)
      case (dec: DecimalType, s: String) =>
        val lbd = new java.math.BigDecimal(s)
        r => r.getDecimal(i, dec.precision, dec.scale).toJavaBigDecimal.compareTo(lbd)
      case (StringType, lv: org.apache.spark.unsafe.types.UTF8String) =>
        val ls = lv.toString
        r => r.getUTF8String(i).toString.compareTo(ls)
      case _ =>
        r => cmpAny(r.get(i, dt), l)
    }
  }

  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: org.apache.spark.unsafe.types.UTF8String, y) => x.toString.compareTo(y.toString)
    case (x, y) =>
      def bd(v: Any): java.math.BigDecimal = v match {
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case other => new java.math.BigDecimal(other.toString)
      }
      bd(x).compareTo(bd(y))
  }

  private val TsLitRe: Regex = """(?is)TIMESTAMP\s+'(.+)'""".r
  private val DateLitRe: Regex = """(?is)DATE\s+'(.+)'""".r

  private def litValue(raw: String): Any = raw.trim match {
    // typed temporal literals (PgSqlGen renders TIMESTAMP '...' /
    // DATE '...') convert to the column storage representation
    // (micros since epoch / days since epoch) so cmpAny compares them
    // numerically against the stored Long/Int — mirroring the server,
    // which compares timestamps as instants, not as text
    case TsLitRe(txt) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .fromJavaTimestamp(java.sql.Timestamp.valueOf(txt))
    case DateLitRe(txt) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .fromJavaDate(java.sql.Date.valueOf(txt))
    case s if s.startsWith("'") =>
      org.apache.spark.unsafe.types.UTF8String.fromString(
        s.stripPrefix("'").stripSuffix("'").replace("''", "'"))
    case s => s // numeric text; cmpAny parses via BigDecimal
  }

  /** Evaluate a bound SELECT: (columns with types, result rows). */
  private def evalSelect(sql: String): (Seq[(String, PgType)], Seq[Array[Any]]) = {
    val q = parseSelect(sql)
    val t = getTable(q.schema, q.table)
    val items = bindItems(q, t)
    val shape = items.map(it => it.name -> itemType(it, t))

    // WHERE: conjunction of simple comparisons
    val preds: Seq[(Int, String, Any)] = q.where.toSeq.flatMap { w =>
      w.split("(?i)\\s+AND\\s+").toSeq.map {
        case PredRe(col, op, lit) =>
          val i = t.colIndex(unq(col))
          require(i >= 0, s"WHERE column $col not found")
          (i, op, litValue(lit))
        case other =>
          throw new IllegalArgumentException(s"InMemoryPg: cannot bind predicate: $other")
      }
    }
    def passes(r: InternalRow): Boolean = preds.forall { case (i, op, lit) =>
      if (r.isNullAt(i)) false
      else {
        val c = cmpAny(r.get(i, PgType.toSpark(t.colTypes(i))), lit)
        op match {
          case "=" => c == 0
          case "<>" | "!=" => c != 0
          case "<" => c < 0
          case "<=" => c <= 0
          case ">" => c > 0
          case ">=" => c >= 0
        }
      }
    }
    val rows = liveIter(t, 0L, Long.MaxValue).map(_._2).filter(passes).toSeq

    def colVal(r: InternalRow, c: String): Any = {
      val i = t.colIndex(c)
      if (r.isNullAt(i)) null else r.get(i, PgType.toSpark(t.colTypes(i)))
    }

    val isAgg = q.groupBy.isDefined || items.exists(_.isInstanceOf[AggI])
    val result: Seq[Array[Any]] =
      if (!isAgg) rows.map(r => items.map {
        case ColItem(c, _) => colVal(r, c)
        case other => throw new IllegalArgumentException(s"unexpected item $other")
      }.toArray)
      else {
        val groupCols: Seq[String] = q.groupBy.toSeq.flatMap(g => splitTop(g).map(unq))
        items.foreach {
          case ColItem(c, _) => require(groupCols.contains(c),
            s"column $c must appear in GROUP BY")
          case _ =>
        }
        val grouped: Seq[(Seq[Any], Seq[InternalRow])] =
          if (groupCols.isEmpty) Seq(Seq.empty[Any] -> rows)
          else rows.groupBy(r => groupCols.map(colVal(r, _))).toSeq
        grouped.map { case (_, grp) =>
          items.map {
            case ColItem(c, _) => colVal(grp.head, c)
            case AggI("count", None, _) => grp.length.toLong
            case AggI("count", Some(c), _) => grp.count(colVal(_, c) != null).toLong
            case AggI(fn @ ("min" | "max"), Some(c), _) =>
              val vs = grp.map(colVal(_, c)).filter(_ != null)
              if (vs.isEmpty) null
              else if (fn == "min") vs.reduce((a, b) => if (cmpAny(a, b) <= 0) a else b)
              else vs.reduce((a, b) => if (cmpAny(a, b) >= 0) a else b)
            case AggI("sum", Some(c), _) =>
              val vs = grp.map(colVal(_, c)).filter(_ != null)
              if (vs.isEmpty) null
              else t.colTypes(t.colIndex(c)) match {
                case PgInt2 => vs.map(_.asInstanceOf[Short].toLong).sum
                case PgInt4 => vs.map(_.asInstanceOf[Int].toLong).sum
                case PgFloat4 => vs.map(_.asInstanceOf[Float].toDouble).sum
                case PgFloat8 => vs.map(_.asInstanceOf[Double]).sum
                case other => throw new IllegalArgumentException(s"sum over $other")
              }
            case other => throw new IllegalArgumentException(s"cannot evaluate $other")
          }.toArray
        }
      }

    // ORDER BY output column (needed for deterministic LIMIT)
    val ordered = q.orderBy match {
      case Some(ob) =>
        val ObRe = """"?([\w]+)"?(?:\s+(?i)(ASC|DESC))?""".r
        ob.trim match {
          case ObRe(col, dirOrNull) =>
            val i = items.indexWhere(_.name == unq(col))
            require(i >= 0, s"ORDER BY column $col not in select list")
            val asc = dirOrNull == null || dirOrNull.equalsIgnoreCase("ASC")
            val sorted = result.sortWith((a, b) => cmpAny(a(i), b(i)) < 0)
            if (asc) sorted else sorted.reverse
          case other =>
            throw new IllegalArgumentException(s"InMemoryPg: cannot bind ORDER BY: $other")
        }
      case None => result
    }
    (shape, q.limit.map(ordered.take).getOrElse(ordered))
  }

  // ---------------------------------------------------------------- //
  // COPY OUT: serve PGCOPY binary for the connector-generated scan SQL
  // ---------------------------------------------------------------- //
  private val CopyOutAggRe: Regex =
    """(?s)COPY \(SELECT (.+) FROM "([^"]+)"\."([^"]+)"(?: WHERE (.*?))?(?: GROUP BY (.+))?\) TO STDOUT \(FORMAT binary\)""".r
  private val CopyOutRe: Regex =
    """(?s)COPY \(SELECT (.+) FROM "([^"]+)"\."([^"]+)"(?: WHERE (.*))?\) TO STDOUT \(FORMAT binary\)""".r
  private val CopyOutSubqueryRe: Regex =
    """(?s)COPY \(SELECT (.+) FROM \(SELECT \* FROM "?([\w]+)"?\."?([\w]+)"?\) AS __unnamed_subquery(?: WHERE (.*))?\) TO STDOUT \(FORMAT binary\)""".r
  private val CopyOutAnySubqueryRe: Regex =
    """(?s)COPY \(SELECT (.+) FROM \((.+)\) AS __unnamed_subquery(?: WHERE (.*))?\) TO STDOUT \(FORMAT binary\)""".r
  private val CtidRangeRe: Regex =
    """ctid BETWEEN '\((\d+),0\)'::tid AND '\((\d+),0\)'::tid""".r.unanchored

  /** Recent COPY OUT statements, for test assertions. Bounded: tests
    * clear() right before the scan they observe, so only a recent
    * window matters — an unbounded log would grow for the life of a
    * bench JVM (entries × partitions × reruns) for nobody's benefit. */
  val copyOutStatements: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty
  private val copyOutLogCap = 512

  /** Consistent view of the COPY OUT log for assertions. Readers must
    * come through here (or hold the buffer's monitor themselves): a
    * still-running stream polls min/max probes on scheduler threads,
    * and iterating the live buffer races those appends. */
  def copyOutSnapshot: Seq[String] =
    copyOutStatements.synchronized(copyOutStatements.toVector)

  def clearCopyOutLog(): Unit =
    copyOutStatements.synchronized(copyOutStatements.clear())

  /** Served-scan cache. A real server reads COPY payloads out of its
    * native heap storage — work proportional to the data; this double
    * would otherwise re-ENCODE InternalRows to PGCOPY bytes on every
    * scan, charging repeated catalog queries a cost no server pays.
    * Identical scan statements therefore serve the previously encoded
    * bytes, invalidated wholesale by a generation counter that every
    * mutation path bumps (DDL/DML execute, COPY IN commit). Bounded:
    * oversized streams aren't recorded; total is capped with
    * access-order eviction. Only streams consumed to EOF are inserted
    * (a partially-read scan has incomplete bytes). */
  private val scanGen = new java.util.concurrent.atomic.AtomicLong()
  private[meta] def bumpGeneration(): Unit = scanGen.incrementAndGet()
  // kill switch for A/B runs (GRAFT_NO_SCAN_CACHE=1): serves every scan
  // by re-encoding, as before the cache existed
  private val scanCacheEnabled = !sys.env.contains("GRAFT_NO_SCAN_CACHE")
  /** Order-independent fingerprint of table row counts: catches the
    * mutation paths that bypass execute/copyIn entirely (tests seed by
    * appending to `MemTable.slots` directly). In-place row REPLACEMENT
    * without a length change would evade this, but every such path
    * (UPDATE/DELETE/TRUNCATE) goes through execute, which bumps the
    * generation. */
  private def dataFingerprint(): Long = {
    var fp = 0L
    val it = tables.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      fp ^= e.getKey.hashCode.toLong * 0x9E3779B97F4A7C15L +
        e.getValue.fingerprintRows * 1099511628211L
    }
    fp
  }
  private def cacheEpoch(): (Long, Long) = (scanGen.get(), dataFingerprint())
  private val copyCache =
    new java.util.LinkedHashMap[String, ((Long, Long), Array[Byte])](64, 0.75f, true)
  private val copyCacheMaxEntry = 96 << 20
  private val copyCacheMaxTotal = 384 << 20
  private var copyCacheTotal = 0L // guarded by copyCache's monitor

  private def copyCacheInsert(sql: String, gen: (Long, Long), bytes: Array[Byte]): Unit =
    copyCache.synchronized {
      val prev = copyCache.remove(sql)
      if (prev != null) copyCacheTotal -= prev._2.length
      val it = copyCache.entrySet().iterator()
      while (copyCacheTotal + bytes.length > copyCacheMaxTotal && it.hasNext) {
        val e = it.next(); it.remove(); copyCacheTotal -= e.getValue._2.length
      }
      if (copyCacheTotal + bytes.length <= copyCacheMaxTotal) {
        copyCache.put(sql, (gen, bytes)); copyCacheTotal += bytes.length
      }
    }

  /** COPY OUT isolation note: packed-table serves stream LAZILY
    * (pages encode as the client consumes), so a concurrent TRUNCATE
    * or clearPacked racing an in-flight stream can surface mid-read —
    * a vanished tail page degrades to an empty page and the reader
    * observes fewer rows than the page count it snapshotted at open.
    * A real server holds an MVCC snapshot for the cursor's lifetime;
    * this harness does not. Acceptable because battery/spec scans
    * never mutate a table they are concurrently scanning — writes to
    * a table are sequenced before its reads by the Spark job DAG — and
    * per-page tuple parsing stays torn-read-safe via
    * packedPageSnapshot's atomic (bytes, rows) pairs. */
  override def copyOut(sql: String): InputStream = {
    copyOutStatements.synchronized {
      if (copyOutStatements.length >= copyOutLogCap)
        copyOutStatements.remove(0, copyOutStatements.length - copyOutLogCap + 1)
      copyOutStatements += sql
    }
    if (!scanCacheEnabled) {
      val (b0, o0, l0, f0) = stripScanTail(sql)
      return copyOut0(b0, o0, l0, f0)
    }
    val gen = cacheEpoch()
    copyCache.synchronized {
      val hit = copyCache.get(sql)
      if (hit != null && hit._1 == gen)
        return new java.io.ByteArrayInputStream(hit._2)
    }
    val (base, orderBy, limit, offset) = stripScanTail(sql)
    val raw = copyOut0(base, orderBy, limit, offset)
    new InputStream {
      private val rec = new ByteArrayOutputStream(1 << 16)
      private var over = false
      private var inserted = false
      override def read(): Int = {
        val b = raw.read()
        if (b >= 0) { if (!over) record1(b) } else finish()
        b
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = raw.read(b, off, len)
        if (n > 0) { if (!over) record(b, off, n) } else if (n < 0) finish()
        n
      }
      private def record1(b: Int): Unit =
        if (rec.size + 1 > copyCacheMaxEntry) over = true else rec.write(b)
      private def record(b: Array[Byte], off: Int, n: Int): Unit =
        if (rec.size + n > copyCacheMaxEntry) over = true else rec.write(b, off, n)
      // cache only when EOF was reached AND no mutation raced the scan
      private def finish(): Unit = if (!inserted) {
        inserted = true
        if (!over && cacheEpoch() == gen) copyCacheInsert(sql, gen, rec.toByteArray)
      }
      override def close(): Unit = raw.close()
    }
  }

  /** One pushed sort key: (column, ascending, nullsFirst). */
  private type OrderKey = (String, Boolean, Boolean)

  // the exact ORDER BY/LIMIT tail shape PgSqlGen generates for pushed
  // (partial) top-N scans; anything else passes through untouched
  private val ScanTailRe: Regex =
    ("""(?s)^(.*?)""" +
      """((?: ORDER BY "[^"]*" (?:ASC|DESC) NULLS (?:FIRST|LAST)""" +
      """(?:, "[^"]*" (?:ASC|DESC) NULLS (?:FIRST|LAST))*)?)""" +
      """((?: LIMIT \d+)?)((?: OFFSET \d+)?)\) TO STDOUT \(FORMAT binary\)$""").r

  private def stripScanTail(sql: String)
      : (String, Seq[OrderKey], Option[Int], Option[Int]) =
    sql match {
      case ScanTailRe(prefix, ob, lim, off) if ob.nonEmpty || lim.nonEmpty || off.nonEmpty =>
        val OrdItem = """"([^"]*)" (ASC|DESC) NULLS (FIRST|LAST)""".r
        val orders = OrdItem.findAllMatchIn(ob).map(m =>
          (m.group(1).replace("\"\"", "\""), m.group(2) == "ASC",
            m.group(3) == "FIRST")).toSeq
        val limit = """\d+""".r.findFirstIn(lim).map(_.toInt)
        val offset = """\d+""".r.findFirstIn(off).map(_.toInt)
        (prefix + ") TO STDOUT (FORMAT binary)", orders, limit, offset)
      case _ => (sql, Nil, None, None)
    }

  /** split a projection on top-level commas (not inside parens) */
  private def splitTop(proj: String): Seq[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    proj.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString.trim
    parts.toSeq
  }

  private val AggItemRe: Regex =
    """(count|min|max|sum)\((\*|"[^"]+")\)(?:::([A-Z() ,0-9]+))?""".r

  private def copyOut0(
      sql: String,
      orderBy: Seq[OrderKey] = Nil,
      limit: Option[Int] = None,
      offset: Option[Int] = None): InputStream = sql match {
    case CopyOutAggRe(proj, sch, tbl, whereOrNull, groupByOrNull) if
        splitTop(proj).exists(AggItemRe.pattern.matcher(_).matches()) =>
      serveAggregate(sch, tbl, proj, Option(whereOrNull), Option(groupByOrNull))
    case CopyOutRe("count(*)", sch, tbl, whereOrNull) =>
      // pushed COUNT(*): one int8 row per task range
      val t = getTable(sch, tbl)
      val (lo, hi) = Option(whereOrNull).flatMap {
        case CtidRangeRe(l, h) => Some((l.toLong, h.toLong))
        case _ => None
      }.getOrElse((0L, Long.MaxValue))
      val n =
        if (t.packed) {
          // packed pages have no holes — count without decoding
          val loP = math.max(0L, lo).toInt
          val hiP = math.min(t.packedPagesCount.toLong, hi).toInt
          (loP until hiP).map(t.packedRowsInPage(_).toLong).sum
        } else t.slots.indices.count { slot =>
          val page = slot / RowsPerPage
          page >= lo && page < hi && t.slots(slot).isDefined
        }.toLong
      val writer = new PgBinaryWriter(Seq(PgInt8))
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      writer.writeHeader(out)
      writer.writeRow(out, new GenericInternalRow(Array[Any](n)))
      writer.writeTrailer(out)
      out.flush()
      new ByteArrayInputStream(bos.toByteArray)
    case CopyOutSubqueryRe("count(*)", sch, tbl, _) =>
      copyOut0(s"""COPY (SELECT count(*) FROM "$sch"."$tbl") TO STDOUT (FORMAT binary)""")
    case CopyOutSubqueryRe(proj, sch, tbl, _) =>
      val t = getTable(sch, tbl)
      val projCols: Seq[(String, Boolean)] =
        if (proj.trim == "NULL") Nil
        else proj.split(",").map(_.trim).toSeq
          .map(c => (c.takeWhile(_ != ':')
            .stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\""),
            c.contains("::")))
      serveRows(t, projCols, None)
    case CopyOutAnySubqueryRe(proj, innerSql, _) =>
      // arbitrary bound subquery (postgres_query form): evaluate the
      // inner SELECT, apply the outer projection; pushed outer filters
      // are ignored — Spark re-applies them (reference contract). The
      // pushed tail is applied like a server would: sort, then OFFSET
      // (a FULLY pushed operator — Spark removes its Offset node, so
      // the server MUST skip the rows), then LIMIT.
      val (shape, rows0) = evalSelect(innerSql)
      val names = shape.map(_._1)
      val sortedRows =
        if (orderBy.isEmpty) rows0
        else {
          val keys = orderBy.map { case (c, asc, nullsFirst) =>
            val i = names.indexOf(c)
            require(i >= 0, s"pushed ORDER BY column $c not in subquery output")
            (i, asc, nullsFirst)
          }.toIndexedSeq
          rows0.sortWith { (a, b) =>
            var verdict = 0
            var k = 0
            while (verdict == 0 && k < keys.length) {
              val (i, asc, nullsFirst) = keys(k)
              val cmp = (a(i), b(i)) match {
                case (null, null) => 0
                case (null, _) => if (nullsFirst) -1 else 1
                case (_, null) => if (nullsFirst) 1 else -1
                case (x, y) => cmpAny(x, y)
              }
              verdict = if (asc) cmp else -cmp
              k += 1
            }
            verdict < 0
          }
        }
      val afterOffset = offset.map(sortedRows.drop).getOrElse(sortedRows)
      val rows = limit.map(afterOffset.take).getOrElse(afterOffset)
      val (outTypes, idx): (Seq[PgType], Seq[Int]) =
        if (proj.trim == "NULL") (Seq(PgText), Seq(-1))
        else {
          val cols = splitTop(proj).map(c => unq(c.takeWhile(_ != ':')))
          (cols.map(c => shape(names.indexOf(c))._2), cols.map(names.indexOf))
        }
      val writer = new PgBinaryWriter(outTypes)
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      writer.writeHeader(out)
      rows.foreach { r =>
        val vals: Array[Any] = idx.map(i => if (i == -1) null else r(i)).toArray
        writer.writeRow(out, new GenericInternalRow(vals))
      }
      writer.writeTrailer(out)
      out.flush()
      new ByteArrayInputStream(bos.toByteArray)
    case CopyOutRe(proj, sch, tbl, whereOrNull) =>
      val t = getTable(sch, tbl)
      // bind what the simple-predicate evaluator understands (ctid
      // ranges + comparisons / IS [NOT] NULL) and APPLY it — the
      // streaming source's key-range scans rely on the WHERE actually
      // filtering. Conjuncts beyond the binder (LIKE, IN, OR trees)
      // are ignored like before: the connector re-applies every pushed
      // filter, so serving extra rows is always safe. BUT: a pushed
      // LIMIT/ORDER BY on top of an *ignored* conjunct would cut rows
      // the real server's WHERE would have kept — the tail is honored
      // only when every conjunct was bound.
      var pageRange: Option[(Long, Long)] = None
      val preds = mutable.ArrayBuffer.empty[InternalRow => Boolean]
      val predCols = mutable.Set.empty[Int]
      var unbound = false
      Option(whereOrNull).toSeq.flatMap(splitConjuncts).foreach {
        case CtidRangeRe(lo, hi) => pageRange = Some((lo.toLong, hi.toLong))
        case p =>
          try preds += parseWherePred(t, p, predCols)
          catch { case _: IllegalArgumentException | _: MatchError => unbound = true }
      }
      val projCols: Seq[(String, Boolean)] =
        if (proj.trim == "NULL") Nil
        else proj.split(",").map(_.trim).toSeq.map {
          case "ctid" => ("ctid", false)
          // drop a ::VARCHAR cast suffix BEFORE stripping quotes; keep
          // the cast flag so non-text columns are served as text
          case c => (c.takeWhile(_ != ':')
            .stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\""),
            c.contains("::"))
        }
      serveRows(t, projCols, pageRange,
        if (unbound) Nil else orderBy,
        if (unbound) None else limit,
        if (unbound) None else offset,
        preds.toSeq, predCols.toArray.sorted)
    case other =>
      throw new IllegalArgumentException(s"InMemoryPg: unsupported COPY OUT: $other")
  }

  /** split a WHERE clause into top-level AND conjuncts, stripping the
    * parens PgSqlGen wraps each pushed predicate in; quote-aware so
    * string literals containing " AND "/parens don't split. */
  private def splitConjuncts(w: String): Seq[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    // BETWEEN's own AND must stay inside its conjunct (ctid ranges are
    // rendered as `ctid BETWEEN '(l,0)'::tid AND '(h,0)'::tid`)
    var betweenAnd = false
    var i = 0
    while (i < w.length) {
      val c = w(i)
      if (inQuote) {
        cur += c
        if (c == '\'') inQuote = false // '' escape re-enters on next quote
        i += 1
      } else if (c == '\'') { inQuote = true; cur += c; i += 1 }
      else if (c == '(') { depth += 1; cur += c; i += 1 }
      else if (c == ')') { depth -= 1; cur += c; i += 1 }
      else if (depth == 0 && w.regionMatches(i, " BETWEEN ", 0, 9)) {
        betweenAnd = true; cur ++= " BETWEEN "; i += 9
      } else if (depth == 0 && w.regionMatches(i, " AND ", 0, 5)) {
        if (betweenAnd) { betweenAnd = false; cur ++= " AND "; i += 5 }
        else { parts += cur.toString; cur.clear(); i += 5 }
      } else { cur += c; i += 1 }
    }
    parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      if (p.startsWith("(") && p.endsWith(")") && outerParensMatch(p)) {
        val inner = p.substring(1, p.length - 1).trim
        if (inner.nonEmpty) splitConjuncts(inner) else Nil
      } else Seq(p)
    }
  }

  /** true when the first '(' pairs with the final ')' */
  private def outerParensMatch(p: String): Boolean = {
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < p.length - 1) {
      val c = p(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else if (c == '\'') inQuote = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return false }
      i += 1
    }
    true
  }

  /** Decoded live rows of pages [loPage, hiPage) — the one iteration
    * seam every scan path shares. Packed tables decode lazily page by
    * page, so a 60M-row range never materializes boxed rows at once. */
  private def liveIter(t: MemTable, loPage: Long, hiPage: Long): Iterator[(Int, InternalRow)] =
    if (!t.packed)
      t.slots.indices.iterator.flatMap { slot =>
        val page = slot / RowsPerPage
        if (page >= loPage && page < hiPage) t.slots(slot).map(slot -> _) else None
      }
    else {
      val lo = math.max(0L, loPage).toInt
      val hi = math.min(t.packedPagesCount.toLong, hiPage).toInt
      (lo until hi).iterator.flatMap { p =>
        val reader = new PgBinaryReader(t.colTypes)
        val (pageB, n) = t.packedPageSnapshot(p)
        val in = new graft.codec.PgBlockInput(new ByteArrayInputStream(pageB))
        (0 until n).iterator.map { r =>
          (p * RowsPerPage + r,
            reader.readRow(in).getOrElse(throw new IllegalStateException(
              s"packed page underrun: ${t.schema}.${t.table} page $p")))
        }
      }
    }

  private def requireUnpacked(t: MemTable, op: String): Unit =
    require(!t.packed,
      s"$op unsupported on packed (scan-only) table ${t.schema}.${t.table}")

  private def serveRows(
      t: MemTable,
      projCols: Seq[(String, Boolean)],
      pageRange: Option[(Long, Long)],
      orderBy: Seq[OrderKey] = Nil,
      limit: Option[Int] = None,
      offset: Option[Int] = None,
      preds: Seq[InternalRow => Boolean] = Nil,
      predCols: Array[Int] = Array.empty): InputStream = {
    // a live server rejects unknown columns up front — keep the message
    // shape ("does not exist") so connector-side staleness detection
    // sees what PG would say
    projCols.foreach { case (c, _) =>
      if (c != "ctid" && t.colIndex(c) < 0)
        throw new PgBackendException("42703",
          s"""column "$c" does not exist in ${t.schema}.${t.table}""")
    }
    // a ::VARCHAR cast on a non-text column means the server renders
    // the value as its text literal (the CAST_TO_VARCHAR trick for
    // unknown types / pg_array_as_varchar)
    def renders(c: String, cast: Boolean): Boolean =
      cast && c != "ctid" &&
        PgType.toSpark(t.columns(t.colIndex(c))._2) !=
          org.apache.spark.sql.types.StringType
    val outTypes: Seq[PgType] =
      if (projCols.isEmpty) Seq(PgText) // SELECT NULL projection
      else projCols.map {
        case ("ctid", _) => PgCtid
        case (c, cast) =>
          if (renders(c, cast)) PgVarchar else t.columns(t.colIndex(c))._2
      }
    val idx: Seq[(Int, Boolean)] = projCols.map {
      case ("ctid", _) => (-1, false)
      case (c, cast) =>
        val i = t.colIndex(c)
        require(i >= 0, s"column $c not found in ${t.schema}.${t.table}")
        (i, renders(c, cast))
    }
    // PACKED VERBATIM FAST PATH: a page already holds the tuples as
    // PGCOPY bytes, and a field's wire encoding is identical whether
    // it travels alone or inside the full row — so a projection with
    // no order/limit/ctid/text-render serves by parsing LENGTHS and
    // copying the projected fields' bytes, never decoding a value into
    // a boxed row and re-encoding it. A pushed WHERE decodes ONLY the
    // predicate's columns per tuple (predCols, collected at bind
    // time); everything else stays verbatim. This is where a 60M-row
    // bench scan spends most of its serving wall.
    val packedVerbatim: Option[Array[Int]] =
      if (t.packed && orderBy.isEmpty && limit.isEmpty &&
        offset.isEmpty && projCols.nonEmpty && idx.forall { case (i, rend) => i >= 0 && !rend }) {
        val ids = idx.map(_._1)
        if (ids.zip(ids.tail).forall { case (a, b) => a < b }) Some(ids.toArray)
        else None // out-of-order projection: the slow path reorders
      } else None
    if (packedVerbatim.isDefined) {
      val (loPage0, hiPage0) = pageRange.getOrElse((0L, Long.MaxValue))
      return servePackedVerbatim(t, packedVerbatim.get, loPage0, hiPage0,
        preds, predCols)
    }
    val textRenderer = new graft.codec.PgTextWriter(t.colTypes)
    val writer = new PgBinaryWriter(outTypes)
    val (loPage, hiPage) = pageRange.getOrElse((0L, Long.MaxValue))
    // '(hi,0)' has row id 0 < any live row id, so page hi itself is
    // excluded — matching PG BETWEEN semantics on tids. Rows stream
    // through the predicate/projection pipeline (liveIter) — only a
    // pushed ORDER BY forces materializing the range.
    val inRangeIter: Iterator[(Int, InternalRow)] =
      liveIter(t, loPage, hiPage).filter { case (_, r) => preds.forall(_(r)) }
    // pushed (partial) top-N: honor the generated ORDER BY ... LIMIT
    // exactly like a live server — sort the base rows by the key
    // columns, then cut
    val sorted: Iterator[(Int, InternalRow)] =
      if (orderBy.isEmpty) inRangeIter
      else {
        val keys = orderBy.toIndexedSeq
        val inRange = inRangeIter.toSeq
        inRange.sortWith { case ((_, ra), (_, rb)) =>
          var verdict = 0
          var k = 0
          while (verdict == 0 && k < keys.length) {
            val (c, asc, nullsFirst) = keys(k)
            val ci = t.colIndex(c)
            require(ci >= 0, s"ORDER BY column $c not found")
            val va = if (ra.isNullAt(ci)) null else ra.get(ci, PgType.toSpark(t.colTypes(ci)))
            val vb = if (rb.isNullAt(ci)) null else rb.get(ci, PgType.toSpark(t.colTypes(ci)))
            val cmp = (va, vb) match {
              case (null, null) => 0
              case (null, _) => if (nullsFirst) -1 else 1
              case (_, null) => if (nullsFirst) 1 else -1
              case (x, y) => cmpAny(x, y)
            }
            verdict = if (asc) cmp else -cmp
            k += 1
          }
          verdict < 0
        }.iterator
      }
    val afterOffset = offset.map(sorted.drop).getOrElse(sorted)
    // the row PIPELINE still evaluates eagerly inside this call (same
    // visibility window vs concurrent DDL as the old materializing
    // serve — toArray copies row REFERENCES only); what streams lazily
    // is the ENCODED payload, which for a large boxed scan is 2-3× the
    // row data and used to be built three times over (BAOS growth +
    // toByteArray) before the client saw byte one
    val servedRows: Array[(Int, InternalRow)] =
      limit.map(afterOffset.take).getOrElse(afterOffset).toArray
    new InputStream {
      private val bos = new ByteArrayOutputStream(1 << 16)
      private val out = new DataOutputStream(bos)
      private var chunk: Array[Byte] = {
        writer.writeHeader(out); out.flush()
        val h = bos.toByteArray; bos.reset(); h
      }
      private var cpos = 0
      private var clim = chunk.length
      private var i = 0
      private var done = false

      private def encodeRow(slot: Int, row: InternalRow): Unit = {
        val page = slot / RowsPerPage
        val vals: Array[Any] =
          if (projCols.isEmpty) Array[Any](null)
          else idx.map { case (ci, render) =>
            if (ci == -1) (page.toLong << 16) | (slot % RowsPerPage + 1).toLong
            else if (row.isNullAt(ci)) null
            else {
              val v = row.get(ci, PgType.toSpark(t.columns(ci)._2))
              if (render)
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  textRenderer.valueText(v, t.colTypes(ci),
                    PgType.toSpark(t.colTypes(ci))))
              else v
            }
          }.toArray
        writer.writeRow(out, new GenericInternalRow(vals))
      }

      private def fillChunk(): Boolean = {
        while (cpos >= clim) {
          if (done) return false
          if (i >= servedRows.length) {
            writer.writeTrailer(out); out.flush()
            chunk = bos.toByteArray; bos.reset()
            cpos = 0; clim = chunk.length; done = true
          } else {
            while (i < servedRows.length && bos.size < (1 << 16)) {
              val (slot, row) = servedRows(i); encodeRow(slot, row); i += 1
            }
            out.flush()
            chunk = bos.toByteArray; bos.reset()
            cpos = 0; clim = chunk.length
          }
        }
        true
      }

      override def read(): Int =
        if (!fillChunk()) -1
        else { val b = chunk(cpos) & 0xff; cpos += 1; b }

      override def read(b: Array[Byte], boff: Int, blen: Int): Int =
        if (blen == 0) 0
        else if (!fillChunk()) -1
        else {
          val m = math.min(blen, clim - cpos)
          System.arraycopy(chunk, cpos, b, boff, m)
          cpos += m
          m
        }
    }
  }

  /** Serve a packed page range as verbatim PGCOPY bytes: full in-order
    * projections hand out whole sealed pages ZERO-COPY; subsets copy
    * each projected field's (length + data) bytes and skip the rest.
    * NULL fields carry length -1 and zero data bytes — max(len, 0)
    * handles both. Pushed predicates decode only `predCols` per tuple
    * (in place from the page buffer via readValueAt — no per-value
    * allocation; the compiled predicates read exactly the indices they
    * bound).
    *
    * The stream is LAZY: pages encode on demand, one ~64 KB chunk
    * ahead of the consumer, instead of materializing the whole result
    * in a ByteArrayOutputStream first. At sf10 a single partition's
    * COPY payload runs to hundreds of MB — eager materialization cost
    * three full copies (growth + toByteArray) and serialized the
    * server encode against the client decode; a real server streams
    * COPY OUT, and so does this one. */
  private def servePackedVerbatim(t: MemTable, proj: Array[Int],
      loPage: Long, hiPage: Long,
      preds: Seq[InternalRow => Boolean] = Nil,
      predCols: Array[Int] = Array.empty): InputStream = {
    val lo = math.max(0L, loPage).toInt
    val hi = math.min(t.packedPagesCount.toLong, hiPage).toInt
    val ncols = t.columns.length
    // in-order by construction → identity; whole-page serve only when
    // nothing filters
    val full = proj.length == ncols && preds.isEmpty
    val reader = new PgBinaryReader(t.colTypes)
    val predRow = new GenericInternalRow(ncols)
    val predTargets = t.colTypes.map(PgType.toSpark)
    val fieldOff = new Array[Int](ncols)
    val fieldLen = new Array[Int](ncols)

    new InputStream {
      // the chunk currently being served (starts with the PGCOPY
      // header: signature + zero flags + zero extension length)
      private var chunk: Array[Byte] = {
        val h = new Array[Byte](19)
        System.arraycopy(graft.codec.PgWire.Signature, 0, h, 0, 11)
        h
      }
      private var cpos = 0
      private var clim = 19
      private var page = lo
      private var done = false

      // reused encode buffer for the projected/filtered shape
      private var enc = if (full) null else new Array[Byte](1 << 16)
      private var n = 0
      private def ensureCap(extra: Int): Unit =
        if (n + extra > enc.length)
          enc = java.util.Arrays.copyOf(enc, math.max(n + extra, enc.length * 2))

      /** Make the chunk non-empty; false once the trailer is served. */
      private def fillChunk(): Boolean = {
        while (cpos >= clim) {
          if (done) return false
          if (page >= hi) {
            chunk = Array[Byte](-1, -1) // int16 trailer
            cpos = 0; clim = 2; done = true
          } else if (full) {
            // sealed pages serve as-is — consumers never mutate them
            chunk = t.packedPageBytes(page); page += 1
            cpos = 0; clim = chunk.length
          } else {
            n = 0
            while (n < (1 << 16) && page < hi) { encodePage(page); page += 1 }
            chunk = enc; cpos = 0; clim = n
          }
        }
        true
      }

      private def encodePage(p: Int): Unit = {
        val (pageB, rows) = t.packedPageSnapshot(p)
        var off = 0
        var r = 0
        while (r < rows) {
          off += 2 // stored nfields == ncols (writeRow wrote all columns)
          var c = 0
          while (c < ncols) {
            val len = ((pageB(off) & 0xff) << 24) | ((pageB(off + 1) & 0xff) << 16) |
              ((pageB(off + 2) & 0xff) << 8) | (pageB(off + 3) & 0xff)
            fieldOff(c) = off
            fieldLen(c) = len
            off += 4 + math.max(len, 0)
            c += 1
          }
          var keep = true
          if (preds.nonEmpty) {
            var k = 0
            while (k < predCols.length) {
              val i = predCols(k)
              val len = fieldLen(i)
              if (len < 0) predRow.setNullAt(i)
              else predRow.update(i, reader.readValueAt(
                pageB, fieldOff(i) + 4, len, t.colTypes(i), predTargets(i)))
              k += 1
            }
            keep = preds.forall(_(predRow))
          }
          if (keep) {
            ensureCap(2)
            enc(n) = (proj.length >> 8).toByte; enc(n + 1) = proj.length.toByte
            n += 2
            var pi = 0
            while (pi < proj.length) {
              val i = proj(pi)
              val l = 4 + math.max(fieldLen(i), 0)
              ensureCap(l)
              System.arraycopy(pageB, fieldOff(i), enc, n, l)
              n += l
              pi += 1
            }
          }
          r += 1
        }
      }

      override def read(): Int =
        if (!fillChunk()) -1
        else { val b = chunk(cpos) & 0xff; cpos += 1; b }

      override def read(b: Array[Byte], boff: Int, blen: Int): Int =
        if (blen == 0) 0
        else if (!fillChunk()) -1
        else {
          val m = math.min(blen, clim - cpos)
          System.arraycopy(chunk, cpos, b, boff, m)
          cpos += m
          m
        }
    }
  }

  /** Evaluate a pushed aggregate projection over the page range:
    * group cols + count/min/max/sum with optional ::casts. */
  private def serveAggregate(
      sch: String, tbl: String, proj: String,
      whereOpt: Option[String], groupByOpt: Option[String]): InputStream = {
    val t = getTable(sch, tbl)
    // bind EVERY WHERE conjunct: unlike a row scan (where the connector
    // re-applies pushed filters), an aggregate has no host-side
    // re-check — silently ignoring a conjunct would aggregate extra
    // rows into wrong results, so unbindable conjuncts throw instead
    var lo = 0L
    var hi = Long.MaxValue
    val wherePreds = mutable.ArrayBuffer.empty[InternalRow => Boolean]
    whereOpt.toSeq.flatMap(splitConjuncts).foreach {
      case CtidRangeRe(l, h) => lo = l.toLong; hi = h.toLong
      case p => wherePreds += parseWherePred(t, p)
    }

    final case class AggItem(fn: String, colIdx: Int, outType: PgType)
    def castType(suffix: String, default: PgType): PgType = suffix match {
      case null => default
      case "BIGINT" => PgInt8
      case "DOUBLE PRECISION" => PgFloat8
      case s if s.startsWith("NUMERIC(") =>
        val Array(p, sc) = s.stripPrefix("NUMERIC(").stripSuffix(")").split(",")
        PgNumeric(p.trim.toInt, sc.trim.toInt)
      case other => throw new IllegalArgumentException(s"agg cast $other")
    }
    val items: Seq[Either[Int, AggItem]] = splitTop(proj).map {
      case AggItemRe(fn, arg, cast) =>
        val ci = if (arg == "*") -1 else t.colIndex(arg.stripPrefix("\"").stripSuffix("\""))
        val defaultOut = fn match {
          case "count" => PgInt8
          case "min" | "max" => t.colTypes(ci)
          case "sum" => t.colTypes(ci)
        }
        Right(AggItem(fn, ci, castType(cast, defaultOut)))
      case g => Left(t.colIndex(g.stripPrefix("\"").stripSuffix("\"")))
    }
    val groupIdxs = items.collect { case Left(i) => i }

    def num(v: Any): Double = v match {
      case s: Short => s.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case f: Float => f.toDouble
      case d: Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => other.toString.toDouble
    }
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: org.apache.spark.unsafe.types.UTF8String,
            y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y)
      case _ => java.lang.Double.compare(num(a), num(b))
    }
    def coerce(v: Any, outType: PgType, srcType: PgType): Any = (outType, v) match {
      case (PgInt8, x) if srcType != PgInt8 => num(x).toLong
      case (PgFloat8, x) if srcType != PgFloat8 => num(x)
      case (PgNumeric(p, sc), d: org.apache.spark.sql.types.Decimal) =>
        org.apache.spark.sql.types.Decimal(d.toJavaBigDecimal.setScale(sc), p, sc)
      case (_, x) => x
    }

    // ONE streaming pass with per-group accumulators — never a
    // materialized Seq of grouped rows, so packed 60M-row tables
    // aggregate in bounded heap (same results as the old groupBy
    // form: identical visit order, identical accumulation types)
    val aggItems: IndexedSeq[AggItem] = items.collect { case Right(a) => a }.toIndexedSeq
    final class GroupAcc {
      val counts = new Array[Long](aggItems.length)
      val vals = new Array[Any](aggItems.length) // min/max current, sum accumulator
    }
    val groups = mutable.LinkedHashMap.empty[Seq[Any], GroupAcc]
    liveIter(t, lo, hi).foreach { case (_, r) =>
      if (wherePreds.forall(_(r))) {
        val key = groupIdxs.map(i =>
          if (r.isNullAt(i)) null else r.get(i, PgType.toSpark(t.colTypes(i))))
        val acc = groups.getOrElseUpdate(key, new GroupAcc)
        var j = 0
        while (j < aggItems.length) {
          val a = aggItems(j)
          a.fn match {
            case "count" =>
              if (a.colIdx == -1 || !r.isNullAt(a.colIdx)) acc.counts(j) += 1
            case "min" | "max" =>
              if (!r.isNullAt(a.colIdx)) {
                val v = r.get(a.colIdx, PgType.toSpark(t.colTypes(a.colIdx)))
                if (acc.vals(j) == null) acc.vals(j) = v
                else {
                  val c = cmp(acc.vals(j), v)
                  if ((a.fn == "min" && c > 0) || (a.fn == "max" && c < 0))
                    acc.vals(j) = v
                }
              }
            case "sum" =>
              if (!r.isNullAt(a.colIdx)) {
                val v = r.get(a.colIdx, PgType.toSpark(t.colTypes(a.colIdx)))
                t.colTypes(a.colIdx) match {
                  case PgInt2 | PgInt4 | PgInt8 =>
                    acc.vals(j) = (if (acc.vals(j) == null) 0L
                      else acc.vals(j).asInstanceOf[Long]) + num(v).toLong
                  case PgFloat4 | PgFloat8 =>
                    acc.vals(j) = (if (acc.vals(j) == null) 0.0
                      else acc.vals(j).asInstanceOf[Double]) + num(v)
                  case _: PgNumeric =>
                    val d = v.asInstanceOf[org.apache.spark.sql.types.Decimal]
                      .toJavaBigDecimal
                    acc.vals(j) = if (acc.vals(j) == null) d
                      else acc.vals(j).asInstanceOf[java.math.BigDecimal].add(d)
                  case other =>
                    throw new IllegalArgumentException(s"sum over $other")
                }
              }
          }
          j += 1
        }
      }
    }

    val outTypes = items.map {
      case Left(i) => t.colTypes(i)
      case Right(a) => a.outType
    }
    val writer = new PgBinaryWriter(outTypes)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writer.writeHeader(out)
    groups.foreach { case (key, acc) =>
      var aggJ = -1
      val vals: Seq[Any] = items.map {
        case Left(i) => key(groupIdxs.indexOf(i))
        case Right(a) =>
          aggJ += 1
          a.fn match {
            case "count" => acc.counts(aggJ)
            case "min" | "max" => acc.vals(aggJ)
            case "sum" => acc.vals(aggJ) match {
              case null => null
              case total: java.math.BigDecimal => a.outType match {
                case PgNumeric(p, sc) =>
                  org.apache.spark.sql.types.Decimal(total.setScale(sc), p, sc)
                case _ => org.apache.spark.sql.types.Decimal(total)
              }
              case other => other
            }
          }
      }
      val coerced = vals.zip(items).map {
        case (v, Right(AggItem(_, ci, ot))) if v != null && ci >= 0 =>
          coerce(v, ot, t.colTypes(ci))
        case (v, _) => v
      }
      writer.writeRow(out, new GenericInternalRow(coerced.toArray))
    }
    writer.writeTrailer(out)
    out.flush()
    new ByteArrayInputStream(bos.toByteArray)
  }

  // ---------------------------------------------------------------- //
  // COPY IN: accept PGCOPY binary rows
  // ---------------------------------------------------------------- //
  private val CopyInRe: Regex =
    """COPY "([^"]+)"\."([^"]+)"(?: \(([^)]*)\))? FROM STDIN \(FORMAT binary\)""".r
  private val CopyInTextRe: Regex =
    """COPY "([^"]+)"\."([^"]+)"(?: \(([^)]*)\))? FROM STDIN \(FORMAT text\)""".r

  private val CopyInTempRe: Regex =
    """COPY "([^".]+)"(?: \(([^)]*)\))? FROM STDIN \(FORMAT binary\)""".r

  /** every COPY IN statement accepted, for test assertions */
  val copyInStatements: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty

  override def copyIn(sql: String): OutputStream = {
    copyInStatements.synchronized { copyInStatements += sql }
    // bump eagerly (not just on close): a scan racing an in-flight COPY
    // must not insert bytes that miss the copy's rows
    bumpGeneration()
    val out = copyIn0(sql)
    new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        super.close()
        bumpGeneration() // rows are visible now; invalidate served scans
      }
    }
  }

  private def copyIn0(sql: String): OutputStream = sql match {
    case CopyInTextRe(sch, tbl, colsOrNull) =>
      val t = getTable(sch, tbl)
      val cols: Seq[Int] = Option(colsOrNull) match {
        case None | Some("") => t.columns.indices
        case Some(cs) => cs.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .toSeq.map(t.colIndex)
      }
      new ByteArrayOutputStream() {
        override def close(): Unit = {
          super.close()
          val text = new String(toByteArray, "UTF-8")
          t.synchronized {
            text.split("\n").filter(_.nonEmpty).foreach { line =>
              val fields = splitTextLine(line)
              require(fields.length == cols.length,
                s"text COPY arity ${fields.length} != ${cols.length}")
              val full = new GenericInternalRow(t.columns.length)
              cols.zip(fields).foreach { case (ci, f) =>
                if (f == null) full.setNullAt(ci)
                else full.update(ci, parseTextValue(f, t.colTypes(ci)))
              }
              if (t.packed) t.appendPacked(full) else t.slots += Some(full)
            }
          }
        }
      }
    case CopyInTempRe(tbl, colsOrNull) =>
      copyIn(s"""COPY "pg_temp"."$tbl"""" +
        Option(colsOrNull).map(c => s" ($c)").getOrElse("") +
        " FROM STDIN (FORMAT binary)")
    case CopyInRe(sch, tbl, colsOrNull) =>
      val t = getTable(sch, tbl)
      val cols: Seq[Int] = Option(colsOrNull) match {
        case None | Some("") => t.columns.indices
        case Some(cs) => cs.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .toSeq.map { c =>
            val i = t.colIndex(c)
            require(i >= 0, s"COPY IN: column '$c' not in ${t.columns.map(_._1)}")
            i
          }
      }
      new ByteArrayOutputStream() {
        override def close(): Unit = {
          super.close()
          val types = cols.map(i => t.colTypes(i))
          val reader = new PgBinaryReader(types)
          val in = new graft.codec.PgBlockInput(new ByteArrayInputStream(toByteArray))
          reader.readHeader(in)
          var next = reader.readRow(in)
          t.synchronized {
            while (next.isDefined) {
              val src = next.get
              val full = new GenericInternalRow(t.columns.length)
              cols.zipWithIndex.foreach { case (ci, si) =>
                if (src.isNullAt(si)) full.setNullAt(ci)
                else full.update(ci, src.get(si, PgType.toSpark(t.colTypes(ci))))
              }
              if (t.packed) t.appendPacked(full) else t.slots += Some(full)
              next = reader.readRow(in)
            }
          }
        }
      }
    case other =>
      throw new IllegalArgumentException(s"InMemoryPg: unsupported COPY IN: $other")
  }

  /** split one COPY TEXT line into unescaped fields (null = \N). */
  private def splitTextLine(line: String): Array[String] = {
    val fields = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var isNull = false
    def flush(): Unit = {
      fields += (if (isNull && cur.isEmpty) null else cur.toString)
      cur.clear(); isNull = false
    }
    while (i < line.length) {
      line.charAt(i) match {
        case '\t' => flush()
        case '\\' if i + 1 < line.length =>
          line.charAt(i + 1) match {
            case 'N' => isNull = true
            case 't' => cur += '\t'
            case 'n' => cur += '\n'
            case 'r' => cur += '\r'
            case c => cur += c
          }
          i += 1
        case c => cur += c
      }
      i += 1
    }
    flush()
    fields.toArray
  }

  /** parse a PG text literal into the internal value for `t`. */
  private def parseTextValue(f: String, t: PgType): Any = t match {
    // PG's accepted boolean spellings, case-insensitive, INCLUDING the
    // unique-prefix forms bool.c's parse_bool_with_len accepts ("tr",
    // "fal", "of", ...): any prefix of true/false/yes/no, "on"/"off"
    // with "of" also meaning off (no other word starts with those
    // letters), plus exact "t"/"f"/"y"/"n"/"1"/"0". Anything else is a
    // 22P02 input-syntax error — never a silent default to false
    case PgBool =>
      val w = f.trim.toLowerCase
      def prefixOf(full: String): Boolean = w.nonEmpty && full.startsWith(w)
      if (w == "1" || prefixOf("true") || prefixOf("yes") || w == "on") true
      // bare "o" is ambiguous between on/off — bool.c rejects it, so
      // the off-prefix needs length >= 2
      else if (w == "0" || prefixOf("false") || prefixOf("no") ||
        (w.length >= 2 && prefixOf("off"))) false
      else throw new PgBackendException("22P02",
        s"""invalid input syntax for type boolean: "$w"""")
    case PgInt2 => f.toShort
    case PgInt4 => f.toInt
    case PgInt8 => f.toLong
    case PgFloat4 => f.toFloat
    case PgFloat8 => f.toDouble
    case PgNumeric(p, sc) if p > 0 =>
      org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(f), p, sc)
    case _: PgNumeric => f.toDouble
    case PgBytea =>
      f.stripPrefix("\\x").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    case PgDate => java.time.LocalDate.parse(f).toEpochDay.toInt
    case PgTimestamp | PgTimestampTz =>
      val ldt = java.time.LocalDateTime.parse(f.replace(' ', 'T'))
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000
    case PgInterval =>
      // the ISO-8601 form PgTextWriter emits: P<months>M<days>DT<secs>S
      val IsoRe = """P(-?\d+)M(-?\d+)DT(-?[0-9.]+)S""".r
      f.trim match {
        case IsoRe(m, d, sec) =>
          new org.apache.spark.unsafe.types.CalendarInterval(
            m.toInt, d.toInt, math.round(sec.toDouble * 1e6))
        case other => throw new IllegalArgumentException(s"bad interval literal: $other")
      }
    case a: PgArray => parseArrayLiteral(f, a)
    case c: PgComposite => parseRecordLiteral(f, c)
    case PgPoint =>
      val ds = parseParenDoubles(f)
      new GenericInternalRow(Array[Any](ds(0), ds(1)))
    case PgLine | PgLseg | PgBox | PgCircle | PgPath | PgPolygon =>
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        parseParenDoubles(f).asInstanceOf[Array[Any]])
    case _ => // text family incl. enum/unknown/bit/uuid/json
      org.apache.spark.unsafe.types.UTF8String.fromString(f)
  }

  /** `(d1,d2,…)` — the flat geometry text form PgTextWriter emits. */
  private def parseParenDoubles(f: String): Array[Any] = {
    val t = f.trim
    require(t.startsWith("(") && t.endsWith(")"), s"bad geometry literal: $f")
    t.substring(1, t.length - 1).split(',').map(s => s.trim.toDouble: Any)
  }

  /** Split `inner` on top-level commas, honoring double-quoted elements
    * (with backslash escapes) and nested `open`/`close` groups. Returns
    * (text, wasQuoted) so an unquoted NULL can be told apart from the
    * quoted string "NULL". */
  private def splitTopLevel(inner: String, open: Char, close: Char): Seq[(String, Boolean)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val sb = new StringBuilder
    var depth = 0; var inQ = false; var sawQ = false; var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (inQ) c match {
        case '\\' => sb.append(inner.charAt(i + 1)); i += 1
        case '"' if i + 1 < inner.length && inner.charAt(i + 1) == '"' =>
          sb.append('"'); i += 1 // doubled-quote escape
        case '"' => inQ = false
        case other => sb.append(other)
      } else c match {
        case '"' => inQ = true; sawQ = true
        case `open` => depth += 1; sb.append(c)
        case `close` => depth -= 1; sb.append(c)
        case ',' if depth == 0 => parts += ((sb.toString, sawQ)); sb.clear(); sawQ = false
        case other => sb.append(other)
      }
      i += 1
    }
    parts += ((sb.toString, sawQ))
    parts.toSeq
  }

  /** PG array input literal `{a,"b c",NULL,{...}}` → ArrayData (the
    * inverse of PgTextWriter.arrayLiteral; a live server parses the
    * same syntax on text COPY input). */
  private def parseArrayLiteral(f: String, a: PgArray): org.apache.spark.sql.catalyst.util.ArrayData = {
    val trimmed = f.trim
    require(trimmed.startsWith("{") && trimmed.endsWith("}"), s"bad array literal: $f")
    val inner = trimmed.substring(1, trimmed.length - 1)
    if (inner.trim.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val vals = splitTopLevel(inner, '{', '}').map { case (txt, quoted) =>
      // PG array input: any unquoted case spelling of null is SQL NULL
      if (!quoted && txt.trim.equalsIgnoreCase("NULL")) null
      else a.elem match {
        case inner2: PgArray => parseArrayLiteral(txt, inner2)
        case _ if a.ndims > 1 => parseArrayLiteral(txt, a.copy(ndims = a.ndims - 1))
        case e => parseTextValue(txt.trim match {
          case t if !quoted => t
          case _ => txt
        }, e)
      }
    }.toArray[Any]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }

  /** PG record input literal `(x,,"a b")` → InternalRow (empty field =
    * NULL, matching PgTextWriter's composite rendering). */
  private def parseRecordLiteral(f: String, c: PgComposite): GenericInternalRow = {
    val trimmed = f.trim
    require(trimmed.startsWith("(") && trimmed.endsWith(")"), s"bad record literal: $f")
    val inner = trimmed.substring(1, trimmed.length - 1)
    val parts = splitTopLevel(inner, '(', ')')
    require(parts.length == c.fields.length,
      s"record arity ${parts.length} != ${c.fields.length}")
    val vals = parts.zip(c.fields).map { case ((txt, quoted), (_, ft)) =>
      if (!quoted && txt.isEmpty) null else parseTextValue(txt, ft)
    }.toArray[Any]
    new GenericInternalRow(vals)
  }

  // ---------------------------------------------------------------- //
  // execute: DDL / DML forwarding targets
  // ---------------------------------------------------------------- //
  private val CreateTableRe: Regex =
    """(?s)CREATE TABLE (IF NOT EXISTS )?"([^"]+)"\."([^"]+)" \((.*)\)""".r
  private val DropTableRe: Regex =
    """DROP TABLE (?:IF EXISTS )?"([^"]+)"\."([^"]+)"""".r
  private val TruncateRe: Regex = """TRUNCATE (?:TABLE )?"([^"]+)"\."([^"]+)"""".r
  private val CreateSchemaRe: Regex = """CREATE SCHEMA (?:IF NOT EXISTS )?"([^"]+)"""".r
  private val DropSchemaRe: Regex = """DROP SCHEMA (?:IF EXISTS )?"([^"]+)"(?: CASCADE)?""".r
  private val DeleteCtidRe: Regex =
    """DELETE FROM "([^"]+)"\."([^"]+)" WHERE ctid IN \((.*)\)""".r
  private val InsertSelectRe: Regex =
    """INSERT INTO "([^"]+)"\."([^"]+)" \(([^)]*)\) SELECT [^)]*? FROM "([^"]+)"\."([^"]+)"""".r
  private val InsertValuesRe: Regex =
    """(?s)INSERT INTO "([^"]+)"\."([^"]+)"(?: \(([^)]*)\))? VALUES (.+)""".r
  private val DeleteWhereRe: Regex =
    """(?s)DELETE FROM "([^"]+)"\."([^"]+)" WHERE (.+)""".r

  /** split s on a top-level occurrence of `kw` — quote-aware (string
    * literals may contain the keyword) and paren-aware (nested boolean
    * groups stay whole) */
  private def splitTopLevelKw(s: String, kw: String): Seq[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inQuote) { cur += c; if (c == '\'') inQuote = false; i += 1 }
      else if (c == '\'') { inQuote = true; cur += c; i += 1 }
      else if (c == '(') { depth += 1; cur += c; i += 1 }
      else if (c == ')') { depth -= 1; cur += c; i += 1 }
      else if (depth == 0 && s.regionMatches(i, kw, 0, kw.length)) {
        parts += cur.toString; cur.clear(); i += kw.length
      } else { cur += c; i += 1 }
    }
    parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** peel redundant wrapping parens: `(("a" = 'x'))` → `"a" = 'x'` */
  private def stripWrappingParens(p0: String): String = {
    var p = p0.trim
    while (p.startsWith("(") && p.endsWith(")") && outerParensMatch(p))
      p = p.substring(1, p.length - 1).trim
    p
  }

  /** Bind one pushed predicate: boolean AND/OR trees over comparisons,
    * IN lists and IS [NOT] NULL — the shapes PgSqlGen.compileFilter
    * emits. NULL evaluates to false at the leaves, which composes to
    * SQL's unknown-is-false filter semantics for AND/OR (but NOT for
    * NOT — negations are never bound here; the caller treats an
    * unparseable conjunct as unbound and serves extra rows, which the
    * connector's residual filter then removes). Anything else throws
    * IllegalArgumentException → unbound. */
  /** `used` (when non-null) collects every column index the returned
    * predicate reads — the verbatim packed serving path decodes ONLY
    * those columns per tuple. */
  private def parseWherePred(t: MemTable, p0: String,
      used: mutable.Set[Int] = null): InternalRow => Boolean = {
    val p = stripWrappingParens(p0)
    def bind(col: String): Int = {
      val i = t.colIndex(unq(col))
      require(i >= 0, s"DELETE column $col not found")
      if (used != null) used += i
      i
    }
    val ors = splitTopLevelKw(p, " OR ")
    if (ors.length > 1) {
      val ps = ors.map(parseWherePred(t, _, used))
      return r => ps.exists(_(r))
    }
    // `x BETWEEN a AND b` never reaches here (only the ctid-range
    // rewrite emits BETWEEN and it is bound before predicate parsing),
    // so a bare top-level AND is always a boolean conjunction
    val ands = splitTopLevelKw(p, " AND ")
    if (ands.length > 1) {
      val ps = ands.map(parseWherePred(t, _, used))
      return r => ps.forall(_(r))
    }
    val NullRe = """"?([\w]+)"?\s+IS\s+(NOT\s+)?NULL""".r
    val InRe = """(?s)"?([\w]+)"?\s+IN\s+\((.+)\)""".r
    p match {
      case NullRe(col, notOrNull) =>
        val i = bind(col)
        val wantNull = notOrNull == null
        r => r.isNullAt(i) == wantNull
      case InRe(col, list) =>
        val i = bind(col)
        val cmps = splitTop(list).map(v => compiledLeafCmp(t, i, litValue(v.trim)))
        r => !r.isNullAt(i) && cmps.exists(_(r) == 0)
      case PredRe(col, op, lit) =>
        val i = bind(col)
        val cmp = compiledLeafCmp(t, i, litValue(lit))
        r => !r.isNullAt(i) && {
          val c = cmp(r)
          op match {
            case "=" => c == 0
            case "<>" | "!=" => c != 0
            case "<" => c < 0
            case "<=" => c <= 0
            case ">" => c > 0
            case ">=" => c >= 0
          }
        }
      case other =>
        throw new IllegalArgumentException(s"InMemoryPg: cannot bind DELETE predicate: $other")
    }
  }
  private val RenameTableRe: Regex =
    """ALTER TABLE "([^"]+)"\."([^"]+)" RENAME TO "([^"]+)"""".r
  private val AddColumnRe: Regex =
    """ALTER TABLE "([^"]+)"\."([^"]+)" ADD COLUMN "([^"]+)" (.+)""".r
  private val DropColumnRe: Regex =
    """ALTER TABLE "([^"]+)"\."([^"]+)" DROP COLUMN "([^"]+)"""".r
  private val RenameColumnRe: Regex =
    """ALTER TABLE "([^"]+)"\."([^"]+)" RENAME COLUMN "([^"]+)" TO "([^"]+)"""".r

  private val CreateTempTableRe: Regex =
    """(?s)CREATE (?:LOCAL )?TEMP(?:ORARY)? TABLE "([^".]+)" \((.*)\)(?: ON COMMIT DROP)?""".r
  private val DropTempTableRe: Regex = """DROP TABLE "([^".]+)"""".r
  private val UpdateFromTempRe: Regex =
    """(?s)UPDATE "([^"]+)"\."([^"]+)" SET (.*) FROM "([^"]+)" WHERE "[^"]+"\."[^"]+"\.ctid = "[^"]+"\."__page_id_string"::tid""".r

  private val CreateEnumRe: Regex =
    """(?s)CREATE TYPE "?([\w]+)"? AS ENUM \((.*)\)""".r
  private val CreateCompositeRe: Regex =
    """(?s)CREATE TYPE "?([\w]+)"? AS \((.*)\)""".r
  private val DropTypeRe: Regex = """DROP TYPE (?:IF EXISTS )?"?([\w]+)"?""".r

  override def execute(sql: String): Unit = {
    executedStatements.synchronized { executedStatements += sql }
    sql match {
      case s if s.startsWith("BEGIN") || s.startsWith("COMMIT") ||
        s.startsWith("ROLLBACK") || s.startsWith("SET ") => ()
      case _ => bumpGeneration() // every other statement may mutate
    }
    sql match {
      case s if s.startsWith("BEGIN") || s.startsWith("COMMIT") ||
        s.startsWith("ROLLBACK") || s.startsWith("SET ") => ()
      case CreateEnumRe(name, labelList) =>
        val labels = splitTop(labelList).map(l =>
          l.trim.stripPrefix("'").stripSuffix("'").replace("''", "'"))
        userTypes.put(name, PgEnum(name, labels))
      case CreateCompositeRe(name, fieldDefs) =>
        userTypes.put(name, PgComposite(name, parseColumns(fieldDefs)))
      case DropTypeRe(name) => userTypes.remove(name)
      case CreateTempTableRe(tbl, colDefs) =>
        createTable("pg_temp", tbl, parseColumns(colDefs))
      case UpdateFromTempRe(sch, tbl, setList, tmpName) =>
        val target = getTable(sch, tbl)
        requireUnpacked(target, "UPDATE")
        val tmp = getTable("pg_temp", tmpName)
        val SetPair = ("\"([^\"]+)\" = \"" + java.util.regex.Pattern.quote(tmpName) +
          "\"\\.\"([^\"]+)\"").r
        val pairs = SetPair.findAllMatchIn(setList)
          .map(m => (target.colIndex(m.group(1)), tmp.colIndex(m.group(2)))).toSeq
        require(pairs.forall(p => p._1 >= 0 && p._2 >= 0), s"bad SET list: $setList")
        val pageIdIdx = tmp.colIndex("__page_id_string")
        val TidText = """\((\d+),(\d+)\)""".r
        target.synchronized {
          tmp.slots.foreach {
            case Some(tr) =>
              val tid = tr.get(pageIdIdx, org.apache.spark.sql.types.StringType).toString
              tid match {
                case TidText(p, r) =>
                  val slot = p.toInt * RowsPerPage + (r.toInt - 1)
                  if (slot >= 0 && slot < target.slots.length)
                    target.slots(slot).foreach { row =>
                      val updated = new GenericInternalRow(
                        (0 until target.columns.length).map(i =>
                          if (row.isNullAt(i)) null
                          else row.get(i, PgType.toSpark(target.colTypes(i)))).toArray[Any])
                      pairs.foreach { case (ti, si) =>
                        if (tr.isNullAt(si)) updated.setNullAt(ti)
                        else updated.update(ti, tr.get(si, PgType.toSpark(tmp.colTypes(si))))
                      }
                      target.slots(slot) = Some(updated)
                    }
                case _ =>
              }
            case None =>
          }
        }
      case DropTempTableRe(tbl) if hasTable("pg_temp", tbl) =>
        tables.remove(("pg_temp", tbl))
      case CreateSchemaRe(s) => schemas.add(s)
      case DropSchemaRe(s) =>
        schemas.remove(s)
        import scala.jdk.CollectionConverters._
        tables.keySet.asScala.filter(_._1 == s).toSeq.foreach(tables.remove)
      case InsertValuesRe(sch, tbl, colListOrNull, tuplesSql) =>
        // plain INSERT ... VALUES — the statement a ported
        // BEGIN/INSERT/SELECT/COMMIT session script sends. Literals
        // supported: NULL, 'string' ('' escape), numbers, TRUE/FALSE.
        val t = getTable(sch, tbl)
        val idxs: Seq[Int] = Option(colListOrNull).filter(_.trim.nonEmpty) match {
          case Some(cl) =>
            cl.split(",").toSeq.map(c =>
              t.colIndex(c.trim.stripPrefix("\"").stripSuffix("\"")))
          case None => t.columns.indices
        }
        require(idxs.forall(_ >= 0), s"INSERT VALUES column mismatch in: $sql")
        // quote-aware top-level split of "(...), (...)" into tuples
        def tuples(s: String): Seq[String] = {
          val out = mutable.ArrayBuffer.empty[String]
          var depth = 0; var inStr = false; val cur = new StringBuilder
          s.foreach { c =>
            c match {
              case '\'' => inStr = !inStr; cur += c
              case '(' if !inStr => depth += 1; if (depth > 1) cur += c
              case ')' if !inStr =>
                depth -= 1
                if (depth == 0) { out += cur.toString; cur.clear() } else cur += c
              case ',' if !inStr && depth == 0 => ()
              case _ => cur += c
            }
          }
          out.toSeq
        }
        def fields(s: String): Seq[String] = {
          val out = mutable.ArrayBuffer.empty[String]
          var depth = 0; var inStr = false; val cur = new StringBuilder
          s.foreach { c =>
            c match {
              case '\'' => inStr = !inStr; cur += c
              case '(' if !inStr => depth += 1; cur += c
              case ')' if !inStr => depth -= 1; cur += c
              case ',' if !inStr && depth == 0 => out += cur.toString.trim; cur.clear()
              case _ => cur += c
            }
          }
          if (cur.nonEmpty) out += cur.toString.trim
          out.toSeq
        }
        // Delegate to parseTextValue — the same reader the COPY TEXT
        // path uses — so typed literals (date/timestamp/bytea/interval/
        // array/geometry) land in their Catalyst representation, not as
        // UTF8String that later crashes the binary writer. Only the
        // SQL-specific forms (unquoted TRUE/FALSE, '' escaping) are
        // handled here.
        def literal(raw: String, pt: PgType): Any = raw match {
          case "NULL" => null
          case "TRUE" | "true" => true
          case "FALSE" | "false" => false
          case s2 if s2.startsWith("'") && s2.endsWith("'") =>
            parseTextValue(s2.substring(1, s2.length - 1).replace("''", "'"), pt)
          case num => parseTextValue(num, pt)
        }
        val rows = tuples(tuplesSql.trim).map { tup =>
          val vals = fields(tup)
          require(vals.length == idxs.length,
            s"INSERT VALUES arity mismatch: (${vals.mkString(", ")})")
          val full = new GenericInternalRow(t.columns.length)
          idxs.zip(vals).foreach { case (ci, raw) =>
            literal(raw, t.colTypes(ci)) match {
              case null => full.setNullAt(ci)
              case v => full.update(ci, v)
            }
          }
          full
        }
        t.synchronized { rows.foreach(r =>
          if (t.packed) t.appendPacked(r) else t.slots += Some(r)) }
      case InsertSelectRe(tSch, tTbl, colList, sSch, sTbl) =>
        // staged-write promote: copy rows column-by-name from the
        // staging table into the target
        val target = getTable(tSch, tTbl)
        requireUnpacked(target, "INSERT SELECT")
        val src = getTable(sSch, sTbl)
        requireUnpacked(src, "INSERT SELECT source")
        val cols = colList.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
        val tIdx = cols.map(target.colIndex)
        val sIdx = cols.map(src.colIndex)
        require(tIdx.forall(_ >= 0) && sIdx.forall(_ >= 0),
          s"INSERT SELECT column mismatch: $cols")
        target.synchronized {
          src.slots.foreach {
            case Some(r) =>
              val full = new GenericInternalRow(target.columns.length)
              tIdx.zip(sIdx).foreach { case (ti, si) =>
                if (r.isNullAt(si)) full.setNullAt(ti)
                else full.update(ti, r.get(si, PgType.toSpark(src.colTypes(si))))
              }
              target.slots += Some(full)
            case None =>
          }
        }
      case CreateTableRe(ifNotExists, sch, tbl, colDefs) =>
        // PG semantics: plain CREATE TABLE on an existing relation is
        // 42P07; IF NOT EXISTS is a no-op that keeps the existing table
        if (tables.containsKey((sch, tbl))) {
          if (ifNotExists == null)
            throw new PgBackendException("42P07",
              s"""relation "$tbl" already exists""")
        } else createTable(sch, tbl, parseColumns(colDefs))
      case DropTableRe(sch, tbl) => tables.remove((sch, tbl))
      case TruncateRe(sch, tbl) =>
        val t = getTable(sch, tbl)
        t.synchronized { t.slots.clear(); t.clearPacked() }
      case AddColumnRe(sch, tbl, colName, tpe) =>
        val t = getTable(sch, tbl)
        requireUnpacked(t, "ALTER TABLE")
        val nt = new MemTable(sch, tbl, t.columns :+ (colName -> parseTypeString(tpe.trim)))
        t.slots.foreach {
          case Some(r) =>
            val vals = (0 until t.columns.length).map(i =>
              if (r.isNullAt(i)) null else r.get(i, PgType.toSpark(t.colTypes(i)))).toArray :+ null
            nt.slots += Some(new GenericInternalRow(vals.asInstanceOf[Array[Any]]))
          case None => nt.slots += None
        }
        tables.put((sch, tbl), nt)
      case DropColumnRe(sch, tbl, colName) =>
        val t = getTable(sch, tbl)
        requireUnpacked(t, "ALTER TABLE")
        val keep = t.columns.zipWithIndex.filter(_._1._1 != colName)
        val nt = new MemTable(sch, tbl, keep.map(_._1))
        t.slots.foreach {
          case Some(r) =>
            val vals = keep.map { case ((_, ct), i) =>
              if (r.isNullAt(i)) null else r.get(i, PgType.toSpark(ct)) }.toArray
            nt.slots += Some(new GenericInternalRow(vals.asInstanceOf[Array[Any]]))
          case None => nt.slots += None
        }
        tables.put((sch, tbl), nt)
      case RenameColumnRe(sch, tbl, from, to) =>
        val t = getTable(sch, tbl)
        requireUnpacked(t, "ALTER TABLE")
        val nt = new MemTable(sch, tbl,
          t.columns.map { case (n, ct) => (if (n == from) to else n) -> ct })
        nt.slots ++= t.slots
        tables.put((sch, tbl), nt)
      case RenameTableRe(sch, tbl, newName) =>
        // validate BEFORE removing: a rejected rename (packed table)
        // must leave the source table intact, not destroy it
        val t = getTable(sch, tbl)
        requireUnpacked(t, "RENAME TABLE")
        tables.remove((sch, tbl))
        val nt = createTable(sch, newName, t.columns)
        nt.slots ++= t.slots
      case s if s.startsWith("CREATE UNIQUE INDEX") || s.startsWith("CREATE INDEX") =>
        val IdxRe = """CREATE (UNIQUE )?INDEX "([^"]+)" ON "([^"]+)"\."([^"]+)" \(([^)]*)\)""".r
        s match {
          case IdxRe(uniq, name, sch, tbl, cols) =>
            if (!hasTable(sch, tbl)) throw new PgBackendException("42P01",
              s"relation $sch.$tbl does not exist")
            indexes.put(name, (sch, tbl, uniq != null,
              cols.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq))
          case _ => throw new IllegalArgumentException(s"bad CREATE INDEX: $s")
        }
      case s if s.startsWith("DROP INDEX") =>
        val DropRe = """DROP INDEX "([^"]+)"""".r
        s match {
          case DropRe(name) => indexes.remove(name)
          case _ => throw new IllegalArgumentException(s"bad DROP INDEX: $s")
        }
      case DeleteCtidRe(sch, tbl, tids) =>
        val t = getTable(sch, tbl)
        requireUnpacked(t, "DELETE")
        val TidLit = """'\((\d+),(\d+)\)'(?:::tid)?""".r
        t.synchronized {
          TidLit.findAllMatchIn(tids).foreach { m =>
            val slot = m.group(1).toInt * RowsPerPage + (m.group(2).toInt - 1)
            if (slot >= 0 && slot < t.slots.length) t.slots(slot) = None
          }
        }
      case DeleteWhereRe(sch, tbl, where) =>
        // pushed-down SQL DELETE (SupportsDelete.deleteWhere): evaluate
        // the conjunction of simple predicates and kill matching slots
        val t = getTable(sch, tbl)
        requireUnpacked(t, "DELETE")
        // the whole WHERE goes to the tree-aware parser: a top-level OR
        // of parenthesized conjunctions (e.g. ((a OR b) AND c) OR d)
        // must not be string-split on ") AND ("
        val pred: InternalRow => Boolean =
          if (where.trim == "TRUE") _ => true
          else parseWherePred(t, where)
        t.synchronized {
          var slot = 0
          while (slot < t.slots.length) {
            t.slots(slot) match {
              case Some(r) if pred(r) => t.slots(slot) = None
              case _ =>
            }
            slot += 1
          }
        }
      case other =>
        throw new IllegalArgumentException(s"InMemoryPg: unsupported statement: $other")
    }
  }

  /** parse "\"c1\" TYPE, \"c2\" TYPE(args)..." column definitions as
    * produced by the connector's CREATE TABLE generator. */
  private def parseColumns(defs: String): Seq[(String, PgType)] = {
    // split on commas not inside parens/quotes
    val parts = mutable.ArrayBuffer.empty[String]
    var depth = 0; var cur = new StringBuilder
    defs.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur = new StringBuilder
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty).map { d =>
      val ColDef = """"([^"]+)" (.+?)( NOT NULL)?""".r
      d match {
        case ColDef(name, tpe, _) => name -> parseTypeString(tpe.trim)
        case _ => throw new IllegalArgumentException(s"cannot parse column def: $d")
      }
    }
  }

  private def parseTypeString(s: String): PgType = {
    // quoted / registered user-defined type names resolve first
    val bare = s.stripPrefix("\"").stripSuffix("\"")
    val registered = userTypes.get(bare)
    if (registered != null) return registered
    val upper = s.toUpperCase
    val NumRe = """(?:NUMERIC|DECIMAL)\((\d+),(\d+)\)""".r
    val CharRe = """CHAR\((\d+)\)""".r
    val VarcharRe = """(?:VARCHAR|CHARACTER VARYING)\((\d+)\)""".r
    if (upper.endsWith("[]")) {
      var base = s; var nd = 0
      while (base.endsWith("[]")) { base = base.dropRight(2); nd += 1 }
      PgArray(parseTypeString(base), nd)
    } else upper match {
      // both the SQL-standard names the catalog's DDL emits and the
      // internal short names any hand-written PG script uses
      case "BOOLEAN" | "BOOL" => PgBool
      case "SMALLINT" | "INT2" => PgInt2
      case "INTEGER" | "INT" | "INT4" => PgInt4
      case "BIGINT" | "INT8" => PgInt8
      case "REAL" | "FLOAT4" => PgFloat4
      case "DOUBLE PRECISION" | "FLOAT8" => PgFloat8
      case NumRe(p, sc) => PgNumeric(p.toInt, sc.toInt)
      case "NUMERIC" | "DECIMAL" => PgNumeric(0, 0)
      case "TEXT" => PgText
      case "VARCHAR" | "CHARACTER VARYING" => PgVarchar
      case VarcharRe(_) => PgVarchar // length limit not modeled
      case CharRe(n) => PgBpchar(n.toInt)
      case "JSON" => PgJson
      case "JSONB" => PgJsonb
      case "DATE" => PgDate
      case "TIME" => PgTime
      case "TIMESTAMP" => PgTimestamp
      case "TIMESTAMP WITH TIME ZONE" | "TIMESTAMPTZ" => PgTimestampTz
      case "INTERVAL" => PgInterval
      case "UUID" => PgUuid
      case "BYTEA" => PgBytea
      case "BIT" => PgBit
      case "POINT" => PgPoint
      case other => PgUnknown(other.toLowerCase)
    }
  }
}

object InMemoryPg {
  private val instances = new ConcurrentHashMap[String, InMemoryPg]()

  def forName(name: String): InMemoryPg =
    instances.computeIfAbsent(name, n => new InMemoryPg(n))

  def reset(name: String): Unit = instances.remove(name)
}
