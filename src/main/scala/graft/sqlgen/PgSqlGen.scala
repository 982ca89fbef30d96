package graft.sqlgen

import org.apache.spark.sql.sources._

import graft.types.PgType
import graft.types.PgType._

/** Generates the remote SQL a scan task sends to Postgres.
  *
  * Shape (ref: PostgresInitInternal, src/postgres_scanner.cpp:192-266):
  *   COPY (SELECT <cols> FROM <rel> WHERE <ctid range> AND <filters>)
  *     TO STDOUT (FORMAT binary)
  * with: `NULL` projection when no columns are needed (pure count(*)),
  * ::VARCHAR casts injected for types read as text, the ctid BETWEEN
  * predicate per parallel task, and a subquery form for ad-hoc queries.
  */
object PgSqlGen {

  val TidMax: Long = 4294967295L // ref: src/postgres_scanner.cpp:19

  final case class ScanColumn(name: String, pgType: PgType, raw: Boolean = false)

  /** Projection list: quoted column names, with ::VARCHAR casts for
    * CAST_TO_VARCHAR types (ref: src/postgres_scanner.cpp:212-221) and
    * ctid exposure for the row-id metadata column. */
  def projection(cols: Seq[ScanColumn]): String =
    if (cols.isEmpty) "NULL" // count(*)-only (ref: postgres_scanner.cpp:204-210)
    else cols.map {
      case ScanColumn(sql, _, true) => sql // pushed aggregate / raw expr
      case ScanColumn("_ctid", _, _) | ScanColumn("ctid", _, _) => "ctid"
      case ScanColumn(n, _: PgUnknown, _) => s"${quoteIdent(n)}::VARCHAR"
      case ScanColumn(n, PgBit, _) => s"${quoteIdent(n)}::VARCHAR"
      case ScanColumn(n, _, _) => quoteIdent(n)
    }.mkString(", ")

  /** ctid page-range predicate for one parallel task
    * (ref: src/postgres_scanner.cpp:237-247). */
  def ctidRange(minPage: Long, maxPage: Long): String =
    s"ctid BETWEEN '($minPage,0)'::tid AND '($maxPage,0)'::tid"

  /** Full per-task COPY statement over a base table. `orderBy`/`limit`
    * carry a pushed (partial) top-N: each task returns at most `limit`
    * rows of its ctid range and Spark re-applies the global sort+limit,
    * so the per-task clause is a bandwidth optimization exactly like
    * the pushed WHERE. */
  def copyTableSql(
      schema: String,
      table: String,
      cols: Seq[ScanColumn],
      pageRange: Option[(Long, Long)],
      filters: Seq[String],
      groupBy: Seq[String] = Nil,
      orderBy: Seq[String] = Nil,
      limit: Option[Int] = None): String = {
    val preds = pageRange.map { case (lo, hi) => ctidRange(lo, hi) }.toSeq ++ filters
    val where = if (preds.isEmpty) "" else preds.mkString(" WHERE (", ") AND (", ")")
    val grp = if (groupBy.isEmpty) "" else groupBy.mkString(" GROUP BY ", ", ", "")
    val ord = if (orderBy.isEmpty) "" else orderBy.mkString(" ORDER BY ", ", ", "")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"COPY (SELECT ${projection(cols)} FROM " +
      s"${quoteIdent(schema)}.${quoteIdent(table)}$where$grp$ord$lim) TO STDOUT (FORMAT binary)"
  }

  /** Subquery form for postgres_query-style ad-hoc SQL
    * (ref: src/postgres_scanner.cpp:248-255). */
  def copyQuerySql(
      sql: String,
      cols: Seq[ScanColumn],
      filters: Seq[String],
      orderBy: Seq[String] = Nil,
      limit: Option[Int] = None,
      offset: Option[Int] = None): String = {
    val where = if (filters.isEmpty) "" else filters.mkString(" WHERE (", ") AND (", ")")
    val ord = if (orderBy.isEmpty) "" else orderBy.mkString(" ORDER BY ", ", ", "")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    val off = offset.map(n => s" OFFSET $n").getOrElse("")
    val inner = sql.trim.stripSuffix(";")
    s"COPY (SELECT ${projection(cols)} FROM ($inner) AS __unnamed_subquery$where$ord$lim$off) " +
      "TO STDOUT (FORMAT binary)"
  }

  // ---------------------------------------------------------------- //
  // Filter pushdown: Spark V1 Filter → PG SQL text
  // (ref: src/postgres_filter_pushdown.cpp:17-84 — the reference
  // supports comparisons, IS [NOT] NULL, AND/OR conjunctions and
  // struct-field extraction; everything else stays a residual that the
  // host engine re-evaluates.)
  // ---------------------------------------------------------------- //

  /** Compile one Spark filter to PG SQL; None → not pushable (residual). */
  def compileFilter(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => Some(s"${ref(a)} = ${literal(v)}")
    case EqualNullSafe(a, v) =>
      Some(s"${ref(a)} IS NOT DISTINCT FROM ${literal(v)}")
    case GreaterThan(a, v) => Some(s"${ref(a)} > ${literal(v)}")
    case GreaterThanOrEqual(a, v) => Some(s"${ref(a)} >= ${literal(v)}")
    case LessThan(a, v) => Some(s"${ref(a)} < ${literal(v)}")
    case LessThanOrEqual(a, v) => Some(s"${ref(a)} <= ${literal(v)}")
    case IsNull(a) => Some(s"${ref(a)} IS NULL")
    case IsNotNull(a) => Some(s"${ref(a)} IS NOT NULL")
    case In(a, vs) if vs.nonEmpty =>
      Some(s"${ref(a)} IN (${vs.map(literal).mkString(", ")})")
    case StringStartsWith(a, v) =>
      Some(s"${ref(a)} LIKE ${likePattern(escapeLike(v) + "%")}")
    case StringEndsWith(a, v) =>
      Some(s"${ref(a)} LIKE ${likePattern("%" + escapeLike(v))}")
    case StringContains(a, v) =>
      Some(s"${ref(a)} LIKE ${likePattern("%" + escapeLike(v) + "%")}")
    case And(l, r) =>
      for (ls <- compileFilter(l); rs <- compileFilter(r))
        yield s"($ls AND $rs)"
    case Or(l, r) =>
      for (ls <- compileFilter(l); rs <- compileFilter(r))
        yield s"($ls OR $rs)"
    case Not(c) => compileFilter(c).map(s => s"(NOT ($s))")
    case _ => None
  }

  /** Split filters into (pushed SQL, residuals). The reference also
    * keeps pushed filters as residuals (host re-applies; ref:
    * SURVEY.md §2.2) — we report pushed ones back as handled since
    * Spark's parquet/JDBC sources prove the contract is safe either way;
    * the conservative caller can still re-apply. */
  def splitFilters(filters: Seq[Filter]): (Seq[String], Seq[Filter]) = {
    val compiled = filters.map(f => f -> compileFilter(f))
    (compiled.collect { case (_, Some(sql)) => sql },
      compiled.collect { case (f, None) => f })
  }

  /** Column or nested struct-field reference: "a.b.c" →
    * ("a")."b"."c" (ref: src/postgres_filter_pushdown.cpp:56-61). */
  def ref(attr: String): String = {
    val parts = attr.split('.')
    if (parts.length == 1) quoteIdent(attr)
    else s"(${quoteIdent(parts.head)})." + parts.tail.map(quoteIdent).mkString(".")
  }

  /** SQL literal with PG quoting (ref: constants quoted,
    * src/postgres_filter_pushdown.cpp:36-54). */
  def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => quoteString(s)
    case s: UTF8StringLike => quoteString(s.toString)
    case b: Boolean => if (b) "true" else "false"
    case b: Byte => b.toString
    case s: Short => s.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case f: Float => f.toString
    case d: Double => d.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case d: java.sql.Date => s"DATE '${d.toString}'"
    case d: java.time.LocalDate => s"DATE '${d.toString}'"
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString}'"
    case t: java.time.Instant => s"TIMESTAMP '${java.sql.Timestamp.from(t)}'"
    case t: java.time.LocalDateTime => s"TIMESTAMP '${java.sql.Timestamp.valueOf(t)}'"
    case b: Array[Byte] =>
      "'\\x" + b.map(x => f"$x%02x").mkString + "'::bytea"
    case other => quoteString(other.toString)
  }

  private type UTF8StringLike = org.apache.spark.unsafe.types.UTF8String

  def quoteIdent(s: String): String = PgType.quoteIdent(s)

  /** 8-hex-char tag of the full sink identity. Staging-table names
    * embed it so a truncated table-name prefix can never alias two
    * sinks: two sinks whose names share the first 24 characters would
    * otherwise match each other's orphan-sweep prefix, and starting
    * one could DROP the other's live staging tables mid-epoch. */
  def sinkTag(schema: String, table: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$schema.$table".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
  }

  /** Standard-conforming string literal: only quotes are doubled;
    * backslashes are literal under PG's default
    * standard_conforming_strings=on (the reference likewise doubles
    * only quotes — ref: src/postgres_filter_pushdown.cpp:52,
    * KeywordHelper::WriteQuoted). */
  def quoteString(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** LIKE pattern literal with an explicit ESCAPE clause so the
    * backslash escapes emitted by [[escapeLike]] are unambiguous
    * regardless of server settings. */
  private def likePattern(pattern: String): String =
    quoteString(pattern) + " ESCAPE '\\'"

  private def escapeLike(s: String): String =
    s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

  // ---------------------------------------------------------------- //
  // Parallel task planning: split a table's pages into ranges
  // (ref: PostgresParallelStateNext, src/postgres_scanner.cpp:332-352)
  // ---------------------------------------------------------------- //
  final case class PageRange(minPage: Long, maxPage: Long)

  /** One range per `pagesPerTask` pages; the last range is extended to
    * TID_MAX so late-added pages are still scanned
    * (ref: src/postgres_scanner.cpp:339-347, constant :19). */
  def planPageRanges(totalPages: Long, pagesPerTask: Long = 1000L): Seq[PageRange] = {
    if (totalPages <= 0) return Seq(PageRange(0, TidMax))
    val n = math.max(1L, math.ceil(totalPages.toDouble / pagesPerTask).toLong)
    (0L until n).map { i =>
      val lo = i * pagesPerTask
      val hi = if (i == n - 1) TidMax else (i + 1) * pagesPerTask
      PageRange(lo, hi)
    }
  }

  /** Cardinality model (ref: src/postgres_scanner.cpp:500-514). */
  def estimateRows(pages: Long, ncols: Int): Long =
    pages * ((8192 - 23) / (23 + 8 * math.max(ncols, 1)))
}
