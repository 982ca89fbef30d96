package graft

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.sqlgen.PgSqlGen
import graft.sqlgen.PgSqlGen._
import graft.types.PgType._

class SqlGenSpec extends AnyFunSuite {

  test("scan SQL with ctid range, projection and filters") {
    val sql = copyTableSql("public", "lineitem",
      Seq(ScanColumn("l_orderkey", PgInt8), ScanColumn("l_comment", PgVarchar)),
      Some((0L, 1000L)), Seq("\"l_orderkey\" > 5"))
    assert(sql ==
      """COPY (SELECT "l_orderkey", "l_comment" FROM "public"."lineitem"""" +
        """ WHERE (ctid BETWEEN '(0,0)'::tid AND '(1000,0)'::tid) AND ("l_orderkey" > 5)) TO STDOUT (FORMAT binary)""")
  }

  test("count(*)-only scan projects NULL") {
    val sql = copyTableSql("s", "t", Nil, None, Nil)
    assert(sql == """COPY (SELECT NULL FROM "s"."t") TO STDOUT (FORMAT binary)""")
  }

  test("unknown types get ::VARCHAR casts; ctid column maps to ctid") {
    val p = projection(Seq(
      ScanColumn("m", PgUnknown("macaddr")),
      ScanColumn("_ctid", PgCtid),
      ScanColumn("x", PgInt4)))
    assert(p == """"m"::VARCHAR, ctid, "x"""")
  }

  test("query form wraps as subquery and strips trailing semicolon") {
    val sql = copyQuerySql("SELECT 1 AS a;", Seq(ScanColumn("a", PgInt4)), Nil)
    assert(sql == """COPY (SELECT "a" FROM (SELECT 1 AS a) AS __unnamed_subquery) TO STDOUT (FORMAT binary)""")
  }

  test("filter compiler: comparisons, null tests, boolean structure") {
    assert(compileFilter(EqualTo("a", 5)).contains(""""a" = 5"""))
    assert(compileFilter(LessThan("a", "x'y")).contains(""""a" < 'x''y'"""))
    assert(compileFilter(IsNull("a")).contains(""""a" IS NULL"""))
    assert(compileFilter(
      And(GreaterThanOrEqual("a", 1), Or(IsNotNull("b"), EqualTo("c", true))))
      .contains("""("a" >= 1 AND ("b" IS NOT NULL OR "c" = true))"""))
    assert(compileFilter(In("a", Array(1, 2, 3))).contains(""""a" IN (1, 2, 3)"""))
    // standard_conforming_strings: backslashes NOT doubled in the
    // literal; LIKE gets an explicit ESCAPE clause
    assert(compileFilter(StringStartsWith("s", "pre%"))
      .contains(""""s" LIKE 'pre\%%' ESCAPE '\'"""))
    assert(compileFilter(EqualTo("a", """back\slash"""))
      .contains(""""a" = 'back\slash'"""))
  }

  test("struct field references compile to parenthesized extraction") {
    assert(ref("col.field") == """("col")."field"""")
    assert(ref("plain") == "\"plain\"")
  }

  test("unsupported filters become residuals") {
    val (pushed, residual) = splitFilters(Seq(
      EqualTo("a", 1),
      AlwaysTrue(), // no SQL mapping in the compiler
      StringContains("s", "mid")))
    assert(pushed.size == 2 && residual.size == 1)
  }

  test("page range planning matches pages_per_task semantics") {
    // last task extends to TID_MAX (ref: postgres_scanner.cpp:339-347)
    val r = planPageRanges(2500, 1000)
    assert(r == Seq(PageRange(0, 1000), PageRange(1000, 2000),
      PageRange(2000, PgSqlGen.TidMax)))
    assert(planPageRanges(0) == Seq(PageRange(0, PgSqlGen.TidMax)))
    assert(planPageRanges(999, 1000) == Seq(PageRange(0, PgSqlGen.TidMax)))
  }

  test("cardinality model") {
    assert(estimateRows(10, 8) == 10 * ((8192 - 23) / (23 + 64)))
  }

  test("temporal literals") {
    assert(literal(java.time.LocalDate.of(1995, 3, 15)) == "DATE '1995-03-15'")
    assert(literal(java.sql.Timestamp.valueOf("1995-03-15 10:30:00")) ==
      "TIMESTAMP '1995-03-15 10:30:00.0'")
  }
}
