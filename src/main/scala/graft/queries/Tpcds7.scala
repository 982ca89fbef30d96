package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, seventh wave (q87-q94) — plan classes from the
  * reference's corpus (ref: test/sql/scanner/tpcds.test:23-67) still
  * unrepresented after waves 1-6:
  *
  *  - chained multi-set difference (DS q87's store EXCEPT catalog
  *    EXCEPT web customer count)
  *  - NOT IN with null-aware anti-join semantics (DS q16/q69)
  *  - whole-partition window average vs per-row actual (DS q89's
  *    category-average deviation, unbounded frame — q59 covers the
  *    sliding frame)
  *  - ratio of two independent scalar aggregates (DS q90 am/pm)
  *  - FIRST_VALUE/LAST_VALUE over an ordered frame (DS q47's
  *    first/last period anchors)
  *  - dual-direction ranking united (DS q44's best-and-worst
  *    performers)
  *  - three-way INTERSECT cohort (DS q14's cross-channel items;
  *    q48 covers the 2-set case)
  *  - distinct-count per derived time grain (DS q94-style weekly
  *    order accounting)
  *
  * Exactness per house rules: decimal sums, COUNT(CASE …)/COUNT
  * DISTINCT for portable counts, identical double expressions both
  * sides, deterministic total ORDER BY.
  */
object Tpcds7 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q87: DS q87-style chained difference — customers with urgent
  // orders, EXCEPT those with any 400k+ order, EXCEPT those active in
  // 1997+; count survivors. Two successive distinct-set differences.
  // ---------------------------------------------------------------- //
  def q87_except_chain(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def keys(d: DataFrame) = d.select(col("o_custkey")).distinct()
    val urgent = keys(o.filter(col("o_orderpriority") === "1-URGENT"))
    val big = keys(o.filter(col("o_totalprice") > 400000.0))
    val recent = keys(o.filter(
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp")))
    urgent.except(big).except(recent)
      .agg(count(lit(1)).as("n_survivors"))
  }

  val q87_sql: String =
    """SELECT COUNT(*) AS n_survivors FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')""".stripMargin

  // ---------------------------------------------------------------- //
  // q88: DS q16-style NOT IN — parts never shipped in 2001, counted
  // per brand. NOT IN (vs NOT EXISTS, q08/q58) carries the null-aware
  // anti-join plan shape; the SQL goes through the registered views so
  // both engines evaluate the same three-valued predicate.
  // ---------------------------------------------------------------- //
  def q88_not_in(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT p_brand, COUNT(*) AS n_parts
        |FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
  }

  val q88_sql: String =
    """SELECT p_brand, COUNT(*) AS n_parts
      |FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q89: DS q89-style deviation from the category average — monthly
  // 1997 revenue per brand vs the brand's whole-year monthly average
  // (unbounded window frame), keeping months deviating more than 15%.
  // ---------------------------------------------------------------- //
  def q89_category_deviation(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), month(col("l_shipdate")).as("mo"))
      .agg(dsum(col("l_extendedprice")).as("rev"))
    val w = Window.partitionBy(col("p_brand"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    monthly
      .withColumn("avg_rev",
        sum(dec(col("rev"))).over(w).cast("double") / count(lit(1)).over(w))
      .withColumn("dev", col("rev") / col("avg_rev"))
      .filter(col("dev") > 1.15 || col("dev") < 0.85)
      .select(col("p_brand"), col("mo"), col("rev"), col("avg_rev"), col("dev"))
      .orderBy(col("p_brand"), col("mo"))
  }

  val q89_sql: String =
    """WITH monthly AS (
      |  SELECT p_brand, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |win AS (
      |  SELECT p_brand, mo, rev,
      |    CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER w AS DOUBLE) /
      |      COUNT(*) OVER w AS avg_rev
      |  FROM monthly
      |  WINDOW w AS (PARTITION BY p_brand
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT p_brand, mo, rev, avg_rev, rev / avg_rev AS dev FROM win
      |WHERE rev / avg_rev > 1.15 OR rev / avg_rev < 0.85
      |ORDER BY p_brand, mo""".stripMargin

  // ---------------------------------------------------------------- //
  // q90: DS q90-style scalar ratio — morning vs evening event counts
  // as two independent scalar aggregates, one-row ratio output.
  // ---------------------------------------------------------------- //
  def q90_am_pm_ratio(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def half(lo: Int, hi: Int, out: String) =
      ev.filter(hour(col("ts")) >= lo && hour(col("ts")) < hi)
        .agg(count(lit(1)).as(out))
    half(6, 12, "am_events").crossJoin(half(18, 24, "pm_events"))
      .withColumn("am_pm_ratio",
        col("am_events").cast("double") / col("pm_events"))
  }

  val q90_sql: String =
    """SELECT am_events, pm_events,
      |  CAST(am_events AS DOUBLE) / pm_events AS am_pm_ratio
      |FROM (SELECT COUNT(*) AS am_events FROM events
      |      WHERE EXTRACT(HOUR FROM ts) >= 6 AND EXTRACT(HOUR FROM ts) < 12)
      |CROSS JOIN (SELECT COUNT(*) AS pm_events FROM events
      |      WHERE EXTRACT(HOUR FROM ts) >= 18 AND EXTRACT(HOUR FROM ts) < 24)""".stripMargin

  // ---------------------------------------------------------------- //
  // q91: DS q47-style period anchors — per brand, the first and last
  // month's revenue over the ordered year (FIRST_VALUE/LAST_VALUE with
  // an explicit unbounded frame) and the trend ratio between them.
  // ---------------------------------------------------------------- //
  def q91_first_last(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), month(col("l_shipdate")).as("mo"))
      .agg(dsum(col("l_extendedprice")).as("rev"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    monthly
      .withColumn("first_rev", first(col("rev")).over(w))
      .withColumn("last_rev", last(col("rev")).over(w))
      .filter(col("mo") === 1)
      .select(col("p_brand"), col("first_rev"), col("last_rev"),
        (col("last_rev") / col("first_rev")).as("trend"))
      .orderBy(col("p_brand"))
  }

  val q91_sql: String =
    """WITH monthly AS (
      |  SELECT p_brand, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2)
      |SELECT p_brand, first_rev, last_rev, last_rev / first_rev AS trend FROM (
      |  SELECT p_brand, mo,
      |    FIRST_VALUE(rev) OVER w AS first_rev,
      |    LAST_VALUE(rev) OVER w AS last_rev
      |  FROM monthly
      |  WINDOW w AS (PARTITION BY p_brand ORDER BY mo
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |WHERE mo = 1 ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q92: DS q44-style best-and-worst — per-brand revenue ranked both
  // directions, the top 3 and bottom 3 united with a side marker.
  // ---------------------------------------------------------------- //
  def q92_best_worst(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("rev"))
    def ranked(order: Column, side: String) =
      rev.withColumn("rk",
        row_number().over(Window.orderBy(order, col("p_brand"))).cast("int"))
        .filter(col("rk") <= 3)
        .select(lit(side).as("side"), col("rk"), col("p_brand"), col("rev"))
    ranked(desc("rev"), "best").union(ranked(asc("rev"), "worst"))
      .orderBy(col("side"), col("rk"))
  }

  val q92_sql: String =
    """WITH rev AS (
      |  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand)
      |SELECT side, rk, p_brand, rev FROM (
      |  SELECT 'best' AS side,
      |    CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, p_brand) AS INT) AS rk,
      |    p_brand, rev FROM rev
      |  UNION ALL
      |  SELECT 'worst' AS side,
      |    CAST(ROW_NUMBER() OVER (ORDER BY rev ASC, p_brand) AS INT) AS rk,
      |    p_brand, rev FROM rev)
      |WHERE rk <= 3 ORDER BY side, rk""".stripMargin

  // ---------------------------------------------------------------- //
  // q93: DS q14-style three-way INTERSECT — customers present in the
  // urgent, high-value, AND 1996 order channels (q48 covers the 2-set
  // cohort), with survivor count and balance stats.
  // ---------------------------------------------------------------- //
  def q93_triple_intersect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def keys(d: DataFrame) = d.select(col("o_custkey")).distinct()
    val cohort = keys(o.filter(col("o_orderpriority") === "1-URGENT"))
      .intersect(keys(o.filter(col("o_totalprice") > 250000.0)))
      .intersect(keys(o.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))))
    cohort.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("n_cohort"), dsum(col("c_acctbal")).as("tot_bal"))
  }

  val q93_sql: String =
    """WITH cohort AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  INTERSECT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 250000.0
      |  INTERSECT
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |SELECT COUNT(*) AS n_cohort,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS tot_bal
      |FROM cohort JOIN customer ON o_custkey = c_custkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q94: DS q94-style time-grain accounting — orders bucketed by a
  // derived week index (epoch days div 7), per-week order count,
  // distinct active customers, and revenue for H1 1997.
  // ---------------------------------------------------------------- //
  def q94_weekly_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .withColumn("wk", (datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long") / 7L).cast("long"))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"),
        dsum(col("o_totalprice")).as("rev"))
      .orderBy(col("wk"))

  val q94_sql: String =
    """SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) // 7 AS wk,
      |  COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_cust,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |GROUP BY 1 ORDER BY wk""".stripMargin

  // ---------------------------------------------------------------- //
  // Catalog-prefixed variants: the chained EXCEPT and the three-way
  // INTERSECT planned over connector relations — multi-set operations
  // the catalog path hasn't been probed with.
  // ---------------------------------------------------------------- //
  private def q87CatSql(p: String): String =
    s"""SELECT COUNT(*) AS n_survivors FROM (
       |  SELECT DISTINCT o_custkey FROM ${p}orders WHERE o_orderpriority = '1-URGENT'
       |  EXCEPT
       |  SELECT DISTINCT o_custkey FROM ${p}orders WHERE o_totalprice > 400000.0
       |  EXCEPT
       |  SELECT DISTINCT o_custkey FROM ${p}orders
       |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')""".stripMargin

  private def q93CatSql(p: String): String =
    s"""WITH cohort AS (
       |  SELECT DISTINCT o_custkey FROM ${p}orders WHERE o_orderpriority = '1-URGENT'
       |  INTERSECT
       |  SELECT DISTINCT o_custkey FROM ${p}orders WHERE o_totalprice > 250000.0
       |  INTERSECT
       |  SELECT DISTINCT o_custkey FROM ${p}orders
       |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
       |SELECT COUNT(*) AS n_cohort,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS tot_bal
       |FROM cohort JOIN ${p}customer ON o_custkey = c_custkey""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q87_except_chain" -> ((q87_except_chain _, Some(q87_sql))),
    "q88_not_in" -> ((q88_not_in _, Some(q88_sql))),
    "q89_category_deviation" -> ((q89_category_deviation _, Some(q89_sql))),
    "q90_am_pm_ratio" -> ((q90_am_pm_ratio _, Some(q90_sql))),
    "q91_first_last" -> ((q91_first_last _, Some(q91_sql))),
    "q92_best_worst" -> ((q92_best_worst _, Some(q92_sql))),
    "q93_triple_intersect" -> ((q93_triple_intersect _, Some(q93_sql))),
    "q94_weekly_distinct" -> ((q94_weekly_distinct _, Some(q94_sql))),
    "c55_ds_cat_except_chain" -> ((ConnectorOps.viaCatalog(q87CatSql) _, Some(q87CatSql("")))),
    "c56_ds_cat_triple_intersect" -> ((ConnectorOps.viaCatalog(q93CatSql) _, Some(q93CatSql("")))),
  )
}
