package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS-style probe set (q40+): star-schema shapes that the TPC-H
  * suite (c18-c38) does not exercise — deep multi-grain rollups,
  * period-over-period self-joins of aggregates, full-outer merges of
  * per-channel aggregates, EXCEPT-based cohort differencing, and
  * ranking over a left join that must keep zero-activity dimension
  * rows. These run over the parquet fixtures directly (host-relational
  * q-series); the connector path is covered by the c-series.
  *
  * Exactness follows the house rules: decimal-accumulated float sums,
  * IEEE double ratios computed identically on both engines, explicit
  * NULLS FIRST ordering wherever rollup subtotals introduce NULLs, and
  * a total deterministic ORDER BY per query.
  */
object Tpcds {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q40: three-level rollup over a snowflaked dimension join
  // (region → nation → segment), subtotals at every grain.
  // ---------------------------------------------------------------- //
  def q40_deep_rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first,
        col("c_mktsegment").asc_nulls_first)

  val q40_sql: String =
    """SELECT r_name, n_name, c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST,
      |  c_mktsegment ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- //
  // q41: period-over-period comparison — monthly revenue 1997 joined
  // to the same month of 1996 (the TPC-DS Q2 web/catalog-ratio shape:
  // self-join of the same aggregate at two parameterizations).
  // ---------------------------------------------------------------- //
  def q41_yoy_monthly(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"),
        col("o_totalprice"))
      .groupBy(col("yr"), col("mo"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    monthly.filter(col("yr") === 1996).select(col("mo"), col("rev").as("rev_1996"))
      .join(monthly.filter(col("yr") === 1997).select(col("mo"), col("rev").as("rev_1997")),
        "mo")
      .withColumn("yoy", col("rev_1997") / col("rev_1996"))
      .orderBy(col("mo"))
  }

  val q41_sql: String =
    """WITH monthly AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
      |    CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1, 2)
      |SELECT a.mo AS mo, a.rev AS rev_1996, b.rev AS rev_1997,
      |  b.rev / a.rev AS yoy
      |FROM monthly a JOIN monthly b ON a.mo = b.mo
      |WHERE a.yr = 1996 AND b.yr = 1997
      |ORDER BY mo""".stripMargin

  // ---------------------------------------------------------------- //
  // q42: full-outer merge of per-channel aggregates — revenue per
  // brand in the returns channel vs the normal channel, brands missing
  // from either side kept with a zero (the TPC-DS Q33/Q56 cross-
  // channel union shape, expressed as the outer join it decays to).
  // ---------------------------------------------------------------- //
  def q42_channel_merge(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    def channel(flag: String, out: String) =
      li.filter(col("l_returnflag") === flag)
        .groupBy(col("p_brand")).agg(dsum(col("l_extendedprice")).as(out))
    channel("A", "rev_a")
      .join(channel("R", "rev_r"), Seq("p_brand"), "full_outer")
      .select(col("p_brand"),
        coalesce(col("rev_a"), lit(0.0)).as("rev_a"),
        coalesce(col("rev_r"), lit(0.0)).as("rev_r"))
      .withColumn("total", col("rev_a") + col("rev_r"))
      .orderBy(col("p_brand"))
  }

  val q42_sql: String =
    """WITH j AS (SELECT l_returnflag, p_brand, l_extendedprice
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |a AS (SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_a
      |      FROM j WHERE l_returnflag = 'A' GROUP BY p_brand),
      |r AS (SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_r
      |      FROM j WHERE l_returnflag = 'R' GROUP BY p_brand)
      |SELECT p_brand, COALESCE(rev_a, 0.0) AS rev_a, COALESCE(rev_r, 0.0) AS rev_r,
      |  COALESCE(rev_a, 0.0) + COALESCE(rev_r, 0.0) AS total
      |FROM a FULL OUTER JOIN r USING (p_brand)
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q43: cohort differencing with EXCEPT — customers active in H1-1997
  // but silent in H2-1997, counted per segment (the TPC-DS Q38/Q87
  // set-difference-of-behaviors shape).
  // ---------------------------------------------------------------- //
  def q43_present_absent(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    def active(lo: String, hi: String) = orders
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val lapsed = active("1997-01-01", "1997-07-01")
      .except(active("1997-07-01", "1998-01-01"))
    t(s, dir, "customer")
      .join(lapsed, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment").as("seg")).agg(count(lit(1)).as("n"))
      .orderBy(col("seg"))
  }

  val q43_sql: String =
    """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
      |WHERE c_custkey IN (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  EXCEPT
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------- //
  // q44: top-3 parts per type by 1997 revenue, where parts with NO
  // sales must survive the left join with a 0.0 and can rank for
  // sparse types (the TPC-DS Q44 best/worst-performers shape — the
  // outer-join-under-window corner a plain join would silently drop).
  // ---------------------------------------------------------------- //
  def q44_rank_zero_sales(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val sales = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"))
      // long-path revenue: lines-per-part is scale-invariant (~30 at
      // any SF), so the 2^63 group bound holds (DecimalFastFunctions)
      .agg(graft.functions.DecimalFastFunctions.sum_unscaled_revenue_double(
          col("l_extendedprice"), col("l_discount"))
        .cast("double").as("rev"))
    val w = Window.partitionBy(col("p_type"))
      .orderBy(desc("rev0"), asc("p_partkey"))
    t(s, dir, "part")
      .join(sales, col("p_partkey") === col("l_partkey"), "left_outer")
      .withColumn("rev0", coalesce(col("rev"), lit(0.0)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("p_type"), col("rk"), col("p_partkey"), col("rev0").as("rev"))
      .orderBy(col("p_type"), col("rk"))
  }

  val q44_sql: String =
    """WITH sales AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_partkey)
      |SELECT p_type, rk, p_partkey, rev FROM (
      |  SELECT p_type, p_partkey, COALESCE(rev, 0.0) AS rev,
      |    CAST(ROW_NUMBER() OVER (
      |      PARTITION BY p_type ORDER BY COALESCE(rev, 0.0) DESC, p_partkey) AS INT) AS rk
      |  FROM part LEFT OUTER JOIN sales ON p_partkey = l_partkey)
      |WHERE rk <= 3 ORDER BY p_type, rk""".stripMargin

  // ---------------------------------------------------------------- //
  // c43-c45: the same TPC-DS shapes run THROUGH the attached catalog
  // (the reference's tpcds.test analogue) — rollup-with-subtotals,
  // full-outer aggregate merge, and rank-over-outer-join planned by
  // Catalyst over connector relations instead of parquet. The SQL is
  // identical to the q-series oracle modulo the catalog prefix, so the
  // comparison isolates the connector path.
  // ---------------------------------------------------------------- //
  private def q40CatSql(p: String): String =
    s"""SELECT r_name, n_name, c_mktsegment, COUNT(*) AS n_cust,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
       |FROM ${p}customer JOIN ${p}nation ON c_nationkey = n_nationkey
       |JOIN ${p}region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST,
       |  c_mktsegment ASC NULLS FIRST""".stripMargin

  private def q42CatSql(p: String): String =
    s"""WITH j AS (SELECT l_returnflag, p_brand, l_extendedprice
       |           FROM ${p}lineitem JOIN ${p}part ON l_partkey = p_partkey),
       |a AS (SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_a
       |      FROM j WHERE l_returnflag = 'A' GROUP BY p_brand),
       |r AS (SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_r
       |      FROM j WHERE l_returnflag = 'R' GROUP BY p_brand)
       |SELECT p_brand, COALESCE(rev_a, 0.0) AS rev_a, COALESCE(rev_r, 0.0) AS rev_r,
       |  COALESCE(rev_a, 0.0) + COALESCE(rev_r, 0.0) AS total
       |FROM a FULL OUTER JOIN r USING (p_brand)
       |ORDER BY p_brand""".stripMargin

  private def q44CatSql(p: String): String =
    s"""WITH sales AS (
       |  SELECT l_partkey,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
       |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
       |  FROM ${p}lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY l_partkey)
       |SELECT p_type, rk, p_partkey, rev FROM (
       |  SELECT p_type, p_partkey, COALESCE(rev, 0.0) AS rev,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY p_type ORDER BY COALESCE(rev, 0.0) DESC, p_partkey) AS INT) AS rk
       |  FROM ${p}part LEFT OUTER JOIN sales ON p_partkey = l_partkey)
       |WHERE rk <= 3 ORDER BY p_type, rk""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q40_deep_rollup" -> ((q40_deep_rollup _, Some(q40_sql))),
    "q41_yoy_monthly" -> ((q41_yoy_monthly _, Some(q41_sql))),
    "q42_channel_merge" -> ((q42_channel_merge _, Some(q42_sql))),
    "q43_present_absent" -> ((q43_present_absent _, Some(q43_sql))),
    "q44_rank_zero_sales" -> ((q44_rank_zero_sales _, Some(q44_sql))),
    "c43_ds_cat_rollup" -> ((ConnectorOps.viaCatalog(q40CatSql) _, Some(q40CatSql("")))),
    "c44_ds_cat_channel" -> ((ConnectorOps.viaCatalog(q42CatSql) _, Some(q42CatSql("")))),
    "c45_ds_cat_rank" -> ((ConnectorOps.viaCatalog(q44CatSql) _, Some(q44CatSql("")))),
  )
}
