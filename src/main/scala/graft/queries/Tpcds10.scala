package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-path TPC-DS variants, fourth batch (c61-c64): the same SQL
  * text runs through the attached Postgres catalog on the Spark side
  * (connector scans + pushdown under a Catalyst plan) and over parquet
  * views in the DuckDB oracle — mirroring how the reference's
  * acceptance suite runs every DS query over attached Postgres
  * (ref: test/sql/scanner/tpcds.test:23-67). These four extend the
  * connector-path coverage to plan classes the c51-c60 set lacks:
  * centered moving-average windows with a named WINDOW clause,
  * dual-direction rank unions, consecutive-period retention
  * self-joins, and IN-list x subquery double gates.
  */
object Tpcds10 {

  private def q59Tpl(p: String): String =
    s"""WITH monthly AS (
       |  SELECT l_returnflag AS flag, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |  FROM ${p}lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY 1, 2),
       |win AS (
       |  SELECT flag, mo, rev,
       |    CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER w AS DOUBLE) /
       |      COUNT(*) OVER w AS avg3
       |  FROM monthly
       |  WINDOW w AS (PARTITION BY flag ORDER BY mo
       |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING))
       |SELECT flag, mo, rev, avg3, rev / avg3 AS dev FROM win
       |WHERE rev / avg3 > 1.1 OR rev / avg3 < 0.9
       |ORDER BY flag, mo""".stripMargin

  private def q92Tpl(p: String): String =
    s"""WITH rev AS (
       |  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |  FROM ${p}lineitem JOIN ${p}part ON l_partkey = p_partkey GROUP BY p_brand)
       |SELECT side, rk, p_brand, rev FROM (
       |  SELECT 'best' AS side,
       |    CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, p_brand) AS INT) AS rk,
       |    p_brand, rev FROM rev
       |  UNION ALL
       |  SELECT 'worst' AS side,
       |    CAST(ROW_NUMBER() OVER (ORDER BY rev ASC, p_brand) AS INT) AS rk,
       |    p_brand, rev FROM rev) u
       |WHERE rk <= 3 ORDER BY side, rk""".stripMargin

  private def q95Tpl(p: String): String =
    s"""WITH act AS (
       |  SELECT DISTINCT o_custkey, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo
       |  FROM ${p}orders
       |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
       |SELECT a.mo AS mo, COUNT(*) AS n_active, COUNT(p.o_custkey) AS n_retained,
       |  CAST(COUNT(p.o_custkey) AS DOUBLE) / COUNT(*) AS retention
       |FROM act a LEFT JOIN act p
       |  ON a.o_custkey = p.o_custkey AND a.mo = p.mo + 1
       |GROUP BY a.mo ORDER BY a.mo""".stripMargin

  private def q108Tpl(p: String): String =
    s"""SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
       |  COUNT(*) AS n_lines
       |FROM ${p}lineitem
       |JOIN ${p}supplier ON l_suppkey = s_suppkey
       |JOIN ${p}orders ON l_orderkey = o_orderkey
       |WHERE s_nationkey IN (SELECT n_nationkey FROM ${p}nation
       |    WHERE n_name IN ('NATION_3','NATION_7','NATION_12','NATION_18'))
       |  AND o_custkey IN (SELECT c_custkey FROM ${p}customer
       |    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
       |      AS DOUBLE) / COUNT(*) FROM ${p}customer))
       |GROUP BY 1 ORDER BY mo""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "c61_ds_cat_moving_avg" -> ((ConnectorOps.viaCatalog(q59Tpl) _, Some(q59Tpl("")))),
    "c62_ds_cat_best_worst" -> ((ConnectorOps.viaCatalog(q92Tpl) _, Some(q92Tpl("")))),
    "c63_ds_cat_retention" -> ((ConnectorOps.viaCatalog(q95Tpl) _, Some(q95Tpl("")))),
    "c64_ds_cat_double_gate" -> ((ConnectorOps.viaCatalog(q108Tpl) _, Some(q108Tpl("")))),
  )
}
