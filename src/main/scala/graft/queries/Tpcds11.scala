package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Catalog-path TPC-DS variants, fifth batch (c65-c69): PERCENT_RANK
  * cuts, correlated EXISTS chains over two fact relations, null-aware
  * NOT IN anti-joins, NTILE decile segmentation, and net-of-returns
  * left-join accounting — all through the attached Postgres catalog
  * (ref: test/sql/scanner/tpcds.test:23-67 runs the full corpus that
  * way). Templates restricted to the Spark-SQL ∩ DuckDB dialect
  * subset (the date_diff-based shapes stay parquet-only: the two
  * engines disagree on the function's name/signature).
  */
object Tpcds11 {

  private def q68Tpl(p: String): String =
    s"""SELECT p_type, p_partkey, rev, round(pr, 6) AS pr FROM (
       |  SELECT p_type, p_partkey, rev,
       |    PERCENT_RANK() OVER (PARTITION BY p_type ORDER BY rev, p_partkey) AS pr
       |  FROM (SELECT p_type, p_partkey,
       |          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |        FROM ${p}lineitem JOIN ${p}part ON l_partkey = p_partkey
       |        GROUP BY p_type, p_partkey) a) b
       |WHERE pr <= 0.05
       |ORDER BY p_type, p_partkey""".stripMargin

  private def q58Tpl(p: String): String =
    s"""SELECT c_mktsegment AS seg, COUNT(*) AS n FROM ${p}customer c
       |WHERE EXISTS (
       |  SELECT 1 FROM ${p}orders o WHERE o.o_custkey = c.c_custkey
       |    AND o.o_orderpriority = '1-URGENT')
       |AND EXISTS (
       |  SELECT 1 FROM ${p}orders o JOIN ${p}lineitem l ON o.o_orderkey = l.l_orderkey
       |  WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
       |GROUP BY c_mktsegment ORDER BY seg""".stripMargin

  private def q88Tpl(p: String): String =
    s"""SELECT p_brand, COUNT(*) AS n_parts
       |FROM ${p}part
       |WHERE p_partkey NOT IN (SELECT l_partkey FROM ${p}lineitem
       |  WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  private def q65Tpl(p: String): String =
    s"""WITH spend AS (
       |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
       |  FROM ${p}orders GROUP BY o_custkey)
       |SELECT decile, COUNT(*) AS n_cust,
       |  CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS decile_spend
       |FROM (SELECT spend, CAST(NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS INT) AS decile
       |      FROM spend) d
       |GROUP BY decile ORDER BY decile""".stripMargin

  private def q80Tpl(p: String): String =
    s"""WITH ret AS (
       |  SELECT l_orderkey AS r_ok, l_linenumber AS r_ln, l_quantity AS r_qty
       |  FROM ${p}lineitem WHERE l_returnflag = 'R')
       |SELECT o_custkey, COUNT(*) AS n_lines,
       |  CAST(SUM(CAST(l_quantity - COALESCE(r_qty, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS net_qty
       |FROM ${p}lineitem LEFT JOIN ret ON l_orderkey = r_ok AND l_linenumber = r_ln
       |JOIN ${p}orders ON l_orderkey = o_orderkey
       |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** c69 runs q80's TUNED plan through the catalog rather than the raw
    * SQL template: Catalyst's default plan for the template sort-merge
    * joins the two fact sides on the composite (l_orderkey,
    * l_linenumber) key — two full-fact exchanges plus two full-fact
    * sorts the parquet twin eliminated in round 10 (subset-key
    * repartition on l_orderkey serves both the self-join and the
    * downstream orders join; shuffle-hash skips the sorts; see
    * Tpcds5.q80_net_returns). The r12 "writeback weather" on this entry
    * (43-181 s sf10 swings) was dominated by exactly those extra
    * 120M-row spilling exchanges — a plan property of the catalog
    * variant, not the box. Oracle SQL is the unchanged q80 template. */
  private def c69_net_returns(s: SparkSession, dir: String): DataFrame = {
    ConnectorOps.ensureTpchSeeded(s, dir)
    val cat = ConnectorOps.catalogFor(s, dir)
    Tpcds5.q80Shape(
      () => s.table(s"$cat.public.lineitem"), s.table(s"$cat.public.orders"))
  }

  /** c65 = q68's aggregate-before-join shape over catalog tables (see
    * Tpcds4.q68Shape — one narrow l_partkey exchange instead of the
    * template plan's two data-sized ones); oracle SQL unchanged. */
  private def c65_percent_rank(s: SparkSession, dir: String): DataFrame = {
    ConnectorOps.ensureTpchSeeded(s, dir)
    val cat = ConnectorOps.catalogFor(s, dir)
    Tpcds4.q68Shape(
      s.table(s"$cat.public.lineitem"), s.table(s"$cat.public.part"))
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "c65_ds_cat_percent_rank" -> ((c65_percent_rank _, Some(q68Tpl("")))),
    "c66_ds_cat_exists_chain" -> ((ConnectorOps.viaCatalog(q58Tpl) _, Some(q58Tpl("")))),
    "c67_ds_cat_not_in" -> ((ConnectorOps.viaCatalog(q88Tpl) _, Some(q88Tpl("")))),
    "c68_ds_cat_deciles" -> ((ConnectorOps.viaCatalog(q65Tpl) _, Some(q65Tpl("")))),
    "c69_ds_cat_net_returns" -> ((c69_net_returns _, Some(q80Tpl("")))),
  )
}
