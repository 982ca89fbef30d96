package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, fourth wave (q65-q70) — last uncovered plan
  * classes from the reference's corpus (ref: test/sql/scanner/
  * tpcds.test:23-67):
  *
  *  - NTILE decile segmentation over an aggregate (DS q1-style
  *    customer scoring)
  *  - week-over-week full-outer self-join on a derived date grain
  *    (DS q2)
  *  - HAVING applied to ROLLUP subtotal rows via GROUPING (the
  *    grouping-aware-HAVING corner)
  *  - PERCENT_RANK thresholds (DS q49-style worst-performer cuts)
  *  - top-per-group selected by window, then re-joined to detail
  *    rows (DS q45-style "best item's transactions")
  *  - union of different aggregation grains aligned by NULL padding
  *    (DS q66 report shape)
  *
  * Exactness per house rules: decimal-accumulated sums, identical
  * double expressions both sides, ROW_NUMBER/NTILE cast to INT,
  * explicit NULLS ordering where subtotal rows introduce NULLs,
  * deterministic total ORDER BY.
  */
object Tpcds4 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q65: DS q1-style decile segmentation — customers scored by total
  // spend, cut into NTILE(10) deciles (spend desc, key tie-break),
  // per-decile count + decimal spend totals.
  // ---------------------------------------------------------------- //
  def q65_spend_deciles(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      // long-path dsum: orders-per-customer is scale-invariant (~10),
      // under the 2^63 group bound (DecimalFastFunctions contract);
      // the decile re-sum below runs over per-customer partials
      // (dim-scale) on the decimal path
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("o_totalprice")).as("spend"))
    spend
      .withColumn("decile", ntile(10).over(
        Window.orderBy(desc("spend"), col("o_custkey"))).cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec(col("spend"))).cast("double").as("decile_spend"))
      .orderBy(col("decile"))
  }

  val q65_sql: String =
    """WITH spend AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey)
      |SELECT decile, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS decile_spend
      |FROM (SELECT spend, CAST(NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS INT) AS decile
      |      FROM spend)
      |GROUP BY decile ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- //
  // q66: DS q2-style week-over-week — weekly 1997 revenue self-joined
  // to the FOLLOWING week on a derived week index (full outer keeps
  // boundary weeks), ratio of consecutive weeks.
  // ---------------------------------------------------------------- //
  def q66_week_over_week(s: SparkSession, dir: String): DataFrame = {
    val weekly = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .withColumn("wk", floor(datediff(col("o_orderdate"),
        lit("1997-01-01").cast("timestamp")) / 7).cast("int"))
      .groupBy(col("wk"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    weekly.select(col("wk"), col("rev").as("rev_this"))
      .join(weekly.select((col("wk") - 1).as("wk"), col("rev").as("rev_next")),
        Seq("wk"), "full_outer")
      .select(col("wk"),
        coalesce(col("rev_this"), lit(0.0)).as("rev_this"),
        coalesce(col("rev_next"), lit(0.0)).as("rev_next"))
      .withColumn("wow",
        when(col("rev_this") > 0.0, col("rev_next") / col("rev_this")))
      .orderBy(col("wk"))
  }

  val q66_sql: String =
    """WITH weekly AS (
      |  SELECT CAST(FLOOR(date_diff('day', TIMESTAMP '1997-01-01 00:00:00',
      |      o_orderdate) / 7) AS INT) AS wk,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1)
      |SELECT COALESCE(a.wk, b.wk) AS wk,
      |  COALESCE(a.rev, 0.0) AS rev_this, COALESCE(b.rev, 0.0) AS rev_next,
      |  CASE WHEN COALESCE(a.rev, 0.0) > 0.0
      |    THEN COALESCE(b.rev, 0.0) / COALESCE(a.rev, 0.0) END AS wow
      |FROM weekly a FULL OUTER JOIN (SELECT wk - 1 AS wk, rev FROM weekly) b
      |  ON a.wk = b.wk
      |ORDER BY wk""".stripMargin

  // ---------------------------------------------------------------- //
  // q67: grouping-aware HAVING — rollup over (region, nation) customer
  // balances, keeping ONLY subtotal rows (nation- and region-level)
  // above a floor; leaf rows are excluded BY the grouping predicate,
  // not by value.
  // ---------------------------------------------------------------- //
  def q67_subtotal_having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("total_bal"),
        grouping(col("n_name")).cast("int").as("g_n"))
      .filter(col("g_n") === 1 && col("total_bal") > 100000.0)
      .select(col("r_name"), col("n_name"), col("total_bal"), col("g_n"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  val q67_sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |  CAST(GROUPING(n_name) AS INT) AS g_n
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |HAVING CAST(GROUPING(n_name) AS INT) = 1
      |  AND CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) > 100000.0
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- //
  // q68: DS q49-style PERCENT_RANK cut — parts in the bottom 5% by
  // revenue within their type (worst performers), deterministic
  // tie-breaks on the rank ordering and output.
  // ---------------------------------------------------------------- //
  /** AGGREGATE-BEFORE-JOIN: grouping the fact by l_partkey alone and
    * attaching p_type afterwards is result-identical (p_partkey is
    * part's key, so it functionally determines p_type and the inner
    * join drops the same unmatched keys either way) but replaces the
    * naive plan's TWO data-sized exchanges — the 60M-row join shuffle
    * plus the post-join (p_type, p_partkey) agg shuffle carrying the
    * type string — with ONE narrow (l_partkey, partial decimal sum)
    * exchange; the agg output's partitioning then serves the part join
    * with no re-shuffle. At 100 TB this is the difference between
    * shuffling the fact twice at full width and once at 16 bytes/row. */
  def q68_percent_rank(s: SparkSession, dir: String): DataFrame =
    q68Shape(t(s, dir, "lineitem"), t(s, dir, "part"))

  /** The revenue sum runs through a primitive-long accumulator
    * ([[graft.functions.DecimalFastFunctions]]): sum(DECIMAL(18,2))
    * widens to DECIMAL(28,2), past Spark's compact range, so the
    * plain dsum pays a BigDecimal add per fact row — the R14Lab sf10
    * decomposition measured that as the whole query wall (agg 49 s+
    * under GC amplification vs 1.05 s unscaled; full query 1.24 s vs
    * 2.37 s best-case). r15 closes the scan side too: the unscaled
    * long comes from `unscaled_of_double` (3 primitive flops) rather
    * than `unscaled_value(CAST(double AS DECIMAL))`, whose cast
    * allocates two BigDecimals per row — jstack caught that cast as
    * the whole remaining agg wall at sf10. Exactness bound (owned
    * here): per-partkey Σ|unscaled(l_extendedprice)| < 2^63 ⇔
    * per-part revenue < 9.2e16 — lineitems-per-part is a
    * scale-invariant TPC-H constant (~30) and prices are < 1e6, so
    * the bound holds by ~9 orders at any SF; the clean-2-decimal
    * input contract is the oracle's own (see unscaled_of_double). */
  private[queries] def q68Shape(lineitem: DataFrame, part: DataFrame): DataFrame = {
    graft.functions.DecimalFastFunctions.register(lineitem.sparkSession)
    val rev = lineitem
      .groupBy(col("l_partkey"))
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("l_extendedprice")).as("rev"))
      .join(part, col("l_partkey") === col("p_partkey"))
    rev.withColumn("pr", percent_rank().over(
        Window.partitionBy(col("p_type")).orderBy(col("rev"), col("p_partkey"))))
      .filter(col("pr") <= 0.05)
      .select(col("p_type"), col("p_partkey"), col("rev"), round(col("pr"), 6).as("pr"))
      .orderBy(col("p_type"), col("p_partkey"))
  }

  val q68_sql: String =
    """SELECT p_type, p_partkey, rev, round(pr, 6) AS pr FROM (
      |  SELECT p_type, p_partkey, rev,
      |    PERCENT_RANK() OVER (PARTITION BY p_type ORDER BY rev, p_partkey) AS pr
      |  FROM (SELECT p_type, p_partkey,
      |          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |        FROM lineitem JOIN part ON l_partkey = p_partkey
      |        GROUP BY p_type, p_partkey))
      |WHERE pr <= 0.05
      |ORDER BY p_type, p_partkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q69: DS q45-style top-per-group re-joined to detail — each
  // nation's single top customer by balance (window pick), then that
  // customer's individual orders pulled back from the fact table.
  // ---------------------------------------------------------------- //
  def q69_top_customer_orders(s: SparkSession, dir: String): DataFrame = {
    val top = t(s, dir, "customer")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("c_nationkey"))
          .orderBy(desc("c_acctbal"), col("c_custkey"))).cast("int"))
      .filter(col("rk") === 1)
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"))
    top.join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("top_rev"))
      .orderBy(col("c_nationkey"))
  }

  val q69_sql: String =
    """WITH top AS (
      |  SELECT c_nationkey, c_custkey, c_name FROM (
      |    SELECT c_nationkey, c_custkey, c_name,
      |      CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |        ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rk
      |    FROM customer)
      |  WHERE rk = 1)
      |SELECT c_nationkey, c_custkey, c_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS top_rev
      |FROM top JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_nationkey, c_custkey, c_name
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q70: mixed-grain union report — per-segment totals UNION ALL the
  // grand total as a NULL-padded row (the DS q66 report tail), one
  // relation feeding both grains.
  // ---------------------------------------------------------------- //
  def q70_grain_union(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
    val total = base.agg(
      sum(col("n")).as("n"), sum(dec(col("bal"))).cast("double").as("bal"))
      .select(lit(null).cast("string").as("seg"), col("n"), col("bal"))
    base.select(col("seg"), col("n"), col("bal")).union(total)
      .orderBy(col("seg").asc_nulls_last)
  }

  val q70_sql: String =
    """WITH base AS (
      |  SELECT c_mktsegment AS seg, COUNT(*) AS n,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |  FROM customer GROUP BY c_mktsegment)
      |SELECT seg, n, bal FROM base
      |UNION ALL
      |SELECT CAST(NULL AS VARCHAR) AS seg, CAST(SUM(n) AS BIGINT) AS n,
      |  CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM base
      |ORDER BY seg ASC NULLS LAST""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q65_spend_deciles" -> ((q65_spend_deciles _, Some(q65_sql))),
    "q66_week_over_week" -> ((q66_week_over_week _, Some(q66_sql))),
    "q67_subtotal_having" -> ((q67_subtotal_having _, Some(q67_sql))),
    "q68_percent_rank" -> ((q68_percent_rank _, Some(q68_sql))),
    "q69_top_customer_orders" -> ((q69_top_customer_orders _, Some(q69_sql))),
    "q70_grain_union" -> ((q70_grain_union _, Some(q70_sql))),
  )
}
