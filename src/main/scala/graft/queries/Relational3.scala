package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Host-relational extension set (x01-x04): subquery decorrelation
  * classes the q-series doesn't cover — row-value (multi-column) IN
  * membership, correlated EXISTS/NOT EXISTS whose residual is a range
  * predicate over both relations, and correlated scalar aggregates in
  * the PROJECTION (not the WHERE). The reference's host engine
  * supports all of these over attached data (ref: test/sql/scanner/
  * tpch.test:12-28 exercises the same decorrelation machinery via
  * Q17/Q20/Q21).
  *
  * Exactness per house rules: decimal sums, COALESCE'd scalar
  * fallbacks identical on both sides, deterministic total ORDER BY.
  */
object Relational3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // x01: row-value IN — orders whose (customer, month) pair appears in
  // the high-value-order pair set; per-priority stats. The DataFrame
  // side is the composite-key semi join the row-value IN decorrelates
  // to; the oracle exercises DuckDB's row-value IN surface.
  // ---------------------------------------------------------------- //
  def x01_multi_col_in(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").withColumn("mo", month(col("o_orderdate")))
    val pairs = o.filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("pk"), col("mo").as("pm")).distinct()
    o.join(pairs, col("o_custkey") === col("pk") && col("mo") === col("pm"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
      .orderBy(col("o_orderpriority"))
  }

  val x01_sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM orders
      |WHERE ROW(o_custkey, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT)) IN (
      |  SELECT ROW(o_custkey, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT))
      |  FROM orders WHERE o_totalprice > 400000.0)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- //
  // x02: correlated EXISTS with a range residual — orders having at
  // least one line shipped more than 90 days after the order date
  // (equality correlation + cross-relation date arithmetic residual).
  // ---------------------------------------------------------------- //
  def x02_exists_range(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"), 90),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"), dsum(col("o_totalprice")).as("rev"))
      .orderBy(col("o_orderpriority"))
  }

  val x02_sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_late,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- //
  // x03: the NOT EXISTS twin — orders where NO line shipped more than
  // 90 days late (anti join with the same range residual).
  // ---------------------------------------------------------------- //
  def x03_not_exists_range(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"), 90),
        "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_on_time"), dsum(col("o_totalprice")).as("rev"))
      .orderBy(col("o_orderpriority"))
  }

  val x03_sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_on_time,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- //
  // x04: correlated scalar aggregates in the PROJECTION — each
  // customer's order count and total spend as correlated scalars in
  // the select list (not the WHERE), zero-defaulted for customers
  // with no orders. Decorrelates to a left outer join against the
  // per-customer aggregate.
  // ---------------------------------------------------------------- //
  def x04_scalar_in_select(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val agg = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      // long-path dsum: orders-per-customer is scale-invariant (~10),
      // under the 2^63 group bound (DecimalFastFunctions contract)
      .agg(count(lit(1)).as("cnt"), graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("o_totalprice")).as("spend0"))
    t(s, dir, "customer")
      .join(agg, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("spend0"), lit(0.0)).as("spend"))
      .orderBy(col("c_custkey"))
  }

  val x04_sql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      |  COALESCE((SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |            FROM orders WHERE o_custkey = c_custkey), 0.0) AS spend
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- //
  // x05: the COUNT-bug decorrelation class — a correlated COUNT(*) in
  // the WHERE clause, where groups with ZERO matches must satisfy
  // `count < k` and survive. A naive inner-join decorrelation silently
  // drops the zero-count outer rows (23 of 25 nations at sf0.01); the
  // correct plan is a left outer join against the aggregate with the
  // count zero-defaulted BEFORE the filter, which is exactly how the
  // DataFrame side states it.
  // ---------------------------------------------------------------- //
  def x05_count_bug_where(s: SparkSession, dir: String): DataFrame = {
    val rich = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9990.0)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"))
    t(s, dir, "nation")
      .join(rich, col("n_nationkey") === col("c_nationkey"), "left_outer")
      .withColumn("n_rich", coalesce(col("cnt"), lit(0L)))
      .filter(col("n_rich") < 3)
      .select(col("n_name"), col("n_rich"))
      .orderBy(col("n_name"))
  }

  val x05_sql: String =
    """SELECT n_name,
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_nationkey = n_nationkey AND c_acctbal > 9990.0) AS n_rich
      |FROM nation
      |WHERE (SELECT COUNT(*) FROM customer
      |       WHERE c_nationkey = n_nationkey AND c_acctbal > 9990.0) < 3
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- //
  // x06: the COUNT-bug in the PROJECTION, with the two empty-group
  // defaults side by side — a correlated COUNT(*) must surface 0 for
  // nations with no qualifying supplier while the correlated SUM in
  // the same select list must surface NULL. A naive inner-join
  // decorrelation gets both wrong (drops the rows); a blanket
  // zero-default gets the SUM wrong. Left-outer + coalesce ONLY the
  // count states it correctly.
  // ---------------------------------------------------------------- //
  def x06_count_bug_select(s: SparkSession, dir: String): DataFrame = {
    val top = t(s, dir, "supplier")
      .filter(col("s_acctbal") > 9900.0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("s_acctbal")).as("bal"))
    t(s, dir, "nation")
      .join(top, col("n_nationkey") === col("s_nationkey"), "left_outer")
      .select(col("n_name"),
        coalesce(col("cnt"), lit(0L)).as("n_top"),
        col("bal").as("top_bal"))
      .orderBy(col("n_name"))
  }

  val x06_sql: String =
    """SELECT n_name,
      |  (SELECT COUNT(*) FROM supplier
      |   WHERE s_nationkey = n_nationkey AND s_acctbal > 9900.0) AS n_top,
      |  (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM supplier
      |   WHERE s_nationkey = n_nationkey AND s_acctbal > 9900.0) AS top_bal
      |FROM nation
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- //
  // x05b/x06b: the SAME correlated SQL text as x05/x06, but run
  // verbatim through spark.sql() over temp views of the parquet
  // tables — so CATALYST'S OWN decorrelator (RewriteCorrelatedScalar-
  // Subquery and its empty-group COUNT(*) default handling) sits
  // under the DuckDB oracle, not the hand-written left-outer rewrite
  // above. This is the class where engines historically get the
  // zero-match default wrong (the "COUNT bug", Kim 1982).
  // ---------------------------------------------------------------- //
  private def sqlOverViews(tables: Seq[String], sql: String)(
      s: SparkSession, dir: String): DataFrame = {
    tables.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  def x05b_count_bug_sql(s: SparkSession, dir: String): DataFrame =
    sqlOverViews(Seq("nation", "customer"), x05_sql)(s, dir)

  def x06b_count_bug_sql(s: SparkSession, dir: String): DataFrame =
    sqlOverViews(Seq("nation", "supplier"), x06_sql)(s, dir)

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "x01_multi_col_in" -> ((x01_multi_col_in _, Some(x01_sql))),
    "x02_exists_range" -> ((x02_exists_range _, Some(x02_sql))),
    "x03_not_exists_range" -> ((x03_not_exists_range _, Some(x03_sql))),
    "x04_scalar_in_select" -> ((x04_scalar_in_select _, Some(x04_sql))),
    "x05_count_bug_where" -> ((x05_count_bug_where _, Some(x05_sql))),
    "x06_count_bug_select" -> ((x06_count_bug_select _, Some(x06_sql))),
    "x05b_count_bug_sql" -> ((x05b_count_bug_sql _, Some(x05_sql))),
    "x06b_count_bug_sql" -> ((x06b_count_bug_sql _, Some(x06_sql))),
  )
}
