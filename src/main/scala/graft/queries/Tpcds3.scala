package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, third wave (q57-q64) — remaining plan classes
  * from the reference's 97-query corpus (ref: test/sql/scanner/
  * tpcds.test:23-67), adapted to the testdata schema:
  *
  *  - correlated scalar subqueries in WHERE (DS q6: rows compared
  *    against their group's aggregate)
  *  - correlated EXISTS chains over two fact tables (DS q10)
  *  - centered moving-average deviation windows (DS q47)
  *  - count-bucket cohorts: HAVING on a per-entity count, re-counted
  *    per customer (DS q34/q73)
  *  - in-pass ratio of a CASE-gated aggregate to the total (DS q61)
  *  - day-difference latency buckets (DS q62)
  *  - rank movement between two periods (DS q89-style)
  *  - scalar-subquery threshold in HAVING (DS q23 phase 1)
  *
  * Exactness per house rules: decimal-accumulated sums, identical
  * double expressions both sides, deterministic total ORDER BY.
  */
object Tpcds3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q57: DS q6-style correlated scalar subquery — customers whose
  // balance exceeds 1.2× their own nation's average balance, counted
  // per nation. (Catalyst decorrelates to the same agg+join both
  // engines plan; the SQL stays correlated like the reference's.)
  // ---------------------------------------------------------------- //
  def q57_above_nation_avg(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val natAvg = cust.groupBy(col("c_nationkey"))
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    cust.join(natAvg, "c_nationkey")
      .filter(col("c_acctbal") > lit(1.2) * col("avg_bal"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_rich"), dsum(col("c_acctbal")).as("rich_bal"))
      .orderBy(col("n_name"))
  }

  val q57_sql: String =
    """SELECT n_name, COUNT(*) AS n_rich,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS rich_bal
      |FROM customer c JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 1.2 * (
      |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- //
  // q58: DS q10-style correlated EXISTS chain — customers with BOTH an
  // urgent order AND a returned lineitem on any of their orders,
  // counted per segment (two correlated existentials over two facts).
  // ---------------------------------------------------------------- //
  def q58_exists_chain(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val returnedCust = orders.join(
        t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey")).distinct()
    t(s, dir, "customer")
      .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_semi")
      .join(returnedCust, col("c_custkey") === returnedCust("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("seg"))
  }

  val q58_sql: String =
    """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderpriority = '1-URGENT')
      |AND EXISTS (
      |  SELECT 1 FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
      |GROUP BY c_mktsegment ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------- //
  // q59: DS q47-style moving-average deviation — monthly 1997 revenue
  // per return flag, flag months where revenue deviates >10% from the
  // centered 3-month average (lag/lead window frame).
  // ---------------------------------------------------------------- //
  def q59_moving_avg(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag").as("flag"), month(col("l_shipdate")).as("mo"))
      .agg(dsum(col("l_extendedprice")).as("rev"))
    val w = Window.partitionBy(col("flag")).orderBy(col("mo"))
      .rowsBetween(-1, 1)
    monthly
      .withColumn("avg3",
        (sum(dec(col("rev"))).over(w).cast("double") / count(lit(1)).over(w)))
      .withColumn("dev", col("rev") / col("avg3"))
      .filter(col("dev") > 1.1 || col("dev") < 0.9)
      .select(col("flag"), col("mo"), col("rev"), col("avg3"), col("dev"))
      .orderBy(col("flag"), col("mo"))
  }

  val q59_sql: String =
    """WITH monthly AS (
      |  SELECT l_returnflag AS flag, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem
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

  // ---------------------------------------------------------------- //
  // q60: DS q34/q73-style count-bucket cohort — orders with 5-7 line
  // items, then customers holding at least two such orders.
  // ---------------------------------------------------------------- //
  def q60_count_buckets(s: SparkSession, dir: String): DataFrame = {
    val mid = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") >= 5 && col("n_items") <= 7)
    t(s, dir, "orders")
      .join(mid, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_mid_orders"))
      .filter(col("n_mid_orders") >= 2)
      .orderBy(desc("n_mid_orders"), col("o_custkey"))
      .limit(50)
  }

  val q60_sql: String =
    """WITH mid AS (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 5 AND 7)
      |SELECT o_custkey, COUNT(*) AS n_mid_orders
      |FROM orders JOIN mid ON o_orderkey = l_orderkey
      |GROUP BY o_custkey HAVING COUNT(*) >= 2
      |ORDER BY n_mid_orders DESC, o_custkey LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- //
  // q61: DS q61-style promotional ratio — revenue from one brand
  // family over total revenue, per month, both measures in ONE pass
  // (CASE-gated aggregate divided by the plain aggregate).
  // ---------------------------------------------------------------- //
  def q61_promo_ratio(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(month(col("l_shipdate")).as("mo"))
      .agg(
        coalesce(sum(when(col("p_brand").startsWith("Brand#1"),
          dec(col("l_extendedprice")))).cast("double"), lit(0.0)).as("promo_rev"),
        dsum(col("l_extendedprice")).as("total_rev"))
      .withColumn("ratio", col("promo_rev") / col("total_rev"))
      .orderBy(col("mo"))

  val q61_sql: String =
    """SELECT CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
      |  COALESCE(CAST(SUM(CASE WHEN p_brand LIKE 'Brand#1%'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS promo_rev,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
      |  COALESCE(CAST(SUM(CASE WHEN p_brand LIKE 'Brand#1%'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) /
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ratio
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY mo""".stripMargin

  // ---------------------------------------------------------------- //
  // q62: DS q62-style latency buckets — order→ship day difference
  // bucketed into bands, counted per order priority in one pass.
  // ---------------------------------------------------------------- //
  def q62_latency_buckets(s: SparkSession, dir: String): DataFrame = {
    val lat = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("days", datediff(col("l_shipdate"), col("o_orderdate")))
    lat.groupBy(col("o_orderpriority").as("prio"))
      .agg(
        count(when(col("days") <= 30, 1)).as("d30"),
        count(when(col("days") > 30 && col("days") <= 60, 1)).as("d60"),
        count(when(col("days") > 60 && col("days") <= 90, 1)).as("d90"),
        count(when(col("days") > 90, 1)).as("d90plus"),
        count(lit(1)).as("total"))
      .orderBy(col("prio"))
  }

  val q62_sql: String =
    """SELECT o_orderpriority AS prio,
      |  COUNT(CASE WHEN days <= 30 THEN 1 END) AS d30,
      |  COUNT(CASE WHEN days > 30 AND days <= 60 THEN 1 END) AS d60,
      |  COUNT(CASE WHEN days > 60 AND days <= 90 THEN 1 END) AS d90,
      |  COUNT(CASE WHEN days > 90 THEN 1 END) AS d90plus,
      |  COUNT(*) AS total
      |FROM (SELECT o_orderpriority,
      |        CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS days
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |GROUP BY prio ORDER BY prio""".stripMargin

  // ---------------------------------------------------------------- //
  // q63: DS q89-style rank movement — brand revenue rank in H1-1997 vs
  // H2-1997, report brands whose rank moved by 3+ places.
  // ---------------------------------------------------------------- //
  def q63_rank_movement(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    def ranked(lo: String, hi: String, out: String) = li
      .filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
        col("l_shipdate") < lit(hi).cast("timestamp"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("rev"))
      .withColumn(out, row_number().over(
        Window.orderBy(desc("rev"), col("p_brand"))).cast("int"))
      .select(col("p_brand"), col(out))
    ranked("1997-01-01", "1997-07-01", "rk_h1")
      .join(ranked("1997-07-01", "1998-01-01", "rk_h2"), "p_brand")
      .withColumn("moved", abs(col("rk_h1") - col("rk_h2")))
      .filter(col("moved") >= 3)
      .orderBy(desc("moved"), col("p_brand"))
  }

  val q63_sql: String =
    """WITH h1 AS (
      |  SELECT p_brand, CAST(ROW_NUMBER() OVER (ORDER BY
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) DESC, p_brand)
      |    AS INT) AS rk_h1
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
      |  GROUP BY p_brand),
      |h2 AS (
      |  SELECT p_brand, CAST(ROW_NUMBER() OVER (ORDER BY
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) DESC, p_brand)
      |    AS INT) AS rk_h2
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY p_brand)
      |SELECT p_brand, rk_h1, rk_h2, ABS(rk_h1 - rk_h2) AS moved
      |FROM h1 JOIN h2 USING (p_brand)
      |WHERE ABS(rk_h1 - rk_h2) >= 3
      |ORDER BY moved DESC, p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q64: DS q23-phase-1-style scalar threshold in HAVING — brands
  // whose revenue exceeds 4.2% of the global total (the aggregate
  // compared against a scalar aggregate of the same relation).
  // ---------------------------------------------------------------- //
  def q64_share_threshold(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    val perBrand = li.groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("rev"))
    val total = perBrand.agg(sum(dec(col("rev"))).cast("double").as("grand"))
    perBrand.crossJoin(broadcast(total))
      .filter(col("rev") > lit(0.042) * col("grand"))
      .withColumn("share", col("rev") / col("grand"))
      .select(col("p_brand"), col("rev"), col("share"))
      .orderBy(desc("rev"), col("p_brand"))
  }

  val q64_sql: String =
    """WITH per_brand AS (
      |  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand),
      |tot AS (SELECT CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS grand
      |        FROM per_brand)
      |SELECT p_brand, rev, rev / grand AS share
      |FROM per_brand, tot
      |WHERE rev > 0.042 * grand
      |ORDER BY rev DESC, p_brand""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q57_above_nation_avg" -> ((q57_above_nation_avg _, Some(q57_sql))),
    "q58_exists_chain" -> ((q58_exists_chain _, Some(q58_sql))),
    "q59_moving_avg" -> ((q59_moving_avg _, Some(q59_sql))),
    "q60_count_buckets" -> ((q60_count_buckets _, Some(q60_sql))),
    "q61_promo_ratio" -> ((q61_promo_ratio _, Some(q61_sql))),
    "q62_latency_buckets" -> ((q62_latency_buckets _, Some(q62_sql))),
    "q63_rank_movement" -> ((q63_rank_movement _, Some(q63_sql))),
    "q64_share_threshold" -> ((q64_share_threshold _, Some(q64_sql))),
  )
}
