package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, sixth wave (q81-q86) — remaining plan classes
  * from the reference's corpus (ref: test/sql/scanner/tpcds.test:23-67):
  *
  *  - two-level correlated threshold: entity total vs 1.2× the average
  *    of totals within the entity's group (DS q1/q30/q81)
  *  - row-vs-category-average join on a dimension attribute (DS q6)
  *  - OR of a local IN-list predicate and a HAVING-derived key set
  *    (DS q15/q45's zip-or-subquery gate)
  *  - before/after pivot-date comparison from one scan (DS q21/q40)
  *  - re-aggregation of a UNION ALL of per-channel aggregates
  *    (DS q33/q56/q60)
  *  - OR-of-AND predicate bands spanning join columns, forcing a
  *    residual filter over the joined relation (DS q13/q85)
  *
  * Exactness per house rules: decimal sums, averages as
  * SUM(decimal)/COUNT, identical double expressions both sides,
  * deterministic total ORDER BY.
  */
object Tpcds6 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q81: DS q1-style two-level threshold — per-customer 1997 spend vs
  // 1.2× the average customer spend within the same nation. The inner
  // aggregate feeds both the probe rows and (re-aggregated) the
  // per-group threshold.
  // ---------------------------------------------------------------- //
  def q81_above_group_avg(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val tot = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      // long-path dsum: orders-per-customer is scale-invariant (~10),
      // under the 2^63 group bound (DecimalFastFunctions contract);
      // the per-nation re-average below runs over per-customer
      // partials (dim-scale) on the decimal path
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("o_totalprice")).as("spend"))
    val nav = tot.groupBy(col("c_nationkey"))
      .agg((sum(dec(col("spend"))).cast("double") / count(lit(1))).as("avg_spend"))
    tot.join(nav, Seq("c_nationkey"))
      .filter(col("spend") > lit(1.2) * col("avg_spend"))
      .select(col("c_custkey"), col("c_nationkey"), col("spend"), col("avg_spend"))
      .orderBy(col("c_custkey"))
  }

  val q81_sql: String =
    """WITH tot AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY c_custkey, c_nationkey),
      |nav AS (
      |  SELECT c_nationkey,
      |    CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_spend
      |  FROM tot GROUP BY c_nationkey)
      |SELECT c_custkey, c_nationkey, spend, avg_spend
      |FROM tot JOIN nav USING (c_nationkey)
      |WHERE spend > 1.2 * avg_spend
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q82: DS q6-style category-average comparison — parts priced at
  // least 1.05× their type-category average, counted per category
  // (retail prices are tightly distributed; 1.2× selects nothing).
  // ---------------------------------------------------------------- //
  def q82_category_avg(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val avgp = part.groupBy(col("p_type"))
      .agg((sum(dec(col("p_retailprice"))).cast("double") /
        count(lit(1))).as("avg_price"))
    part.join(avgp, Seq("p_type"))
      .filter(col("p_retailprice") > lit(1.05) * col("avg_price"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("tot_price"))
      .orderBy(col("p_type"))
  }

  val q82_sql: String =
    """WITH avgp AS (
      |  SELECT p_type,
      |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |  FROM part GROUP BY p_type)
      |SELECT p_type, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS tot_price
      |FROM part JOIN avgp USING (p_type)
      |WHERE p_retailprice > 1.05 * avg_price
      |GROUP BY p_type ORDER BY p_type""".stripMargin

  // ---------------------------------------------------------------- //
  // q83: DS q15/q45-style OR gate — customers in two segments OR with
  // more than 12 orders (a HAVING-derived key set), per-segment stats.
  // The OR across a local predicate and a subquery membership becomes
  // a union of a filter branch and a semi-join branch.
  // ---------------------------------------------------------------- //
  def q83_inlist_or_subquery(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val manyOrders = t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
      .filter(col("n_ord") > 12)
    val gated = cust.filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .union(cust.join(manyOrders, col("c_custkey") === col("o_custkey"), "left_semi"))
      .dropDuplicates("c_custkey")
    gated.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("tot_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q83_sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS tot_bal
      |FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |   OR c_custkey IN (SELECT o_custkey FROM orders
      |                    GROUP BY o_custkey HAVING COUNT(*) > 12)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- //
  // q84: DS q21-style pivot-date comparison — per-brand revenue before
  // vs after 1998-01-01 from one scan (two filtered decimal sums),
  // keeping brands whose after/before ratio sits in a band.
  // ---------------------------------------------------------------- //
  def q84_pivot_date(s: SparkSession, dir: String): DataFrame = {
    val pivot = lit("1998-01-01").cast("timestamp")
    val agg = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(when(col("l_shipdate") < pivot, dec(col("l_extendedprice"))))
          .cast("double").as("before_rev"),
        sum(when(col("l_shipdate") >= pivot, dec(col("l_extendedprice"))))
          .cast("double").as("after_rev"))
      .filter(col("before_rev").isNotNull && col("after_rev").isNotNull)
      .withColumn("ratio", col("after_rev") / col("before_rev"))
    agg.filter(col("ratio") >= 0.5 && col("ratio") <= 2.0)
      .select(col("p_brand"), col("before_rev"), col("after_rev"), col("ratio"))
      .orderBy(col("p_brand"))
  }

  val q84_sql: String =
    """WITH agg AS (
      |  SELECT p_brand,
      |    CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS before_rev,
      |    CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS after_rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand)
      |SELECT p_brand, before_rev, after_rev, after_rev / before_rev AS ratio
      |FROM agg
      |WHERE before_rev IS NOT NULL AND after_rev IS NOT NULL
      |  AND after_rev / before_rev >= 0.5 AND after_rev / before_rev <= 2.0
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q85: DS q33/q56-style union re-aggregation — per-channel brand
  // aggregates (one per return flag) UNION ALLed, then re-aggregated
  // per brand with the contributing-channel count.
  // ---------------------------------------------------------------- //
  def q85_union_reagg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    def channel(flag: String) =
      li.filter(col("l_returnflag") === flag)
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice")).as("rev"))
        .select(col("p_brand"), lit(flag).as("ch"), col("rev"))
    channel("A").union(channel("N")).union(channel("R"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_channels"),
        sum(dec(col("rev"))).cast("double").as("total_rev"))
      .orderBy(col("p_brand"))
  }

  val q85_sql: String =
    """WITH j AS (SELECT p_brand, l_returnflag, l_extendedprice
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |ch AS (
      |  SELECT p_brand, 'A' AS ch,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM j WHERE l_returnflag = 'A' GROUP BY p_brand
      |  UNION ALL
      |  SELECT p_brand, 'N' AS ch,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM j WHERE l_returnflag = 'N' GROUP BY p_brand
      |  UNION ALL
      |  SELECT p_brand, 'R' AS ch,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM j WHERE l_returnflag = 'R' GROUP BY p_brand)
      |SELECT p_brand, COUNT(*) AS n_channels,
      |  CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
      |FROM ch GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q86: DS q13-style OR-of-AND bands — a customer × orders join where
  // each disjunct pairs a segment with a price band, forcing residual
  // evaluation over the joined relation. Single-row stats output.
  // ---------------------------------------------------------------- //
  def q86_or_bands(s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
    j.filter(
      (col("c_mktsegment") === "BUILDING" &&
        col("o_totalprice") >= 0.0 && col("o_totalprice") < 100000.0) ||
        (col("c_mktsegment") === "MACHINERY" &&
          col("o_totalprice") >= 100000.0 && col("o_totalprice") < 300000.0) ||
        (col("c_mktsegment") === "AUTOMOBILE" &&
          col("o_totalprice") >= 300000.0 && col("o_totalprice") < 500000.0))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("tot_price"),
        (sum(dec(col("o_totalprice"))).cast("double") /
          count(lit(1))).as("avg_price"))
  }

  val q86_sql: String =
    """SELECT COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |WHERE (c_mktsegment = 'BUILDING' AND o_totalprice >= 0.0 AND o_totalprice < 100000.0)
      |   OR (c_mktsegment = 'MACHINERY' AND o_totalprice >= 100000.0 AND o_totalprice < 300000.0)
      |   OR (c_mktsegment = 'AUTOMOBILE' AND o_totalprice >= 300000.0 AND o_totalprice < 500000.0)""".stripMargin

  // ---------------------------------------------------------------- //
  // Catalog-prefixed variants: the OR-of-AND band filter (residual
  // pushdown with mixed-column disjuncts) and the union re-aggregation
  // planned over connector relations.
  // ---------------------------------------------------------------- //
  private def q86CatSql(p: String): String =
    s"""SELECT COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot_price,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
       |FROM ${p}customer JOIN ${p}orders ON c_custkey = o_custkey
       |WHERE (c_mktsegment = 'BUILDING' AND o_totalprice >= 0.0 AND o_totalprice < 100000.0)
       |   OR (c_mktsegment = 'MACHINERY' AND o_totalprice >= 100000.0 AND o_totalprice < 300000.0)
       |   OR (c_mktsegment = 'AUTOMOBILE' AND o_totalprice >= 300000.0 AND o_totalprice < 500000.0)""".stripMargin

  private def q85CatSql(p: String): String =
    s"""WITH j AS (SELECT p_brand, l_returnflag, l_extendedprice
       |           FROM ${p}lineitem JOIN ${p}part ON l_partkey = p_partkey),
       |ch AS (
       |  SELECT p_brand, 'A' AS ch,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |  FROM j WHERE l_returnflag = 'A' GROUP BY p_brand
       |  UNION ALL
       |  SELECT p_brand, 'N' AS ch,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |  FROM j WHERE l_returnflag = 'N' GROUP BY p_brand
       |  UNION ALL
       |  SELECT p_brand, 'R' AS ch,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |  FROM j WHERE l_returnflag = 'R' GROUP BY p_brand)
       |SELECT p_brand, COUNT(*) AS n_channels,
       |  CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
       |FROM ch GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q81_above_group_avg" -> ((q81_above_group_avg _, Some(q81_sql))),
    "q82_category_avg" -> ((q82_category_avg _, Some(q82_sql))),
    "q83_inlist_or_subquery" -> ((q83_inlist_or_subquery _, Some(q83_sql))),
    "q84_pivot_date" -> ((q84_pivot_date _, Some(q84_sql))),
    "q85_union_reagg" -> ((q85_union_reagg _, Some(q85_sql))),
    "q86_or_bands" -> ((q86_or_bands _, Some(q86_sql))),
    "c53_ds_cat_or_bands" -> ((ConnectorOps.viaCatalog(q86CatSql) _, Some(q86CatSql("")))),
    "c54_ds_cat_union_reagg" -> ((ConnectorOps.viaCatalog(q85CatSql) _, Some(q85CatSql("")))),
  )
}
