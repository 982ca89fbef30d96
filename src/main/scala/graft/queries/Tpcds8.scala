package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, eighth wave (q95-q99) — the last uncovered plan
  * classes from the reference's corpus (ref: test/sql/scanner/
  * tpcds.test:23-67):
  *
  *  - consecutive-period retention (month-over-month self-join of
  *    distinct activity, DS q4-family sequential behavior)
  *  - HAVING on COUNT(DISTINCT …) (DS q94's multi-supplier gate as a
  *    direct aggregate filter — q51 covers the semi-join form)
  *  - argmax via aggregate join-back instead of a window (DS q45's
  *    best-item formulation)
  *  - conditional distinct counts, COUNT(DISTINCT CASE …) (DS q35's
  *    channel-reach accounting)
  *  - RANK() with ties kept, vs q44/q92's ROW_NUMBER cuts
  *
  * Exactness per house rules: decimal sums, COUNT(DISTINCT CASE) for
  * portable conditional distincts, deterministic total ORDER BY
  * (tie rows are data-defined and ordered by all output columns).
  */
object Tpcds8 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q95: consecutive-month retention — per 1997 month, how many
  // customers were also active the month before (distinct activity
  // self-joined on month+1), with the retention rate.
  // ---------------------------------------------------------------- //
  def q95_retention(s: SparkSession, dir: String): DataFrame = {
    val act = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"), month(col("o_orderdate")).as("mo"))
      .distinct()
    val prev = act.select(col("o_custkey").as("p_ck"), (col("mo") + 1).as("p_mo"))
    act.join(prev,
        col("o_custkey") === col("p_ck") && col("mo") === col("p_mo"), "left_outer")
      .groupBy(col("mo"))
      .agg(count(lit(1)).as("n_active"),
        count(col("p_ck")).as("n_retained"))
      .withColumn("retention",
        col("n_retained").cast("double") / col("n_active"))
      .orderBy(col("mo"))
  }

  val q95_sql: String =
    """WITH act AS (
      |  SELECT DISTINCT o_custkey, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |SELECT a.mo AS mo, COUNT(*) AS n_active, COUNT(p.o_custkey) AS n_retained,
      |  CAST(COUNT(p.o_custkey) AS DOUBLE) / COUNT(*) AS retention
      |FROM act a LEFT JOIN act p
      |  ON a.o_custkey = p.o_custkey AND a.mo = p.mo + 1
      |GROUP BY a.mo ORDER BY a.mo""".stripMargin

  // ---------------------------------------------------------------- //
  // q96: DS q94-style gate as a direct HAVING on COUNT(DISTINCT) —
  // orders touched by at least 3 distinct suppliers, with line stats.
  // ---------------------------------------------------------------- //
  def q96_having_distinct(s: SparkSession, dir: String): DataFrame = {
    // Round-11 shape: ONE range exchange serves the aggregation AND
    // the total output order. RangePartitioning(l_orderkey) satisfies
    // the groupBy's clustering requirement, so the distinct aggregate
    // runs exchange-free above it and the terminal sort becomes
    // partition-local (`sortWithinPartitions` under range partitioning
    // IS a total order) — where a terminal ORDER BY would add a
    // result-sized range exchange + sampling pass on top of the
    // aggregate's hash exchange. Also doubles as the under-split
    // guard: the explicit exchange spreads a single-row-group source.
    // FloorLab sf10: 22.9 s (hash+sort) → 8.7 s (range+local sort),
    // under DuckDB's 10.6 s; sf0.1: 1.30 → 0.71 s. The r8 two-level
    // vs Expand countDistinct choice inverts under range partitioning
    // (both levels already colocated — Expand's single pass wins);
    // decimal sums keep the revenue bit-identical either way.
    val raw = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
    graft.functions.DecimalFastFunctions.register(s)
    raw.repartitionByRange(col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      // long-path revenue sum: ≤7 lines per order at any SF, trivially
      // under the 2^63 group bound (DecimalFastFunctions contract)
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_lines"),
        graft.functions.DecimalFastFunctions
          .dsum_unscaled_double(col("l_extendedprice")).as("order_rev"))
      .filter(col("n_supp") >= 3)
      .sortWithinPartitions(col("l_orderkey"))
  }

  val q96_sql: String =
    """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_rev
      |FROM lineitem
      |GROUP BY l_orderkey
      |HAVING COUNT(DISTINCT l_suppkey) >= 3
      |ORDER BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q97: DS q45-style argmax WITHOUT a window — each brand's
  // top-revenue part found by joining the per-part aggregate back to
  // the per-brand max (ties broken by the lowest part key via a MIN
  // over the tied set).
  // ---------------------------------------------------------------- //
  def q97_argmax_joinback(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    import graft.functions.DecimalFastFunctions.{make_decimal, unscaled_of_double}
    // r15: the old max-then-join-back computed the whole fact subtree
    // TWICE (the rev branch and the mx branch do not canonicalize to
    // one exchange) and re-shuffled for the tie join. The same
    // brand-argmax with min-partkey tie-break is ONE ordinal aggregate:
    // max(struct(rev, −partkey)) picks the max revenue and, among equal
    // revenues, the smallest part key. The fact also now aggregates per
    // l_partkey BEFORE the part join (guide §2.3: partials collapse
    // map-side; the broadcast join probes parts, not lines) — exact
    // because p_partkey is part's key, so (brand, partkey) grouping ≡
    // partkey grouping, and unmatched keys drop either way.
    val rev = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      // long-path dsum: lines per part are scale-invariant (~30),
      // under the 2^63 group bound (DecimalFastFunctions contract)
      .agg(sum(unscaled_of_double(col("l_extendedprice"), 2)).as("__ru"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_partkey"),
        make_decimal(col("__ru"), 28, 2).cast("double").as("rev"))
    rev.groupBy(col("p_brand"))
      .agg(max(struct(col("rev"), (-col("p_partkey")).as("__nk"))).as("__m"))
      .select(col("p_brand"), (-col("__m.__nk")).as("top_part"),
        col("__m.rev").as("rev"))
      .orderBy(col("p_brand"))
  }

  val q97_sql: String =
    """WITH rev AS (
      |  SELECT p_brand, p_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand, p_partkey),
      |mx AS (SELECT p_brand AS b, MAX(rev) AS max_rev FROM rev GROUP BY p_brand)
      |SELECT p_brand, MIN(p_partkey) AS top_part, rev
      |FROM rev JOIN mx ON p_brand = b AND rev = max_rev
      |GROUP BY p_brand, rev
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q98: DS q35-style channel reach — per segment, distinct customers
  // with urgent orders vs distinct customers with any order, as
  // COUNT(DISTINCT CASE …) over one joined scan.
  // ---------------------------------------------------------------- //
  def q98_conditional_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(when(col("o_orderpriority") === "1-URGENT",
          col("c_custkey"))).as("n_urgent_cust"),
        countDistinct(col("c_custkey")).as("n_cust"))
      .withColumn("urgent_reach",
        col("n_urgent_cust").cast("double") / col("n_cust"))
      .orderBy(col("c_mktsegment"))

  val q98_sql: String =
    """SELECT c_mktsegment,
      |  COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN c_custkey END) AS n_urgent_cust,
      |  COUNT(DISTINCT c_custkey) AS n_cust,
      |  CAST(COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN c_custkey END) AS DOUBLE) / COUNT(DISTINCT c_custkey) AS urgent_reach
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- //
  // q99: RANK() keeping ties — per order priority, rank 1997 months by
  // order count with RANK (ties share a rank and the next is skipped),
  // keep the top 3 ranks INCLUDING tied rows (vs q92's ROW_NUMBER
  // which always cuts exactly k).
  // ---------------------------------------------------------------- //
  def q99_rank_ties(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("o_orderpriority"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"))
    monthly
      .withColumn("rk", rank().over(Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("n_orders"))).cast("int"))
      .filter(col("rk") <= 3)
      .orderBy(col("o_orderpriority"), col("rk"), col("mo"))
  }

  val q99_sql: String =
    """SELECT o_orderpriority, mo, n_orders, rk FROM (
      |  SELECT o_orderpriority, mo, n_orders,
      |    CAST(RANK() OVER (PARTITION BY o_orderpriority
      |      ORDER BY n_orders DESC) AS INT) AS rk
      |  FROM (SELECT o_orderpriority, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
      |          COUNT(*) AS n_orders
      |        FROM orders
      |        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |        GROUP BY 1, 2))
      |WHERE rk <= 3 ORDER BY o_orderpriority, rk, mo""".stripMargin

  // ---------------------------------------------------------------- //
  // Catalog-prefixed variants: the COUNT(DISTINCT)-gated aggregate and
  // the conditional-distinct reach through connector relations.
  // ---------------------------------------------------------------- //
  private def q96CatSql(p: String): String =
    s"""SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
       |  COUNT(*) AS n_lines,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_rev
       |FROM ${p}lineitem
       |GROUP BY l_orderkey
       |HAVING COUNT(DISTINCT l_suppkey) >= 3
       |ORDER BY l_orderkey""".stripMargin

  private def q98CatSql(p: String): String =
    s"""SELECT c_mktsegment,
       |  COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
       |    THEN c_custkey END) AS n_urgent_cust,
       |  COUNT(DISTINCT c_custkey) AS n_cust,
       |  CAST(COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
       |    THEN c_custkey END) AS DOUBLE) / COUNT(DISTINCT c_custkey) AS urgent_reach
       |FROM ${p}customer JOIN ${p}orders ON c_custkey = o_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q95_retention" -> ((q95_retention _, Some(q95_sql))),
    "q96_having_distinct" -> ((q96_having_distinct _, Some(q96_sql))),
    "q97_argmax_joinback" -> ((q97_argmax_joinback _, Some(q97_sql))),
    "q98_conditional_distinct" -> ((q98_conditional_distinct _, Some(q98_sql))),
    "q99_rank_ties" -> ((q99_rank_ties _, Some(q99_sql))),
    "c57_ds_cat_having_distinct" -> ((ConnectorOps.viaCatalog(q96CatSql) _, Some(q96CatSql("")))),
    "c58_ds_cat_cond_distinct" -> ((ConnectorOps.viaCatalog(q98CatSql) _, Some(q98CatSql("")))),
  )
}
