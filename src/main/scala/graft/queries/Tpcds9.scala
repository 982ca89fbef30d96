package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, ninth wave (q100-q109) — plan classes from the
  * reference's 97-query corpus (ref: test/sql/scanner/tpcds.test:23-67)
  * not yet exercised by waves 1-8:
  *
  *  - sold→returned fact self-chain with ratio aggregates (DS q17/q29)
  *  - per-channel P&L union re-aggregated with subtotals (DS q5/q77/q80)
  *  - windowed revenue share within a class (DS q12/q20/q98)
  *  - dim filter + fact date-window + quantity band listing (DS q37/q82)
  *  - per-order dim-inequality accounting (DS q46/q68 trip shapes)
  *  - dimension-only EXISTS with an OR attribute grid (DS q41)
  *  - two-channel consecutive-quarter growth comparison (DS q31)
  *  - aggregate gated by a scalar subquery over itself (DS q24)
  *  - literal IN-list gate intersected with a subquery gate (DS q8)
  *  - first-event anchor + next-period revenue segmentation (DS q54)
  *
  * Exactness per house rules: decimal-accumulated sums surfaced as
  * doubles, identical double arithmetic on both engines, deterministic
  * total ORDER BY per query.
  */
object Tpcds9 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q100: DS q17/q29-style sold→returned chain — customers who had a
  // returned line ('R') and another non-returned line of the SAME part,
  // aggregated per brand: pair count and the average returned/sold
  // quantity ratio.
  // ---------------------------------------------------------------- //
  def q100_ratio_chain(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    import graft.functions.DecimalFastFunctions.{sum_unscaled_safe, unscaled_of_double}
    // r15: the old form joined lineitem⋈orders TWICE (sold and ret
    // branches differ only in the flag filter, so nothing
    // canonicalizes) and then pair-exploded sold⋈ret on (custkey,
    // partkey). Every pair-level sum decomposes over the per-(ck, pk)
    // side aggregates — for pairs (a, b) with a ∈ sold, b ∈ ret of one
    // (ck, pk): Σ_pairs r_qty = s_cnt·Σ r_qty, Σ_pairs s_qty =
    // r_cnt·Σ s_qty, |pairs| = s_cnt·r_cnt — so ONE join + ONE
    // aggregate produce the identical integers with no pair blow-up
    // (§2.3/§3: don't join what an aggregate identity can compute).
    // Quantities ride unscaled longs (≤ 5×10^3·cents·lines-per-(ck,pk),
    // scale-invariant); the per-brand re-sum of count-weighted partials
    // rides the spill-guarded any-cardinality sum.
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val ckpk = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(
        count(when(col("l_returnflag") =!= "R", lit(1))).as("__sc"),
        sum(when(col("l_returnflag") =!= "R",
          unscaled_of_double(col("l_quantity"), 2)).otherwise(0L)).as("__su"),
        count(when(col("l_returnflag") === "R", lit(1))).as("__rc"),
        sum(when(col("l_returnflag") === "R",
          unscaled_of_double(col("l_quantity"), 2)).otherwise(0L)).as("__ru"))
      .filter(col("__sc") > 0 && col("__rc") > 0)
    ckpk.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("__sc") * col("__rc")).as("n_pairs"),
        // ratio of decimal sums, not AVG over doubles: the per-group
        // mean of FP ratios is summation-order-dependent across engines
        (sum_unscaled_safe(col("__sc") * col("__ru"), 28, 2).cast("double") /
          sum_unscaled_safe(col("__rc") * col("__su"), 28, 2).cast("double"))
          .as("qty_ratio"),
        sum_unscaled_safe(col("__sc") * col("__ru"), 28, 2).cast("double")
          .as("ret_qty"))
      .orderBy(col("p_brand"))
  }

  val q100_sql: String =
    """WITH sold AS (
      |  SELECT o_custkey AS s_ck, l_partkey AS s_pk, l_quantity AS s_qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag <> 'R'),
      |ret AS (
      |  SELECT o_custkey AS r_ck, l_partkey AS r_pk, l_quantity AS r_qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R')
      |SELECT p_brand, COUNT(*) AS n_pairs,
      |  CAST(SUM(CAST(r_qty AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(SUM(CAST(s_qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_ratio,
      |  CAST(SUM(CAST(r_qty AS DECIMAL(18,2))) AS DOUBLE) AS ret_qty
      |FROM sold JOIN ret ON s_ck = r_ck AND s_pk = r_pk
      |JOIN part ON s_pk = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q101: DS q5/q77/q80-style channel P&L — two "channels" aggregated
  // from DIFFERENT relations (order-level gross vs line-level net after
  // returns), unioned, then re-aggregated with a grand-total subtotal
  // (GROUPING SETS over the union).
  // ---------------------------------------------------------------- //
  def q101_channel_pnl(s: SparkSession, dir: String): DataFrame = {
    val y97 = (c: Column) =>
      c >= lit("1997-01-01").cast("timestamp") &&
        c < lit("1998-01-01").cast("timestamp")
    val ordCh = t(s, dir, "orders").filter(y97(col("o_orderdate")))
      .groupBy(month(col("o_orderdate")).as("mo"))
      .agg(dsum(col("o_totalprice")).as("gross"), lit(0.0).as("returns"))
      .select(lit("order").as("channel"), col("mo"), col("gross"), col("returns"))
    val lineCh = t(s, dir, "lineitem")
      .filter(y97(col("l_shipdate")))
      .groupBy(month(col("l_shipdate")).as("mo"))
      .agg(dsum(col("l_extendedprice")).as("gross"),
        dsum(when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(lit(0.0))).as("returns"))
      .select(lit("line").as("channel"), col("mo"), col("gross"), col("returns"))
    ordCh.unionByName(lineCh)
      .groupBy(col("channel"), col("mo"))
      .agg(sum(dec(col("gross"))).as("g"), sum(dec(col("returns"))).as("r"))
      .rollup(col("channel"))
      .agg(sum(col("g")).cast("double").as("gross"),
        sum(col("r")).cast("double").as("returns"),
        (sum(col("g")) - sum(col("r"))).cast("double").as("net"))
      .orderBy(col("channel").asc_nulls_first)
  }

  val q101_sql: String =
    """WITH u AS (
      |  SELECT 'order' AS channel, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
      |    0.0 AS returns
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 2
      |  UNION ALL
      |  SELECT 'line' AS channel, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
      |    CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice
      |      ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS returns
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 2)
      |SELECT channel,
      |  CAST(SUM(CAST(gross AS DECIMAL(18,2))) AS DOUBLE) AS gross,
      |  CAST(SUM(CAST(returns AS DECIMAL(18,2))) AS DOUBLE) AS returns,
      |  CAST(SUM(CAST(gross AS DECIMAL(18,2)))
      |    - SUM(CAST(returns AS DECIMAL(18,2))) AS DOUBLE) AS net
      |FROM u GROUP BY ROLLUP(channel)
      |ORDER BY channel ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- //
  // q102: DS q12/q20/q98-style revenue share — each part's share of
  // its type-class revenue via a windowed partition sum (no second
  // scan, no self-join).
  // ---------------------------------------------------------------- //
  def q102_revenue_share(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    // r15: aggregate per l_partkey BEFORE the part join (guide §2.3 —
    // partials collapse map-side, the broadcast join probes parts, not
    // lines). Exact: p_partkey is part's key, so (type, partkey)
    // grouping ≡ partkey grouping, and unmatched keys drop either way.
    val rev = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      // long-path dsum: lines per part are scale-invariant (~30),
      // under the 2^63 group bound (DecimalFastFunctions contract)
      .agg(sum(graft.functions.DecimalFastFunctions
        .unscaled_of_double(col("l_extendedprice"), 2)).as("__ru"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_type"), col("p_partkey"),
        graft.functions.DecimalFastFunctions
          .make_decimal(col("__ru"), 28, 2).cast("double").as("rev"))
    val w = Window.partitionBy(col("p_type"))
    // scale-invariant cut: keep parts at >1.5x the within-type average
    // share (share * n > 1.5) — an absolute threshold empties as the
    // part count grows with sf
    rev.withColumn("type_rev", sum(dec(col("rev"))).over(w).cast("double"))
      .withColumn("n_in_type", count(lit(1)).over(w))
      .withColumn("share", col("rev") / col("type_rev"))
      .filter(col("share") * col("n_in_type") > 1.5)
      .select(col("p_type"), col("p_partkey"), col("rev"), col("share"))
      .orderBy(col("p_type"), col("p_partkey"))
  }

  val q102_sql: String =
    """SELECT p_type, p_partkey, rev, share FROM (
      |  SELECT p_type, p_partkey, rev,
      |    rev / CAST(SUM(CAST(rev AS DECIMAL(18,2)))
      |      OVER (PARTITION BY p_type) AS DOUBLE) AS share,
      |    COUNT(*) OVER (PARTITION BY p_type) AS n_in_type
      |  FROM (
      |    SELECT p_type, p_partkey,
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_type, p_partkey))
      |WHERE share * n_in_type > 1.5
      |ORDER BY p_type, p_partkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q103: DS q37/q82-style availability listing — parts in a retail
  // price band whose total quantity shipped inside a 60-day window
  // falls in [50, 150], as a distinct ordered listing.
  // ---------------------------------------------------------------- //
  def q103_window_band(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val windowQty = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-30").cast("timestamp"))
      .groupBy(col("l_partkey"))
      // long-path dsum: lines-per-part is scale-invariant (~30), under
      // the 2^63 group bound (DecimalFastFunctions contract)
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("l_quantity")).as("win_qty"))
      .filter(col("win_qty") >= 50.0 && col("win_qty") <= 150.0)
    t(s, dir, "part")
      .filter(col("p_retailprice") >= 950.0 && col("p_retailprice") <= 985.0)
      .join(windowQty, col("p_partkey") === col("l_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("win_qty"))
      .orderBy(col("p_partkey"))
  }

  val q103_sql: String =
    """SELECT p_partkey, p_name, p_retailprice, win_qty
      |FROM part JOIN (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS win_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-30 00:00:00'
      |  GROUP BY l_partkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) BETWEEN 50.0 AND 150.0
      |) w ON p_partkey = l_partkey
      |WHERE p_retailprice BETWEEN 950.0 AND 985.0
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q104: DS q46/q68-style dim-inequality accounting — per order,
  // count lines whose supplier sits in a DIFFERENT nation than the
  // customer, keeping only orders with at least one such line.
  // ---------------------------------------------------------------- //
  def q104_cross_nation(s: SparkSession, dir: String): DataFrame = {
    val custNation = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    val suppNation = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("s_nationkey"), col("l_extendedprice"))
    custNation.join(suppNation, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(
        // COUNT(CASE …), not SUM(CASE 1/0): DuckDB widens integer SUM
        // to HUGEINT while COUNT stays BIGINT on both engines
        count(when(col("s_nationkey") =!= col("c_nationkey"), lit(1)))
          .as("n_cross"),
        dsum(when(col("s_nationkey") =!= col("c_nationkey"),
          col("l_extendedprice")).otherwise(lit(0.0))).as("cross_rev"))
      .filter(col("n_cross") >= 1)
      .orderBy(col("o_orderkey"))
  }

  val q104_sql: String =
    """SELECT o_orderkey,
      |  COUNT(CASE WHEN s_nationkey <> c_nationkey THEN 1 END) AS n_cross,
      |  CAST(SUM(CAST(CASE WHEN s_nationkey <> c_nationkey
      |    THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
      |    AS cross_rev
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY o_orderkey
      |HAVING COUNT(CASE WHEN s_nationkey <> c_nationkey THEN 1 END) >= 1
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q105: DS q41-style dimension-only EXISTS with an OR attribute
  // grid — brands having another part in the same brand that matches
  // either of two (type-prefix, size-band) combinations; count
  // qualifying parts per brand.
  // ---------------------------------------------------------------- //
  def q105_exists_or_grid(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val grid = p.filter(
        (col("p_type").startsWith("STANDARD") &&
          col("p_size").between(1, 15)) ||
        (col("p_type").startsWith("ECONOMY") &&
          col("p_size").between(20, 40)))
      .select(col("p_brand").as("g_brand")).distinct()
    p.join(grid, col("p_brand") === col("g_brand"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        dsum(col("p_retailprice")).as("brand_value"))
      .orderBy(col("p_brand"))
  }

  val q105_sql: String =
    """SELECT p_brand, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_value
      |FROM part p1
      |WHERE EXISTS (
      |  SELECT 1 FROM part p2 WHERE p2.p_brand = p1.p_brand
      |    AND ((p2.p_type LIKE 'STANDARD%' AND p2.p_size BETWEEN 1 AND 15)
      |      OR (p2.p_type LIKE 'ECONOMY%' AND p2.p_size BETWEEN 20 AND 40)))
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q106: DS q31-style two-channel consecutive-quarter growth — per
  // nation, urgent-priority vs other-priority revenue across 1997
  // Q1→Q2→Q3; keep nations where the urgent channel outgrew the other
  // channel in BOTH transitions.
  // ---------------------------------------------------------------- //
  def q106_growth_two_channel(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .withColumn("qtr", quarter(col("o_orderdate")))
      .withColumn("ch",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "urgent")
          .otherwise("other"))
      .groupBy(col("n_name"), col("ch"), col("qtr"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    def q(ch: String, qtr: Int, alias: String) = base
      .filter(col("ch") === ch && col("qtr") === qtr)
      .select(col("n_name").as(s"${alias}_n"), col("rev").as(alias))
    val j = q("urgent", 1, "u1")
      .join(q("urgent", 2, "u2"), col("u1_n") === col("u2_n"))
      .join(q("urgent", 3, "u3"), col("u1_n") === col("u3_n"))
      .join(q("other", 1, "o1"), col("u1_n") === col("o1_n"))
      .join(q("other", 2, "o2"), col("u1_n") === col("o2_n"))
      .join(q("other", 3, "o3"), col("u1_n") === col("o3_n"))
    j.filter(col("u2") / col("u1") > col("o2") / col("o1") &&
        col("u3") / col("u2") > col("o3") / col("o2"))
      .select(col("u1_n").as("n_name"),
        (col("u2") / col("u1")).as("urgent_g1"),
        (col("u3") / col("u2")).as("urgent_g2"),
        (col("o2") / col("o1")).as("other_g1"),
        (col("o3") / col("o2")).as("other_g2"))
      .orderBy(col("n_name"))
  }

  val q106_sql: String =
    """WITH base AS (
      |  SELECT n_name,
      |    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 'urgent' ELSE 'other' END AS ch,
      |    CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      |  GROUP BY 1, 2, 3)
      |SELECT u1.n_name AS n_name,
      |  u2.rev / u1.rev AS urgent_g1, u3.rev / u2.rev AS urgent_g2,
      |  o2.rev / o1.rev AS other_g1, o3.rev / o2.rev AS other_g2
      |FROM base u1
      |JOIN base u2 ON u1.n_name = u2.n_name
      |JOIN base u3 ON u1.n_name = u3.n_name
      |JOIN base o1 ON u1.n_name = o1.n_name
      |JOIN base o2 ON u1.n_name = o2.n_name
      |JOIN base o3 ON u1.n_name = o3.n_name
      |WHERE u1.ch = 'urgent' AND u1.qtr = 1
      |  AND u2.ch = 'urgent' AND u2.qtr = 2
      |  AND u3.ch = 'urgent' AND u3.qtr = 3
      |  AND o1.ch = 'other' AND o1.qtr = 1
      |  AND o2.ch = 'other' AND o2.qtr = 2
      |  AND o3.ch = 'other' AND o3.qtr = 3
      |  AND u2.rev / u1.rev > o2.rev / o1.rev
      |  AND u3.rev / u2.rev > o3.rev / o2.rev
      |ORDER BY u1.n_name""".stripMargin

  // ---------------------------------------------------------------- //
  // q107: DS q24-style self-thresholded aggregate — per-customer
  // returned-line revenue, keeping customers above 5% of the average
  // returned revenue (scalar subquery over the same aggregate).
  // ---------------------------------------------------------------- //
  def q107_self_threshold(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val per = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      // long-path dsum: returned lines per customer are scale-invariant
      // (~8), under the 2^63 group bound (DecimalFastFunctions
      // contract); the global threshold below re-sums per-customer
      // partials (dim-scale) on the decimal path
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("l_extendedprice")).as("ret_rev"))
    // decimal sum / count, not AVG over doubles (summation-order FP)
    val thr = per.agg(((sum(dec(col("ret_rev"))).cast("double") /
      count(lit(1))) * 1.05).as("thr"))
    per.crossJoin(thr).filter(col("ret_rev") > col("thr"))
      .select(col("o_custkey"), col("ret_rev"))
      .orderBy(col("o_custkey"))
  }

  val q107_sql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ret_rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY o_custkey)
      |SELECT o_custkey, ret_rev FROM per
      |WHERE ret_rev > (SELECT (CAST(SUM(CAST(ret_rev AS DECIMAL(18,2)))
      |  AS DOUBLE) / COUNT(*)) * 1.05 FROM per)
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q108: DS q8-style double gate — monthly supplier revenue where the
  // supplier nation is in a literal list AND the buying customer is in
  // the above-average-balance cohort (IN-list ∩ subquery gate).
  // ---------------------------------------------------------------- //
  def q108_double_gate(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val richAvg = cust.agg((sum(dec(col("c_acctbal"))).cast("double") /
      count(lit(1))).as("ab"))
    val rich = cust.crossJoin(richAvg)
      .filter(col("c_acctbal") > col("ab"))
      .select(col("c_custkey").as("rc_ck"))
    val natList = t(s, dir, "nation")
      .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_12", "NATION_18"))
      .select(col("n_nationkey").as("ln_nk"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(natList, col("s_nationkey") === col("ln_nk"), "left_semi")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(rich, col("o_custkey") === col("rc_ck"), "left_semi")
      .groupBy(month(col("o_orderdate")).as("mo"))
      .agg(dsum(col("l_extendedprice")).as("rev"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("mo"))
  }

  val q108_sql: String =
    """SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
      |    WHERE n_name IN ('NATION_3','NATION_7','NATION_12','NATION_18'))
      |  AND o_custkey IN (SELECT c_custkey FROM customer
      |    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
      |      AS DOUBLE) / COUNT(*) FROM customer))
      |GROUP BY 1 ORDER BY mo""".stripMargin

  // ---------------------------------------------------------------- //
  // q109: DS q54-style anchored next-period segmentation — each
  // customer's first 1997 order month anchors a "following month"
  // revenue, bucketed into 5000-wide segments with customer counts.
  // ---------------------------------------------------------------- //
  def q109_next_month_segments(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val o97 = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val anchor = o97.groupBy(col("o_custkey").as("a_ck"))
      .agg(min(month(col("o_orderdate"))).as("first_mo"))
    val follow = o97
      .join(anchor, col("o_custkey") === col("a_ck") &&
        month(col("o_orderdate")) === col("first_mo") + 1)
      .groupBy(col("a_ck"))
      // long-path dsum: follow-month orders per customer are
      // scale-invariant (~1), under the 2^63 group bound
      // (DecimalFastFunctions contract)
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("o_totalprice")).as("next_rev"))
    follow
      .withColumn("segment", floor(col("next_rev") / 5000.0).cast("int"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("segment"))
  }

  val q109_sql: String =
    """WITH o97 AS (
      |  SELECT o_custkey, o_totalprice,
      |    CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |anchor AS (
      |  SELECT o_custkey AS a_ck, MIN(mo) AS first_mo FROM o97 GROUP BY 1),
      |follow AS (
      |  SELECT a_ck,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS next_rev
      |  FROM o97 JOIN anchor ON o_custkey = a_ck AND mo = first_mo + 1
      |  GROUP BY a_ck)
      |SELECT CAST(FLOOR(next_rev / 5000.0) AS INT) AS segment,
      |  COUNT(*) AS n_cust
      |FROM follow GROUP BY 1 ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------- //
  // Catalog-prefixed variants: the windowed revenue share and the
  // sold→returned ratio chain through connector relations.
  // ---------------------------------------------------------------- //
  private def q102CatSql(p: String): String =
    s"""SELECT p_type, p_partkey, rev, share FROM (
       |  SELECT p_type, p_partkey, rev,
       |    rev / CAST(SUM(CAST(rev AS DECIMAL(18,2)))
       |      OVER (PARTITION BY p_type) AS DOUBLE) AS share,
       |    COUNT(*) OVER (PARTITION BY p_type) AS n_in_type
       |  FROM (
       |    SELECT p_type, p_partkey,
       |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |    FROM ${p}lineitem JOIN ${p}part ON l_partkey = p_partkey
       |    GROUP BY p_type, p_partkey) a) b
       |WHERE share * n_in_type > 1.5
       |ORDER BY p_type, p_partkey""".stripMargin

  private def q100CatSql(p: String): String =
    s"""WITH sold AS (
       |  SELECT o_custkey AS s_ck, l_partkey AS s_pk, l_quantity AS s_qty
       |  FROM ${p}lineitem JOIN ${p}orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag <> 'R'),
       |ret AS (
       |  SELECT o_custkey AS r_ck, l_partkey AS r_pk, l_quantity AS r_qty
       |  FROM ${p}lineitem JOIN ${p}orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag = 'R')
       |SELECT p_brand, COUNT(*) AS n_pairs,
       |  CAST(SUM(CAST(r_qty AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(SUM(CAST(s_qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_ratio,
       |  CAST(SUM(CAST(r_qty AS DECIMAL(18,2))) AS DOUBLE) AS ret_qty
       |FROM sold JOIN ret ON s_ck = r_ck AND s_pk = r_pk
       |JOIN ${p}part ON s_pk = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q100_ratio_chain" -> ((q100_ratio_chain _, Some(q100_sql))),
    "q101_channel_pnl" -> ((q101_channel_pnl _, Some(q101_sql))),
    "q102_revenue_share" -> ((q102_revenue_share _, Some(q102_sql))),
    "q103_window_band" -> ((q103_window_band _, Some(q103_sql))),
    "q104_cross_nation" -> ((q104_cross_nation _, Some(q104_sql))),
    "q105_exists_or_grid" -> ((q105_exists_or_grid _, Some(q105_sql))),
    "q106_growth_two_channel" -> ((q106_growth_two_channel _, Some(q106_sql))),
    "q107_self_threshold" -> ((q107_self_threshold _, Some(q107_sql))),
    "q108_double_gate" -> ((q108_double_gate _, Some(q108_sql))),
    "q109_next_month_segments" -> ((q109_next_month_segments _, Some(q109_sql))),
    "c59_ds_cat_rev_share" -> ((ConnectorOps.viaCatalog(q102CatSql) _, Some(q102CatSql("")))),
    "c60_ds_cat_ratio_chain" -> ((ConnectorOps.viaCatalog(q100CatSql) _, Some(q100CatSql("")))),
  )
}
