package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, fifth wave (q71-q80) — plan classes from the
  * reference's corpus (ref: test/sql/scanner/tpcds.test:23-67) still
  * missing after waves 1-4:
  *
  *  - per-entity growth-ratio comparison across two channels (DS
  *    q4/q11: four filtered aggregates of one scan, ratio-vs-ratio)
  *  - OR of two EXISTS gates plus a NOT EXISTS gate (DS q10/q35)
  *  - filter against an uncorrelated scalar aggregate of a reused
  *    derived table (DS q14's avg-sales threshold)
  *  - coefficient-of-variation from exact decimal moments (DS q17/q39)
  *  - ratio band join: two channel aggregates inner-joined with a
  *    0.9-1.1 residual predicate (DS q58)
  *  - the same wide dimension join aggregated for two periods and
  *    joined on the full dimension key (DS q64 two-pass core)
  *  - a grid of independent scalar aggregates cross-joined into one
  *    row (DS q88's 8-way count grid)
  *  - set-overlap counting via FULL OUTER JOIN of two DISTINCT key
  *    sets (DS q97)
  *  - left-join match-rate against a filtered dimension (DS q72's
  *    promo-null accounting shape, over the events fact)
  *  - fact-to-fact self LEFT JOIN on a composite line key with
  *    null-defaulted arithmetic (DS q93 net-after-returns)
  *
  * Exactness per house rules: decimal-accumulated sums, double
  * expressions written identically on both sides, COUNT(CASE …) for
  * portable conditional counts, deterministic total ORDER BY.
  */
object Tpcds5 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- //
  // q71: DS q4/q11-style growth comparison — per customer, 1996→1997
  // spend growth in the urgent-priority channel vs the normal channel;
  // keep customers whose urgent growth outpaces normal growth. One
  // scan, four filtered decimal aggregates, ratio-vs-ratio predicate.
  // ---------------------------------------------------------------- //
  def q71_growth_compare(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1996, 1997))
      .withColumn("urgent", col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    def part(urgent: Boolean, yr: Int) =
      sum(when(col("urgent") === urgent && col("yr") === yr,
        dec(col("o_totalprice"))))
    val agg = o.groupBy(col("o_custkey"))
      .agg(part(true, 1996).as("a96"), part(true, 1997).as("a97"),
        part(false, 1996).as("b96"), part(false, 1997).as("b97"))
      .filter(col("a96").isNotNull && col("b96").isNotNull)
      .select(col("o_custkey"),
        (coalesce(col("a97"), lit(0).cast(DecimalType(18, 2))).cast("double") /
          col("a96").cast("double")).as("ratio_a"),
        (coalesce(col("b97"), lit(0).cast(DecimalType(18, 2))).cast("double") /
          col("b96").cast("double")).as("ratio_b"))
      .filter(col("ratio_a") > col("ratio_b"))
    agg.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("ratio_a"), col("ratio_b"))
      .orderBy(col("c_custkey"))
  }

  val q71_sql: String =
    """WITH agg AS (
      |  SELECT o_custkey,
      |    SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      AND EXTRACT(YEAR FROM o_orderdate) = 1996
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS a96,
      |    SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      AND EXTRACT(YEAR FROM o_orderdate) = 1997
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS a97,
      |    SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      AND EXTRACT(YEAR FROM o_orderdate) = 1996
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS b96,
      |    SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      AND EXTRACT(YEAR FROM o_orderdate) = 1997
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS b97
      |  FROM orders
      |  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
      |  GROUP BY o_custkey),
      |r AS (
      |  SELECT o_custkey,
      |    CAST(COALESCE(a97, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) /
      |      CAST(a96 AS DOUBLE) AS ratio_a,
      |    CAST(COALESCE(b97, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) /
      |      CAST(b96 AS DOUBLE) AS ratio_b
      |  FROM agg WHERE a96 IS NOT NULL AND b96 IS NOT NULL)
      |SELECT c_custkey, c_name, ratio_a, ratio_b
      |FROM r JOIN customer ON o_custkey = c_custkey
      |WHERE ratio_a > ratio_b
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q72: DS q10/q35-style demographic gate — customers with (an urgent
  // order OR a high-value order) and no 1997+ activity, counted per
  // segment. OR of EXISTS as a union of semi-joins; NOT EXISTS as an
  // anti-join — all three gates broadcastable key sets at scale.
  // ---------------------------------------------------------------- //
  def q72_exists_or(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
    val big = o.filter(col("o_totalprice") > 400000.0)
    val recent = o.filter(
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
    val gated = cust.join(urgent, col("c_custkey") === urgent("o_custkey"), "left_semi")
      .union(cust.join(big, col("c_custkey") === big("o_custkey"), "left_semi"))
      .dropDuplicates("c_custkey")
      .join(recent, col("c_custkey") === recent("o_custkey"), "left_anti")
    gated.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("tot_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q72_sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS tot_bal
      |FROM customer
      |WHERE (EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                 AND o_orderpriority = '1-URGENT')
      |    OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                 AND o_totalprice > 400000.0))
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                 AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- //
  // q73: DS q14-style scalar threshold — per-part 1996 revenue, keep
  // parts above the all-parts average (uncorrelated scalar aggregate
  // of the same derived table), aggregated per brand. The threshold is
  // SUM(decimal)/COUNT so both engines derive it exactly.
  // ---------------------------------------------------------------- //
  def q73_avg_threshold(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"))
      // long-path revenue: lines-per-part is scale-invariant (~30),
      // under the 2^63 group bound (DecimalFastFunctions contract)
      .agg(graft.functions.DecimalFastFunctions.sum_unscaled_revenue_double(
          col("l_extendedprice"), col("l_discount"))
        .cast("double").as("rev"))
    // rev carries four decimal places (price(2dp) × discount(2dp)):
    // re-aggregate through DECIMAL(18,4), not the 2dp helper
    val dec4 = col("rev").cast(DecimalType(18, 4))
    val thr = rev.agg((sum(dec4).cast("double") / count(lit(1))).as("thr"))
    rev.crossJoin(thr).filter(col("rev") > col("thr"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev").cast(DecimalType(18, 4))).cast("double").as("brand_rev"))
      .orderBy(col("p_brand"))
  }

  val q73_sql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_partkey),
      |thr AS (SELECT CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS thr
      |        FROM rev)
      |SELECT p_brand, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS brand_rev
      |FROM rev CROSS JOIN thr
      |JOIN part ON l_partkey = p_partkey
      |WHERE rev > thr
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q74: DS q17/q39-style demand variability — per-brand coefficient
  // of variation of order quantities. The moments (n, Σq, Σq²) are
  // exact decimal aggregates; the one double expression at the end is
  // written identically on both engines, so the hash compare holds.
  // ---------------------------------------------------------------- //
  def q74_cov(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sd"),
        sum(dec(col("l_quantity")) * dec(col("l_quantity")))
          .cast("double").as("ssd"))
    m.select(col("p_brand"), col("n"),
      (sqrt((col("n") * col("ssd") - col("sd") * col("sd")) /
        (col("n") * (col("n") - lit(1)))) / (col("sd") / col("n"))).as("cov"))
      .orderBy(col("p_brand"))
  }

  val q74_sql: String =
    """WITH m AS (
      |  SELECT p_brand, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sd,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
      |      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ssd
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand)
      |SELECT p_brand, n,
      |  SQRT((n * ssd - sd * sd) / (n * (n - 1))) / (sd / n) AS cov
      |FROM m ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q75: DS q58-style ratio band — per-brand revenue in the finished
  // vs open line-status channels, keeping brands where the channels
  // are within ±10% of each other (inner join with residual band
  // predicate on the aggregate ratio).
  // ---------------------------------------------------------------- //
  def q75_ratio_band(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    def channel(status: String, out: String) =
      li.filter(col("l_linestatus") === status)
        .groupBy(col("p_brand")).agg(dsum(col("l_extendedprice")).as(out))
    channel("F", "rev_f").join(channel("O", "rev_o"), Seq("p_brand"))
      .withColumn("ratio", col("rev_f") / col("rev_o"))
      .filter(col("ratio") >= 0.9 && col("ratio") <= 1.1)
      .select(col("p_brand"), col("rev_f"), col("rev_o"), col("ratio"))
      .orderBy(col("p_brand"))
  }

  val q75_sql: String =
    """WITH j AS (SELECT p_brand, l_linestatus, l_extendedprice
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |f AS (SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_f
      |      FROM j WHERE l_linestatus = 'F' GROUP BY p_brand),
      |o AS (SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_o
      |      FROM j WHERE l_linestatus = 'O' GROUP BY p_brand)
      |SELECT p_brand, rev_f, rev_o, rev_f / rev_o AS ratio
      |FROM f JOIN o USING (p_brand)
      |WHERE rev_f / rev_o >= 0.9 AND rev_f / rev_o <= 1.1
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q76: DS q64-style two-pass wide join — the same customer × nation
  // × orders × lineitem join aggregated for 1996 and for 1997, the two
  // passes joined on the full dimension key, keeping customers whose
  // revenue grew.
  // ---------------------------------------------------------------- //
  def q76_two_year_wide(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    import graft.functions.DecimalFastFunctions.{make_decimal, unscaled_of_double}
    // r15 single-pass: the old per-year `pass()` instantiation computed
    // the customer⋈nation⋈orders⋈lineitem subtree TWICE and re-joined
    // the results; both year columns are conditional sums of ONE pass
    // (§2.4 remove duplicate subtrees). The year split also now joins
    // only the two target years (filter before the join), the fact
    // pre-aggregates per (orderkey → custkey, yr) before the customer
    // join (§2.3), and the inner self-join's "customer present in both
    // years" becomes the null-rejecting rev97 > rev96 filter (a NULL
    // year-sum never satisfies it — same rows out).
    val oF = t(s, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1996, 1997))
      .select(col("o_orderkey"), col("o_custkey"), col("yr"))
    // per-order revenue partial: lines-per-order ≤ 7, scale-invariant,
    // |unscaled term| ≲ 10^9 — far under the 2^63 long bound. (The
    // join-then-aggregate variant measured the same at sf0.1 — 0.86 vs
    // 0.84 — but shuffles RAW lineitem wherever the two-year orders
    // slice outgrows broadcast, so the pre-aggregated form wins at
    // scale; both keep one custkey aggregate.)
    val liAgg = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
      .agg(sum(unscaled_of_double(col("l_extendedprice"), 2) *
        (lit(100L) - unscaled_of_double(col("l_discount"), 2))).as("__ru"))
    // per-(customer, year) roll-up: orders-per-customer-per-year is
    // scale-invariant (~10), still far under the long bound
    val perCust = liAgg.join(oF, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        make_decimal(sum(when(col("yr") === 1996, col("__ru"))), 38, 4)
          .cast("double").as("rev96"),
        make_decimal(sum(when(col("yr") === 1997, col("__ru"))), 38, 4)
          .cast("double").as("rev97"))
      .filter(col("rev97") > col("rev96"))
    perCust
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("rev96"),
        col("rev97"), (col("rev97") / col("rev96")).as("growth"))
      .orderBy(col("c_custkey"))
  }

  val q76_sql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, n_name, EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    l_extendedprice, l_discount
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey),
      |y96 AS (
      |  SELECT c_custkey, c_name, n_name,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev96
      |  FROM base WHERE yr = 1996 GROUP BY 1, 2, 3),
      |y97 AS (
      |  SELECT c_custkey, c_name, n_name,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev97
      |  FROM base WHERE yr = 1997 GROUP BY 1, 2, 3)
      |SELECT c_custkey, c_name, n_name, rev96, rev97, rev97 / rev96 AS growth
      |FROM y96 JOIN y97 USING (c_custkey, c_name, n_name)
      |WHERE rev97 > rev96
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q77: DS q88-style scalar grid — eight independent filtered counts
  // (quantity bucket × line status) cross-joined into a single row.
  // Each scalar is its own aggregate; the cross joins are single-row
  // broadcasts, which is exactly how a 1000-executor plan wants them.
  // ---------------------------------------------------------------- //
  def q77_scalar_grid(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def cell(lo: Int, hi: Int, status: String, out: String) =
      li.filter(col("l_quantity") >= lo && col("l_quantity") <= hi &&
        col("l_linestatus") === status)
        .agg(count(lit(1)).as(out))
    cell(1, 10, "F", "b1").crossJoin(cell(11, 20, "F", "b2"))
      .crossJoin(cell(21, 30, "F", "b3")).crossJoin(cell(31, 40, "F", "b4"))
      .crossJoin(cell(1, 10, "O", "b5")).crossJoin(cell(11, 20, "O", "b6"))
      .crossJoin(cell(21, 30, "O", "b7")).crossJoin(cell(31, 40, "O", "b8"))
  }

  val q77_sql: String = {
    def cell(lo: Int, hi: Int, status: String, out: String) =
      s"""(SELECT COUNT(*) FROM lineitem WHERE l_quantity >= $lo
         | AND l_quantity <= $hi AND l_linestatus = '$status') AS $out""".stripMargin
    s"""SELECT ${cell(1, 10, "F", "b1")}, ${cell(11, 20, "F", "b2")},
       | ${cell(21, 30, "F", "b3")}, ${cell(31, 40, "F", "b4")},
       | ${cell(1, 10, "O", "b5")}, ${cell(11, 20, "O", "b6")},
       | ${cell(21, 30, "O", "b7")}, ${cell(31, 40, "O", "b8")}""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // q78: DS q97-style set overlap — DISTINCT customer sets of the
  // urgent-order and high-value-order channels, FULL OUTER joined,
  // counting left-only / right-only / both. COUNT(CASE …) keeps the
  // counts BIGINT on both engines.
  // ---------------------------------------------------------------- //
  def q78_overlap_counts(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("ak")).distinct()
    val b = o.filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("bk")).distinct()
    a.join(b, col("ak") === col("bk"), "full_outer")
      .agg(
        count(when(col("ak").isNotNull && col("bk").isNull, 1)).as("only_a"),
        count(when(col("ak").isNull && col("bk").isNotNull, 1)).as("only_b"),
        count(when(col("ak").isNotNull && col("bk").isNotNull, 1)).as("both_ab"))
  }

  val q78_sql: String =
    """WITH a AS (SELECT DISTINCT o_custkey AS ak FROM orders
      |           WHERE o_orderpriority = '1-URGENT'),
      |b AS (SELECT DISTINCT o_custkey AS bk FROM orders
      |      WHERE o_totalprice > 300000.0),
      |m AS (SELECT ak, bk FROM a FULL OUTER JOIN b ON ak = bk)
      |SELECT
      |  COUNT(CASE WHEN ak IS NOT NULL AND bk IS NULL THEN 1 END) AS only_a,
      |  COUNT(CASE WHEN ak IS NULL AND bk IS NOT NULL THEN 1 END) AS only_b,
      |  COUNT(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL THEN 1 END) AS both_ab
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- //
  // q79: DS q72-style null accounting — events LEFT JOIN a filtered
  // customer dimension; per event type, how many events matched and
  // the match rate. The dimension filter makes the join genuinely
  // partial (the null branch carries real rows).
  // ---------------------------------------------------------------- //
  def q79_left_null_ratio(s: SparkSession, dir: String): DataFrame = {
    val seg = t(s, dir, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"))
    t(s, dir, "events")
      .join(seg, col("user_id") === col("c_custkey"), "left_outer")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("c_custkey")).as("n_matched"))
      .withColumn("match_rate",
        col("n_matched").cast("double") / col("n"))
      .orderBy(col("event_type"))
  }

  val q79_sql: String =
    """WITH seg AS (SELECT c_custkey FROM customer
      |             WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE'))
      |SELECT event_type, COUNT(*) AS n, COUNT(c_custkey) AS n_matched,
      |  CAST(COUNT(c_custkey) AS DOUBLE) / COUNT(*) AS match_rate
      |FROM events LEFT JOIN seg ON user_id = c_custkey
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- //
  // q80: DS q93-style net-after-returns — lineitem LEFT JOINed to its
  // returned subset on the composite line key, netting returned
  // quantity to zero, then per-customer totals through orders. The
  // fact-to-fact self join on (orderkey, linenumber) is the plan
  // class; at scale both sides share the orderkey distribution.
  // ---------------------------------------------------------------- //
  def q80_net_returns(s: SparkSession, dir: String): DataFrame =
    q80Shape(() => t(s, dir, "lineitem"), t(s, dir, "orders"))

  /** Shared with the catalog variant (c69, Tpcds11).
    *
    * Partition both self-join inputs by orderkey ALONE: hash
    * partitioning on a SUBSET of the (orderkey, linenumber) join keys
    * satisfies its clustering, and — unlike the default (ok, ln)
    * exchange — the join output then also satisfies the orders join
    * on ok, so the joined fact never re-shuffles. `lineitem` is a
    * thunk so the two sides stay separate scans: the R side keeps its
    * source filter pushdown and the main side's shuffle never carries
    * l_returnflag. Net at 100 TB: one full-fact shuffle removed from
    * the plan class. Shuffle-hash, not sort-merge: both joins are
    * equi-joins whose probe side is the full fact — hashing the
    * smaller side skips two whole-fact sorts (the strategy DuckDB's
    * own hash joins use).
    *
    * The net-quantity sum runs through a primitive-long accumulator
    * (see Tpcds4.q68Shape — same engine wall, R14Lab table).
    * Exactness bound (owned here): per-custkey Σ|unscaled(net qty)| <
    * 2^63 ⇔ per-customer net quantity < 9.2e16 — quantities are < 100
    * per line and lines-per-customer is a scale-invariant TPC-H
    * constant (~40), ~13 orders of margin at any SF. */
  private[queries] def q80Shape(lineitem: () => DataFrame, orders: DataFrame): DataFrame = {
    graft.functions.DecimalFastFunctions.register(orders.sparkSession)
    val li = lineitem()
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .repartition(col("l_orderkey"))
    val ret = lineitem().filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("r_ok"), col("l_linenumber").as("r_ln"),
        col("l_quantity").as("r_qty"))
      .repartition(col("r_ok"))
    li.join(ret.hint("shuffle_hash"),
        col("l_orderkey") === col("r_ok") && col("l_linenumber") === col("r_ln"),
        "left_outer")
      .join(orders.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.DecimalFastFunctions.dsum_unscaled_double(
            col("l_quantity") - coalesce(col("r_qty"), lit(0.0)))
          .as("net_qty"))
      .orderBy(col("o_custkey"))
  }

  val q80_sql: String =
    """WITH ret AS (
      |  SELECT l_orderkey AS r_ok, l_linenumber AS r_ln, l_quantity AS r_qty
      |  FROM lineitem WHERE l_returnflag = 'R')
      |SELECT o_custkey, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity - COALESCE(r_qty, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS net_qty
      |FROM lineitem LEFT JOIN ret ON l_orderkey = r_ok AND l_linenumber = r_ln
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- //
  // Catalog-prefixed variants: the scalar grid and the set-overlap
  // count planned over connector relations — scalar subqueries and
  // FULL OUTER DISTINCT sets are shapes the pushdown path hasn't been
  // probed with before.
  // ---------------------------------------------------------------- //
  private def q77CatSql(p: String): String = {
    def cell(lo: Int, hi: Int, status: String, out: String) =
      s"""(SELECT COUNT(*) FROM ${p}lineitem WHERE l_quantity >= $lo
         | AND l_quantity <= $hi AND l_linestatus = '$status') AS $out""".stripMargin
    s"""SELECT ${cell(1, 10, "F", "b1")}, ${cell(11, 20, "F", "b2")},
       | ${cell(21, 30, "F", "b3")}, ${cell(31, 40, "F", "b4")},
       | ${cell(1, 10, "O", "b5")}, ${cell(11, 20, "O", "b6")},
       | ${cell(21, 30, "O", "b7")}, ${cell(31, 40, "O", "b8")}""".stripMargin
  }

  private def q78CatSql(p: String): String =
    s"""WITH a AS (SELECT DISTINCT o_custkey AS ak FROM ${p}orders
       |           WHERE o_orderpriority = '1-URGENT'),
       |b AS (SELECT DISTINCT o_custkey AS bk FROM ${p}orders
       |      WHERE o_totalprice > 300000.0),
       |m AS (SELECT ak, bk FROM a FULL OUTER JOIN b ON ak = bk)
       |SELECT
       |  COUNT(CASE WHEN ak IS NOT NULL AND bk IS NULL THEN 1 END) AS only_a,
       |  COUNT(CASE WHEN ak IS NULL AND bk IS NOT NULL THEN 1 END) AS only_b,
       |  COUNT(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL THEN 1 END) AS both_ab
       |FROM m""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q71_growth_compare" -> ((q71_growth_compare _, Some(q71_sql))),
    "q72_exists_or" -> ((q72_exists_or _, Some(q72_sql))),
    "q73_avg_threshold" -> ((q73_avg_threshold _, Some(q73_sql))),
    "q74_cov" -> ((q74_cov _, Some(q74_sql))),
    "q75_ratio_band" -> ((q75_ratio_band _, Some(q75_sql))),
    "q76_two_year_wide" -> ((q76_two_year_wide _, Some(q76_sql))),
    "q77_scalar_grid" -> ((q77_scalar_grid _, Some(q77_sql))),
    "q78_overlap_counts" -> ((q78_overlap_counts _, Some(q78_sql))),
    "q79_left_null_ratio" -> ((q79_left_null_ratio _, Some(q79_sql))),
    "q80_net_returns" -> ((q80_net_returns _, Some(q80_sql))),
    "c51_ds_cat_scalar_grid" -> ((ConnectorOps.viaCatalog(q77CatSql) _, Some(q77CatSql("")))),
    "c52_ds_cat_overlap" -> ((ConnectorOps.viaCatalog(q78CatSql) _, Some(q78CatSql("")))),
  )
}
