package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS probe set, second wave (q45-q56 + c47-c49): the plan classes
  * the first wave (q40-q44) left unexercised — adapted to the testdata
  * schema while preserving each reference query's plan shape (ref:
  * test/sql/scanner/tpcds.test:23-67 runs the full 97-query corpus):
  *
  *  - wide casework aggregates (DS q9/q66): many CASE-bucketed
  *    measures folded in ONE scan — the "several queries in one pass"
  *    shape whose scale property is a single fact-table read
  *  - multi-CTE reuse chains (DS q14/q23/q95): one expensive CTE
  *    referenced by several consumers, incl. scalar-aggregate gates
  *  - INTERSECT cohorts (DS q38/q87)
  *  - window-over-rollup (DS q67): ranking within every subtotal grain
  *  - cumulative full-outer channel comparison (DS q51)
  *  - GROUPING SETS with grouping indicators
  *  - per-entity period-over-period ratios (DS q74)
  *  - union-all channel re-aggregation (DS q33/q60)
  *
  * Exactness follows the house rules: decimal-accumulated double sums,
  * averages as decimal-sum / count divided in double, full
  * deterministic ORDER BY (ties broken by keys), explicit NULLS
  * ordering wherever rollup/grouping-set subtotals introduce NULLs,
  * ROW_NUMBER/RANK cast to INT on both sides.
  */
object Tpcds2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  private val ext: Column =
    (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) -
      dec(col("l_discount")))).as("ext")
  private val extSql =
    """CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))""".stripMargin

  // ---------------------------------------------------------------- //
  // q45: DS q9-style wide casework — five quantity buckets × three
  // measures, all folded in a single lineitem pass (one scan, one
  // aggregate, no self-joins — the property that matters at 100 TB).
  // ---------------------------------------------------------------- //
  private val buckets = Seq((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))

  def q45_casework(s: SparkSession, dir: String): DataFrame = {
    def in(lo: Int, hi: Int) = col("l_quantity") >= lo && col("l_quantity") <= hi
    val measures = buckets.zipWithIndex.flatMap { case ((lo, hi), i) =>
      Seq(
        count(when(in(lo, hi), 1)).as(s"n_b${i + 1}"),
        sum(when(in(lo, hi), dec(col("l_extendedprice")))).cast("double")
          .as(s"rev_b${i + 1}"),
        (sum(when(in(lo, hi), dec(col("l_extendedprice")))).cast("double") /
          count(when(in(lo, hi), 1))).as(s"avg_b${i + 1}"))
    }
    t(s, dir, "lineitem").agg(measures.head, measures.tail: _*)
  }

  val q45_sql: String = {
    val cols = buckets.zipWithIndex.flatMap { case ((lo, hi), i) =>
      val cond = s"l_quantity >= $lo AND l_quantity <= $hi"
      Seq(
        s"COUNT(CASE WHEN $cond THEN 1 END) AS n_b${i + 1}",
        s"CAST(SUM(CASE WHEN $cond THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_b${i + 1}",
        s"CAST(SUM(CASE WHEN $cond THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) / COUNT(CASE WHEN $cond THEN 1 END) AS avg_b${i + 1}")
    }
    s"SELECT ${cols.mkString(",\n  ")} FROM lineitem"
  }

  // ---------------------------------------------------------------- //
  // q46: DS q66-style monthly pivot — revenue per supplier nation
  // spread over 12 CASE-month columns, one pass over the 1997 ship
  // year (the manual-PIVOT casework shape).
  // ---------------------------------------------------------------- //
  def q46_monthly_pivot(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .withColumn("mo", month(col("l_shipdate")))
      .withColumn("ext", ext)
    val months = (1 to 12).map(m =>
      coalesce(sum(when(col("mo") === m, col("ext"))).cast("double"), lit(0.0))
        .as(f"rev_m$m%02d"))
    li.groupBy(col("n_name"))
      .agg(months.head, (months.tail :+ sum(col("ext")).cast("double").as("rev_total")): _*)
      .orderBy(col("n_name"))
  }

  val q46_sql: String = {
    val months = (1 to 12).map(m =>
      f"COALESCE(CAST(SUM(CASE WHEN mo = $m THEN ext END) AS DOUBLE), 0.0) AS rev_m$m%02d")
    s"""WITH j AS (
       |  SELECT n_name, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
       |    $extSql AS ext
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
       |SELECT n_name, ${months.mkString(",\n  ")},
       |  CAST(SUM(ext) AS DOUBLE) AS rev_total
       |FROM j GROUP BY n_name ORDER BY n_name""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // q47: DS q14-style multi-CTE reuse — per-part revenue computed ONCE
  // and consumed three times (the scalar average gate, the hot-part
  // filter, and the final measure join). At scale the point is that
  // the expensive aggregate materializes once, not per consumer.
  // ---------------------------------------------------------------- //
  def q47_cte_reuse(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val prev = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      // long-path dsum: lines-per-part is scale-invariant (~30), under
      // the 2^63 group bound (DecimalFastFunctions contract); the
      // re-aggregate over per-part partials below is dim-scale and
      // stays on the decimal path
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("l_extendedprice")).as("rev"))
    val bar = prev.agg(
      (sum(dec(col("rev"))).cast("double") / count(lit(1))).as("avg_rev"))
    val hot = prev.crossJoin(broadcast(bar)).filter(col("rev") > col("avg_rev"))
      .select(col("l_partkey"), col("rev"))
    hot.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_hot"), dsum(col("rev")).as("hot_rev"))
      .orderBy(col("p_brand"))
  }

  val q47_sql: String =
    """WITH prev AS (
      |  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem GROUP BY l_partkey),
      |bar AS (
      |  SELECT CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_rev
      |  FROM prev),
      |hot AS (SELECT l_partkey, rev FROM prev, bar WHERE rev > avg_rev)
      |SELECT p_brand, COUNT(*) AS n_hot,
      |  CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS hot_rev
      |FROM hot JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q48: DS q38/q87-style INTERSECT cohort — customers present in all
  // three behaviors (ordered in 1996, ordered in 1997, ever placed a
  // high-value order), counted per segment.
  // ---------------------------------------------------------------- //
  def q48_intersect_cohort(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    def yr(y: Int) = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val big = orders.filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey")).distinct()
    val cohort = yr(1996).intersect(yr(1997)).intersect(big)
    t(s, dir, "customer")
      .join(cohort, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("seg"))
  }

  val q48_sql: String =
    """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
      |WHERE c_custkey IN (
      |  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
      |GROUP BY c_mktsegment ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------- //
  // q49: DS q67-style window-over-rollup — revenue at every (brand,
  // type) grain incl. subtotals, then top-5 ranked WITHIN each grain
  // (grouping indicators partition the window so subtotal rows rank
  // against their own grain, never against leaves).
  // ---------------------------------------------------------------- //
  def q49_rollup_rank(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    import graft.functions.DecimalFastFunctions.{sum_unscaled_safe, unscaled_of_double}
    // two-level (the q26 pattern): the fact join aggregates to the
    // (brand, type) grid first; Expand multiplies only that tiny grid
    // into the rollup lattice, never the joined fact rows — exact,
    // the decimal partials re-sum before the one double cast.
    // r15: three-level — the fact aggregates per l_partkey BEFORE the
    // part join (guide §2.3 aggregate-before-shuffle: ~30 lines per
    // part collapse map-side, and the join probes parts, not lines),
    // with the per-part revenue as an unscaled scale-4 long (the old
    // sum(ext) accumulated a non-compact DECIMAL(38,4) — one BigDecimal
    // multiply + add per joined fact row). Lines-per-part is
    // scale-invariant, so the long partial is bounded; the per-(brand,
    // type) re-sum over a growing part count rides the spill-guarded
    // any-cardinality sum to the identical DECIMAL(38,4).
    val perPart = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(unscaled_of_double(col("l_extendedprice"), 2) *
        (lit(100L) - unscaled_of_double(col("l_discount"), 2))).as("__ru"))
    val agg = perPart
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(sum_unscaled_safe(col("__ru"), 38, 4).as("pe"))
      .rollup(col("p_brand"), col("p_type"))
      .agg(sum(col("pe")).cast("double").as("rev"),
        grouping(col("p_brand")).cast("int").as("g_b"),
        grouping(col("p_type")).cast("int").as("g_t"))
    val w = Window.partitionBy(col("g_b"), col("g_t"))
      .orderBy(col("rev").desc, col("p_brand").asc_nulls_first,
        col("p_type").asc_nulls_first)
    agg.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 5)
      .select(col("g_b"), col("g_t"), col("p_brand"), col("p_type"),
        col("rev"), col("rk"))
      .orderBy(col("g_b"), col("g_t"), col("rk"))
  }

  val q49_sql: String =
    s"""WITH agg AS (
       |  SELECT p_brand, p_type,
       |    CAST(SUM($extSql) AS DOUBLE) AS rev,
       |    CAST(GROUPING(p_brand) AS INT) AS g_b, CAST(GROUPING(p_type) AS INT) AS g_t
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY ROLLUP (p_brand, p_type))
       |SELECT g_b, g_t, p_brand, p_type, rev, rk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY g_b, g_t
       |    ORDER BY rev DESC, p_brand ASC NULLS FIRST, p_type ASC NULLS FIRST) AS INT) AS rk
       |  FROM agg)
       |WHERE rk <= 5 ORDER BY g_b, g_t, rk""".stripMargin

  // ---------------------------------------------------------------- //
  // q50: DS q51-style cumulative channel comparison — monthly revenue
  // of the A and R return channels full-outer joined on month, decimal
  // cumulative sums, months where one channel's running total leads.
  // ---------------------------------------------------------------- //
  def q50_cumulative_channels(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .withColumn("mo", month(col("l_shipdate")))
    def channel(flag: String, out: String) =
      li.filter(col("l_returnflag") === flag)
        .groupBy(col("mo")).agg(dsum(col("l_extendedprice")).as(out))
    val merged = channel("A", "rev_a")
      .join(channel("R", "rev_r"), Seq("mo"), "full_outer")
      .select(col("mo"),
        coalesce(col("rev_a"), lit(0.0)).as("rev_a"),
        coalesce(col("rev_r"), lit(0.0)).as("rev_r"))
    val w = Window.orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("cum_a", sum(dec(col("rev_a"))).over(w).cast("double"))
      .withColumn("cum_r", sum(dec(col("rev_r"))).over(w).cast("double"))
      .withColumn("a_leads", col("cum_a") > col("cum_r"))
      .orderBy(col("mo"))
  }

  val q50_sql: String =
    """WITH li AS (
      |  SELECT CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo, l_returnflag,
      |    l_extendedprice
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
      |a AS (SELECT mo, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_a
      |      FROM li WHERE l_returnflag = 'A' GROUP BY mo),
      |r AS (SELECT mo, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_r
      |      FROM li WHERE l_returnflag = 'R' GROUP BY mo),
      |m AS (SELECT COALESCE(a.mo, r.mo) AS mo, COALESCE(rev_a, 0.0) AS rev_a,
      |        COALESCE(rev_r, 0.0) AS rev_r
      |      FROM a FULL OUTER JOIN r ON a.mo = r.mo)
      |SELECT mo, rev_a, rev_r,
      |  CAST(SUM(CAST(rev_a AS DECIMAL(18,2))) OVER (
      |    ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_a,
      |  CAST(SUM(CAST(rev_r AS DECIMAL(18,2))) OVER (
      |    ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_r,
      |  CAST(SUM(CAST(rev_a AS DECIMAL(18,2))) OVER (
      |    ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) >
      |  CAST(SUM(CAST(rev_r AS DECIMAL(18,2))) OVER (
      |    ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS a_leads
      |FROM m ORDER BY mo""".stripMargin

  // ---------------------------------------------------------------- //
  // q51: DS q95-style multi-reference CTE — "orders touched by more
  // than one supplier" computed once, consumed as a semi-join gate,
  // with a second derived set (returned orders) as an anti-join gate.
  // ---------------------------------------------------------------- //
  def q51_multi_supplier(s: SparkSession, dir: String): DataFrame = {
    // r15 single-pass gate: COUNT(DISTINCT supp) > 1 is just
    // min(supp) ≠ max(supp), and "has an R line" is a max(flag='R') —
    // ONE lineitem aggregate replaces the old (order, supplier)
    // distinct + per-order count + separate returned-orders distinct
    // (3 exchanges + 2 gate joins → 1 exchange + 1 gate join). The
    // date-filtered orders semi-join runs BEFORE the aggregate (guide
    // §3.2: pre-filter the big side), dropping ~97% of lineitem rows
    // ahead of the orderkey exchange; the aggregate's orderkey
    // partitioning is then reused by the gate join.
    val oF = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val gate = t(s, dir, "lineitem")
      .join(oF.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(min(col("l_suppkey")).as("__mn"), max(col("l_suppkey")).as("__mx"),
        max(col("l_returnflag") === "R").as("__ret"))
      .filter(col("__mn") =!= col("__mx") && !col("__ret"))
      .select(col("l_orderkey"))
    oF.join(gate, col("o_orderkey") === gate("l_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
  }

  val q51_sql: String =
    """WITH multi_supp AS (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1),
      |returned AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      |SELECT COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND o_orderkey IN (SELECT l_orderkey FROM multi_supp)
      |  AND o_orderkey NOT IN (SELECT l_orderkey FROM returned)""".stripMargin

  // ---------------------------------------------------------------- //
  // q52: DS q74-style per-customer year-over-year ratio — the same
  // yearly aggregate instantiated at two parameterizations, joined per
  // customer, top movers by growth ratio.
  // ---------------------------------------------------------------- //
  def q52_yoy_ratio(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    val yearly = t(s, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1996, 1997))
      .groupBy(col("o_custkey"), col("yr"))
      // long-path dsum: orders-per-(customer, year) is scale-invariant
      // (~10), under the 2^63 group bound (DecimalFastFunctions)
      .agg(graft.functions.DecimalFastFunctions
        .dsum_unscaled_double(col("o_totalprice")).as("total"))
    yearly.filter(col("yr") === 1996)
      .select(col("o_custkey"), col("total").as("t96"))
      .join(yearly.filter(col("yr") === 1997)
        .select(col("o_custkey"), col("total").as("t97")), "o_custkey")
      .withColumn("ratio", col("t97") / col("t96"))
      .orderBy(col("ratio").desc, col("o_custkey"))
      .limit(20)
  }

  val q52_sql: String =
    """WITH yearly AS (
      |  SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
      |  GROUP BY 1, 2)
      |SELECT a.o_custkey AS o_custkey, a.total AS t96, b.total AS t97,
      |  b.total / a.total AS ratio
      |FROM yearly a JOIN yearly b ON a.o_custkey = b.o_custkey
      |WHERE a.yr = 1996 AND b.yr = 1997
      |ORDER BY ratio DESC, o_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- //
  // q53: DS q33/q60-style channel union re-aggregation — per-brand
  // revenue computed per return channel, UNION ALL'd, re-aggregated
  // with a channel count (brands missing from a channel show n < 3).
  // ---------------------------------------------------------------- //
  def q53_channel_union(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    def channel(flag: String) =
      li.filter(col("l_returnflag") === flag)
        .groupBy(col("p_brand")).agg(dsum(col("l_extendedprice")).as("rev"))
    val unioned = channel("A").union(channel("N")).union(channel("R"))
    unioned.groupBy(col("p_brand"))
      .agg(dsum(col("rev")).as("total_rev"), count(lit(1)).as("n_channels"))
      .orderBy(col("p_brand"))
  }

  val q53_sql: String =
    """WITH j AS (SELECT l_returnflag, p_brand, l_extendedprice
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |ch AS (
      |  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM j WHERE l_returnflag = 'A' GROUP BY p_brand
      |  UNION ALL
      |  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM j WHERE l_returnflag = 'N' GROUP BY p_brand
      |  UNION ALL
      |  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM j WHERE l_returnflag = 'R' GROUP BY p_brand)
      |SELECT p_brand, CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
      |  COUNT(*) AS n_channels
      |FROM ch GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- //
  // q54: GROUPING SETS with explicit grouping indicators — disjoint
  // grains (by brand / by size / grand total) in one aggregate, the
  // shape ROLLUP cannot express.
  // ---------------------------------------------------------------- //
  def q54_grouping_sets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupingSets(
        Seq(Seq(col("p_brand")), Seq(col("p_size")), Seq.empty[Column]),
        col("p_brand"), col("p_size"))
      .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("retail"),
        grouping(col("p_brand")).cast("int").as("g_b"),
        grouping(col("p_size")).cast("int").as("g_s"))
      .select(col("g_b"), col("g_s"), col("p_brand"), col("p_size"),
        col("n"), col("retail"))
      .orderBy(col("g_b"), col("g_s"), col("p_brand").asc_nulls_first,
        col("p_size").asc_nulls_first)

  val q54_sql: String =
    """SELECT CAST(GROUPING(p_brand) AS INT) AS g_b, CAST(GROUPING(p_size) AS INT) AS g_s,
      |  p_brand, p_size, COUNT(*) AS n,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail
      |FROM part GROUP BY GROUPING SETS ((p_brand), (p_size), ())
      |ORDER BY g_b, g_s, p_brand ASC NULLS FIRST, p_size ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- //
  // q55: DS q23-style frequent-item CTE consumed by two channels —
  // parts sold in many distinct months ("frequent"), then each
  // channel's revenue restricted to those parts, union'd.
  // ---------------------------------------------------------------- //
  def q55_frequent_parts(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    import graft.functions.DecimalFastFunctions.{sum_unscaled_safe, unscaled_of_double}
    // r15 single-scan form: the old shape scanned lineitem three times
    // (the distinct-months frequent-part CTE + once per channel) with
    // an Expand for COUNT(DISTINCT month) and two semi-join exchanges.
    // One l_partkey aggregate computes all three in one pass:
    // distinct-month count = bit_count of a 12-bit month mask (exact —
    // months are 1..12), each channel's revenue = a filtered unscaled
    // long sum (lines-per-part is scale-invariant ~30, far under the
    // 2^63 group bound). The per-channel totals re-sum the per-part
    // longs across ALL parts — cardinality grows with data — so they
    // ride the spill-guarded any-cardinality sum. stack() unpivots the
    // one result row into the same ('A', rev), ('R', rev) output.
    val li = t(s, dir, "lineitem")
    val perPart = li.groupBy(col("l_partkey")).agg(
      bit_count(bit_or(expr("shiftleft(1, month(l_shipdate))"))).as("nm"),
      sum(when(col("l_returnflag") === "A",
        unscaled_of_double(col("l_extendedprice"), 2))).as("__ua"),
      sum(when(col("l_returnflag") === "R",
        unscaled_of_double(col("l_extendedprice"), 2))).as("__ur"))
    perPart.filter(col("nm") >= 8)
      .agg(sum_unscaled_safe(col("__ua"), 28, 2).cast("double").as("__ra"),
        sum_unscaled_safe(col("__ur"), 28, 2).cast("double").as("__rr"))
      .select(expr("stack(2, 'A', __ra, 'R', __rr) AS (ch, rev)"))
      .orderBy(col("ch"))
  }

  val q55_sql: String =
    """WITH freq AS (
      |  SELECT l_partkey FROM lineitem
      |  GROUP BY l_partkey
      |  HAVING COUNT(DISTINCT CAST(EXTRACT(MONTH FROM l_shipdate) AS INT)) >= 8)
      |SELECT 'A' AS ch, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM lineitem WHERE l_returnflag = 'A'
      |  AND l_partkey IN (SELECT l_partkey FROM freq)
      |UNION ALL
      |SELECT 'R' AS ch, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM lineitem WHERE l_returnflag = 'R'
      |  AND l_partkey IN (SELECT l_partkey FROM freq)
      |ORDER BY ch""".stripMargin

  // ---------------------------------------------------------------- //
  // q56: return-rate ranking — returned vs shipped quantity per part
  // (two CASE measures in one pass), ratio-ranked with deterministic
  // ties, volume floor in HAVING.
  // ---------------------------------------------------------------- //
  def q56_return_rate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    import graft.functions.DecimalFastFunctions.{dsum_unscaled_double, make_decimal, unscaled_of_double}
    val pr = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      // long-path sums: lines-per-part is scale-invariant (~30), under
      // the 2^63 group bound (DecimalFastFunctions contract); the
      // filtered sum rides the same path (NULL skips both ways)
      .agg(
        coalesce(make_decimal(sum(when(col("l_returnflag") === "R",
            unscaled_of_double(col("l_quantity"), 2))), 28, 2)
          .cast("double"), lit(0.0)).as("ret_qty"),
        dsum_unscaled_double(col("l_quantity")).as("tot_qty"))
      .filter(col("tot_qty") >= 100.0)
      .withColumn("ret_rate", col("ret_qty") / col("tot_qty"))
    pr.withColumn("rk", row_number().over(
        Window.orderBy(col("ret_rate").desc, col("l_partkey"))).cast("int"))
      .filter(col("rk") <= 10)
      .select(col("rk"), col("l_partkey"), col("ret_qty"), col("tot_qty"),
        col("ret_rate"))
      .orderBy(col("rk"))
  }

  val q56_sql: String =
    """WITH pr AS (
      |  SELECT l_partkey,
      |    COALESCE(CAST(SUM(CASE WHEN l_returnflag = 'R'
      |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS ret_qty,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS tot_qty
      |  FROM lineitem GROUP BY l_partkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) >= 100.0)
      |SELECT rk, l_partkey, ret_qty, tot_qty, ret_rate FROM (
      |  SELECT l_partkey, ret_qty, tot_qty, ret_qty / tot_qty AS ret_rate,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY ret_qty / tot_qty DESC, l_partkey) AS INT) AS rk
      |  FROM pr)
      |WHERE rk <= 10 ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- //
  // c47-c49: three of the new shapes run THROUGH the attached catalog
  // (the reference's tpcds.test analogue) — wide casework, INTERSECT
  // cohort, and window-over-rollup planned by Catalyst over connector
  // relations instead of parquet.
  // ---------------------------------------------------------------- //
  private def q45CatSql(p: String): String = {
    val cols = buckets.zipWithIndex.flatMap { case ((lo, hi), i) =>
      val cond = s"l_quantity >= $lo AND l_quantity <= $hi"
      Seq(
        s"COUNT(CASE WHEN $cond THEN 1 END) AS n_b${i + 1}",
        s"CAST(SUM(CASE WHEN $cond THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_b${i + 1}",
        s"CAST(SUM(CASE WHEN $cond THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) / COUNT(CASE WHEN $cond THEN 1 END) AS avg_b${i + 1}")
    }
    s"SELECT ${cols.mkString(",\n  ")} FROM ${p}lineitem"
  }

  private def q48CatSql(p: String): String =
    s"""SELECT c_mktsegment AS seg, COUNT(*) AS n FROM ${p}customer
       |WHERE c_custkey IN (
       |  SELECT o_custkey FROM ${p}orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
       |  INTERSECT
       |  SELECT o_custkey FROM ${p}orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
       |  INTERSECT
       |  SELECT o_custkey FROM ${p}orders WHERE o_totalprice > 200000.0)
       |GROUP BY c_mktsegment ORDER BY seg""".stripMargin

  private def q49CatSql(p: String): String =
    s"""WITH agg AS (
       |  SELECT p_brand, p_type,
       |    CAST(SUM($extSql) AS DOUBLE) AS rev,
       |    CAST(GROUPING(p_brand) AS INT) AS g_b, CAST(GROUPING(p_type) AS INT) AS g_t
       |  FROM ${p}lineitem JOIN ${p}part ON l_partkey = p_partkey
       |  GROUP BY ROLLUP (p_brand, p_type))
       |SELECT g_b, g_t, p_brand, p_type, rev, rk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY g_b, g_t
       |    ORDER BY rev DESC, p_brand ASC NULLS FIRST, p_type ASC NULLS FIRST) AS INT) AS rk
       |  FROM agg)
       |WHERE rk <= 5 ORDER BY g_b, g_t, rk""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q45_casework" -> ((q45_casework _, Some(q45_sql))),
    "q46_monthly_pivot" -> ((q46_monthly_pivot _, Some(q46_sql))),
    "q47_cte_reuse" -> ((q47_cte_reuse _, Some(q47_sql))),
    "q48_intersect_cohort" -> ((q48_intersect_cohort _, Some(q48_sql))),
    "q49_rollup_rank" -> ((q49_rollup_rank _, Some(q49_sql))),
    "q50_cumulative_channels" -> ((q50_cumulative_channels _, Some(q50_sql))),
    "q51_multi_supplier" -> ((q51_multi_supplier _, Some(q51_sql))),
    "q52_yoy_ratio" -> ((q52_yoy_ratio _, Some(q52_sql))),
    "q53_channel_union" -> ((q53_channel_union _, Some(q53_sql))),
    "q54_grouping_sets" -> ((q54_grouping_sets _, Some(q54_sql))),
    "q55_frequent_parts" -> ((q55_frequent_parts _, Some(q55_sql))),
    "q56_return_rate" -> ((q56_return_rate _, Some(q56_sql))),
    "c47_ds_cat_casework" -> ((ConnectorOps.viaCatalog(q45CatSql) _, Some(q45CatSql("")))),
    "c48_ds_cat_intersect" -> ((ConnectorOps.viaCatalog(q48CatSql) _, Some(q48CatSql("")))),
    "c49_ds_cat_rollup_rank" -> ((ConnectorOps.viaCatalog(q49CatSql) _, Some(q49CatSql("")))),
  )
}
