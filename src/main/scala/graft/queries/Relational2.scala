package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Second relational battery file: statistical aggregates, grouping
  * sets, EXISTS subqueries, ordered string aggregation, pivot,
  * non-equi (band) joins, bounded window frames, and FILTERed
  * aggregates — the remainder of the host-engine surface the reference
  * delegates to DuckDB (SURVEY.md §2.3; the reference's own test corpus
  * runs TPC-H/DS through the connector, `test/sql/scanner/tpch.test`).
  *
  * Oracle-parity conventions follow `Relational`: exact DECIMAL
  * accumulation for every float sum, identical final double-arithmetic
  * expression text on both sides (variance/correlation are computed
  * from exact decimal moments and combined in ONE deterministic double
  * expression — never via the engines' own `var_samp`/`corr`, whose
  * summation order is partition-dependent), and a total ORDER BY.
  */
object Relational2 {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // q31: statistical aggregates from exact moments. Decimal first
  // moments (partial-aggregated map-side, order-independent), one
  // double-precision combine at the end — bit-identical across any
  // partitioning, so it scales to any cluster layout.
  // ---------------------------------------------------------------- //
  def q31_stats_agg(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DecimalFastFunctions.register(s)
    import graft.functions.DecimalFastFunctions.{sum_unscaled_safe, unscaled_of_double}
    val li = t(s, dir, "lineitem")
    // Integer-cents row values, so every moment is an INTEGRAL decimal.
    // Casting a scale-s decimal whose scaled value exceeds 2^53 to
    // double rounds TWICE in DuckDB (int128→double, then ·10^-s) but
    // once in Spark (BigDecimal, correctly rounded) — a 1-ulp mismatch.
    // An integral decimal casts with a single rounding in both engines;
    // the 10^-s division then happens in identical double arithmetic.
    //
    // r15: the five moment sums ride unscaled LONGS end-to-end — the
    // decimal form paid a per-row BigDecimal multiply AND a non-compact
    // DECIMAL(38,0) accumulate on every fact row. Per-row products stay
    // far inside a long (qi ≤ 5×10^3·cents, pi ≤ 1.1×10^7·cents →
    // pi² ≤ 1.3×10^14 < 2^60); the per-flag totals are fixed-cardinality
    // × growing groups, so each rides the spill-guarded any-cardinality
    // accumulator to the exact same integral DECIMAL the decimal path
    // produced — identical values, zero per-row allocation.
    val rows = li.select(col("l_returnflag"),
      unscaled_of_double(col("l_quantity"), 2).as("qi"),
      unscaled_of_double(col("l_extendedprice"), 2).as("pi"))
    val m0 = rows.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum_unscaled_safe(col("qi"), 28, 0).as("i1q"),
      sum_unscaled_safe(col("qi") * col("qi"), 38, 0).as("i2q"),
      sum_unscaled_safe(col("pi"), 28, 0).as("i1p"),
      sum_unscaled_safe(col("pi") * col("pi"), 38, 0).as("i2p"),
      sum_unscaled_safe(col("qi") * col("pi"), 38, 0).as("i11"))
    val m = m0.select(col("l_returnflag"), col("n"),
      (col("i1q").cast("double") / lit(100.0)).as("s1q"),
      (col("i2q").cast("double") / lit(10000.0)).as("s2q"),
      (col("i1p").cast("double") / lit(100.0)).as("s1p"),
      (col("i2p").cast("double") / lit(10000.0)).as("s2p"),
      (col("i11").cast("double") / lit(10000.0)).as("s11"))
    val n = col("n")
    val varQ = (col("s2q") - col("s1q") * col("s1q") / n) / (n - lit(1))
    val varP = (col("s2p") - col("s1p") * col("s1p") / n) / (n - lit(1))
    val cov = (col("s11") - col("s1q") * col("s1p") / n) / (n - lit(1))
    m.select(col("l_returnflag"), n,
        col("s1q").as("sum_qty"), col("s1p").as("sum_price"),
        varQ.as("var_qty"), sqrt(varQ).as("std_qty"),
        (cov / sqrt(varQ * varP)).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  val q31_sql: String =
    """WITH mi AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(qi) AS i1q,
      |    SUM(CAST(qi * qi AS DECIMAL(38,0))) AS i2q,
      |    SUM(pi) AS i1p,
      |    SUM(CAST(pi * pi AS DECIMAL(38,0))) AS i2p,
      |    SUM(CAST(qi * pi AS DECIMAL(38,0))) AS i11
      |  FROM (SELECT l_returnflag,
      |          CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS qi,
      |          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS pi
      |        FROM lineitem)
      |  GROUP BY l_returnflag),
      |m AS (
      |  SELECT l_returnflag, n,
      |    CAST(i1q AS DOUBLE) / 100.0 AS s1q, CAST(i2q AS DOUBLE) / 10000.0 AS s2q,
      |    CAST(i1p AS DOUBLE) / 100.0 AS s1p, CAST(i2p AS DOUBLE) / 10000.0 AS s2p,
      |    CAST(i11 AS DOUBLE) / 10000.0 AS s11
      |  FROM mi)
      |SELECT l_returnflag, n, s1q AS sum_qty, s1p AS sum_price,
      |  (s2q - s1q * s1q / n) / (n - 1) AS var_qty,
      |  sqrt((s2q - s1q * s1q / n) / (n - 1)) AS std_qty,
      |  ((s11 - s1q * s1p / n) / (n - 1)) /
      |    sqrt(((s2q - s1q * s1q / n) / (n - 1)) * ((s2p - s1p * s1p / n) / (n - 1)))
      |    AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- //
  // q32: GROUPING SETS with grouping() flags. One shared ANSI text —
  // Spark expands to a single Expand + hash aggregate (one shuffle for
  // all four grouping sets, not four scans).
  // ---------------------------------------------------------------- //
  val q32_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
      |                        (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  def q32_grouping_sets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q32_sql)
  }

  // ---------------------------------------------------------------- //
  // q33: EXISTS / NOT EXISTS correlated subqueries — Catalyst rewrites
  // both to one semi and one anti hash join on o_custkey (no per-row
  // subquery execution; verify with explain: two shuffles max, AQE
  // may broadcast the aggregated sides).
  // ---------------------------------------------------------------- //
  val q33_sql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  def q33_exists_subquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q33_sql)
  }

  // ---------------------------------------------------------------- //
  // q34: ordered string aggregation. Spark's collect_list order is
  // partition-dependent, so determinism comes from array_sort before
  // the join — same contract as DuckDB's string_agg(... ORDER BY).
  // ---------------------------------------------------------------- //
  def q34_string_agg(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_acctbal") > 9900)
    val nat = t(s, dir, "nation")
    cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
      .orderBy(col("n_name"))
  }

  val q34_sql: String =
    """SELECT n_name, COUNT(*) AS n_cust,
      |  string_agg(c_name, ',' ORDER BY c_name) AS names
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 9900
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- //
  // q35: pivot (priority columns per order status). Spark's relational
  // pivot with an EXPLICIT value list — one pass, no per-value scan;
  // at scale this is a single hash aggregate over (status) with five
  // conditional partial aggregates.
  // ---------------------------------------------------------------- //
  private val prios = Seq(
    "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
    "4-NOT SPECIFIED" -> "p4_notspec", "5-LOW" -> "p5_low")

  def q35_pivot(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios.map(_._1))
      .agg(sum(dec(col("o_totalprice"))).cast("double"))
      .select(col("o_orderstatus") +:
        prios.map { case (v, a) => col(s"`$v`").as(a) }: _*)
      .orderBy(col("o_orderstatus"))
  }

  val q35_sql: String = {
    val cols = prios.map { case (v, a) =>
      s"CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS $a"
    }.mkString(",\n  ")
    s"""SELECT o_orderstatus,
       |  $cols
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // q36: non-equi band join — parts bucketed into price bands defined
  // by a 5-row inline relation. The tiny side is broadcast, so the
  // inequality join is a BroadcastNestedLoop over 5 rows per record
  // (never a cartesian shuffle); this is the 100 TB shape for
  // dimension-band joins (bands broadcast, fact side streamed).
  // ---------------------------------------------------------------- //
  private val bands: Seq[(String, Double, Double)] = Seq(
    ("b1_900_920", 900.0, 920.0), ("b2_920_940", 920.0, 940.0),
    ("b3_940_960", 940.0, 960.0), ("b4_960_980", 960.0, 980.0),
    ("b5_980_1000", 980.0, 1000.0))

  def q36_range_join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = t(s, dir, "part")
    val b = bands.toDF("band", "lo", "hi")
    p.join(broadcast(b),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"),
        sum(dec(col("p_retailprice"))).cast("double").as("sum_price"))
      .orderBy(col("band"))
  }

  val q36_sql: String = {
    val vals = bands.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")
    s"""SELECT band, COUNT(*) AS n_parts,
       |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       |FROM part JOIN (VALUES $vals) b(band, lo, hi)
       |  ON p_retailprice >= lo AND p_retailprice < hi
       |GROUP BY band ORDER BY band""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // q37: bounded window frames — rolling 4-order spend (ROWS frame)
  // and per-customer quartile (ntile). One shuffle on o_custkey for
  // both windows (same partitioning + ordering, Spark reuses the sort).
  // ---------------------------------------------------------------- //
  def q37_window_frames(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val o = t(s, dir, "orders")
    o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(ord.rowsBetween(-3, 0))
          .cast("double").as("roll4_spend"),
        ntile(4).over(ord).as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q37_sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll4_spend,
      |  CAST(NTILE(4) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- //
  // q38: FILTERed aggregates — one scan, conditional partial
  // aggregation (the classic one-pass segmented-metrics shape).
  // ---------------------------------------------------------------- //
  val q38_sql: String =
    """SELECT o_orderstatus,
      |  COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_sum
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  def q38_filtered_agg(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q38_sql)
  }

  // ---------------------------------------------------------------- //
  // q39: LATERAL correlated subquery — per-outer-row top-N, the
  // "top 2 customers per nation" shape. One SQL text runs on both
  // engines; Spark decorrelates the LIMIT-bearing subquery into a
  // ranked window join (no per-row re-execution — the plan is a
  // partitioned top-N, which is what scales).
  // ---------------------------------------------------------------- //
  val q39_sql: String =
    """SELECT n_name, c_name, acctbal FROM nation,
      |LATERAL (
      |  SELECT c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
      |  FROM customer WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2
      |) AS t
      |ORDER BY n_name, acctbal DESC, c_name""".stripMargin

  def q39_lateral_topn(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q39_sql)
  }

  /** name → (query fn, oracle sql) */
  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q39_lateral_topn" -> ((q39_lateral_topn _, q39_sql)),
    "q31_stats_agg" -> ((q31_stats_agg _, q31_sql)),
    "q32_grouping_sets" -> ((q32_grouping_sets _, q32_sql)),
    "q33_exists_subquery" -> ((q33_exists_subquery _, q33_sql)),
    "q34_string_agg" -> ((q34_string_agg _, q34_sql)),
    "q35_pivot" -> ((q35_pivot _, q35_sql)),
    "q36_range_join" -> ((q36_range_join _, q36_sql)),
    "q37_window_frames" -> ((q37_window_frames _, q37_sql)),
    "q38_filtered_agg" -> ((q38_filtered_agg _, q38_sql)),
  )
}
