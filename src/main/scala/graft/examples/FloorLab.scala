package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Floor attribution for the round-8 pass: times the components of a
  * slow-vs-baseline entry inside ONE warm JVM (scan-only, each added
  * operator layer, forcing included) so the irreducible floor is
  * measured, not argued. Usage: runMain graft.examples.FloorLab [sfDir]
  */
object FloorLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // optional 2nd arg: comma-separated variant-name prefixes to run
    val only: Option[Seq[String]] =
      if (args.length > 1) Some(args(1).split(",").toSeq) else None
    def time(name: String)(df: => DataFrame): Unit = {
      if (only.exists(ps => !ps.exists(name.startsWith))) return
      df.queryExecution.toRdd.foreach(_ => ()) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"FLOOR $name%-28s ${ts.min}%.3f s")
    }

    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    val raw = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))

    time("scan_only")(raw)
    time("scan_spread")(
      graft.operators.Scale.spreadByKey(raw, Seq(col("l_orderkey"))))
    time("two_level_agg") {
      graft.operators.Scale.spreadByKey(raw, Seq(col("l_orderkey")))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("__n"), sum(dec(col("l_extendedprice"))).as("__rev"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("__n")).as("n_lines"),
          sum(col("__rev")).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
    }
    time("plus_orderby")(
      graft.SparkEntry.queries("q96_having_distinct")(spark, dir))
    time("expand_distinct") {
      graft.operators.Scale.spreadByKey(raw, Seq(col("l_orderkey")))
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
        .orderBy(col("l_orderkey"))
    }
    time("nospread_twolevel") {
      raw.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("__n"), sum(dec(col("l_extendedprice"))).as("__rev"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("__n")).as("n_lines"),
          sum(col("__rev")).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
        .orderBy(col("l_orderkey"))
    }
    time("nospread_expand") {
      raw.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
        .orderBy(col("l_orderkey"))
    }
    time("nospread_expand_nosort") {
      raw.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
    }
    time("spread32_expand") {
      graft.operators.Scale.spreadByKey(raw, Seq(col("l_orderkey")), cap = 32)
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
        .orderBy(col("l_orderkey"))
    }
    // round-11: ONE range exchange serves the aggregations AND the
    // total order — RangePartitioning(l_orderkey) satisfies both
    // groupBys' clustering requirement, so the final sort is
    // partition-local and the result-sized range exchange + sample
    // pass of a terminal ORDER BY disappears
    time("range_twolevel_localsort") {
      raw.repartitionByRange(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("__n"), sum(dec(col("l_extendedprice"))).as("__rev"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("__n")).as("n_lines"),
          sum(col("__rev")).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
        .sortWithinPartitions(col("l_orderkey"))
    }
    time("range_expand_localsort") {
      raw.repartitionByRange(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("order_rev"))
        .filter(col("n_supp") >= 3)
        .sortWithinPartitions(col("l_orderkey"))
    }
    spark.stop()
  }
}
