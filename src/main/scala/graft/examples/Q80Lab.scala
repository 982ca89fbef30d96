package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** q80 round-11 follow-up: does the q96/p20 range-first lesson apply
  * to the terminal groupBy(custkey) + ORDER BY? Variants:
  *  - committed: hash agg (partial+final) then terminal range sort
  *  - range_complete: repartitionByRange(o_custkey) on the JOINED
  *    fact, complete agg per partition, local sort — one exchange of
  *    raw joined rows replaces partial-carrying hash + result range
  * The partial aggregate barely reduces here (custkeys repeat little
  * within an orderkey-partitioned fact), so the raw-row range
  * exchange is not obviously worse — measure, don't argue.
  * Usage: runMain graft.examples.Q80Lab [sfDir] [variants]
  */
object Q80Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only: Option[Seq[String]] =
      if (args.length > 1) Some(args(1).split(",").toSeq) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      if (only.exists(ps => !ps.exists(name.startsWith))) return
      df.queryExecution.toRdd.foreach(_ => ()) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q80 $name%-26s ${ts.min}%.3f s")
    }

    def joined = {
      val li = graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .repartition(col("l_orderkey"))
      val ret = graft.Tables.load(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_ok"), col("l_linenumber").as("r_ln"),
          col("l_quantity").as("r_qty"))
        .repartition(col("r_ok"))
      li.join(ret.hint("shuffle_hash"),
          col("l_orderkey") === col("r_ok") && col("l_linenumber") === col("r_ln"),
          "left_outer")
        .join(graft.Tables.load(spark, dir, "orders").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
    }

    time("committed_hash_then_sort") {
      joined
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum((col("l_quantity") - coalesce(col("r_qty"), lit(0.0)))
            .cast(DecimalType(18, 2))).cast("double").as("net_qty"))
        .orderBy(col("o_custkey"))
    }
    time("range_complete_localsort") {
      joined
        .repartitionByRange(col("o_custkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum((col("l_quantity") - coalesce(col("r_qty"), lit(0.0)))
            .cast(DecimalType(18, 2))).cast("double").as("net_qty"))
        .sortWithinPartitions(col("o_custkey"))
    }
    spark.stop()
  }
}
