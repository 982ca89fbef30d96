package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch decomposition of q25's percentile chain (round-15 lab):
  * times each prefix of the price-column chain under the bench forcing
  * so the wall attributes to scan / spread exchange / counting agg /
  * window / bracket agg, not to guesses. Not part of the battery. */
object Q25Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String, df: => DataFrame): Unit = {
      val d = df
      d.queryExecution.toRdd.foreach(_ => ()) // warm
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        d.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name MIN=${walls.min}%.3f")
    }

    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))

    time("scan", li)
    val spreadRows = graft.operators.Scale
      .spreadByKey(li, Seq(col("l_returnflag"), col("v")))
    time("scan+spread", spreadRows)
    val cnts = spreadRows.groupBy(col("l_returnflag"), col("v"))
      .agg(count(lit(1)).as("c"))
    time("scan+spread+agg", cnts)
    val cntsNoSpread = li.groupBy(col("l_returnflag"), col("v"))
      .agg(count(lit(1)).as("c"))
    time("scan+agg(nospread)", cntsNoSpread)
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("v"))
    val cum = cnts.withColumn("cum", sum(col("c")).over(w))
    time("...+cumwindow", cum)
    val cum2 = cum.withColumn("n", sum(col("c")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    time("...+bothwindows", cum2)
    val fin = cum2.groupBy(col("l_returnflag"))
      .agg(max(when(col("cum") - col("c") <= 100000L && col("cum") > 100000L,
        col("v"))).as("pick"))
    time("full", fin)
    spark.stop()
  }
}
