package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** p20 pin-vs-flow A/B: with AQE, BOTH localCheckpoint and persist()
  * hide the range partitioning from downstream operators (LogicalRDD
  * drops it; cached plans re-wrap in AdaptiveSparkPlan), so the
  * per-doc window re-exchanges by hash and a partition-local terminal
  * sort is no longer a total order. Variants:
  *  - pinned_orderby: keep the checkpoint pin (df branch reads the
  *    materialized tf), accept the window hash exchange, restore the
  *    total order with a result-sized ORDER BY (3 rows/doc — small)
  *  - flow_localsort: NO pin — range partitioning flows scan→agg→
  *    window→local sort with zero further exchanges, but the df
  *    branch re-executes the scan+explode+aggregate chain
  * Usage: runMain graft.examples.P20Lab [sfDir]
  */
object P20Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      df.queryExecution.toRdd.foreach(_ => ()) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"P20 $name%-22s ${ts.min}%.3f s")
    }

    val tokens = split(trim(col("text")), "\\s+")
    def base = {
      val docs = graft.Tables.load(spark, dir, "documents")
      docs.select(col("doc_id"), col("text"))
        .repartitionByRange(col("doc_id"))
        .select(col("doc_id"), explode(tokens).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    }
    def total = graft.Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), asc("token"))

    def scoreTop(tf: DataFrame, dfreq: DataFrame): DataFrame =
      tf.join(broadcast(dfreq), "token")
        .crossJoin(broadcast(total))
        .withColumn("score", col("tf").cast("double") * col("n_total") / col("df"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), col("tf"), col("df"),
          col("score"))

    time("pinned_orderby") {
      val tf = base.localCheckpoint()
      scoreTop(tf, tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
        .orderBy(col("doc_id"), col("rk"))
    }
    time("flow_localsort") {
      val tf = base
      scoreTop(tf, tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
        .sortWithinPartitions(col("doc_id"), col("rk"))
    }
    spark.stop()
  }
}
