package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Example: bucketed co-located joins and salted skew joins.
  * Run: sbt "runMain graft.examples.ScaleDemo"
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val wh = Files.createTempDirectory("graft_demo_wh").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val o = graft.Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Scale.writeBucketed(o, "demo_orders", "o_orderkey", 8)
    Scale.writeBucketed(li, "demo_lineitem", "o_orderkey", 8)
    val joined = Scale.bucketedJoin(spark, "demo_orders", "demo_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    println(s"bucketed-join rows=${joined.count()} exchanges=" +
      plan.linesIterator.count(_.contains("Exchange")))

    val salted = Scale.saltedJoin(li, o.select("o_orderkey", "o_custkey"),
      "o_orderkey", saltBuckets = 8)
    val plain = li.join(o.select("o_orderkey", "o_custkey"), "o_orderkey")
    println(s"salted-join rows=${salted.count()} plain=${plain.count()}")
    spark.stop()
  }
}
