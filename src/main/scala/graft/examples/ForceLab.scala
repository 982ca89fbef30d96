package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe: count() vs full materialization (noop write) timings for
  * one battery entry — quantifies how much terminal projection/window
  * work Catalyst's count-rewrite prunes out of a `.count()`-forced
  * benchmark. */
object ForceLab {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count(); fn(spark, dir).write.format("noop").mode("overwrite").save() // warm both paths
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def rddForce(): Unit =
      fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
    rddForce() // warm
    val c = math.min(t(fn(spark, dir).count()), t(fn(spark, dir).count()))
    val w = math.min(
      t(fn(spark, dir).write.format("noop").mode("overwrite").save()),
      t(fn(spark, dir).write.format("noop").mode("overwrite").save()))
    val r = math.min(t(rddForce()), t(rddForce()))
    println(f"FORCE $name count=$c%.3f noop=$w%.3f rdd=$r%.3f")
    spark.stop()
  }
}
