package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev utility: row counts of one SparkEntry query at several scale
  * dirs — verifies whether a super-linear runtime at 10× data is
  * output-cardinality growth (replica-artifact duplicate groups) or
  * plan decay. */
object CountLab {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    dirs.foreach { d =>
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      println(f"COUNT $name $d rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
