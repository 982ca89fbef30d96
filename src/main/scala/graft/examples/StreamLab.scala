package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Dev utility: where does the fixed cost of a one-shot AvailableNow
  * streaming query go? */
object StreamLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    time("batch_warm")(spark.read.parquet(s"$dir/events.parquet").count())

    def run(label: String, parts: Int, agg: Boolean, once: Boolean = false): Unit = {
      val name = s"lab_${label}_${System.nanoTime()}"
      val ckpt = s"/dev/shm/graft_lab_$name"
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val q0 =
        if (!agg) src.groupBy().count()
        else graft.Tables.withEventTs(src)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      time(s"$label parts=$parts") {
        val q = q0.writeStream.outputMode("complete")
          .format("memory").queryName(name)
          .option("checkpointLocation", ckpt)
          .trigger(if (once) Trigger.Once() else Trigger.AvailableNow()).start()
        q.awaitTermination()
        q.recentProgress.foreach(pr => println(s"PROG batch=${pr.batchId} ${pr.durationMs}"))
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }

    run("warm_cold", 2, agg = true)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    run("mpb4m_p2_a", 2, agg = true)
    run("mpb4m_p2_b", 2, agg = true)
    run("mpb4m_p4", 4, agg = true)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    run("back128_p2", 2, agg = true)

    spark.stop()
  }
}
