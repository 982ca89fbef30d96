package graft.examples
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-batch wall/driver breakdown for st06 (local dev tool). */
object ProbeSt06 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var taskTime = 0L
    @volatile var nStages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        taskTime += sc.stageInfo.taskMetrics.executorRunTime; nStages += 1
      }
    })
    val fn = graft.SparkEntry.queries("st06_pg_stream_dedup")
    fn(spark, dir).count() // warm (builds the resident index)
    taskTime = 0; nStages = 0
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"ST06 wall=$wall%.2f stages=$nStages taskTime=${taskTime / 1000.0}%.2fs")
    spark.stop()
  }
}
