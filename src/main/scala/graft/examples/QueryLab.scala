package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicInteger

/** Dev utility: run one SparkEntry query repeatedly, reporting wall
  * time plus job/stage/task counts — isolates scheduling overhead from
  * compute for the sub-second bench queries. */
object QueryLab {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })

    val fn = graft.SparkEntry.queries(name)
    // warmup at smallest sf like Bench does
    fn(spark, "/root/testdata/sf0.001").count()
    for (r <- 1 to reps) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"LAB $name rep=$r time=$dt%.3f s rows=$n jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    // driver-side phase split for one fresh plan of the same query
    val qe = fn(spark, dir).queryExecution
    qe.executedPlan
    qe.tracker.phases.foreach { case (ph, t) =>
      println(f"PHASE $ph ${(t.endTimeMs - t.startTimeMs)}%d ms")
    }
    spark.stop()
  }
}
