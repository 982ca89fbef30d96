package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicInteger

/** Round-15 optimization measurement harness (guide §1): for a list of
  * SparkEntry entries, runs warm + min-of-N timed passes under the
  * EXACT bench forcing (`queryExecution.toRdd.foreach` — never
  * `.count()`, whose Catalyst rewrite prunes terminal
  * projections/windows/sorts and a terminal groupBy's aggregate
  * expressions), printing wall seconds plus job/stage/task counts so
  * scheduling overhead separates from compute, and optionally dumping
  * `.explain("formatted")` to plans/r15/<name>_<tag>.txt.
  *
  * Usage: runMain graft.examples.R15OptLab <names|-> [sfDir] [passes] [planTag|-]
  *   names    comma-separated SparkEntry keys, or "-" for the bench top set
  *   planTag  when not "-", writes plans/r15/<name>_<planTag>.txt
  */
object R15OptLab {
  val DefaultEntries: Seq[String] = Seq(
    "q25_percentile", "q51_multi_supplier", "q97_argmax_joinback",
    "q06_join_multi", "c54_ds_cat_union_reagg", "c32_tpch_q16",
    "q55_frequent_parts", "q49_rollup_rank", "q102_revenue_share",
    "p30_unigram_lm", "p33_ppl_buckets")

  def main(args: Array[String]): Unit = {
    val entries =
      if (args.nonEmpty && args(0) != "-") args(0).split(",").toSeq
      else DefaultEntries
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val planTag = if (args.length > 3 && args(3) != "-") Some(args(3)) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.FastDoubleDecimalSumRule.install(spark)

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        ()
      }
    })

    def hygiene(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!graft.ResidentCaches.contains(id)) rdd.unpersist(blocking = false)
      }

    entries.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def force(): Unit = fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
      try force() catch { case e: Throwable =>
        System.err.println(s"LAB FAIL $name warm: ${e.getClass.getName}: ${e.getMessage}")
      }
      hygiene()
      val walls = (1 to passes).map { r =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        try force() catch { case e: Throwable =>
          System.err.println(s"LAB FAIL $name pass$r: ${e.getClass.getName}: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // listener drain
        println(f"LAB $name pass=$r wall=$dt%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
        hygiene()
        dt
      }
      println(f"LAB $name MIN=${walls.min}%.3f")
      planTag.foreach { tag =>
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(s"plans/r15/${name}_$tag.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
        println(s"LAB $name plan -> $p")
      }
    }
    spark.stop()
  }
}
