package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicInteger

/** Round-16 per-entry measurement harness — R15OptLab plus the r15
  * ADVICE fixes: (1) the whole-stage-codegen cache conf is mirrored
  * from Bench (4096, env-overridable) so lab MINs are comparable to
  * in-battery numbers instead of running at the static default of 100;
  * (2) a pass that throws is excluded from the MIN (its near-zero
  * fail-fast wall otherwise prints as a bogus fast run) — if every
  * pass failed the entry prints MIN=FAIL.
  *
  * Usage: runMain graft.examples.R16OptLab <names|-> [sfDir] [passes] [planTag|-]
  *   names    comma-separated SparkEntry keys
  *   planTag  when not "-", writes plans/r16/<name>_<planTag>.txt
  */
object R16OptLab {
  def main(args: Array[String]): Unit = {
    val entries =
      if (args.nonEmpty && args(0) != "-") args(0).split(",").toSeq
      else Seq("q25_percentile", "p52_cdc_chunks", "p26_ngram_dup_rate",
        "p22_cross_dedup", "q104_cross_nation")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val planTag = if (args.length > 3 && args(3) != "-") Some(args(3)) else None
    // SPARK_GRAFT_LAB_CPUS: the sf1 32-vs-8-core scaling table
    // (VERDICT r15 #7) needs per-entry MINs at both widths
    val labCpus = sys.env.getOrElse("SPARK_GRAFT_LAB_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$labCpus]")
      .config("spark.sql.shuffle.partitions", labCpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
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
        val ok =
          try { force(); true } catch { case e: Throwable =>
            System.err.println(s"LAB FAIL $name pass$r: ${e.getClass.getName}: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // listener drain
        println(f"LAB $name pass=$r wall=$dt%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}${if (ok) "" else " FAILED"}")
        hygiene()
        (dt, ok)
      }
      val good = walls.filter(_._2).map(_._1)
      if (good.nonEmpty) println(f"LAB $name MIN=${good.min}%.3f")
      else println(s"LAB $name MIN=FAIL")
      planTag.foreach { tag =>
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(s"plans/r16/${name}_$tag.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
        println(s"LAB $name plan -> $p")
        // the formatted explain of an AQE plan is pre-execution (shows
        // duplicated subtrees that runtime exchange reuse dedups) —
        // dump the post-execution adaptive plan too, where
        // ReusedExchange / final join strategies are visible
        df.queryExecution.toRdd.foreach(_ => ())
        val p2 = java.nio.file.Paths.get(s"plans/r16/${name}_${tag}_executed.txt")
        java.nio.file.Files.write(p2,
          df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
        println(s"LAB $name executed plan -> $p2")
      }
    }
    spark.stop()
  }
}
