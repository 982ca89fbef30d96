package graft.examples

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Round-16 in-battery decomposition probe (VERDICT r15 ask #2): runs
  * the battery under the EXACT Bench protocol (same session confs,
  * warmup pass, N timed passes, inter-entry unpersist hygiene,
  * `toRdd.foreach` forcing) with a SparkListener that attributes every
  * stage to the entry occurrence that ran it. For every entry it
  * prints one line per occurrence (wall + summed task metrics); for
  * WATCHED entries it additionally prints a per-stage metric table and
  * dumps the post-execution (AQE-final) physical plan per occurrence,
  * so a fast and a slow occurrence of a bimodal entry (p22) can be
  * diffed stage by stage from INSIDE a full battery run — isolated
  * reruns do not reproduce the session pressure that causes the
  * bimodality in the first place.
  *
  * Usage: runMain graft.examples.R16BatteryProbe [sfDir] [passes] [watched,csv]
  * Env: SPARK_GRAFT_ONLY / SPARK_GRAFT_CPUS / SPARK_GRAFT_CODEGEN_CACHE
  * honored as in Bench. Plan dumps: /tmp/probe_<entry>_<occ>.plan.txt
  */
object R16BatteryProbe {
  final case class StageRow(id: Int, name: String, tasks: Int,
      wallMs: Long, runMs: Long, cpuMs: Long, gcMs: Long, fetchWaitMs: Long,
      shufReadMB: Double, shufWriteMB: Double, inputMB: Double,
      spillMB: Double, peakMemMB: Double)

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val watched: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set("p22_cross_dedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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

    // stage → occurrence attribution: jobs started while `current` is
    // set belong to it; a job's stage ids map through to the rows
    @volatile var current: String = "-"
    val stageOwner = TrieMap.empty[Int, String]
    val rows = TrieMap.empty[Int, StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val owner = current
        j.stageIds.foreach(sid => stageOwner.putIfAbsent(sid, owner))
        ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(0L)
        rows.put(si.stageId, StageRow(si.stageId,
          si.name.takeWhile(_ != '\n').take(64), si.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime,
          m.shuffleReadMetrics.fetchWaitTime,
          (m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
          m.peakExecutionMemory / 1e6))
        ()
      }
    })

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = graft.SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    def hygiene(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!graft.ResidentCaches.contains(id)) rdd.unpersist(blocking = false)
      }

    def runOcc(name: String, occ: String): Unit = {
      val fn = queries(name)
      current = s"$name/$occ"
      val df = fn(spark, dir)
      val t0 = System.nanoTime()
      try df.queryExecution.toRdd.foreach(_ => ())
      catch { case e: Throwable =>
        System.err.println(s"PROBE FAIL $name/$occ: ${e.getClass.getName}: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      current = "-"
      Thread.sleep(120) // listener drain
      val mine = rows.filter { case (sid, _) => stageOwner.get(sid).contains(s"$name/$occ") }
        .values.toSeq.sortBy(_.id)
      val run = mine.map(_.runMs).sum; val cpu = mine.map(_.cpuMs).sum
      val gc = mine.map(_.gcMs).sum; val fw = mine.map(_.fetchWaitMs).sum
      val sr = mine.map(_.shufReadMB).sum; val sw = mine.map(_.shufWriteMB).sum
      val sp = mine.map(_.spillMB).sum
      println(f"PROBE $name occ=$occ wall=$dt%.3f stages=${mine.size} tasks=${mine.map(_.tasks).sum} " +
        f"runS=${run / 1e3}%.2f cpuS=${cpu / 1e3}%.2f gcS=${gc / 1e3}%.2f fwS=${fw / 1e3}%.2f " +
        f"srMB=$sr%.1f swMB=$sw%.1f spillMB=$sp%.1f")
      if (watched(name)) {
        mine.foreach { r =>
          println(f"  STAGE ${r.id}%5d t=${r.tasks}%4d wall=${r.wallMs / 1e3}%7.2f run=${r.runMs / 1e3}%7.2f " +
            f"cpu=${r.cpuMs / 1e3}%7.2f gc=${r.gcMs / 1e3}%6.2f fw=${r.fetchWaitMs / 1e3}%6.2f " +
            f"in=${r.inputMB}%8.1f sr=${r.shufReadMB}%8.1f sw=${r.shufWriteMB}%8.1f " +
            f"spill=${r.spillMB}%7.1f peak=${r.peakMemMB}%7.1f  ${r.name}")
        }
        val p = java.nio.file.Paths.get(s"/tmp/probe_${name}_$occ.plan.txt")
        java.nio.file.Files.write(p, df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
        println(s"  PLAN -> $p")
      }
      hygiene()
    }

    queries.keys.foreach(n => runOcc(n, "warm"))
    (1 to passes).foreach { p => queries.keys.foreach(n => runOcc(n, s"p$p")) }
    spark.stop()
  }
}
