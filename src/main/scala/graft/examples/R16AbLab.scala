package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the r16 rewrites: the box's phase swings 25-30%
  * between JVMs within an hour (r15 note), so cross-JVM before/after
  * MINs need a control-entry adjustment that is itself noisy. This
  * main interleaves OLD and NEW forms of one entry A/B/A/B in a single
  * session (bench forcing, warm discard), so phase cancels.
  *
  * Usage: runMain graft.examples.R16AbLab <q25|p52> [sfDir] [rounds]
  */
object R16AbLab {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q25")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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

    def oldQ25(): DataFrame = {
      val li = graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      graft.queries.Relational.exactPercentiles(li, "l_returnflag", Seq(
        (col("l_quantity"), "q", 1.0, Seq(0.5 -> "median_qty", 0.9 -> "p90_qty")),
        (col("l_extendedprice"), "p", 128.0, Seq(0.5 -> "median_price"))))
        .orderBy(col("l_returnflag"))
    }
    def newQ25(): DataFrame = graft.queries.Relational.q25_percentile(spark, dir)

    def chunksOf(): DataFrame = {
      val docs = graft.operators.Scale.spread(
        graft.Tables.load(spark, dir, "documents")
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tok")))
      graft.operators.TextOps.cdcChunks(docs, "doc_id", "tok", w = 8, mask = 16)
    }
    // the r15 window form, inline (replaced in Pipeline9 this round)
    def oldP52(): DataFrame = {
      val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("c_fp"))
      chunksOf()
        .withColumn("first",
          min(struct(col("doc_id").as("d"), col("idx").as("i"))).over(wFp))
        .select(col("doc_id"), col("c_len"),
          when(col("doc_id") === col("first.d") && col("idx") === col("first.i"), 0L)
            .otherwise(1L).as("is_dup"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("is_dup")).as("n_dup_chunks"),
          sum(when(col("is_dup") === 1, col("c_len")).otherwise(0L)).as("dup_tok"))
        .orderBy(col("doc_id"))
    }
    def newP52(): DataFrame = graft.queries.Pipeline9.p52_cdc_chunks(spark, dir)

    // Synthetic boilerplate corpus (the 100 TB hazard in miniature):
    // every document shares a 64-token boilerplate prefix, so its ~4
    // CDC chunks repeat in EVERY doc — the window form ships each hot
    // fp's full occurrence list (|docs| rows) to one reducer and
    // buffers it in the frame; the aggregate form collapses it
    // map-side. nDocs scales the hazard linearly.
    def skewDocs(nDocs: Int): DataFrame = {
      val boiler = (1 to 64).map(i => s"b$i").mkString(" ")
      spark.range(nDocs.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", lit(boiler) +:
          (1 to 36).map(j => concat(lit(s"u${j}_"), col("id"))): _*).as("text"))
        .select(col("doc_id"), split(col("text"), " ").as("tok"))
        .repartition(32)
    }
    def skewChunks(nDocs: Int): DataFrame =
      graft.operators.TextOps.cdcChunks(skewDocs(nDocs), "doc_id", "tok",
        w = 8, mask = 16)
    def oldP52On(ch: DataFrame): DataFrame = {
      val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("c_fp"))
      ch.withColumn("first",
          min(struct(col("doc_id").as("d"), col("idx").as("i"))).over(wFp))
        .select(col("doc_id"), col("c_len"),
          when(col("doc_id") === col("first.d") && col("idx") === col("first.i"), 0L)
            .otherwise(1L).as("is_dup"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("is_dup")).as("n_dup_chunks"),
          sum(when(col("is_dup") === 1, col("c_len")).otherwise(0L)).as("dup_tok"))
        .orderBy(col("doc_id"))
    }
    def newP52On(ch: DataFrame): DataFrame = {
      val chunks = ch.repartition(
        spark.sparkContext.defaultParallelism, col("doc_id"), col("c_fp"))
      val docTotals = chunks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("c_len")).as("tot_tok"))
      val winners = chunks.groupBy(col("c_fp"))
        .agg(min(col("doc_id")).as("win_doc"), min(col("c_len")).as("l"))
      val winsPerDoc = winners.groupBy(col("win_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_win"), sum(col("l")).as("win_tok"))
      docTotals.join(winsPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          (col("n_chunks") - coalesce(col("n_win"), lit(0L))).as("n_dup_chunks"),
          (col("tot_tok") - coalesce(col("win_tok"), lit(0L))).as("dup_tok"))
        .orderBy(col("doc_id"))
    }
    val skewN = sys.env.get("SPARK_GRAFT_SKEW_DOCS").map(_.toInt).getOrElse(200000)
    // skew A/B isolates the contested dedup stage: the chunk relation
    // materializes ONCE (outside the timed region) and both forms read
    // the same blocks, so corpus generation/chunking noise cancels
    lazy val skewChk = {
      val c = skewChunks(skewN).localCheckpoint()
      println(s"AB p52skew chunks=${c.count()} docs=$skewN")
      c
    }
    val (oldF, newF): (() => DataFrame, () => DataFrame) = which match {
      case "q25" => (oldQ25 _, newQ25 _)
      case "p52" => (oldP52 _, newP52 _)
      case "p52skew" => (() => oldP52On(skewChk), () => newP52On(skewChk))
      case x => sys.error(s"unknown entry $x")
    }
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        val wall = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(0L)
        stageLog.add(f"    stage=${si.stageId} t=${si.numTasks} wall=${wall / 1e3}%.2f " +
          f"run=${m.executorRunTime / 1e3}%.2f cpu=${m.executorCpuTime / 1e9}%.2f " +
          f"gc=${m.jvmGCTime / 1e3}%.2f spill=${(m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6}%.0fMB " +
          f"sr=${(m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead) / 1e6}%.0fMB")
        ()
      }
    })
    val verbose = sys.env.get("SPARK_GRAFT_AB_STAGES").exists(_.toBoolean)
    def force(f: () => DataFrame): Double = {
      stageLog.clear()
      val df = f()
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      val dt = (System.nanoTime() - t0) / 1e9
      if (verbose) {
        Thread.sleep(150)
        stageLog.forEach(s => println(s))
        sys.env.get("SPARK_GRAFT_AB_PLAN").foreach { p =>
          java.nio.file.Files.write(java.nio.file.Paths.get(p),
            df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
        }
      }
      dt
    }
    force(oldF); force(newF) // warm both
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    (1 to rounds).foreach { r =>
      olds += force(oldF); news += force(newF)
      println(f"AB $which round=$r old=${olds.last}%.3f new=${news.last}%.3f")
    }
    println(f"AB $which OLD min=${olds.min}%.3f med=${olds.sorted.apply(olds.size / 2)}%.3f " +
      f"NEW min=${news.min}%.3f med=${news.sorted.apply(news.size / 2)}%.3f")
    spark.stop()
  }
}
