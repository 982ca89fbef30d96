package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object ProbeLab {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "c27_tpch_q11"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b
        stageLog.add(f"stage=${si.stageId} tasks=${si.numTasks} wall=${wall.getOrElse(-1L)}ms taskTime=${si.taskMetrics.executorRunTime}ms name=${si.name.take(60)}")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    // count transport statements during one warm rep
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    graft.meta.PgTransportFactory.debugShowQueries = true
    val buf = new java.io.ByteArrayOutputStream()
    var dt = 0.0
    Console.withOut(new java.io.PrintStream(buf, true)) {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      dt = (System.nanoTime() - t0) / 1e9
    }
    graft.meta.PgTransportFactory.debugShowQueries = false
    val lines = buf.toString.linesIterator.filter(_.startsWith("[postgres]")).toSeq
    stageLog.clear()
    val t1 = System.nanoTime()
    fn(spark, dir).count()
    val dt2 = (System.nanoTime() - t1) / 1e9
    Thread.sleep(300)
    println(f"PROBE $name time=$dt%.3f time2=$dt2%.3f stmts=${lines.size}")
    import scala.jdk.CollectionConverters._
    stageLog.asScala.foreach(l => println("  " + l))
    lines.groupBy { l =>
      val s = l.stripPrefix("[postgres] ").trim
      s.split("\\s+").take(2).mkString(" ").take(40) match {
        case x if s.contains("pg_class") && s.contains("relpages") => "relpages"
        case x if s.contains("pg_attribute") => "tableInfo"
        case x if s.contains("version") => "version-probe"
        case x if s.startsWith("COPY") => "COPY"
        case x if s.contains("pg_export_snapshot") => "export-snapshot"
        case x if s.contains("SET TRANSACTION SNAPSHOT") => "adopt-snapshot"
        case x if s.contains("pg_type") || s.contains("pg_enum") => "type-discovery"
        case x => x
      }
    }.toSeq.sortBy(-_._2.size).foreach { case (k, v) => println(f"  $k%-28s ${v.size}") }
  }
}
