package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 sf10 measurement JVM: the canary-gated entry timer.
  *
  * Implements the MEASUREMENT PROTOCOL named in BENCH_NOTES.md r15 —
  * before any timed section the JVM runs the R14Lab `scan2` canary
  * (two-column lineitem parquet scan); if it exceeds the 0.5 s gate
  * the box is in a slow throughput phase and every number the JVM
  * would produce is untrustworthy, so the run aborts loudly instead
  * of recording poisoned walls. A closing canary re-run detects a
  * phase shift DURING the run (protocol rule 1's mid-JVM re-canary).
  *
  * Times a comma-separated list of [[graft.SparkEntry]] entries
  * (default: the eight queries whose fact sums moved to the
  * unscaled-long accumulator in the r15 sweep, plus q68/q80 — the
  * owed VERDICT r14 ask #1 pair) with one warm pass then min-of-N,
  * per-pass GC wall printed alongside.
  *
  * Usage: runMain graft.examples.R15Lab [sfDir] [passes] [names|-]
  * Launch with SPARK_DRIVER_MEM=64g for sf10 (protocol rule 4).
  */
object R15Lab {
  val DefaultEntries: Seq[String] = Seq(
    "q01_agg_pricing", "q44_rank_zero_sales", "q68_percent_rank",
    "q80_net_returns", "q96_having_distinct", "q97_argmax_joinback",
    "q103_window_band", "q107_self_threshold")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val passes = if (args.length > 1) args(1).toInt else 3
    val entries =
      if (args.length > 2 && args(2) != "-") args(2).split(",").toSeq
      else DefaultEntries
    val localDir = s"/dev/shm/graft_spark_local_${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.getOrElse("R15_FAST_DSUM", "1") == "1") {
      graft.plans.FastDoubleDecimalSumRule.install(spark)
    }
    try {
      def gcMillis: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      def wall(df: => org.apache.spark.sql.DataFrame): Double = {
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t1) / 1e9
      }
      // gate override is for functional smoke runs only — numbers of
      // record require the 0.5 s protocol gate
      val gateS = sys.env.getOrElse("R15_CANARY_GATE", "0.5").toDouble
      def canary(tag: String): Double = {
        val li = graft.Tables.load(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_extendedprice"))
        wall(li) // cold (parquet footer + code cache)
        val c = math.min(wall(li), wall(li))
        println(f"R15 CANARY[$tag] scan2 $c%.2f s  (gate $gateS%.2f)")
        c
      }
      if (canary("open") > gateS) {
        println("R15 CANARY FAIL — phase-poisoned JVM, aborting per protocol")
        sys.exit(2)
      }
      if (args.length > 2 && args(2) == "sumpaths") {
        // The q68 aggregate's three scan-side formulations, same
        // 60M-row group-by. `uns_cast` is the r14 adoption (primitive
        // sum, but the double→decimal CAST still allocates two
        // BigDecimals + a Decimal per row); `uns_double` computes the
        // unscaled long in double arithmetic (zero allocation).
        import graft.functions.DecimalFastFunctions._
        register(spark)
        val li = graft.Tables.load(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_extendedprice"))
        def run(tag: String, agg: org.apache.spark.sql.Column): Unit = {
          val df = li.groupBy(col("l_partkey")).agg(agg.as("rev"))
          wall(df) // warm
          val best = (1 to passes).map { p =>
            val g0 = gcMillis
            val dt = wall(df)
            println(f"R15 sum_$tag%-12s pass$p $dt%6.2f s  gc ${(gcMillis - g0) / 1e3}%5.1f s")
            dt
          }.min
          println(f"R15 sum_$tag%-12s min   $best%6.2f s")
        }
        run("count", count(lit(1)).cast("double"))
        run("uns_cast", dsum_unscaled(
          col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
        run("uns_double", dsum_unscaled_double(col("l_extendedprice")))
        canary("close")
        return
      }
      for (name <- entries) {
        val fn = graft.SparkEntry.queries(name)
        wall(fn(spark, dir)) // warm
        val best = (1 to passes).map { p =>
          val g0 = gcMillis
          val dt = wall(fn(spark, dir))
          println(f"R15 $name%-24s pass$p $dt%6.2f s  gc ${(gcMillis - g0) / 1e3}%5.1f s")
          dt
        }.min
        println(f"R15 $name%-24s min   $best%6.2f s")
      }
      canary("close")
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(localDir))
    }
  }
}
