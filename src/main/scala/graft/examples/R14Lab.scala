package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-14 sf10 measurement JVM.
  *
  * `parquet` mode — the q68 engine-floor DECOMPOSITION (VERDICT r13
  * "what's wrong" #1): stage walls for the 60M-row scan → per-partkey
  * agg → part join → percent_rank window, plus the same stages with
  * the decimal sum run through a primitive-long accumulator
  * ([[graft.functions.DecimalFastFunctions]]) — the hypothesis being
  * that sum(DECIMAL(18,2)) → DECIMAL(28,2) leaves Spark's compact
  * range and pays a BigDecimal add per fact row. Also times q80
  * parquet (the calm-day pair VERDICT ask #1 owes).
  *
  * `conn` mode — packed-wire seed + the catalog trio (c57 cold /
  * c65 / c69), as R13Lab, but with the shuffle-dir kind a CLI arg so
  * the tmpfs-vs-/tmp control pass (VERDICT ask #7) runs the same code.
  *
  * Usage: runMain graft.examples.R14Lab [sfDir] [passes] [mode] [localKind]
  *   mode = parquet | conn ; localKind = shm | tmp
  */
object R14Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val passes = if (args.length > 1) args(1).toInt else 2
    val mode = if (args.length > 2) args(2) else "parquet"
    val localKind = if (args.length > 3) args(3) else "shm"
    val localDir =
      if (localKind == "tmp") s"/tmp/graft_spark_local_${ProcessHandle.current().pid()}"
      else s"/dev/shm/graft_spark_local_${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      def gcMillis: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      def time(name: String, df: => DataFrame): Double = {
        df.queryExecution.toRdd.foreach(_ => ()) // warm
        val best = (1 to passes).map { p =>
          val g0 = gcMillis
          val t1 = System.nanoTime()
          df.queryExecution.toRdd.foreach(_ => ())
          val dt = (System.nanoTime() - t1) / 1e9
          println(f"R14 $name%-16s pass$p $dt%6.2f s  gc ${(gcMillis - g0) / 1e3}%5.1f s")
          dt
        }.min
        println(f"R14 $name%-16s min   $best%6.2f s")
        best
      }

      if (mode.startsWith("parquet")) {
        graft.functions.DecimalFastFunctions.register(spark)
        import graft.functions.DecimalFastFunctions.{make_decimal, unscaled_value}
        val li = graft.Tables.load(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_extendedprice"))
        val part = graft.Tables.load(spark, dir, "part")
        def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
        def aggDec =
          li.groupBy(col("l_partkey"))
            .agg(sum(dec(col("l_extendedprice"))).cast("double").as("rev"))
        def aggUns =
          li.groupBy(col("l_partkey"))
            .agg(make_decimal(sum(unscaled_value(dec(col("l_extendedprice")))), 28, 2)
              .cast("double").as("rev"))
        def withTail(rev: DataFrame): DataFrame = {
          val j = rev.join(part, col("l_partkey") === col("p_partkey"))
          j.withColumn("pr", percent_rank().over(
              Window.partitionBy(col("p_type")).orderBy(col("rev"), col("p_partkey"))))
            .filter(col("pr") <= 0.05)
            .select(col("p_type"), col("p_partkey"), col("rev"), round(col("pr"), 6).as("pr"))
            .orderBy(col("p_type"), col("p_partkey"))
        }
        // stage walls; `parquet-uns` and `parquet-dec` isolate the two
        // sum paths in separate JVMs — the decimal path's BigDecimal
        // churn triggers GC storms that pollute every later case in
        // the same process (first combined run: agg_dec 49→75→148 s
        // escalating, then agg_uns's OWN pass3 at 51 s from the
        // leftover heap state).
        if (mode != "parquet-dec") {
          time("scan2", li)
          time("agg_cnt", li.groupBy(col("l_partkey")).count())
          val tAggUns = time("agg_uns", aggUns)
          val tJoinUns = time("aggjoin_uns", aggUns.join(part, col("l_partkey") === col("p_partkey"))
            .select(col("p_type"), col("p_partkey"), col("rev")))
          val tFullUns = time("q68_full_uns", withTail(aggUns))
          println(f"R14 WALLS-UNS agg ${tAggUns}%.2f  join +${tJoinUns - tAggUns}%.2f  " +
            f"window +${tFullUns - tJoinUns}%.2f")
          // q80 parquet calm-day number (same JVM, tmpfs shuffle)
          time("q80_parquet", graft.SparkEntry.queries("q80_net_returns")(spark, dir))
        }
        if (mode != "parquet-uns") {
          val tAggDec = time("agg_dec", aggDec)
          val tFullDec = time("q68_full_dec", withTail(aggDec))
          println(f"R14 WALLS-DEC agg ${tAggDec}%.2f  full ${tFullDec}%.2f")
        }
      } else if (mode == "q80pair") {
        // within-JVM old-vs-new q80 sum (phase-robust comparison):
        // identical joins, decimal accumulator vs unscaled-long
        graft.functions.DecimalFastFunctions.register(spark)
        import graft.functions.DecimalFastFunctions.{make_decimal, unscaled_value}
        def joined = {
          val li = graft.Tables.load(spark, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
            .repartition(col("l_orderkey"))
          val ret = graft.Tables.load(spark, dir, "lineitem")
            .filter(col("l_returnflag") === "R")
            .select(col("l_orderkey").as("r_ok"), col("l_linenumber").as("r_ln"),
              col("l_quantity").as("r_qty"))
            .repartition(col("r_ok"))
          li.join(ret.hint("shuffle_hash"),
              col("l_orderkey") === col("r_ok") && col("l_linenumber") === col("r_ln"),
              "left_outer")
            .join(graft.Tables.load(spark, dir, "orders").hint("shuffle_hash"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("o_custkey"))
        }
        val net = (col("l_quantity") - coalesce(col("r_qty"), lit(0.0)))
          .cast(DecimalType(18, 2))
        val tU = time("q80_uns", joined.agg(count(lit(1)).as("n_lines"),
          make_decimal(sum(unscaled_value(net)), 28, 2).cast("double").as("net_qty"))
          .orderBy(col("o_custkey")))
        val tD = time("q80_dec", joined.agg(count(lit(1)).as("n_lines"),
          sum(net).cast("double").as("net_qty"))
          .orderBy(col("o_custkey")))
        println(f"R14 Q80PAIR uns $tU%.2f s  dec $tD%.2f s  (${tD / tU}%.2fx)")
      } else if (mode == "scrub") {
        // the r13 #3 ask's done-criterion: the production-pattern scrub
        // wall with the general scanner vs java.util.regex on the same
        // text. The regex leg appends a no-op group `(?:)` — same
        // language, different string — to dodge the exact-pattern
        // routing in consistentAnonymize.
        graft.functions.TextScanFunctions.register(spark)
        val plain = graft.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        // email-dense regime: the p53-style augmentation (multiple
        // distinct + recurring addresses per document)
        val dense = plain.withColumn("text", concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"), lit("@mail-host.example.org or "),
          lit("j.doe+"), col("doc_id").cast("string"), lit("@sub.host"), col("doc_id").cast("string"),
          lit(".io and again u"), col("doc_id").cast("string"), lit("@mail-host.example.org")))
        for ((nm, d) <- Seq(("plain", plain), ("dense", dense))) {
          val ext = time(s"xtr_scan_$nm", d.select(expr("email_extract_all_g(text)").as("m")))
          val exr = time(s"xtr_re_$nm", d.select(
            expr(s"regexp_extract_all(text, '${graft.operators.TextOps.ProductionEmailPattern}', 0)").as("m")))
          def anon(p: String): DataFrame = graft.operators.TextOps
            .consistentAnonymize(d, "text", "anon", p, "EMAIL")
          val sc = time(s"scrub_scan_$nm", anon(graft.operators.TextOps.ProductionEmailPattern))
          val re = time(s"scrub_re_$nm", anon(graft.operators.TextOps.ProductionEmailPattern + "(?:)"))
          println(f"R14 SCRUB[$nm] extract ${exr}%.2f->${ext}%.2f s (${exr / ext}%.2fx)  " +
            f"pipeline ${re}%.2f->${sc}%.2f s (${re / sc}%.2fx)")
        }
      } else {
        val t0 = System.nanoTime()
        graft.queries.ConnectorOps.seedPackedTpch(spark, dir)
        println(f"SEED packed tpch from $dir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        Seq("c57_ds_cat_having_distinct", "c65_ds_cat_percent_rank",
          "c69_ds_cat_net_returns").foreach { name =>
          val fn = graft.SparkEntry.queries(name)
          val times = (0 to passes).map { p => // pass0 = cold, reported too
            val t1 = System.nanoTime()
            fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
            val dt = (System.nanoTime() - t1) / 1e9
            println(f"SF10C[$localKind] $name%-28s pass$p $dt%.2f s")
            dt
          }
          println(f"SF10C[$localKind] $name%-28s cold ${times.head}%.2f warm-min ${times.tail.min}%.2f s")
        }
      }
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(localDir))
    }
  }
}
