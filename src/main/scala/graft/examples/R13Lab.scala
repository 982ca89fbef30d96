package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-13 combined sf10 measurement JVM: ONE packed seed (the 40-min
  * cost on a slow-disk day), then the DecodeLab pure-scan cases AND the
  * catalog trio (c57/c65/c69) in the same warm process. Shuffle dirs go
  * to tmpfs (`spark.local.dir=/dev/shm/...`): the box's virtio disk
  * swings 3-5x day to day (r12's aborted campaign, this round's 2303 s
  * seed vs r12's 420 s), and a 60M-row exchange written through it
  * measures the disk, not the plan — a real cluster's shuffle goes to
  * local NVMe. Disclosed in BENCH_NOTES wherever these numbers land.
  * Usage: runMain graft.examples.R13Lab [sfDir] [passes]
  */
object R13Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val passes = if (args.length > 1) args(1).toInt else 2
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
    try {
      val t0 = System.nanoTime()
      graft.queries.ConnectorOps.seedPackedTpch(spark, dir)
      println(f"SEED packed tpch from $dir in ${(System.nanoTime() - t0) / 1e9}%.1f s")

      // --- DecodeLab cases: pure connector scans, no shuffle ---
      def scan(table: String, cols: Seq[String], vec: Boolean): DataFrame = {
        val df = spark.read.format("postgres")
          .option("dsn", graft.queries.ConnectorOps.dsn(dir))
          .option("table", table)
          .option("vectorizedRead", vec.toString)
          .load()
        if (cols.isEmpty) df
        else df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      }
      def time(df: => DataFrame): Double = {
        df.queryExecution.toRdd.foreach(_ => ()) // warm
        (1 to passes).map { _ =>
          val t1 = System.nanoTime()
          df.queryExecution.toRdd.foreach(_ => ())
          (System.nanoTime() - t1) / 1e9
        }.min
      }
      val cases: Seq[(String, String, Seq[String])] = Seq(
        ("ints_longs", "lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")),
        ("decimals", "lineitem", Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
        ("dates_ts", "lineitem", Seq("l_shipdate")),
        ("strings", "lineitem", Seq("l_returnflag", "l_linestatus")),
        ("full_row", "lineitem", Nil),
        ("orders_mixed", "orders", Nil))
      cases.foreach { case (name, table, cols) =>
        val row = time(scan(table, cols, vec = false))
        val vec = time(scan(table, cols, vec = true))
        println(f"DECODE $name%-14s row $row%7.2f s  vec $vec%7.2f s  speedup ${row / vec}%5.2fx")
      }

      // --- catalog trio: warm entries, min-of-N over tmpfs shuffle ---
      Seq("c57_ds_cat_having_distinct", "c65_ds_cat_percent_rank",
        "c69_ds_cat_net_returns").foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        val times = (0 to passes).map { p => // pass0 = cold, reported too
          val t1 = System.nanoTime()
          fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
          val dt = (System.nanoTime() - t1) / 1e9
          println(f"SF10C $name%-28s pass$p $dt%.2f s")
          dt
        }
        println(f"SF10C $name%-28s cold ${times.head}%.2f warm-min ${times.tail.min}%.2f s")
      }
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(localDir))
    }
  }
}
