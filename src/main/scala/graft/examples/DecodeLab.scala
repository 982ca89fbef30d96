package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-type decode micro-bench for the vectorized COPY reader: times
  * PURE full-table connector scans (toRdd.foreach forcing, no joins or
  * aggregates above the scan) with the columnar decoder on and off in
  * ONE warm JVM, per projection class — so the decode delta is
  * isolated from the join/shuffle/GC wall that dominates whole queries
  * at sf10. Usage: runMain graft.examples.DecodeLab [sfDir]
  */
object DecodeLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.queries.ConnectorOps.seedPackedTpch(spark, dir)

    def scan(table: String, cols: Seq[String], vec: Boolean): DataFrame = {
      val df = spark.read.format("postgres")
        .option("dsn", graft.queries.ConnectorOps.dsn(dir))
        .option("table", table)
        .option("vectorizedRead", vec.toString)
        .load()
      if (cols.isEmpty) df else df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    }

    def time(name: String)(df: => DataFrame): Double = {
      df.queryExecution.toRdd.foreach(_ => ()) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    val cases: Seq[(String, String, Seq[String])] = Seq(
      ("ints_longs", "lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")),
      ("decimals", "lineitem", Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      ("dates_ts", "lineitem", Seq("l_shipdate")),
      ("strings", "lineitem", Seq("l_returnflag", "l_linestatus")),
      ("strings_wide", "customer", Seq("c_name", "c_mktsegment")),
      ("full_row", "lineitem", Nil),
      ("orders_mixed", "orders", Nil))

    // GRAFT_DECODE_ONLY=name,name narrows the case list (profiling aid)
    val only = sys.env.get("GRAFT_DECODE_ONLY").map(_.split(",").toSet)
    cases.filter(c => only.forall(_.contains(c._1))).foreach { case (name, table, cols) =>
      val row = time(s"$name row")(scan(table, cols, vec = false))
      val vec = time(s"$name vec")(scan(table, cols, vec = true))
      println(f"DECODE $name%-14s row $row%7.2f s  vec $vec%7.2f s  speedup ${row / vec}%5.2fx")
    }
    spark.stop()
  }
}
