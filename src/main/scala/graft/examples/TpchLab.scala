package graft.examples

import org.apache.spark.sql.SparkSession

/** Scratch main for debugging the c18-c38 adapted TPC-H suite. */
object TpchLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (fn, _) = graft.queries.TpchCatalog.entries("c23_tpch_q07")
    fn(spark, dir).count() // force seeding
    val cat = "pgc_c_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    println("single filter: " + spark.sql(
      s"SELECT * FROM $cat.public.nation WHERE n_name = 'NATION_1'").count())
    println("self cross count: " + spark.sql(
      s"SELECT * FROM $cat.public.nation n1, $cat.public.nation n2").count())
    println("self join equi: " + spark.sql(
      s"""SELECT * FROM $cat.public.nation n1, $cat.public.nation n2
         |WHERE n1.n_nationkey = n2.n_nationkey""".stripMargin).count())
    val or = spark.sql(
      s"""SELECT n1.n_name, n2.n_name FROM $cat.public.nation n1, $cat.public.nation n2
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))""".stripMargin)
    println("self join OR: " + or.count())
    println("single OR pruned: " + spark.sql(
      s"SELECT n_name FROM $cat.public.nation WHERE n_name = 'NATION_1' OR n_name = 'NATION_2'").count())
    spark.sql(
      s"SELECT n_name FROM $cat.public.nation WHERE n_name = 'NATION_1' OR n_name = 'NATION_2'")
      .show(5, false)
    val pg = graft.meta.InMemoryPg.forName("c_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    pg.clearCopyOutLog()
    println("single OR pruned again: " + spark.sql(
      s"SELECT n_name FROM $cat.public.nation WHERE n_name = 'NATION_1' OR n_name = 'NATION_2'").count())
    pg.copyOutSnapshot.foreach(st => println("COPYOUT: " + st))
    spark.stop()
  }
}
