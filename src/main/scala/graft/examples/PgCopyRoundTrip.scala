package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Example: write a table as PGCOPY binary files (server-ingestible via
  * `COPY ... FROM ... (FORMAT binary)`) and read it back with pruning.
  *
  * Run: sbt "runMain graft.examples.PgCopyRoundTrip /tmp/pgcopy_demo"
  */
object PgCopyRoundTrip {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/pgcopy_demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
    src.write.format("pgcopy").mode("overwrite").save(out)

    val back = spark.read.format("pgcopy").schema(src.schema).load(out)
    println(s"wrote+read ${back.count()} rows (source ${src.count()})")
    back.select("c_custkey", "c_name", "c_acctbal")
      .orderBy(desc("c_acctbal")).show(5, truncate = false)
    back.select("c_custkey", "c_acctbal").explain("formatted")
    spark.stop()
  }
}
