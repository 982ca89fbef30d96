package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.InMemoryPg
import graft.types.PgType._

/** Dev utility: does Spark plan a runtime (DPP-style) filter against
  * the postgres v2 scan for a selective broadcast join? Prints the
  * COPY statements the endpoint served so the pushed IN is visible. */
object RuntimeFilterLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pg = InMemoryPg.forName("rtlab")
    if (!pg.hasTable("public", "facts")) {
      val t = pg.createTable("public", "facts", Seq("id" -> PgInt8, "v" -> PgInt4))
      (0 until 200000).foreach { i =>
        t.slots += Some(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i.toLong, i)))
      }
    }
    val fact = spark.read.format("postgres")
      .option("dsn", "mem:rtlab").option("table", "facts")
      .option("pagesPerTask", "1000").load()
    val dim = spark.range(0, 100000).toDF("id")
      .filter(pmod(col("id"), lit(40000)) === 3)
    pg.clearCopyOutLog()
    val joined = fact.join(dim, "id")
    joined.explain(true)
    println("rows=" + joined.count())
    println("--- served COPY statements ---")
    pg.copyOutSnapshot.foreach(println)
    spark.stop()
  }
}
