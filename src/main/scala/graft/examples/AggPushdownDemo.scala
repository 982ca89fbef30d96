package graft.examples

import org.apache.spark.sql.SparkSession

import graft.meta.InMemoryPg
import graft.types.PgType._

/** Example: grouped aggregate pushdown — MIN/MAX/SUM/COUNT + GROUP BY
  * computed remotely per ctid range, merged by Spark.
  * Run: sbt "runMain graft.examples.AggPushdownDemo"
  */
object AggPushdownDemo {
  def main(args: Array[String]): Unit = {
    val pg = InMemoryPg.forName("aggdemo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.pg", "graft.catalog.PostgresCatalog")
      .config("spark.sql.catalog.pg.dsn", "mem:aggdemo")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE TABLE IF NOT EXISTS pg.public.sales (region STRING, amount BIGINT)")
    spark.sql(
      """INSERT INTO pg.public.sales
        |SELECT CASE WHEN id % 4 = 0 THEN 'north' WHEN id % 4 = 1 THEN 'south'
        |            WHEN id % 4 = 2 THEN 'east' ELSE 'west' END, id
        |FROM range(1000) t(id)""".stripMargin)
    pg.clearCopyOutLog()
    spark.sql(
      """SELECT region, count(*) n, min(amount) mn, max(amount) mx, sum(amount) total
        |FROM pg.public.sales GROUP BY region ORDER BY region""".stripMargin).show()
    println("remote statements with GROUP BY: " +
      pg.copyOutSnapshot.count(_.contains("GROUP BY")))
    println("example remote SQL: " +
      pg.copyOutSnapshot.find(_.contains("GROUP BY")).getOrElse("none"))
    spark.stop()
  }
}
