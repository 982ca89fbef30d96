package graft.examples

import org.apache.spark.sql.SparkSession

import graft.meta.InMemoryPg
import graft.types.PgType._

/** Example: the text COPY fallback — a column Spark writes as string
  * but Postgres types as macaddr can't round-trip binary COPY, so the
  * writer switches to the text wire format (escapes included).
  * Run: sbt "runMain graft.examples.TextCopyDemo"
  */
object TextCopyDemo {
  def main(args: Array[String]): Unit = {
    val pg = InMemoryPg.forName("textdemo")
    if (!pg.hasTable("public", "machines"))
      pg.createTable("public", "machines",
        Seq("id" -> PgInt8, "mac" -> PgUnknown("macaddr")))
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.catalog.pg", "graft.catalog.PostgresCatalog")
      .config("spark.sql.catalog.pg.dsn", "mem:textdemo")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq((1L, "aa:bb:cc:dd:ee:ff"), (2L, "tab\there\nand\\slash"))
      .toDF("id", "mac")
      .write.format("postgres")
      .option("dsn", "mem:textdemo").option("table", "machines")
      .mode("append").save()
    println("copy-format: " + pg.copyInStatements.last
      .substring(pg.copyInStatements.last.indexOf("FORMAT")))
    val back = spark.sql("SELECT id, mac FROM pg.public.machines ORDER BY id").collect()
    println("row1=" + back(0).getString(1))
    println("escapes-roundtrip=" + (back(1).getString(1) == "tab\there\nand\\slash"))
    spark.stop()
  }
}
