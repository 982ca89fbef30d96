package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries read through here so that the scan shape is uniform:
  * plain parquet scans that Catalyst can prune/push into
  * (`PushedFilters`/`ReadSchema` visible in `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // plan-fragment cache: avoids re-reading parquet footers for every
  // query that touches the same table in one session
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, sfDir, name), _ => load0(spark, sfDir, name))

  private def load0(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as raw nanos and convert to a micros
      // timestamp (lossless: driver data is micro-precision, and the
      // DuckDB oracle also reads it as micros TIMESTAMP).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integer `div`, NOT `/`: epoch nanos exceed double's 53-bit
      // mantissa, so floating division would round some values by ±1µs
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Register every table as a temp view so spark.sql(...) queries can
    * share the exact SQL text with the DuckDB oracle. Idempotent per
    * (session, dir). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registered.add((spark, sfDir)))
      all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
