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
      // nanosAsLong must be set before the read in case the file is
      // TIMESTAMP(NANOS), which the vectorized reader otherwise rejects
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      withEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize the events `ts` column to TimestampType. The driver's
    * testdata has shipped `ts` as both parquet TIMESTAMP(NANOS) (read
    * as raw nanos under `nanosAsLong`) and TIMESTAMP(MICROS) (read
    * natively as TIMESTAMP_NTZ) across rounds; queries must not depend
    * on which. Works on batch and streaming frames alike. */
  def withEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: epoch nanos exceed double's 53-bit
        // mantissa, floating division would round some values by ±1µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // driver data is UTC and Verify/Bench pin the session timezone
        // to UTC, so this cast is value-preserving
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Register every table as a temp view so spark.sql(...) queries can
    * share the exact SQL text with the DuckDB oracle. Idempotent per
    * (session, dir). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registered.add((spark, sfDir)))
      all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
