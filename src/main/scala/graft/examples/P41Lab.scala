package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Floor attribution for p41 (per-source KMV distinct sketch) and by
  * extension p43, which shares the whole sketch-build chain: times
  * each stage inside ONE warm JVM — scan, tokenize, shingle explode,
  * the md5+conv hash projection (the expected map-CPU wall), the KMV
  * aggregate (its one source-keyed exchange carries ≤ k longs per
  * source per task), and the battery entry's estimate+ORDER BY.
  * Usage: runMain graft.examples.P41Lab [sfDir]
  */
object P41Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.KmvFunctions.register(spark)
    import graft.functions.KmvFunctions.kmv_minima

    def time(name: String)(df: => DataFrame): Unit = {
      df.queryExecution.toRdd.foreach(_ => ()) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"P41 $name%-24s ${ts.min}%.3f s")
    }

    val n = 5
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text"))
    val base = graft.operators.Scale.spread(docs)
      .select(col("source"), split(trim(col("text")), "\\s+").as("tok"))
      .filter(size(col("tok")) >= n)
    def inst = base.select(col("source"), col("tok"),
      explode(sequence(lit(0), size(col("tok")) - n)).as("i"))
    def shingled = inst.select(col("source"), concat_ws(" ",
      (0 until n).map(o => element_at(col("tok"), col("i") + o + 1)): _*).as("sh"))
    def hashed = shingled.select(col("source"),
      conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("h"))
    def sketched = hashed.groupBy(col("source"))
      .agg(kmv_minima(col("h"), 256).as("mins"))
    def full = graft.queries.Pipeline7.p41_kmv_distinct(spark, dir)

    // the round-10 fused chain (what shingleSketch now runs): the
    // explode/concat/hash stages above collapse into ONE codegen'd
    // shingle_kmv pass per document — keep both decompositions so the
    // before/after attribution stays reproducible
    import graft.functions.KmvFunctions.shingle_kmv
    def fusedDoc = base.select(col("source"),
      shingle_kmv(col("tok"), n, 256).as("doc_mins"))
    def fusedSketch = fusedDoc.groupBy(col("source"))
      .agg(kmv_minima(col("doc_mins"), 256).as("mins"))

    time("scan_only")(docs)
    time("tokenize")(base)
    time("explode_inst")(inst)
    time("shingle_concat")(shingled)
    time("hash_md5_conv")(hashed)
    time("kmv_aggregate")(sketched)
    time("fused_doc_kmv")(fusedDoc)
    time("fused_sketch")(fusedSketch)
    time("full_entry")(full)
    spark.stop()
  }
}
