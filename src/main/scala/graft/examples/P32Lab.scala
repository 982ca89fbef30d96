package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Floor attribution for p32 (global segment dedup) after the round-9
  * rewrite (winner aggregate straight over the exploded instances, doc
  * stats as per-row arithmetic): times each stage of the chain inside
  * ONE warm JVM so the residual vs the single-node twin is measured —
  * scan, tokenize, explode, the seg-keyed winner exchange, the
  * wins-by-doc reaggregate, and the stats join.
  * Usage: runMain graft.examples.P32Lab [sfDir]
  */
object P32Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      df.queryExecution.toRdd.foreach(_ => ()) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"P32 $name%-24s ${ts.min}%.3f s")
    }

    val n = 3
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    val base = graft.operators.Scale.spread(docs)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tok"))
      .filter(size(col("tok")) >= n)
      .withColumn("n_seg", (size(col("tok")) / n).cast("int"))
    def inst = base
      .select(col("doc_id"), col("tok"),
        explode(sequence(lit(0), col("n_seg") - 1)).as("seg_i"))
      .select(col("doc_id"), col("seg_i"),
        concat_ws(" ",
          (0 until n).map(o => col("tok")(col("seg_i") * n + o)): _*).as("seg"))
    def winsBySeg = inst.groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("seg_i"))).as("w"))
    def wins = winsBySeg
      .groupBy(col("w")("doc_id").as("doc_id"))
      .agg(count(lit(1)).as("won"))
    def stats = base.select(col("doc_id"),
      col("n_seg").cast("long").as("n_seg"), size(col("tok")).as("n_tok"))

    time("scan_only")(docs)
    time("tokenize")(base)
    time("explode_inst")(inst)
    time("agg_seg_winner")(winsBySeg)
    time("agg_wins_by_doc")(wins)
    time("stats_only")(stats)
    time("full")(graft.operators.TextOps.dedupSegmentsGlobal(docs, "doc_id", "text"))
    // the battery entry's shape: + global ORDER BY (sample job + range
    // exchange — scheduling constants, the output is one row per doc)
    time("full_ordered")(graft.SparkEntry.queries("p32_line_dedup")(spark, dir))

    spark.stop()
  }
}
