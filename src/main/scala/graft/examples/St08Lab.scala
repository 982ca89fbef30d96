package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** st08 decomposition (the r10 verdict's #4 ask): the entry times a
  * streaming-engine run (checkpoint + parquet sink round-trip +
  * read-back) against a pure batch SQL twin — this lab splits that
  * 6.8× into (a) the BATCH CORE: the exact foreachBatch transform run
  * as plain batch with the same parquet sink round-trip, (b) the same
  * core forced WITHOUT the sink (toRdd), and (c) the full streaming
  * entry. (a) vs (c) isolates the streaming engine + checkpoint
  * overhead; (b) vs (a) isolates the sink round-trip. The st06
  * decomposition in r8 is the precedent.
  * Usage: runMain graft.examples.St08Lab [sfDir]
  */
object St08Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SubstringDedupFunctions.register(spark)
    import graft.functions.SubstringDedupFunctions.{remove_spans, shingle_hashes}

    val w = 20 // Pipeline8.subW
    def refFps = {
      val docs = graft.Tables.load(spark, dir, "documents")
      docs.filter(length(col("source")) <= 4)
        .filter(length(trim(col("text"))) > 0)
        .select(explode(shingle_hashes(split(trim(col("text")), "\\s+"), w)).as("fp"))
        .distinct()
        .withColumn("hit", lit(1))
    }
    def core: DataFrame = {
      val docs = graft.Tables.load(spark, dir, "documents")
      val nw = docs
        .filter(length(col("source")) > 4 && length(trim(col("text"))) > 0)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tok"))
      // narrow-exchange shape (matches the fixed st08 entry): hit
      // window rows are (doc_id, pos, fp) longs, tokens re-attach once
      val hits = nw
        .select(col("doc_id"),
          posexplode(shingle_hashes(col("tok"), w)).as(Seq("pos", "fp")))
        .join(refFps, Seq("fp"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list((col("pos") + 1).cast("long"))).as("starts"))
      nw.join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), size(col("tok")).cast("long").as("n_tok"),
          remove_spans(col("tok"),
            coalesce(col("starts"), array().cast("array<long>")), w).as("kept"))
        .select(col("doc_id"), col("n_tok"),
          (col("n_tok") - size(col("kept"))).cast("long").as("n_removed"),
          md5(array_join(col("kept"), " ")).as("kept_fp"))
    }

    // isolation knobs for the one-measurement-per-JVM protocol
    // (BENCH_NOTES round-10): ST08_MODES=core,sink,stream subset,
    // ST08_PASSES=N, ST08_WARM=false to time the cold first run —
    // a fresh JVM per invocation attributes the run-to-run swing
    // (JIT/page-cache/GC inheritance) that in-JVM repeats average away
    val modes = sys.env.getOrElse("ST08_MODES", "core,sink,stream")
      .split(",").map(_.trim).toSet
    val passes = sys.env.get("ST08_PASSES").map(_.toInt).getOrElse(2)
    val warm = sys.env.get("ST08_WARM").forall(_.toBoolean)
    def time(name: String)(body: => Unit): Unit = {
      if (warm) body
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"ST08 $name%-26s ${ts.min}%.3f s (all: ${
        ts.map(t => f"$t%.2f").mkString(",")})")
    }

    if (modes("core")) time("core_toRdd_no_sink") {
      core.queryExecution.toRdd.foreach(_ => ())
    }
    if (modes("sink")) time("core_parquet_roundtrip") {
      val out = s"/dev/shm/graft_st08lab_${System.nanoTime()}"
      try {
        core.write.mode("overwrite").parquet(out)
        spark.read.parquet(out).orderBy(col("doc_id"))
          .queryExecution.toRdd.foreach(_ => ())
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
    if (modes("stream")) time("full_streaming_entry") {
      graft.queries.Pipeline8.st08_stream_scrub(spark, dir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
