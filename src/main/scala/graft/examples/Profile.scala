package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev utility: time labelled stages of the slow bench queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    val tokens = split(trim(col("text")), "\\s+")

    // warmup io
    time("warm_docs")(docs.count())
    time("warm_docs2")(docs.count())

    val toks = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(tokens)).as("tok"))
    time("p08_tokenize")(toks.count())

    def minhash(shingles: org.apache.spark.sql.Column, j: Int) =
      array_min(transform(shingles, sh => md5(concat(lit(s"$j:"), sh))))
    val K = 16
    val hs = (0 until K).map(j => minhash(col("tok"), j))
    val bandCols = (0 until K / 2).map { b =>
      struct(lit(b).as("band_idx"), md5(concat(hs(2 * b), hs(2 * b + 1))).as("band_hash"))
    }
    val banded = toks.select(col("doc_id"), col("source"),
      explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("source"),
        col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
    time("p08_minhash_bands")(banded.count())
    time("p08_minhash_bands2")(banded.count())

    val a = banded.as("a"); val b = banded.as("b")
    val cands = a.join(b,
        col("a.source") === col("b.source") &&
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("p08_cand_join")(cands.count())

    val ta = toks.select(col("doc_id").as("doc_a"), col("tok").as("tok_a"))
    val tb = toks.select(col("doc_id").as("doc_b"), col("tok").as("tok_b"))
    val full = cands
      .join(broadcast(ta), "doc_a")
      .join(broadcast(tb), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
          size(array_union(col("tok_a"), col("tok_b"))))
      .filter(col("jac") >= 0.85)
      .select(col("doc_a"), col("doc_b"), col("jac"))
      .orderBy(col("doc_a"), col("doc_b"))
    time("p08_full")(full.count())
    time("p08_full2")(full.count())

    // full query entries for comparison
    time("p08_entry")(graft.SparkEntry.queries("p08_lsh_pairs")(spark, dir).count())
    time("p10_entry")(graft.SparkEntry.queries("p10_embedding_dedup")(spark, dir).count())
    time("s02_entry")(graft.SparkEntry.queries("s02_ann_lsh")(spark, dir).count())
    time("s01_entry")(graft.SparkEntry.queries("s01_ann_brute")(spark, dir).count())
    time("q06_entry")(graft.SparkEntry.queries("q06_join_multi")(spark, dir).count())
    time("st01_entry")(graft.SparkEntry.queries("st01_stream_window")(spark, dir).count())
    time("st02_entry")(graft.SparkEntry.queries("st02_stream_sessionize")(spark, dir).count())
    spark.stop()
  }
}
