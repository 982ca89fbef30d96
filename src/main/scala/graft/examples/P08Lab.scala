package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage timings for the reworked p08 candidate pipeline. */
object P08Lab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warm")(docs.count())

    val P = 2147483647L
    def hashA(j: Int): Long = (1103515245L * (j + 1)) % P
    def hashB(j: Int): Long = (12345L + 1000003L * j) % P
    val tokens = split(trim(col("text")), "\\s+")
    val toks = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(tokens)).as("tok"))
    val withTh = toks.withColumn("th",
      transform(col("tok"), tk =>
        (conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % P).cast("long")))
    val K = 16
    val hs = (0 until K).map(j =>
      array_min(transform(col("th"), h => (lit(hashA(j)) * h + lit(hashB(j))) % lit(P))))
    val bandCols = (0 until K / 2).map { b =>
      struct(lit(b).as("band_idx"), (hs(2 * b) * lit(P) + hs(2 * b + 1)).as("band_hash"))
    }
    val banded = withTh.select(col("doc_id"), col("source"),
      explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("source"),
        col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
    time("banded")(banded.count())
    time("banded2")(banded.count())

    val cands = banded
      .groupBy(col("source"), col("band_idx"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(least(x, y) AS doc_a, greatest(x, y) AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    time("cands_raw")(cands.count())
    val dd = cands.dropDuplicates("doc_a", "doc_b")
    time("cands_dedup")(dd.count())

    val ta = toks.select(col("doc_id").as("doc_a"), col("tok").as("tok_a"))
    val tb = toks.select(col("doc_id").as("doc_b"), col("tok").as("tok_b"))
    val attached = dd.join(ta, "doc_a").join(tb, "doc_b")
    time("attach")(attached.count())
    val inter = size(array_intersect(col("tok_a"), col("tok_b"))).cast("double")
    val jac = attached
      .withColumn("jac", inter / (size(col("tok_a")) + size(col("tok_b")) - inter))
      .filter(col("jac") >= 0.85)
      .select(col("doc_a"), col("doc_b"), col("jac"))
    time("jaccard")(jac.count())
    time("full_orderby")(jac.orderBy(col("doc_a"), col("doc_b")).count())
    time("full_again")(jac.orderBy(col("doc_a"), col("doc_b")).count())

    spark.stop()
  }
}
