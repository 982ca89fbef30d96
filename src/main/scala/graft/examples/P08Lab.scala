package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.MinhashFunctions

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
    MinhashFunctions.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s  -> $r"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warm")(docs.count())

    val P = graft.functions.MinhashFamily.P
    val K = 16
    val tokens = split(trim(col("text")), "\\s+")
    val toks = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(tokens)).as("tok"))
    time("toks_forced")(toks.agg(sum(size(col("tok")))).head.getLong(0))
    val withSig = toks.withColumn("sig", MinhashFunctions.minhash_sig(col("tok")))
    time("sig_forced")(withSig.agg(sum(element_at(col("sig"), 1) % 97)).head.getLong(0))
    val hs = (0 until K).map(j => col("sig")(j))
    val bhsC = array((0 until K / 2).map(b => (hs(2 * b) * lit(P) + hs(2 * b + 1))): _*)
    val banded = withSig
      .select(col("doc_id"), col("source"), size(col("tok")).as("sz"), bhsC.as("bhs"))
      .select(col("doc_id"), col("source"), col("sz"), col("bhs"),
        posexplode(col("bhs")).as(Seq("band_idx", "band_hash")))
    time("banded_forced")(banded.agg(sum(col("band_hash") % 97)).head.get(0))

    val grouped = banded
      .repartition(32, col("source"), col("band_idx"), col("band_hash"))
      .groupBy(col("source"), col("band_idx"), col("band_hash"))
      .agg(collect_list(struct(col("doc_id"), col("bhs"), col("sz"))).as("members"))
      .filter(size(col("members")) > 1)
    time("grouped")(grouped.count())
    val cands = grouped
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(
          |    filter(slice(members, i + 2, size(members)), y ->
          |      least(x.sz, y.sz) >= 0.84 * greatest(x.sz, y.sz)
          |      AND NOT exists(
          |        zip_with(slice(x.bhs, 1, band_idx), slice(y.bhs, 1, band_idx),
          |          (ha, hb) -> ha = hb), c -> c)),
          |    y -> struct(least(x.doc_id, y.doc_id) AS doc_a,
          |                greatest(x.doc_id, y.doc_id) AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    time("cands_raw")(cands.count())
    val dd = cands
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
