package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Kmeans}

/** s11 recall-under-selectivity lab: pre-filtered IVF search keeps
  * top-k k-deep, but its recall against a FILTERED brute-force oracle
  * degrades as the predicate tightens — matching vectors can live
  * outside the probed cells (the known FAISS IDSelector failure mode:
  * with few survivors per cell, the nprobe cells may simply not
  * contain the true filtered neighbors). This sweeps filter
  * selectivity × nprobe and prints recall@10, so the nprobe-escalation
  * guidance ("tighter filter → probe more cells") is measured, not
  * asserted. Numbers land in BENCH_NOTES; Wave10Spec pins the battery
  * config's floor.
  * Usage: runMain graft.examples.FilteredAnnLab [sfDir] [nQueries]
  */
object FilteredAnnLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQ = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TopKFunctions.register(spark)
    import graft.functions.TopKFunctions.topk_by
    import graft.functions.VectorFunctions.vec_dot

    val emb = graft.Tables.load(spark, dir, "embeddings").cache()
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val ivf = Ann.buildIvf(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      cells = 16, lloydIters = 1)
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("label"))

    /** exact cosine top-10 over ONLY the vectors passing the filter —
      * the oracle a pre-filtered search is judged against */
    def filteredExact(filter: Column): Set[(Long, Long)] =
      corpus.filter(filter)
        .withColumn("cn", sqrt(vec_dot(col("cv"), col("cv"))))
        .join(broadcast(queries
          .withColumn("qn", sqrt(vec_dot(col("qv"), col("qv"))))),
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
        .groupBy(col("query_id"))
        .agg(topk_by(col("cos"), col("neighbor_id"), 10).as("top"))
        .select(col("query_id"), explode(col("top").getField("id")).as("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    println(s"Filtered ANN recall on $dir ($n vectors, $nQ queries, " +
      "IVF 16 cells / 1 Lloyd round, k=10)")
    println("filter             sel%   nprobe  recall@10")
    val filters: Seq[(String, Column)] =
      Seq(("label = 3 (s11)", col("label") === 3)) ++
        Seq(2, 4, 8, 16, 32).map(m =>
          (f"vec_id %% $m = 0", pmod(col("neighbor_id"), lit(m)) === 0))
    for ((name, f) <- filters) {
      val sel = 100.0 * corpus.filter(f).count() / n
      val exact = filteredExact(f)
      for (nprobe <- Seq(2, 4, 8, 16)) {
        val got = Ann.ivfFilteredTopK(queries, corpus, ivf,
            k = 10, nprobe = nprobe, candidateFilter = f)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact intersect got).size.toDouble / exact.size
        println(f"$name%-18s $sel%5.1f   $nprobe%-6d  $recall%.3f")
      }
    }
    spark.stop()
  }
}
