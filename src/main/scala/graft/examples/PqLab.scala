package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Kmeans}

/** PQ search-quality lab: recall@10 of ADC top-k vs the exact
  * same-metric (squared-L2) brute-force top-10, swept over the
  * (m, codebookSize) grid, on the REAL embeddings table. Also prints
  * the compression ratio each cell buys (d·4 bytes → m codes). The
  * numbers land in BENCH_NOTES' PQ quality table; Wave8Spec pins the
  * s07/s08 production configs' floors.
  * Usage: runMain graft.examples.PqLab [sfDir] [nQueries]
  */
object PqLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQ = if (args.length > 1) args(1).toInt else 20
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

    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val queries = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("embedding"))

    // exact squared-L2 top-10 (the metric ADC approximates)
    val exact = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(broadcast(queries.withColumnRenamed("embedding", "qv")),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Kmeans.distSq(
          transform(col("qv"), _.cast("double")),
          transform(col("cv"), _.cast("double"))).as("d2"))
      .groupBy(col("query_id"))
      .agg(topk_by(-col("d2"), col("neighbor_id"), 10).as("top"))
      .select(col("query_id"), explode(col("top").getField("id")).as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(df: DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }

    println(f"PQ quality on $dir (dim=$dim, ${emb.count()} vectors, $nQ queries, k=10)")
    println("m  cb   iters bits/vec  compress  recall@10")
    for (m <- Seq(2, 4, 8, 16); cb <- Seq(8, 16, 64) if dim % m == 0;
         iters <- Seq(1, 3)) {
      val (codebooks, codes) = Ann.buildPq(emb, "vec_id", "embedding", m, cb, iters)
      val r = recallOf(Ann.pqTopK(queries, "query_id", "embedding",
        codebooks, codes.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id", m, 10))
      val bits = m * (math.log(cb) / math.log(2))
      println(f"$m%-2d $cb%-4d $iters%-4d $bits%7.0f   ${dim * 32 / bits}%6.1fx  $r%.3f")
    }

    // IVF composition at the s08/s09 battery config: RAW codes (s08)
    // vs RESIDUAL codes (s09 = IVFADC, Jégou et al. 2011 §IV) at the
    // same bit budget. nprobe=cells rows isolate encoding quality from
    // IVF pruning loss (at nprobe<cells recall is additionally capped
    // by whether the true neighbor's cell is probed at all).
    println("\nIVF(16 cells) + PQ: raw (s08) vs residual (s09/IVFADC), k=10")
    println("m  cb   iters nprobe  raw     residual")
    val corp = emb.withColumnRenamed("vec_id", "neighbor_id")
    val ivf = Ann.buildIvf(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      cells = 16, lloydIters = 1)
    for ((m, cb) <- Seq((4, 8), (16, 64)); iters <- Seq(1, 3);
         nprobe <- Seq(4, 16)) {
      val (cbRaw, cdRaw) = Ann.buildPq(corp, "neighbor_id", "embedding", m, cb, iters)
      val rawIx = Ann.pqIvfIndexOf(cbRaw, cdRaw, "neighbor_id", ivf)
      val rRaw = recallOf(Ann.ivfPqTopK(
        queries, "query_id", "embedding", rawIx, "neighbor_id", m, 10, nprobe))
      val (cbRes, cdRes) =
        Ann.buildPqResidual(corp, "neighbor_id", "embedding", ivf, m, cb, iters)
      val resIx = Ann.pqIvfIndexOf(cbRes, cdRes, "neighbor_id", ivf)
      val rRes = recallOf(Ann.ivfPqTopKResidual(
        queries, "query_id", "embedding", resIx, "neighbor_id", m, 10, nprobe))
      println(f"$m%-2d $cb%-4d $iters%-5d $nprobe%-6d  $rRaw%.3f   $rRes%.3f")
    }

    // refine knob: exact re-rank of the ADC stage's k·factor nominees
    // (s10). factor=1 exact-ranks the ADC top-k itself (set recall
    // unchanged, order fixed); each step up trades k·Δfactor raw-vector
    // fetches per query for recall.
    println("\nIVFADC + exact refine (16 cells, nprobe=4, m=4 cb=8): recall@10 vs factor")
    val (cbR2, cdR2) = Ann.buildPqResidual(corp, "neighbor_id", "embedding", ivf, 4, 8)
    val ix2 = Ann.pqIvfIndexOf(cbR2, cdR2, "neighbor_id", ivf)
    for (factor <- Seq(1, 2, 3, 6, 10)) {
      val r = recallOf(Ann.ivfPqRefineTopK(queries, "query_id", "embedding", ix2,
        corp.select(col("neighbor_id"), col("embedding")), "neighbor_id", "embedding",
        4, 10, 4, factor))
      println(f"factor=$factor%-3d recall=$r%.3f")
    }
  }
}
