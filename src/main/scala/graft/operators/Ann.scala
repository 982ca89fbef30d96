package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over embedding columns.
  *
  * Two paths:
  *   - [[bruteTopK]]: exact cosine top-k — the correctness baseline.
  *     Broadcast the (small) query set, scan the corpus once, window
  *     top-k. Linear in corpus size; right answer, O(|Q|·n) work.
  *   - [[lshTopK]]: the scale path. L tables of B random-hyperplane
  *     sign bits; corpus hashed once (L rows per vector), queries
  *     multiprobe their bucket plus all Hamming-1 neighbors. The
  *     candidate join is a shuffle on (table, bucket) — never O(n²) —
  *     and exact cosine re-ranks only candidates. At cluster scale the
  *     hashed corpus is computed once and reused across query batches
  *     (persist/bucketBy on the bucket key), so each search touches
  *     ~L·(1+B)·n/2^B corpus rows instead of n.
  *
  * All arithmetic is Spark built-ins (zip_with/aggregate folds —
  * codegen'd, no UDFs); hyperplanes are deterministic from a fixed
  * seed so results are reproducible run to run.
  */
object Ann {

  /** sequential left-fold dot product (deterministic per row) */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact brute-force cosine top-k for each query vector. */
  def bruteTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame, // (neighbor_id, cv)
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic random hyperplanes: L tables × B bits, each plane a
    * `dim`-vector. Generated on the driver (tiny) and inlined as a
    * literal — broadcast with the plan, no shuffle. */
  def planes(dim: Int, tables: Int, bits: Int, seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val rnd = new Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian())))
  }

  /** Hash every row of `df` into its L bucket codes:
    * output = input columns + (table INT, bucket INT). */
  def bucketize(df: DataFrame, vecCol: String, planes: Seq[Seq[Seq[Double]]]): DataFrame = {
    val tableBuckets: Seq[Column] = planes.zipWithIndex.map { case (tablePlanes, t) =>
      val code = tablePlanes.zipWithIndex.map { case (p, i) =>
        val planeLit = array(p.map(lit): _*)
        when(dot(col(vecCol), planeLit) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("table"), code.as("bucket"))
    }
    df.withColumn("tb", explode(array(tableBuckets: _*)))
      .withColumn("table", col("tb.table"))
      .withColumn("bucket", col("tb.bucket"))
      .drop("tb")
  }

  /** All Hamming-1 probe buckets for a code (multiprobe). */
  private def probes(bucket: Column, bits: Int): Column =
    array((bucket +: (0 until bits).map(i => bucket.bitwiseXOR(lit(1 << i)))): _*)

  /** LSH-accelerated cosine top-k.
    * queries: (query_id, qv), corpus: (neighbor_id, cv). */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      dim: Int,
      tables: Int = 4,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val ps = planes(dim, tables, bits, seed)
    val hashedCorpus = bucketize(corpus, "cv", ps)
      .select(col("neighbor_id"), col("cv"), col("table"), col("bucket"))
    val hashedQueries = bucketize(queries, "qv", ps)
      .withColumn("probe", explode(probes(col("bucket"), bits)))
      .select(col("query_id"), col("qv"), col("table"), col("probe").as("bucket"))
    val candidates = hashedQueries.join(hashedCorpus, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    candidates.withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
