package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

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
  * Dot products go through the codegen'd `vec_dot` expression
  * (graft.functions.VecDot) — sequential left-fold double arithmetic,
  * deterministic and oracle-exact. The hyperplane tensor is carried as
  * ONE nested-array literal (`typedlit`), not B·L·dim separate `lit`
  * nodes: the expression tree stays ~30 nodes instead of ~40k, which
  * keeps task binaries small and plan compilation off the hot path.
  * Hyperplanes are deterministic from a fixed seed so results are
  * reproducible run to run.
  */
object Ann {

  import VectorFunctions.{vec_dot, vec_cosine}

  /** Exact brute-force cosine top-k for each query vector.
    *
    * Top-k via the bounded-heap `topk_by` aggregate (same as its
    * quantized/LSH siblings), NOT a row_number window: the window form
    * shuffles every scored candidate (|Q|·n rows), while the aggregate
    * reduces each partition to ≤k rows per query map-side — the
    * exchange carries |Q|·k·16 bytes regardless of corpus size. The
    * heap's total order (score desc, id asc) is bit-identical to
    * `row_number() OVER (ORDER BY cos DESC, neighbor_id ASC)`. */
  def bruteTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame, // (neighbor_id, cv)
      k: Int): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    graft.functions.TopKFunctions.register(queries.sparkSession)
    import graft.functions.TopKFunctions.topk_by
    corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vec_cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(topk_by(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("i") + 1).cast("int").as("rank"), col("p.score").as("cos"))
  }

  /** SemDeDup-style semantic duplicate detection (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with a deterministic
    * fixed-iteration k-means build (operators/Kmeans), then compare
    * vectors pairwise ONLY within their cluster — the trained Voronoi
    * cells bound the quadratic pair term, which is what makes
    * embedding-level dedup feasible at corpus scale (SemDeDup runs
    * 50k clusters over LAION). Emits one row per detected duplicate:
    * (idCol, cid, dup_of, cos) where `dup_of` is the SMALLEST
    * same-cluster id with cosine ≥ threshold — the deterministic
    * keep-lowest-id representative choice.
    *
    * Scale shape: k-means exchanges are narrow (operators/Kmeans);
    * the pair join is ONE cid-keyed exchange of the embeddings with
    * norms computed once per vector. Scale `k` with the corpus to
    * keep per-cluster pair counts bounded — but the engine does NOT
    * rely on the caller choosing k well: a degenerate Voronoi cell (a
    * boilerplate embedding, a zero-vector mode) above `hotClusterCap`
    * members routes to a triangle-salted variant of the in-cluster
    * join (same scheme as TextDedup's hot band buckets): members
    * split into `hotClusterSalts` groups by id hash, group cell
    * (i, j) i ≤ j computed by its own task, so one hot cluster
    * spreads over g·(g+1)/2 salt cells with (m/g)² work each instead
    * of serializing m² in a single task. Both paths emit each
    * unordered pair exactly once with the identical (dup_of < id)
    * orientation and bit-identical cosine (the fold in vec_dot is
    * index-ordered, so operand swap is exact), so results do not
    * depend on which path a cluster took. */
  def semanticDups(
      corpus: DataFrame, // (idCol, vecCol)
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      threshold: Double,
      hotClusterCap: Int = 4096,
      hotClusterSalts: Int = 16): DataFrame = {
    import VectorFunctions.vec_norm
    val s = corpus.sparkSession
    val emb = corpus.select(col(idCol), col(vecCol))
    val assigned = Kmeans.trainAssign(emb, idCol, vecCol, k, iters)
      .select(col(idCol), col("cid"))
    // ONE normed relation read by both join sides: each norm is
    // computed once per vector — not per side, never per pair — and
    // the per-cluster member count rides the cid partitioning just
    // established as a window (a local sort, no extra exchange).
    // Measured alternative, rejected: aggregating sizes to ≤ k rows
    // and broadcast-joining back avoids the local sort but inserts a
    // broadcast-build JOB BARRIER before the pair join — 1.63 s vs
    // 1.27 s isolated at sf0.1, and the window variant's scale
    // behavior is the one measured good (6.84 s sf1 / 96.3 s sf10,
    // BENCH_NOTES round-8 curves).
    val n = emb.join(assigned, idCol)
      .select(col("cid"), col(idCol), col(vecCol),
        vec_norm(col(vecCol)).as("nrm"))
      .repartition(s.sparkContext.defaultParallelism, col("cid"))
    val tagged = n.withColumn("csz",
      count(lit(1)).over(Window.partitionBy(col("cid"))))
    def side(d: DataFrame, sfx: String, salts: Seq[Column]): DataFrame =
      d.select(Seq(col("cid")) ++ salts ++ Seq(col(idCol).as(s"id_$sfx"),
        col(vecCol).as(s"v_$sfx"), col("nrm").as(s"n_$sfx")): _*)
    def cosOf: Column =
      vec_dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))
    // small clusters: plain in-cluster self-join (both sides read the
    // one cid exchange via ReuseExchange); id_a < id_b keeps each
    // unordered pair once
    val small = tagged.filter(col("csz") <= hotClusterCap)
    val smallPairs = side(small, "a", Nil).join(side(small, "b", Nil), Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b").as(idCol), col("cid"),
        col("id_a").as("dup_of"), cosOf.as("cos"))
    // triangle-salted expansion for oversized clusters: a member of
    // group s joins as the A side of cells (s, j ≥ s) and the B side
    // of cells (i ≤ s, s); an unordered pair {a, b} lands in exactly
    // cell (min(gₐ, g_b), max(gₐ, g_b)) — twice when gₐ = g_b, which
    // the id_a < id_b condition dedups
    val g = hotClusterSalts
    val big = tagged.filter(col("csz") > hotClusterCap)
      .withColumn("gs", pmod(hash(col(idCol)), lit(g)))
    val lefts = big.withColumn("gj", explode(sequence(col("gs"), lit(g - 1))))
      .transform(d => side(d, "a", Seq(col("gs").as("gi"), col("gj"))))
    val rights = big.withColumn("gi", explode(sequence(lit(0), col("gs"))))
      .transform(d => side(d, "b", Seq(col("gi"), col("gs").as("gj"))))
    // explicit salt-cell exchange: under subset-key co-partition
    // acceptance the planner would reuse the cid partitioning here and
    // re-serialize the hot cluster into one task (see TextDedup's
    // identical guard)
    val saltKeys = Seq(col("cid"), col("gi"), col("gj"))
    val bigPairs = lefts.repartition(saltKeys: _*)
      .join(rights.repartition(saltKeys: _*), Seq("cid", "gi", "gj"))
      .filter(col("gi") < col("gj") || col("id_a") < col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as(idCol), col("cid"),
        least(col("id_a"), col("id_b")).as("dup_of"), cosOf.as("cos"))
    val pairs = smallPairs.union(bigPairs).filter(col("cos") >= threshold)
    val w = Window.partitionBy(col(idCol)).orderBy(col("dup_of"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col("cid"), col("dup_of"), col("cos"))
  }

  /** Scalar int8 quantization of an embedding column (the classic SQ8
    * compression ANN indexes use): per-vector symmetric scale
    * `s = max_i |v_i|`, elements mapped to round(v_i·127/s) ∈ [-127,127].
    *
    * Why it matters at 100 TB: an int8 vector is 4× smaller than
    * float32 — 4× less scan IO, 4× more vectors per executor, and the
    * candidate-scoring dot becomes exact integer arithmetic. Cosine
    * over quantized vectors needs NO per-pair descaling: the two
    * per-vector scales cancel, so `vec_dot(qa,qb)/(|qa|·|qb|)` on the
    * int arrays directly approximates the float cosine (each element
    * carries ≤ 1/254 relative rounding). All arithmetic (abs/max on
    * floats, one double multiply-divide-round per element, integer
    * dots) is order-fixed and engine-portable, so quantized search
    * results are fully oracle-checkable.
    *
    * A zero vector has scale 0; it quantizes to all zeros rather than
    * dividing by zero. */
  def quantizeQ8(vec: Column): Column = {
    val scale = array_max(transform(vec, x => abs(x))).cast("double")
    when(scale === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => round(x.cast("double") * lit(127.0) / scale).cast("int")))
  }

  /** Exact cosine top-k over SQ8-quantized vectors: quantize both
    * sides, then the brute path on int arrays (scales cancel — see
    * [[quantizeQ8]]). The compressed corpus is what would be persisted
    * at scale; re-quantizing here keeps the operator self-contained. */
  def quantizedTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame, // (neighbor_id, cv)
      k: Int): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    graft.functions.TopKFunctions.register(queries.sparkSession)
    import graft.functions.TopKFunctions.topk_by
    val q = queries.select(col("query_id"), quantizeQ8(col("qv")).as("qq"))
      .withColumn("qn", sqrt(vec_dot(col("qq"), col("qq"))))
    val c = corpus.select(col("neighbor_id"), quantizeQ8(col("cv")).as("cq"))
      .withColumn("cn", sqrt(vec_dot(col("cq"), col("cq"))))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_q8", vec_dot(col("qq"), col("cq")) / (col("qn") * col("cn")))
      .groupBy(col("query_id"))
      .agg(topk_by(col("cos_q8"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("i") + 1).cast("int").as("rank"), col("p.score").as("cos_q8"))
  }

  /** An IVF index: trained cell centroids (cid, centroid ARRAY<DOUBLE>)
    * plus the corpus assignment (neighbor_id, cid). Both are narrow
    * relations — the index for a 10⁹-vector corpus is one long pair
    * per vector plus k·dim doubles, independent of vector width. */
  final case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /** Build an IVF index: `lloydIters` k-means rounds from deterministic
    * seeds (operators/Kmeans — broadcast centroids, narrow shuffles),
    * then assign every corpus vector to its trained cell.
    * corpus: (neighbor_id, cv). */
  def buildIvf(corpus: DataFrame, cells: Int, lloydIters: Int = 1): IvfIndex = {
    val emb = corpus.select(col("neighbor_id").as("vec_id"), col("cv").as("embedding"))
    var cents = emb.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    for (_ <- 1 to lloydIters) {
      val a = Kmeans.assign(emb, "vec_id", "embedding", cents)
      cents = Kmeans.centroidsOf(
        a.join(emb, "vec_id").select(col("embedding"), col("cid")), "embedding")
    }
    val assign = Kmeans.assign(emb, "vec_id", "embedding", cents)
      .select(col("vec_id").as("neighbor_id"), col("cid"))
    IvfIndex(cents, assign)
  }

  /** Persist an IVF index. Assignments are clustered by cell id so a
    * probe touches only the files of its nprobe cells; this is the
    * "hashed/assigned once, reused across query batches" layout the
    * 100 TB path needs — the index build's corpus pass never repeats. */
  def saveIvf(index: IvfIndex, path: String): Unit = {
    index.centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    index.assignments.repartition(col("cid"))
      .write.mode("overwrite").parquet(s"$path/assignments")
  }

  def loadIvf(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/assignments"))

  /** Persist the IVF assignments as a BUCKETED catalog table on the
    * cell id (centroids stay a tiny parquet — they broadcast anyway).
    * The bucketing survives to read time, so a probe's
    * candidates-by-cell join pays no exchange on the stored corpus
    * assignment — only the per-query probe rows shuffle. The
    * 10⁹-vector corollary of [[TextDedup.writeSignatureIndexBucketed]]. */
  def saveIvfBucketed(index: IvfIndex, table: String, centroidPath: String,
      buckets: Int = 64): Unit = {
    index.centroids.coalesce(1).write.mode("overwrite").parquet(centroidPath)
    index.assignments.write.mode("overwrite")
      .bucketBy(buckets, "cid").sortBy("cid")
      .saveAsTable(table)
  }

  def loadIvfBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
      centroidPath: String): IvfIndex =
    IvfIndex(spark.read.parquet(centroidPath), spark.table(table))

  /** IVF cosine top-k against a prebuilt index: queries probe their
    * `nprobe` nearest cells (same squared-L2 metric the index was
    * built with), and only corpus vectors assigned to probed cells are
    * exact-reranked. queries: (query_id, qv); corpus: (neighbor_id, cv)
    * — the verify relation the reranker re-attaches by id. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, index: IvfIndex,
      k: Int, nprobe: Int): DataFrame = {
    val s = queries.sparkSession
    VectorFunctions.register(s)
    graft.functions.TopKFunctions.register(s)
    import graft.functions.TopKFunctions.topk_by
    val q = queries.withColumn("qn", sqrt(vec_dot(col("qv"), col("qv"))))
    val c = corpus.withColumn("cn", sqrt(vec_dot(col("cv"), col("cv"))))
    val probes = q.crossJoin(broadcast(index.centroids))
      .select(col("query_id"),
        Kmeans.distSq(col("qv"), col("centroid")).as("d2"), col("cid"))
      .groupBy(col("query_id"))
      .agg(topk_by(-col("d2"), col("cid"), nprobe).as("pr"))
      .select(col("query_id"), explode(col("pr").getField("id")).as("cid"))
    probes.join(index.assignments, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .join(broadcast(q), "query_id")
      .join(c, "neighbor_id")
      .withColumn("cos", vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .groupBy(col("query_id"))
      .agg(topk_by(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("i") + 1).cast("int").as("rank"), col("p.score").as("cos"))
  }

  /** Filtered ANN: the IVF probe of [[ivfTopK]] with a query-time
    * metadata predicate applied to the PROBED candidates before exact
    * scoring — top-k is computed over matching vectors only (the
    * "pre-filtered search" mode vector stores expose; FAISS's
    * IDSelector and Milvus boolean exprs are the native-engine
    * equivalents). Post-filtering a plain top-k instead would return
    * fewer than k hits whenever the filter is selective. The index is
    * built over the FULL corpus — the filter rides the corpus relation
    * as a plain column predicate, so Spark pushes it into the corpus
    * scan and the candidate join shrinks before any vector math runs.
    * At 10⁹ vectors the probed-cell candidate set is the only
    * data-sized relation here, and the filter prunes it map-side. */
  def ivfFilteredTopK(queries: DataFrame, corpus: DataFrame, index: IvfIndex,
      k: Int, nprobe: Int, candidateFilter: Column): DataFrame = {
    val s = queries.sparkSession
    VectorFunctions.register(s)
    graft.functions.TopKFunctions.register(s)
    import graft.functions.TopKFunctions.topk_by
    val q = queries.withColumn("qn", sqrt(vec_dot(col("qv"), col("qv"))))
    val c = corpus.filter(candidateFilter)
      .withColumn("cn", sqrt(vec_dot(col("cv"), col("cv"))))
    val probes = q.crossJoin(broadcast(index.centroids))
      .select(col("query_id"),
        Kmeans.distSq(col("qv"), col("centroid")).as("d2"), col("cid"))
      .groupBy(col("query_id"))
      .agg(topk_by(-col("d2"), col("cid"), nprobe).as("pr"))
      .select(col("query_id"), explode(col("pr").getField("id")).as("cid"))
    probes.join(index.assignments, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .join(broadcast(q), "query_id")
      .join(c, "neighbor_id") // inner join = the predicate prunes candidates
      .withColumn("cos", vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .groupBy(col("query_id"))
      .agg(topk_by(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("i") + 1).cast("int").as("rank"), col("p.score").as("cos"))
  }

  /** Deterministic random hyperplanes: L tables × B bits, each plane a
    * `dim`-vector. Generated on the driver (tiny) and inlined as a
    * single nested-array literal — broadcast with the plan, no shuffle. */
  def planes(dim: Int, tables: Int, bits: Int, seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val rnd = new Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian())))
  }

  /** Hash every row of `df` into its L bucket codes:
    * output = input columns + (table INT, bucket INT). */
  def bucketize(df: DataFrame, vecCol: String, planes: Seq[Seq[Seq[Double]]]): DataFrame = {
    VectorFunctions.register(df.sparkSession) // callers compose with vec_dot/vec_cosine
    graft.functions.LshFunctions.register(df.sparkSession)
    val planesLit = typedlit(planes) // array<array<array<double>>>
    // per table t: bucket = Σ_i [dot(v, plane_i) > 0] · 2^i — the whole
    // L×B×dim loop runs in the codegen'd lsh_buckets expression (one
    // call per row) instead of L interpreted aggregate/vec_dot lambdas
    df.select(col("*"),
      posexplode(graft.functions.LshFunctions.lsh_buckets(col(vecCol), planesLit))
        .as(Seq("table", "bucket")))
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
      seed: Long = 42L,
      sourceSplits: Option[Int] = None): DataFrame = {
    val ps = planes(dim, tables, bits, seed)
    // Single-row-group test files scan as one partition; spread the
    // corpus before the (compute-heavy) hashing so it parallelizes.
    // Only when the source is genuinely under-split: at real scale the
    // source already has >cores splits and a full-width repartition of
    // the embedding column would be the dominant (and pointless) shuffle.
    // `sourceSplits` lets a caller that knows its input's split count
    // pin the decision; otherwise a logical-stats estimate decides —
    // never a `.rdd` probe, which would plan the query a second time.
    // DELIBERATE deviation from the shared Scale.spread policy (cap
    // 16, spread to the cap): per-row work here is L tables of
    // bits-wide hyperplane dot products over the full embedding —
    // heavy enough that spreading to FULL parallelism measured better
    // than the 16 cap, and the tighter `<8` trigger avoids paying a
    // full-width embedding shuffle for a source that is only mildly
    // under-split.
    val parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    val splits = sourceSplits.getOrElse(Scale.estimatedSplits(corpus))
    val spread =
      if (splits < math.min(parallelism, 8))
        corpus.repartition(parallelism)
      else corpus
    // Ids-only through every exchange: the bucket join and the
    // candidate dedup shuffle (id, table, bucket) rows — a few longs —
    // never the embedding vectors. A candidate that collides in c of
    // the L·(bits+1) probe combinations would otherwise drag its
    // vectors across the join exchange c times and the distinct once
    // more; instead each side's vectors re-attach ONCE by id after the
    // dedup (the same contract the cross-corpus dedup path pins in
    // ScaleSpec's "no wide column in any Exchange" test).
    val hashedCorpus = bucketize(spread, "cv", ps)
      .select(col("neighbor_id"), col("table"), col("bucket"))
    val hashedQueries = bucketize(queries, "qv", ps)
      .withColumn("probe", explode(probes(col("bucket"), bits)))
      .select(col("query_id"), col("table"), col("probe").as("bucket"))
    val candidateIds = hashedQueries.join(hashedCorpus, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val candidates = candidateIds
      .join(spread.select(col("neighbor_id"), col("cv")), "neighbor_id")
      .join(queries.select(col("query_id"), col("qv")), "query_id")
    // topk_by instead of a row_number window: partial k-element heaps
    // per partition mean the final exchange carries ≤ k rows per query
    // rather than every scored candidate (see TopKAggregate).
    graft.functions.TopKFunctions.register(queries.sparkSession)
    candidates.withColumn("cos", vec_cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions.topk_by(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("i") + 1).cast("int").as("rank"), col("p.score").as("cos"))
  }

  // ------------------------------------------------------------------ //
  // Product quantization (Jégou, Douze, Schmid, "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011) — the 100 TB ANN memory
  // path: split each d-dim vector into m contiguous d/m-dim
  // sub-blocks, train one small codebook per sub-block, store each
  // corpus vector as m small codes (m bytes at codebookSize ≤ 256 —
  // a d·4-byte float vector compresses ~d·4/m ×). Queries never touch
  // the raw corpus: per query, one distance TABLE per sub-block
  // (codebookSize entries) is computed against the codebooks, and each
  // candidate's approximate distance is m table lookups summed (ADC).
  // ------------------------------------------------------------------ //

  /** Sub-block i of a d-dim vector: dims [i·⌊d/m⌋, (i+1)·⌊d/m⌋), with
    * the LAST block extended to cover the d mod m remainder dims (as
    * FAISS does for non-divisible layouts) — without the extension the
    * trailing dims would be silently excluded from every codebook,
    * code, and ADC distance. For divisible d (the common case, and the
    * one the s07/s08 oracles replay) all blocks are exactly d/m. */
  private[graft] def subSlice(vec: Column, mIdx: Column, m: Int): Column = {
    val sd = floor(size(vec) / m).cast("int")
    slice(vec, mIdx * sd + 1,
      when(mIdx === m - 1, size(vec) - sd * (m - 1)).otherwise(sd))
  }

  /** Train PQ codebooks and encode the corpus.
    *
    * Training is the house deterministic recipe (the s05/IVF one, per
    * sub-block): seeds = the codebookSize smallest-id vectors'
    * sub-blocks, one Lloyd round with decimal-exact means
    * (Kmeans.centroidsOf arithmetic), assignment ties to the smaller
    * centroid id — bit-identical replayable in oracle SQL.
    *
    * Scale shape: sub-blocks ride as ROWS (corpus × m of narrow
    * (id, m, subvec)), so every stage is one corpus pass — the
    * centroid comparison is a BROADCAST join keyed by the sub-block
    * index m (codebooks are m·codebookSize rows), the means are one
    * (m, cid)-keyed aggregate with map-side decimal partials, and the
    * returned codes relation is m small ints per corpus row. No stage
    * ever pairs corpus rows with each other.
    *
    * Returns (codebooks: (m, cid, centroid array<double>),
    *          codes: (idCol, m, code)). */
  def buildPq(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, codebookSize: Int, lloydIters: Int = 1): (DataFrame, DataFrame) =
    trainEncodePq(corpus, idCol, vecCol, m, codebookSize, lloydIters)

  /** The corpus RESIDUAL relation of an IVF index: one (idCol, rv) row
    * per corpus vector where rv = vector − centroid of its assigned
    * cell (element-wise double subtraction, engine-exact). The relation
    * residual PQ trains on — one corpus pass, centroids broadcast. */
  def residualsOf(corpus: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex): DataFrame = {
    val asgn = ivf.assignments.withColumnRenamed("neighbor_id", idCol)
    corpus.join(asgn, idCol)
      .join(broadcast(ivf.centroids), "cid")
      .select(col(idCol),
        zip_with(col(vecCol), col("centroid"),
          (x, c) => x.cast("double") - c).as("rv"))
  }

  /** Train PQ codebooks and encode the corpus on IVF RESIDUALS — the
    * actual IVFADC layout (Jégou et al. 2011 §IV; FAISS by_residual):
    * each vector is coded as (cell, PQ codes of vector − cell
    * centroid). Residuals span the (much smaller) Voronoi-cell
    * neighborhood instead of the whole space, so the same bit budget
    * buys materially better recall than raw-vector codes (PqLab
    * table). Training arithmetic is exactly [[buildPq]]'s recipe run
    * on the residual relation, so the whole build replays in oracle
    * SQL with one added centroid-subtract join. Probe with
    * [[ivfPqTopKResidual]] — raw [[ivfPqTopK]] tables would score the
    * wrong metric against residual codes. */
  def buildPqResidual(corpus: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex, m: Int, codebookSize: Int,
      lloydIters: Int = 1): (DataFrame, DataFrame) =
    trainEncodePq(residualsOf(corpus, idCol, vecCol, ivf), idCol, "rv",
      m, codebookSize, lloydIters)

  private def trainEncodePq(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, codebookSize: Int, lloydIters: Int): (DataFrame, DataFrame) = {
    require(m >= 1 && codebookSize >= 1 && lloydIters >= 1,
      s"buildPq: m=$m codebookSize=$codebookSize lloydIters=$lloydIters")
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    graft.functions.TopKFunctions.register(corpus.sparkSession)
    import graft.functions.TopKFunctions.topk_by

    def subBlocks(df: DataFrame): DataFrame = df
      .select(col(idCol), explode(sequence(lit(0), lit(m - 1))).as("m"), col(vecCol))
      .select(col(idCol), col("m"),
        transform(subSlice(col(vecCol), col("m"), m), _.cast("double")).as("sv"))

    // Three consumers re-derive this relation from the scan (seed
    // assignment, the mean join, the final encode). A localCheckpoint
    // pin was A/B-measured a WASH at sf0.1 AND sf10 (1.28→1.31 s /
    // 4.99→5.03 s isolated): slicing floats out of a parquet scan is
    // cheap; the wall is the broadcast-join argmin arithmetic, which
    // runs either way — so the build stays lazy and pays no
    // materialization memory at scale.
    val subs = subBlocks(corpus)
    // nearest centroid per (vector, sub-block): broadcast join on m,
    // bounded-heap argmin with ties to the smaller cid
    def assignTo(cents: DataFrame): DataFrame = subs
      .join(broadcast(cents), "m")
      .select(col(idCol), col("m"), col("cid"),
        Kmeans.distSq(col("sv"), col("centroid")).as("d2"))
      .groupBy(col(idCol), col("m"))
      .agg(topk_by(-col("d2"), col("cid"), 1).as("best"))
      .select(col(idCol), col("m"),
        element_at(col("best"), 1).getField("id").as("cid"))

    val seeds = subBlocks(corpus.filter(col(idCol) < codebookSize))
      .select(col("m"), col(idCol).as("cid"), col("sv").as("centroid"))
    // Lloyd rounds: decimal-exact per-(m, cid) means (the
    // Kmeans.centroidsOf arithmetic with the sub-block key added).
    // Every round is deterministic, so any lloydIters replays exactly;
    // the s07/s08 oracles pin the default single round. More rounds
    // buy recall at the same code size (table in BENCH_NOTES).
    graft.functions.VecSumFunctions.register(corpus.sparkSession)
    import graft.functions.VecSumFunctions.vec_decimal_sum
    def meansOf(cents: DataFrame): DataFrame = assignTo(cents)
      .join(subs, Seq(idCol, "m"))
      .select(col("m"), col("cid"),
        transform(col("sv"), x => x.cast(org.apache.spark.sql.types.DecimalType(38, 9)))
          .as("dv"))
      .groupBy(col("m"), col("cid"))
      .agg(vec_decimal_sum(col("dv")).as("sums"), count(col("dv")).as("n"))
      .select(col("m"), col("cid"),
        transform(col("sums"), s => s.cast("double") / col("n")).as("centroid"))
    var codebooks = meansOf(seeds)
    for (_ <- 2 to lloydIters) codebooks = meansOf(codebooks)

    val codes = assignTo(codebooks)
      .select(col(idCol), col("m"), col("cid").as("code"))
    (codebooks, codes)
  }

  /** The persistable IVF+PQ serving index (the s08 layout): tiny
    * centroid + codebook relations (they broadcast at query time) and
    * one (cid, id, m, code) row per corpus sub-block. */
  case class PqIvfIndex(centroids: DataFrame, codebooks: DataFrame, codes: DataFrame)

  /** Persist the IVF+PQ index with the codes BUCKETED by cell id —
    * the 10⁹-vector serving layout ([[saveIvfBucketed]]'s corollary):
    * at 100 TB nobody retrains per query session, the codes/codebooks
    * relation IS the artifact. A probe joins the stored codes on the
    * bucketed cid with NO exchange on the corpus-sized side — only the
    * per-query probe rows shuffle. `codes` are buildPq's (idCol, m,
    * code); `assignments` are buildIvf's (neighbor_id, cid). */
  def savePqBucketed(index: PqIvfIndex, idCol: String, table: String,
      auxPath: String, buckets: Int = 64): Unit = {
    require(index.codes.columns.sorted.sameElements(
        Array("cid", "code", idCol, "m").sorted),
      s"savePqBucketed: codes must be (cid, $idCol, m, code) — got " +
        index.codes.columns.mkString("(", ", ", ")"))
    index.centroids.coalesce(1).write.mode("overwrite").parquet(s"$auxPath/centroids")
    index.codebooks.coalesce(1).write.mode("overwrite").parquet(s"$auxPath/codebooks")
    index.codes
      .write.mode("overwrite").bucketBy(buckets, "cid").sortBy("cid")
      .saveAsTable(table)
  }

  def loadPqBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
      auxPath: String): PqIvfIndex =
    PqIvfIndex(
      spark.read.parquet(s"$auxPath/centroids"),
      spark.read.parquet(s"$auxPath/codebooks"),
      spark.table(table))

  /** Assemble the in-flight PqIvfIndex from a PQ build and an IVF
    * build over the same corpus: codes keyed into their vector's cell
    * — the relation [[savePqBucketed]] persists and [[ivfPqTopK]]
    * probes. */
  def pqIvfIndexOf(codebooks: DataFrame, codes: DataFrame, idCol: String,
      ivf: IvfIndex): PqIvfIndex = {
    val asgn = ivf.assignments.withColumnRenamed("neighbor_id", idCol)
    PqIvfIndex(ivf.centroids, codebooks,
      codes.join(asgn, idCol).select(col("cid"), col(idCol), col("m"), col("code")))
  }

  /** IVF+PQ ADC top-k against a (possibly persisted-bucketed) index —
    * the s08 probe path as a reusable operator: a query probes its
    * nprobe nearest cells (broadcast centroids), candidates are ONLY
    * the probed cells' code rows (a cid join the bucketed layout
    * serves exchange-free on the stored side), and each candidate is
    * scored by m broadcast ADC table lookups. Raw vectors are never
    * read. Returns (queryIdCol, idCol, rk, adc_d2), same contract as
    * [[pqTopK]]. */
  def ivfPqTopK(queries: DataFrame, queryIdCol: String, queryVecCol: String,
      index: PqIvfIndex, idCol: String, m: Int, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TopKFunctions.register(spark)
    import graft.functions.TopKFunctions.topk_by
    val probes = queries.crossJoin(broadcast(index.centroids))
      .select(col(queryIdCol),
        Kmeans.distSq(col(queryVecCol), col("centroid")).as("d2"), col("cid"))
      .groupBy(col(queryIdCol))
      .agg(topk_by(-col("d2"), col("cid"), nprobe).as("pr"))
      .select(col(queryIdCol), explode(col("pr").getField("id")).as("cid"))
    val qsubs = queries
      .select(col(queryIdCol), explode(sequence(lit(0), lit(m - 1))).as("m"),
        col(queryVecCol))
      .select(col(queryIdCol), col("m"),
        transform(subSlice(col(queryVecCol), col("m"), m), _.cast("double")).as("qsv"))
    val qtab = qsubs.join(index.codebooks, "m")
      .select(col(queryIdCol), col("m").as("qm"), col("cid").as("qcid"),
        Kmeans.distSq(col("qsv"), col("centroid")).as("d2"))
    val cand = probes.join(index.codes, "cid")
      .filter(col(idCol) =!= col(queryIdCol))
    val perBlock = cand
      .join(broadcast(qtab),
        col("m") === col("qm") && col("code") === col("qcid") &&
          cand(queryIdCol) === qtab(queryIdCol))
      .select(cand(queryIdCol), col(idCol), col("m").as("mm"), col("d2"))
    adcTail(perBlock, queryIdCol, idCol, m, k)
  }

  /** IVFADC top-k against a RESIDUAL-encoded index (built with
    * [[buildPqResidual]]): ||q − y||² = ||(q − c_cell) − r_y||², so the
    * per-query ADC tables are computed per PROBED CELL from the query
    * residual q − c_cell — nprobe·m·codebookSize broadcast rows per
    * query (the fixed IVFADC query cost; Jégou et al. 2011 §IV.B) —
    * and each candidate looks its m entries up in ITS cell's table.
    * Same plan shape as [[ivfPqTopK]]: stored-bucketed codes join
    * exchange-free on cid, raw vectors never read at query time. */
  def ivfPqTopKResidual(queries: DataFrame, queryIdCol: String, queryVecCol: String,
      index: PqIvfIndex, idCol: String, m: Int, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TopKFunctions.register(spark)
    import graft.functions.TopKFunctions.topk_by
    val probes = queries.crossJoin(broadcast(index.centroids))
      .select(col(queryIdCol),
        Kmeans.distSq(col(queryVecCol), col("centroid")).as("d2"), col("cid"))
      .groupBy(col(queryIdCol))
      .agg(topk_by(-col("d2"), col("cid"), nprobe).as("pr"))
      .select(col(queryIdCol), explode(col("pr").getField("id")).as("cid"))
    // query residual PER PROBED CELL: (query, cell, q − c_cell)
    val qres = probes.join(queries, queryIdCol)
      .join(broadcast(index.centroids), "cid")
      .select(col(queryIdCol), col("cid").as("qcell"),
        zip_with(col(queryVecCol), col("centroid"),
          (x, c) => x.cast("double") - c).as("rqv"))
    val qsubs = qres
      .select(col(queryIdCol), col("qcell"),
        explode(sequence(lit(0), lit(m - 1))).as("m"), col("rqv"))
      .select(col(queryIdCol), col("qcell"), col("m"),
        subSlice(col("rqv"), col("m"), m).as("qsv"))
    val qtab = qsubs.join(index.codebooks, "m")
      .select(col(queryIdCol), col("qcell"), col("m").as("qm"),
        col("cid").as("qcid"), Kmeans.distSq(col("qsv"), col("centroid")).as("d2"))
    val cand = probes.join(index.codes, "cid")
      .filter(col(idCol) =!= col(queryIdCol))
    val perBlock = cand
      .join(broadcast(qtab),
        col("m") === col("qm") && col("code") === col("qcid") &&
          cand(queryIdCol) === qtab(queryIdCol) && col("cid") === col("qcell"))
      .select(cand(queryIdCol), col(idCol), col("m").as("mm"), col("d2"))
    adcTail(perBlock, queryIdCol, idCol, m, k)
  }

  /** IVFADC + exact REFINE — FAISS's IndexRefineFlat stage on top of
    * the residual index: the compressed probe ([[ivfPqTopKResidual]])
    * NOMINATES k·refineFactor candidates per query, then only those
    * candidates' raw vectors are fetched by id and exact-scored. The
    * production accuracy/IO trade at 100 TB: the corpus-wide scan
    * stays on the m-byte codes; the raw vectors are touched for
    * |Q|·k·refineFactor rows only (an id-keyed point join — bucket the
    * stored corpus by id and it serves exchange-free, the
    * savePqBucketed discipline on the other key). Guarantee: every
    * true top-k member the ADC stage nominates survives exact
    * re-ranking, so recall(refine) ≥ recall(ADC@k) always.
    * Returns (queryIdCol, idCol, rk, d2) ranked by exact squared L2
    * over per-element double casts — oracle-replayable. */
  def ivfPqRefineTopK(queries: DataFrame, queryIdCol: String, queryVecCol: String,
      index: PqIvfIndex, corpus: DataFrame, idCol: String, corpusVecCol: String,
      m: Int, k: Int, nprobe: Int, refineFactor: Int = 3): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1, got $refineFactor")
    import graft.functions.TopKFunctions.topk_by
    val cand = ivfPqTopKResidual(queries, queryIdCol, queryVecCol, index,
        idCol, m, k * refineFactor, nprobe)
      .select(col(queryIdCol), col(idCol))
    // the candidate relation is |Q|·k·refineFactor rows BY CONTRACT —
    // broadcast it explicitly so the raw-vector fetch is a map-side
    // probe of the corpus scan, never an id exchange of the embeddings
    broadcast(cand)
      .join(corpus.select(col(idCol), col(corpusVecCol).as("__cv")), idCol)
      .join(broadcast(queries.select(col(queryIdCol), col(queryVecCol).as("__qv"))),
        queryIdCol)
      .select(col(queryIdCol), col(idCol),
        Kmeans.distSq(
          transform(col("__qv"), _.cast("double")),
          transform(col("__cv"), _.cast("double"))).as("d2"))
      .groupBy(col(queryIdCol))
      .agg(topk_by(-col("d2"), col(idCol), k).as("top"))
      .select(col(queryIdCol), posexplode(col("top")).as(Seq("i", "p")))
      .select(col(queryIdCol), col("p.id").as(idCol),
        (col("i") + 1).cast("int").as("rk"),
        round(-col("p.score"), 6).as("d2"))
      .orderBy(col(queryIdCol), col("rk"))
  }

  /** The shared ADC scoring tail: per-candidate fixed-association sum
    * of its m looked-up table entries (per-sub-block pivot, then
    * left-to-right adds — bit-stable across engines), then the
    * bounded-heap top-k. perBlock: (queryIdCol, idCol, mm, d2). */
  private def adcTail(perBlock: DataFrame, queryIdCol: String, idCol: String,
      m: Int, k: Int): DataFrame = {
    import graft.functions.TopKFunctions.topk_by
    val pivots = (0 until m).map(i =>
      max(when(col("mm") === i, col("d2"))).as(s"d$i"))
    val total = (1 until m).foldLeft(col("d0")) { (acc, i) => acc + col(s"d$i") }
    perBlock.groupBy(col(queryIdCol), col(idCol))
      .agg(pivots.head, pivots.tail: _*)
      .select(col(queryIdCol), col(idCol), total.as("adc"))
      .groupBy(col(queryIdCol))
      .agg(topk_by(-col("adc"), col(idCol), k).as("top"))
      .select(col(queryIdCol), posexplode(col("top")).as(Seq("i", "p")))
      .select(col(queryIdCol), col("p.id").as(idCol),
        (col("i") + 1).cast("int").as("rk"),
        round(-col("p.score"), 6).as("adc_d2"))
      .orderBy(col(queryIdCol), col("rk"))
  }

  /** ADC top-k over a PQ-encoded corpus: per query one distance table
    * per sub-block against the codebooks (|Q|·m·codebookSize rows —
    * broadcast), then each candidate's approximate squared L2 is its m
    * looked-up entries summed with FIXED association (per-sub-block
    * pivot, then left-to-right adds — bit-stable across engines). The
    * corpus-sized side of every join is the CODES relation; the raw
    * vectors are never read at query time. Returns (queryIdCol,
    * idCol, rk, adc_d2). */
  def pqTopK(queries: DataFrame, queryIdCol: String, queryVecCol: String,
      codebooks: DataFrame, codes: DataFrame, idCol: String,
      m: Int, k: Int): DataFrame = {
    graft.functions.VectorFunctions.register(queries.sparkSession)
    graft.functions.TopKFunctions.register(queries.sparkSession)
    import graft.functions.TopKFunctions.topk_by
    val qsubs = queries
      .select(col(queryIdCol), explode(sequence(lit(0), lit(m - 1))).as("m"),
        col(queryVecCol))
      .select(col(queryIdCol), col("m"),
        transform(subSlice(col(queryVecCol), col("m"), m), _.cast("double")).as("qsv"))
    val qtab = qsubs.join(codebooks, "m")
      .select(col(queryIdCol), col("m").as("qm"), col("cid"),
        Kmeans.distSq(col("qsv"), col("centroid")).as("d2"))
    val perBlock = codes.join(broadcast(qtab),
        codes("m") === col("qm") && codes("code") === col("cid"))
      .select(codes(idCol), col(queryIdCol), codes("m").as("mm"), col("d2"))
      .filter(col(idCol) =!= col(queryIdCol))
    adcTail(perBlock, queryIdCol, idCol, m, k)
  }
}
