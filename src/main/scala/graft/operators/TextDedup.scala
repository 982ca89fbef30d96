package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** MinHash-LSH near-duplicate detection and duplicate-cluster
  * resolution as a reusable library surface (the battery entries
  * p08/p13 delegate here). Output column contract: `nearDupPairs`
  * emits (doc_a, doc_b, jac); `dupClusters` emits (doc_id, cluster_id,
  * is_canonical).
  */
object TextDedup {

  private val K = graft.functions.MinhashFunctions.DefaultK
  private val P = graft.functions.MinhashFamily.P

  /** Verified near-dup pairs (doc_a < doc_b, jaccard >= `threshold`)
    * over token sets, blocked by `blockCol` (pairs never cross blocks).
    *
    * 100 TB shape: K=16 minhashes, 8 bands of 2 rows; candidates come
    * from an in-bucket SELF-JOIN on (block, band_idx, band_hash) —
    * both sides read the one banded exchange (ReuseExchange), each
    * unordered pair survives once via id_a < id_b, and every predicate
    * (size-ratio prefilter, first-colliding-band dedup) is a plain
    * whole-stage-codegen boolean over the fixed-width signature
    * arrays, so the pair blow-up never touches an interpreted lambda
    * and no second dedup shuffle is needed. Band rows carry a narrow
    * fixed-size payload; the bare winning pair ids are materialized
    * (localCheckpoint) before the verify joins, and the wide token
    * arrays re-attach by doc id against that known-small relation. The
    * exact verify is a codegen'd sorted-merge intersection count.
    *
    * Hot buckets: a degenerate band bucket (boilerplate documents
    * sharing a signature) would land one bucket's O(m²) join output in
    * a single task. Buckets above `hotBucketCap` members therefore
    * route to a triangle-salted variant of the same join: members
    * split into `hotBucketSalts` groups by id hash, group pair (i, j)
    * i ≤ j computed by its own task, so one hot bucket spreads over
    * g·(g+1)/2 cells with (m/g)² work each. Same emission contract,
    * so results are identical and no cross-path duplicates are
    * possible — a pair is emitted only at its first colliding band
    * whichever path that band's bucket took. */
  def nearDupPairs(docs: DataFrame, idCol: String, blockCol: String,
      tokCol: String, threshold: Double = 0.85,
      hotBucketCap: Int = 1024, hotBucketSalts: Int = 16,
      sourceSplits: Option[Int] = None): DataFrame = {
    val s = docs.sparkSession
    // One spread decision shared by the candidate build AND the verify
    // tokenization (both re-tokenize; an under-split source would run
    // each single-threaded). The candidate pair ids then materialize
    // (localCheckpoint) BEFORE the verify joins: the pair set is orders
    // smaller than the corpus (banding keeps it sparse), and without
    // this Spark's size estimates pick the expensive expansion subtree
    // as a broadcast build side — re-evaluating the whole
    // scan->minhash->expansion chain inside single-threaded broadcast
    // construction, once per verify join.
    val par = math.min(s.sparkContext.defaultParallelism, 16)
    val spread = Scale.spread(docs, cap = 16, sourceSplits)
    val cands = nearDupCandidatePairs(spread, idCol, blockCol, tokCol, threshold,
      hotBucketCap, hotBucketSalts, sourceSplits = Some(par)).localCheckpoint()
    val toks = spread.select(col(idCol).as("doc_id"),
      array_sort(array_distinct(col(tokCol))).as("tok"))
    graft.functions.SortedIntersectFunctions.register(s)
    val tx = toks.select(col("doc_id"), col("tok"))
    val inter = graft.functions.SortedIntersectFunctions
      .sorted_intersect_size(col("ta.tok"), col("tb.tok")).cast("double")
    cands
      .join(tx.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(tx.as("tb"), col("doc_b") === col("tb.doc_id"))
      .withColumn("jac",
        inter / (size(col("ta.tok")) + size(col("tb.tok")) - inter))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** The candidate half of [[nearDupPairs]] (pre-verify, not yet
    * materialized) — the relation whose plan shape the skew tests pin. */
  private[graft] def nearDupCandidatePairs(docs: DataFrame, idCol: String,
      blockCol: String, tokCol: String, threshold: Double,
      hotBucketCap: Int, hotBucketSalts: Int,
      sourceSplits: Option[Int]): DataFrame = {
    val s = docs.sparkSession
    // single-row-group test files scan as one partition; spread before
    // the (compute-heavy) minhash so it parallelizes — only when
    // genuinely under-split (the shared Scale.spread policy)
    val spread = Scale.spread(docs, cap = 16, sourceSplits)
    val toks = spread.select(col(idCol).as("doc_id"), col(blockCol).as("block"),
      array_sort(array_distinct(col(tokCol))).as("tok"))
    graft.functions.MinhashFunctions.register(s)
    val withSig = toks.withColumn("sig",
      graft.functions.MinhashFunctions.minhash_sig(col("tok")))
    val hs = (0 until K).map(j => col("sig")(j))
    val bhs = array((0 until K / 2).map(b => hs(2 * b) * lit(P) + hs(2 * b + 1)): _*)
    // posexplode_OUTER + null filter (r16): the non-outer generate
    // makes the optimizer infer a vacuous `size(bhs) > 0` input filter
    // (bhs is a literal K/2-element array) and push it to the SCAN
    // with the bhs expression INLINED — re-evaluating the
    // tokenize+minhash chain per document on the scan task. The outer
    // form's null row cannot occur (bhs is never null/empty) and the
    // guard filter on the GENERATED column stays above the generate.
    val banded = withSig
      .select(col("doc_id"), col("block"), size(col("tok")).as("sz"), bhs.as("bhs"))
      .select(col("doc_id"), col("block"), col("sz"), col("bhs"),
        posexplode_outer(col("bhs")).as(Seq("band_idx", "band_hash")))
      .filter(col("band_idx").isNotNull)
    // slack below the implied min(|A|,|B|)/max bound so float rounding
    // can never drop a true pair
    val sizeRatio = math.max(0.0, threshold - 0.01)
    val parted = banded
      .repartition(s.sparkContext.defaultParallelism,
        col("block"), col("band_idx"), col("band_hash"))
    // per-bucket member count over the partitioning just established —
    // a window, not another aggregate+join, so the common path pays a
    // local sort but no additional exchange
    val tagged = parted.withColumn("bsz", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("block"), col("band_idx"), col("band_hash"))))
    // "emitted only at the FIRST colliding band" as a codegen-able
    // predicate: for every band j earlier than this row's band, the two
    // signatures must DIFFER (K/2 is a compile-time constant, so the
    // check unrolls into a plain boolean chain over GetArrayItem —
    // higher-order zip_with/exists lambdas would evaluate interpreted,
    // which measured ~20x slower over the pair blow-up)
    def firstCollidingBand: Column =
      (0 until K / 2).map { j =>
        (col("band_idx") <= j) ||
          (element_at(col("bhs_a"), j + 1) =!= element_at(col("bhs_b"), j + 1))
      }.reduce(_ && _)
    def sizeGate: Column =
      least(col("sz_a"), col("sz_b")) >=
        lit(sizeRatio) * greatest(col("sz_a"), col("sz_b"))
    val bKeys = Seq("block", "band_idx", "band_hash")
    def side(d: DataFrame, sfx: String): DataFrame =
      d.select(bKeys.map(col) ++ Seq(col("doc_id").as(s"id_$sfx"),
        col("bhs").as(s"bhs_$sfx"), col("sz").as(s"sz_$sfx")): _*)
    // small buckets: plain in-bucket self-join (both sides read the ONE
    // banded exchange via ReuseExchange); id_a < id_b keeps each
    // unordered pair once, and every predicate is whole-stage codegen
    val small = tagged.filter(col("bsz") <= hotBucketCap)
    val smallCands = side(small, "a").join(side(small, "b"), bKeys)
      .filter(col("id_a") < col("id_b"))
      .filter(sizeGate)
      .filter(firstCollidingBand)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    // triangle-salted expansion for oversized buckets: a member of
    // group s joins as the A side of cells (s, j ≥ s) and the B side of
    // cells (i ≤ s, s); an unordered pair {a, b} lands in exactly cell
    // (min(gₐ, g_b), max(gₐ, g_b)) — twice when gₐ = g_b, which the
    // id_a < id_b condition dedups
    val g = hotBucketSalts
    val big = tagged.filter(col("bsz") > hotBucketCap)
      .withColumn("gs", pmod(hash(col("doc_id")), lit(g)))
    val lefts = big
      .withColumn("gj", explode(sequence(col("gs"), lit(g - 1))))
      .select(bKeys.map(col) ++ Seq(col("gs").as("gi"), col("gj"),
        col("doc_id").as("id_a"), col("bhs").as("bhs_a"), col("sz").as("sz_a")): _*)
    val rights = big
      .withColumn("gi", explode(sequence(lit(0), col("gs"))))
      .select(bKeys.map(col) ++ Seq(col("gi"), col("gs").as("gj"),
        col("doc_id").as("id_b"), col("bhs").as("bhs_b"), col("sz").as("sz_b")): _*)
    // the salt-cell exchange is EXPLICIT: under subset-key co-partition
    // acceptance (requireAllClusterKeysForCoPartition=false, the bench
    // session setting) the planner would otherwise reuse the upstream
    // bucket-key partitioning for this join — re-serializing the hot
    // bucket into one task, which is exactly what salting exists to break
    val saltKeys = (bKeys ++ Seq("gi", "gj")).map(col)
    val bigCands = lefts.repartition(saltKeys: _*)
      .join(rights.repartition(saltKeys: _*), bKeys ++ Seq("gi", "gj"))
      .filter(col("gi") < col("gj") || col("id_a") < col("id_b"))
      .filter(sizeGate)
      .filter(firstCollidingBand)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"))
    smallCands.union(bigCands)
  }

  /** Narrow per-document LSH signature rows: (doc_id, sz, bhs
    * ARRAY<BIGINT> of K/2 band hashes). This is the persistable
    * "signature index" for incremental dedup — 8 longs and a token
    * count per document regardless of document length, so a 100 TB
    * corpus's index is a few GB and can be stored/bucketed by band
    * hash. Band hash b combines minhash rows 2b and 2b+1 exactly as
    * `nearDupPairs` does. */
  def bandSignatures(docs: DataFrame, idCol: String, tokCol: String): DataFrame = {
    val s = docs.sparkSession
    graft.functions.MinhashFunctions.register(s)
    val toks = docs.select(col(idCol).as("doc_id"),
      array_sort(array_distinct(col(tokCol))).as("tok"))
    val withSig = toks.withColumn("sig",
      graft.functions.MinhashFunctions.minhash_sig(col("tok")))
    val hs = (0 until K).map(j => col("sig")(j))
    val bhs = array((0 until K / 2).map(b => hs(2 * b) * lit(P) + hs(2 * b + 1)): _*)
    withSig.select(col("doc_id"), size(col("tok")).as("sz"), bhs.as("bhs"))
  }

  /** Incremental (cross-corpus) near-dup detection: verified pairs
    * (new_id, ref_id, jac) where a NEW document near-duplicates a
    * REFERENCE document — the admission-control primitive for growing
    * a training corpus without re-deduplicating the whole reference.
    *
    * 100 TB shape: both sides reduce to narrow band-signature rows
    * (see `bandSignatures` — in production the reference side is a
    * precomputed, stored index, recomputed here only because the
    * battery is stateless); candidates come from ONE shuffle join on
    * (band_idx, band_hash) with cross-side pairs only, carrying NOTHING
    * but ids, sizes and the join key; a conservative size-ratio
    * prefilter prunes verify work but never results; multi-band
    * collisions collapse in a dedup shuffle of bare (new_id, ref_id)
    * pairs — measured ~6× cheaper than per-row first-collision
    * filtering on heavily-duplicated corpora, where a band join can
    * emit tens of candidate rows per surviving pair; wide token arrays
    * re-attach by doc id with the join strategy left to AQE. */
  def nearDupAgainst(newDocs: DataFrame, refDocs: DataFrame, idCol: String,
      tokCol: String, threshold: Double = 0.85): DataFrame = {
    def toksOf(docs: DataFrame) = docs.select(col(idCol).as("doc_id"),
      array_sort(array_distinct(col(tokCol))).as("tok"))
    nearDupAgainstIndex(newDocs, signatureIndex(refDocs, idCol, tokCol),
      toksOf(refDocs), idCol, tokCol, threshold)
  }

  /** The stored form of the reference side of [[nearDupAgainst]]: one
    * narrow row per (document, band) — (doc_id, sz, band_idx,
    * band_hash). Write it with [[writeSignatureIndex]] once per corpus
    * snapshot; each incremental batch then joins against the stored
    * relation instead of re-hashing the reference. */
  def signatureIndex(docs: DataFrame, idCol: String, tokCol: String): DataFrame =
    // outer + null guard for the same reason as the banded build: the
    // inferred non-outer generate filter inlines the minhash chain at
    // the scan (p22's r16 plan carried minhash_sig 16× inside the scan
    // filter); bhs is never null/empty so the guard is row-neutral
    bandSignatures(docs, idCol, tokCol)
      .select(col("doc_id"), col("sz"),
        posexplode_outer(col("bhs")).as(Seq("band_idx", "band_hash")))
      .filter(col("band_idx").isNotNull)

  /** Persist a signature index, laid out for the incremental-dedup
    * join: repartitioned on (band_idx, band_hash) so the parquet files
    * are clustered by the join key — at scale a reader can co-locate
    * the band join without re-shuffling the (much larger) stored side. */
  def writeSignatureIndex(docs: DataFrame, idCol: String, tokCol: String,
      path: String): Unit =
    signatureIndex(docs, idCol, tokCol)
      .repartition(col("band_idx"), col("band_hash"))
      .write.mode("overwrite").parquet(path)

  /** Persist the signature index as a BUCKETED catalog table on the
    * band-join keys. Unlike [[writeSignatureIndex]]'s clustered
    * parquet — which co-locates the bytes but loses the partitioning
    * at read time — a bucketed table carries the metadata, so a reader
    * joining increments against it pays NO exchange on the stored side
    * at all: only the (small) increment shuffles, into the index's
    * bucket count. At 10⁹ stored docs that is the difference between
    * re-shuffling 8 rows per stored document per increment and
    * shuffling the increment alone. Bucket count is the scale knob
    * (match target parallelism at cluster scale). */
  def writeSignatureIndexBucketed(docs: DataFrame, idCol: String, tokCol: String,
      table: String, buckets: Int = 64): Unit =
    signatureIndex(docs, idCol, tokCol)
      .write.mode("overwrite")
      .bucketBy(buckets, "band_idx", "band_hash")
      .sortBy("band_idx", "band_hash")
      .saveAsTable(table)

  /** [[nearDupAgainst]] against a prebuilt reference index (the
    * incremental path a production pipeline runs): `refIndex` is the
    * [[signatureIndex]] relation (possibly read back from storage),
    * `refToks` the (doc_id, tok sorted-distinct array) verify relation. */
  def nearDupAgainstIndex(newDocs: DataFrame, refIndex: DataFrame,
      refToks: DataFrame, idCol: String, tokCol: String,
      threshold: Double = 0.85, sourceSplits: Option[Int] = None): DataFrame = {
    val s = newDocs.sparkSession
    val newBandsRaw = signatureIndex(newDocs, idCol, tokCol)
      .select(col("doc_id").as("new_id"), col("sz").as("new_sz"),
        col("band_idx"), col("band_hash"))
    val refBands = refIndex
      .select(col("doc_id").as("ref_id"), col("sz").as("ref_sz"),
        col("band_idx"), col("band_hash"))
    val sizeRatio = math.max(0.0, threshold - 0.01)
    // The candidate join's parallelism comes from its LEFT side: AQE
    // broadcasts the (narrow) signature index, so without an exchange
    // the whole band-join + first-collision + verify chain would run
    // in the scan's partition count — 1-2 tasks on a single-row-group
    // test file. Spread the narrow band rows on the join key first,
    // but only when genuinely under-split (at real scale the source
    // already has >cores splits and the shuffle would be pure waste).
    // Callers that know their input's split count pass `sourceSplits`
    // (e.g. a streaming micro-batch with a fixed task fan-out);
    // otherwise a logical-stats estimate decides — never a `.rdd`
    // probe, which would physically plan the query a second time.
    val par = s.sparkContext.defaultParallelism
    val splits = sourceSplits.getOrElse(Scale.estimatedSplits(newBandsRaw))
    val newBands =
      if (splits < math.min(par, 8))
        newBandsRaw.repartition(par, col("band_idx"), col("band_hash"))
      else newBandsRaw
    val cands = newBands
      .join(refBands, Seq("band_idx", "band_hash"))
      .filter(col("new_id") =!= col("ref_id"))
      .filter(least(col("new_sz"), col("ref_sz")) >=
        lit(sizeRatio) * greatest(col("new_sz"), col("ref_sz")))
      .select(col("new_id"), col("ref_id"))
      .dropDuplicates("new_id", "ref_id")
    graft.functions.SortedIntersectFunctions.register(s)
    val newToks = newDocs.select(col(idCol).as("doc_id"),
      array_sort(array_distinct(col(tokCol))).as("tok"))
    val inter = graft.functions.SortedIntersectFunctions
      .sorted_intersect_size(col("ta.tok"), col("tb.tok")).cast("double")
    cands
      .join(newToks.as("ta"), col("new_id") === col("ta.doc_id"))
      .join(refToks.as("tb"), col("ref_id") === col("tb.doc_id"))
      .withColumn("jac",
        inter / (size(col("ta.tok")) + size(col("tb.tok")) - inter))
      .filter(col("jac") >= threshold)
      .select(col("new_id"), col("ref_id"), col("jac"))
  }

  /** Duplicate clusters = connected components over a near-dup pair
    * graph (columns doc_a, doc_b). Every node gets its component's
    * minimum id as cluster_id; the canonical (kept) document is the
    * one equal to its cluster_id.
    *
    * Two regimes picked by the measured edge count. The pair graph is
    * orders of magnitude smaller than the corpus (only near-dup
    * evidence survives banding + exact verify), so the common case
    * even at large scale fits ONE task: solve it there with union-find
    * (path compression + union-by-min) — no iteration, no per-round
    * scheduling. Past `unionFindMaxEdges` (~100 MB of task state),
    * fall back to distributed min-label propagation with path halving:
    * per round one shuffle join + groupBy min + a pointer jump, so a
    * chain of diameter d converges in O(log d) rounds. Rounds are
    * localCheckpoint'd (O(1) plan depth), parallelism is sized to the
    * GRAPH (edges/100k partitions, co-partitioned once; see the
    * measured conf-scoping tradeoff note in the body), and the
    * convergence probe is a strictly-decreasing exact SUM(label) —
    * one cheap aggregate per round. */
  def dupClusters(pairsIn: DataFrame, unionFindMaxEdges: Long = 5000000L): DataFrame = {
    val s = pairsIn.sparkSession
    // Both regimes assume integral ids (the union-find decodes to
    // Long; the propagation loop's convergence checksum is an exact
    // decimal SUM of labels). Anything else must fail HERE with
    // guidance, not crash differently depending on which side of the
    // edge-count threshold the graph lands (the house pattern for
    // string/UUID ids is xxhash64 upstream, as CorpusBuild does).
    pairsIn.schema("doc_a").dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => ()
      case dt => throw new IllegalArgumentException(
        s"dupClusters requires integral doc ids, got ${dt.simpleString} — " +
          "hash non-numeric ids first (xxhash64) and join back after clustering")
    }
    val pairs = pairsIn.select(col("doc_a"), col("doc_b")).localCheckpoint()
    if (pairs.count() <= unionFindMaxEdges / 2) return unionFindClusters(pairs)
    val edges0 = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .localCheckpoint()
    val parts = math.max(1, math.min(s.sparkContext.defaultParallelism,
      (edges0.count() / 100000L).toInt))
    // The loop's many small shuffles want partitions sized to the
    // GRAPH, not the session default — the per-round localCheckpoint
    // cuts each round into its own job, so AQE cannot amortize the
    // coalescing across rounds. Measured cold at sf1: conf-scoped
    // partitions 40.4 s, session-default + AQE 49.4 s, cloned-session
    // isolation 82 s (the InternalRow→Row RDD bridge to cross
    // sessions costs more per round than it saves). The conf set is
    // save/restored in a finally, but IS visible to queries planned
    // concurrently on the same session during the loop — the
    // documented tradeoff of the winning variant.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val edges = edges0.repartition(parts, col("src")).localCheckpoint()
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")).localCheckpoint()
      def checksum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0)
      var prevSum = checksum(labels)
      var moved = true
      var rounds = 0
      while (moved && rounds < 64) {
        val prop = edges
          .join(labels.select(col("id").as("src"), col("label")), "src")
          .select(col("dst").as("id"), col("label"))
        val step = labels.union(prop)
          .groupBy(col("id")).agg(min(col("label")).as("label"))
        // path halving: every label is itself a node id present in
        // `step`, so one hop of the label chain is an inner self-join;
        // chains collapse geometrically and the shuffle is reused
        val next = step
          .join(step.select(col("id").as("label"), col("label").as("jump")),
            Seq("label"))
          .select(col("id"), col("jump").as("label"))
          .localCheckpoint()
        val nextSum = checksum(next)
        moved = nextSum.compareTo(prevSum) < 0
        prevSum = nextSum
        labels = next
        rounds += 1
      }
      labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_canonical"))
        .orderBy(col("doc_id"))
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Single-task regime: the whole (small) pair graph lands in one
    * partition and a classic union-find labels every node with its
    * component minimum — semantically identical to the propagation
    * fixpoint, with zero iteration overhead. */
  private def unionFindClusters(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val labeled = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          // union by min: the surviving root is the component minimum
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keys.toArray.sorted.iterator.map(k => (k, find(k)))
      }
      .toDF("doc_id", "cluster_id")
    labeled.select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }
}
