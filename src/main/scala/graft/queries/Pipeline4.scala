package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-pipeline probe set, fourth wave — curation stages every
  * large-scale training pipeline runs that the battery did not yet
  * cover as first-class entries (p31 documented at its definition):
  *
  *  - p29: SEMANTIC deduplication (SemDeDup, Abbas et al. 2023,
  *    arXiv:2303.09540): k-means-cluster the embedding corpus, then
  *    find near-duplicate pairs ONLY within each cluster. The cluster
  *    assignment bounds the quadratic pair term — the cosine join is
  *    cluster-local, never all-pairs — which is the whole trick that
  *    makes embedding dedup feasible at corpus scale. Complements
  *    p10 (LSH-bucketed cosine): same verify metric, different
  *    blocking structure (trained Voronoi cells vs random
  *    hyperplanes).
  *  - p30: unigram language-model scoring (the CCNet/Gopher-style
  *    "LM quality" signal): train a unigram LM on the corpus itself
  *    (one token-keyed aggregate), score every document by its mean
  *    token likelihood and its rare-token rate. Per the house
  *    transcendental-free rule (see p20's linear idf), the score is
  *    the arithmetic-mean likelihood sum(tf·cnt)/n/N — a monotone
  *    document ordering computed entirely in integer sums with one
  *    final IEEE-exact division chain — rather than the geometric
  *    mean exp(mean ln p), whose ln differs in the last ulp between
  *    libm implementations and would break exact hash-compare.
  *
  * Scale shape: p29's exchanges are the k-means narrow shuffles
  * (operators/Kmeans) plus ONE cid-keyed exchange of the embeddings
  * for the cluster-local pair join; k grows with the corpus (SemDeDup
  * uses 50k clusters at LAION scale), keeping per-cluster pair counts
  * bounded. p30 is p19/p20's shape: explode → (doc, token)
  * pre-aggregate (map-side combine soaks up in-doc repetition) → one
  * token-keyed shuffle for the LM table, which joins back as a
  * broadcast (bounded by the vocabulary, not the corpus).
  */
object Pipeline4 {

  import PipelineOps.tokens

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // p29: semantic dedup — cluster embeddings with the SAME
  // deterministic 2-iteration Lloyd's build as p24 (k=8 on the test
  // corpus; the oracle replays it), then emit every vector that has a
  // lower-id neighbor with cosine >= 0.35 in ITS cluster, tagged with
  // the smallest such neighbor as its dedup representative. Keeping
  // the lowest id per similar group is the deterministic stand-in for
  // SemDeDup's keep-farthest-from-centroid choice.
  // ---------------------------------------------------------------- //
  private val p29Threshold = 0.35

  def p29_semantic_dedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    graft.operators.Ann
      .semanticDups(emb, "vec_id", "embedding", k = 8, iters = 2,
        threshold = p29Threshold)
      .select(col("vec_id"), col("cid"), col("dup_of"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy(col("vec_id"))
  }

  val p29_sql: String = {
    def d2E(v: String, c: String) =
      s"""list_sum(list_transform(range(1, len($v)+1),
         |    i -> (CAST($v[i] AS DOUBLE) - $c[i]) * (CAST($v[i] AS DOUBLE) - $c[i])))""".stripMargin
    def dotE(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    def normE(v: String) = s"sqrt(${dotE(v, v)})"
    val cos = s"${dotE("na.v", "nb.v")} / (na.nrm * nb.nrm)"
    // c0/a1/m1/c1/a2 replay the identical deterministic k-means build
    // as p24_sql (k=8, 2 iterations, decimal-exact centroid means)
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, list_transform(v, x -> CAST(x AS DOUBLE)) AS cv
       |       FROM e ORDER BY vec_id LIMIT 8),
       |a1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c0.cid, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2E("e.v", "c0.cv")} ASC, c0.cid ASC) AS rn
       |    FROM e CROSS JOIN c0) WHERE rn = 1),
       |m1 AS (
       |  SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
       |  FROM (SELECT a1.cid, unnest(range(1, len(e.v)+1)) AS pos, unnest(e.v) AS x
       |        FROM a1 JOIN e USING (vec_id))
       |  GROUP BY cid, pos),
       |c1 AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m1 GROUP BY cid),
       |a2 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2E("e.v", "c1.cv")} ASC, c1.cid ASC) AS rn
       |    FROM e CROSS JOIN c1) WHERE rn = 1),
       |n AS (SELECT vec_id, v, ${normE("v")} AS nrm FROM e),
       |pr AS (
       |  SELECT b.vec_id AS vec_id, a.cid AS cid, a.vec_id AS dup_of, $cos AS cs
       |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN n na ON na.vec_id = a.vec_id
       |  JOIN n nb ON nb.vec_id = b.vec_id
       |  WHERE $cos >= $p29Threshold)
       |SELECT vec_id, cid, dup_of, round(cs, 6) AS cos_sim FROM (
       |  SELECT vec_id, cid, dup_of, cs,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dup_of) AS rn FROM pr)
       |WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // p30: unigram LM scoring — the corpus-trained language-model
  // quality signal. LM table = per-token corpus occurrence count cnt
  // and document frequency df; a document's mean token likelihood is
  // sum(tf·cnt)/n_tokens/N (every factor an exact integer until the
  // final division chain) and its rare-token rate the fraction of
  // token INSTANCES whose type appears in fewer than 3 documents.
  // ---------------------------------------------------------------- //
  def p30_unigram_lm(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // single-row-group test files scan as one partition; spread before
    // the compute-heavy tokenize (same guard as p16/p20)
    val spread = PipelineOps.spread(docs.select(col("doc_id"), col("text")))
    graft.operators.TextOps
      .unigramLmScores(spread.select(col("doc_id"), tokens.as("tok")),
        "doc_id", "tok")
      .select(col("doc_id"), col("n_tokens"),
        round(col("mean_lik"), 9).as("mean_lik"),
        round(col("rare_rate"), 6).as("rare_rate"))
      .orderBy(col("doc_id"))
  }

  val p30_sql: String =
    """WITH tf AS (
      |  SELECT doc_id, token, COUNT(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |        FROM documents)
      |  GROUP BY doc_id, token),
      |lm AS (
      |  SELECT token, CAST(SUM(c) AS BIGINT) AS cnt, COUNT(*) AS df
      |  FROM tf GROUP BY token),
      |total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_corpus FROM lm)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  round(CAST(CAST(SUM(c * cnt) AS BIGINT) AS DOUBLE)
      |    / CAST(SUM(c) AS BIGINT) / n_corpus, 9) AS mean_lik,
      |  round(CAST(CAST(SUM(CASE WHEN df < 3 THEN c ELSE 0 END) AS BIGINT) AS DOUBLE)
      |    / CAST(SUM(c) AS BIGINT), 6) AS rare_rate
      |FROM tf JOIN lm USING (token) CROSS JOIN total
      |GROUP BY doc_id, n_corpus
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- //
  // p31: deterministic corpus shuffle + shard assignment — the last
  // step before writing training shards. Order must be random-looking
  // but REPRODUCIBLE (so a rerun yields byte-identical shards):
  // documents are sharded by a hash-derived key and ordered within
  // each shard by the full hash. The shard assignment is pure map-side
  // arithmetic; the only exchange is the shard-keyed window over
  // narrow (id, key) rows — no global sort, no single-task window.
  // At 100 TB: shard count scales with the corpus (here 16 from the
  // first hex digit; two digits give 256, etc.) and the final write
  // is df.write.partitionBy/bucketBy on the shard column, so shard
  // files stream out of the window stage without re-shuffling.
  // ---------------------------------------------------------------- //
  def p31_shuffle_shards(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps
      .shuffleShards(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id")
      .select(col("shard"), col("pos"), col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("shard"), col("pos"))

  val p31_sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    md5(CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, source, n_chars, k,
      |    CAST(strpos('0123456789abcdef', substr(k, 1, 1)) - 1 AS INT) AS shard
      |  FROM d)
      |SELECT shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS INT) AS pos,
      |  doc_id, source, n_chars
      |FROM s ORDER BY shard, pos""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p29_semantic_dedup" -> ((p29_semantic_dedup _, Some(p29_sql))),
    "p30_unigram_lm" -> ((p30_unigram_lm _, Some(p30_sql))),
    "p31_shuffle_shards" -> ((p31_shuffle_shards _, Some(p31_sql))))
}
