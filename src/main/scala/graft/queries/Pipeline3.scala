package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Third pipeline battery file: int8-quantized similarity search,
  * token-budget domain mixing, and distributed k-means training — the
  * compression, data-mixing, and index-build steps of a large-scale
  * training pipeline.
  *
  * Scale notes: s04 compresses the corpus 4× before the (broadcast)
  * scoring pass; p23 is one window shuffle on the source key; p24 is
  * O(iters) narrow shuffles with broadcast centroids (see
  * operators/Kmeans).
  */
object Pipeline3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // s04: int8-quantized cosine top-k (SQ8). The classic ANN
  // compression: 4× less vector IO/memory, integer dot products, and —
  // because cosine divides out each vector's norm — the per-vector
  // scales cancel, so scoring needs no dequantization at all. Every
  // step (float abs/max, one double mul-div-round per element, integer
  // folds, one sqrt) is order-fixed and engine-portable, which is what
  // lets a lossy-compressed index be hash-checked against the oracle.
  // Recall vs the exact s01 baseline is asserted in Pipeline3Spec.
  // ---------------------------------------------------------------- //
  def s04_ann_q8(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    graft.operators.Ann.quantizedTopK(queries, corpus, 10)
      .withColumn("cos_q8", round(col("cos_q8"), 6))
      .withColumnRenamed("rank", "rk")
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos_q8"))
      .orderBy(col("query_id"), col("rk"))
  }

  val s04_sql: String = {
    def quant(v: String) =
      s"""CASE WHEN CAST(list_max(list_transform($v, x -> abs(x))) AS DOUBLE) = 0
         | THEN list_transform($v, x -> 0)
         | ELSE list_transform($v, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /
         |   CAST(list_max(list_transform($v, y -> abs(y))) AS DOUBLE)) AS INT)) END""".stripMargin
    def dotE(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH q AS (SELECT vec_id AS query_id, ${quant("embedding")} AS qq
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, ${quant("embedding")} AS cq FROM embeddings),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |    ${dotE("q.qq", "c.cq")} /
       |      (sqrt(${dotE("q.qq", "q.qq")}) * sqrt(${dotE("c.cq", "c.cq")})) AS cos
       |  FROM q JOIN c ON q.query_id <> c.neighbor_id)
       |SELECT query_id, neighbor_id, rk, round(cos, 6) AS cos_q8 FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rk
       |  FROM scored) WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // p23: token-budget domain mixing — cap every source's contribution
  // at a fixed budget, admitting documents in deterministic
  // content-hash order (md5 of the id) so the mix is reproducible
  // across engines, partitionings, and reruns. A document is admitted
  // if it STARTS under the budget (the standard greedy fill). One
  // window shuffle on the source key; no global sort until the (small)
  // admitted set.
  // ---------------------------------------------------------------- //
  private val p23Budget = 2500L

  def p23_domain_mix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum_chars",
        sum(col("n_chars")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_chars") - col("n_chars") < p23Budget)
      .orderBy(col("source"), col("cum_chars"), col("doc_id"))
  }

  val p23_sql: String =
    s"""SELECT source, doc_id, n_chars, cum_chars FROM (
       |  SELECT source, doc_id, n_chars,
       |    SUM(n_chars) OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_chars
       |  FROM documents)
       |WHERE cum_chars - n_chars < $p23Budget
       |ORDER BY source, cum_chars, doc_id""".stripMargin

  // ---------------------------------------------------------------- //
  // p24: distributed k-means (Lloyd's) over the embedding corpus — the
  // IVF index BUILD step (s03 probes cells; this trains them). Two
  // full assign+update rounds from deterministic seeds; the oracle
  // replays the identical iterations in SQL. Exactness rests on two
  // invariants of operators/Kmeans: sequential-fold distances and
  // decimal-exact centroid means (see centroidsOf's scale note).
  // ---------------------------------------------------------------- //
  def p24_kmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    graft.operators.Kmeans.trainAssign(emb, "vec_id", "embedding", k = 8, iters = 2)
      .withColumn("d2", round(col("d2"), 6))
      .orderBy(col("vec_id"))
  }

  val p24_sql: String = {
    def d2E(v: String, c: String) =
      s"""list_sum(list_transform(range(1, len($v)+1),
         |    i -> (CAST($v[i] AS DOUBLE) - $c[i]) * (CAST($v[i] AS DOUBLE) - $c[i])))""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, list_transform(v, x -> CAST(x AS DOUBLE)) AS cv
       |       FROM e WHERE vec_id < 8),
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
       |  SELECT vec_id, cid, d2 FROM (
       |    SELECT e.vec_id, c1.cid, ${d2E("e.v", "c1.cv")} AS d2, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2E("e.v", "c1.cv")} ASC, c1.cid ASC) AS rn
       |    FROM e CROSS JOIN c1) WHERE rn = 1)
       |SELECT vec_id, cid, round(d2, 6) AS d2 FROM a2 ORDER BY vec_id""".stripMargin
  }

  /** name → (query fn, Some(oracle sql) | None = rows-only check) */
  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "s04_ann_q8" -> ((s04_ann_q8 _, Some(s04_sql))),
    "p23_domain_mix" -> ((p23_domain_mix _, Some(p23_sql))),
    "p24_kmeans" -> ((p24_kmeans _, Some(p24_sql))),
  )
}
