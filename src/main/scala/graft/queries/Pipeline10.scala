package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-pipeline probe set, tenth wave — release-hygiene operators:
  *
  *  - p53: CONSISTENT ANONYMIZATION. p17's scrub collapses every
  *    entity to one token; real release pipelines need referential
  *    integrity — the same email maps to the SAME numbered
  *    placeholder everywhere it recurs (<EMAIL_1> twice is "sender
  *    wrote to themselves"; <EMAIL_1>/<EMAIL_2> is two parties).
  *    TextOps.consistentAnonymize does it with pure column algebra
  *    (extract, first-occurrence dedup, fold of literal replaces) —
  *    map-side only, whole-stage codegen, no shuffle at any scale.
  *    The driver's synthetic documents carry no PII, so the entry
  *    plants deterministic fake emails with a REPEATED mention (a
  *    pure function of doc_id, replayed identically in the oracle
  *    SQL); the numbering-under-recurrence is what's under test.
  *
  *  - s11: FILTERED ANN. The "pre-filtered search" mode vector
  *    stores expose (FAISS IDSelector, Milvus boolean expressions):
  *    a metadata predicate applies to the probed candidates BEFORE
  *    exact scoring, so top-k is computed over matching vectors
  *    only. Post-filtering a plain top-k instead silently returns
  *    fewer than k hits whenever the filter is selective — the
  *    Wave10Spec pins exactly that divergence. Index build is
  *    s05's (buildIvf, one Lloyd round); the filter rides the
  *    corpus relation as a plain column predicate, so Catalyst
  *    pushes it into the scan and the candidate join shrinks
  *    map-side before any vector math runs.
  */
object Pipeline10 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // p53: consistent anonymization — plant deterministic fake emails
  // (one entity mentioned twice, one once), then pseudonymize with
  // per-document first-appearance numbering.
  // ---------------------------------------------------------------- //

  /** Pattern shared with the oracle: identical semantics under Java
    * regex and RE2, and no SQL-literal escapes ([.] instead of \.)
    * because both engines inline it into lambda SQL. */
  val EmailRe = "[A-Za-z0-9_]+@[A-Za-z0-9]+[.]com"

  def p53_consistent_anonymize(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // u<id>@ appears TWICE (the recurrence consistency must preserve),
    // u<id+1>@ once — so n_mentions=3, n_entities=2 for every doc
    val aug = concat(
      col("text"),
      lit(" contact u"), col("doc_id").cast("string"), lit("@example.com or u"),
      (col("doc_id") + 1).cast("string"), lit("@example.com; primary u"),
      col("doc_id").cast("string"), lit("@example.com"))
    graft.operators.TextOps.consistentAnonymize(
        docs.select(col("doc_id"), aug.as("aug")), "aug", "anon", EmailRe, "EMAIL")
      .select(col("doc_id"),
        col("n_mentions").cast("int").as("n_mentions"),
        col("n_entities").cast("int").as("n_entities"),
        length(col("anon")).cast("bigint").as("anon_len"),
        md5(col("anon")).as("anon_fp"))
      .orderBy(col("doc_id"))
  }

  val p53_sql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com or u'
       |         || CAST(doc_id + 1 AS VARCHAR) || '@example.com; primary u'
       |         || CAST(doc_id AS VARCHAR) || '@example.com' AS aug
       |  FROM documents),
       |m AS (SELECT doc_id, aug, regexp_extract_all(aug, '$EmailRe') AS ms FROM aug),
       |e AS (SELECT doc_id, aug, ms,
       |        list_filter(ms, (x, i) -> list_position(ms, x) = i) AS es
       |      FROM m),
       |n AS (SELECT doc_id, aug, ms, es,
       |        list_transform(range(1, len(es) + 1),
       |          j -> lpad(CAST(len(es[j]) AS VARCHAR), 8, '0') || '|' ||
       |               es[j] || '|' || CAST(j AS VARCHAR)) AS ns
       |      FROM e)
       |SELECT doc_id, CAST(len(ms) AS INT) AS n_mentions,
       |  CAST(len(es) AS INT) AS n_entities,
       |  CAST(len(anon) AS BIGINT) AS anon_len, md5(anon) AS anon_fp
       |FROM (SELECT doc_id, ms, es,
       |        list_reduce(list_prepend(aug, list_reverse_sort(ns)),
       |          (acc, x) -> replace(acc, split_part(x, '|', 2),
       |                              '<EMAIL_' || split_part(x, '|', 3) || '>')) AS anon
       |      FROM n)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- //
  // s11: filtered ANN — IVF probe with a label predicate applied to
  // candidates BEFORE exact scoring (library operator
  // Ann.ivfFilteredTopK); index = s05's deterministic one-round
  // Lloyd build over the FULL corpus.
  // ---------------------------------------------------------------- //
  def s11_ann_ivf_filtered(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val ivf = graft.operators.Ann.buildIvf(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      cells = 16, lloydIters = 1)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("label"))
    graft.operators.Ann.ivfFilteredTopK(queries, corpus, ivf,
        k = 10, nprobe = 4, candidateFilter = col("label") === 3)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("rk"), round(col("cos"), 6).as("cos_sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  val s11_sql: String = {
    def d2E(v: String, c: String) =
      s"""list_sum(list_transform(range(1, len($v)+1),
         |    i -> (CAST($v[i] AS DOUBLE) - $c[i]) * (CAST($v[i] AS DOUBLE) - $c[i])))""".stripMargin
    def dotE(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    def normE(v: String) = s"sqrt(${dotE(v, v)})"
    val cos = s"${dotE("q.qv", "c.cv")} / (${normE("q.qv")} * ${normE("c.cv")})"
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, list_transform(v, x -> CAST(x AS DOUBLE)) AS cv
       |       FROM e ORDER BY vec_id LIMIT 16),
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
       |assign AS (
       |  SELECT vec_id AS neighbor_id, cid FROM (
       |    SELECT e.vec_id, c1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2E("e.v", "c1.cv")} ASC, c1.cid ASC) AS rn
       |    FROM e CROSS JOIN c1) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, cid FROM (
       |    SELECT q.query_id, c1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY q.query_id ORDER BY ${d2E("q.qv", "c1.cv")} ASC, c1.cid ASC) AS rn
       |    FROM q CROSS JOIN c1) WHERE rn <= 4),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
       |      WHERE label = 3),
       |cands AS (
       |  SELECT query_id, neighbor_id FROM probes JOIN assign USING (cid)
       |  WHERE query_id <> neighbor_id),
       |scored AS (
       |  SELECT cands.query_id, cands.neighbor_id, $cos AS cos
       |  FROM cands JOIN q ON q.query_id = cands.query_id
       |  JOIN c ON c.neighbor_id = cands.neighbor_id)
       |SELECT query_id, neighbor_id, rk, round(cos, 6) AS cos_sim FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rk
       |  FROM scored) WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p53_consistent_anonymize" -> ((p53_consistent_anonymize _, Some(p53_sql))),
    "s11_ann_ivf_filtered" -> ((s11_ann_ivf_filtered _, Some(s11_sql))))
}
