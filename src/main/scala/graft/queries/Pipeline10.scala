package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-pipeline probe set, tenth wave — release-hygiene operators:
  *
  *  - p53: PII SCRUB. Every public corpus release redacts contact
  *    information (Dolma, FineWeb and CCNet all ship an email/phone
  *    scrub stage). The operator is a pure per-row projection —
  *    regex extraction for the audit counts, regex replacement for
  *    the redacted text — so at 100 TB it is map-side only: no
  *    shuffle, no state, whole-stage codegen end to end. The
  *    driver's synthetic documents carry no PII, so the entry plants
  *    deterministic fake emails/phones (a pure function of doc_id +
  *    source, replayed identically in the oracle SQL) and then
  *    scrubs them; the kernel under test is the scrub itself.
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
  // p53: PII scrub — plant deterministic fake contact info, then
  // redact it and report per-document audit counts.
  // ---------------------------------------------------------------- //

  /** Email/phone patterns chosen to mean the same thing in Java
    * regex (Spark codegen) and RE2 (the DuckDB oracle): no
    * backreferences, no lookaround. */
  val EmailRe = "[A-Za-z0-9_]+@[A-Za-z0-9]+\\.(com|org)"
  val PhoneRe = "555-[0-9]{4}"

  /** Redact emails then phones. Pure projection: stays inside
    * whole-stage codegen, map-side at any scale. */
  def piiScrub(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  def p53_pii_scrub(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // deterministic augmentation: 1 email always, a second on
    // doc_id%3==0, a phone on doc_id%2==0 — counts vary per doc
    val aug = concat(
      col("text"),
      lit(" contact "), col("source"), lit("_"),
      col("doc_id").cast("string"), lit("@example.com"),
      when(col("doc_id") % 2 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit(" call n/a")),
      when(col("doc_id") % 3 === 0,
        concat(lit(" cc "), col("source"), lit("@test.org")))
        .otherwise(lit("")))
    docs.select(col("doc_id"), aug.as("aug"))
      .select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(aug, '$EmailRe', 0)")).as("n_emails"),
        size(expr(s"regexp_extract_all(aug, '$PhoneRe', 0)")).as("n_phones"),
        piiScrub(col("aug")).as("clean"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        length(col("clean")).cast("bigint").as("clean_len"),
        md5(col("clean")).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  val p53_sql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    text || ' contact ' || source || '_' || CAST(doc_id AS VARCHAR)
       |      || '@example.com'
       |      || CASE WHEN doc_id % 2 = 0
       |           THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |           ELSE ' call n/a' END
       |      || CASE WHEN doc_id % 3 = 0
       |           THEN ' cc ' || source || '@test.org' ELSE '' END AS aug
       |  FROM documents),
       |scrubbed AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(aug, '$EmailRe')) AS INT) AS n_emails,
       |    CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS INT) AS n_phones,
       |    regexp_replace(regexp_replace(aug, '$EmailRe', '<EMAIL>', 'g'),
       |                   '$PhoneRe', '<PHONE>', 'g') AS clean
       |  FROM aug)
       |SELECT doc_id, n_emails, n_phones,
       |  CAST(len(clean) AS BIGINT) AS clean_len, md5(clean) AS clean_fp
       |FROM scrubbed ORDER BY doc_id""".stripMargin

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
    "p53_pii_scrub" -> ((p53_pii_scrub _, Some(p53_sql))),
    "s11_ann_ivf_filtered" -> ((s11_ann_ivf_filtered _, Some(s11_sql))))
}
