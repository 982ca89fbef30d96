package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second pipeline battery file: corpus-level vocabulary statistics,
  * tf-idf term scoring, exact-quota stratified sampling, and
  * incremental (cross-corpus) near-dup detection — the remaining
  * curation steps of a large-scale training-data pipeline.
  *
  * Scale notes: p19/p20 shuffle on token (high cardinality, even
  * spread); p21 is one window over the stratum key; p22's candidate
  * generation is a narrow band-hash join (see
  * operators/TextDedup.nearDupAgainst).
  */
object Pipeline2 {

  import PipelineOps.{tokens, tokenHashesSql, minhashThSqlExpr, K, P}

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // p19: corpus vocabulary — term frequency + document frequency per
  // token. One explode + one shuffle on token; the HAVING prunes the
  // long tail before the final (tiny) sort.
  // ---------------------------------------------------------------- //
  def p19_vocab(s: SparkSession, dir: String): DataFrame =
    // two explicit aggregation levels instead of COUNT(DISTINCT): the
    // (doc_id, token) pre-aggregate combines map-side (documents repeat
    // tokens heavily) and leaves rows that are distinct per (doc,
    // token), so the second level's plain COUNT(*) IS the document
    // frequency — no Expand duplication, no distinct machinery
    t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("token"))
      .agg(sum(col("c")).as("n_occ"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 20)
      .orderBy(desc("n_occ"), asc("token"))

  val p19_sql: String =
    """SELECT token, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |      FROM documents)
      |GROUP BY token HAVING COUNT(DISTINCT doc_id) >= 20
      |ORDER BY n_occ DESC, token""".stripMargin

  // ---------------------------------------------------------------- //
  // p20: tf-idf term scoring, top-3 terms per document. The idf here
  // is the LINEAR inverse document frequency tf·N/df — monotone in the
  // usual tf·ln(N/df), so the same terms rank on top, while staying
  // transcendental-free (ln differs in the last ulp between libm
  // implementations, which would break exact oracle hash-compare).
  // The corpus size N joins in as a 1-row broadcast, keeping the whole
  // plan declarative (no driver-side collect).
  // ---------------------------------------------------------------- //
  def p20_tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // Round-11 shape (the q96 lesson): ONE doc-keyed exchange, taken
    // as a RANGE partitioning of the narrow (doc_id, text) rows BEFORE
    // the explode. RangePartitioning(doc_id) then satisfies every
    // doc-keyed requirement downstream — the tf aggregate runs
    // partition-local (no (doc, token) hash exchange), the per-doc
    // top-3 window sorts locally (no doc_id exchange of the scored tf
    // relation), and the terminal (doc_id, rk) order is
    // `sortWithinPartitions` (no result-sized range exchange +
    // sampling pass). It also doubles as the under-split spread for
    // single-row-group sources. The only other exchange left is the
    // df aggregate, whose partials reduce to per-partition distinct
    // tokens — vocabulary-bounded at any corpus size.
    val raw = docs.select(col("doc_id"), col("text"))
    val spread = raw.repartitionByRange(col("doc_id"))
    // NO materialization pin on tf: under AQE both localCheckpoint
    // (LogicalRDD) and persist (AdaptiveSparkPlan-wrapped cache) HIDE
    // the physical partitioning from downstream operators, which
    // re-inserts a doc_id hash exchange under the window and silently
    // demotes the partition-local terminal sort from a total order to
    // a per-partition one. Letting the range partitioning FLOW costs
    // the df branch a re-execution of the scan→explode→aggregate
    // chain, but that is cheaper than the pin + tf-sized hash
    // exchange it replaces (P20Lab: 4.86 vs 5.48 s at sf10, 0.86 vs
    // 1.01 s at sf0.1) — and ScaleSpec pins the exchange-free window.
    // df joins back as a broadcast: one row per distinct token,
    // bounded by the vocabulary, which for word tokens stays
    // broadcastable at any corpus size.
    val tf = spread.select(col("doc_id"), explode(tokens).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), asc("token"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(total))
      .withColumn("score", col("tf").cast("double") * col("n_total") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("token"), col("tf"), col("df"),
        col("score"))
      .sortWithinPartitions(col("doc_id"), col("rk"))
  }

  val p20_sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
      |dfc AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |scored AS (
      |  SELECT doc_id, token, tf, df,
      |    CAST(tf AS DOUBLE) * (SELECT COUNT(*) FROM documents) / df AS score
      |  FROM tf JOIN dfc USING (token))
      |SELECT doc_id, rk, token, tf, df, score FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, token) AS INT) AS rk
      |  FROM scored)
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // ---------------------------------------------------------------- //
  // p21: stratified sampling with EXACT per-stratum quotas. The sample
  // key is a portable content hash (md5 of the doc id), so the sample
  // is deterministic across engines, partitionings, and reruns —
  // row_number per stratum in hash order, keep the first 5. At scale:
  // one window shuffle on the stratum key; no global sort.
  // ---------------------------------------------------------------- //
  def p21_stratified_sample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("source"), col("rk"))
  }

  val p21_sql: String =
    """SELECT doc_id, source, rk FROM (
      |  SELECT doc_id, source, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
      |  FROM documents)
      |WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------- //
  // p22: incremental cross-corpus dedup — NEW documents (the 2-digit
  // sources src10..src19) checked against the REFERENCE corpus
  // (src0..src9) without re-deduplicating the reference against
  // itself. Delegates to operators/TextDedup.nearDupAgainst; the
  // oracle mirrors the banding with a side-filtered band join.
  // ---------------------------------------------------------------- //
  def p22_cross_dedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").withColumn("tok", tokens)
    val newDocs = docs.filter(length(col("source")) > 4)
    val refDocs = docs.filter(length(col("source")) <= 4)
    graft.operators.TextDedup
      .nearDupAgainst(newDocs, refDocs, "doc_id", "tok", threshold = 0.85)
      .orderBy(col("new_id"), col("ref_id"))
  }

  val p22_sql: String = {
    val hDefs = (0 until K).map(j => s"${minhashThSqlExpr("th", j)} AS h$j").mkString(",\n  ")
    val bandRows = (0 until K / 2).map { b =>
      s"SELECT doc_id, is_new, $b AS band_idx, h${2 * b} * $P + h${2 * b + 1} AS band_hash FROM sig"
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT doc_id, length(source) > 4 AS is_new,
       |    list_sort(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
       |  FROM documents),
       |sig AS (SELECT doc_id, is_new, $hDefs
       |        FROM (SELECT doc_id, is_new, ${tokenHashesSql("tok")} AS th FROM toks)),
       |banded AS ($bandRows),
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
       |  FROM banded a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |  WHERE a.is_new AND NOT b.is_new)
       |SELECT new_id, ref_id,
       |  CAST(len(list_intersect(ta.tok, tb.tok)) AS DOUBLE) /
       |    (len(ta.tok) + len(tb.tok) - len(list_intersect(ta.tok, tb.tok))) AS jac
       |FROM cands JOIN toks ta ON ta.doc_id = new_id JOIN toks tb ON tb.doc_id = ref_id
       |WHERE CAST(len(list_intersect(ta.tok, tb.tok)) AS DOUBLE) /
       |    (len(ta.tok) + len(tb.tok) - len(list_intersect(ta.tok, tb.tok))) >= 0.85
       |ORDER BY new_id, ref_id""".stripMargin
  }

  /** name → (query fn, Some(oracle sql) | None = rows-only check) */
  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p19_vocab" -> ((p19_vocab _, Some(p19_sql))),
    "p20_tfidf" -> ((p20_tfidf _, Some(p20_sql))),
    "p21_stratified_sample" -> ((p21_stratified_sample _, Some(p21_sql))),
    "p22_cross_dedup" -> ((p22_cross_dedup _, Some(p22_sql))),
  )
}
