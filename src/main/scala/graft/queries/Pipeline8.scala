package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-pipeline probe set, eighth wave — exact cross-document
  * substring dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): the one public dedup family the
  * set still lacked. p32 dedups FIXED non-overlapping segments and
  * p26 only measures the n-gram dup rate; this removes repeated spans
  * at ARBITRARY token boundaries — every occurrence but the corpus-
  * globally first of any w-token window appearing twice anywhere
  * (across documents or within one document).
  *
  * The paper's suffix-array construction is inherently single-machine;
  * the scale-honest distributed shape is sorted fingerprint runs
  * (operators.TextOps.dedupSubstringsGlobal): one codegen'd pass per
  * document computes all window hashes (no shingle strings, no string
  * explode), ONE fp-keyed aggregate resolves each fingerprint's first
  * occurrence with map-side partials, occurrences join back on fp, and
  * a two-pointer codegen'd `remove_spans` drops covered tokens — never
  * a corpus² join, no per-fp unbounded state.
  */
object Pipeline8 {

  // w = 20 tokens: the corpus' documents run 10-99 tokens (avg 54), so
  // the paper's 50-token granularity would see almost nothing here;
  // the operator takes w as a parameter for real corpora.
  private val subW = 20

  def p46_substring_dedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.dedupSubstringsGlobal(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", w = subW)
      .select(col("doc_id"), col("n_tok"), col("n_removed"),
        md5(array_join(col("kept_tok"), " ")).as("kept_fp"))
      .orderBy(col("doc_id"))

  val p46_sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok
       |  FROM documents WHERE len(trim(text)) > 0),
       |win AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tok) - $subW + 2),
       |    i -> {'s': i, 'fp': CAST(('0x'||substr(md5(array_to_string(tok[i:i+${subW - 1}], ' ')),1,15)) AS BIGINT)})) AS w
       |  FROM d WHERE len(tok) >= $subW),
       |occ AS (SELECT doc_id, w.s AS start, w.fp AS fp FROM win),
       |r AS (SELECT doc_id, start,
       |   ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, start) AS rn,
       |   COUNT(*) OVER (PARTITION BY fp) AS cnt FROM occ),
       |rem AS (SELECT doc_id, list_sort(list(start)) AS starts
       |        FROM r WHERE cnt >= 2 AND rn >= 2 GROUP BY doc_id),
       |j AS (SELECT d.doc_id, tok, len(tok) AS n_tok, coalesce(starts, []) AS starts
       |      FROM d LEFT JOIN rem USING (doc_id)),
       |cov AS (SELECT doc_id, n_tok, tok,
       |      list_distinct(flatten(list_transform(starts, s -> range(s, s + $subW)))) AS covered
       |      FROM j),
       |k AS (SELECT doc_id, n_tok, tok,
       |      list_filter(range(1, n_tok + 1), i -> NOT list_contains(covered, i)) AS keep
       |      FROM cov)
       |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       |  CAST(n_tok - len(keep) AS BIGINT) AS n_removed,
       |  -- array_to_string of an EMPTY list is NULL in DuckDB (a doc can
       |  -- lose every token when all its windows first occurred earlier)
       |  md5(coalesce(array_to_string(list_transform(keep, i -> tok[i]), ' '), '')) AS kept_fp
       |FROM k ORDER BY doc_id""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p46_substring_dedup" -> ((p46_substring_dedup _, Some(p46_sql))))
}
