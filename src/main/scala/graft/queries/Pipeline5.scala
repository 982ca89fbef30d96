package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-pipeline probe set, fifth wave — the curation stages between
  * the battery's existing dedup/scoring entries and a finished
  * training corpus:
  *
  *  - p32: corpus-GLOBAL segment dedup (the C4 "discard duplicated
  *    three-sentence spans, keep the first occurrence" rule —
  *    complements p28, whose boilerplate rule is per-source
  *    frequency, with a global first-wins rule).
  *  - p33: LM-quality bucketing (CCNet's head/middle/tail split): the
  *    p30 unigram-LM score gated against FIXED cutoffs — faithful to
  *    CCNet practice, where perplexity thresholds are chosen offline
  *    per language and then applied as constants in the map stage, so
  *    the bucket assignment is pure per-row arithmetic with no global
  *    sort or quantile pass at corpus scale.
  *  - p34: overlapping fixed-window chunking (RAG/embedding-index
  *    prep): window-64/stride-48 token chunks with md5 fingerprints —
  *    the row-expansion step a retrieval index build runs after
  *    dedup.
  *
  * Scale shape: p32 is three skew-safe narrow stages (see
  * TextOps.dedupSegmentsGlobal — deliberately NOT a
  * segment-partitioned window, which would serialize a viral span's
  * instances into one sort task); p33 adds zero exchanges beyond
  * p30's LM build (the bucket gate is map-side); p34 is shuffle-free
  * row expansion.
  */
object Pipeline5 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // p32: global segment dedup — every non-overlapping 3-token segment
  // keeps only its corpus-FIRST instance (smallest (doc_id, seg_i));
  // per document: segment count, removed-instance count, tokens kept.
  // ---------------------------------------------------------------- //
  def p32_line_dedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps
      .dedupSegmentsGlobal(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_seg"), col("n_removed"), col("kept_tokens"))
      .orderBy(col("doc_id"))

  val p32_sql: String =
    """WITH b AS (
      |  SELECT doc_id, tok, CAST(floor(len(tok)/3) AS INT) AS n_seg, len(tok) AS n_tok
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tok FROM documents)
      |  WHERE len(tok) >= 3),
      |inst AS (
      |  SELECT doc_id, n_seg, n_tok, seg_i,
      |    array_to_string(list_slice(tok, seg_i*3+1, seg_i*3+3), ' ') AS seg
      |  FROM (SELECT doc_id, n_seg, n_tok, tok, unnest(range(0, n_seg)) AS seg_i FROM b)),
      |fl AS (
      |  SELECT doc_id, n_seg, n_tok,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_i) > 1
      |         THEN 1 ELSE 0 END AS rm
      |  FROM inst)
      |SELECT doc_id, CAST(MAX(n_seg) AS BIGINT) AS n_seg,
      |  CAST(SUM(rm) AS BIGINT) AS n_removed,
      |  CAST(MAX(n_tok) - 3*SUM(rm) AS BIGINT) AS kept_tokens
      |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- //
  // p33: CCNet-style LM-quality buckets — p30's mean token likelihood
  // compared against fixed offline-chosen cutoffs (the production
  // shape: CCNet computes its perplexity thresholds once per language
  // and ships them as constants). head ≥ HI > middle ≥ LO > tail; the
  // comparison runs at full double precision (both engines compute
  // the identical IEEE division chain from exact integer sums), the
  // 9-digit rounding below is display-only.
  // ---------------------------------------------------------------- //
  private val p33Hi = 0.03332
  private val p33Lo = 0.03327

  def p33_ppl_buckets(s: SparkSession, dir: String): DataFrame = {
    val spread = PipelineOps.spread(
      t(s, dir, "documents").select(col("doc_id"), col("text")))
    graft.operators.TextOps
      .unigramLmScores(spread.select(col("doc_id"), PipelineOps.tokens.as("tok")),
        "doc_id", "tok")
      .select(col("doc_id"), col("n_tokens"),
        round(col("mean_lik"), 9).as("mean_lik"),
        when(col("mean_lik") >= p33Hi, lit("head"))
          .when(col("mean_lik") >= p33Lo, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  val p33_sql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, token, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |        FROM documents)
       |  GROUP BY doc_id, token),
       |lm AS (
       |  SELECT token, CAST(SUM(c) AS BIGINT) AS cnt FROM tf GROUP BY token),
       |total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_corpus FROM lm),
       |sc AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    CAST(CAST(SUM(c * cnt) AS BIGINT) AS DOUBLE)
       |      / CAST(SUM(c) AS BIGINT) / n_corpus AS ml
       |  FROM tf JOIN lm USING (token) CROSS JOIN total
       |  GROUP BY doc_id, n_corpus)
       |SELECT doc_id, n_tokens, round(ml, 9) AS mean_lik,
       |  CASE WHEN ml >= $p33Hi THEN 'head'
       |       WHEN ml >= $p33Lo THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM sc ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- //
  // p34: overlapping chunking — 64-token windows every 48 tokens, one
  // row per chunk with its md5 fingerprint (the key a chunk-level
  // dedup or retrieval index joins on).
  // ---------------------------------------------------------------- //
  def p34_chunk_overlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps
      .chunkDocs(PipelineOps.spread(
          t(s, dir, "documents").select(col("doc_id"), col("text"))),
        "doc_id", "text", window = 64, stride = 48)
      .select(col("doc_id"), col("chunk_i"), col("start_tok"),
        col("n_tok"), col("fp"))
      .orderBy(col("doc_id"), col("chunk_i"))

  val p34_sql: String =
    """WITH b AS (
      |  SELECT doc_id, tok, len(tok) AS n_tok,
      |    CASE WHEN len(tok) <= 64 THEN 0
      |         ELSE CAST(floor((len(tok) - 17)/48.0) AS INT) END AS n_extra
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tok
      |        FROM documents WHERE trim(text) <> '')),
      |ch AS (
      |  SELECT doc_id, chunk_i, chunk_i*48 AS start_tok,
      |    least(64, n_tok - chunk_i*48) AS clen, tok
      |  FROM (SELECT doc_id, tok, n_tok, unnest(range(0, n_extra + 1)) AS chunk_i FROM b))
      |SELECT doc_id, CAST(chunk_i AS INT) AS chunk_i, CAST(start_tok AS INT) AS start_tok,
      |  CAST(clen AS BIGINT) AS n_tok,
      |  md5(array_to_string(list_slice(tok, start_tok+1, start_tok+clen), ' ')) AS fp
      |FROM ch ORDER BY doc_id, chunk_i""".stripMargin

  // ---------------------------------------------------------------- //
  // p35: BPE merge-pair counting — the tokenizer-training primitive.
  // One merge round of byte-pair encoding: count adjacent character
  // pairs across the corpus weighted by word frequency, emit the top
  // 20 merge candidates (count desc, pair asc — a total order, so the
  // cut is deterministic). Full BPE training is K successive rounds
  // of exactly this aggregation with the winning pair merged between
  // rounds; the round is the part that touches the corpus.
  //
  // Shape at scale: the word-frequency dict is vocabulary-bounded
  // after map-side combine (classic BPE trains on the word dict, not
  // the running text), pair counts are alphabet²-bounded, and the
  // top-k is a TakeOrdered — every exchange in the plan carries
  // dictionary-sized relations, never corpus-sized ones.
  // ---------------------------------------------------------------- //
  def p35_bpe_pairs(s: SparkSession, dir: String): DataFrame = {
    val docs = PipelineOps.spread(
      t(s, dir, "documents").select(col("text")))
    val wf = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    wf.filter(length(col("w")) >= 2)
      .select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("f"))
      .groupBy(col("pair")).agg(sum(col("f")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  val p35_sql: String =
    """WITH wf AS (
      |  SELECT tok AS w, COUNT(*) AS f
      |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
      |  GROUP BY tok),
      |pairs AS (
      |  SELECT substr(w, i, 2) AS pair, f
      |  FROM (SELECT w, f, unnest(range(1, len(w))) AS i FROM wf WHERE len(w) >= 2))
      |SELECT pair, CAST(SUM(f) AS BIGINT) AS n
      |FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- //
  // p36: blocklist gate — C4's "bad words" filter (Raffel et al. 2020
  // drop any page containing a term from a fixed blocklist; the list
  // here stands in for the production one). Emits per document the
  // blocked-instance count and the keep verdict, case-insensitive.
  // Pure map-side arithmetic over the token array — no shuffle at any
  // scale, the blocklist ships inside the plan as a literal (a large
  // production list would broadcast-join instead).
  // ---------------------------------------------------------------- //
  private val p36Blocklist = Seq("slow", "stale", "spill")

  def p36_blocklist(s: SparkSession, dir: String): DataFrame = {
    val bl = typedlit(p36Blocklist)
    PipelineOps.spread(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), PipelineOps.tokens.as("tok"))
      .select(col("doc_id"),
        size(filter(col("tok"),
          tk => array_contains(bl, lower(tk)))).cast("long").as("n_blocked"),
        size(col("tok")).cast("long").as("n_tokens"))
      .withColumn("keep", col("n_blocked") === 0)
      .orderBy(col("doc_id"))
  }

  val p36_sql: String = {
    val lst = p36Blocklist.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  CAST(len(list_filter(tok, t -> list_contains($lst, lower(t)))) AS BIGINT) AS n_blocked,
       |  CAST(len(tok) AS BIGINT) AS n_tokens,
       |  len(list_filter(tok, t -> list_contains($lst, lower(t)))) = 0 AS keep
       |FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // p37: iterative BPE trainer — the merge LOOP p35's single round is
  // one step of. Six rounds of count-best-pair → apply-merge over the
  // word-frequency dict (TextOps.trainBpeMerges); output is the merge
  // table, one row per round. The oracle replays the same six rounds
  // as chained CTEs: identical sentinel-delimited representation,
  // identical argmax order (n DESC, l, r), identical left-to-right
  // non-overlapping replace.
  // ---------------------------------------------------------------- //
  private val BpeRounds = 6

  def p37_bpe_train(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.trainBpeMerges(
      t(s, dir, "documents").select(col("text")), "text", BpeRounds)

  val p37_sql: String = {
    val w0 =
      """w0 AS (
        |  SELECT chr(1) || array_to_string(
        |           list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)), chr(1))
        |         || chr(1) AS sym,
        |         CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
        |  WHERE len(w) >= 1
        |  GROUP BY 1)""".stripMargin
    def round(i: Int) =
      s"""p$i AS (
         |  SELECT l, r, CAST(SUM(f) AS BIGINT) AS n FROM (
         |    SELECT unnest(list_transform(range(1, len(s)), j -> s[j])) AS l,
         |           unnest(list_transform(range(1, len(s)), j -> s[j + 1])) AS r, f
         |    FROM (SELECT list_filter(string_split(sym, chr(1)), x -> x <> '') AS s, f
         |          FROM w${i - 1})
         |    WHERE len(s) >= 2)
         |  GROUP BY l, r),
         |b$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |w$i AS (
         |  SELECT replace(sym, chr(1) || b$i.l || chr(1) || b$i.r || chr(1),
         |                 chr(1) || b$i.l || b$i.r || chr(1)) AS sym, f
         |  FROM w${i - 1}, b$i)""".stripMargin
    val rounds = (1 to BpeRounds).map(round).mkString(",\n")
    val union = (1 to BpeRounds)
      .map(i => s"SELECT $i AS merge_round, l AS l_sym, r AS r_sym, n FROM b$i")
      .mkString("\nUNION ALL\n")
    s"WITH $w0,\n$rounds\n$union\nORDER BY merge_round"
  }

  // ---------------------------------------------------------------- //
  // p38: tokenize the corpus with the TRAINED merges — the other half
  // of tokenizer training (p37 trains, p38 applies): per document, the
  // word count and the BPE token count under the 6-round merge table.
  // The merge table is driver-held (one row per round), so application
  // is the SAME sentinel-replace chain unrolled into the expression
  // tree at plan time — pure map-side work, zero shuffles beyond the
  // scan; at corpus scale the tokenizer pass is embarrassingly
  // parallel while the (tiny) merge table rides inside the plan. The
  // oracle recomputes the identical merge table (p37's chained CTEs)
  // and applies the same replaces via a cross join of the 1-row b_i.
  // ---------------------------------------------------------------- //
  def p38_bpe_tokenize(s: SparkSession, dir: String): DataFrame = {
    val S = "\u0001"
    // the merge table is ≤ BpeRounds rows by construction — the one
    // driver-side value of the whole entry
    val merges = graft.operators.TextOps
      .trainBpeMerges(t(s, dir, "documents").select(col("text")), "text", BpeRounds)
      .head(BpeRounds).map(r => (r.getString(1), r.getString(2)))
    def symCount(w: Column): Column = {
      val init = concat(lit(S), concat_ws(S, split(w, "")), lit(S))
      val merged = merges.foldLeft(init) { case (e, (l, r)) =>
        replace(e, lit(S + l + S + r + S), lit(S + l + r + S))
      }
      size(filter(split(merged, S), x => x =!= ""))
    }
    PipelineOps.spread(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tok"))
      .select(col("doc_id"), size(col("tok")).cast("long").as("n_words"),
        aggregate(transform(col("tok"), symCount(_)), lit(0L),
          (acc, x) => acc + x).as("n_bpe"))
      .orderBy(col("doc_id"))
  }

  val p38_sql: String = {
    // same merge-table CTEs as p37, then the replace chain applied per
    // word (b1..b6 are 1-row relations, cross-joined into scope)
    val withClause = p37_sql.substring(0, p37_sql.indexOf("\nSELECT 1 AS merge_round"))
    val sym0 = "chr(1) || array_to_string(list_transform(range(1, len(w) + 1), " +
      "i -> substr(w, i, 1)), chr(1)) || chr(1)"
    val merged = (1 to BpeRounds).foldLeft(sym0) { (e, i) =>
      s"replace($e, chr(1) || b$i.l || chr(1) || b$i.r || chr(1), " +
        s"chr(1) || b$i.l || b$i.r || chr(1))"
    }
    val bs = (1 to BpeRounds).map(i => s"b$i").mkString(", ")
    // NO outer stripMargin: the embedded CTEs contain line-leading
    // `||` concats that a second stripMargin would mangle
    withClause + "\n" +
      "SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_words,\n" +
      "  CAST(list_sum(list_transform(tok,\n" +
      s"    w -> len(list_filter(string_split($merged, chr(1)), x -> x <> ''))))\n" +
      "    AS BIGINT) AS n_bpe\n" +
      "FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok\n" +
      s"      FROM documents WHERE len(trim(text)) > 0), $bs\n" +
      "ORDER BY doc_id"
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p32_line_dedup" -> ((p32_line_dedup _, Some(p32_sql))),
    "p33_ppl_buckets" -> ((p33_ppl_buckets _, Some(p33_sql))),
    "p34_chunk_overlap" -> ((p34_chunk_overlap _, Some(p34_sql))),
    "p35_bpe_pairs" -> ((p35_bpe_pairs _, Some(p35_sql))),
    "p36_blocklist" -> ((p36_blocklist _, Some(p36_sql))),
    "p37_bpe_train" -> ((p37_bpe_train _, Some(p37_sql))),
    "p38_bpe_tokenize" -> ((p38_bpe_tokenize _, Some(p38_sql))))
}
