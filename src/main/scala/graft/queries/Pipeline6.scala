package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-pipeline probe set, sixth wave — retrieval over the curated
  * corpus, the stage AFTER dedup/filter/tokenize produce a training
  * set and you need to query it (eval-set construction, contamination
  * spot-checks, nearest-example lookups):
  *
  *  - p39: BM25 ranked retrieval — the lexical complement of the ANN
  *    s-series. One corpus pass folds the collection statistics
  *    (N, Σdl, per-term df) into a single broadcast row; scoring is
  *    pure map-side arithmetic; top-k is the bounded TakeOrdered.
  *  - p40: cluster-prototype selection (SemDeDup-style "keep the most
  *    central examples per semantic cluster"): k-means assignment
  *    (p24's exact trainer) + a per-cluster closest-n quota via the
  *    bounded-heap topk_by aggregate — never a per-cluster window
  *    sort, whose k-way partitioning would serialize the corpus into
  *    k sort tasks at scale.
  *
  * Float determinism: BM25's usual ln() idf differs in the last ulp
  * across libm implementations, so — like p20's linear idf — the idf
  * here is the transcendental-free rational (N - df + 0.5)/(df + 0.5)
  * (the argument of the standard idf log, monotone in it, so the same
  * documents rank on top). Every factor is a division chain over
  * exact integer counts, written with identical association in the
  * Spark plan and the oracle SQL, so both engines produce bit-equal
  * doubles and the top-k cut is exact.
  */
object Pipeline6 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // p39: BM25 top-10 for a fixed 3-term query (k1 = 1.2, b = 0.75).
  // Scale shape: stats pass → 1-row broadcast; score pass → map-side;
  // TakeOrdered(10) — no shuffle is ever keyed by a data-dependent
  // key, so there is nothing to skew at any corpus size.
  // ---------------------------------------------------------------- //
  private val bm25Terms = Seq("dup", "spark", "window")

  def p39_bm25_topk(s: SparkSession, dir: String): DataFrame = {
    val base = PipelineOps.spread(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), PipelineOps.tokens.as("tok"))
      .select(
        col("doc_id") +: size(col("tok")).cast("long").as("dl") +:
          bm25Terms.zipWithIndex.map { case (tm, i) =>
            size(filter(col("tok"), x => x === lit(tm))).cast("long").as(s"tf$i")
          }: _*)
      // two consumers (stats aggregate + score pass): materialize the
      // narrow (doc_id, dl, tf*) relation — ~40 B/doc — so the corpus
      // is tokenized once, the same trade as p20's tf checkpoint
      .localCheckpoint()
    val statCols = Seq(count(lit(1)).as("n_total"), sum(col("dl")).as("sum_dl")) ++
      bm25Terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    // identical association to the SQL below: avgdl = D(sum_dl)/D(N);
    // idf = (D(N) - D(df) + 0.5)/(D(df) + 0.5); term = idf * ((tf*2.2)
    // / (tf + 1.2*(0.25 + 0.75*(D(dl)/avgdl)))); score = (t0+t1)+t2
    val avgdl = col("sum_dl").cast("double") / col("n_total").cast("double")
    def term(i: Int): Column = {
      val dfd = col(s"df$i").cast("double")
      val idf = (col("n_total").cast("double") - dfd + lit(0.5)) / (dfd + lit(0.5))
      val tf = col(s"tf$i").cast("double")
      idf * (tf * lit(2.2) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))))
    }
    val score = bm25Terms.indices.map(term).reduceLeft(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score_raw", score)
      .orderBy(col("score_raw").desc, col("doc_id"))
      .limit(10)
      .select(Seq(col("doc_id"), col("dl")) ++
        bm25Terms.indices.map(i => col(s"tf$i")) :+
        round(col("score_raw"), 9).as("score"): _*)
  }

  val p39_sql: String = {
    val tfs = bm25Terms.zipWithIndex.map { case (tm, i) =>
      s"CAST(len(list_filter(tok, x -> x = '$tm')) AS BIGINT) AS tf$i"
    }.mkString(",\n    ")
    val dfs = bm25Terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    def term(i: Int) =
      s"""((CAST(n_total AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
         | * (CAST(tf$i AS DOUBLE) * 2.2 / (CAST(tf$i AS DOUBLE)
         |    + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
         |      / (CAST(sum_dl AS DOUBLE) / CAST(n_total AS DOUBLE))))))""".stripMargin
    val score = bm25Terms.indices.map(term).mkString("(", "\n + ", ")")
      .replaceAll("\\(\\(", "((") // no-op, keeps the literal readable
    s"""WITH base AS (
       |  SELECT doc_id, CAST(len(tok) AS BIGINT) AS dl,
       |    $tfs
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok
       |        FROM documents WHERE len(trim(text)) > 0)),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       |    CAST(SUM(dl) AS BIGINT) AS sum_dl, $dfs
       |  FROM base)
       |SELECT doc_id, dl, tf0, tf1, tf2, round(score_raw, 9) AS score FROM (
       |  SELECT base.*,
       |    $score AS score_raw
       |  FROM base CROSS JOIN stats)
       |ORDER BY score_raw DESC, doc_id LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // p40: per-cluster prototype quota — the 10 vectors closest to their
  // k-means centroid in each of the 8 trained cells (d2 asc, vec_id
  // tie-break). Rides p24's exact trainer, so d2 is bit-equal across
  // engines and the quota cut is exact; the per-cluster top-n runs
  // through topk_by (map-side bounded heap: the exchange carries
  // ≤ k·n rows regardless of corpus size), then one posexplode back
  // to rows.
  // ---------------------------------------------------------------- //
  private val p40Quota = 10

  def p40_cluster_protos(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKFunctions.topk_by
    val a = graft.operators.Kmeans.trainAssign(
      t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", k = 8, iters = 2)
    // topk_by keeps score DESC (ties id ASC); negate d2 for closest-n
    a.groupBy(col("cid"))
      .agg(topk_by(-col("d2"), col("vec_id"), p40Quota).as("best"))
      .select(col("cid"), posexplode(col("best")).as(Seq("i", "b")))
      .select(col("cid"), (col("i") + 1).cast("int").as("rn"),
        col("b.id").as("vec_id"), round(-col("b.score"), 6).as("d2"))
      .orderBy(col("cid"), col("rn"))
  }

  val p40_sql: String = {
    // p24's CTE chain verbatim (seeds → assign → exact decimal means →
    // re-assign with d2), with the final per-vector SELECT swapped for
    // the per-cluster quota rank
    val prefix = Pipeline3.p24_sql.substring(
      0, Pipeline3.p24_sql.lastIndexOf("SELECT vec_id, cid"))
    prefix +
      s"""SELECT cid, rn, vec_id, round(d2, 6) AS d2 FROM (
         |  SELECT cid, vec_id, d2, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY cid ORDER BY d2 ASC, vec_id ASC) AS INT) AS rn
         |  FROM a2)
         |WHERE rn <= $p40Quota ORDER BY cid, rn""".stripMargin
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p39_bm25_topk" -> ((p39_bm25_topk _, Some(p39_sql))),
    "p40_cluster_protos" -> ((p40_cluster_protos _, Some(p40_sql))))
}
