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

  // ---------------------------------------------------------------- //
  // s07: product-quantization ANN (Jégou et al. 2011) — the memory
  // path the s-series lacked: corpus stored as m small codes per
  // vector (operators.Ann.buildPq/pqTopK), queries scored by ADC table
  // lookups without ever touching the raw vectors. Train + encode +
  // probe in one self-contained entry; the oracle replays the whole
  // deterministic recipe (seed + one decimal-exact Lloyd round per
  // sub-block, tie-to-smaller-cid assignment, fixed-association ADC
  // sums) in SQL.
  // ---------------------------------------------------------------- //
  private val pqM = 4 // sub-blocks (64-dim embeddings → 16 dims each)
  private val pqCb = 8 // centroids per sub-block codebook
  private val pqK = 10

  def s07_ann_pq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val (codebooks, codes) =
      graft.operators.Ann.buildPq(emb, "vec_id", "embedding", pqM, pqCb)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.operators.Ann.pqTopK(queries, "query_id", "embedding",
        codebooks, codes.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id", pqM, pqK)
      .orderBy(col("query_id"), col("rk"))
  }

  val s07_sql: String = {
    val sd = 64 / pqM
    def d2E(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a)+1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    val adcSum = (1 until pqM).foldLeft("MAX(CASE WHEN m=0 THEN d2 END)") {
      (acc, i) => s"($acc + MAX(CASE WHEN m=$i THEN d2 END))"
    }
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |sub AS (
       |  SELECT vec_id, mm.m AS m,
       |    list_transform(v[mm.m*$sd+1 : mm.m*$sd+$sd], x -> CAST(x AS DOUBLE)) AS sv
       |  FROM e, (SELECT unnest(range(0, $pqM)) AS m) mm),
       |c0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < $pqCb),
       |a1 AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT sub.vec_id, sub.m, c0.cid, ROW_NUMBER() OVER (
       |      PARTITION BY sub.vec_id, sub.m
       |      ORDER BY ${d2E("sub.sv", "c0.cv")} ASC, c0.cid ASC) AS rn
       |    FROM sub JOIN c0 ON sub.m = c0.m) WHERE rn = 1),
       |m1 AS (
       |  SELECT m, cid, pos,
       |    CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS mu
       |  FROM (SELECT a1.m AS m, a1.cid, unnest(range(1, len(sub.sv)+1)) AS pos,
       |          unnest(sub.sv) AS x
       |        FROM a1 JOIN sub ON a1.vec_id = sub.vec_id AND a1.m = sub.m)
       |  GROUP BY m, cid, pos),
       |c1 AS (SELECT m, cid, list(mu ORDER BY pos) AS cv FROM m1 GROUP BY m, cid),
       |codes AS (
       |  SELECT vec_id, m, cid AS code FROM (
       |    SELECT sub.vec_id, sub.m, c1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY sub.vec_id, sub.m
       |      ORDER BY ${d2E("sub.sv", "c1.cv")} ASC, c1.cid ASC) AS rn
       |    FROM sub JOIN c1 ON sub.m = c1.m) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, m, sv AS qsv FROM sub WHERE vec_id < 5),
       |qtab AS (SELECT query_id, q.m AS m, c1.cid, ${d2E("q.qsv", "c1.cv")} AS d2
       |         FROM q JOIN c1 ON q.m = c1.m),
       |per AS (
       |  SELECT qtab.query_id, codes.vec_id AS neighbor_id, codes.m AS m, qtab.d2
       |  FROM codes JOIN qtab ON codes.m = qtab.m AND codes.code = qtab.cid
       |  WHERE codes.vec_id <> qtab.query_id),
       |adc AS (
       |  SELECT query_id, neighbor_id, $adcSum AS adc
       |  FROM per GROUP BY query_id, neighbor_id)
       |SELECT query_id, neighbor_id, rk, round(adc, 6) AS adc_d2 FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INT) AS rk
       |  FROM adc) WHERE rk <= $pqK
       |ORDER BY query_id, rk""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // p47: temperature-based mixture sampling — the multilingual /
  // data-mix recipe (XLM-R, mT5: sample sources proportional to n^τ,
  // τ < 1, so rare sources are upweighted relative to their corpus
  // share). τ = 0.5 keeps the quota arithmetic engine-exact: sqrt is
  // correctly rounded IEEE (unlike pow/exp, whose last ulp differs
  // across libms), so quota_s = min(n_s, floor(4·√n_s)) is
  // bit-identical everywhere.
  //
  // Scale shape: selection is THRESHOLD sampling, not top-k — a doc is
  // kept iff its 60-bit portable hash < quota/n · 2^60. One tiny
  // source-keyed aggregate builds the quota relation (broadcast), then
  // the corpus pass is pure map-side filter arithmetic: no per-stratum
  // sort, no window, no heap, at any corpus size. (Expected sample
  // size = quota; the exact-k variant is p44's bounded heap.)
  // ---------------------------------------------------------------- //
  private val tempScale = 4 // quota_s = min(n_s, floor(tempScale * sqrt(n_s)))

  def p47_temp_mix(s: SparkSession, dir: String): DataFrame = {
    val docs = PipelineOps.spread(
      Tables.load(s, dir, "documents").select(col("source"), col("doc_id")))
    val quotas = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        least(col("n_docs"),
          floor(lit(tempScale) * sqrt(col("n_docs").cast("double"))).cast("long"))
          .as("quota"))
    val hashSpaceD = 1152921504606846976L.toDouble // 2^60
    docs.join(broadcast(quotas), "source")
      .select(col("source"), col("n_docs"), col("quota"),
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long").cast("double") <
          col("quota").cast("double") / col("n_docs").cast("double") * lit(hashSpaceD),
          1L).otherwise(0L).as("hit"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"), max(col("quota")).as("quota"),
        sum(col("hit")).as("n_sampled"))
      .select(col("source"), col("n_docs"), col("quota"), col("n_sampled"),
        round(col("n_sampled").cast("double") / col("n_docs").cast("double"), 6)
          .as("sampled_frac"))
      .orderBy(col("source"))
  }

  val p47_sql: String =
    s"""WITH q AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    least(COUNT(*), CAST(floor($tempScale * sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS quota
       |  FROM documents GROUP BY source),
       |hits AS (
       |  SELECT d.source,
       |    CASE WHEN CAST(CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15)) AS BIGINT) AS DOUBLE)
       |      < CAST(q.quota AS DOUBLE) / CAST(q.n_docs AS DOUBLE) * 1152921504606846976.0
       |      THEN 1 ELSE 0 END AS hit,
       |    q.n_docs AS n_docs, q.quota AS quota
       |  FROM documents d JOIN q USING (source))
       |SELECT source, MAX(n_docs) AS n_docs, MAX(quota) AS quota,
       |  CAST(SUM(hit) AS BIGINT) AS n_sampled,
       |  round(CAST(SUM(hit) AS DOUBLE) / CAST(MAX(n_docs) AS DOUBLE), 6) AS sampled_frac
       |FROM hits GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- //
  // st08: STREAMING substring scrub — p46's production incremental
  // form: documents arriving on a stream are scrubbed against a STORED
  // reference fingerprint index (every w-token window fp of the
  // reference corpus; at scale a bucketed parquet index, here the
  // static side of a stream-static join). The per-batch transform is
  // STATELESS — each new doc joins the index and drops covered tokens
  // — so it runs under foreachBatch with no state store at all: the
  // right production shape (state-free scrub; contrast st06/st07,
  // which genuinely need cross-batch state). New docs are NOT deduped
  // against each other — the p22/st06 cross-corpus contract.
  // ---------------------------------------------------------------- //
  def st08_stream_scrub(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    graft.functions.SubstringDedupFunctions.register(s)
    import graft.functions.SubstringDedupFunctions.{remove_spans, shingle_hashes}
    val w = subW
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = s.read.parquet(s"$dir/documents.parquet").schema
    val docs = Tables.load(s, dir, "documents")
    val refFps = docs.filter(length(col("source")) <= 4)
      .filter(length(trim(col("text"))) > 0)
      .select(explode(shingle_hashes(split(trim(col("text")), "\\s+"), w)).as("fp"))
      .distinct()
      .withColumn("hit", lit(1))
    // layout-aware source path: a Spark-written table is a DIRECTORY
    // whose leaf files are part-*.parquet, so a pathGlobFilter on the
    // table name matches zero leaf files and the stream silently fires
    // no batch (the single-file driver layout masked this; the sf10
    // replica exposed it). FileStreamSource only accepts directories,
    // so the single-file layout keeps the glob-over-parent form. The
    // check resolves through the Hadoop FileSystem API — a non-local
    // table URI (hdfs://, s3://) would make java.io.File.isDirectory
    // answer false and silently re-create the zero-batch failure this
    // branch exists to prevent; the post-stream non-empty require
    // below backstops any layout this check still misjudges.
    val tablePath = s"$dir/documents.parquet"
    val hadoopPath = new org.apache.hadoop.fs.Path(tablePath)
    val hfs = hadoopPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stream =
      if (hfs.getFileStatus(hadoopPath).isDirectory)
        s.readStream.schema(batchSchema).parquet(tablePath)
      else
        s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val name = s"st08_out_${System.nanoTime()}"
    val outDir = s"/dev/shm/graft_$name"
    val ckpt = s"/dev/shm/graft_ckpt_$name"
    // crash-safe scratch: the deletes run in a finally so a failed
    // query (or a throw between start and the reads) leaves no orphan
    // tmpfs dirs behind
    try {
      val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val nw = batch
          .filter(length(col("source")) > 4 && length(trim(col("text"))) > 0)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tok"))
        // narrow exchanges only: the window rows and the hit aggregate
        // carry (doc_id, pos, fp) longs — NEVER the token array. The
        // r11 form grouped by (doc_id, tok), dragging every window
        // row's full token array through the exchange (~25 GB at sf10
        // — the real cause of the "sf10 weather": disk writeback of a
        // corpus×window wide shuffle). Tokens re-attach ONCE per doc.
        val hits = nw
          .select(col("doc_id"),
            posexplode(shingle_hashes(col("tok"), w)).as(Seq("pos", "fp")))
          .join(refFps, Seq("fp"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list((col("pos") + 1).cast("long"))).as("starts"))
        nw.join(hits, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), size(col("tok")).cast("long").as("n_tok"),
            remove_spans(col("tok"),
              coalesce(col("starts"), array().cast("array<long>")), w).as("kept"))
          .select(col("doc_id"), col("n_tok"),
            (col("n_tok") - size(col("kept"))).cast("long").as("n_removed"),
            md5(array_join(col("kept"), " ")).as("kept_fp"))
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Once()).start()
      q.awaitTermination()
      val out = s.read.parquet(outDir).orderBy(col("doc_id"))
        .localCheckpoint() // pin before the tmpfs dirs are deleted
      // a zero-batch run (source layout mismatch) must fail LOUDLY: if
      // the batch-side read of the same table has stream-eligible docs
      // but the stream produced none, the source never fired
      require(out.take(1).nonEmpty ||
          docs.filter(length(col("source")) > 4).take(1).isEmpty,
        s"st08: stream over $tablePath fired no batches while the batch " +
          "read sees stream-side documents — source layout mismatch")
      out
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    }
  }

  val st08_sql: String =
    s"""WITH ref AS (
       |  SELECT DISTINCT CAST(('0x'||substr(md5(sh),1,15)) AS BIGINT) AS fp FROM (
       |    SELECT unnest(list_transform(range(1, len(tok) - $subW + 2),
       |      i -> array_to_string(tok[i:i+${subW - 1}], ' '))) AS sh
       |    FROM (SELECT string_split_regex(trim(text), '\\s+') AS tok
       |          FROM documents WHERE len(source) <= 4 AND len(trim(text)) > 0)
       |    WHERE len(tok) >= $subW)),
       |d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok
       |  FROM documents WHERE len(source) > 4 AND len(trim(text)) > 0),
       |win AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tok) - $subW + 2),
       |    i -> {'s': i, 'fp': CAST(('0x'||substr(md5(array_to_string(tok[i:i+${subW - 1}], ' ')),1,15)) AS BIGINT)})) AS w
       |  FROM d WHERE len(tok) >= $subW),
       |occ AS (SELECT doc_id, w.s AS start, w.fp AS fp FROM win),
       |rem AS (SELECT doc_id, list_sort(list(start)) AS starts
       |        FROM occ JOIN ref USING (fp) GROUP BY doc_id),
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
       |  md5(coalesce(array_to_string(list_transform(keep, i -> tok[i]), ' '), '')) AS kept_fp
       |FROM k ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- //
  // s08: IVF + PQ composed — the FAISS production layout end to end:
  // the index stores one (id, cell) row plus m PQ codes per corpus
  // vector; a query probes its nprobe nearest trained cells and scores
  // ONLY those cells' members by ADC table lookups. Both trainings are
  // the house deterministic recipe (s05's IVF cells, s07's per-block
  // codebooks), so the oracle replays the whole composition in SQL.
  // At 100 TB this is the ANN memory/compute endgame: a query touches
  // ~nprobe/cells of the corpus, each candidate costing m lookups on
  // ~d·4/m-times-compressed storage — raw vectors never read at query
  // time.
  // ---------------------------------------------------------------- //
  private val ivfCells = 16
  private val ivfProbe = 4

  def s08_ann_ivf_pq(s: SparkSession, dir: String): DataFrame = {
    // build both trainings with the house deterministic recipe, then
    // probe through the LIBRARY operator — the same `ivfPqTopK` that
    // serves a persisted `savePqBucketed` index (ScaleSpec asserts
    // this entry == the stored-index probe bit-for-bit)
    val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val (codebooks, codes) =
      graft.operators.Ann.buildPq(emb, "vec_id", "embedding", pqM, pqCb)
    val ivf = graft.operators.Ann.buildIvf(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      cells = ivfCells, lloydIters = 1)
    val index = graft.operators.Ann.pqIvfIndexOf(
      codebooks, codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id", ivf)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.operators.Ann.ivfPqTopK(queries, "query_id", "embedding",
      index, "neighbor_id", pqM, pqK, ivfProbe)
  }

  val s08_sql: String = {
    val sd = 64 / pqM
    def d2E(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a)+1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    def d2F(a: String, b: String) =
      s"""list_sum(list_transform(range(1, len($a)+1),
         |    i -> (CAST($a[i] AS DOUBLE) - $b[i]) * (CAST($a[i] AS DOUBLE) - $b[i])))""".stripMargin
    val adcSum = (1 until pqM).foldLeft("MAX(CASE WHEN m=0 THEN d2 END)") {
      (acc, i) => s"($acc + MAX(CASE WHEN m=$i THEN d2 END))"
    }
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |ic0 AS (SELECT vec_id AS cid, list_transform(v, x -> CAST(x AS DOUBLE)) AS cv
       |       FROM e ORDER BY vec_id LIMIT $ivfCells),
       |ia1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, ic0.cid, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2F("e.v", "ic0.cv")} ASC, ic0.cid ASC) AS rn
       |    FROM e CROSS JOIN ic0) WHERE rn = 1),
       |im1 AS (
       |  SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS mu
       |  FROM (SELECT ia1.cid, unnest(range(1, len(e.v)+1)) AS pos, unnest(e.v) AS x
       |        FROM ia1 JOIN e USING (vec_id))
       |  GROUP BY cid, pos),
       |ic1 AS (SELECT cid, list(mu ORDER BY pos) AS cv FROM im1 GROUP BY cid),
       |iassign AS (
       |  SELECT vec_id AS neighbor_id, cid FROM (
       |    SELECT e.vec_id, ic1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2F("e.v", "ic1.cv")} ASC, ic1.cid ASC) AS rn
       |    FROM e CROSS JOIN ic1) WHERE rn = 1),
       |qv AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, cid FROM (
       |    SELECT qv.query_id, ic1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY qv.query_id ORDER BY ${d2F("qv.qv", "ic1.cv")} ASC, ic1.cid ASC) AS rn
       |    FROM qv CROSS JOIN ic1) WHERE rn <= $ivfProbe),
       |cands AS (
       |  SELECT query_id, neighbor_id FROM probes JOIN iassign USING (cid)
       |  WHERE query_id <> neighbor_id),
       |sub AS (
       |  SELECT vec_id, mm.m AS m,
       |    list_transform(v[mm.m*$sd+1 : mm.m*$sd+$sd], x -> CAST(x AS DOUBLE)) AS sv
       |  FROM e, (SELECT unnest(range(0, $pqM)) AS m) mm),
       |pc0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < $pqCb),
       |pa1 AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT sub.vec_id, sub.m, pc0.cid, ROW_NUMBER() OVER (
       |      PARTITION BY sub.vec_id, sub.m
       |      ORDER BY ${d2E("sub.sv", "pc0.cv")} ASC, pc0.cid ASC) AS rn
       |    FROM sub JOIN pc0 ON sub.m = pc0.m) WHERE rn = 1),
       |pm1 AS (
       |  SELECT m, cid, pos,
       |    CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS mu
       |  FROM (SELECT pa1.m AS m, pa1.cid, unnest(range(1, len(sub.sv)+1)) AS pos,
       |          unnest(sub.sv) AS x
       |        FROM pa1 JOIN sub ON pa1.vec_id = sub.vec_id AND pa1.m = sub.m)
       |  GROUP BY m, cid, pos),
       |pc1 AS (SELECT m, cid, list(mu ORDER BY pos) AS cv FROM pm1 GROUP BY m, cid),
       |codes AS (
       |  SELECT vec_id AS neighbor_id, m, cid AS code FROM (
       |    SELECT sub.vec_id, sub.m, pc1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY sub.vec_id, sub.m
       |      ORDER BY ${d2E("sub.sv", "pc1.cv")} ASC, pc1.cid ASC) AS rn
       |    FROM sub JOIN pc1 ON sub.m = pc1.m) WHERE rn = 1),
       |qsub AS (SELECT vec_id AS query_id, m, sv AS qsv FROM sub WHERE vec_id < 5),
       |qtab AS (SELECT query_id, qsub.m AS m, pc1.cid, ${d2E("qsub.qsv", "pc1.cv")} AS d2
       |         FROM qsub JOIN pc1 ON qsub.m = pc1.m),
       |per AS (
       |  SELECT cands.query_id, cands.neighbor_id, codes.m AS m, qtab.d2
       |  FROM cands
       |  JOIN codes USING (neighbor_id)
       |  JOIN qtab ON codes.m = qtab.m AND codes.code = qtab.cid
       |    AND qtab.query_id = cands.query_id),
       |adc AS (
       |  SELECT query_id, neighbor_id, $adcSum AS adc
       |  FROM per GROUP BY query_id, neighbor_id)
       |SELECT query_id, neighbor_id, rk, round(adc, 6) AS adc_d2 FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INT) AS rk
       |  FROM adc) WHERE rk <= $pqK
       |ORDER BY query_id, rk""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // s09: IVFADC — IVF + RESIDUAL-encoded PQ, the actual FAISS
  // production layout (Jégou et al. 2011 §IV, by_residual): s08 codes
  // the RAW vectors, so every cell's codebook must span the whole
  // space; here each vector is coded as PQ(v − centroid(cell)), the
  // residuals span only the Voronoi-cell neighborhood, and the same
  // bit budget buys materially better recall (PqLab at sf0.01, 20
  // queries: 0.345 vs 0.240 recall@10 at the identical
  // 16-cell/4-probe/m4/cb8 config — and probe-INVARIANT, where raw
  // codes degrade to 0.180 at nprobe=16 because their shared tables
  // ignore the query-to-cell geometry the residual tables encode).
  // Query cost gains the per-probed-cell ADC tables
  // (nprobe·m·cb broadcast rows per query — the fixed IVFADC term).
  // Deterministic recipe throughout, so the oracle replays the whole
  // composition — the replay differs from s08 by exactly one
  // centroid-subtract join per side.
  // ---------------------------------------------------------------- //
  def s09_ann_ivfadc(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val ivf = graft.operators.Ann.buildIvf(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      cells = ivfCells, lloydIters = 1)
    val (codebooks, codes) = graft.operators.Ann.buildPqResidual(
      emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id", "embedding",
      ivf, pqM, pqCb)
    val index = graft.operators.Ann.pqIvfIndexOf(codebooks, codes, "neighbor_id", ivf)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.operators.Ann.ivfPqTopKResidual(queries, "query_id", "embedding",
      index, "neighbor_id", pqM, pqK, ivfProbe)
  }

  /** The IVFADC replay CTE chain (everything through the per-pair ADC
    * sums) — shared by the s09 statement and s10's refine extension. */
  private val ivfadcSqlCtes: String = {
    val sd = 64 / pqM
    def d2E(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a)+1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    def d2F(a: String, b: String) =
      s"""list_sum(list_transform(range(1, len($a)+1),
         |    i -> (CAST($a[i] AS DOUBLE) - $b[i]) * (CAST($a[i] AS DOUBLE) - $b[i])))""".stripMargin
    val adcSum = (1 until pqM).foldLeft("MAX(CASE WHEN m=0 THEN d2 END)") {
      (acc, i) => s"($acc + MAX(CASE WHEN m=$i THEN d2 END))"
    }
    s"""e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |ic0 AS (SELECT vec_id AS cid, list_transform(v, x -> CAST(x AS DOUBLE)) AS cv
       |       FROM e ORDER BY vec_id LIMIT $ivfCells),
       |ia1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, ic0.cid, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2F("e.v", "ic0.cv")} ASC, ic0.cid ASC) AS rn
       |    FROM e CROSS JOIN ic0) WHERE rn = 1),
       |im1 AS (
       |  SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS mu
       |  FROM (SELECT ia1.cid, unnest(range(1, len(e.v)+1)) AS pos, unnest(e.v) AS x
       |        FROM ia1 JOIN e USING (vec_id))
       |  GROUP BY cid, pos),
       |ic1 AS (SELECT cid, list(mu ORDER BY pos) AS cv FROM im1 GROUP BY cid),
       |iassign AS (
       |  SELECT vec_id AS neighbor_id, cid FROM (
       |    SELECT e.vec_id, ic1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${d2F("e.v", "ic1.cv")} ASC, ic1.cid ASC) AS rn
       |    FROM e CROSS JOIN ic1) WHERE rn = 1),
       |res AS (
       |  SELECT e.vec_id, list_transform(range(1, len(e.v)+1),
       |    i -> CAST(e.v[i] AS DOUBLE) - ic1.cv[i]) AS rv
       |  FROM e JOIN iassign ON e.vec_id = iassign.neighbor_id
       |         JOIN ic1 USING (cid)),
       |sub AS (
       |  SELECT vec_id, mm.m AS m, rv[mm.m*$sd+1 : mm.m*$sd+$sd] AS sv
       |  FROM res, (SELECT unnest(range(0, $pqM)) AS m) mm),
       |pc0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < $pqCb),
       |pa1 AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT sub.vec_id, sub.m, pc0.cid, ROW_NUMBER() OVER (
       |      PARTITION BY sub.vec_id, sub.m
       |      ORDER BY ${d2E("sub.sv", "pc0.cv")} ASC, pc0.cid ASC) AS rn
       |    FROM sub JOIN pc0 ON sub.m = pc0.m) WHERE rn = 1),
       |pm1 AS (
       |  SELECT m, cid, pos,
       |    CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS mu
       |  FROM (SELECT pa1.m AS m, pa1.cid, unnest(range(1, len(sub.sv)+1)) AS pos,
       |          unnest(sub.sv) AS x
       |        FROM pa1 JOIN sub ON pa1.vec_id = sub.vec_id AND pa1.m = sub.m)
       |  GROUP BY m, cid, pos),
       |pc1 AS (SELECT m, cid, list(mu ORDER BY pos) AS cv FROM pm1 GROUP BY m, cid),
       |codes AS (
       |  SELECT vec_id AS neighbor_id, m, cid AS code FROM (
       |    SELECT sub.vec_id, sub.m, pc1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY sub.vec_id, sub.m
       |      ORDER BY ${d2E("sub.sv", "pc1.cv")} ASC, pc1.cid ASC) AS rn
       |    FROM sub JOIN pc1 ON sub.m = pc1.m) WHERE rn = 1),
       |qv AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, cid FROM (
       |    SELECT qv.query_id, ic1.cid, ROW_NUMBER() OVER (
       |      PARTITION BY qv.query_id ORDER BY ${d2F("qv.qv", "ic1.cv")} ASC, ic1.cid ASC) AS rn
       |    FROM qv CROSS JOIN ic1) WHERE rn <= $ivfProbe),
       |qres AS (
       |  SELECT probes.query_id, probes.cid AS qcell,
       |    list_transform(range(1, len(qv.qv)+1),
       |      i -> CAST(qv.qv[i] AS DOUBLE) - ic1.cv[i]) AS rqv
       |  FROM probes JOIN qv USING (query_id) JOIN ic1 USING (cid)),
       |qsub AS (
       |  SELECT query_id, qcell, mm.m AS m, rqv[mm.m*$sd+1 : mm.m*$sd+$sd] AS qsv
       |  FROM qres, (SELECT unnest(range(0, $pqM)) AS m) mm),
       |qtab AS (SELECT query_id, qcell, qsub.m AS m, pc1.cid, ${d2E("qsub.qsv", "pc1.cv")} AS d2
       |         FROM qsub JOIN pc1 ON qsub.m = pc1.m),
       |cands AS (
       |  SELECT query_id, neighbor_id, cid FROM probes JOIN iassign USING (cid)
       |  WHERE query_id <> neighbor_id),
       |per AS (
       |  SELECT cands.query_id, cands.neighbor_id, codes.m AS m, qtab.d2
       |  FROM cands
       |  JOIN codes USING (neighbor_id)
       |  JOIN qtab ON codes.m = qtab.m AND codes.code = qtab.cid
       |    AND qtab.query_id = cands.query_id AND qtab.qcell = cands.cid),
       |adc AS (
       |  SELECT query_id, neighbor_id, $adcSum AS adc
       |  FROM per GROUP BY query_id, neighbor_id)""".stripMargin
  }

  val s09_sql: String =
    s"""WITH $ivfadcSqlCtes
       |SELECT query_id, neighbor_id, rk, round(adc, 6) AS adc_d2 FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INT) AS rk
       |  FROM adc) WHERE rk <= $pqK
       |ORDER BY query_id, rk""".stripMargin

  // ---------------------------------------------------------------- //
  // s10: IVFADC + exact REFINE — the FAISS IndexRefineFlat serving
  // config: the compressed probe nominates k·refineFactor candidates,
  // then ONLY those candidates' raw vectors are fetched by id and
  // exact-scored. The accuracy/IO trade production deployments run:
  // corpus-wide work stays on the m-byte codes, raw vectors are
  // touched for |Q|·k·factor rows. recall(refine) >= recall(ADC@k)
  // always (a nominated true neighbor can only be outranked by true
  // closer vectors). Deterministic end to end — the oracle extends
  // s09's replay with the candidate cut and the exact re-rank.
  // ---------------------------------------------------------------- //
  private val refineFactor = 3

  def s10_ann_ivfadc_refine(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val ivf = graft.operators.Ann.buildIvf(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      cells = ivfCells, lloydIters = 1)
    val (codebooks, codes) = graft.operators.Ann.buildPqResidual(
      emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id", "embedding",
      ivf, pqM, pqCb)
    val index = graft.operators.Ann.pqIvfIndexOf(codebooks, codes, "neighbor_id", ivf)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.operators.Ann.ivfPqRefineTopK(queries, "query_id", "embedding", index,
      emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id", "embedding",
      pqM, pqK, ivfProbe, refineFactor)
  }

  val s10_sql: String =
    s"""WITH $ivfadcSqlCtes,
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rn
       |    FROM adc) WHERE rn <= ${pqK * refineFactor}),
       |ref AS (
       |  SELECT a.query_id, a.neighbor_id,
       |    list_sum(list_transform(range(1, len(e.v)+1),
       |      i -> (CAST(qv.qv[i] AS DOUBLE) - CAST(e.v[i] AS DOUBLE))
       |         * (CAST(qv.qv[i] AS DOUBLE) - CAST(e.v[i] AS DOUBLE)))) AS d2
       |  FROM approx a JOIN e ON a.neighbor_id = e.vec_id
       |       JOIN qv USING (query_id))
       |SELECT query_id, neighbor_id, rk, round(d2, 6) AS d2 FROM (
       |  SELECT query_id, neighbor_id, d2,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY d2 ASC, neighbor_id ASC) AS INT) AS rk
       |  FROM ref) WHERE rk <= $pqK
       |ORDER BY query_id, rk""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p46_substring_dedup" -> ((p46_substring_dedup _, Some(p46_sql))),
    "p47_temp_mix" -> ((p47_temp_mix _, Some(p47_sql))),
    "s07_ann_pq" -> ((s07_ann_pq _, Some(s07_sql))),
    "s08_ann_ivf_pq" -> ((s08_ann_ivf_pq _, Some(s08_sql))),
    "s09_ann_ivfadc" -> ((s09_ann_ivfadc _, Some(s09_sql))),
    "s10_ann_ivfadc_refine" -> ((s10_ann_ivfadc_refine _, Some(s10_sql))),
    "st08_stream_scrub" -> ((st08_stream_scrub _, Some(st08_sql))))
}
