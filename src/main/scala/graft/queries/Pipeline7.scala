package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-pipeline probe set, seventh wave — corpus cardinality sketching
  * and within-document repetition trimming:
  *
  *  - p41: k-minimum-values distinct sketch (Bar-Yossef et al. 2002)
  *    over 5-token shingles, per source — the "how big is the dedup
  *    problem" estimator that runs BEFORE committing to a full
  *    shingle-keyed shuffle. COUNT(DISTINCT shingle) moves every
  *    distinct shingle through an exchange; the sketch reduces each
  *    partition to ≤ k longs per source map-side (functions.KmvMinima),
  *    so the exchange carries `sources · k · 8` bytes at any corpus
  *    size, and per-shard sketches merge exactly for incremental use.
  *  - p42: within-document repeated-segment trimming (the Gopher-style
  *    repetition cleanup applied as a TRANSFORM, not a filter): drop
  *    every repeat of an already-seen segment inside the same document,
  *    keep first occurrences in order. Pure map-side row work — zero
  *    shuffles at any scale — because the dedup scope is the document
  *    itself, unlike p32's corpus-global first-wins.
  *  - p43: sketch algebra — all-pairs source overlap estimated from the
  *    p41 sketches alone, never re-touching the corpus.
  *  - p44: deterministic weighted priority sampling per stratum via the
  *    bounded-heap topk_by — importance sampling for mixture builds.
  *
  * Float determinism: p41's estimate is one multiply and one divide
  * over exactly-represented integer-valued doubles, written with the
  * same association in both engines; the hash is the house-portable
  * md5-hex-prefix parse (60 bits here), so the kept minima are
  * bit-identical across engines and the oracle checks the sketch
  * CONTENT, not just the estimate.
  */
object Pipeline7 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- //
  // p41: per-source distinct-shingle cardinality estimate, k = 256.
  // Scale shape: explode shingles map-side → 60-bit portable hash →
  // groupBy(source) with the bounded KMV buffer; no distinct, no
  // shingle-keyed exchange, ever.
  // ---------------------------------------------------------------- //
  private val kmvK = 256
  private val shingleN = 5
  // 2^60: the hash is conv(md5-prefix of 15 hex chars), uniform on [0, 2^60)
  private val hashSpace = 1152921504606846976L

  /** Per-source KMV sketch of 5-token-shingle hashes: one corpus pass,
    * partial sketch buffers map-side, the one exchange keyed by source
    * and carrying ≤ k longs per source per task. The hash is the
    * engine-portable md5-hex-prefix parse (the p07/minhash recipe
    * widened to 60 bits), so both engines keep identical minima. */
  private def sourceSketches(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.shingleSketch(
      t(s, dir, "documents").select(col("source"), col("text")),
      "source", "text", k = kmvK, segTokens = shingleN)

  def p41_kmv_distinct(s: SparkSession, dir: String): DataFrame = {
    sourceSketches(s, dir)
      .select(col("source"),
        size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_min"),
        // same association as the SQL: (k-1) * M / kth, all doubles
        round(when(size(col("mins")) < kmvK, size(col("mins")).cast("double"))
          .otherwise(lit(kmvK - 1).cast("double") * lit(hashSpace).cast("double") /
            element_at(col("mins"), size(col("mins"))).cast("double")), 4)
          .as("est_distinct"))
      .orderBy(col("source"))
  }

  val p41_sql: String =
    s"""WITH sh AS (
       |  SELECT source, unnest(list_transform(range(1, len(tok)-${shingleN - 2}),
       |    i -> ${(0 until shingleN).map(o => s"tok[i+$o]").mkString(" || ' ' || ")})) AS sh
       |  FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS tok FROM documents)
       |  WHERE len(tok) >= $shingleN),
       |hh AS (SELECT DISTINCT source, CAST(('0x'||substr(md5(sh),1,15)) AS BIGINT) AS h FROM sh),
       |ranked AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth_min,
       |  round(CASE WHEN COUNT(*) < $kmvK THEN CAST(COUNT(*) AS DOUBLE)
       |    ELSE CAST(${kmvK - 1} AS DOUBLE) * CAST($hashSpace AS DOUBLE) / CAST(MAX(h) AS DOUBLE) END, 4) AS est_distinct
       |FROM ranked WHERE rn <= $kmvK GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- //
  // p42: within-doc keep-first segment dedup. The corpus has no
  // newlines, so the repetition unit is the fixed non-overlapping
  // 2-token segment (the same no-newline convention as p28/p32; two
  // tokens rather than three so natural bigram repeats actually
  // exercise the trim). Everything happens inside one projection over
  // one document's arrays — the operator's cost is exactly one corpus
  // pass regardless of scale.
  // ---------------------------------------------------------------- //
  private val segN = 2

  def p42_repeat_trim(s: SparkSession, dir: String): DataFrame =
    PipelineOps.spread(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .filter(length(trim(col("text"))) > 0)
      // one regex pass builds the segment array directly — no token
      // array, no sequence/transform lambda (HOF lambda bodies evaluate
      // interpreted PER SEGMENT; an earlier array_join(slice(...)) body
      // measured 11.3 s at sf10 vs 3.45 s for a concat body vs this).
      // Greedy non-overlapping '[^ ]+ [^ ]+|[^ ]+' over whitespace-
      // normalized text = consecutive 2-token chunks, remainder single.
      .select(col("doc_id"), regexp_extract_all(
        regexp_replace(trim(col("text")), lit("\\s+"), lit(" ")),
        lit("[^ ]+ [^ ]+|[^ ]+"), lit(0)).as("segs"))
      .select(col("doc_id"),
        // array_distinct is ORDER-PRESERVING in Spark (first occurrence
        // wins), which is exactly keep-first — and O(n) per document,
        // so one monster document can't turn into a quadratic hot row.
        // DuckDB's list_distinct hashes away the order, so the oracle
        // reconstructs keep-first via list_position instead; the md5
        // over the joined result pins both to the same string.
        size(col("segs")).cast("long").as("n_seg"),
        size(array_distinct(col("segs"))).cast("long").as("n_kept"),
        md5(array_join(array_distinct(col("segs")), " ")).as("trimmed_fp"))
      .orderBy(col("doc_id"))

  val p42_sql: String =
    s"""WITH seg AS (
       |  SELECT doc_id, regexp_extract_all(
       |    regexp_replace(trim(text), '\\s+', ' ', 'g'), '[^ ]+ [^ ]+|[^ ]+') AS segs
       |  FROM documents WHERE len(trim(text)) > 0),
       |kept AS (
       |  SELECT doc_id, segs,
       |    list_filter(range(1, len(segs) + 1), i -> list_position(segs, segs[i]) = i) AS keep_idx
       |  FROM seg)
       |SELECT doc_id,
       |  CAST(len(segs) AS BIGINT) AS n_seg,
       |  CAST(len(keep_idx) AS BIGINT) AS n_kept,
       |  md5(array_to_string(list_transform(keep_idx, i -> segs[i]), ' ')) AS trimmed_fp
       |FROM kept ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- //
  // p43: sketch ALGEBRA — pairwise source-overlap estimates computed
  // from the per-source KMV sketches alone (Beyer et al., "On synopses
  // for distinct-value estimation under multiset operations", SIGMOD
  // 2007): for sources a, b with sketches K(a), K(b), the combined
  // sketch U = k smallest of K(a) ∪ K(b) is exactly the KMV sketch of
  // the UNION stream, and |U ∩ K(a) ∩ K(b)| / |U| estimates Jaccard.
  // The corpus is touched once (p41's one pass); the pair expansion
  // runs over sources² sketch rows of k longs each — at 100 TB this is
  // the difference between estimating all-pairs feed overlap from a
  // few MB of sketches and p27's exact answer re-shuffling the corpus.
  // ---------------------------------------------------------------- //
  def p43_sketch_overlap(s: SparkSession, dir: String): DataFrame = {
    // pin the (sources · k-long) sketch relation before self-joining:
    // without this, Spark's self-join re-runs the corpus sketch chain
    // once per side — the operator's whole point is that the corpus is
    // touched ONCE and pairing is algebra over KBs of sketch rows
    val sk = sourceSketches(s, dir).localCheckpoint()
    val a = sk.select(col("source").as("src_a"), col("mins").as("ma"))
    val b = sk.select(col("source").as("src_b"), col("mins").as("mb"))
    // sources² pairs of k-long arrays: broadcast the (tiny) sketch
    // relation; all set algebra is in-row array work
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        expr(s"slice(array_sort(array_union(ma, mb)), 1, $kmvK)").as("u"),
        col("ma"), col("mb"))
      .select(col("src_a"), col("src_b"),
        size(col("u")).cast("long").as("n_union_kept"),
        element_at(col("u"), size(col("u"))).as("union_kth"),
        size(expr("array_intersect(array_intersect(u, ma), mb)")).cast("long")
          .as("n_common"),
        round(size(expr("array_intersect(array_intersect(u, ma), mb)")).cast("double") /
          size(col("u")).cast("double"), 6).as("est_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val p43_sql: String =
    s"""WITH sh AS (
       |  SELECT source, unnest(list_transform(range(1, len(tok)-${shingleN - 2}),
       |    i -> ${(0 until shingleN).map(o => s"tok[i+$o]").mkString(" || ' ' || ")})) AS sh
       |  FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS tok FROM documents)
       |  WHERE len(tok) >= $shingleN),
       |hh AS (SELECT DISTINCT source, CAST(('0x'||substr(md5(sh),1,15)) AS BIGINT) AS h FROM sh),
       |ranked AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
       |sk AS (SELECT source, list_sort(list(h)) AS mins FROM ranked WHERE rn <= $kmvK GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    list_sort(list_distinct(a.mins || b.mins))[1:$kmvK] AS u,
       |    a.mins AS ma, b.mins AS mb
       |  FROM sk a JOIN sk b ON a.source < b.source)
       |SELECT src_a, src_b,
       |  CAST(len(u) AS BIGINT) AS n_union_kept,
       |  u[len(u)] AS union_kth,
       |  CAST(len(list_intersect(list_intersect(u, ma), mb)) AS BIGINT) AS n_common,
       |  round(CAST(len(list_intersect(list_intersect(u, ma), mb)) AS DOUBLE)
       |    / CAST(len(u) AS DOUBLE), 6) AS est_jaccard
       |FROM pairs ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- //
  // p44: deterministic weighted priority sample — k docs per source,
  // selection biased toward heavier documents (weight = n_chars; in a
  // real mixture build, a quality score): rank by hash/weight and keep
  // the k smallest. Reproducible across engines by construction (the
  // portable 60-bit hash and ONE double division — exact Efraimidis-
  // Spirakis sampling would need u^(1/w), a transcendental that
  // diverges in the last ulp across libms). Scale shape: the bounded
  // heap (topk_by) reduces each partition to ≤ k rows per source
  // map-side; the oracle's ROW_NUMBER window would range-sort the
  // whole corpus per stratum.
  // ---------------------------------------------------------------- //
  private val sampleK = 10

  def p44_weighted_sample(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKFunctions
    TopKFunctions.register(s)
    val pri = PipelineOps.spread(
        t(s, dir, "documents").select(col("source"), col("doc_id"), col("n_chars")))
      .filter(col("n_chars") > 0)
      .select(col("source"), col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").cast("double") / col("n_chars").cast("double")).as("pri"))
    // topk_by keeps score DESC with id-asc ties; negate for smallest-k.
    // The raw priority is NOT emitted: at ~1e14 magnitude Spark's
    // BigDecimal round and DuckDB's multiply-by-10^s round diverge in
    // the last bits, and the rank order already pins every priority;
    // the joined-back weight shows the bias instead.
    val picked = pri.groupBy(col("source"))
      .agg(TopKFunctions.topk_by(-col("pri"), col("doc_id"), sampleK).as("best"))
      .select(col("source"), posexplode(col("best")).as(Seq("i", "b")))
      .select(col("source"), (col("i") + 1).cast("int").as("rn"),
        col("b.id").as("doc_id"))
    // weight lookup joins the corpus AGAINST the broadcast sources·k
    // picked rows — the corpus side never crosses an exchange
    t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      .join(broadcast(picked), "doc_id")
      .select(col("source"), col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rn"))
  }

  val p44_sql: String =
    s"""WITH pri AS (SELECT source, doc_id, n_chars,
       |  CAST(CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS DOUBLE)
       |    / CAST(n_chars AS DOUBLE) AS pri
       |  FROM documents WHERE n_chars > 0)
       |SELECT source, CAST(rn AS INT) AS rn, doc_id, n_chars FROM (
       |  SELECT source, doc_id, n_chars, pri,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri ASC, doc_id ASC) AS rn FROM pri)
       |WHERE rn <= $sampleK ORDER BY source, rn""".stripMargin

  // ---------------------------------------------------------------- //
  // st07: the KMV sketch as STREAMING state — per-event-type distinct-
  // user estimates maintained across micro-batches (the production
  // shape for "distinct users per type today" over an unbounded
  // stream). The same TypedImperativeAggregate runs inside the
  // streaming state store: each micro-batch folds its rows into the
  // ≤ k-long buffers, so state per group is BOUNDED at k longs forever
  // — a streaming COUNT(DISTINCT) would grow state with every new user.
  // Streaming and batch must agree exactly (the st01 contract): the
  // oracle recomputes the sketch from the same parquet in SQL.
  // ---------------------------------------------------------------- //
  private val streamK = 128

  def st07_stream_distinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    graft.functions.KmvFunctions.register(s)
    import graft.functions.KmvFunctions.kmv_minima
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("event_type"))
      .agg(kmv_minima(col("h"), streamK).as("mins"))
    val name = s"st07_out_${System.nanoTime()}"
    s.conf.set("spark.sql.streaming.minBatchesToRetain", "1")
    val ckpt = s"/dev/shm/graft_ckpt_$name"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "2")
    val q = try {
      stream.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.Once()).start()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    q.awaitTermination()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    s.table(name)
      .select(col("event_type"),
        size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_min"),
        round(when(size(col("mins")) < streamK, size(col("mins")).cast("double"))
          .otherwise(lit(streamK - 1).cast("double") * lit(hashSpace).cast("double") /
            element_at(col("mins"), size(col("mins"))).cast("double")), 4)
          .as("est_distinct"))
      .orderBy(col("event_type"))
  }

  val st07_sql: String =
    s"""WITH hh AS (SELECT DISTINCT event_type,
       |    CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
       |  FROM events),
       |ranked AS (SELECT event_type, h,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hh)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth_min,
       |  round(CASE WHEN COUNT(*) < $streamK THEN CAST(COUNT(*) AS DOUBLE)
       |    ELSE CAST(${streamK - 1} AS DOUBLE) * CAST($hashSpace AS DOUBLE) / CAST(MAX(h) AS DOUBLE) END, 4) AS est_distinct
       |FROM ranked WHERE rn <= $streamK GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- //
  // p45: per-source corpus card — the dataset-report pass every
  // training corpus publishes (docs, token mass, length profile,
  // exact-dup rate, language share) in ONE aggregate over one corpus
  // pass. count(DISTINCT md5) partial-dedups map-side; every other
  // column is a plain COUNT/SUM; the single exchange is keyed by
  // source. Ratios are one double division each (identical
  // association both engines).
  // ---------------------------------------------------------------- //
  def p45_corpus_card(s: SparkSession, dir: String): DataFrame = {
    val nd = count(lit(1)).cast("double")
    PipelineOps.spread(t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("lang"), col("n_chars"), col("text")))
      .select(col("source"), col("lang"), col("n_chars"),
        size(PipelineOps.tokens).cast("long").as("n_tok"),
        md5(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        round(sum(col("n_tok")).cast("double") / nd, 6).as("avg_tokens"),
        round(count(when(col("n_chars") < 100, 1)).cast("double") / nd, 6)
          .as("pct_short"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"),
        round(count(when(col("lang") === "en", 1)).cast("double") / nd, 6)
          .as("pct_en"))
      .orderBy(col("source"))
  }

  val p45_sql: String =
    """SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  round(CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_tokens,
      |  round(CAST(COUNT(CASE WHEN n_chars < 100 THEN 1 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS pct_short,
      |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
      |  round(CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS pct_en
      |FROM (SELECT source, lang, n_chars,
      |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |        md5(text) AS fp
      |      FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p41_kmv_distinct" -> ((p41_kmv_distinct _, Some(p41_sql))),
    "p42_repeat_trim" -> ((p42_repeat_trim _, Some(p42_sql))),
    "p43_sketch_overlap" -> ((p43_sketch_overlap _, Some(p43_sql))),
    "p44_weighted_sample" -> ((p44_weighted_sample _, Some(p44_sql))),
    "p45_corpus_card" -> ((p45_corpus_card _, Some(p45_sql))),
    "st07_stream_distinct" -> ((st07_stream_distinct _, Some(st07_sql))))
}
