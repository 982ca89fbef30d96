package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable training-data text operators, parameterized over any input
  * DataFrame — the library surface behind the corpus-bound battery
  * entries (p16/p17/p18 delegate here). Everything is codegen'd
  * built-ins; shapes are chosen for 100 TB (see each method).
  */
object TextOps {

  /** One redaction rule: matches of `pattern` become `replacement`;
    * the count of matches at application time lands in `n_<name>`. */
  final case class ScrubRule(name: String, pattern: String, replacement: String)

  /** Common rules, portable between Java regex and RE2. */
  val EmailRule: ScrubRule =
    ScrubRule("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val LongDigitRule: ScrubRule =
    ScrubRule("digit_runs", "[0-9]{4,}", "<NUM>")

  /** [[LongDigitRule]] for text that already carries `<prefix_k>`
    * placeholders ([[consistentAnonymize]] output): maximal digit runs
    * still collapse to `<NUM>`, but a placeholder's own number is left
    * intact — the plain rule rewrites `<EMAIL_1000>` and every higher
    * entity to one shared `<EMAIL_<NUM>>` token, silently breaking the
    * same-entity-same-placeholder property on email-dense documents
    * (directories, mailing-list dumps). The maximal-run lookarounds
    * `(?<![0-9])…(?![0-9])` stop the engine from re-matching a
    * placeholder number's SUFFIX after the lookbehind rejects the full
    * run. Java-regex only (lookbehind is not RE2-portable). The prefix
    * is taken LITERALLY (`Pattern.quote`): a metacharacter-bearing
    * prefix like `A+B` stays a fixed-width lookbehind instead of
    * throwing PatternSyntaxException or silently mis-scrubbing. */
  def placeholderSafeDigitRule(prefix: String = "EMAIL"): ScrubRule =
    ScrubRule("digit_runs",
      s"(?<!<${java.util.regex.Pattern.quote(prefix)}_)(?<![0-9])[0-9]{4,}(?![0-9])",
      "<NUM>")

  /** PII scrubbing: apply `rules` in order to `textCol`, producing the
    * scrubbed text in `outCol` plus one `n_<rule>` count column per
    * rule (counted against the text as it stands when the rule runs).
    * Pure map over a narrow projection — no shuffle at any scale. */
  def piiScrub(df: DataFrame, textCol: String, outCol: String,
      rules: Seq[ScrubRule] = Seq(EmailRule, LongDigitRule)): DataFrame =
    rules.foldLeft(df.withColumn(outCol, col(textCol))) { (d, r) =>
      d.withColumn(s"n_${r.name}", regexp_count(col(outCol), lit(r.pattern)))
        .withColumn(outCol, regexp_replace(col(outCol), r.pattern, r.replacement))
    }

  /** Consistent pseudonymization: every match of `pattern` in
    * `textCol` becomes `<prefix_k>` where k numbers the DISTINCT
    * matched entities by first appearance in the document — the same
    * entity maps to the same placeholder everywhere it recurs
    * (referential integrity of the redaction: downstream consumers can
    * still tell "sender wrote to themselves" from "two parties"),
    * where a plain [[piiScrub]] collapses every entity to one token.
    * Adds `n_mentions` (all matches) and `n_entities` (distinct).
    *
    * Pure map-side column algebra — extract, first-occurrence dedup
    * (filter-with-index against the first position), and a fold of
    * literal replaces — so it composes into whole-stage codegen with
    * no shuffle at any scale, like every scrub here. The fold applies
    * LONGEST entity first (placeholder numbers still follow first
    * appearance): a literal replace of a shorter entity that is a
    * substring of a longer one (`bob@x.com` inside `alice_bob@x.com`)
    * would otherwise fire inside the longer match and corrupt it to a
    * never-numbered `alice_<EMAIL_k>` hybrid — leaking the prefix the
    * scrub exists to remove. Equal-length distinct entities cannot
    * contain each other, so ties need no ordering. The pattern must
    * avoid SQL-literal escapes (use `[.]`, not `\.`) because it is
    * inlined into lambda SQL; single quotes in `pattern`/`prefix` are
    * escaped here, but a placeholder (`<prefix_k>`) must not itself
    * match `pattern` (true for any pattern requiring a char outside
    * `[A-Za-z0-9_<>]`, e.g. the `@` every email pattern anchors on). */
  /** The default [[consistentAnonymize]] pattern; matches of it are
    * extracted by the codegen'd [[graft.functions.EmailExtractAll]]
    * scanner instead of the regex engine (byte-equal by property test;
    * java.util.regex backtracks at ~100 MB/s and is the whole cost of
    * a corpus-scale pass). */
  val DefaultAnonymizePattern = "[A-Za-z0-9_]+@[A-Za-z0-9]+[.]com"

  /** The production-grade email pattern ([[EmailRule]]'s regex in the
    * SQL-literal-safe `[.]` spelling) — the CorpusBuild scrub shape.
    * Matches of it are extracted by the codegen'd general scanner
    * ([[graft.functions.EmailScanKernel.extractAllGeneral]], byte-
    * equal by property test) instead of java.util.regex. */
  val ProductionEmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"

  def consistentAnonymize(df: DataFrame, textCol: String, outCol: String,
      pattern: String = DefaultAnonymizePattern,
      prefix: String = "EMAIL"): DataFrame = {
    val p = pattern.replace("'", "''")
    val pfx = prefix.replace("'", "''")
    val extract =
      if (pattern == DefaultAnonymizePattern) {
        graft.functions.TextScanFunctions.register(df.sparkSession)
        s"email_extract_all($textCol)"
      } else if (pattern == ProductionEmailPattern) {
        graft.functions.TextScanFunctions.register(df.sparkSession)
        s"email_extract_all_g($textCol)"
      } else s"regexp_extract_all($textCol, '$p', 0)"
    df.withColumn("_m", expr(extract))
      .withColumn("_e", expr("filter(_m, (x, i) -> array_position(_m, x) = i + 1)"))
      // (length, entity, first-appearance number) structs: sort_array
      // descending compares field-by-field, so the fold below runs
      // longest-entity-first with no packed-string delimiter — an
      // entity containing ANY character (including '|') is safe
      .withColumn("_n", expr(
        "transform(_e, (x, j) -> struct(length(x) as l, x as e, j + 1 as k))"))
      .withColumn(outCol, expr(
        s"aggregate(sort_array(_n, false), $textCol, " +
          s"(acc, x) -> replace(acc, x.e, concat('<$pfx', '_', x.k, '>')))"))
      .withColumn("n_mentions", size(col("_m")))
      .withColumn("n_entities", size(col("_e")))
      .drop("_m", "_e", "_n")
  }

  /** Sequence packing: GPT-style concatenate-then-chunk of the token
    * stream into fixed `budget`-token training windows, deterministic
    * order (`groupCol`, `idCol`). Adds `start_off` (global token offset
    * within the group) and `first_window`/`last_window`.
    *
    * The prefix sum is hierarchical — the textbook distributed scan in
    * declarative Catalyst: (1) parallel per-(group, chunk-of-`chunkDocs`
    * -ids) subtotals; (2) a running sum over the tiny chunk relation
    * (the only sequential window, one row per ~`chunkDocs` docs);
    * (3) chunk base offsets broadcast back + a running sum bounded by
    * the chunk width. A naive `PARTITION BY group` running sum would
    * serialize each group into a single task — a group is the whole
    * Common Crawl at 100 TB. */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
      nTokensCol: String, budget: Int, chunkDocs: Int = 64): DataFrame = {
    val base = df.withColumn("chunk", (col(idCol) / chunkDocs).cast("bigint"))
    val chunkTotals = base.groupBy(col(groupCol), col("chunk"))
      .agg(sum(col(nTokensCol)).as("chunk_tokens"))
    val wChunks = Window.partitionBy(col(groupCol)).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkOffsets = chunkTotals.withColumn("chunk_base",
      coalesce(sum(col("chunk_tokens")).over(wChunks), lit(0L)))
    val wInChunk = Window.partitionBy(col(groupCol), col("chunk"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(chunkOffsets.select(col(groupCol), col("chunk"), col("chunk_base"))),
        Seq(groupCol, "chunk"))
      .withColumn("start_off",
        col("chunk_base") + coalesce(sum(col(nTokensCol)).over(wInChunk), lit(0L)))
      .withColumn("first_window", (col("start_off") / budget).cast("bigint"))
      .withColumn("last_window",
        ((col("start_off") + col(nTokensCol) - 1) / budget).cast("bigint"))
      .drop("chunk", "chunk_base")
  }

  /** Eval-set decontamination: flag documents sharing `shingleSize`-token
    * shingles with the held-out set selected by `isEval`. Returns one
    * row per contaminated non-eval doc: (idCol, n_shingles,
    * n_contaminated, contamination_frac).
    *
    * The eval shingle set is tiny relative to the corpus, so the probe
    * is a broadcast join: the training side streams map-only and never
    * shuffles. (A bloom filter of eval shingles trades exactness for
    * size; the exact broadcast set is right while eval shingles fit in
    * memory, which benchmark suites do by orders of magnitude.) */
  def decontaminate(docs: DataFrame, idCol: String, tokensCol: String,
      isEval: Column, shingleSize: Int = 5): DataFrame = {
    // spread each under-split branch AFTER its eval/train filter but
    // before the compute-heavy shingle explode (a single-row-group file
    // otherwise shingles on one task; repartitioning before the filter
    // doesn't help, since the filter pushes below the repartition)
    def spread(d: DataFrame): DataFrame = Scale.spread(d)
    def shingles(d: DataFrame): DataFrame = d
      .filter(size(col(tokensCol)) >= shingleSize)
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(0), size(col(tokensCol)) - shingleSize),
          i => concat_ws(" ",
            (0 until shingleSize).map(o => col(tokensCol)(i + o)): _*)))).as("sh"))
    val evalSh = shingles(spread(docs.filter(isEval)))
      .select(col("sh")).distinct().withColumn("hit", lit(1))
    shingles(spread(docs.filter(!isEval)))
      .join(broadcast(evalSh), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .withColumn("contamination_frac",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }

  /** Per-source boilerplate removal (the C4/CCNet cleanup step): text
    * shared verbatim by `minDocs`+ distinct documents of the same
    * source — headers, footers, nav chrome — is stripped. The unit is
    * a non-overlapping `segLen`-token segment (a whitespace-tokenized
    * stand-in for a line). Returns one row per document with ≥segLen
    * tokens: (idCol, sourceCol, outCol cleaned text, n_seg, n_boiler,
    * kept_tokens).
    *
    * Shape at scale: the frequency pass deduplicates to one
    * (source, segment, doc) row before its shuffle; flagged positions
    * come back as a per-doc int list via one narrow aggregate, and the
    * text is rebuilt by a per-row lambda — no row explosion survives
    * past the counting stage. The boilerplate join is left un-hinted:
    * AQE broadcasts the (small) boilerplate vocabulary at runtime,
    * and a pathological corpus degrades to a shuffle join instead of
    * OOMing the driver. */
  def removeBoilerplate(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, segLen: Int = 3, minDocs: Int = 2,
      outCol: String = "clean_text"): DataFrame = {
    val n = segLen
    // under-split guard (the decontaminate/p16 lesson): tokenization is
    // the heavy stage, so spread a single-split source BEFORE it — and
    // below the text projection so nothing pushes the work scan-side.
    //
    // base and inst MATERIALIZE (localCheckpoint): three consumers
    // read them (the frequency pass, the flag join, the final
    // rebuild), and without the checkpoints each consumer
    // re-evaluates the whole scan→tokenize(→segment) chain. Measured
    // twice: fused form ~2x faster than no checkpoints (r8); dropping
    // ONLY base's checkpoint (rebuild re-runs scan→split) measured
    // 1.63 s vs 1.41 s with it — the tok-array materialization is
    // cheaper than re-tokenizing here because the rebuild consumer
    // needs the FULL wide rows, unlike p32's stats arithmetic
    // (r9 A/B, BENCH_NOTES).
    val base = Scale.spread(df.select(col(idCol), col(sourceCol), col(textCol)))
      .select(col(idCol), col(sourceCol),
        split(trim(col(textCol)), "\\s+").as("tok"))
      .filter(size(col("tok")) >= n)
      .withColumn("n_seg", (size(col("tok")) / n).cast("int"))
      .localCheckpoint()
    val inst = base
      .select(col(idCol), col(sourceCol), col("tok"),
        explode(sequence(lit(0), col("n_seg") - 1)).as("seg_i"))
      .select(col(idCol), col(sourceCol), col("seg_i"),
        concat_ws(" ",
          (0 until n).map(o => col("tok")(col("seg_i") * n + o)): _*).as("seg"))
      .localCheckpoint()
    val boiler = inst.select(col(sourceCol), col("seg"), col(idCol)).distinct()
      .groupBy(col(sourceCol), col("seg"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col(sourceCol).as("b_source"), col("seg").as("b_seg"))
    val badPos = inst
      .join(boiler,
        col(sourceCol) === col("b_source") && col("seg") === col("b_seg"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("seg_i"))).as("bad"))
    base.join(badPos, Seq(idCol), "left_outer")
      .withColumn("bad", coalesce(col("bad"), lit(Array.empty[Int])))
      // keep a token when it sits in the unsegmented tail OR its
      // segment index is not flagged
      .withColumn("kept_tok", filter(col("tok"),
        (_, i) => (i >= col("n_seg") * n) ||
          !array_contains(col("bad"), (i / n).cast("int"))))
      .select(col(idCol), col(sourceCol),
        array_join(col("kept_tok"), " ").as(outCol),
        col("n_seg").cast("long").as("n_seg"),
        size(col("bad")).cast("long").as("n_boiler"),
        // arithmetic, NOT size(kept_tok): each flagged segment removes
        // exactly n tokens, so callers that drop the rebuilt text (the
        // stats-only battery shape) let Catalyst prune the whole
        // filter/array_join lambda chain away
        (size(col("tok")) - lit(n) * size(col("bad"))).cast("long")
          .as("kept_tokens"))
  }

  /** Corpus-trained unigram-LM scoring (the CCNet/Gopher-style "LM
    * quality" signal): train the LM on the corpus itself (one
    * token-keyed aggregate, broadcast back — bounded by the
    * vocabulary, not the corpus) and score every document by its mean
    * token likelihood sum(tf·cnt)/n/N and its rare-token-instance
    * rate (token types in fewer than `rareDocFreq` documents).
    * Transcendental-free per the house exactness rule: integer sums
    * with one final IEEE-exact division chain, so the scores are
    * identical under any partitioning. `df`: (idCol, tokCol:
    * array<string>). Returns (idCol, n_tokens, mean_lik, rare_rate).
    *
    * VALUE-DOMAIN BOUND (callers outside an oracle-checked battery):
    * each likelihood term is the 64-bit product tf(token, doc) ·
    * count(token, corpus) and must stay under 2^60 (~1.15e18) — e.g. a
    * token repeated 10^6 times in one document AND 10^12 times in the
    * corpus overflows the per-term long SILENTLY under non-ANSI
    * semantics (the term SUM is exact past int128 via the spill-guarded
    * decimal accumulator; only the per-row product is long-width). Any
    * corpus a DuckDB-style BIGINT oracle can check imposes the same
    * bound; corpora beyond it need the term split before this operator.
    * `tokCol` elements must be non-null (tokenizer output — the house
    * `split` contract); null ELEMENTS are dropped rather than counted
    * as a null token type.
    *
    * Movement: NOTHING corpus-sized ever materializes. An earlier form
    * pre-aggregated to (doc, token, c) and localCheckpointed that
    * relation for its two consumers (the p20 ReuseExchange lesson) —
    * measured out at every scale (examples/LmLab, isolated JVMs,
    * warm): sf0.1 1.16 s vs 0.95 s, sf10 cold 14.6 vs 14.7 but warm
    * 53.4 vs 6.0 — the checkpointed blocks (|docs|·|types per doc|
    * rows) stay resident for the session and the NEXT big query pays
    * for them in evictions. r15 keeps the no-persist rule but shares
    * the (token, doc, c) relation between its two consumers through
    * ReuseExchange instead of recomputing it: both the LM aggregate
    * and the scoring aggregate now hang off the SAME tf subtree, so
    * tokenize+explode runs once, the shuffle files back the reuse (disk,
    * reaped with the stage — none of the checkpoint's resident-block
    * eviction tax), and the scoring join + per-doc aggregate run at
    * tf granularity (types per doc), not instance granularity. The
    * scoring identities that make tf granularity exact:
    * sum_types(tf·cnt) = sum_instances(cnt), n_tokens = sum_types(tf),
    * and instances-of-rare-types = sum_types(tf·[df < k]). Every
    * shuffle is bounded by the vocabulary except the (token, doc)
    * aggregate the document frequency genuinely needs. */
  def unigramLmScores(df: DataFrame, idCol: String, tokCol: String,
      rareDocFreq: Int = 3, includeLikelihood: Boolean = true): DataFrame = {
    // one (token, doc) → tf aggregate, shared by BOTH consumers below
    // (identical subtree → one Exchange, reused). explode_OUTER + a
    // null-token filter, not plain explode: the optimizer infers a
    // `size(tok) > 0 AND tok IS NOT NULL` input filter from a non-outer
    // Generate and pushes it through every exchange to the SCAN, where
    // it re-tokenizes each document once more per planned subtree
    // (three scan branches in p30's r15 plan = three extra corpus
    // tokenizations, on the scan's own task count). The filter is
    // vacuous — split() never returns null or an empty array — and the
    // outer form's null-token row (null/empty input array) is dropped
    // by the explicit filter below, which cannot be pushed past the
    // generate because the column does not exist under it.
    val tf = df.select(col(idCol), explode_outer(col(tokCol)).as("__token"))
      .filter(col("__token").isNotNull)
      .groupBy(col("__token"), col(idCol))
      .agg(count(lit(1)).as("__c"))
    val nr = sum(when(col("__df") < rareDocFreq, col("__c")).otherwise(0L))
      .as("__nr")
    if (includeLikelihood) {
      val lm = tf.groupBy(col("__token"))
        .agg(sum(col("__c")).as("__cnt"), count(lit(1)).as("__df"))
      val total = lm.agg(sum(col("__cnt")).as("__n_corpus"))
      graft.functions.DecimalFastFunctions.register(df.sparkSession)
      tf.join(broadcast(lm), "__token")
        .crossJoin(broadcast(total))
        .groupBy(col(idCol), col("__n_corpus"))
        .agg(sum(col("__c")).as("n_tokens"),
          // per-type tf·cnt terms can sum past 2^63 on a large corpus
          // (Spark's long sum would wrap SILENTLY under non-ANSI while
          // the DuckDB twin widens to HUGEINT) — accumulate through the
          // spill-guarded all-primitive decimal sum, exact past the
          // int128 range with no per-row BigDecimal. The 64-bit per-row
          // product is in-contract: the oracle's own SQL computes the
          // same BIGINT c·cnt, so any corpus the oracle can check keeps
          // each term far under the accumulator's 2^60 input bound.
          graft.functions.DecimalFastFunctions
            .sum_unscaled_safe(col("__c") * col("__cnt"), 38, 0).as("__wsum"),
          nr)
        .select(col(idCol), col("n_tokens"),
          (col("__wsum").cast("double") / col("n_tokens") / col("__n_corpus"))
            .as("mean_lik"),
          (col("__nr").cast("double") / col("n_tokens")).as("rare_rate"))
    } else {
      // rare-rate-only callers (e.g. a pure quality gate) skip the
      // corpus-total pass and the likelihood sum entirely
      val lm = tf.groupBy(col("__token")).agg(count(lit(1)).as("__df"))
      tf.join(broadcast(lm), "__token")
        .groupBy(col(idCol))
        .agg(sum(col("__c")).as("n_tokens"), nr)
        .select(col(idCol), col("n_tokens"),
          (col("__nr").cast("double") / col("n_tokens")).as("rare_rate"))
    }
  }

  /** Deterministic corpus shuffle + shard assignment — the
    * reproducible-permutation step before writing training shards.
    * Shard = the first `hexDigits` hex digits of md5(id) (16^d
    * balanced shards, pure map-side arithmetic); position = rank
    * within the shard by the full hash, via a shard-PARTITIONED
    * window (never a global single-task sort). Adds `shard` (int)
    * and `pos` (int) to `df`. At scale, write the result
    * `partitionBy("shard")` so shard files stream out of the window
    * stage without re-shuffling. */
  def shuffleShards(df: DataFrame, idCol: String, hexDigits: Int = 1): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 7, "shard width: 1-7 hex digits")
    val alphabet = lit("0123456789abcdef")
    val shard = (1 to hexDigits)
      .map(d => (instr(alphabet, substring(col("__k"), d, 1)) - 1) *
        lit(math.pow(16, hexDigits - d).toInt))
      .reduce(_ + _).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
    df.withColumn("__k", md5(col(idCol).cast("string")))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("__k")
  }

  /** CORPUS-GLOBAL segment-level exact dedup — the C4 cleanup step
    * that keeps only the FIRST occurrence of any duplicated span
    * across the whole corpus (C4 uses three-sentence spans; here the
    * unit is the same non-overlapping `segLen`-token segment as
    * removeBoilerplate, whose per-SOURCE frequency rule this
    * complements with a global first-wins rule). "First" is the
    * smallest (idCol, segment index) — a total order, so the kept
    * instance is unique and rerun-stable. Returns one row per
    * document with ≥ segLen tokens: (idCol, n_seg, n_removed,
    * kept_tokens).
    *
    * Shape at scale — every stage is skew-safe, and there is no
    * segment-keyed JOIN at all, let alone a segment-partitioned
    * window (a viral span — boilerplate, a chain letter — can appear
    * in millions of documents; a window must sort all its instances
    * in ONE task, and even a join-back puts the hot key through a
    * single build side). The identity that removes both: a document's
    * removed count is its total instances minus the number of
    * segments it WON, so nothing downstream of the winner aggregate
    * ever keys by segment — (1) the per-segment winner is ONE
    * min-struct aggregate straight over the exploded instances
    * (min is partial-aggregable: map-side combine collapses each
    * task to one row per segment, bounding hot segments before the
    * only seg-keyed exchange); (2) winners count up per winning
    * document (bounded by that document's own length); (3) the
    * doc-keyed win counts left-join per-document stats that are
    * plain arithmetic on the tokenized base — n_seg and n_tok are
    * per-row values, never an aggregate over the exploded relation.
    * Counts are arithmetic (each removed instance drops exactly
    * segLen tokens), so stats-only callers never rebuild text. */
  def dedupSegmentsGlobal(df: DataFrame, idCol: String, textCol: String,
      segLen: Int = 3): DataFrame = {
    val n = segLen
    val base = Scale.spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("tok"))
      .filter(size(col("tok")) >= n)
      .withColumn("n_seg", (size(col("tok")) / n).cast("int"))
    val inst = base
      .select(col(idCol), col("tok"),
        explode(sequence(lit(0), col("n_seg") - 1)).as("seg_i"))
      .select(col(idCol), col("seg_i"),
        concat_ws(" ",
          (0 until n).map(o => col("tok")(col("seg_i") * n + o)): _*).as("seg"))
    // The winner aggregate runs DIRECTLY on the exploded instances:
    // min(struct(id, seg_i)) per segment is partial-aggregable, so the
    // map-side combine collapses each task's instances to ONE row per
    // segment before the (only) seg-keyed exchange — a strictly
    // stronger reduction than the former per-(seg, doc) pre-reduce,
    // whose extra exploded-scale shuffle and localCheckpoint this
    // replaces (r8 floor attribution: that chain was the whole cost).
    // Struct min orders by id first, then seg_i — identical winners.
    val wins = inst.groupBy(col("seg"))
      .agg(min(struct(col(idCol), col("seg_i"))).as("w"))
      .groupBy(col("w")(idCol).as(idCol))
      .agg(count(lit(1)).as("won"))
    // A document's instance total IS its n_seg (inst emits exactly one
    // row per seg_i in [0, n_seg)), and its stats are per-row
    // arithmetic on the tokenized base — never an aggregate over the
    // exploded relation: removed = n_seg − segments won
    val stats = base.select(col(idCol), col("n_seg").cast("long").as("n_seg"),
      size(col("tok")).as("n_tok"))
    stats.join(wins, Seq(idCol), "left_outer")
      .withColumn("won", coalesce(col("won"), lit(0L)))
      .select(col(idCol), col("n_seg"),
        (col("n_seg") - col("won")).as("n_removed"),
        (col("n_tok") - lit(n) * (col("n_seg") - col("won"))).cast("long")
          .as("kept_tokens"))
  }

  /** Iterative BPE trainer — the merge LOOP that a single-round pair
    * count (p35) is one step of: `rounds` successive
    * count-best-pair → apply-merge passes over the word-frequency
    * dictionary, returning the merge table
    * (merge_round, l_sym, r_sym, n).
    *
    * Representation: each dictionary word is a sentinel-delimited
    * symbol string (U+0001 between and around symbols: word "ab" is
    * &lt;S&gt;a&lt;S&gt;b&lt;S&gt;), so applying a merge of (l, r) is ONE
    * non-overlapping left-to-right string replace of &lt;S&gt;l&lt;S&gt;r&lt;S&gt;
    * with &lt;S&gt;lr&lt;S&gt; — the sentinel boundaries make a false match
    * across symbol edges impossible, and the expression is one every
    * engine evaluates identically (the oracle replays the same rounds
    * in SQL, same replace semantics). For l ≠ r this IS the classic
    * trainer's greedy in-word order (matches are never adjacent, so
    * restart-after-replacement changes nothing); for a same-symbol
    * merge (l == r) over an in-word run of ≥ 3 — "aaa" under (a,a) —
    * the replace consumes the shared boundary and the run merges as
    * [aa, a, a, ...] instead of strict-greedy [aa, aa, ...]: a
    * documented, deterministic variant, pinned by the unit test.
    *
    * Shape at scale: the corpus is touched ONCE (the word-frequency
    * aggregate, map-side combined); every round after that runs on
    * the vocabulary-bounded dict — pair counting is a vocab-bounded
    * aggregate, the argmax is a 1-row TakeOrdered (the only
    * driver-side value; BPE's merge decision is inherently
    * sequential), the merge application is a map. The dict
    * localCheckpoints per round to cut the growing lineage; the
    * driver holds only the merge table, one row per round. */
  def trainBpeMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val s = df.sparkSession
    val S = "\u0001"
    var dict = Scale.spread(df.select(col(textCol)))
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(concat(lit(S), concat_ws(S, split(col("w"), "")), lit(S)).as("sym"),
        col("f"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val best = dict
        .select(col("f"), filter(split(col("sym"), S), x => x =!= "").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("f"),
          explode(sequence(lit(0), size(col("s")) - 2)).as("i"), col("s"))
        .select(element_at(col("s"), col("i") + 1).as("l"),
          element_at(col("s"), col("i") + 2).as("r"), col("f"))
        .groupBy(col("l"), col("r")).agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .head(1)
      if (best.isEmpty) exhausted = true // dict fully merged early
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, n))
        dict = dict
          .select(replace(col("sym"), lit(S + l + S + r + S), lit(S + l + r + S))
            .as("sym"), col("f"))
          .localCheckpoint()
        round += 1
      }
    }
    import s.implicits._
    merges.toSeq.toDF("merge_round", "l_sym", "r_sym", "n")
      .select(col("merge_round").cast("int").as("merge_round"),
        col("l_sym"), col("r_sym"), col("n"))
      .orderBy(col("merge_round"))
  }

  /** Overlapping fixed-window chunking — the retrieval-corpus prep
    * step (RAG indexing, embedding-model input shaping) that slices
    * each document's token stream into `window`-token chunks every
    * `stride` tokens (overlap = window − stride keeps context across
    * boundaries). Chunk starts are 0, stride, 2·stride, …; the last
    * chunk begins at the last start < n_tok − window + stride and may
    * be short. Emits one row per chunk: (idCol, chunk_i, start_tok,
    * n_tok chunk length, fp = md5 of the chunk text) — the
    * fingerprint is what a downstream chunk-dedup or index join keys
    * on, md5 because every engine computes the identical digest.
    *
    * Pure map-side row expansion (explode of per-doc arithmetic) — no
    * shuffle at any scale; expansion factor ≈ n_tok/stride rows per
    * document, each row narrow. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && window >= stride,
      "need window >= stride >= 1 (overlap = window - stride)")
    val extra = floor((col("n_tok") - lit(window - stride + 1))
      .cast("double") / lit(stride)).cast("int")
    // whitespace-only text must emit NO chunk: split(trim("")) yields
    // [""], which would otherwise count as one token and fingerprint
    // an empty chunk into the feed
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("tok"))
      .withColumn("n_tok", size(col("tok")))
      .withColumn("n_extra",
        when(col("n_tok") <= window, lit(0)).otherwise(extra))
      .select(col(idCol), col("tok"), col("n_tok"),
        explode(sequence(lit(0), col("n_extra"))).as("chunk_i"))
      .withColumn("start_tok", col("chunk_i") * stride)
      .withColumn("len", least(lit(window), col("n_tok") - col("start_tok")))
      .select(col(idCol), col("chunk_i"), col("start_tok"),
        col("len").cast("long").as("n_tok"),
        md5(concat_ws(" ",
          slice(col("tok"), col("start_tok") + 1, col("len")))).as("fp"))
  }

  /** Within-document repeated-segment trimming (the Gopher-style
    * repetition cleanup as a TRANSFORM): drop every repeat of an
    * already-seen `segTokens`-token segment inside the same document,
    * keeping first occurrences in order; `outCol` gets the trimmed
    * text. One codegen'd regex pass builds the segment array (no
    * higher-order-function lambda — their bodies evaluate interpreted
    * per element, measured 4.8× slower at sf10) and the keep-first
    * dedup is Spark's order-preserving `array_distinct` — O(n) per
    * document, so a monster document can't become a quadratic hot
    * row. Pure map-side; no shuffle at any scale. */
  def trimRepeatedSegments(df: DataFrame, textCol: String, outCol: String,
      segTokens: Int = 2): DataFrame = {
    require(segTokens >= 1, "segTokens must be >= 1")
    val one = "[^ ]+"
    val seg = (1 to segTokens).map(_ => one).mkString(" ")
    // alternation tries longest first, so the tail shorter-than-full
    // segment still matches: "a b|a" over "x y z" -> ["x y", "z"]
    val pat = (segTokens to 1 by -1).map(k => (1 to k).map(_ => one).mkString(" "))
      .mkString("|")
    df.withColumn(outCol, array_join(array_distinct(regexp_extract_all(
      regexp_replace(trim(col(textCol)), lit("\\s+"), lit(" ")),
      lit(pat), lit(0))), " "))
  }

  /** Per-group KMV distinct sketch of `segTokens`-token shingle hashes:
    * one corpus pass, ≤ k longs of state per group at any corpus size
    * (functions.KmvMinima — partial buffers map-side, the one exchange
    * carries groups·k longs). Returns (groupCol, mins array<bigint>
    * ascending, n_instances); estimate distinct as
    * `(k-1) * 2^60 / mins.last` when the buffer is full, else
    * `mins.size` exactly. Sketches of disjoint shards merge exactly —
    * store them and combine later without re-touching the data.
    * Merge contract: re-aggregate with `kmv_minima(mins, kg)` only at
    * `kg <= k` — this sketch keeps the k smallest per group, so a
    * larger downstream k would be silently approximate (see the
    * `KmvMinima` scaladoc's `k(doc) >= k(group)` precondition). */
  def shingleSketch(df: DataFrame, groupCol: String, textCol: String,
      k: Int = 256, segTokens: Int = 5): DataFrame = {
    graft.functions.KmvFunctions.register(df.sparkSession)
    import graft.functions.KmvFunctions.{kmv_minima, shingle_kmv}
    Scale.spread(df.select(col(groupCol), col(textCol)))
      .select(col(groupCol), split(trim(col(textCol)), "\\s+").as("tok"))
      .filter(size(col("tok")) >= segTokens)
      // one codegen'd pass per document: every n-token window hashed
      // (60-bit md5-hex-prefix recipe, bit-identical to the oracle's
      // conv(substr(md5(shingle),1,15),16,10)) and reduced to ≤ k
      // distinct minima INSIDE the projection — no explode, no
      // per-shingle string, no per-shingle row (the former exploded
      // chain materialized ~3.5M rows at sf0.1 before the aggregate
      // could discard them). n_instances = windows per document,
      // plain arithmetic.
      .select(col(groupCol),
        shingle_kmv(col("tok"), segTokens, k).as("doc_mins"),
        (size(col("tok")) - segTokens + 1).cast("long").as("n_inst"))
      .groupBy(col(groupCol))
      .agg(kmv_minima(col("doc_mins"), k).as("mins"),
        sum(col("n_inst")).as("n_instances"))
  }

  /** Exact cross-document substring dedup at `w`-token granularity —
    * the Lee et al. 2022 class ("Deduplicating Training Data Makes
    * Language Models Better"): remove every occurrence but the first
    * of any w-token span appearing more than once ANYWHERE in the
    * corpus (across documents or within one), at arbitrary token
    * boundaries. p32 dedups fixed non-overlapping segments and p26
    * only measures n-gram dup rate; this removes arbitrary-boundary
    * repeated spans, the suffix-array method's guarantee expressed at
    * w granularity (every duplicated span of length >= w contains a
    * duplicated aligned w-window at each offset, so removing covered
    * tokens removes the span).
    *
    * Scale shape — sorted fingerprint runs, never a corpus² join:
    *  1. one codegen'd pass per document computes ALL window hashes
    *     (`shingle_hashes`) — the exploded relation is (id, start, fp)
    *     triples of longs, no shingle string ever materializes;
    *  2. the winner resolution is ONE fp-keyed aggregate
    *     (count + min(struct(id, start)) — both partial map-side, so a
    *     boilerplate span repeated in half the corpus folds before the
    *     exchange);
    *  3. occurrences join back on fp (equi-join, AQE-broadcastable
    *     when the dup relation is small) and non-winners become
    *     per-document sorted remove lists (bounded by document
    *     length);
    *  4. `remove_spans` drops covered tokens in one merged two-pointer
    *     pass per document — overlap-safe, O(n + removes).
    *
    * Returns (idCol, n_tok, n_removed, kept_tok array<string>). */
  def dedupSubstringsGlobal(df: DataFrame, idCol: String, textCol: String,
      w: Int = 20): DataFrame = {
    val s = df.sparkSession
    graft.functions.SubstringDedupFunctions.register(s)
    import graft.functions.SubstringDedupFunctions.{remove_spans, shingle_hashes}
    val toks = Scale.spread(df.select(col(idCol), col(textCol)))
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("tok"))
    val wins = toks
      .select(col(idCol), posexplode(shingle_hashes(col("tok"), w)).as(Seq("pos", "fp")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("start"), col("fp"))
    val dupFirst = wins.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col(idCol), col("start"))).as("first_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("fp"), col("first_occ"))
    val removes = wins.join(dupFirst, "fp")
      .filter(!(col(idCol) === col(s"first_occ.$idCol") &&
        col("start") === col("first_occ.start")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("start"))).as("starts"))
    toks.join(removes, Seq(idCol), "left")
      .select(col(idCol),
        size(col("tok")).cast("long").as("n_tok"),
        remove_spans(col("tok"),
          coalesce(col("starts"), array().cast("array<long>")), w).as("kept_tok"))
      .select(col(idCol), col("n_tok"),
        (col("n_tok") - size(col("kept_tok"))).cast("long").as("n_removed"),
        col("kept_tok"))
  }

  /** Content-defined chunking (the FastCDC/rsync family at token
    * granularity): a chunk boundary falls after token position e
    * (e ≥ w) whenever the fingerprint of the w-token window ENDING at
    * e hits the mask (fp % mask == 0) — so an insertion or deletion
    * re-chunks only its neighborhood and identical downstream content
    * re-aligns, which fixed-window chunking can never do. Documents
    * shorter than w are one chunk. Returns one row per chunk:
    * (idCol, idx, c_len, c_fp) where c_fp = md5 of the space-joined
    * chunk tokens. Pure map-side per-document array work — the only
    * post-chunk rows are the chunks themselves. */
  def cdcChunks(df: DataFrame, idCol: String, tokCol: String,
      w: Int = 8, mask: Int = 16): DataFrame = {
    require(w >= 1 && mask >= 1, s"cdcChunks: w=$w mask=$mask")
    graft.functions.SubstringDedupFunctions.register(df.sparkSession)
    import graft.functions.SubstringDedupFunctions.shingle_hashes
    val withCuts = df.withColumn("cuts",
      when(size(col(tokCol)) >= w,
        filter(zip_with(
          shingle_hashes(col(tokCol), w),
          sequence(lit(w), size(col(tokCol))),
          (f, e) => when(pmod(f, lit(mask)) === 0, e)),
          x => x.isNotNull))
        .otherwise(array().cast("array<int>")))
    withCuts
      .withColumn("bounds", zip_with(
        concat(array(lit(0)), col("cuts")),
        concat(col("cuts"), array(size(col(tokCol)))),
        (st, en) => struct(st.as("s"), en.as("e"))))
      // posexplode_OUTER: the inner form makes the optimizer infer a
      // `size(bounds) > 0 AND bounds IS NOT NULL` input filter and push
      // it through the spread exchange to the SCAN — re-evaluating the
      // whole tokenize + rolling-fingerprint cut chain per document on
      // the scan task (single-threaded on one-row-group files, double
      // CPU anywhere). The filter is vacuous: bounds is non-null with
      // ≥ 1 element by construction (zip_with of two 1+|cuts| arrays),
      // and the outer form's null row can never appear — the existing
      // e > s chunk filter would drop it anyway. r16 measured the
      // inferred filter at ~0.6 s of single-task scan time at sf0.1.
      .select(col(idCol), col(tokCol), posexplode_outer(col("bounds")).as(Seq("idx", "b")))
      .filter(col("b.e") > col("b.s"))
      .select(col(idCol), col("idx"),
        (col("b.e") - col("b.s")).cast("long").as("c_len"),
        md5(concat_ws(" ",
          slice(col(tokCol), col("b.s") + 1, col("b.e") - col("b.s")))).as("c_fp"))
  }

  /** Exact merge of stored KMV sketches (one row per (shard, group),
    * e.g. `shingleSketch` outputs unioned across shards, round-tripped
    * through parquet): the k smallest distinct values of the union of
    * per-shard minima IS the sketch of the concatenated stream — the
    * property that makes per-shard sketches a storable index. Plain
    * built-ins (shards-per-group is bounded, so the collected list is
    * small); `n_instances` sums.
    *
    * `sketchK` is the k the STORED sketches were built with
    * (`shingleSketch`'s k): merging at k > sketchK would silently
    * yield an approximate, non-KMV result (the stored shards already
    * discarded values a wider merge would need), so the statically
    * known composition is enforced here — the ad-hoc SQL path keeps
    * the documented `k(doc) >= k(group)` precondition. */
  def mergeSketches(sketches: DataFrame, groupCol: String, k: Int = 256,
      sketchK: Int = 256): DataFrame = {
    require(k <= sketchK,
      s"mergeSketches: merge k=$k exceeds the stored sketches' k=$sketchK — " +
        "the shards already discarded the values a wider merge would need")
    sketches.groupBy(col(groupCol))
      .agg(
        slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))), 1, k)
          .as("mins"),
        sum(col("n_instances")).as("n_instances"))
  }
}
