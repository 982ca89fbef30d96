package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A/B lab for the unigram-LM chain at scale: the shipped form
  * pre-aggregates to (doc, token, c) and localCheckpoints that
  * relation for its two consumers (the p20 lesson, measured best at
  * sf0.1); the alternative never materializes it — the LM table
  * aggregates straight off the exploded stream, the scoring pass
  * re-tokenizes and sums the broadcast corpus count PER INSTANCE
  * (sum_t tf·cnt == per-instance sum of cnt). Identical math, very
  * different movement: (a) writes |docs|·|distinct tokens per doc|
  * checkpoint rows; (b) tokenizes twice but only ever shuffles
  * vocabulary-sized relations.
  *
  * Usage: runMain graft.examples.LmLab [sfDir]
  */
object LmLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tokens = split(trim(col("text")), "\\s+")

    def docs: DataFrame = graft.operators.Scale.spread(
      graft.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")))

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def shipped: DataFrame =
      graft.operators.TextOps
        .unigramLmScores(docs.select(col("doc_id"), tokens.as("tok")), "doc_id", "tok")
        .select(col("doc_id"), col("n_tokens"), round(col("mean_lik"), 9).as("ml"))

    def instanceSum: DataFrame = {
      val inst = docs.select(col("doc_id"), explode(tokens).as("__token"))
      val lm = inst.groupBy(col("__token")).agg(count(lit(1)).as("__cnt"))
      val total = lm.agg(sum(col("__cnt")).as("__n_corpus"))
      inst.join(broadcast(lm), "__token")
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"), col("__n_corpus"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("__cnt").cast(DecimalType(38, 0))).as("__wsum"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("__wsum").cast("double") / col("n_tokens") / col("__n_corpus"), 9)
            .as("ml"))
    }

    // (c) both signals (mean_lik + rare_rate), still no checkpoint:
    // the LM table takes the two-level (token, doc) aggregate for df,
    // scoring stays per-instance against the broadcast table
    def instanceSumBoth: DataFrame = {
      val inst = docs.select(col("doc_id"), explode(tokens).as("__token"))
      val lm = inst.groupBy(col("__token"), col("doc_id"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("__token"))
        .agg(sum(col("__c")).as("__cnt"), count(lit(1)).as("__df"))
      val total = lm.agg(sum(col("__cnt")).as("__n_corpus"))
      inst.join(broadcast(lm), "__token")
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"), col("__n_corpus"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("__cnt").cast(DecimalType(38, 0))).as("__wsum"),
          sum(when(col("__df") < 3, 1L).otherwise(0L)).as("__nr"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("__wsum").cast("double") / col("n_tokens") / col("__n_corpus"), 9)
            .as("ml"),
          round(col("__nr").cast("double") / col("n_tokens"), 6).as("rr"))
    }

    // one variant per JVM (arg 2: a | b | c; default all): the
    // checkpointed form leaves its blocks resident for the session,
    // so in-process comparison is confounded — run each isolated,
    // two rounds, second is the comparison
    val variants: Seq[(String, () => DataFrame)] = (args.lift(1) match {
      case Some("a") | None => Seq("checkpointed-tf" -> (() => shipped))
      case _ => Nil
    }) ++ (args.lift(1) match {
      case Some("b") | None => Seq("instance-sum" -> (() => instanceSum))
      case _ => Nil
    }) ++ (args.lift(1) match {
      case Some("c") | None => Seq("instance-both" -> (() => instanceSumBoth))
      case _ => Nil
    })
    for (round <- 1 to 2; (label, mk) <- variants)
      time(s"$label r$round")(mk())
    spark.stop()
  }
}
