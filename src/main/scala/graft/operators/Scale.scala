package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** Scale-out join strategies: bucketed co-located joins (no shuffle at
  * read time) and salted joins for skewed keys.
  *
  * These are the two levers the engine reaches for when a fact-fact
  * join at 100 TB would otherwise shuffle both sides or stall on a hot
  * key — AQE's skew-join split handles moderate skew automatically;
  * salting is the explicit fallback for pathological keys.
  */
object Scale {

  /** Write both sides bucketed by the join key so subsequent joins are
    * co-located: Spark reads each bucket pair without an Exchange.
    * Bucket count is the scale knob — at cluster scale it matches the
    * target parallelism (e.g. 4× executors), here it stays small. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With identical
    * bucket counts Spark plans a SortMergeJoin with NO Exchange on
    * either side (verify with .explain — the test asserts it). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted join for a skewed build side: replicate each `right` row
    * `saltBuckets` times, spread `left` rows across salts by a
    * deterministic hash of the whole row, and join on (key, salt).
    * The hot key's rows land in `saltBuckets` different partitions
    * instead of one. Correctness: every left row matches exactly one
    * replica of each right row with its key. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(saltBuckets)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    // explicit (key, salt) exchanges: if a caller hands in a side
    // already partitioned by the bare key, subset-key co-partition
    // acceptance (the bench session setting) would otherwise reuse that
    // partitioning and put the hot key back into one task
    salted.repartition(col(key), col("_salt"))
      .join(replicated.repartition(col(key), col("_salt")), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Estimate how many partitions executing `df` would plan, WITHOUT
    * physically planning it. The `.rdd` probe this replaces plans the
    * whole query a second time (and for connector sources even opens a
    * scan lease that lingers until the cleaner fires). This walks only
    * the optimized LOGICAL plan: an explicit repartition pins the
    * count, a shuffle-introducing operator yields
    * `spark.sql.shuffle.partitions`, and a leaf contributes its stats
    * size over `files.maxPartitionBytes` — the same ratio the file
    * bin-packer uses. The under-split guards only need "would this
    * plan with fewer splits than cores"; an estimate that errs large
    * skips the spread repartition, which is exactly right at real
    * scale where sources already carry >cores splits. */
  def estimatedSplits(df: DataFrame): Int = {
    val conf = df.sparkSession.sessionState.conf
    val maxBytes = math.max(1L, conf.filesMaxPartitionBytes)
    val shufflePartitions = math.max(1, conf.numShufflePartitions)
    val broadcastThreshold = conf.autoBroadcastJoinThreshold
    def clamp(est: BigInt): Int =
      if (est > Int.MaxValue) Int.MaxValue else math.max(1, est.toInt)
    def walk(p: LogicalPlan): Int = p match {
      case r: Repartition => r.numPartitions
      case r: RepartitionByExpression =>
        r.optNumPartitions.getOrElse(shufflePartitions)
      case u: Union =>
        // a union concatenates its children's partitions
        clamp(u.children.map(c => BigInt(walk(c))).sum)
      case j: Join =>
        // a side small enough to broadcast doesn't shuffle — the join
        // inherits the probe side's partitioning
        if (broadcastThreshold > 0 && j.right.stats.sizeInBytes <= broadcastThreshold)
          walk(j.left)
        else if (broadcastThreshold > 0 && j.left.stats.sizeInBytes <= broadcastThreshold)
          walk(j.right)
        else shufflePartitions
      case _: Aggregate | _: Sort | _: Window => shufflePartitions
      case l: LeafNode =>
        val size = l.stats.sizeInBytes
        // DataSourceV2 reports spark.sql.defaultSizeInBytes
        // (Long.MaxValue unless tuned) when the source returned no
        // statistics — e.g. the Postgres scan on a relpages=0 table
        // before its first ANALYZE. That is "unknown", not "huge":
        // treat it as a single split so the under-split guards spread;
        // callers with real knowledge pass sourceSplits explicitly.
        if (size >= BigInt(conf.defaultSizeInBytes)) 1
        else clamp(size / maxBytes + 1)
      case other => other.children.map(walk).foldLeft(1)(math.max)
    }
    walk(df.queryExecution.optimizedPlan)
  }

  /** Under-split guard, the single shared policy: if `df` would plan
    * with fewer splits than the cores (capped), repartition it so the
    * compute ABOVE the guard runs across the cluster instead of the
    * lone scan task of a single-row-group (or unsplittable) source.
    * No-op on any well-split source, decided from logical stats only
    * (see [[estimatedSplits]] — no extra job, no second planning).
    * The 16 cap is measured, not arbitrary: on the 32-core test box,
    * spreading the guarded entries 32-way is a wash-to-regression
    * (p12 0.70 s either way, p14 0.58 → 0.74 s — per-task overhead
    * outgrows the extra cores at test-data sizes); callers with
    * genuinely heavier per-row work can raise it. */
  def spread(df: DataFrame, cap: Int = 16): DataFrame =
    spread(df, cap, None)

  /** [[spread]] with a caller-supplied split count: a caller that
    * already spread an upstream relation passes the count it produced
    * so the guard doesn't re-estimate (and re-trigger) on the
    * repartitioned child. The shared policy lives HERE — TextDedup's
    * candidate/verify guards route through this overload. */
  def spread(df: DataFrame, cap: Int, sourceSplits: Option[Int]): DataFrame = {
    val par = math.min(df.sparkSession.sparkContext.defaultParallelism, cap)
    val splits = sourceSplits.getOrElse(estimatedSplits(df))
    if (splits < par) df.repartition(par) else df
  }

  /** [[spread]] keyed on the columns a following aggregation groups
    * by: the under-split case exchanges raw rows ONCE by the grouping
    * key (the aggregate then needs no further shuffle) instead of
    * partial-aggregating on the lone scan task. The partition count is
    * pinned (user-specified counts are AQE-coalesce-exempt), so the
    * aggregate genuinely runs `par`-way. */
  def spreadByKey(df: DataFrame, keys: Seq[Column], cap: Int = 16): DataFrame = {
    val par = math.min(df.sparkSession.sparkContext.defaultParallelism, cap)
    if (estimatedSplits(df) < par) df.repartition(par, keys: _*) else df
  }
}
