package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd's k-means over an embedding column — the missing
  * piece between the IVF query path (Ann / s03, which probes cells) and
  * a real index build (which must TRAIN the cells). The reference has
  * no clustering (it delegates all compute to its host engine); this is
  * a beyond-parity pipeline operator in the spirit of SURVEY §7.5.
  *
  * Declarative, fixed-iteration Lloyd's:
  *
  *   - assignment: corpus ⨯ broadcast(centroids) → per-vector argmin of
  *     squared L2 distance. The distance fold is a sequential
  *     left-to-right `acc += (x_i − c_i)²` (the codegen'd `vec_dist_sq`
  *     expression — functions/VectorExpressions), the
  *     argmin a map-side bounded heap (topk_by, k=1) — so the exchange
  *     carries one narrow (id, cid) row per vector, never the
  *     embedding. Ties break toward the smaller centroid id.
  *   - update: element-wise mean per cluster via posexplode →
  *     groupBy(cid, pos). Float components are summed through an exact
  *     DECIMAL(38,9) accumulator and divided by the count as a final
  *     double op, so the new centroids are IDENTICAL under any
  *     partitioning or row order — which is what makes a k-means
  *     assignment hash-comparable against a single-node oracle at all.
  *
  * Scale shape (1000 executors, 10⁹ vectors): centroids are k·dim
  * doubles — broadcast, never shuffled. Each iteration is one narrow
  * shuffle of (cid, pos, x) triples for the update and none for the
  * assignment. Iteration count is a fixed small constant (training
  * curves flatten fast; IVF only needs rough Voronoi cells), so the
  * whole build is O(iters) narrow shuffles over the corpus. No
  * driver-side collect anywhere — centroids stay a (tiny) DataFrame.
  */
object Kmeans {

  /** Sequential-fold squared L2 distance between a (float or double)
    * vector column and a double centroid column — the codegen'd
    * `vec_dist_sq` expression (identical arithmetic to the
    * `aggregate(zip_with(...))` fold it replaces, but no interpreted
    * lambdas or per-pair intermediate arrays across the |corpus|·k
    * assignment evaluations). Callers must have run
    * `VectorFunctions.register` (assign() does). */
  def distSq(v: Column, c: Column): Column =
    graft.functions.VectorFunctions.vec_dist_sq(v, c)

  /** Nearest-centroid assignment: (idCol, cid) one row per corpus row.
    * `centroids`: (cid, centroid array<double>) — small, broadcast. */
  def assign(
      corpus: DataFrame, // (idCol, vecCol)
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    graft.functions.TopKFunctions.register(corpus.sparkSession)
    import graft.functions.TopKFunctions.topk_by
    corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col("cid"), distSq(col(vecCol), col("centroid")).as("d2"))
      // topk_by keeps the max score, ties to the smaller id: negating
      // d2 yields argmin with ties to the smaller cid — one narrow row
      // per vector leaves each map partition.
      .groupBy(col(idCol))
      .agg(topk_by(-col("d2"), col("cid"), 1).as("best"))
      .select(col(idCol),
        element_at(col("best"), 1).getField("id").as("cid"),
        (-element_at(col("best"), 1).getField("score")).as("d2"))
  }

  /** Element-wise decimal-exact mean per cluster:
    * (cid, centroid array<double>). Drops empty clusters (no rows).
    *
    * One whole-array aggregate (`vec_decimal_sum`), NOT posexplode +
    * groupBy(cid, pos): exploding puts `dim` rows per vector on the
    * shuffle — 768 × 10⁹ rows at production embedding dims — while the
    * aggregate folds vectors into per-group decimal arrays map-side,
    * so the exchange carries one dim-element partial per (cluster,
    * partition) regardless of corpus size.
    *
    * Scale 9 (not more) is deliberate: with unit-magnitude components
    * the unscaled decimal sum stays under 2^53 for clusters up to ~10⁶
    * rows, so BOTH the exact accumulation and the final decimal→double
    * conversion are correctly rounded single steps in any engine — the
    * centroid doubles come out bit-identical to a single-node oracle's.
    * (A wider scale would overflow double's integer range and expose
    * the oracle to the engine's decimal→double double-rounding.) */
  def centroidsOf(
      assigned: DataFrame, // (vecCol, cid)
      vecCol: String): DataFrame = {
    graft.functions.VecSumFunctions.register(assigned.sparkSession)
    import graft.functions.VecSumFunctions.vec_decimal_sum
    assigned
      // the SAME per-element float→decimal(38,9) cast the exploded
      // form applied, so the accumulated values are bit-identical
      .select(col("cid"),
        transform(col(vecCol), x => x.cast(DecimalType(38, 9))).as("dv"))
      .groupBy(col("cid"))
      .agg(vec_decimal_sum(col("dv")).as("sums"), count(col("dv")).as("n"))
      .select(col("cid"),
        transform(col("sums"), s => s.cast("double") / col("n")).as("centroid"))
  }

  /** Run `iters` Lloyd iterations from deterministic seeds (the `k`
    * corpus vectors with the smallest ids) and return the final
    * assignment: (idCol, cid, d2). */
  def trainAssign(
      corpus: DataFrame, // (idCol, vecCol)
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    // fail at the call site, not with a bare NPE in whatever the
    // caller does with a null assignment
    require(iters >= 1, s"trainAssign needs at least one Lloyd iteration (got $iters)")
    require(k >= 1, s"trainAssign needs at least one cluster (got $k)")
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cid"),
        transform(col(vecCol), _.cast("double")).as("centroid"))
    var cents = seeds
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(corpus, idCol, vecCol, cents)
      cents = centroidsOf(assigned.join(corpus, idCol).select(col(vecCol), col("cid")), vecCol)
    }
    assigned
  }
}
