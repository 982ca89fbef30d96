package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType}

import graft.functions.DecimalFastFunctions.UnscaledDecimalSum

/** Opt-in optimizer rule: decimal sums whose inputs are built from
  * DOUBLE→DECIMAL(p≤18) casts run through the spill-guarded long
  * accumulator ([[UnscaledDecimalSum]]) with the unscaled value
  * computed in double arithmetic — no per-row BigDecimal anywhere.
  *
  * This is the engine-level generalization of the battery's
  * per-query adoptions: Catalyst's own `DecimalAggregates` rewrite
  * stops at input precision ≤ 8 (it must reserve 10^10 rows of raw
  * long headroom); the spill-guarded aggregate needs no such
  * headroom, so the rewrite is safe for ANY group cardinality —
  * including the fixed-key / global sums ("Class B" in BENCH_NOTES
  * r15) that could not adopt the raw-long path by contract. It
  * covers both DataFrame plans and plain SQL text (`SUM(CAST(x AS
  * DECIMAL(18,2)))` through the attached catalog), where per-site
  * adoption cannot reach.
  *
  * Rewritten forms (result type always the original Sum's):
  *  - `sum(CAST(d AS DECIMAL(p≤18,s)))`
  *  - sums of +/−/× trees over such casts, same-scale decimal
  *    literals, and widening casts — e.g. the TPC-H revenue form
  *    `sum(CAST(p) × (1.00 − CAST(disc)))`, where the per-row product
  *    happens on unscaled longs.
  *
  * OPT-IN (`spark.graft.fastDoubleDecimalSum`, default false)
  * because it carries the [[graft.functions.DecimalFastFunctions]]
  * value-domain contract, which the engine cannot verify per-row for
  * free: double values carry at most `scale` fractional decimal
  * digits (money-style data — the same contract a DuckDB-checked
  * oracle already imposes, see `unscaled_of_double`), magnitudes stay
  * money-scale (|unscaled per-row term| < 2^60), and totals stay
  * inside the result DECIMAL's capacity (where the built-in sum
  * would null/error instead of wrapping). Distinct sums are left
  * untouched; window sums never match (the rule only visits
  * [[Aggregate]] nodes).
  */
object FastDoubleDecimalSumRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.fastDoubleDecimalSum"

  private def unscaledOfDouble(d: Expression, scale: Int): Expression =
    Floor(Add(Multiply(d, Literal(math.pow(10, scale))), Literal(0.5)))

  /** A DecimalType expression → its unscaled-long equivalent (at the
    * expression's own scale), when the tree is made of double casts,
    * decimal literals, widening casts, and +/−/×. The scale invariant
    * holds by construction: Spark types a same-scale add/subtract at
    * that scale and a multiply at the sum of scales — exactly how
    * unscaled integers compose. */
  private def toUnscaled(e: Expression): Option[Expression] = e match {
    case Cast(d, dt: DecimalType, _, _)
        if d.dataType == DoubleType && dt.precision <= Decimal.MAX_LONG_DIGITS =>
      Some(unscaledOfDouble(d, dt.scale))
    case Cast(inner, dt: DecimalType, _, _)
        if dt.precision <= Decimal.MAX_LONG_DIGITS && sameScale(inner, e) =>
      toUnscaled(inner) // pure widening cast: same unscaled value
    case Literal(v: Decimal, dt: DecimalType)
        if v != null && dt.precision <= Decimal.MAX_LONG_DIGITS =>
      Some(Literal(v.toUnscaledLong))
    case Add(l, r, _) if sameScale(l, r) =>
      for { ul <- toUnscaled(l); ur <- toUnscaled(r) } yield Add(ul, ur)
    case Subtract(l, r, _) if sameScale(l, r) =>
      for { ul <- toUnscaled(l); ur <- toUnscaled(r) } yield Subtract(ul, ur)
    case Multiply(l, r, _)
        if l.dataType.isInstanceOf[DecimalType] && r.dataType.isInstanceOf[DecimalType] =>
      for { ul <- toUnscaled(l); ur <- toUnscaled(r) } yield Multiply(ul, ur)
    case _ => None
  }

  private def sameScale(l: Expression, r: Expression): Boolean = (l.dataType, r.dataType) match {
    case (a: DecimalType, b: DecimalType) => a.scale == b.scale
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transform {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(s @ Sum(c, _), _, false, _, _)
            if c.dataType.isInstanceOf[DecimalType] =>
          toUnscaled(c) match {
            case Some(u) =>
              val dt = s.dataType.asInstanceOf[DecimalType]
              ae.copy(aggregateFunction = UnscaledDecimalSum(u, dt.precision, dt.scale))
            case None => ae
          }
      }
    }

  /** Ad-hoc installation (the `register(spark)` analogue): adds the
    * rule to the session's experimental optimizations once and turns
    * the gate on. Cluster deployments get the same rule from
    * [[graft.GraftExtensions]] and enable it per-session via conf. */
  def install(spark: SparkSession): Unit = {
    val xs = spark.experimental.extraOptimizations
    if (!xs.contains(FastDoubleDecimalSumRule)) {
      spark.experimental.extraOptimizations = xs :+ (FastDoubleDecimalSumRule: Rule[LogicalPlan])
    }
    spark.conf.set(ConfKey, "true")
  }
}
