package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, MakeDecimal, UnaryExpression, UnscaledValue}
import org.apache.spark.sql.functions.{call_function, lit, sum}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, IntegerType, LongType}

/** Long-path decimal aggregation.
  *
  * `sum(CAST(x AS DECIMAL(18,2)))` produces DECIMAL(28,2) — past
  * Spark's compact-long range (18 digits), so every hash-aggregate
  * update runs java.math.BigDecimal arithmetic: at a 60M-row fact scan
  * that is the whole query wall (the q68/c65 shape). Summing the
  * UNSCALED long instead keeps the accumulator a primitive long —
  * the same single-codegen'd-add the engine uses for bigint — and
  * rebuilds the decimal once per GROUP via [[MakeDecimal]]. This is
  * Catalyst's own `DecimalAggregates` rewrite, which only fires for
  * input precision ≤ 8 (it reserves 10^10 rows of headroom); these
  * helpers let a query opt in when it can argue the real bound.
  *
  * EXACTNESS: integer arithmetic, bit-identical to the decimal sum —
  * PROVIDED no group's Σ|unscaled(x)| reaches 2^63 (a long sum wraps
  * silently). At scale 2 that is a per-group value sum of 9.2×10^16:
  * money columns (≤10^7 unscaled per row) stay exact to ~10^11 rows
  * per group, far past any per-key fact cardinality, but NOT safe for
  * a global (group-less) sum at 100 TB — keep those on the decimal
  * path. The input-precision half of the contract is ENFORCED: the
  * scan-side expression rejects DECIMAL(p>18) at analysis time (a
  * non-compact input's unscaled value does not fit a long at all).
  */
object DecimalFastFunctions {

  /** [[UnscaledValue]] restricted to compact decimals: DECIMAL(p≤18)
    * is stored as an unscaled long, so `toUnscaledLong` is exact; for
    * p>18 the unscaled value itself can exceed 2^63 and the cast would
    * silently truncate — so this fails at ANALYSIS time instead.
    * Same runtime/codegen as Catalyst's own expression. */
  case class CompactUnscaledValue(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "unscaled_value"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
        TypeCheckResult.TypeCheckSuccess
      case d: DecimalType => TypeCheckResult.TypeCheckFailure(
        s"unscaled_value requires a compact decimal (precision <= " +
          s"${Decimal.MAX_LONG_DIGITS}) whose unscaled value fits a long; " +
          s"got ${d.catalogString}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"unscaled_value requires decimal, got ${other.catalogString}")
    }

    override protected def nullSafeEval(input: Any): Any =
      input.asInstanceOf[Decimal].toUnscaledLong

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$c.toUnscaledLong()")

    override protected def withNewChildInternal(c: Expression): CompactUnscaledValue =
      copy(child = c)
  }

  val unscaledBuilder: Seq[Expression] => Expression = {
    case Seq(c) => CompactUnscaledValue(c)
    case _ => throw new IllegalArgumentException("unscaled_value(decimal)")
  }

  val makeDecimalBuilder: Seq[Expression] => Expression = {
    case Seq(c, Literal(p: Int, IntegerType), Literal(s: Int, IntegerType)) =>
      MakeDecimal(c, p, s)
    case _ => throw new IllegalArgumentException(
      "make_decimal(unscaled bigint, precision int literal, scale int literal)")
  }

  /** The overflow contract, carried on the registered functions
    * themselves (`DESCRIBE FUNCTION`) — a general SQL caller cannot be
    * assumed to have read this file's scaladoc. */
  private val contractNote =
    "OVERFLOW CONTRACT: sum(unscaled_value(x)) accumulates a raw long " +
      "and WRAPS SILENTLY past 2^63 where sum(x) would null/error; the " +
      "caller must bound each group's sum of |unscaled(x)| below 2^63 " +
      "(safe for per-key money sums, NOT for global sums over unbounded " +
      "data). unscaled_value rejects DECIMAL(p>18) inputs at analysis time."

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[CompactUnscaledValue].getName, null, name,
      s"$usage $contractNote", "")

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("unscaled_value"),
      info("unscaled_value",
        "unscaled_value(d) - the unscaled long of a compact decimal " +
          "(precision <= 18), for primitive-long aggregation."),
      unscaledBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("make_decimal"),
      info("make_decimal",
        "make_decimal(l, p, s) - rebuild DECIMAL(p, s) from an unscaled " +
          "long (the inverse of unscaled_value, applied per group after " +
          "the sum)."),
      makeDecimalBuilder)
  }

  def unscaled_value(c: Column): Column = call_function("unscaled_value", c)

  def make_decimal(c: Column, precision: Int, scale: Int): Column =
    call_function("make_decimal", c, lit(precision), lit(scale))

  /** `sum` over a compact DECIMAL column through a primitive-long
    * accumulator (see object scaladoc for the exactness bound the
    * caller owns). Result matches `sum(c)` on a DECIMAL(18,s) input:
    * DECIMAL(28,s). Non-compact inputs (precision > 18) fail at
    * analysis time via [[CompactUnscaledValue]]. */
  def sum_unscaled(c: Column, scale: Int): Column =
    make_decimal(sum(unscaled_value(c)), 28, scale)

  /** The battery's `dsum` through the long path: same double as
    * `sum(c).cast("double")` for DECIMAL(18,2) input (exact integer
    * sum → identical decimal → identical double). */
  def dsum_unscaled(c: Column): Column = sum_unscaled(c, 2).cast("double")

  /** The TPC-H revenue aggregate `sum(price × (1 − disc))` through a
    * primitive-long accumulator. On the decimal path the product is
    * DECIMAL(18,2) × DECIMAL(19,2) → DECIMAL(38,4): non-compact before
    * the sum even starts, so every fact row pays a BigDecimal multiply
    * AND a BigDecimal add. Here both factors' unscaled longs multiply
    * exactly (scale 2 + scale 2 → scale 4; `1.00` is unscaled 100) and
    * the decimal is rebuilt once per group as the same DECIMAL(38,4).
    *
    * Caller owns the group bound: per-row |unscaled| ≤ max-price×100
    * unscaled (TPC-H: ~1.1×10^7) × 100 ≈ 10^9, so Σ stays under 2^63
    * to ~10^9 rows per group — fine for scale-invariant per-key
    * groups (lines-per-part, lines-per-customer), NOT for
    * fixed-cardinality keys whose groups grow with the data. */
  def sum_unscaled_revenue(price: Column, disc: Column): Column =
    make_decimal(
      sum(unscaled_value(price) * (lit(100L) - unscaled_value(disc))), 38, 4)
}
