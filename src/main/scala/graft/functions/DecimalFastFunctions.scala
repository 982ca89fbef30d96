package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, MakeDecimal, UnscaledValue}
import org.apache.spark.sql.functions.{call_function, lit, sum}
import org.apache.spark.sql.types.IntegerType

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
  * path.
  */
object DecimalFastFunctions {

  val unscaledBuilder: Seq[Expression] => Expression = {
    case Seq(c) => UnscaledValue(c)
    case _ => throw new IllegalArgumentException("unscaled_value(decimal)")
  }

  val makeDecimalBuilder: Seq[Expression] => Expression = {
    case Seq(c, Literal(p: Int, IntegerType), Literal(s: Int, IntegerType)) =>
      MakeDecimal(c, p, s)
    case _ => throw new IllegalArgumentException(
      "make_decimal(unscaled bigint, precision int literal, scale int literal)")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unscaled_value", unscaledBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "make_decimal", makeDecimalBuilder, "built-in")
  }

  def unscaled_value(c: Column): Column = call_function("unscaled_value", c)

  def make_decimal(c: Column, precision: Int, scale: Int): Column =
    call_function("make_decimal", c, lit(precision), lit(scale))

  /** `sum` over a compact DECIMAL column through a primitive-long
    * accumulator (see object scaladoc for the exactness bound the
    * caller owns). Result matches `sum(c)` on a DECIMAL(18,s) input:
    * DECIMAL(28,s). */
  def sum_unscaled(c: Column, scale: Int): Column =
    make_decimal(sum(unscaled_value(c)), 28, scale)
}
