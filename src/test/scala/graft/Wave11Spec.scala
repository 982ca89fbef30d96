package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 hardening: the latent contracts VERDICT r14 named — the
  * scrub-rule prefix is literal under regex metacharacters, and the
  * unscaled-sum fast path refuses non-compact decimal inputs loudly
  * at analysis time instead of silently mis-typing/truncating. */
class Wave11Spec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("placeholderSafeDigitRule: metacharacter prefix is taken literally") {
    // pre-fix, 'E+MAIL' made the lookbehind variable-length →
    // PatternSyntaxException at regexp_replace time; a '.'-bearing
    // prefix compiled but matched too much (silent mis-scrub).
    import spark.implicits._
    val df = Seq((1L, "<E+MAIL_1234> wrote; call 5551234 or <EXMAIL_2345> maybe"))
      .toDF("doc_id", "anon_text")
    val out = operators.TextOps.piiScrub(
        df, "anon_text", "final_text",
        rules = Seq(operators.TextOps.placeholderSafeDigitRule("E+MAIL")))
      .select("final_text", "n_digit_runs").collect().head
    val ft = out.getString(0)
    assert(ft.contains("<E+MAIL_1234>"), s"literal-prefix placeholder scrubbed: $ft")
    // a '.' in a quoted prefix must NOT wildcard-match EXMAIL's number
    assert(ft.contains("<EXMAIL_<NUM>>") && ft.contains("call <NUM>"),
      s"non-placeholder runs must still scrub: $ft")
    assert(out.getInt(1) == 2)
  }

  test("sum_unscaled rejects non-compact DECIMAL(p>18) at analysis time") {
    import spark.implicits._
    val df = Seq("123.45", "67.89").toDF("v")
      .select(col("v").cast("decimal(19,2)").as("d"))
    functions.DecimalFastFunctions.register(spark)
    val ex = intercept[AnalysisException] {
      df.agg(functions.DecimalFastFunctions.sum_unscaled(col("d"), 2)).collect()
    }
    assert(ex.getMessage.contains("unscaled_value") ||
      ex.getMessage.contains("compact"), s"wrong failure: ${ex.getMessage}")
  }

  test("sum_unscaled matches sum() bit-exactly on compact DECIMAL(18,2)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 7, s"$i.${i % 100}"))
      .toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(18,2)").as("d"))
    functions.DecimalFastFunctions.register(spark)
    val fast = df.groupBy("g")
      .agg(functions.DecimalFastFunctions.sum_unscaled(col("d"), 2).as("s"))
    val ref = df.groupBy("g").agg(sum(col("d")).as("s"))
    assert(fast.schema("s").dataType == ref.schema("s").dataType)
    assert(fast.except(ref).isEmpty && ref.except(fast).isEmpty)
  }

  test("unscaled_value carries its overflow contract in DESCRIBE FUNCTION") {
    functions.DecimalFastFunctions.register(spark)
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED unscaled_value")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("OVERFLOW CONTRACT") && desc.contains("2^63"),
      s"contract missing from usage: $desc")
  }
}
