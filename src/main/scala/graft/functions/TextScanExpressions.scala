package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled scanner for the default anonymization email pattern
  * `[A-Za-z0-9_]+@[A-Za-z0-9]+[.]com` — the regex engine is the whole
  * cost of a corpus-scale PII pass (java.util.regex backtracks at
  * ~100 MB/s while DuckDB's RE2 runs the same pattern ~20× faster; the
  * p53 sf1 pair measured exactly that gap). One byte-wise pass, no
  * allocation beyond the result array.
  *
  * EXACTNESS vs `java.util.regex` find() semantics, argued per piece:
  *  - every match contains exactly ONE '@' (the char classes exclude
  *    it), so matches can be enumerated by '@' position in order;
  *  - find() returns the LEFTMOST-starting match, which for this
  *    pattern is the maximal `[A-Za-z0-9_]` run ending at the '@',
  *    floored at the previous match's end (find() resumes there — a
  *    back-scan across that boundary would claim characters java's
  *    region has already consumed, e.g. `a@b.comx@y.com` must yield
  *    `x@y.com`, not `comx@y.com`);
  *  - the greedy domain run never needs backtracking: shrinking
  *    `[A-Za-z0-9]+` leaves the next char alphanumeric, which can
  *    never match `[.]` — so "maximal run + literal `.com` check" is
  *    exhaustive, and a failure at one '@' is a failure for every
  *    start position sharing it (the domain check is independent of
  *    the local-part length);
  *  - all pattern chars are ASCII and UTF-8 continuation/lead bytes
  *    are ≥ 0x80 (negative as signed bytes), so byte-wise class tests
  *    are multi-byte safe.
  */
object EmailScanKernel extends Serializable {

  @inline private def isLocal(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  /** All matches of the default email pattern, in order, non-
    * overlapping — byte-equal to `regexp_extract_all(text, pat, 0)`. */
  def extractAll(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val n = b.length
    var out: Array[AnyRef] = null
    var nOut = 0
    var lastEnd = 0
    var at = 0
    while (at < n) {
      if (b(at) == '@') {
        // maximal local-part run ending at the '@', floored at lastEnd
        var ls = at
        while (ls > lastEnd && isLocal(b(ls - 1))) ls -= 1
        if (ls < at) {
          // maximal domain run, then the literal ".com"
          var k = at + 1
          while (k < n && isAlnum(b(k))) k += 1
          if (k > at + 1 && k + 4 <= n &&
            b(k) == '.' && b(k + 1) == 'c' && b(k + 2) == 'o' && b(k + 3) == 'm') {
            if (out == null) out = new Array[AnyRef](4)
            else if (nOut == out.length)
              out = java.util.Arrays.copyOf(out, out.length * 2)
            out(nOut) = UTF8String.fromBytes(b, ls, k + 4 - ls)
            nOut += 1
            lastEnd = k + 4
            at = k + 4 - 1 // -1: the loop increment lands on k + 4
          }
        }
      }
      at += 1
    }
    if (out == null) new GenericArrayData(Array.empty[AnyRef])
    else new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}

/** `email_extract_all(text)` — array<string> of every default-pattern
  * email match, byte-equal to `regexp_extract_all` with
  * [[graft.operators.TextOps.DefaultAnonymizePattern]]. */
case class EmailExtractAll(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "email_extract_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    EmailScanKernel.extractAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("emailScanKernel", EmailScanKernel,
      "graft.functions.EmailScanKernel$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $kernel.extractAll($t);")
  }

  override protected def withNewChildInternal(c: Expression): EmailExtractAll =
    copy(child = c)
}

object TextScanFunctions {
  val emailBuilder: Seq[Expression] => Expression = {
    case Seq(t) => EmailExtractAll(t)
    case _ => throw new IllegalArgumentException("email_extract_all(text string)")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "email_extract_all", emailBuilder, "built-in")

  def email_extract_all(text: Column): Column =
    org.apache.spark.sql.functions.call_function("email_extract_all", text)
}
