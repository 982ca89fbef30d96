package graft.functions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared kernel for the one-pass per-document shingle KMV sketch:
  * for every `n`-token window of the input token array, hash the
  * space-joined shingle with the engine-portable 60-bit md5-hex-prefix
  * recipe (`conv(substr(md5(s), 1, 15), 16, 10)` — the p07/minhash
  * family widened to 60 bits), and keep the k smallest DISTINCT hash
  * values, ascending.
  *
  * This replaces the exploded form
  * `explode(sequence(...)) → concat_ws → md5 → conv → kmv_minima(h)`
  * which materializes one row plus one shingle STRING per window
  * before the aggregate can discard it (~3.5M rows at sf0.1 — measured
  * as the wall of the sketch build in P41Lab). Here the md5 runs over
  * the token bytes directly (one digest per window, no intermediate
  * shingle string, no row explosion) and each document reduces to at
  * most k longs inside the projection itself, exactly like the
  * repo's `minhash_sig` (`MinhashExpression.scala`) treats the
  * per-token hash loop. Semantics are bit-identical to the exploded
  * chain: `concat_ws` skips NULL elements, so NULL tokens contribute
  * no bytes and no separator.
  */
object ShingleKmvKernel extends Serializable {

  /** Returns the ≤ k smallest distinct 60-bit shingle hashes,
    * ascending; an empty array when the document has fewer than `n`
    * tokens. Called from interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int, k: Int): ArrayData = {
    val count = arr.numElements()
    if (count < n) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = DigestUtils.getMd5Digest // one provider lookup per document
    val set = new java.util.TreeSet[java.lang.Long]()
    val lastStart = count - n
    i = 0
    while (i <= lastStart) {
      md.reset()
      var first = true
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        if (t != null) {
          if (!first) md.update(' '.toByte)
          md.update(t)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      // first 15 hex chars of the digest = top 60 bits:
      // bytes 0..6 fully (56 bits) then the high nibble of byte 7
      val h = ((((d(0) & 255L) << 48) | ((d(1) & 255L) << 40) |
        ((d(2) & 255L) << 32) | ((d(3) & 255L) << 24) |
        ((d(4) & 255L) << 16) | ((d(5) & 255L) << 8) |
        (d(6) & 255L)) << 4) | ((d(7) >> 4) & 15L)
      if (set.size < k) { set.add(h); () }
      else if (h < set.last() && set.add(h)) { set.remove(set.last()); () }
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `shingle_kmv(tokens, n, k)` — codegen'd per-document KMV sketch of
  * n-token shingle hashes (array<bigint> ascending, ≤ k distinct
  * minima). Feed the per-document arrays to `kmv_minima(arr, k)` to
  * get the per-group sketch: document → ≤ k longs happens inside the
  * scan projection, so the aggregate's input is already sketch-sized
  * and the whole chain never materializes a shingle row or string.
  */
case class ShingleKmv(child: Expression, n: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_kmv"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1 and k >= 1, got n=$n k=$k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleKmvKernel.compute(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("shingleKmvKernel", ShingleKmvKernel,
      "graft.functions.ShingleKmvKernel$")
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $kernel.compute($arr, $n, $k);")
  }

  override protected def withNewChildInternal(c: Expression): ShingleKmv =
    copy(child = c)
}
