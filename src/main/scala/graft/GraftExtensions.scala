package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{LshBuckets, MinhashFunctions, MinhashSig, PgCtidPack, PgCtidText, PgCtidUnpack, SortedIntersectSize, TopKBy, VecDistSq, VecDot}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

/** `--conf spark.sql.extensions=graft.GraftExtensions` — registers the
  * engine's SQL surface: the ctid pack/unpack expressions (SURVEY.md
  * §7.3) and the codegen'd `vec_dot` embedding fold. Everything else
  * in the engine is standard DSv2/catalog plumbing that needs no
  * Catalyst extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("vec_dist_sq"),
      new ExpressionInfo(classOf[VecDistSq].getName, "vec_dist_sq"),
      (args: Seq[Expression]) => VecDistSq(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinhashSig(args(0), MinhashFunctions.DefaultK)))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (args: Seq[Expression]) => LshBuckets(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (args: Seq[Expression]) => args match {
        case Seq(s, i, Literal(k: Int, IntegerType)) => TopKBy(s, i, k)
        case _ => throw new IllegalArgumentException(
          "topk_by(score double, id bigint, k int-literal)")
      }))
    e.injectFunction((
      FunctionIdentifier("pg_ctid_pack"),
      new ExpressionInfo(classOf[PgCtidPack].getName, "pg_ctid_pack"),
      (args: Seq[Expression]) => PgCtidPack(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("pg_ctid_unpack"),
      new ExpressionInfo(classOf[PgCtidUnpack].getName, "pg_ctid_unpack"),
      (args: Seq[Expression]) => PgCtidUnpack(args.head)))
    e.injectFunction((
      FunctionIdentifier("pg_ctid_text"),
      new ExpressionInfo(classOf[PgCtidText].getName, "pg_ctid_text"),
      (args: Seq[Expression]) => PgCtidText(args.head)))
  }
}
