package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-10 entries: PII scrub (p53) and filtered ANN (s11) — the
  * semantic properties the oracle hash can't name directly: the scrub
  * leaves NO residual matches, the audit counts recount by brute
  * force, and pre-filtering genuinely differs from post-filtering. */
class Wave10Spec extends AnyFunSuite {

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

  private val dir = "/root/testdata/sf0.001"

  test("p53: scrubbed text has zero residual PII matches and counts recount") {
    // reconstruct the augmented text the entry builds, scrub it
    // independently with java.util.regex, and compare counts
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .collect()
    val email = java.util.regex.Pattern.compile(queries.Pipeline10.EmailRe)
    val phone = java.util.regex.Pattern.compile(queries.Pipeline10.PhoneRe)
    val expected = docs.map { r =>
      val id = r.getLong(0)
      val aug = r.getString(1) + " contact " + r.getString(2) + "_" + id +
        "@example.com" +
        (if (id % 2 == 0) " call 555-" + ("%04d".format(id % 10000)) else " call n/a") +
        (if (id % 3 == 0) " cc " + r.getString(2) + "@test.org" else "")
      def count(p: java.util.regex.Pattern) = {
        val m = p.matcher(aug); var n = 0; while (m.find()) n += 1; n
      }
      id -> ((count(email), count(phone)))
    }.toMap
    val out = queries.Pipeline10.p53_pii_scrub(spark, dir).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (e, p) = expected(r.getLong(0))
      assert(r.getInt(1) == e, s"email count mismatch for doc ${r.getLong(0)}")
      assert(r.getInt(2) == p, s"phone count mismatch for doc ${r.getLong(0)}")
    }
    // the scrub is total: re-scrubbing the clean text is a no-op, so
    // fingerprints pin it; and no '<EMAIL>'-free residual match exists
    val clean = Tables.load(spark, dir, "documents")
      .select(queries.Pipeline10.piiScrub(
        concat(col("text"), lit(" a_b@example.com 555-1234"))).as("c"))
    val residual = clean.filter(
      expr(s"c rlike '${queries.Pipeline10.EmailRe}'") ||
        expr(s"c rlike '${queries.Pipeline10.PhoneRe}'"))
    assert(residual.count() == 0, "scrubbed text still matches a PII pattern")
  }

  test("s11: every returned neighbor satisfies the filter, and pre-filter beats post-filter") {
    val out = queries.Pipeline10.s11_ann_ivf_filtered(spark, dir)
    val emb = Tables.load(spark, dir, "embeddings")
    val joined = out.join(
      emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
    assert(joined.count() > 0, "filtered ANN returned no rows")
    assert(joined.filter(col("label") =!= 3).count() == 0,
      "a neighbor violating the filter leaked into the top-k")
    // post-filtering a plain top-10 instead must lose hits: with a
    // ~10%-selective label, a plain top-10 rarely contains 10
    // label-3 vectors — the pre-filter keeps k deep
    val ivf = operators.Ann.buildIvf(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      cells = 16, lloydIters = 1)
    val queriesDf = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val plainThenFilter = operators.Ann.ivfTopK(queriesDf,
        emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
        ivf, k = 10, nprobe = 4)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .filter(col("label") === 3)
    assert(plainThenFilter.count() < out.count(),
      "post-filtering returned as many hits as pre-filtering — the fixture no longer demonstrates the divergence")
  }
}
