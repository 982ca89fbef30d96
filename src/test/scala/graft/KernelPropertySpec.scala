package graft

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{EmailScanKernel, ShingleKmvKernel, SubstringDedupKernel}

/** Property tests for the hand-rolled byte-loop kernels behind
  * `shingle_kmv` / `shingle_hashes` / `remove_spans`, against naive
  * Scala reference implementations (the CodecPropertySpec pattern):
  * random token arrays including nulls/empties/multi-byte, random span
  * sets including pathological overlap and unsorted order. */
class KernelPropertySpec extends AnyFunSuite {

  /** minimal deterministic property driver over a scalacheck Gen
    * (scalatestplus isn't available offline) */
  private def forAll[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    var seed = Seed(4242L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  // ---- naive references ------------------------------------------- //

  /** 60-bit portable hash of one window: concat_ws-with-space over the
    * non-null tokens (null contributes no bytes and no separator),
    * md5 hex, first 15 hex chars as unsigned base-16. */
  private def refWindowHash(win: Seq[Option[String]]): Long = {
    val joined = win.flatten.mkString(" ")
    val hex = DigestUtils.md5Hex(joined.getBytes("UTF-8"))
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def refWindowHashes(toks: Seq[Option[String]], w: Int): Seq[Long] =
    if (toks.length < w) Seq.empty
    else toks.sliding(w).map(refWindowHash).toSeq

  private def refShingleKmv(toks: Seq[Option[String]], n: Int, k: Int): Seq[Long] =
    refWindowHashes(toks, n).distinct.sorted.take(k)

  private def refRemoveSpans(
      toks: Seq[Option[String]], starts: Seq[Long], w: Int): Seq[Option[String]] = {
    val covered = starts.flatMap(s => s until (s + w)).toSet
    toks.zipWithIndex.collect { case (t, i) if !covered.contains(i + 1L) => t }
  }

  // ---- ArrayData plumbing ----------------------------------------- //

  private def tokArray(toks: Seq[Option[String]]): ArrayData =
    new GenericArrayData(toks.map(_.map(UTF8String.fromString).orNull).toArray[Any])

  private def longArray(xs: Seq[Long]): ArrayData =
    new GenericArrayData(xs.toArray)

  private def longsOf(a: ArrayData): Seq[Long] = a.toLongArray().toSeq

  private def stringsOf(a: ArrayData): Seq[Option[String]] =
    (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) None else Some(a.getUTF8String(i).toString))

  // ---- generators -------------------------------------------------- //

  private val genToken: Gen[Option[String]] = Gen.frequency(
    3 -> Gen.oneOf("a", "b", "ab", "the", "x1").map(Some(_)),
    1 -> Gen.const(Some("")), // empty token: joins as zero bytes BUT takes a separator slot
    1 -> Gen.const(Some("héllo⚡")), // multi-byte utf-8
    1 -> Gen.const(None), // null: no bytes AND no separator
    1 -> Gen.alphaNumStr.map(s => Some(s.take(8))))

  private val genToks: Gen[List[Option[String]]] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, genToken))


  test("email_extract_all scanner is byte-equal to java.util.regex on adversarial texts") {
    val pat = java.util.regex.Pattern.compile(
      graft.operators.TextOps.DefaultAnonymizePattern)
    def reference(text: String): Seq[String] = {
      val m = pat.matcher(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
    }
    def scanned(text: String): Seq[String] = {
      val arr = EmailScanKernel.extractAll(UTF8String.fromString(text))
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    }
    // hand-picked adversarial shapes: boundary-adjacent matches,
    // failed-@ candidates, shadowing substrings, multi-byte text,
    // greedy-domain traps, region-floor after a match
    val fixed = Seq(
      "", "@", "a@b.com", "a@b.co", "a@b.comz", "a@b.como", "x@y.comm",
      "a@b.comx@y.com", "a@b.com.c@d.com", "_a@b.com", "a@@b.com",
      "@x.com", "a@.com", "a@b..com", "a@b1.c.com", "u7@example.com or zu7@example.com",
      "héllo a@b.com wörld", "日本語x@y.comテスト", "a@b.coma@c.com",
      "tail a@b.c", "a@b.comcom", "m@n.com.com", "..@..com", "a_b@c9.com!",
      "A@B.com a@b.COM", "1@2.com3@4.com5@6.com")
    fixed.foreach { t =>
      assert(scanned(t) == reference(t), s"mismatch on fixed case: '$t'")
    }
    // randomized: fragments drawn from email-ish alphabet incl. @ . com
    val frag = Gen.oneOf("a", "b9", "_", "@", ".", "com", ".com", "x@y.com",
      " ", "@.", "zz@", "ü", "c", "om", ".c", "@a.com", "m@")
    val gen = Gen.listOfN(12, frag).map(_.mkString)
    forAll(gen, n = 500) { t =>
      assert(scanned(t) == reference(t), s"mismatch on generated: '$t'")
    }
  }

  test("email_extract_all_g scanner is byte-equal to java.util.regex on adversarial texts") {
    val pat = java.util.regex.Pattern.compile(
      graft.operators.TextOps.ProductionEmailPattern)
    def reference(text: String): Seq[String] = {
      val m = pat.matcher(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
    }
    def scanned(text: String): Seq[String] = {
      val arr = EmailScanKernel.extractAllGeneral(UTF8String.fromString(text))
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    }
    // hand-picked adversarial shapes for the BACKTRACKING tail
    // D+[.][A-Za-z]{2,} ('.' is a domain char here): dotted domains,
    // TLD cut short by digits, dots that never qualify, region floors
    val fixed = Seq(
      "", "@", "a@b.co", "a@b.c", "a@b.com5", "a@b.cd.x5y", "x@a.b.co",
      "x@a.b.c.d", "a@-b.com", "a@.com", "a@b..com", ".a@b.com",
      "-a+b%c@d.org!", "a@b.COM", "a@b.c-m", "a@b.comx@y.com",
      "a@b.com.c@d.com", "x@a.com.b@c.org", "a@b.co.uk", "a@b.co.uk.z",
      "u7@example.com or zu7@example.com", "héllo j.doe+tag@sub.host-9.io wörld",
      "日本語x%y@z.b-c.deテスト", "1@2.info3@4.net", "a@9.9", "a@x.a1b",
      "e@f.gh-", "e@f.gh.", "e@f.g.hi", "tail@dot.", "a@b.cde.f",
      "a.b@c.d@e.fg", "trail a@b.org more a@b.org")
    fixed.foreach { t =>
      assert(scanned(t) == reference(t), s"mismatch on fixed case: '$t'")
    }
    // randomized: fragments drawn from the production-pattern alphabet
    // incl. dots/dashes in domains and short/long TLDs
    val frag = Gen.oneOf("a", "b9", "_", "%", "+", "-", "@", ".", "co",
      "com", ".co", ".c", "om", " ", "@.", "ü", "x@y.io", "@a.b.cd",
      "-.", ".-", "e5", "d.e", "info")
    val gen = Gen.listOfN(12, frag).map(_.mkString)
    forAll(gen, n = 800) { t =>
      assert(scanned(t) == reference(t), s"mismatch on generated: '$t'")
    }
  }

  test("shingle_hashes matches the naive join→md5→hex-prefix reference") {
    val gen = for { toks <- genToks; w <- Gen.choose(1, 6) } yield (toks, w)
    forAll(gen) { case (toks, w) =>
      val got = longsOf(SubstringDedupKernel.windowHashes(tokArray(toks), w))
      assert(got == refWindowHashes(toks, w), s"toks=$toks w=$w")
    }
  }

  test("shingle_kmv matches distinct-sort-take-k of the reference hashes") {
    val gen = for {
      toks <- genToks; n <- Gen.choose(1, 6); k <- Gen.choose(1, 8)
    } yield (toks, n, k)
    forAll(gen) { case (toks, n, k) =>
      val got = longsOf(ShingleKmvKernel.compute(tokArray(toks), n, k))
      assert(got == refShingleKmv(toks, n, k), s"toks=$toks n=$n k=$k")
    }
  }

  test("remove_spans matches the covered-set reference incl. overlap and unsorted starts") {
    val gen = for {
      toks <- genToks
      w <- Gen.choose(1, 5)
      nSpans <- Gen.choose(0, 12)
      // starts beyond the doc, duplicated, and overlapping are all legal
      starts <- Gen.listOfN(nSpans, Gen.choose(1L, toks.length + 4L))
      shuffled <- Gen.oneOf(true, false)
    } yield (toks, if (shuffled) starts else starts.sorted, w)
    forAll(gen) { case (toks, starts, w) =>
      val got = stringsOf(SubstringDedupKernel.removeSpans(
        tokArray(toks), longArray(starts), w))
      assert(got == refRemoveSpans(toks, starts, w),
        s"toks=$toks starts=$starts w=$w")
    }
  }

  test("remove_spans drops NULL starts elements (ad-hoc SQL input)") {
    val gen = for {
      toks <- genToks
      w <- Gen.choose(1, 5)
      nSpans <- Gen.choose(1, 12)
      starts <- Gen.listOfN(nSpans,
        Gen.frequency(3 -> Gen.choose(1L, toks.length + 4L).map(Some(_)),
          1 -> Gen.const(None)))
    } yield (toks, starts, w)
    forAll(gen) { case (toks, starts, w) =>
      val withNulls = new GenericArrayData(
        starts.map(_.map(java.lang.Long.valueOf).orNull).toArray[Any])
      val got = stringsOf(SubstringDedupKernel.removeSpans(
        tokArray(toks), withNulls, w))
      assert(got == refRemoveSpans(toks, starts.flatten, w),
        s"toks=$toks starts=$starts w=$w")
    }
  }

  test("remove_spans pathological: every window removed leaves an empty doc") {
    val toks = (1 to 50).map(i => Some(s"t$i"))
    val w = 3
    val starts = (1L to 48L) // every start, fully overlapping
    val got = stringsOf(SubstringDedupKernel.removeSpans(
      tokArray(toks), longArray(starts), w))
    assert(got.isEmpty)
    // and descending order gives the identical result (defensive sort)
    val gotDesc = stringsOf(SubstringDedupKernel.removeSpans(
      tokArray(toks), longArray(starts.reverse), w))
    assert(gotDesc.isEmpty)
  }
}
