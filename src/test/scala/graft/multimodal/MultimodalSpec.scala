package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("mapPartitions decode path produces the stub's deterministic features") {
    val docs = Seq((7L, "abcd", "s3")).toDF("doc_id", "text", "source")
    val out = Multimodal.extractFeatures(Multimodal.asMediaTable(docs)).collect()(0)
    out.getLong(0) shouldBe 7L
    out.getLong(1) shouldBe 4L // byte_len
    out.getLong(2) shouldBe 68L // width = 64 + 4 % 576
    out.getLong(3) shouldBe 92L // height = 64 + 28 % 448
    out.getLong(4) shouldBe 5L // n_frames = 1 + 4 % 30
  }

  test("binary payload round-trips the exact bytes") {
    val docs = Seq((1L, "héllo", "src")).toDF("doc_id", "text", "source")
    val bytes = Multimodal.asMediaTable(docs).collect()(0).getAs[Array[Byte]]("data")
    new String(bytes, "UTF-8") shouldBe "héllo"
  }

  /** Reference parity blockhash — the stub's definition, recomputed. */
  private def refBands(s: String): Seq[Long] = {
    val cps = s.codePoints().toArray
    val sums = new Array[Long](64)
    cps.indices.foreach(p => sums((p.toLong * 64 / cps.length).toInt) += cps(p))
    (0 until 4).map(b =>
      (0 until 16).map(k => (sums(16 * b + k) % 2) << k).sum)
  }

  test("perceptual hash matches the stripe-parity definition; empty payloads drop") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s"),
      (2L, "x", "s"),
      (3L, "", "s"),
    ).toDF("doc_id", "text", "source")
    val sigs = Multimodal.extractPHash(Multimodal.asMediaTable(docs))
      .collect().map(m => m.doc_id -> Seq(m.b0, m.b1, m.b2, m.b3)).toMap
    sigs.keySet shouldBe Set(1L, 2L) // empty payload emits nothing
    sigs(1L) shouldBe refBands("the quick brown fox jumps over the lazy dog")
    sigs(2L) shouldBe refBands("x")
  }

  test("phash near-dup: identical payloads pair at hamming 0; a one-char edit stays within 1 bit") {
    val rnd = new scala.util.Random(5)
    def noise(n: Int) = Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val base = noise(256)
    // flip one char's parity (+1 code point) — exactly one stripe sum
    // changes parity, so Hamming(base, edited) <= 1
    val edited = base.updated(100, (base(100) + 1).toChar)
    val docs = Seq(
      (1L, base, "s"), (2L, base, "s"), (3L, edited, "s"),
      (4L, noise(300), "s"),
    ).toDF("doc_id", "text", "source")
    val pairs = Multimodal.phashNearDupPairs(Multimodal.asMediaTable(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs((1L, 2L)) shouldBe 0L
    pairs((1L, 3L)) should be <= 1L
    pairs((2L, 3L)) should be <= 1L
  }

  test("near-dup cohort injection: every eligible doc gets a Hamming-1 twin (r16)") {
    val docs = Seq(
      (0L, "abcdefgh ijklmnop qrstuvwx", "s"), // eligible: %97==0, first char a..y
      (97L, "zz top", "s"), // first char 'z' (122) — excluded by the a..y band
      (194L, "quick brown fox", "s"), // eligible
      (5L, "also lowercase but wrong modulus", "s"),
      (291L, "", "s"), // empty — excluded (ascii('') = 0)
    ).toDF("doc_id", "text", "source")
    val out = Multimodal.withNearDupMediaCohort(docs)
    out.count() shouldBe 7 // 5 originals + 2 twins
    val twins = out.where($"doc_id" >= 100000000L)
      .as[(Long, String, String)].collect().map(t => t._1 -> t._2).toMap
    twins.keySet shouldBe Set(100000000L, 100000194L)
    twins(100000000L) shouldBe "bbcdefgh ijklmnop qrstuvwx"
    twins(100000194L) shouldBe "ruick brown fox"
    // the twin pair survives the full band-join + Hamming pipeline at
    // distance EXACTLY 1 (same length ⇒ same stripes; one parity flip)
    val pairs = Multimodal.phashNearDupPairs(Multimodal.asMediaTable(out))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs((0L, 100000000L)) shouldBe 1L
    pairs((194L, 100000194L)) shouldBe 1L
  }
}
