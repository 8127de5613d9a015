package graft.dedup

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** Pins the content-defined gram selection: a copied span is detected
  * regardless of where it sits in each document (the fixed-stride sampler
  * this replaced only matched copies aligned mod stride).
  */
class SubstringDupSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic non-repetitive text
  private def randText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    r.alphanumeric.take(n).mkString
  }

  private val span = randText(42, 200)

  private def run(docs: Seq[(Long, String)], k: Int = 40, sampleBits: Int = 3): Map[Long, Row] =
    SubstringDup.substringDupStats(docs.toDF("doc_id", "text"), k, sampleBits)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("copied span detected at MISALIGNED offsets (stride-sampler regression)") {
    // span at offset 0 in doc 1, offset 7 in doc 2 — 7 is coprime to any
    // stride the old sampler used, so position sampling would miss it
    val docs = Seq(
      1L -> (span + randText(1, 100)),
      2L -> (randText(2, 7) + span + randText(3, 100)),
      3L -> randText(4, 300), // clean
    )
    val out = run(docs)
    out(1L).getAs[Long]("n_dup_grams") should be > 0L
    out(2L).getAs[Long]("n_dup_grams") should be > 0L
    out(3L).getAs[Long]("n_dup_grams") shouldBe 0L
    out(3L).getAs[Double]("dup_ratio") shouldBe 0.0
    // selection is content-defined: both copies select the SAME span grams
    out(1L).getAs[Long]("n_dup_grams") shouldBe out(2L).getAs[Long]("n_dup_grams")
  }

  test("sampleBits=0 keeps every gram: single shared k-window is guaranteed") {
    val shared = randText(7, 40) // exactly k chars
    val docs = Seq(
      1L -> (shared + randText(8, 60)),
      2L -> (randText(9, 33) + shared + randText(10, 60)),
    )
    val out = run(docs, k = 40, sampleBits = 0)
    out(1L).getAs[Long]("n_dup_grams") should be >= 1L
    out(2L).getAs[Long]("n_dup_grams") should be >= 1L
    out(1L).getAs[Long]("first_dup_pos") shouldBe 1L
    out(2L).getAs[Long]("first_dup_pos") shouldBe 34L
    // every position emitted: doc 1 has 100 chars → 61 windows
    out(1L).getAs[Long]("n_grams") shouldBe 61L
  }

  test("docs shorter than k emit no grams and read as clean") {
    val out = run(Seq(1L -> randText(11, 39), 2L -> randText(12, 100)))
    out(1L).getAs[Long]("n_grams") shouldBe 0L
    out(1L).getAs[Long]("n_dup_grams") shouldBe 0L
    out(1L).getAs[Double]("dup_ratio") shouldBe 0.0
    out(1L).getAs[Long]("first_dup_pos") shouldBe -1L
  }

  test("exact duplicate docs agree on first_dup_pos and full dup ratio") {
    val text = span + randText(13, 50)
    val out = run(Seq(1L -> text, 2L -> text))
    val a = out(1L); val b = out(2L)
    a.getAs[Long]("n_grams") should be > 0L
    a.getAs[Long]("n_dup_grams") shouldBe a.getAs[Long]("n_grams")
    a.getAs[Double]("dup_ratio") shouldBe 1.0
    a.getAs[Long]("first_dup_pos") shouldBe b.getAs[Long]("first_dup_pos")
    a.getAs[Long]("first_dup_pos") should be >= 1L
  }
}
