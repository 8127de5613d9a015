package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class BigramLmSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed model and scores on a three-doc corpus") {
    val docs = Seq(
      1L -> "a b a b",   // bigrams: (a,b) (b,a) (a,b)
      2L -> "a b c",     // bigrams: (a,b) (b,c)
      3L -> "a c",       // bigram:  (a,c)
    ).toDF("doc_id", "text")
    // cnt1: a→4 (a,b)x3 + (a,c)x1 ; b→2 ; total bigrams 6
    // p_scaled: (a,b) = 1e6*3/4 = 750000; (b,a) = 1e6*1/2 = 500000
    //           (b,c) = 500000; (a,c) = 1e6*1/4 = 250000
    val model = BigramLm.bigramModel(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    model(("a", "b")) shouldBe 750000L
    model(("b", "a")) shouldBe 500000L
    model(("b", "c")) shouldBe 500000L
    model(("a", "c")) shouldBe 250000L

    val out = BigramLm.fluencyScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_bigrams") shouldBe 3L
    out(1L).getAs[Long]("score_sum") shouldBe (750000L + 500000L + 750000L)
    out(2L).getAs[Long]("score_sum") shouldBe (750000L + 500000L)
    out(3L).getAs[Long]("score_sum") shouldBe 250000L
    out(3L).getAs[Double]("mean_p_scaled") shouldBe 250000.0
  }

  test("scrambled word order scores below fluent text (the filter signal)") {
    // the salad reuses the SAME vocabulary in transitions the corpus
    // rarely makes — the perplexity-filter signal. (A salad of unique
    // hapax tokens would score p=1 per transition under a self-trained
    // model; rarity is relative to the trained unigram mass.)
    val fluent = (1 to 50).map(_ => "the cat sat").mkString(" ")
    val salad = "cat the sat cat the sat"
    val docs = Seq(1L -> fluent, 2L -> salad).toDF("doc_id", "text")
    val out = BigramLm.fluencyScores(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_p_scaled")).toMap
    out(1L) should be > out(2L)
  }

  test("short and empty docs surface with zero bigrams") {
    val docs = Seq(1L -> "", 2L -> "solo", 3L -> "a b").toDF("doc_id", "text")
    val out = BigramLm.fluencyScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_bigrams") shouldBe 0L
    out(2L).getAs[Long]("n_bigrams") shouldBe 0L
    out(1L).getAs[Double]("mean_p_scaled") shouldBe 0.0
    out(3L).getAs[Long]("n_bigrams") shouldBe 1L
    out(3L).getAs[Long]("score_sum") shouldBe 1000000L // only (a,b): p=1
  }
}
