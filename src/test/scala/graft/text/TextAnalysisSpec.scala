package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("token stats: whitespace vs regex tokens") {
    val docs = Seq((1L, "Hello, world 42"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenStats(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // ws: [Hello, | world | 42]; regex: Hello , world 42
    out(1L) shouldBe ((3L, 4L))
    out(2L) shouldBe ((0L, 0L))
  }

  test("source token entropy: uniform hits max, skew reads below, qlog2Ref exact") {
    val d = Seq(
      (1L, "a a b b", "U"),   // uniform over 2 tokens: H = 1 bit = 256q
      (2L, "a a a b", "S"))   // skewed: H = 2 - (3*log2 3)/4 bits
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceTokenEntropy(d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val q2 = Unigram.qlog2Ref(2) // 256: one exact bit
    val q4 = Unigram.qlog2Ref(4) // 512
    out("U") shouldBe ((4L, 2L, q4 - (2 * q2 + 2 * q2) / 4, q2))
    out("S") shouldBe ((4L, 2L, q4 - (3 * Unigram.qlog2Ref(3)) / 4, q2))
    out("S")._3 should be < out("U")._3 // skew lowers entropy
    out("U")._3 shouldBe out("U")._4    // uniform = max
  }

  test("quality score: exact ratios on a known doc") {
    val docs = Seq((1L, "the the the")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs).collect()(0)
    r.getLong(1) shouldBe 11L // n_chars
    r.getLong(2) shouldBe 3L // n_tokens
    r.getDouble(3) shouldBe (9.0 / 11.0) // alpha_ratio
    r.getDouble(4) shouldBe 1.0 // stop_ratio: all tokens are stopwords
    r.getDouble(5) shouldBe (0.6 * 9.0 / 11.0 + 0.4)
  }

  test("language guess picks the stopword-dominant language") {
    val docs = Seq(
      (1L, "the cat of the house and a dog"),
      (2L, "el perro y la casa de los gatos"),
      (3L, "der hund und die katze ist ein tier"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langGuess(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "en", 2L -> "es", 3L -> "de")
  }

  test("shingle fingerprint: short docs get empty fp, equal docs equal fp") {
    val docs = Seq((1L, "abcdefgh_long_enough"), (2L, "abcdefgh_long_enough"), (3L, "short")).toDF("doc_id", "text")
    val out = TextAnalysis.shingleFingerprint(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    out(1L) shouldBe out(2L)
    out(3L)._2 shouldBe "" // < 8 chars: no shingles
    out(1L)._2 should fullyMatch regex "[0-9a-f]{32}"
  }

  test("tf-idf: corpus-unique terms outrank ubiquitous ones") {
    val docs = Seq(
      (1L, "common common zebra"),
      (2L, "common words here"),
      (3L, "common other words"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // 'common' has df=3 -> idf ln(1)=0; 'zebra' df=1 dominates doc 1
    out((1L, 1L)) shouldBe "zebra"
    out((2L, 1L)) should (be("here") or be("words"))
  }

  test("chunking covers every token with the configured overlap") {
    val docs = Seq((1L, (1 to 150).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, chunk = 64, stride = 48)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // 150 tokens, windows at 1, 49, 97 -> sizes 64, 64, 54
    out.sortBy(_._1) shouldBe Seq((0L, 64L), (1L, 64L), (2L, 54L))
  }

  test("chunking: short doc yields one whole-doc chunk") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, 64, 48).collect()
    out.length shouldBe 1
    out(0).getLong(2) shouldBe 3L
  }

  test("vocab growth: each type counts once, in its first bucket; cumsums are monotone") {
    // enough docs that both buckets of a 2-bucket split are non-empty
    val docs = (0L until 20L).map { i =>
      (i, if (i % 2 == 0) "alpha beta" else "alpha gamma delta")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.map(_._1).toSeq shouldBe Seq(0L, 1L)
    // 4 distinct types total, each attributed exactly once
    out.map(_._3).sum shouldBe 4L
    // cumulative totals equal the full corpus sums
    out.last._4 shouldBe out.map(_._2).sum
    out.last._5 shouldBe 4L
  }
}
