package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** [[CharEntropy]]'s fixed-point lane must track true Shannon entropy
  * within the qlog2 quantization bound, and the edge rows (empty text,
  * single repeated char → entropy exactly 0) must behave.
  */
class CharEntropySpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def df(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("fixed-point entropy tracks exact Shannon entropy within quantization error") {
    val texts = Seq("abab", "aaaa bbbb cccc dddd", "the quick brown fox jumps", "zzzzzzzzzz")
    val rows = CharEntropy.charEntropy(df(texts)).orderBy("doc_id").collect()
    texts.zip(rows).foreach { case (t, r) =>
      val n = t.length.toDouble
      val exact = t.groupBy(identity).values
        .map(g => { val p = g.length / n; -p * math.log(p) / math.log(2) }).sum
      // each qlog2 term is within 1/256 of 256·log2; n+distinct terms
      r.getDouble(4) shouldBe exact +- (2.0 / 256 + 1e-9)
    }
  }

  test("degenerate rows: empty text → all-zero; uniform char → entropy 0, flagged low") {
    val rows = CharEntropy.charEntropy(df(Seq("", "aaaaaaa"))).orderBy("doc_id").collect()
    rows(0).getLong(1) shouldBe 0L // n
    rows(0).getLong(3) shouldBe 0L // hq
    rows(0).getBoolean(5) shouldBe false
    rows(0).getBoolean(6) shouldBe false
    rows(1).getLong(3) shouldBe 0L // single-symbol text: H exactly 0
    rows(1).getBoolean(5) shouldBe true // low-entropy junk flag
  }
}
