package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class Bm25Spec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("query terms are the top-df tokens; higher tf ranks higher at equal dl") {
    val docs = Seq(
      1L -> "cat cat cat dog mouse",   // tf(cat)=3, dl=5
      2L -> "cat dog bird fish snake", // tf(cat)=1, dl=5
      3L -> "cat cat dog frog newt",   // tf(cat)=2, dl=5
      4L -> "dog dog dog dog lizard",  // no cat
    ).toDF("doc_id", "text")
    // df: cat=3, dog=4 -> top-1 term is dog; use nTerms=2 to get cat too
    val out = Bm25.bm25TopDocs(docs, nTerms = 2, k = 10).collect()
    val terms = out.map(_.getString(0)).distinct.sorted
    terms shouldBe Array("cat", "dog")
    val catRanks = out.filter(_.getString(0) == "cat")
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id"))
    // equal dl everywhere → pure tf ordering: 3 > 2 > 1
    catRanks shouldBe Array(1L, 3L, 2L)
  }

  test("at equal tf, shorter documents rank higher (length normalization)") {
    val docs = Seq(
      1L -> "word alpha",                       // tf=1, dl=2
      2L -> "word beta gamma delta epsilon",    // tf=1, dl=5
      3L -> "word zeta",                        // tf=1, dl=2 (tie with 1 → doc_id)
    ).toDF("doc_id", "text")
    val out = Bm25.bm25TopDocs(docs, nTerms = 1, k = 10).collect()
    out.map(_.getString(0)).distinct shouldBe Array("word")
    out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")) shouldBe Array(1L, 3L, 2L)
  }

  test("k cuts the list; integer components surface correctly") {
    val docs = (1L to 20L).map(i => i -> s"common w$i").toDF("doc_id", "text")
    val out = Bm25.bm25TopDocs(docs, nTerms = 1, k = 5).collect()
    out.length shouldBe 5
    out.foreach { r =>
      r.getAs[Long]("tf") shouldBe 1L
      r.getAs[Long]("df") shouldBe 20L
      r.getAs[Long]("dl") shouldBe 2L
    }
    // full tie → doc_id order
    out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")) shouldBe (1L to 5L).toArray
  }
}
