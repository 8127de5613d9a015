package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class CountMinSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("single-key stream: estimate is exact") {
    val docs = Seq(1L -> Seq.fill(37)("only").mkString(" ")).toDF("doc_id", "text")
    val out = CountMin.countMinTopTokens(docs, 10).collect()
    out.length shouldBe 1
    out(0).getAs[String]("tok") shouldBe "only"
    out(0).getAs[Long]("exact_cnt") shouldBe 37L
    out(0).getAs[Long]("cms_est") shouldBe 37L
    out(0).getAs[Long]("over_est") shouldBe 0L
  }

  test("never underestimates; top-k ordering deterministic") {
    val rnd = new scala.util.Random(3)
    val words = (0 until 300).map(i => s"w$i")
    val text = (0 until 5000).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val docs = Seq(1L -> text).toDF("doc_id", "text")
    val rows = CountMin.countMinTopTokens(docs, 100).collect()
    rows.length shouldBe 100
    rows.foreach { r =>
      assert(r.getAs[Long]("over_est") >= 0L,
        s"underestimate for ${r.getAs[String]("tok")}")
      r.getAs[Long]("cms_est") - r.getAs[Long]("exact_cnt") shouldBe r.getAs[Long]("over_est")
    }
    // ordering: exact_cnt desc, tok asc
    val key = rows.map(r => (-r.getAs[Long]("exact_cnt"), r.getAs[String]("tok")))
    key shouldBe key.sorted
  }

  test("sketches merge by elementwise addition") {
    val a = Seq(1L -> "x x y z").toDF("doc_id", "text")
    val b = Seq(2L -> "x y y q").toDF("doc_id", "text")
    val both = a.union(b)
    def toksOf(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      df.select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    }
    def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      CountMin.sketch(toksOf(df), "tok").collect()(0).getSeq[Long](0)
    val merged = arr(a).zip(arr(b)).map { case (x, y) => x + y }
    arr(both) shouldBe merged
  }
}
