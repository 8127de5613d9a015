package graft.curation

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** packSequencesScalable must be relation-identical to packSequences:
  * the bucket decomposition only re-plans the prefix computation, it
  * never changes a cum-sum — for any bucket count, including degenerate
  * ones (1 bucket = the original single-window shape; more buckets than
  * rows = every bucket holds ≤1 row).
  */
class ScalablePrefixSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = {
    // 3 langs, deliberately non-uniform doc_id gaps and token counts
    val rows = (1L to 200L).map { i =>
      val lang = Seq("en", "de", "zh")(((i * 7) % 3).toInt)
      val words = Seq.fill(((i * 13) % 17 + 1).toInt)("w").mkString(" ")
      (i * 3 + (i % 5), lang, words) // gappy ids
    }
    rows.toDF("doc_id", "lang", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("decomposed prefix equals the single-window formulation") {
    val base = run(Curation.packSequences(docs, budget = 64))
    run(Curation.packSequencesScalable(docs, budget = 64)) shouldBe base
    run(Curation.packSequencesScalable(docs, budget = 64, buckets = 1)) shouldBe base
    run(Curation.packSequencesScalable(docs, budget = 64, buckets = 512)) shouldBe base
  }
}
