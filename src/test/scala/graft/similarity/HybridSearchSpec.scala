package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class HybridSearchSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Corpus engineered so the two rankings disagree:
  //  - lexically, docs 1 and 2 contain the top-df term ("the") with
  //    doc 1 denser -> lex list = [1, 2];
  //  - vectorially (query = vec 0), doc 3 is colinear with vec 0 and
  //    doc 2 is half-aligned -> vec list = [3, 2].
  // Doc 2 appears in BOTH lists at rank 2; RRF must fuse it above the
  // single-list rank-1 docs: 2·(10⁹/62) > 10⁹/61.
  private val docs = Seq(
    (0L, "zzz"),
    (1L, "the the the"),
    (2L, "the zzz"),
    (3L, "qqq"),
  ).toDF("doc_id", "text")

  private val e0 = Array.tabulate(64)(i => if (i < 32) 1.0f else 0.0f)
  private val e3 = Array.tabulate(64)(i => if (i < 32) 2.0f else 0.0f)
  private val e2 = Array.tabulate(64)(i => if (i < 16) 1.0f else 0.0f)
  private val e1 = Array.tabulate(64)(i => if (i >= 32) 1.0f else 0.0f)
  private val embs = Seq((0L, e0), (1L, e1), (2L, e2), (3L, e3)).toDF("vec_id", "embedding")

  test("a both-lists doc outranks each list's solo leader") {
    val out = HybridSearch.hybridRrf(docs, embs, depth = 2, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.head._1 shouldBe 2L // fused winner
    out.head._2 shouldBe 2L // lex rank 2
    out.head._3 shouldBe 2L // vec rank 2
    // both solo leaders present with one zero rank
    val byDoc = out.map(r => r._1 -> r).toMap
    byDoc(1L)._3 shouldBe 0L
    byDoc(3L)._2 shouldBe 0L
    byDoc(1L)._4 shouldBe byDoc(3L)._4 // same solo rank-1 score
  }
}
