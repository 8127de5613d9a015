package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class EditDistJoinSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("blocked levenshtein join finds close pairs that share a usable token") {
    val df = Seq("red widget", "red widgets", "red gadget", "blue bolt", "blue boat")
      .map(Tuple1(_)).toDF("p_name")
    val out = EditDistJoin.similarNames(df, "p_name", maxDist = 2, maxDf = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out((("red widget", "red widgets"))) shouldBe 1L
    out((("blue boat", "blue bolt"))) shouldBe 1L // boat->bolt: one substitution
    // "red gadget" is dist 3 from "red widget" — blocked but verified out
    out.keySet.exists(_._2 == "red gadget") shouldBe false
  }

  test("the df cap removes hot blocking tokens (no candidates via a stopword)") {
    // "the" appears in every name; with maxDf=2 it can't block, and the
    // pairs share no other token -> no candidates at all
    val df = Seq("the alpha", "the beta", "the gamma")
      .map(Tuple1(_)).toDF("p_name")
    EditDistJoin.similarNames(df, "p_name", maxDist = 10, maxDf = 2)
      .count() shouldBe 0L
  }

  test("ER clusters are transitive and labeled by the min name; singletons self-label") {
    // chain: "aaaa bb" ~ "aaab bb" ~ "aabb bb" (each adjacent pair dist
    // ≤2, ends dist 2 apart too) plus an unrelated singleton
    val df = Seq("aaaa bb", "aaab bb", "aabb bb", "zzzz yy")
      .map(Tuple1(_)).toDF("p_name")
    val out = EditDistJoin.nameClusters(df, "p_name", maxDist = 1, maxDf = 100)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // with maxDist=1 only adjacent names pair, transitivity still
    // clusters the chain under the lexicographic min
    out("aaaa bb") shouldBe "aaaa bb"
    out("aaab bb") shouldBe "aaaa bb"
    out("aabb bb") shouldBe "aaaa bb"
    out("zzzz yy") shouldBe "zzzz yy" // singleton, self-labeled
  }

  test("distinct-value reduction: duplicated rows do not duplicate pairs") {
    val df = Seq("aa bb", "aa bb", "aa bc").map(Tuple1(_)).toDF("p_name")
    EditDistJoin.similarNames(df, "p_name", maxDist = 2, maxDf = 100)
      .count() shouldBe 1L
  }
}
