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

  test("distinct-value reduction: duplicated rows do not duplicate pairs") {
    val df = Seq("aa bb", "aa bb", "aa bc").map(Tuple1(_)).toDF("p_name")
    EditDistJoin.similarNames(df, "p_name", maxDist = 2, maxDf = 100)
      .count() shouldBe 1L
  }
}
