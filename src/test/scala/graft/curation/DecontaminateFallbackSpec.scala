package graft.curation

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** The decontamination size gate must be a pure strategy switch: the
  * broadcast path (holdout under budget) and the shuffle fallback
  * (budget forced to 0) produce identical relations.
  */
class DecontaminateFallbackSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val holdout = Seq(
    (1000L, "alpha beta gamma delta epsilon zeta"),
    (1001L, "one two three four five six seven"),
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "prefix alpha beta gamma delta epsilon suffix"), // shares a 5-gram
    (2L, "one two three four five six and then more"),    // shares two 5-grams
    (3L, "completely unrelated words that overlap with nothing at all"),
  ).toDF("doc_id", "text")

  private def rows(budget: Long) =
    Curation.decontaminate(corpus, holdout, n = 5, broadcastBudgetBytes = budget)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("broadcast path and shuffle fallback produce identical output") {
    val broadcastPath = rows(Curation.DefaultHoldoutBroadcastBudget)
    val shufflePath = rows(0L) // estimated size always exceeds 0 → fallback
    broadcastPath should not be empty
    shufflePath shouldBe broadcastPath
    // doc 3 shares nothing and must not appear on either path
    broadcastPath.map(_._1) should not contain 3L
  }

  test("bloom pre-pass produces the identical relation (FPs removed by the exact join)") {
    val bloomPath = Curation
      .decontaminateBloom(corpus, holdout, n = 5, expectedItems = 1L << 10, numBits = 1L << 13)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    bloomPath shouldBe rows(Curation.DefaultHoldoutBroadcastBudget)
  }
}
