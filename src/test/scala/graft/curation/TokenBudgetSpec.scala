package graft.curation

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** [[Curation.tokenBudgetSelect]]'s bucket-decomposed running sum must
  * equal the naive global-window formulation row for row (same
  * selected set, same cum_tokens), and the selection must be the
  * MAXIMAL quality-first prefix under the budget: every kept doc
  * scores ≥ every dropped doc (up to the doc_id tie), and adding the
  * best dropped doc would breach the budget.
  */
class TokenBudgetSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("decomposed cumsum equals the naive global window") {
    val docs = graft.Tables.documents(spark, sfDir)
    val got = Curation.tokenBudgetSelect(docs)

    val q = graft.text.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val total = q.agg(sum("n_tokens")).as[Long].head()
    val naive = q.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= (total * 2) / 5)
      .select("doc_id", "n_tokens", "score", "cum_tokens")

    got.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(got).count() shouldBe 0L
  }

  test("per-lang budgets: each language's selection respects ITS OWN 40% token total") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sel = Curation.tokenBudgetByLang(docs).cache()
    val q = graft.text.TextAnalysis.qualityScored(docs, Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"))

    // equality with the naive per-lang global window
    val w = Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = q.groupBy("lang").agg(sum("n_tokens").as("tt"))
    val naive = q.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(tot, Seq("lang"))
      .where(expr("cum_tokens <= (tt * 2) div 5"))
      .select("doc_id", "lang", "n_tokens", "score", "cum_tokens")
    sel.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(sel).count() shouldBe 0L

    // every language stays under its own budget
    val over = sel.groupBy("lang").agg(sum("n_tokens").as("used"))
      .join(tot, Seq("lang"))
      .where(expr("used > (tt * 2) div 5"))
    over.count() shouldBe 0L
    sel.unpersist()
  }

  test("selection is the maximal quality-first prefix under the budget") {
    val docs = graft.Tables.documents(spark, sfDir)
    val q = graft.text.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val total = q.agg(sum("n_tokens")).as[Long].head()
    val budget = (total * 2) / 5

    val sel = Curation.tokenBudgetSelect(docs).cache()
    val selTokens = sel.agg(sum("n_tokens")).as[Long].head()
    selTokens should be <= budget

    // the best non-selected doc would not have fit
    val dropped = q.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
      .orderBy(col("score").desc, col("doc_id")).limit(1)
      .select("n_tokens").as[Long].collect()
    if (dropped.nonEmpty) (selTokens + dropped.head) should be > budget
    sel.unpersist()
  }
}
