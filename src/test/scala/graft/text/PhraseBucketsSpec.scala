package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{Tables, TestSpark}

class PhraseBucketsSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("phrase mining promotes a glued pair over an incidental one") {
    // "new york" always adjacent; "the cat"/"the dog" dilute "the"
    val docs = Seq(
      (1L, "travel to new york from home", "en", "s", 30L),
      (2L, "flights to new york are long", "en", "s", 30L),
      (3L, "new york new york big city", "en", "s", 30L),
      (4L, "the cat and the dog ran home to the city", "en", "s", 40L),
      (5L, "the cat saw the dog near the city gates", "en", "s", 40L),
      (6L, "new york held the cat show", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = BigramLm.phraseMiningPmi(docs, minCount = 3, discount = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val byPair = out.map(r => (r._1, r._2) -> r._3).toMap
    byPair should contain key ("new" -> "york")
    // "new york": every 'new' is followed by 'york' — maximal association;
    // "the cat" shares 'the' with 'the dog'/'the city' → lower score
    if (byPair.contains(("the", "cat")))
      byPair(("new", "york")) should be > byPair(("the", "cat"))
  }

  test("phrase mining is deterministic under repartitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = BigramLm.phraseMiningPmi(docs, 5, 2, 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val b = BigramLm.phraseMiningPmi(docs.repartition(7), 5, 2, 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    a shouldBe b
  }

  test("perplexity buckets: every doc bucketed, terciles roughly balanced per language") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = BigramLm.perplexityBuckets(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    rows.length shouldBe docs.count()
    rows.map(_._3).toSet shouldBe Set("head", "middle", "tail")
    // per-language: tail must hold at least a third (percentile_disc
    // guarantees run*3 >= tot at the threshold), head at most two thirds
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val n = rs.length
      val tail = rs.count(_._3 == "tail")
      tail * 3 should be >= n
      (rs.count(_._3 == "head") * 3) should be <= (2 * n)
    }
  }
}
