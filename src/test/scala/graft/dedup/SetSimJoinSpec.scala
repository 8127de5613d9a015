package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class SetSimJoinSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("exact pairs with known Jaccard, threshold respected") {
    val docs = Seq(
      1L -> "apple banana cherry date",        // {apple banana cherry date}
      2L -> "apple banana cherry elderberry",  // J(1,2) = 3/5 = 0.6
      3L -> "apple zebra yak xylophone",       // J(1,3) = 1/7 < t
      4L -> "apple banana cherry date",        // J(1,4) = 1.0
    ).toDF("doc_id", "text")
    val out = SetSimJoin.jaccardJoin(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_inter"), r.getAs[Double]("jaccard"))).toMap
    out.keySet shouldBe Set((1L, 2L), (1L, 4L), (2L, 4L))
    out((1L, 2L)) shouldBe ((3L, 0.6))
    out((1L, 4L)) shouldBe ((4L, 1.0))
    out((2L, 4L)) shouldBe ((3L, 0.6))
  }

  test("matches brute force on a randomized corpus (completeness)") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (1L to 60L).map { id =>
      val n = 3 + rnd.nextInt(10)
      id -> rnd.shuffle(vocab).take(n).mkString(" ")
    }.toDF("doc_id", "text")
    val t = 0.4
    val got = SetSimJoin.jaccardJoin(docs, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force in Scala
    val sets = docs.collect().map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet).toMap
    val expect = (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if j >= t
    } yield (a, b)).toSet
    got shouldBe expect
  }

  test("case/whitespace normalization and duplicate tokens collapse") {
    val docs = Seq(
      1L -> "  Apple APPLE banana   banana ",
      2L -> "apple banana",
    ).toDF("doc_id", "text")
    val out = SetSimJoin.jaccardJoin(docs, 0.9).collect()
    out.length shouldBe 1
    out(0).getAs[Double]("jaccard") shouldBe 1.0
    out(0).getAs[Long]("n_a") shouldBe 2L
  }

  test("boundary pair with Jaccard exactly t survives every filter (float-ceil regression)") {
    // |x| = 63 ⊂ |y| = 70: J = 63/70 = 0.9 exactly. In doubles,
    // 0.9*70 ceils to 64 and 0.9/1.9*133 ceils to 64 (> exact 63) —
    // integer-threshold formulations of the prefix/length/positional
    // filters all drop this pair. The Jaccard-form filters must not.
    val xToks = (1 to 63).map(i => f"tok$i%03d")
    val yToks = (1 to 70).map(i => f"tok$i%03d")
    val docs = Seq(1L -> xToks.mkString(" "), 2L -> yToks.mkString(" ")).toDF("doc_id", "text")
    val out = SetSimJoin.jaccardJoin(docs, 0.9).collect()
    out.length shouldBe 1
    out(0).getAs[Long]("n_inter") shouldBe 63L
    out(0).getAs[Double]("jaccard") shouldBe (63.0 / 70.0)
  }

  test("empty and single-token docs don't break; no self pairs") {
    val docs = Seq(1L -> "", 2L -> "solo", 3L -> "solo", 4L -> "   ").toDF("doc_id", "text")
    val out = SetSimJoin.jaccardJoin(docs, 0.5).collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((2L, 3L))
  }
}
