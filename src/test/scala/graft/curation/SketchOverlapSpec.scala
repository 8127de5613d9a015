package graft.curation

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class SketchOverlapSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "lang", "text")

  test("k >= union: the KMV estimate degrades to the exact Jaccard") {
    // cohort a = {x, y, z}, cohort b = {y, z, w}: J = 2/4 = 500 permille
    val d = docs(
      (1L, "en", "x x"), (2L, "en", "y y"), (3L, "en", "z z"),
      (4L, "de", "y y"), (5L, "de", "z z"), (6L, "de", "w w"))
    val r = SketchOverlap.kmvCohortOverlap(d, k = 256).collect()(0)
    val (k, skUnion, estInter, estJ) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (exUnion, exInter, exJ) = (r.getLong(4), r.getLong(5), r.getLong(6))
    k shouldBe 256L
    (exUnion, exInter, exJ) shouldBe ((4L, 2L, 500L))
    // with the whole union inside the sketch, estimate == exact
    (skUnion, estInter, estJ) shouldBe ((4L, 2L, 500L))
  }

  test("duplicate texts within a cohort collapse (sketch is over distinct hashes)") {
    val d = docs(
      (1L, "en", "same doc"), (2L, "en", "same doc"), (3L, "en", "same doc"),
      (4L, "de", "same doc"))
    val r = SketchOverlap.kmvCohortOverlap(d).collect()(0)
    (r.getLong(4), r.getLong(5), r.getLong(6)) shouldBe ((1L, 1L, 1000L))
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((1L, 1L, 1000L))
  }

  test("whitespace normalization: tab/multi-space variants hash identically") {
    val d = docs(
      (1L, "en", "alpha  beta\tgamma"),
      (2L, "de", "alpha beta gamma"))
    val r = SketchOverlap.kmvCohortOverlap(d).collect()(0)
    (r.getLong(4), r.getLong(5), r.getLong(6)) shouldBe ((1L, 1L, 1000L))
  }

  test("small k: sketch_union is capped at k and the estimate stays in range") {
    val d = docs(
      (1 to 40).map(i => (i.toLong, "en", s"english doc number $i unique")) ++
        (41 to 80).map(i => (i.toLong, "de", s"german doc number $i unique")) ++
        (81 to 100).map(i => (i.toLong, "en", s"shared doc $i")) ++
        (101 to 120).map(i => (i.toLong, "de", s"shared doc ${i - 20}")): _*)
    // union = 40 + 40 + 20 = 100 distinct, inter = 20 -> exact J = 200
    val r = SketchOverlap.kmvCohortOverlap(d, k = 16).collect()(0)
    (r.getLong(4), r.getLong(5), r.getLong(6)) shouldBe ((100L, 20L, 200L))
    r.getLong(1) shouldBe 16L            // sketch union capped at k
    r.getLong(2) should be <= 16L        // est_inter within the sketch
    r.getLong(3) should (be >= 0L and be <= 1000L)
  }
}
