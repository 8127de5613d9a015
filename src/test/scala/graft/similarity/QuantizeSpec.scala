package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class QuantizeSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Four well-separated vectors: v2 colinear with v1 (SQ8/RP must keep
  // it rank-1 for query 1), v3 orthogonal, v4 a far outlier.
  private val v1 = Array.tabulate(64)(i => if (i < 32) 1.0f else 0.0f)
  private val v2 = Array.tabulate(64)(i => if (i < 32) 2.0f else 0.0f)
  private val v3 = Array.tabulate(64)(i => if (i >= 32) 1.0f else 0.0f)
  private val v4 = Array.fill(64)(50.0f)
  private val emb = Seq((0L, v1), (1L, v2), (2L, v3), (3L, v4)).toDF("vec_id", "embedding")

  test("SQ8 codes stay in 0..255 and span the range per dimension") {
    val stats = Quantize.sq8Stats(emb).collect()
    stats.length shouldBe 4
    all(stats.map(_.getLong(2))) should be >= 0L // c_min
    all(stats.map(_.getLong(3))) should be <= 255L // c_max
    // v4 is the per-dim max everywhere -> all-255 codes
    val v4row = stats.find(_.getLong(0) == 3L).get
    v4row.getLong(2) shouldBe 255L
    v4row.getLong(3) shouldBe 255L
  }

  test("SQ8 recall is perfect on well-separated vectors") {
    val out = Quantize.sq8Recall(emb, nQueries = 2, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.keySet shouldBe Set(0L, 1L)
    // hits*1000/k == 1000 -> the SQ8 top-2 equals the exact top-2
    out(0L) shouldBe 1000L
    out(1L) shouldBe 1000L
  }

  test("RP projected top-k preserves the inner-product order") {
    // Inner-product ranking for v1: v4 (huge norm) > v2 (colinear) > v3
    // (orthogonal) — the projection must keep that order.
    val out = Quantize.rpTopK(emb, nQueries = 1, k = 3)
      .orderBy("rank").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(3L, 1L, 2L)
  }

  test("RP projection doubles with the input (linearity)") {
    val p = Quantize.rpProject(emb, dims = 16)
      .where(col("vec_id") < 2).orderBy("vec_id")
      .collect().map(_.getSeq[Long](1))
    p(1) shouldBe p(0).map(_ * 2L)
  }

  test("Mahalanobis outlier ranking puts the far vector first") {
    val top = Quantize.outliers(emb, n = 1).collect()
    top.head.getLong(0) shouldBe 3L
  }
}
