package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class AnnSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // v2 = 2*v1 (cosine 1 with v1), v3 orthogonal-ish to v1
  private val v1 = Array.tabulate(64)(i => if (i < 32) 1.0f else 0.0f)
  private val v2 = Array.tabulate(64)(i => if (i < 32) 2.0f else 0.0f)
  private val v3 = Array.tabulate(64)(i => if (i >= 32) 1.0f else 0.0f)
  private val emb = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")

  test("brute-force top-k ranks the colinear vector first") {
    val out = Ann.bruteForceTopK(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    out.length shouldBe 2
    out(0)._2 shouldBe 2L // rank 1 = colinear vector
    out(0)._3 shouldBe 1.0 +- 1e-12 // cosine; sqrt of unequal norms rounds
    out(1)._2 shouldBe 3L
    out(1)._3 shouldBe 0.0 +- 1e-12
  }

  test("multi-probe LSH recall is a superset of single-bucket LSH") {
    val single = Ann.lshTopK(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(_.getLong(1)).toSet
    val multi = Ann.lshTopKMultiProbe(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(_.getLong(1)).toSet
    single.subsetOf(multi) shouldBe true
    multi should contain(2L)
  }

  test("IVF top-k finds the colinear neighbor through its inverted list") {
    // m=2 centroids = vectors 1 and 2 (colinear) -> all three vectors'
    // nearest centroid lists overlap for query 1; neighbor 2 must rank 1
    val out = Ann.ivfTopK(emb, emb.where(col("vec_id") === 1), k = 2, m = 2, nprobe = 2)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    out.head._2 shouldBe 2L
    out.head._3 shouldBe 1.0 +- 1e-12
  }

  test("LSH top-k finds same-bucket colinear neighbor") {
    val out = Ann.lshTopK(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
    // colinear vectors have identical sign patterns on every hyperplane
    out.map(_._2) should contain(2L)
    out.find(_._2 == 2L).get._3 shouldBe 1.0 +- 1e-12
  }
}
