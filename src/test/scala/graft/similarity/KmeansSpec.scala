package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** kmeansConverged semantics: the early stop is an exact quantized
  * fixed point, so once converged, deeper maxIter returns the identical
  * matrix (what makes the fixed-iteration DuckDB oracle valid), and
  * members end up with their true nearest centroid on separable data.
  */
class KmeansSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Two tight, well-separated clusters in 4-d; vec_id 0 and 1 (the
  // deterministic seeds) land one in each cluster.
  private val embeddings = {
    val clusterA = Seq(0L, 2L, 4L, 6L).map(id => (id, Array(1.0f, 0.9f, 0.05f, 0.0f + id * 0.001f)))
    val clusterB = Seq(1L, 3L, 5L, 7L).map(id => (id, Array(0.0f, 0.05f, 0.9f, 1.0f + id * 0.001f)))
    (clusterA ++ clusterB).toDF("vec_id", "embedding")
  }

  private def matrix(maxIter: Int) =
    Ann.kmeansConverged(embeddings, m = 2, maxIter = maxIter)
      .orderBy("cid", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("separable clusters: converged assignment is 4+4 and deeper maxIter is a no-op") {
    val m3 = matrix(3)
    // every (cid, dim) row counts that centroid's members: 4 per cluster
    m3.map(_._3).toSet shouldBe Set(4L)
    m3.map(_._1).toSet shouldBe Set(0L, 1L)
    // fixed point reached → more iterations change nothing
    matrix(8) shouldBe m3
  }

  test("single step equals the converged loop's first iteration input shape") {
    val step = Ann.kmeansStep(embeddings, m = 2)
      .orderBy("cid", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // same relation schema/coverage: both centroids, all 4 dims
    step.map(_._1).toSet shouldBe Set(0L, 1L)
    step.map(_._2).toSet shouldBe Set(0L, 1L, 2L, 3L)
  }
}
