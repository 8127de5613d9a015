package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class PqSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** 64-dim constant vector; quarters are exact in float32, so
    * floor(x*1000) quantization is exactly 250·i per component. */
  private def const(v: Float): Seq[Float] = Seq.fill(64)(v)
  private val seeds = (0 until 16).map(i => (i.toLong, const(i * 0.25f)))

  test("ADC distance to a seed-coded vector equals the exact subspace distance sum") {
    // vec 20 copies seed 3 exactly -> every subspace code is 3, ADC table
    // distance to seed j is 64 * (250*3 - 250*j)^2 (codes(seed_j) = j)
    val emb = (seeds ++ Seq((20L, const(0.75f)))).toDF("vec_id", "embedding")
    val out = Pq.pqAdcTopK(emb, emb.where($"vec_id" === 20L), 16).collect()
      .map(r => r.getAs[Long]("n_id") -> r.getAs[Long]("approx_dist")).toMap
    for (j <- 0 until 16)
      out(j.toLong) shouldBe 64L * 250L * 250L * (3L - j) * (3L - j)
  }

  test("ranking: nearest codeword wins; ties break by n_id; self excluded") {
    val emb = (seeds ++ Seq((20L, const(0.75f)), (21L, const(1.75f)))).toDF("vec_id", "embedding")
    val out = Pq.pqAdcTopK(emb, emb.where($"vec_id" === 20L), 5).collect()
      .sortBy(_.getAs[Long]("rank"))
    // query 20 ≡ seed 3: rank 1 is vec 3 (ADC 0); self never appears
    out.head.getAs[Long]("n_id") shouldBe 3L
    out.head.getAs[Long]("approx_dist") shouldBe 0L
    out.map(_.getAs[Long]("n_id")) should not contain 20L
    val ds = out.map(_.getAs[Long]("approx_dist"))
    ds.sorted shouldBe ds
    // seeds 2 and 4 tie one codeword away (64 * 250^2); id order breaks it
    out(1).getAs[Long]("n_id") shouldBe 2L
    out(2).getAs[Long]("n_id") shouldBe 4L
    out(1).getAs[Long]("approx_dist") shouldBe 64L * 250L * 250L
    out(2).getAs[Long]("approx_dist") shouldBe 64L * 250L * 250L
  }

  test("a vector coded by a different seed per subspace sums mixed table distances") {
    // first 16 dims match seed 1, remaining 48 dims match seed 2:
    // subspace 0 codes to 1, subspaces 1-3 code to 2
    val mixed = (Seq.fill(16)(0.25f) ++ Seq.fill(48)(0.5f)).toSeq
    val emb = (seeds ++ Seq((30L, mixed))).toDF("vec_id", "embedding")
    // query = seed 0 (all zeros): table distance per dim is (250*code)^2
    val out = Pq.pqAdcTopK(emb, emb.where($"vec_id" === 0L), 20).collect()
      .map(r => r.getAs[Long]("n_id") -> r.getAs[Long]("approx_dist")).toMap
    out(30L) shouldBe 16L * 250L * 250L + 48L * 500L * 500L
  }
}
