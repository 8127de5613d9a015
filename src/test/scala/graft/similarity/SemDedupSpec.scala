package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Semantics of the SemDeDup composition that the DuckDB oracle can't
  * see from the outside: the keep rule's invariants and the τ knob's
  * monotonicity.
  */
class SemDedupSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("verdict covers every vector exactly once and prunes a non-trivial subset") {
    val out = SemDedup.semDedupPrune(emb).cache()
    val total = emb.count()
    out.count() shouldBe total
    out.select(countDistinct("vec_id")).head.getLong(0) shouldBe total
    val pruned = out.where(col("pruned") === 1).count()
    pruned should be > 0L
    pruned should be < total
    out.unpersist()
  }

  test("each cluster's smallest vec_id always survives (it has no prior neighbor)") {
    val out = SemDedup.semDedupPrune(emb)
    val firsts = out.groupBy("cid").agg(min("vec_id").as("vec_id"))
    out.join(firsts, Seq("cid", "vec_id"))
      .where(col("pruned") === 1 || col("max_prior_sim").isNotNull)
      .count() shouldBe 0L
  }

  test("raising tau prunes monotonically fewer vectors") {
    def prunedAt(tau: Double): Long =
      SemDedup.semDedupPrune(emb, tau = tau).where(col("pruned") === 1).count()
    val loose = prunedAt(0.25)
    val tight = prunedAt(0.40)
    loose should be >= tight
    // both regimes are non-degenerate on the harness embeddings
    loose should be > 0L
  }

  test("stats roll the verdict up exactly") {
    val verdict = SemDedup.semDedupPrune(emb).cache()
    val stats = SemDedup.semDedupStats(emb).cache()
    stats.agg(sum("n_members")).head.getLong(0) shouldBe verdict.count()
    stats.agg(sum("n_pruned")).head.getLong(0) shouldBe
      verdict.where(col("pruned") === 1).count()
    stats.where(col("keep_rate") < 0.0 || col("keep_rate") > 1.0).count() shouldBe 0L
    verdict.unpersist(); stats.unpersist()
  }
}
