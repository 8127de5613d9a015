package graft.curation

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** Regression: the drift ppm lane must survive cohort counts far past
  * the ~3·10⁶-docs-per-cohort point where the old int64 formulation
  * (10⁶·|n_a·N_b − n_b·N_a| cross-multiplied in BIGINT) silently
  * wrapped under Spark's non-ANSI arithmetic. The exposed bin-level
  * entry points let the test feed synthetic multi-billion counts
  * without materializing the rows; expecteds are computed in BigInt.
  */
class DriftSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val ppm = BigInt(1000000)

  test("gapPpm is exact at multi-billion cohort counts (old int64 lane wrapped)") {
    val nA1 = 3000000000L; val nB1 = 1000000000L
    val nA2 = 2000000000L; val nB2 = 4000000000L
    val bins = Seq((1L, nA1, nB1), (2L, nA2, nB2)).toDF("len_bin", "n_a", "n_b")
    val naTot = BigInt(nA1) + BigInt(nA2)
    val nbTot = BigInt(nB1) + BigInt(nB2)
    def expected(na: Long, nb: Long): Long = {
      val d = BigInt(na) * nbTot - BigInt(nb) * naTot
      assert((ppm * d.abs).bitLength > 63, "test counts too small to catch the wrap")
      (d.signum * ((ppm * d.abs) / (naTot * nbTot))).toLong
    }
    val out = Drift.gapPpm(bins).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out shouldBe Map(1L -> expected(nA1, nB1), 2L -> expected(nA2, nB2))
  }

  test("tvPpm is exact at multi-billion cohort counts") {
    val bins = Seq(
      (1L, 3000000000L, 1000000000L),
      (2L, 2000000000L, 4000000000L)).toDF("len_bin", "n_a", "n_b")
    val naTot = BigInt(5000000000L); val nbTot = BigInt(5000000000L)
    val absdiff =
      (BigInt(3000000000L) * nbTot - BigInt(1000000000L) * naTot).abs +
        (BigInt(2000000000L) * nbTot - BigInt(4000000000L) * naTot).abs
    val expected = ((ppm * absdiff) / (2 * naTot * nbTot)).toLong
    val row = Drift.tvPpm(bins).collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe
      ((5000000000L, 5000000000L, expected))
  }

  test("an empty cohort yields gap/tv 0, never NULL (divisor guard)") {
    val bins = Seq((1L, 5L, 0L), (2L, 7L, 0L)).toDF("len_bin", "n_a", "n_b")
    val gaps = Drift.gapPpm(bins).collect()
    gaps.foreach { r =>
      r.isNullAt(3) shouldBe false
      r.getLong(3) shouldBe 0L
    }
    val tv = Drift.tvPpm(bins).collect()(0)
    tv.isNullAt(2) shouldBe false
    tv.getLong(2) shouldBe 0L
  }

  test("ksPpm: exact KS distance, argmax length, wide counts, tie -> min length") {
    // per-length cohort counts; CDFs cross-multiplied in the wide lane
    val counts = Seq(
      (10L, 4000000000L, 1000000000L),
      (20L, 0L, 3000000000L),
      (30L, 1000000000L, 1000000000L)).toDF("n_chars", "n_a", "n_b")
    val naTot = BigInt(5000000000L); val nbTot = BigInt(5000000000L)
    // dev(10) = |4e9*5e9 - 1e9*5e9| = 15e18 (wraps int64 pre-scale already)
    // dev(20) = |4e9*5e9 - 4e9*5e9| = 0; dev(30) = 0
    val maxdev = BigInt(4000000000L) * nbTot - BigInt(1000000000L) * naTot
    assert((ppm * maxdev).bitLength > 63)
    val expected = ((ppm * maxdev) / (naTot * nbTot)).toLong
    val r = Drift.ksPpm(counts).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((5000000000L, 5000000000L, expected, 10L))
  }

  test("driftKs: end-to-end on a tiny corpus matches the hand CDF walk") {
    val docs = Seq(
      (1L, "en", 5L), (2L, "en", 5L), (3L, "en", 9L),
      (4L, "de", 9L), (5L, "de", 9L), (6L, "de", 9L)
    ).toDF("doc_id", "lang", "n_chars")
    // lengths: 5 -> (a=2, b=0); 9 -> (a=1, b=3). CDF gap at 5: |2*3-0*3|=6
    // -> 6e6/(3*3)=666666 ppm; at 9 gap 0. KS = 666666 at length 5.
    val r = Drift.driftKs(docs).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((3L, 3L, 666666L, 5L))
  }

  test("streaming TV twin equals the batch operator on the real corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = Drift.driftTv(graft.Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = Drift.runStreamingDriftTv(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    streamed shouldBe batch
  }

  test("wide lane agrees with the int64 result where int64 was still exact") {
    // counts small enough that the old formulation was correct — the
    // DECIMAL(38,0) lane must be a pure widening, not a semantic change
    val bins = Seq((1L, 30L, 10L), (2L, 20L, 40L)).toDF("len_bin", "n_a", "n_b")
    val out = Drift.gapPpm(bins).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // na_tot=50, nb_tot=50: bin1 d=30*50-10*50=1000 -> 1e6*1000/2500=400000
    out shouldBe Map(1L -> 400000L, 2L -> -400000L)
    Drift.tvPpm(bins).collect()(0).getLong(2) shouldBe 400000L
  }
}
