package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class FellegiSunterSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 4 records in one block: two full agreements, one partial, one miss
  private val parts = Seq(
    (1L, "widget", "B1", "T1", 5),
    (2L, "widget", "B1", "T1", 5), // agrees with 1 on all three
    (3L, "widget", "B1", "T2", 7), // agrees on brand only
    (4L, "widget", "B2", "T2", 5), // agrees with 1/2 on size only
    (5L, "gear", "B1", "T1", 5),   // different block: never paired
  ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")

  test("likelihood ratio matches the hand-computed exact rational") {
    // u stats over N=5: brand B1×4,B2×1 → un=17, ud=25
    //   u_pm = round(1e4·17/25) = 6800
    // type T1×3,T2×2 → un=13 → u_pm = 5200
    // size 5×4,7×1 → un=17 → u_pm = 6800
    // pair (1,2): all agree →
    //   R = (9e4/(10·6800))·(19e4/(20·5200))·(4e4/(5·6800))
    // num = 9e4·19e4·4e4 = 6.84e14; den = 68000·104000·34000 = 2.40448e14
    // R ≈ 2.845 < 20 → filtered out at default threshold! So compute
    // scores pre-threshold by lowering: verify via the raw relation
    // by checking the surviving set at threshold 20 is empty, then
    // hand-check score arithmetic through a 2-agreement corpus where
    // rare values push R over 20.
    val out = FellegiSunter.partLinkage(parts).collect()
    out shouldBe empty

    // rare-value corpus: 20 distinct brands/types/sizes → u_pm small,
    // agreements highly informative
    val rare = (1 to 20).map(i => (i.toLong, "blk", s"B$i", s"T$i", i)) ++
      Seq((100L, "blk", "B1", "T1", 1))
    val df = rare.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    // u: each field has one value with cnt=2, 19 with cnt=1 → un=23,
    // ud=441 → u_pm = round(1e4·23/441) = round(521.54) = 522
    // pair (1,100) agrees on all three:
    // num = 9e4·19e4·4e4 = 684e12
    // den = (10·522)·(20·522)·(5·522) = 5220·10440·2610 = 1.42243e11
    // R ≈ 4808 ≥ 20; score_ppm = 1e6·num DIV den
    val got = FellegiSunter.partLinkage(df).collect()
    got.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 100L))
    val num = BigInt(90000L) * 190000L * 40000L
    val den = BigInt(5220L) * 10440L * 2610L
    got.head.getLong(5) shouldBe (BigInt(1000000) * num / den).toLong
  }

  test("u statistics ride a decimal lane and the stats join is broadcast") {
    val df = FellegiSunter.partLinkage(parts)
    val plan = df.queryExecution.optimizedPlan.toString
    plan should include("decimal(38,0)")
    plan.toLowerCase should include("strategy=broadcast")
  }

  test("pairs only form inside a block") {
    val two = Seq(
      (1L, "a", "B1", "T1", 1),
      (2L, "b", "B1", "T1", 1)).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    FellegiSunter.partLinkage(two).collect() shouldBe empty
  }
}
