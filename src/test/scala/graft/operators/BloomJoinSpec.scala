package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class BloomJoinSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every build key passes its own bitmap") {
    val keys = (1L to 500L).toDF("k")
    val bm = BloomJoin.bloomBitmap(keys, "k")
    val passed = BloomJoin.bloomPrefilter(keys, "k", bm).collect().map(_.getLong(0)).toSet
    passed shouldBe (1L to 500L).toSet
  }

  test("bloomSemiJoin is transparent: equals plain left-semi join") {
    val probe = (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "payload")
    val build = (1L to 2000L).filter(_ % 7 == 0).toDF("k")
    val viaBloom = BloomJoin.bloomSemiJoin(probe, "k", build, "k")
      .collect().map(_.getLong(0)).sorted
    val plain = probe.join(build, Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    viaBloom shouldBe plain
  }

  test("prefilter passes a superset of true matches, bounded false positives") {
    val probe = (1L to 5000L).toDF("k")
    val build = (1L to 5000L).filter(_ % 11 == 0).toDF("k")
    val bm = BloomJoin.bloomBitmap(build, "k")
    val passed = BloomJoin.bloomPrefilter(probe, "k", bm)
      .collect().map(_.getLong(0)).toSet
    val trueKeys = (1L to 5000L).filter(_ % 11 == 0).toSet
    assert(trueKeys.subsetOf(passed), "bloom dropped a true match")
    // ~455 keys in a 2^17-bit filter: fp rate ~(1-exp(-5*455/131072))^5 ≈ 1e-9
    val fp = passed -- trueKeys
    assert(fp.size <= 5, s"implausibly many false positives: ${fp.size}")
  }

  test("bitmap is a single dense row of NumWords words") {
    val bm = BloomJoin.bloomBitmap(Seq(42L).toDF("k"), "k").collect()
    bm.length shouldBe 1
    bm(0).getSeq[Long](0).length shouldBe BloomJoin.NumWords
    // exactly NumHashes bits set for one key (modulo position collisions)
    val setBits = bm(0).getSeq[Long](0).map(java.lang.Long.bitCount(_).toLong).sum
    assert(setBits >= 1 && setBits <= BloomJoin.NumHashes)
  }
}
