package graft.text

import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class HashedLinearSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def milliWeight(f: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(f.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  test("score_milli is the exact sum of md5 milli-weights over uni+bigrams") {
    val docs = Seq(1L -> "alpha beta alpha").toDF("doc_id", "text")
    val out = HashedLinear.hashedLinearScore(docs).collect()(0)
    // features: alpha, beta, "alpha beta", "beta alpha" (distinct)
    val feats = Seq("alpha", "beta", "alpha beta", "beta alpha")
    out.getAs[Long]("n_features") shouldBe 4L
    val expected = feats.map(milliWeight).sum
    out.getAs[Long]("score_milli") shouldBe expected
    out.getAs[Double]("score") shouldBe expected.toDouble / 4000.0
    out.getAs[Boolean]("label") shouldBe (expected > 0)
  }

  test("case and surrounding whitespace are normalized") {
    val docs = Seq(1L -> "  Alpha BETA  ", 2L -> "alpha beta").toDF("doc_id", "text")
    val rows = HashedLinear.hashedLinearScore(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("score_milli")).toMap
    rows(1L) shouldBe rows(2L)
  }

  test("empty and single-token docs") {
    val docs = Seq(1L -> "", 2L -> "solo").toDF("doc_id", "text")
    val rows = HashedLinear.hashedLinearScore(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    rows(1L).getAs[Long]("n_features") shouldBe 0L
    rows(1L).getAs[Long]("score_milli") shouldBe 0L
    rows(1L).getAs[Double]("score") shouldBe 0.0
    rows(2L).getAs[Long]("n_features") shouldBe 1L
    rows(2L).getAs[Long]("score_milli") shouldBe milliWeight("solo")
  }
}
