package graft.text

import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class MojibakeSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("double-encoded sequences are detected and repaired") {
    val docs = Seq(
      1L -> "CafÃ© et crÃ¨me",     // é, è mojibake
      2L -> "clean ascii text",
      3L -> "â€œquotedâ€™ text",   // “ and ’ mojibake
    ).toDF("doc_id", "text")
    val out = Mojibake.mojibakeScan(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Boolean]("is_suspect") shouldBe true
    out(1L).getAs[Boolean]("changed") shouldBe true
    out(1L).getAs[Long]("n_latin_pairs") shouldBe 2L // 'Ã©' and 'Ã¨': one each
    out(1L).getAs[String]("fixed_md5") shouldBe md5hex("Café et crème")
    out(2L).getAs[Boolean]("is_suspect") shouldBe false
    out(2L).getAs[Boolean]("changed") shouldBe false
    out(2L).getAs[String]("fixed_md5") shouldBe md5hex("clean ascii text")
    out(3L).getAs[Boolean]("is_suspect") shouldBe true
    out(3L).getAs[String]("fixed_md5") shouldBe md5hex("“quoted’ text")
  }

  test("replacement characters are counted and stripped") {
    val docs = Seq(1L -> "lost�char�").toDF("doc_id", "text")
    val out = Mojibake.mojibakeScan(docs).collect()(0)
    out.getAs[Long]("n_repl") shouldBe 2L
    out.getAs[Boolean]("is_suspect") shouldBe true
    out.getAs[String]("fixed_md5") shouldBe md5hex("lostchar")
  }

  test("injection covers every cohort; clean cohorts stay untouched") {
    val docs = (0L to 13L).map(i => i -> "base text").toDF("doc_id", "text")
    val out = Mojibake.mojibakeScan(Mojibake.withInjectedMojibake(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (i <- 0L to 13L) {
      val suspect = out(i).getAs[Boolean]("is_suspect")
      if (i % 7 <= 4) assert(suspect, s"cohort ${i % 7} should be suspect (doc $i)")
      else {
        assert(!suspect, s"cohort ${i % 7} should be clean (doc $i)")
        out(i).getAs[String]("fixed_md5") shouldBe md5hex("base text")
      }
    }
    // cohort 0 repair: 'CafÃ©' -> 'Café' ('Ã ' of 'dÃ©jÃ ' has no repair pair, stays)
    out(0L).getAs[Boolean]("changed") shouldBe true
    out(7L).getAs[Boolean]("changed") shouldBe true
  }
}
