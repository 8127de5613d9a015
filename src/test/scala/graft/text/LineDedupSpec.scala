package graft.text

import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class LineDedupSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("boilerplate line dropped from every doc, order preserved") {
    val banner = "Accept all cookies to continue."
    val docs = Seq(
      1L -> s"alpha one\n$banner\nalpha two",
      2L -> s"$banner\nbeta one\nbeta two",
      3L -> "gamma only unique lines\ngamma two",
    ).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Long]("n_lines") shouldBe 3L
    out(1L).getAs[Long]("n_dropped") shouldBe 1L
    out(1L).getAs[Long]("n_kept") shouldBe 2L
    out(1L).getAs[String]("clean_md5") shouldBe md5hex("alpha one\nalpha two")
    // banner at a DIFFERENT position in doc 2 — still dropped, order kept
    out(2L).getAs[String]("clean_md5") shouldBe md5hex("beta one\nbeta two")
    out(3L).getAs[Long]("n_dropped") shouldBe 0L
    out(3L).getAs[String]("clean_md5") shouldBe md5hex("gamma only unique lines\ngamma two")
  }

  test("normalization: leading/trailing whitespace variants are the same line") {
    val docs = Seq(
      1L -> "  shared line \nuniq a",
      2L -> "shared line\nuniq b",
    ).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Long]("n_dropped") shouldBe 1L
    out(2L).getAs[Long]("n_dropped") shouldBe 1L
    // the ORIGINAL (untrimmed) line text is what gets dropped/kept
    out(1L).getAs[String]("clean_md5") shouldBe md5hex("uniq a")
  }

  test("within-doc repeats don't count as cross-doc boilerplate") {
    val docs = Seq(
      1L -> "echo\necho\nuniq one",
      2L -> "other\nlines here",
    ).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "echo" appears twice but only in ONE doc → kept
    out(1L).getAs[Long]("n_dropped") shouldBe 0L
    out(1L).getAs[String]("clean_md5") shouldBe md5hex("echo\necho\nuniq one")
  }

  test("doc reduced to nothing hashes the empty rebuild") {
    val docs = Seq(
      1L -> "common a\ncommon b",
      2L -> "common a\ncommon b\nextra line",
    ).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Long]("n_kept") shouldBe 0L
    out(1L).getAs[String]("clean_md5") shouldBe md5hex("")
    out(2L).getAs[String]("clean_md5") shouldBe md5hex("extra line")
  }
}
