package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class DotI64Spec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  test("dot_i64 is available via SparkSessionExtensions-injected SQL") {
    spark.sql("SELECT dot_i64(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0) shouldBe 32L
  }

  test("dot_i64 matches the HOF formulation and handles edge shapes") {
    val rows = spark.sql(
      """SELECT
        |  dot_i64(array(1L, -2L), array(-3L, 4L)) AS neg,
        |  dot_i64(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS empty,
        |  dot_i64(array(7L), array(2L, 9L)) AS shorter,
        |  aggregate(zip_with(array(3L, 5L), array(11L, 13L), (x, y) -> x * y), 0L, (a, v) -> a + v) AS hof,
        |  dot_i64(array(3L, 5L), array(11L, 13L)) AS same
        |""".stripMargin).collect()(0)
    rows.getLong(0) shouldBe -11L
    rows.getLong(1) shouldBe 0L
    rows.getLong(2) shouldBe 14L
    rows.getLong(4) shouldBe rows.getLong(3)
  }

  test("kmer_windows generator is SQL-callable through the same extension") {
    val words = spark.sql("SELECT kmer_windows('ABAB', 2) AS word")
      .collect().map(_.getString(0)).toSeq
    words shouldBe Seq("AB", "BA", "AB")
  }
}
