package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class ProfileSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("profiles mixed types with nulls in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(1.5), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, Some("b"), None, Some(Timestamp.valueOf("2024-06-01 12:00:00"))),
      (3L, None, Some(2.5), None),
      (3L, Some("a"), Some(2.5), None),
    ).toDF("id", "s", "d", "ts")
    val out = Profile.profile(df).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    out.keySet shouldBe Set("id", "s", "d", "ts")

    val id = out("id")
    id.getAs[Long]("n_rows") shouldBe 4L
    id.getAs[Long]("n_nulls") shouldBe 0L
    id.getAs[Long]("n_distinct") shouldBe 3L
    id.getAs[Double]("min_num") shouldBe 1.0
    id.getAs[Double]("max_num") shouldBe 3.0
    id.getAs[String]("min_str") shouldBe null

    val s = out("s")
    s.getAs[Long]("n_nulls") shouldBe 1L
    s.getAs[Long]("n_distinct") shouldBe 2L
    s.getAs[String]("min_str") shouldBe "a"
    s.getAs[String]("max_str") shouldBe "b"
    assert(s.isNullAt(s.fieldIndex("min_num")))

    val d = out("d")
    d.getAs[Long]("n_nulls") shouldBe 1L
    d.getAs[Long]("n_distinct") shouldBe 2L
    d.getAs[Double]("min_num") shouldBe 1.5
    d.getAs[Double]("max_num") shouldBe 2.5

    val ts = out("ts")
    ts.getAs[Long]("n_nulls") shouldBe 2L
    ts.getAs[Long]("n_distinct") shouldBe 2L
    // epoch micros as exact double
    ts.getAs[Double]("min_num") shouldBe Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000.0
  }

  test("k-anonymity: class sizes, sensitive diversity, and both flags") {
    // class (1,'A'): 3 members, 3 distinct balance bands -> l-diverse
    // but not 10-anonymous; class (2,'B'): 1 member, 1 band
    val cust = Seq(
      (1, "A", 100.00), (1, "A", 1100.00), (1, "A", 2100.00),
      (2, "B", 50.00),
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Profile.kAnonymityAudit(cust, k = 2, l = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    out((1L, "A")) shouldBe ((3L, 3L, 1L, 1L))
    out((2L, "B")) shouldBe ((1L, 1L, 0L, 0L))
  }

  test("t-closeness: skewed class far from global, mirror class at zero") {
    // Global bands over 4 rows: band0 x2, band1 x2. Class (1,'A') holds
    // both band-0 rows -> its distribution (1,0) vs global (0.5,0.5):
    // tv = 0.5 -> 500000 ppm. Class (2,'B') mirrors with both band-1
    // rows -> also 500000. A class matching the global split would be 0.
    val cust = Seq(
      (1, "A", 100.00), (1, "A", 200.00),
      (2, "B", 1100.00), (2, "B", 1200.00),
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Profile.tClosenessAudit(cust)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    out((1L, "A")) shouldBe ((2L, 500000L))
    out((2L, "B")) shouldBe ((2L, 500000L))

    // A class whose distribution equals the global one scores 0.
    val uniform = Seq(
      (1, "A", 100.00), (1, "A", 1100.00),
      (2, "B", 100.00), (2, "B", 1100.00),
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    Profile.tClosenessAudit(uniform).collect().foreach(r => r.getLong(3) shouldBe 0L)
  }

  test("observe metrics ride the job and agree with the filtered result") {
    val orders = Seq(
      ("1-URGENT", 1.0), ("3-MEDIUM", 2.0), ("1-URGENT", 3.0), ("5-LOW", 4.0),
    ).toDF("o_orderpriority", "o_totalprice")
    val r = Profile.observeFilterAudit(orders).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((4L, 2L, 2L))
  }

  test("all-null column and empty frame don't break") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val out = Profile.profile(df).collect().map(r => r.getString(0) -> r).toMap
    out("s").getAs[Long]("n_nulls") shouldBe 2L
    out("s").getAs[Long]("n_distinct") shouldBe 0L
    assert(out("s").isNullAt(out("s").fieldIndex("min_str")))
  }
}
