package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{Tables, TestSpark}

class DqAuditSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("dq audit counts violations per rule on crafted data") {
    val li = Seq(
      (1L, 5.0, 0.05, "A", "1994-01-05"),
      (1L, -2.0, 0.05, "N", "1994-01-05"), // quantity violation
      (2L, 3.0, 1.5, "X", "1994-01-01"),   // discount + returnflag violations
      (9L, 1.0, 0.0, "R", "1994-01-05"))   // orphan (no order 9)
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag", "ship")
      .selectExpr("l_orderkey", "l_quantity", "l_discount", "l_returnflag",
        "CAST(ship AS TIMESTAMP) AS l_shipdate")
    val o = Seq(
      (1L, 100.0, "O", "1994-01-02"),  // lines on 01-05: fine
      (2L, -5.0, "Z", "1994-01-03"))   // totalprice + status violations; its line ships 01-01 < 01-03
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus", "od")
      .selectExpr("o_orderkey", "o_totalprice", "o_orderstatus",
        "CAST(od AS TIMESTAMP) AS o_orderdate")
    val out = Profile.dqConstraintAudit(li, o)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out("lineitem.quantity_positive") shouldBe ((4L, 1L))
    out("lineitem.discount_in_0_1") shouldBe ((4L, 1L))
    out("lineitem.returnflag_domain") shouldBe ((4L, 1L))
    out("orders.totalprice_positive") shouldBe ((2L, 1L))
    out("orders.status_domain") shouldBe ((2L, 1L))
    out("lineitem.orderkey_in_orders") shouldBe ((4L, 1L))
    // only 3 lines join to an order; one ships before its order date
    out("lineitem.shipdate_after_orderdate") shouldBe ((3L, 1L))
  }

  test("dq audit on real data: shipdate rule fails, the others hold") {
    val out = Profile.dqConstraintAudit(
      Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Tables.orders(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    out("lineitem.orderkey_in_orders") shouldBe 0L
    out("lineitem.quantity_positive") shouldBe 0L
    out("lineitem.shipdate_after_orderdate") should be > 0L
  }
}
