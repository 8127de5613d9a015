package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class MarketBasketSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // baskets: o1{1,2} o2{1,2} o3{1,2,3} o4{1}; duplicate line in o1
  // exercises the distinct reduction
  private val lineitem = Seq(
    (1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L), (3L, 3L), (4L, 1L),
  ).toDF("l_orderkey", "l_partkey")

  test("association rules: exact support, integer-permille confidence and lift") {
    val out = MarketBasket.assocRules(lineitem, minSup = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // support(1,2)=3; n_1=4, n_2=3, n_orders=4
    // conf(1->2)=3000/4=750, lift=1000*3*4/(4*3)=1000
    out shouldBe Map(
      (1L, 2L) -> ((3L, 750L, 1000L)),
      (2L, 1L) -> ((3L, 1000L, 1000L)))
  }

  test("mega-baskets above the cap drop out of every statistic") {
    val out = MarketBasket.assocRules(lineitem, minSup = 2, maxBasket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // o3 (3 items) excluded -> support(1,2) falls to 2; n_orders=3, n_1=3, n_2=2
    out.keySet shouldBe Set((1L, 2L), (2L, 1L))
    out((1L, 2L)) shouldBe 2L
  }
}
