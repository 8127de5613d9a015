package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class AsOfSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks the latest right row at or before each left time") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 7L, 102L), (2L, 5L, 200L))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 8L, 1000L), (1L, 15L, 1001L), (2L, 99L, 2000L))
      .toDF("k", "t", "p")
    val out = AsOf.asOfJoin(left, right, "k", "t", "p")
      .collect().map(r => r.getAs[Long]("ev") -> Option(r.getAs[Any]("p"))).toMap
    out shouldBe Map(
      100L -> Some(1000L), // t=10: latest right at 8
      101L -> Some(1001L), // t=20: latest right at 15
      102L -> None, // t=7: nothing at or before
      200L -> None) // right row is after the event
  }

  test("as-of join is inclusive at equal timestamps") {
    val left = Seq((1L, 8L, 1L)).toDF("k", "t", "ev")
    val right = Seq((1L, 8L, 42L)).toDF("k", "t", "p")
    AsOf.asOfJoin(left, right, "k", "t", "p")
      .collect()(0).getAs[Long]("p") shouldBe 42L
  }

  test("tolerance: staleness is measured at the matched payload's row, not a null-payload row") {
    // right: payload A at t=0, then a NULL-payload row at t=5000. The
    // carried payload is A (from t=0); a left row at t=5500 with 1s
    // tolerance must see A as 5500ms stale → NULL — the null-payload
    // row must not advance the staleness clock.
    val left = Seq((1L, 5500L, 1L)).toDF("k", "t", "ev")
    val right = Seq((1L, 0L, Some(10L)), (1L, 5000L, Option.empty[Long]))
      .toDF("k", "t", "p")
    Option(
      AsOf.asOfJoin(left, right, "k", "t", "p", toleranceMs = Some(1000L))
        .collect()(0).getAs[Any]("p")) shouldBe None
    // and with a tolerance that covers the real match age, A is kept
    AsOf.asOfJoin(left, right, "k", "t", "p", toleranceMs = Some(10000L))
      .collect()(0).getAs[Long]("p") shouldBe 10L
  }
}
