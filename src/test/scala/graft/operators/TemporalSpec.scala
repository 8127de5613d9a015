package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class TemporalSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("snapshot as-of applies only changes at or before T, deletes suppress keys") {
    // key 3 (%10==3): insert day 0, update day 30 (+10%)
    // key 7 (%10==7): insert day 0, delete day 60
    // key 1: insert only; key 13: update lands AFTER T -> insert wins
    val orders = Seq(
      (3L, d("1992-01-01"), 100.00),
      (7L, d("1992-01-01"), 50.00),
      (1L, d("1992-01-01"), 20.00),
      (13L, d("1992-02-15"), 100.00), // update at day 45+30=75 > T
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val at70 = Temporal.snapshotAsOf(orders, tDay = 70L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    at70 shouldBe Map(
      3L -> (("U", 11000L)), // 10000 + 10000 div 10
      1L -> (("I", 2000L)),
      13L -> (("I", 10000L))) // key 7 deleted at day 60 <= 70
    val at40 = Temporal.snapshotAsOf(orders, tDay = 40L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    at40(7L) shouldBe "I" // delete (day 60) not yet visible
  }

  test("gap-fill carries the last observation forward and marks gaps") {
    val orders = Seq(
      (d("1992-01-01"), 10.00), (d("1992-01-02"), 20.00), (d("1992-01-05"), 5.00),
    ).map { case (dt, p) => (dt, p, "1-URGENT") }
      .toDF("o_orderdate", "o_totalprice", "o_orderpriority")
    val out = Temporal.gapfillLocf(orders).orderBy("day_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq(
      (0L, 1000L, 0L), (1L, 2000L, 0L),
      (2L, 2000L, 1L), (3L, 2000L, 1L), // gaps filled from day 1
      (4L, 500L, 0L))
  }

  test("histogram store merges by addition and quantiles land on the right bin") {
    // 10 orders in Jan 1995: 9 at ~10k cents (bin 0), 1 at ~2.5M (bin 2)
    val orders = ((1 to 9).map(i => (d("1995-01-0" + i), 100.00)) :+
      (d("1995-01-15"), 25000.00)).toDF("o_orderdate", "o_totalprice")
    val out = Temporal.histogramQuantiles(orders,
      loMonth = 1995L * 12, hiMonth = 1995L * 12 + 11, binCents = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(500L) shouldBe 0L // p50 in bin 0
    out(990L) shouldBe 2000000L // p99 crosses into the 2.5M order's bin
  }
}
