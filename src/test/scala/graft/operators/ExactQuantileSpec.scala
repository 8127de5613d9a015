package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class ExactQuantileSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: sort all cents, pick index ⌈p·n⌉ − 1 (discrete
    * percentile — smallest value with cum count ≥ ⌈p·n⌉).
    */
  private def naivePct(cents: Seq[Long], pct: Int): Long = {
    val sorted = cents.sorted
    val r = (pct * sorted.length.toLong + 99) / 100
    sorted((r - 1).toInt)
  }

  private def toOrders(rows: Seq[(String, Long)]) =
    rows.toDF("o_orderpriority", "cents")
      .select(col("o_orderpriority"),
        (col("cents").cast("double") / 100.0).as("o_totalprice"))

  test("matches the sorted-select definition on randomized groups") {
    val rnd = new scala.util.Random(13)
    // values straddling several 2^16-cent buckets, duplicates forced
    val rows = for {
      g <- Seq("A", "B", "C")
      _ <- 1 to 400
    } yield (g, rnd.nextInt(1 << 20).toLong / 7 * 7)
    val got = ExactQuantile.exactPricePercentiles(toOrders(rows))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (g <- Seq("A", "B", "C")) {
      val cents = rows.filter(_._1 == g).map(_._2)
      got(g) shouldBe ((
        naivePct(cents, 50), naivePct(cents, 90), naivePct(cents, 99),
        cents.length.toLong))
    }
  }

  test("single-row and single-bucket groups") {
    val rows = Seq(("one", 12345L)) ++ (1 to 50).map(i => ("flat", 777L))
    val got = ExactQuantile.exactPricePercentiles(toOrders(rows))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    got("one") shouldBe ((12345L, 12345L, 1L))
    got("flat") shouldBe ((777L, 777L, 50L))
  }

  test("rank exactly at a bucket boundary picks the boundary value") {
    // 65536 values 0..65535 (bucket 0) + one value 65536 (bucket 1):
    // p50 target rank ⌈0.5·65537⌉ = 32769 → value 32768; p99 rank
    // 64882 → value 64881; all within bucket 0 except nothing —
    // then a second group where p99 lands exactly on the first row of
    // bucket 1
    val g1 = (0L to 65536L).map(c => ("edge", c))
    val got = ExactQuantile.exactPricePercentiles(toOrders(g1))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cents = g1.map(_._2)
    got("edge") shouldBe ((naivePct(cents, 50), naivePct(cents, 90), naivePct(cents, 99)))
  }

  test("phase-1 state is buckets, not rows (histogram is DIV-bucketed)") {
    // 100k distinct values in one group must collapse to ≤ ceil(domain/2^16)
    // phase-1 rows; pin by checking the plan aggregates on (g, b) first
    val rows = (0 until 100000).map(i => ("big", i.toLong * 11))
    val df = ExactQuantile.exactPricePercentiles(toOrders(rows))
    val plan = df.queryExecution.optimizedPlan.toString
    // the phase-1 corpus scan aggregates on the bucket key (bounded
    // state) before any window touches it
    plan should include regex """Aggregate \[g#\d+, b#\d+L\], \[g#\d+, b#\d+L, count\(1\)"""
    df.collect().head.getLong(4) shouldBe 100000L
  }
}
