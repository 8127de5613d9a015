package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class AnalyticSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("sessionize splits on inactivity gaps") {
    // user 1: events at 0s, 10s (same session), then 100s (> 30s gap)
    val events = Seq(
      (1L, 0L, 100L), (1L, 10000L, 101L), (1L, 100000L, 102L),
      (2L, 5000L, 200L),
    ).toDF("user_id", "tms_raw", "event_id")
      .withColumn("ts", timestamp_millis(col("tms_raw")))
    val out = Analytic.sessionize(events, gapMs = 30000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 1L)
  }

  test("topNPerGroup keeps n best rows per key") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
    val out = Analytic.topNPerGroup(df, "k", Seq(col("v").desc), 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    out shouldBe Set(("a", 3), ("a", 2), ("b", 9))
  }

  test("skyline keeps exactly the non-dominated (price, size) points") {
    val parts = Seq((1.00, 5), (2.00, 3), (3.00, 4), (4.00, 1), (5.00, 1), (2.00, 7))
      .toDF("p_retailprice", "p_size")
    val out = Analytic.skylineParts(parts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (3,4) dominated by (2,3); (5,1) by (4,1); (2,7) by (2,3) via min-per-price
    out shouldBe Set((100L, 5L), (200L, 3L), (400L, 1L))
  }

  test("STL-lite: weekly bump decomposes into seasonal, residual exactly 0") {
    // 14 days, $7.00 daily with a +$0.70 bump every day%7==0. For the
    // fully-windowed days 3..10: trend = (6*700+770) div 7 = 710;
    // detrended = +60 on the bump weekday, -10 elsewhere; seasonal
    // means re-center to exactly {wd0: 60, others: -10}; residual 0.
    val orders = (0 until 14).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)),
        if (i % 7 == 0) 7.70 else 7.00)
    }.toDF("o_orderdate", "o_totalprice")
    val rows = Analytic.stlDecomposeDaily(orders).orderBy("day_no").collect()
    rows.length shouldBe 14
    val mid = rows.filter(r => r.getLong(0) >= 3 && r.getLong(0) <= 10)
    mid.foreach { r =>
      r.getLong(2) shouldBe 710L // trend
      r.getLong(3) shouldBe (if (r.getLong(0) % 7 == 0) 60L else -10L) // seasonal
      r.getLong(4) shouldBe 0L // residual
    }
    // boundary days: no full window -> NULL trend and residual
    rows.filter(r => r.getLong(0) < 3 || r.getLong(0) > 10)
      .foreach(r => assert(r.isNullAt(2) && r.isNullAt(4)))
  }

  test("STL-lite: weekdays with no seasonal estimate keep their days (NULL, not dropped)") {
    // 7 days -> only day 3 is fully windowed, so the weekly table has
    // ONE weekday. The seasonal attach must be a LEFT join: the other
    // six days stay in the output with NULL seasonal/residual (the
    // NULL-trend boundary convention) rather than silently vanishing.
    val orders = (0 until 7).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)), 7.00)
    }.toDF("o_orderdate", "o_totalprice")
    val rows = Analytic.stlDecomposeDaily(orders).orderBy("day_no").collect()
    rows.length shouldBe 7
    val d3 = rows.find(_.getLong(0) == 3L).get
    (d3.getLong(2), d3.getLong(3), d3.getLong(4)) shouldBe ((700L, 0L, 0L))
    rows.filter(_.getLong(0) != 3L)
      .foreach(r => assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)))
  }

  test("Theil-Sen: lower median of quantized pairwise slopes, exact by hand") {
    // days 0..3, cents 100,200,400,300. Six slopes (micro-cents/day):
    // 100e6, 150e6, 66666666 (200/3 truncated), 200e6, 50e6, -100e6.
    // Sorted rank (6+1) div 2 = 3 -> 66666666.
    val orders = Seq(1.00, 2.00, 4.00, 3.00).zipWithIndex.map { case (p, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)), p)
    }.toDF("o_orderdate", "o_totalprice")
    val r = Analytic.theilSenTrend(orders).collect().head
    (r.getLong(0), r.getLong(1)) shouldBe ((6L, 66666666L))

    // A declining series must yield a negative median slope (the
    // sign-rule lane): cents 400,300,200,100 -> every slope -100e6.
    val down = Seq(4.00, 3.00, 2.00, 1.00).zipWithIndex.map { case (p, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)), p)
    }.toDF("o_orderdate", "o_totalprice")
    Analytic.theilSenTrend(down).collect().head.getLong(1) shouldBe -100000000L
  }

  test("MAD outliers: robust center ignores the spike; doubled-integer arithmetic exact") {
    val prices = Seq(1.00, 1.02, 1.04, 1.06, 2.00)
    val orders = prices.zipWithIndex.map { case (p, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)), p)
    }.toDF("o_orderdate", "o_totalprice")
    val out = Analytic.madOutlierDays(orders).orderBy("day_no")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // med=104c -> med2=208; dev2=[8,4,0,4,192]; mad2=2*4=8;
    // flag iff dev2*10000 > 8*44478 -> only the 200c day
    out.map(_._2).toSeq shouldBe Seq(8L, 4L, 0L, 4L, 192L)
    out.map(_._3).toSet shouldBe Set(8L)
    out.map(_._4).toSeq shouldBe Seq(0L, 0L, 0L, 0L, 1L)
  }

  test("attribution: first/last touch pick the right engagements; orphans go to none") {
    // user 1: view, click, purchase -> (first view, last click);
    // a later purchase keeps the same touches. user 2: bare purchase.
    val rows = Seq(
      (1L, "view", 0L, 100L, 0.0), (1L, "click", 10L, 101L, 0.0),
      (1L, "purchase", 20L, 102L, 5.0), (1L, "purchase", 30L, 103L, 7.0),
      (2L, "purchase", 5L, 200L, 3.0),
    ).toDF("user_id", "event_type", "tms_raw", "event_id", "value")
      .withColumn("ts", timestamp_millis(col("tms_raw")))
    val out = Analytic.touchAttribution(rows)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    out shouldBe Map(
      ("view", "click") -> ((2L, 1200L)),
      ("none", "none") -> ((1L, 300L)))
  }

  test("time-bounded funnel: converts inside the window, not after; viewless purchases excluded") {
    // user 1: view at t=0, purchase at t=5 (in) and t=20 (out of window 10)
    // user 2: view only; user 3: purchase with no view ever
    val rows = Seq(
      (1L, "view", 0L, 1L, 0.0), (1L, "purchase", 5L, 2L, 3.0),
      (1L, "purchase", 20L, 3L, 9.0),
      (2L, "view", 0L, 4L, 0.0),
      (3L, "purchase", 2L, 5L, 7.0),
    ).toDF("user_id", "event_type", "tms_raw", "event_id", "value")
      .withColumn("ts", timestamp_millis(col("tms_raw")))
    val out = Analytic.funnelTimeBound(rows, windowMs = 10L).collect()(0)
    (out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) shouldBe
      ((2L, 1L, 300L, 500L)) // 2 viewers, 1 converted, 300 cents, 500‰
  }

  test("seasonal-naive backtest: lag-7 forecast errors roll up per weekday") {
    // week 1 flat 1.00/day, week 2 flat 1.10/day -> every weekday has
    // exactly one scored day with error 10 cents
    val orders = (0 until 14).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)),
        if (i < 7) 1.00 else 1.10)
    }.toDF("o_orderdate", "o_totalprice")
    val out = Analytic.seasonalNaiveBacktest(orders).orderBy("weekday")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 7
    out.foreach { case (_, n, sae, mae) =>
      n shouldBe 1L; sae shouldBe 10L; mae shouldBe 10L
    }
  }

  test("drawdown: worst peak-to-trough decline at its earliest argmax") {
    // daily: +100, +300, -250(=50c day), ... cumulative 100,400,150,200,90
    val prices = Seq(1.00, 3.00, -2.50, 0.50, -1.10)
    val orders = prices.zipWithIndex.map { case (p, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)), p)
    }.toDF("o_orderdate", "o_totalprice")
    val r = Analytic.revenueDrawdown(orders).collect().head
    // cum = 100,400,150,200,90; peak = 100,400,400,400,400
    // dd  = 0,0,250,200,310 -> worst 310 at day 4
    (r.getLong(0), r.getLong(1)) shouldBe ((4L, 310L))
  }

  test("bounce rate counts single-event sessions") {
    val events = Seq(
      (1L, 0L, 1L), (1L, 1000L, 2L),    // session of 2 (not a bounce)
      (1L, 10000000L, 3L),              // lone event -> bounce
      (2L, 0L, 4L),                     // lone event -> bounce
    ).toDF("user_id", "tms_raw", "event_id")
      .withColumn("ts", timestamp_millis(col("tms_raw")))
    val r = Analytic.bounceRate(events, gapMs = 30000L).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((3L, 2L, 666L))
  }

  test("three-step funnel enforces strict ordering: click BEFORE view doesn't count") {
    // user 1: view(0) -> click(10) -> purchase(20): full funnel
    // user 2: click(0) -> view(10) -> purchase(20): click precedes view
    //   -> step2 not reached (purchase can't attach without a click)
    // user 3: view only
    val rows = Seq(
      (1L, "view", 0L, 1L), (1L, "click", 10L, 2L), (1L, "purchase", 20L, 3L),
      (2L, "click", 0L, 4L), (2L, "view", 10L, 5L), (2L, "purchase", 20L, 6L),
      (3L, "view", 0L, 7L),
    ).toDF("user_id", "event_type", "tms_raw", "event_id")
      .withColumn("ts", timestamp_millis(col("tms_raw")))
      .withColumn("value", lit(0.0))
    val r = Analytic.funnelThreeStep(rows).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
      ((3L, 1L, 1L, 333L, 333L))
  }

  test("Gini: perfect equality scores 0; known unequal case matches hand arithmetic") {
    def gini(prices: Seq[Double]) = {
      val orders = prices.zipWithIndex.map { case (p, i) =>
        (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)), p)
      }.toDF("o_orderdate", "o_totalprice")
      val r = Analytic.revenueGini(orders).collect().head
      (r.getLong(2), r.getLong(3), r.getLong(4))
    }
    gini(Seq(1.00, 1.00, 1.00, 1.00))._1 shouldBe 0L
    // x = (100, 300) cents sorted: wsum = 1·100 + 3·300 = 1000;
    // num = 1000 − 2·400 = 200; den = 800 → G = 0.25
    gini(Seq(1.00, 3.00)) shouldBe ((200L, 800L, 250L))
  }

  test("CUSUM window form equals the sequential max(0, s + x - k) recurrence") {
    val prices = Seq(1.00, 1.00, 5.00, 1.00, 1.00, 7.00, 1.00)
    val orders = prices.zipWithIndex.map { case (p, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)), p)
    }.toDF("o_orderdate", "o_totalprice")
    val out = Analytic.cusumRevenueShift(orders).orderBy("day_no")
      .collect().map(_.getLong(2))
    val cents = prices.map(p => math.round(p * 100))
    val k = cents.sum / cents.length
    var s = 0L
    val expected = cents.map { c => s = math.max(0L, s + c - k); s }
    out.toSeq shouldBe expected
  }

  test("hourly anomaly flags a spike against its trailing 24h baseline") {
    // 24 calm hours (1 event each), then a 50-event spike at hour 24,
    // then a calm hour 25 whose baseline now CONTAINS the spike
    // (variance explodes -> no flag). Hours 0..11 have <12 trailing
    // hours and are excluded.
    val rows = (0 until 24).map(h => (h.toLong * 3600000L, 1)) ++
      Seq((24L * 3600000L, 50)) ++ Seq((25L * 3600000L, 1))
    val events = rows.zipWithIndex.flatMap { case ((ms, n), _) =>
      (0 until n).map(i => (ms + i, "view"))
    }.toDF("tms_raw", "event_type")
      .withColumn("ts", timestamp_millis(col("tms_raw")))
    val out = Analytic.hourlyAnomaly(events)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    out.keySet shouldBe (12L to 25L).toSet
    out(24L) shouldBe 1L // the spike
    (12L to 23L).foreach(h => out(h) shouldBe 0L)
  }
}
