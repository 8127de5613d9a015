package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class EventFlowSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: Seq[(Long, String, Long, Long)]) =
    rows.toDF("user_id", "event_type", "tms_raw", "event_id")
      .withColumn("ts", timestamp_millis(col("tms_raw")))

  test("transition matrix counts per-user successor pairs with a start state") {
    val ev = events(Seq(
      (1L, "a", 0L, 100L), (1L, "b", 10L, 101L), (1L, "a", 20L, 102L),
      (2L, "b", 5L, 200L)))
    val out = EventFlow.transitionMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    out shouldBe Map(
      ("start", "a") -> ((1L, 500L)),
      ("start", "b") -> ((1L, 500L)),
      ("a", "b") -> ((1L, 1000L)),
      ("b", "a") -> ((1L, 1000L)))
  }

  test("CUPED: theta and adjusted arm means exact by hand") {
    // cut = (0+1000) div 2 = 500. x = pre-count, y = post purchases:
    // u0(v0): x=2,y=1; u1(v1): x=4,y=1; u2(v0): x=0,y=0; u3(v1): x=2,y=0.
    // theta = (4*6-8*2)/(4*24-64) = 8/32 -> 250000 ppm. Raw means both
    // 500000; dx = -/+1e6 -> CUPED means 750000 (v0), 250000 (v1):
    // the covariate explains the arms' equal raw rates apart.
    val e = events(Seq(
      (0L, "view", 0L, 1L), (0L, "click", 100L, 2L), (0L, "purchase", 600L, 3L),
      (1L, "view", 50L, 4L), (1L, "view", 60L, 5L), (1L, "view", 70L, 6L),
      (1L, "view", 80L, 7L), (1L, "purchase", 1000L, 8L),
      (2L, "view", 900L, 9L),
      (3L, "view", 100L, 10L), (3L, "click", 200L, 11L), (3L, "view", 800L, 12L)))
    val out = EventFlow.cupedReadout(e).orderBy("variant").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out shouldBe Array(
      (0L, 2L, 500000L, 250000L, 750000L),
      (1L, 2L, 500000L, 250000L, 250000L))
  }

  test("Markov removal attribution: hand-computed 3-user journey set") {
    // u1: view->click->purchase; u2: view (no conversion); u3: purchase
    // first. Matrix ppm: START->{view 666666, CONV 333333},
    // view->{click 500000, NULL 500000}, click->CONV 1e6. The 8-step
    // horizon converges to base 666666; removing click kills the
    // view path (-> 333333); removing view leaves only the direct
    // conversion (-> 333333).
    val e = events(Seq(
      (1L, "view", 100L, 1L), (1L, "click", 200L, 2L), (1L, "purchase", 300L, 3L),
      (2L, "view", 100L, 4L),
      (3L, "purchase", 100L, 5L)))
    val out = EventFlow.markovRemovalAttribution(e)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out.keySet shouldBe Set("view", "click")
    out("click") shouldBe ((666666L, 333333L, 333333L))
    out("view") shouldBe ((666666L, 333333L, 333333L))
  }

  test("session paths group identical truncated sequences across sessions") {
    // user 1: a,b,c in one session; user 2: a,b; user 3: a,b twice with
    // a >gap break between — "a>b" counts 3 sessions
    val ev = events(Seq(
      (1L, "a", 0L, 1L), (1L, "b", 10L, 2L), (1L, "c", 20L, 3L),
      (2L, "a", 0L, 4L), (2L, "b", 10L, 5L),
      (3L, "a", 0L, 6L), (3L, "b", 10L, 7L),
      (3L, "a", 100000L, 8L), (3L, "b", 100010L, 9L)))
    val out = EventFlow.sessionPaths(ev, gapMs = 30000L, maxLen = 5, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a>b" -> 3L, "a>b>c" -> 1L)
  }

  test("session paths truncate to the first maxLen events") {
    val ev = events((0 until 7).map(i => (1L, s"e$i", i * 100L, i.toLong)))
    val out = EventFlow.sessionPaths(ev, gapMs = 30000L, maxLen = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("e0>e1>e2" -> 1L)
  }

  test("bot regularity: metronome-regular user flagged, bursty human and sparse user not") {
    // user 1: exactly every 1000 ms (variance 0 < tau²); user 2: wildly
    // varying gaps; user 3: only 3 events (< minEvents gaps)
    val rows =
      (0 until 10).map(i => (1L, "view", i * 1000L, i.toLong)) ++
        Seq(0L, 1000L, 100000000L, 100001000L, 900000000L).zipWithIndex
          .map { case (t, i) => (2L, "view", t, 100L + i) } ++
        (0 until 3).map(i => (3L, "view", i * 1000L, 200L + i.toLong))
    val out = EventFlow.botRegularityFlags(events(rows), tauMs = 3600000L, minEvents = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((9L, 1L))
    out(2L)._2 shouldBe 0L
    out(3L) shouldBe ((2L, 0L)) // insufficient evidence
  }

  test("Simpson diversity: single-type user scores 0, uniform multi-type near max") {
    val rows =
      (0 until 4).map(i => (1L, "view", i * 10L, i.toLong)) ++ // all one type -> 0
        Seq((2L, "view", 0L, 10L), (2L, "click", 1L, 11L),
          (2L, "purchase", 2L, 12L), (2L, "error", 3L, 13L)) // 4 types once each
    val out = EventFlow.diversitySimpson(events(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 1: permille 0 -> bucket 0; user 2: 1000·(16-4)/16 = 750 -> bucket 75
    out shouldBe Map(0L -> 1L, 75L -> 1L)
  }

  test("A/B chi-square: perfect separation significant, identical arms not") {
    // 10 even users (variant A) all purchase; 10 odd (B) only view:
    // chi2 = 20·(100)²/(10·10·10·10) = 20 >= 3.841
    val sep = events((0 until 20).map(u =>
      (u.toLong, if (u % 2 == 0) "purchase" else "view", u * 10L, u.toLong)))
    val r1 = EventFlow.abTestChi2(sep).collect()(0)
    (r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) shouldBe
      ((10L, 0L, 0L, 10L, 1L))
    // both arms convert 1-of-2: (ad-bc)=0 -> chi2=0, not significant
    val same = events(Seq(
      (0L, "purchase", 0L, 1L), (2L, "view", 0L, 2L),
      (1L, "purchase", 0L, 3L), (3L, "view", 0L, 4L)))
    EventFlow.abTestChi2(same).collect()(0).getLong(4) shouldBe 0L
  }

  test("concurrent-sessions sweep handles overlap, hour carry-in, and boundary ends") {
    val ev = events(Seq(
      // hour 0: u1 session 0..10s, u2 session 5..8s (peak 2 concurrent)
      (1L, "x", 0L, 1L), (1L, "x", 10000L, 2L),
      (2L, "x", 5000L, 3L), (2L, "x", 8000L, 4L),
      // u4: session straddling the hour boundary (3599s .. 3601s)
      (4L, "x", 3599000L, 5L), (4L, "x", 3601000L, 6L),
      // hour 1: u3 single-event session while u4 still alive (carry-in)
      (3L, "x", 3600100L, 7L)))
    val out = EventFlow.concurrentSessionsPeak(ev, gapMs = 30000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(0L -> 2L, 1L -> 2L)
  }
}
