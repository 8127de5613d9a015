package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{Tables, TestSpark}
import graft.operators.Analytic

class StatefulSessionsSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("foldSessions: gap split, carry-over, ordering") {
    import StatefulSessions._
    val evs = Seq(Ev(1, 0, 1), Ev(1, 1000, 2), Ev(1, 100000, 3))
    val (closed, open) = foldSessions(evs, gapMs = 30000, carry = None)
    closed shouldBe Seq(OpenSession(1, 0, 1000, 2))
    open shouldBe Some(OpenSession(2, 100000, 100000, 1))
    // carrying the open session: a nearby event extends it
    val (c2, o2) = foldSessions(Seq(Ev(1, 110000, 4)), 30000, open)
    c2 shouldBe empty
    o2 shouldBe Some(OpenSession(2, 100000, 110000, 2))
  }

  test("batch stateful sessionization equals the window-function formulation") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val stateful = StatefulSessions.sessionizeBatch(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val declarative = Analytic.sessionize(events, gapMs = StatefulSessions.GapMs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    stateful shouldBe declarative
    stateful should not be empty
  }

  test("tws streaming sessions: gap emit, timer timeout, numbering across timeouts") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState streaming requires the RocksDB provider
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().select(
      col("_1").as("user_id"), timestamp_millis(col("_2")).as("ts"), col("_3").as("event_id"))
    val out = StatefulSessions.sessionizeStreamTws(events, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory").queryName("tws_sink").start()
    try {
      val t0 = 1704103200000L
      val h = 3600000L
      input.addData((1L, t0, 1L), (1L, t0 + 60000L, 2L))
      q.processAllAvailable()
      spark.table("tws_sink").count() shouldBe 0 // session still open
      input.addData((2L, t0 + 2 * h, 3L)) // advances watermark past user 1's gap
      q.processAllAvailable()
      val afterTimeout = spark.table("tws_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      afterTimeout should contain((1L, 1L, 2L, t0, t0 + 60000L)) // timer closed it
      input.addData((1L, t0 + 3 * h, 4L)) // user 1 returns after the timeout
      input.addData((2L, t0 + 6 * h, 5L)) // watermark past both open sessions
      q.processAllAvailable()
      val all = spark.table("tws_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // numbering continued: user 1's post-timeout session is id 2, not a duplicate 1
      all should contain((1L, 2L, 1L, t0 + 3 * h, t0 + 3 * h))
      all.map(r => (r._1, r._2)).toSet should have size all.length.toLong
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming sessions emit on gap and on watermark timeout, not before") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().select(
      col("_1").as("user_id"), timestamp_millis(col("_2")).as("ts"), col("_3").as("event_id"))
    val out = StatefulSessions.sessionizeStream(events, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory").queryName("ss_sink").start()
    try {
      val t0 = 1704103200000L
      input.addData((1L, t0, 1L), (1L, t0 + 60000L, 2L))
      q.processAllAvailable()
      spark.table("ss_sink").count() shouldBe 0 // session still open
      // a later event (other user) advances the watermark past user 1's gap
      input.addData((2L, t0 + 2 * 3600000L, 3L))
      q.processAllAvailable()
      // timeout fires on the next trigger after the watermark moved
      input.addData((2L, t0 + 2 * 3600000L + 1000L, 4L))
      q.processAllAvailable()
      val rows = spark.table("ss_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      rows should contain((1L, 1L, 2L, t0, t0 + 60000L))
    } finally q.stop()
  }

  test("transition fold carries the last type across batch boundaries") {
    import StatefulSessions.{foldTransitions, TEv, Trans}
    val b1 = Seq(TEv(1L, 0L, 1L, "a"), TEv(1L, 10L, 2L, "b"))
    val b2 = Seq(TEv(1L, 20L, 3L, "c"))
    val (t1, c1) = foldTransitions(b1, None)
    t1 shouldBe Seq(Trans("start", "a"), Trans("a", "b"))
    val (t2, c2) = foldTransitions(b2, c1)
    // the cross-batch transition b→c only exists because of the carry
    t2 shouldBe Seq(Trans("b", "c"))
    c2 shouldBe Some("c")
    // split-anywhere invariance: one batch == the two-batch composition
    val (all, cAll) = foldTransitions(b1 ++ b2, None)
    all shouldBe t1 ++ t2
    cAll shouldBe c2
  }

  test("streaming transition matrix across multiple microbatches equals the batch matrix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF().select(
      col("_1").as("user_id"), col("_2").as("tms"), col("_3").as("event_id"),
      col("_4").as("event_type"))
    val transitions = events
      .as[StatefulSessions.TEv](org.apache.spark.sql.Encoders.product)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[StatefulSessions.TEv],
         state: org.apache.spark.sql.streaming.GroupState[StatefulSessions.TransCarry]) =>
          val (out, last) = StatefulSessions.foldTransitions(
            it.toSeq.sortBy(e => (e.tms, e.event_id)), state.getOption.map(_.last_type))
          last.foreach(t => state.update(StatefulSessions.TransCarry(t)))
          out.iterator
      }
    val q = transitions.toDF().writeStream
      .outputMode("append").format("memory").queryName("st_trans").start()
    try {
      input.addData((1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"))
      q.processAllAvailable()
      input.addData((1L, 20L, 3L, "a"), (2L, 5L, 4L, "b")) // user 1 split across batches
      q.processAllAvailable()
      val out = spark.table("st_trans")
        .groupBy("prev_type", "event_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      out shouldBe Map(
        ("start", "a") -> 1L, ("a", "b") -> 1L,
        ("b", "a") -> 1L, // the cross-microbatch transition, via the carry
        ("start", "b") -> 1L)
    } finally q.stop()
  }

  test("session numbering continues across event-time timeouts (no duplicate keys)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().select(
      col("_1").as("user_id"), timestamp_millis(col("_2")).as("ts"), col("_3").as("event_id"))
    val out = StatefulSessions.sessionizeStream(events, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory").queryName("ss_renum").start()
    try {
      val t0 = 1704103200000L
      val h = 3600000L
      input.addData((1L, t0, 1L))              // user 1, session 1
      q.processAllAvailable()
      input.addData((2L, t0 + 2 * h, 2L))      // watermark past session 1's gap
      q.processAllAvailable()
      input.addData((2L, t0 + 2 * h + 1000L, 3L)) // trigger: session 1 times out
      q.processAllAvailable()
      input.addData((1L, t0 + 3 * h, 4L))      // user 1 returns after the timeout
      q.processAllAvailable()
      input.addData((2L, t0 + 6 * h, 5L))      // watermark past session 2's gap
      q.processAllAvailable()
      input.addData((2L, t0 + 6 * h + 1000L, 6L)) // trigger: session 2 times out
      q.processAllAvailable()
      val user1 = spark.table("ss_renum").where(col("user_id") === 1L)
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
      // the post-timeout session continues the sequence at 2 — it must
      // NOT reuse key (1, 1), which would collide with the first session
      user1 shouldBe Set((1L, t0), (2L, t0 + 3 * h))
    } finally q.stop()
  }
}
