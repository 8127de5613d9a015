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
