package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{Tables, TestSpark}

class EventAnalyticsSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("hourlyRollup: exact counts and decimal sums per (hour, type)") {
    val events = Seq(
      ("2024-01-01 10:05:00", "click", 1.10),
      ("2024-01-01 10:55:00", "click", 2.20),
      ("2024-01-01 10:30:00", "view", 5.00),
      ("2024-01-01 11:05:00", "click", 4.00),
    ).toDF("raw_ts", "event_type", "value")
      .withColumn("ts", to_timestamp(col("raw_ts")))
    val out = EventAnalytics.hourlyRollup(events)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val h10 = 1704103200000L // 2024-01-01T10:00:00Z
    val h11 = h10 + 3600000L
    out((h10, "click")) shouldBe ((2L, 3.30))
    out((h10, "view")) shouldBe ((1L, 5.00))
    out((h11, "click")) shouldBe ((1L, 4.00))
  }

  test("windowedRollup emits closed windows under a watermark (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val events = input.toDF()
      .select(timestamp_millis(col("_1")).as("ts"), col("_2").as("event_type"))
    val q = EventAnalytics.windowedRollup(events, "1 hour", "1 hour", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("wr_sink").start()
    try {
      val h0 = 1704103200000L // 10:00
      input.addData((h0 + 60000L, "click"), (h0 + 120000L, "click"))
      q.processAllAvailable()
      // advance event time far enough that the watermark closes hour 10
      input.addData((h0 + 4 * 3600000L, "click"))
      q.processAllAvailable()
      val rows = spark.table("wr_sink")
        .collect().map(r => (r.getLong(0), r.getString(2)) -> r.getLong(3)).toMap
      rows((h0, "click")) shouldBe 2L
    } finally q.stop()
  }

  test("streaming rollup over the harness parquet equals its batch twin") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = EventAnalytics.runStreamingHourlyRollup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventAnalytics.hourlyRollup(Tables.events(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    streamed shouldBe batch
    streamed should not be empty
  }

  test("checkpointed file sink recovers exactly-once across query restarts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().select(col("_1").as("id"), col("_2").as("kind"))
    val out = graft.OutDir.base + "/test_restart_sink"
    val ckpt = graft.OutDir.base + "/test_restart_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def start() = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    val q1 = start()
    input.addData((1L, "a"), (2L, "b"))
    q1.processAllAvailable(); q1.stop()
    // restart from the same checkpoint: only NEW offsets are processed,
    // already-committed files are not rewritten (exactly-once sink log)
    val q2 = start()
    input.addData((3L, "c"))
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    rows shouldBe Array((1L, "a"), (2L, "b"), (3L, "c"))
  }

  test("left-outer heartbeat key spaces cannot collide for user_id >= 1e6") {
    // Regression: the old additive scheme (view hb -u-2e6, purchase hb
    // -u-1e6) collided whenever two real users sat exactly 1e6 apart —
    // user 1's view heartbeat equi-joined user 1000001's purchase
    // heartbeat, and the phantom matched row survived the
    // `v_user >= 0 OR purchase_id IS NOT NULL` filter because its
    // purchase_id is non-null. Parity-disjoint keys (-2u-2 vs -2u-1)
    // make collision impossible for ANY pair of user_ids.
    import org.apache.commons.io.FileUtils
    val dir = graft.OutDir.base + "/test_lojoin_collision"
    val stage = graft.OutDir.base + "/test_lojoin_collision_stage"
    FileUtils.deleteQuietly(new java.io.File(dir))
    FileUtils.deleteQuietly(new java.io.File(stage))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(minutes: Int) = new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val rows = Seq(
      (1L, at(0), 1L, "view", 1.0, "{}"),          // never converts -> null-extended
      (2L, at(10), 1000001L, "purchase", 5.0, "{}"), // old-scheme phantom partner of event 1
      (3L, at(0), 2L, "view", 1.0, "{}"),
      (4L, at(5), 2L, "purchase", 2.0, "{}"),      // real conversion of event 3
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // single-file layout, like the harness tables (pathGlobFilter
    // matches the literal file name events.parquet)
    rows.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    FileUtils.copyFile(part, new java.io.File(dir + "/events.parquet"))
    val out = EventAnalytics.runStreamingLeftOuterJoin(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    out shouldBe Set((1L, 1L, -1L), (2L, 3L, 4L))
  }
}
