package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{EngineQuery, Tables}

/** Structured Streaming surface (the reference is batch-only, SURVEY.md
  * §2.2 — this is engine extension surface). The transformation is shared
  * between batch and streaming inputs: `hourlyRollup` is written against
  * a plain DataFrame, so the same code runs under `read` and
  * `readStream` — the Spark-idiomatic way to keep batch/stream parity.
  *
  * The `streaming_hourly_rollup` gate query actually executes a
  * streaming query (file source → complete-mode aggregation → memory
  * sink, drained with `processAllAvailable`), then returns the sink
  * table; its oracle is the same SQL as the batch twin
  * (`events_hourly_rollup`), proving the two paths agree.
  *
  * Scale notes: in production this runs with a watermark + append mode
  * so state is bounded; complete mode here is only for the finite
  * test corpus. The aggregation state is per (hour, event_type) — tiny.
  */
object EventAnalytics {

  /** Shared batch/stream transformation: hourly event-type rollup with
    * exact decimal sums surfaced as doubles.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events.groupBy(
      unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
      col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))

  /** Watermarked sliding-window variant for true unbounded streams
    * (append-mode-safe; used by the streaming tests).
    */
  def windowedRollup(events: DataFrame, window_ : String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_millis(col("window.start")).as("start_ms"),
        unix_millis(col("window.end")).as("end_ms"),
        col("event_type"), col("cnt"))

  @volatile private var sinkCounter = 0

  /** Run the hourly rollup as a real streaming query over the events
    * parquet, drain it, and return the result.
    */
  def runStreamingHourlyRollup(spark: SparkSession, sfDir: String): DataFrame = {
    // Layout-branching file source + ts-vintage normalization — the
    // shared helper ([[graft.sources.StreamingSources]] doc).
    val stream = graft.sources.StreamingSources.eventsSource(spark, sfDir)
    val qn = synchronized { sinkCounter += 1; s"graft_stream_sink_$sinkCounter" }
    val q = hourlyRollup(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(qn)
  }

  /** Stream-static enrichment: the event stream joins a static
    * dimension (broadcast — the stream side never shuffles for the
    * join; the standard shape for enriching a 100 TB/day stream with a
    * small dim), then aggregates per nation. Complete-mode memory sink
    * drained for the finite gate corpus.
    */
  def runStreamingEnrichJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = graft.sources.StreamingSources.eventsSource(spark, sfDir)
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"))
    val joined = stream
      .join(broadcast(dim), stream("user_id") === dim("c_custkey"))
      .groupBy("nationkey")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
    val qn = synchronized { sinkCounter += 1; s"graft_stream_sink_$sinkCounter" }
    val q = joined.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn)
  }

  /** foreachBatch file-sink ingest: the stream lands as parquet via
    * per-microbatch writes (the escape hatch for sinks without a native
    * streaming writer — JDBC, custom stores); the gate re-reads the
    * landed files and aggregates, proving the full ingest loop.
    */
  def runForeachBatchIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = s"${graft.OutDir.base}/graft_stream_ingest/${sfDir.replaceAll("[^A-Za-z0-9.]+", "_")}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val stream = graft.sources.StreamingSources.eventsSource(spark, sfDir)
      .select("event_id", "event_type", "value")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.read.parquet(outDir)
  }

  /** Streaming exact dedup: the source is unioned with itself, so every
    * event arrives twice (possibly in different microbatches); stateful
    * `dropDuplicates` on the key must restore exact batch counts. State
    * is one key per distinct event — in production bounded with
    * `dropDuplicatesWithinWatermark`; complete drain here for the
    * finite gate corpus.
    */
  def runStreamingDedup(spark: SparkSession, sfDir: String): DataFrame = {
    def src = graft.sources.StreamingSources.eventsSource(spark, sfDir)
      .select("event_id", "event_type")
    val doubled = src.union(src)
    val agg = doubled
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
    val qn = synchronized { sinkCounter += 1; s"graft_stream_sink_$sinkCounter" }
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn)
  }

  /** Stream-stream interval join (the attribution shape): views join
    * purchases of the same user landing within 30 minutes AFTER the
    * view. Both sides carry event-time watermarks and the join
    * condition carries explicit time bounds, so each side's buffered
    * state is evicted once the other side's watermark passes the
    * interval — bounded state on unbounded streams. Inner joins emit
    * eagerly (no watermark wait), so draining the finite gate corpus
    * yields exactly the batch join. Append mode: the only mode
    * stream-stream joins support.
    */
  def runStreamingIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    def src = graft.sources.StreamingSources.eventsSource(spark, sfDir)
    val views = src.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(
      purchases,
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 30 minutes"))
      .select(
        col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("v_ts"))).as("gap_ms"))
    val qn = synchronized { sinkCounter += 1; s"graft_stream_sink_$sinkCounter" }
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn)
  }

  /** Stream-stream LEFT OUTER interval join — the "views that never
    * converted" shape. Unlike the inner join ([[runStreamingIntervalJoin]]),
    * the null-extended rows can only emit once the WATERMARK passes
    * `v_ts + 30min` (before that, a matching purchase could still
    * arrive), so a finite quiet source would withhold the tail forever.
    * The fix is the production pattern: a HEARTBEAT branch — the
    * purchase stream unioned with a far-future shifted copy on
    * never-matching negative keys — advances the event-time watermark
    * past all real data, flushing every unmatched view. (On a real
    * cluster the heartbeat is a scheduled synthetic event per quiet
    * partition; same semantics.) State stays bounded either way: views
    * evict as soon as the watermark clears their interval.
    */
  def runStreamingLeftOuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    def src = graft.sources.StreamingSources.eventsSource(spark, sfDir)
    // The join's effective watermark is the MIN across all inputs, so
    // BOTH sides need the heartbeat — a far-future shifted copy on
    // never-matching negative keys. The view-side heartbeat rows would
    // surface as unmatched output, so the post-join filter drops the
    // negative keys again (stateless, after the stateful join).
    //
    // Key scheme: view heartbeats take -2·user_id - 2 (even-negative),
    // purchase heartbeats -2·user_id - 1 (odd-negative). The parities
    // differ for EVERY pair of user_ids, so a view heartbeat can never
    // equi-join a purchase heartbeat — an additive offset scheme
    // (-u - C₁ vs -u - C₂) collides whenever two real users sit
    // exactly C₁-C₂ apart, emitting a phantom matched row that the
    // v_user >= 0 filter cannot catch (its purchase_id is non-null).
    val viewSrc = src.where(col("event_type") === "view")
    val views = viewSrc
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .union(viewSrc.select(
        (col("user_id") * -2 - 2L).as("v_user"),
        (col("ts") + expr("INTERVAL 2000 HOURS")).as("v_ts"),
        col("event_id").as("view_id")))
      .withWatermark("v_ts", "1 hour")
    def purch = src.where(col("event_type") === "purchase")
    val purchases = purch
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .union(purch.select(
        (col("user_id") * -2 - 1L).as("p_user"),
        (col("ts") + expr("INTERVAL 2000 HOURS")).as("p_ts"),
        col("event_id").as("purchase_id")))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(
      purchases,
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 30 minutes"),
      "left_outer")
      // drops the view-side heartbeat rows (always unmatched, negative
      // key). The disjunction references BOTH join sides, so Catalyst
      // cannot push it below the join — a bare v_user >= 0 would push
      // through the watermark node and strip the heartbeat before it
      // ever advances the clock.
      .where(col("v_user") >= 0 || col("purchase_id").isNotNull)
      .select(
        col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("v_ts"))).as("gap_ms"))
    val qn = synchronized { sinkCounter += 1; s"graft_stream_sink_$sinkCounter" }
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn)
  }

  /** Production-shaped streaming dedup: `dropDuplicatesWithinWatermark`
    * bounds the dedup state by event time (a key is remembered only
    * until the watermark passes it), unlike [[runStreamingDedup]]'s
    * unbounded exact state. Same doubled source, same expected result:
    * exact batch counts restored. Chained stateful ops (dedup → agg)
    * in one streaming query.
    */
  def runStreamingDedupWatermarked(spark: SparkSession, sfDir: String): DataFrame = {
    def src = graft.sources.StreamingSources.eventsSource(spark, sfDir)
      .select("event_id", "event_type", "ts")
    val doubled = src.union(src)
    val agg = doubled
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
    val qn = synchronized { sinkCounter += 1; s"graft_stream_sink_$sinkCounter" }
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn)
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "streaming_dedup_watermarked",
      (s, dir) => runStreamingDedupWatermarked(s, dir).orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    EngineQuery(
      "streaming_interval_join",
      (s, dir) =>
        runStreamingIntervalJoin(s, dir).orderBy("user_id", "view_id", "purchase_id"),
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
             |  epoch_ms(p.ts) - epoch_ms(v.ts) AS gap_ms
             |FROM events v JOIN events p
             |  ON v.user_id = p.user_id
             | AND v.event_type = 'view' AND p.event_type = 'purchase'
             | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
             |ORDER BY v.user_id, view_id, purchase_id""".stripMargin),
    ),
    EngineQuery(
      "streaming_left_outer_join",
      (s, dir) =>
        runStreamingLeftOuterJoin(s, dir)
          .orderBy(col("user_id"), col("view_id"), col("purchase_id").asc_nulls_first),
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
             |  epoch_ms(p.ts) - epoch_ms(v.ts) AS gap_ms
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON v.user_id = p.user_id
             | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
             |ORDER BY v.user_id, view_id, purchase_id NULLS FIRST""".stripMargin),
    ),
    EngineQuery(
      "streaming_dedup_counts",
      (s, dir) => runStreamingDedup(s, dir).orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    EngineQuery(
      "streaming_foreach_ingest",
      (s, dir) =>
        runForeachBatchIngest(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    EngineQuery(
      "streaming_enrich_join",
      (s, dir) => runStreamingEnrichJoin(s, dir).orderBy("nationkey"),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS cnt,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY nationkey ORDER BY nationkey""".stripMargin),
    ),
    EngineQuery(
      "streaming_hourly_rollup",
      (s, dir) => runStreamingHourlyRollup(s, dir).orderBy("hour_ms", "event_type"),
      Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY hour_ms, event_type ORDER BY hour_ms, event_type""".stripMargin),
    ),
    // Streaming twin of events_hourly_anomaly: the streamABLE half —
    // the (hour_no, event_type, cnt) aggregate — is maintained by a
    // real streaming query in complete mode; the trailing-window
    // 3-sigma test (window functions don't stream) runs DOWNSTREAM
    // over the materialized state, which is the production monitoring
    // shape: state stays hour-cardinality regardless of stream volume,
    // and the detector scan costs |hours|, not |events|. Gate-checked
    // against the identical batch oracle, proving the two paths agree.
    EngineQuery(
      "streaming_hourly_anomaly",
      (s, dir) => {
        val stream = graft.sources.StreamingSources.eventsSource(s, dir)
        val qn = synchronized { sinkCounter += 1; s"graft_stream_sink_$sinkCounter" }
        val q = graft.operators.Analytic.hourlyEventCounts(stream).writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(qn)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        graft.operators.Analytic.anomalyOverHourly(s.table(qn))
          .orderBy("event_type", "hour_no")
      },
      Some(graft.operators.Analytic.hourlyAnomalyOracle),
    ),
  )
}
