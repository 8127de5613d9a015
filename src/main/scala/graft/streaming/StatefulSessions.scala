package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import graft.{EngineQuery, Tables}

/** Custom-state sessionization via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the engine's
  * arbitrary-stateful-processing surface (the reference is batch-only;
  * this extends the windowed streaming surface in [[EventAnalytics]]).
  *
  * One pure fold ([[foldSessions]]) drives both wrappers:
  *  - [[sessionizeBatch]]: NoTimeout, every session is final at the end
  *    of the (complete) group — the gate query, oracle-checked against
  *    the window-function formulation in `events_sessionize`;
  *  - [[sessionizeStream]]: EventTimeTimeout — a session is emitted
  *    only when a later event opens the next one or the watermark
  *    passes its gap (the timeout callback), so state is bounded by
  *    one open session per active user.
  *
  * Scale notes: state is one small case class per user key, shuffled
  * once on user_id; emission is append-mode (no unbounded complete-mode
  * result table). The batch twin runs the identical fold, so streaming
  * results converge to the batch answer as the watermark advances.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, tms: Long, event_id: Long)
  /** Streaming-side row: keeps the watermarked TIMESTAMP column itself —
    * event-time timeout requires the watermark attribute to reach the
    * stateful operator (projecting ts down to millis first severs it).
    */
  final case class EvT(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class OpenSession(session_id: Long, start_ms: Long, last_ms: Long, n_events: Long)
  final case class Session(user_id: Long, session_id: Long, n_events: Long, start_ms: Long, end_ms: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /** Fold time-sorted events into sessions: returns (closed, open).
    *
    * A carry with `n_events == 0` is a TOMBSTONE: "no open session, but
    * numbering already reached session_id" — left behind by a stream
    * timeout so the next session continues the sequence instead of
    * restarting at 1 (which would emit duplicate (user_id, session_id)
    * keys and diverge from the batch twin's sequential numbering).
    */
  def foldSessions(
      sorted: Seq[Ev], gapMs: Long, carry: Option[OpenSession]): (Seq[OpenSession], Option[OpenSession]) = {
    var closed = List.empty[OpenSession]
    var open = carry
    sorted.foreach { e =>
      open match {
        case Some(s) if s.n_events > 0 && e.tms - s.last_ms <= gapMs =>
          open = Some(s.copy(last_ms = math.max(s.last_ms, e.tms), n_events = s.n_events + 1))
        case Some(s) =>
          if (s.n_events > 0) closed ::= s
          open = Some(OpenSession(s.session_id + 1, e.tms, e.tms, 1))
        case None =>
          open = Some(OpenSession(1L, e.tms, e.tms, 1))
      }
    }
    (closed.reverse, open)
  }

  private def toSession(user: Long, s: OpenSession): Session =
    Session(user, s.session_id, s.n_events, s.start_ms, s.last_ms)

  private def toEvs(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id")).as[Ev]
  }

  /** Batch wrapper: the group is complete, so the trailing open session
    * is final too and gets flushed.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long = GapMs): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    toEvs(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          val (closed, open) = foldSessions(it.toSeq.sortBy(e => (e.tms, e.event_id)), gapMs, None)
          (closed ++ open).iterator.map(toSession(user, _))
      }
      .toDF()
  }

  /** Streaming wrapper: closed sessions emit on the next event's gap or
    * on event-time timeout once the watermark passes last_ms + gap.
    */
  def sessionizeStream(events: DataFrame, gapMs: Long = GapMs, watermark: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id")).as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EvT], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val done = state.get
            // Leave an n_events=0 tombstone (no timeout armed) so the
            // next session for this user continues the id sequence —
            // state stays one small record per user either way.
            state.update(done.copy(n_events = 0))
            if (done.n_events > 0) Iterator.single(toSession(user, done))
            else Iterator.empty
          } else {
            val (closed, open) = foldSessions(
              it.map(e => Ev(e.user_id, e.ts.getTime, e.event_id))
                .toSeq.sortBy(e => (e.tms, e.event_id)),
              gapMs, state.getOption)
            open.foreach { s =>
              state.update(s)
              if (s.n_events > 0) state.setTimeoutTimestamp(s.last_ms + gapMs + 1)
            }
            closed.iterator.map(toSession(user, _))
          }
      }
      .toDF()
  }

  /** The same session fold on Spark 4's arbitrary-state v2 surface
    * (`transformWithState` + `StatefulProcessor`) — the API that
    * replaces `flatMapGroupsWithState` for new pipelines (typed state
    * variables, timers, TTL, initial state). The batch twin needs no
    * state variable: the group is complete, so one fold per key emits
    * every session. Gate-checked against the identical oracle as the
    * fMGWS and window-function formulations — three formulations, one
    * relation.
    */
  class SessionFoldProcessor(gapMs: Long) extends StatefulProcessor[Long, Ev, Session] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
    override def handleInputRows(
        user: Long, rows: Iterator[Ev], timerValues: TimerValues): Iterator[Session] = {
      val (closed, open) =
        foldSessions(rows.toSeq.sortBy(e => (e.tms, e.event_id)), gapMs, None)
      (closed ++ open).iterator.map(toSession(user, _))
    }
  }

  def sessionizeTws(events: DataFrame, gapMs: Long = GapMs): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // Batch transformWithState runs through the state-store machinery,
    // whose driver-side coordinator endpoint is registered lazily by the
    // StreamingQueryManager — touch it or a pure-batch session fails
    // task-side with CANNOT_LOAD_STATE_STORE (no StateStoreCoordinator
    // endpoint).
    spark.streams.active
    toEvs(events)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionFoldProcessor(gapMs), TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Streaming arbitrary-state-v2 sessionization: [[sessionizeStream]]'s
    * semantics (emit on gap or watermark timeout, tombstone keeps the
    * session numbering monotone across timeouts) on `transformWithState`
    * with explicit event-time timers and a typed `ValueState`. Differences
    * from the fMGWS formulation that the processor must own:
    *
    *  - timers ACCUMULATE (`registerTimer` doesn't replace like
    *    `setTimeoutTimestamp`), so extending a session deletes the
    *    superseded deadline and `handleExpiredTimer` guards against any
    *    stale timer that still fires;
    *  - state lives in a named `ValueState` slot (RocksDB-backed in
    *    streaming) rather than the single implicit `GroupState`.
    */
  class StreamingSessionTwsProcessor(gapMs: Long)
      extends StatefulProcessor[Long, EvT, Session] {
    @transient private var open: ValueState[OpenSession] = _

    private def deadline(s: OpenSession): Long = s.last_ms + gapMs + 1

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[EvT], timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.map(e => Ev(e.user_id, e.ts.getTime, e.event_id))
        .toSeq.sortBy(e => (e.tms, e.event_id))
      val carry = if (open.exists()) Some(open.get()) else None
      carry.filter(_.n_events > 0).foreach(s => getHandle.deleteTimer(deadline(s)))
      val (closed, newOpen) = foldSessions(sorted, gapMs, carry)
      newOpen.foreach { s =>
        open.update(s)
        if (s.n_events > 0) getHandle.registerTimer(deadline(s))
      }
      closed.iterator.map(toSession(user, _))
    }

    override def handleExpiredTimer(
        user: Long, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) Iterator.empty
      else {
        val done = open.get()
        // only the CURRENT session's deadline closes it; a stale timer
        // (session was extended after registration) is a no-op
        if (done.n_events > 0 && expiredTimerInfo.getExpiryTimeInMs() >= deadline(done)) {
          open.update(done.copy(n_events = 0)) // tombstone: numbering continues
          Iterator.single(toSession(user, done))
        } else Iterator.empty
      }
    }
  }

  def sessionizeStreamTws(
      events: DataFrame, gapMs: Long = GapMs, watermark: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id")).as[EvT]
      .groupByKey(_.user_id)
      .transformWithState(
        new StreamingSessionTwsProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }

  @volatile private var sinkCounter = 0

  final case class TEv(user_id: Long, tms: Long, event_id: Long, event_type: String)
  final case class TransCarry(last_type: String)
  final case class Trans(prev_type: String, event_type: String)

  /** Fold time-sorted events into first-order transitions; the carry is
    * the user's last event type from prior batches (None → the
    * synthetic 'start' state precedes the first event).
    */
  def foldTransitions(sorted: Seq[TEv], carry: Option[String]): (Seq[Trans], Option[String]) = {
    var prev = carry
    val out = sorted.map { e =>
      val t = Trans(prev.getOrElse("start"), e.event_type)
      prev = Some(e.event_type)
      t
    }
    (out, prev)
  }

  /** Streaming twin of `event_transition_matrix`: the per-user Markov
    * state (just the last event type — one tiny record per user) is
    * maintained online by `flatMapGroupsWithState`, transitions emit
    * append-mode as they become determined, and the matrix aggregation
    * runs over the landed transition stream. The finite gate corpus
    * lands in one microbatch, so the landed matrix provably equals the
    * window-function formulation — identical oracle. Cross-batch
    * correctness (a user's trajectory split across microbatches) is
    * the carry's job, pinned in the spec.
    */
  def runStreamingTransitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stream = graft.sources.StreamingSources.eventsSource(spark, sfDir)
    val transitions = stream
      .select(col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id"), col("event_type"))
      .as[TEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[TEv], state: GroupState[TransCarry]) =>
          val (out, last) = foldTransitions(
            it.toSeq.sortBy(e => (e.tms, e.event_id)), state.getOption.map(_.last_type))
          last.foreach(t => state.update(TransCarry(t)))
          out.iterator
      }
    val qn = synchronized { sinkCounter += 1; s"graft_stream_trans_$sinkCounter" }
    val q = transitions.toDF().writeStream
      .outputMode("append")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.operators.EventFlow.matrixFromPairs(spark.table(qn))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    // Must reproduce the declarative window-function sessionization
    // (events_sessionize) exactly — same oracle.
    EngineQuery(
      "stateful_sessionize",
      (s, dir) =>
        sessionizeBatch(Tables.events(s, dir))
          .orderBy("user_id", "session_id"),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
             |g AS (SELECT user_id, event_id, tms,
             |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
             |s AS (SELECT user_id, tms,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events, min(tms) AS start_ms, max(tms) AS end_ms
             |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin),
      headline = true,
    ),
    // Streaming Markov-state twin — same oracle as the batch
    // window-function formulation (event_transition_matrix).
    EngineQuery(
      "streaming_transition_matrix",
      (s, dir) => runStreamingTransitionMatrix(s, dir).orderBy("prev_type", "event_type"),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms, event_id FROM events),
             |seq AS (SELECT
             |  coalesce(lag(event_type) OVER (PARTITION BY user_id ORDER BY tms, event_id),
             |    'start') AS prev_type,
             |  event_type FROM e),
             |m AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM seq GROUP BY 1, 2)
             |SELECT prev_type, event_type, n,
             |  CAST((1000 * n) // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_permille
             |FROM m ORDER BY prev_type, event_type""".stripMargin),
    ),
    // transformWithState formulation — same fold, same oracle.
    EngineQuery(
      "tws_sessionize",
      (s, dir) =>
        sessionizeTws(Tables.events(s, dir))
          .orderBy("user_id", "session_id"),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
             |g AS (SELECT user_id, event_id, tms,
             |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
             |s AS (SELECT user_id, tms,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events, min(tms) AS start_ms, max(tms) AS end_ms
             |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin),
    ),
  )
}
