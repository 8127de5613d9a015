package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** As-of (point-in-time) join: for each left row, the latest right row
  * with `right.time <= left.time` within the same key — the standard
  * enrichment for event streams against slowly-changing facts.
  *
  * Scale-safe formulation: tag and UNION the two inputs, then one
  * window pass per key ordered by (time, tag) carrying the last-seen
  * right payload forward (`last(..., ignoreNulls=true)`). Exactly one
  * shuffle + one sort on the key — never the naive per-key theta-join
  * (`left.time >= right.time` filter + rank), whose intermediate is
  * |left|×|right| per key. Right rows sort before left rows at equal
  * timestamps, so `>=` (inclusive) semantics hold.
  *
  * The right side must be unique per (key, time) for determinism —
  * callers pre-aggregate duplicates (the query below keeps max order
  * key per date, matching the oracle's ASOF tie discipline).
  */
object AsOf {

  /** `toleranceMs`: when set, a match older than `left.time - tolerance`
    * is discarded (NULL payload) — the bounded-staleness as-of (a quote
    * older than the tolerance is no quote). Same single window pass:
    * the match TIME is carried next to the payload and the staleness
    * test is a projection.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, time: String, payload: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.filter(c => c != key && c != time).toSeq
    val rightSel = Seq(col(key), col(time), lit(0).as("__tag"), col(payload).as("__payload")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val leftSel = Seq(
      col(key), col(time), lit(1).as("__tag"),
      lit(null).cast(right.schema(payload).dataType).as("__payload")) ++ leftCols.map(col)
    val tagged = right.select(rightSel: _*).unionByName(left.select(leftSel: _*))
    val w = Window.partitionBy(key).orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      // __pt must track the SAME row the payload comes from: right rows
      // with a NULL payload are skipped by the payload carry, so they
      // must not advance the staleness clock either.
      .withColumn("__pt",
        last(when(col("__tag") === 0 && col("__payload").isNotNull, col(time)),
          ignoreNulls = true).over(w))
      .withColumn(payload, last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    toleranceMs
      .fold(carried) { tol =>
        carried.withColumn(
          payload, when(col(time) - col("__pt") <= tol, col(payload)))
      }
      .drop("__tag", "__payload", "__pt")
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    // Each event enriched with the user's most recent order at or
    // before the event time; oracle uses DuckDB's native ASOF JOIN.
    EngineQuery(
      "asof_event_last_order",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id"))
        val o = Tables.orders(s, dir)
          .groupBy(
            col("o_custkey").as("user_id"),
            // o_orderdate is TIMESTAMP_NTZ; the UTC session makes the
            // cast to instant deterministic (matches DuckDB epoch_ms)
            unix_millis(col("o_orderdate").cast("timestamp")).as("tms"))
          .agg(max(col("o_orderkey")).as("last_orderkey"))
        asOfJoin(e, o, key = "user_id", time = "tms", payload = "last_orderkey")
          .select("user_id", "event_id", "tms", "last_orderkey")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
             |o AS (SELECT o_custkey, epoch_ms(o_orderdate) AS oms, max(o_orderkey) AS last_orderkey
             |      FROM orders GROUP BY o_custkey, oms)
             |SELECT e.user_id, e.event_id, e.tms, o.last_orderkey
             |FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.tms >= o.oms
             |ORDER BY user_id, event_id""".stripMargin),
      headline = true,
    ),
    // Bounded-staleness variant over interleaved event streams: each
    // purchase gets the user's last view, but only if it happened
    // within the hour (attribution windows, quote staleness). A view
    // older than the tolerance yields NULL — the semantics a plain
    // as-of can't express. Oracle: DuckDB ASOF match + the same
    // staleness projection over the matched time.
    EngineQuery(
      "asof_tolerance_1h",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(
            col("user_id"), unix_millis(col("ts")).as("tms"),
            col("event_id"), col("event_type"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select("user_id", "tms", "event_id")
        val views = ev.where(col("event_type") === "view")
          .groupBy("user_id", "tms") // unique per (key, time) for determinism
          .agg(max(col("event_id")).as("view_event_id"))
        asOfJoin(purchases, views, key = "user_id", time = "tms",
            payload = "view_event_id", toleranceMs = Some(3600L * 1000))
          .select("user_id", "event_id", "tms", "view_event_id")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms FROM events),
             |p AS (SELECT user_id, tms, event_id FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, tms AS vms, max(event_id) AS view_event_id
             |      FROM e WHERE event_type = 'view' GROUP BY user_id, tms)
             |SELECT p.user_id, p.event_id, p.tms,
             |  CASE WHEN p.tms - v.vms <= 3600000 THEN v.view_event_id END AS view_event_id
             |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.tms >= v.vms
             |ORDER BY p.user_id, p.event_id""".stripMargin),
    ),
    // Events-free twin (r9 verdict item 8): the same operator gated on
    // orders alone, so one drifted source table can never again empty
    // the as-of family's correctness evidence (the r9 outage). Each
    // order is enriched with the customer's same-or-earlier-day MAX
    // order key — an INCLUSIVE self as-of, so at the tie timestamp the
    // payload is the probe's own day's max key (possibly the probe
    // order itself or a later-keyed same-day order), matching DuckDB's
    // inclusive ASOF and the right side's pre-aggregation discipline.
    // Named for what it computes; a strict previous-order semantic
    // would need a strict (>) time bound or a day-shifted right side.
    EngineQuery(
      "asof_orders_same_day_max",
      (s, dir) => {
        val l = Tables.orders(s, dir)
          .select(
            col("o_custkey").as("user_id"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("tms"),
            col("o_orderkey"))
        val r = Tables.orders(s, dir)
          .groupBy(
            col("o_custkey").as("user_id"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("tms"))
          .agg(max(col("o_orderkey")).as("last_orderkey"))
        asOfJoin(l, r, key = "user_id", time = "tms", payload = "last_orderkey")
          .select("user_id", "o_orderkey", "tms", "last_orderkey")
          .orderBy("user_id", "o_orderkey")
      },
      Some("""WITH l AS (SELECT o_custkey AS user_id, o_orderkey, epoch_ms(o_orderdate) AS tms FROM orders),
             |r AS (SELECT o_custkey AS user_id, epoch_ms(o_orderdate) AS rms, max(o_orderkey) AS last_orderkey
             |      FROM orders GROUP BY user_id, rms)
             |SELECT l.user_id, l.o_orderkey, l.tms, r.last_orderkey
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tms >= r.rms
             |ORDER BY l.user_id, l.o_orderkey""".stripMargin),
    ),
  )
}
