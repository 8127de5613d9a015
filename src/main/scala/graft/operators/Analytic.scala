package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{EngineQuery, Tables}

/** Analytic (SQL window-function) and event-time operators — a category
  * the reference lacks entirely (SURVEY.md §2.2 "Window functions:
  * none") but that the engine provides as first-class surface.
  *
  * Timestamp portability: all event times are surfaced as BIGINT epoch
  * milliseconds (`unix_millis` / DuckDB `epoch_ms`) — the events table is
  * nanosecond parquet, which Spark truncates to micros and DuckDB keeps;
  * millisecond flooring agrees on both.
  *
  * Scale notes: window functions partition-shuffle once on the partition
  * key and sort within partitions; running sums use exact decimal so the
  * result is independent of partitioning. The hourly rollup is the batch
  * twin of the Structured Streaming job in graft.streaming.
  */
object Analytic {

  private def dec(c: String) = col(c).cast(DecimalType(12, 2))

  /** Top-n rows per group via row_number (ranking window). */
  def topNPerGroup(df: DataFrame, partCol: String, orderCols: Seq[org.apache.spark.sql.Column], n: Int): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCols: _*)
    df.withColumn("rn", row_number().over(w).cast("long")).where(col("rn") <= n)
  }

  /** Gap-based sessionization: a new session starts after `gapMs` of
    * user inactivity. Pure window functions — one shuffle on user_id.
    */
  def sessionize(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id"))
      .withColumn("prev", lag(col("tms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("tms") - col("prev") > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(cum).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tms")).as("start_ms"),
        max(col("tms")).as("end_ms"))
  }

  /** Scale-safe quantile bucketing — the 100 TB twin of the exact
    * `ntile` quartiles. `ntile(4) OVER (PARTITION BY priority)` sorts
    * each priority's rows in ONE window partition: with 5 priorities at
    * 100 TB that is five straggler reducers each sorting a fifth of the
    * fact table. This twin gets per-group p25/p50/p75 thresholds from a
    * bounded-state `approx_percentile` aggregate (tiny result,
    * broadcast) and assigns the bucket as a pure comparison projection
    * — the fact stream never window-sorts. ntile balances COUNTS
    * exactly; threshold bucketing assigns by VALUE, so shares are
    * 0.25 ± sketch rank error (≤ n/1000) ± tie mass — the gate asserts
    * the shares, which is the operator's contract.
    */
  def quartilesByThreshold(orders: DataFrame): DataFrame = {
    val thr = orders.groupBy("o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 1000)").as("thr"))
    val bucketed = orders.select("o_orderpriority", "o_totalprice")
      .join(broadcast(thr), Seq("o_orderpriority"))
      .withColumn("q",
        lit(1L)
          + when(col("o_totalprice") > col("thr")(0), 1L).otherwise(0L)
          + when(col("o_totalprice") > col("thr")(1), 1L).otherwise(0L)
          + when(col("o_totalprice") > col("thr")(2), 1L).otherwise(0L))
    val shares = (1 to 4).map { i =>
      (sum(when(col("q") === i, 1L).otherwise(0L)).cast("double")
        / count(lit(1)).cast("double")).as(s"__s$i")
    }
    bucketed.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt_total"), shares: _*)
      .select(
        col("o_orderpriority") +: col("cnt_total") +:
          (1 to 4).map(i => (abs(col(s"__s$i") - 0.25) <= 0.02).as(s"q${i}_share_ok")): _*)
  }

  /** Cohort retention matrix: cohort = a user's first-activity week,
    * cell (cohort_wk, week_offset) = distinct users from that cohort
    * active that many weeks later, with exact integer-permille
    * retention against the cohort's week-0 size — the standard
    * growth-analytics triangle. Week index is exact integer epoch-ms
    * division, so both engines bucket identically.
    *
    * Scale shape: the raw stream pays exactly ONE shuffle, keyed
    * user_id — `collect_set(week)` whose partials dedupe map-side
    * exactly like distinct, but keep the partitioning the downstream
    * needs (a `distinct` would hash on (user, week), forcing a second
    * user-keyed exchange for the first-seen computation — the shape
    * both former formulations paid). The per-user set is bounded by
    * corpus age in weeks (~52·years), the first-seen week is
    * `array_min` of that set, and the permille division runs on the
    * |weeks|²-row matrix; week 0 always exists (every user's first
    * week is offset 0), so the carried cohort size is total, never
    * null.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), expr("unix_millis(ts) div 604800000").as("wk"))
      .groupBy("user_id").agg(collect_set(col("wk")).as("wks"))
      .select(array_min(col("wks")).as("cohort_wk"), explode(col("wks")).as("wk"))
    uw.groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users")))
          .over(Window.partitionBy("cohort_wk")))
      .withColumn("retention_permille", expr("(1000 * n_users) div cohort_size"))
      .select("cohort_wk", "week_offset", "n_users", "retention_permille")
  }

  /** 3-sigma trailing-window anomaly flags on hourly event volume;
    * see the `events_hourly_anomaly` registration comment for the
    * integer cross-multiplication and RANGE-frame rationale.
    */
  def hourlyAnomaly(events: DataFrame): DataFrame =
    anomalyOverHourly(hourlyEventCounts(events))

  /** (hour_no, event_type, cnt) — the streamable half: a plain
    * aggregation, shared verbatim by the streaming twin
    * (`streaming_hourly_anomaly`), which maintains it in complete mode
    * and runs [[anomalyOverHourly]] downstream over the materialized
    * state (window functions don't stream; the split IS the
    * production shape).
    */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        expr("unix_millis(ts) div 3600000").as("hour_no"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** The trailing-window 3-sigma test over an (hour_no, event_type,
    * cnt) relation.
    */
  def anomalyOverHourly(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour_no").rangeBetween(-24, -1)
    hourly
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("sum_prev", sum("cnt").over(w))
      .withColumn("sumsq_prev", sum(col("cnt") * col("cnt")).over(w))
      .where(col("n_prev") >= 12)
      .select(
        col("hour_no"), col("event_type"), col("cnt"), col("n_prev"), col("sum_prev"),
        when(
          (col("n_prev") * col("cnt") - col("sum_prev"))
            * (col("n_prev") * col("cnt") - col("sum_prev"))
            > lit(9L) * (col("n_prev") * col("sumsq_prev") - col("sum_prev") * col("sum_prev")),
          1L).otherwise(0L).as("anomaly"))
  }

  /** CUSUM changepoint scan over daily order revenue (Page 1954) —
    * the sequential drift detector behind data-quality monitors
    * ("did ingest volume shift regime?"). The textbook recurrence
    * S_t = max(0, S_{t-1} + x_t − k) looks SQL-inexpressible
    * (sequential state), but it has a closed window form:
    * S_t = P_t − min_{i≤t} P_i over the prefix sums P of (x_t − k) —
    * one running sum + one running min, both at DAY cardinality (the
    * corpus reduced to daily totals first), so the single-partition
    * windows are corpus-independent.
    *
    * Exactness: revenue in integer cents (DECIMAL(12,2)·100), the
    * reference drift k = mean daily cents via BIGINT `div`, all
    * prefix arithmetic in BIGINT; the alarm threshold is one mean
    * day's excess accumulated. Bit-identical in DuckDB.
    */
  def cusumRevenueShift(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val tot = daily.agg(
      expr("sum(cents) div count(1)").as("k_cents"))
    val wCum = Window.orderBy("day_no").rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      .withColumn("p", sum(col("cents") - col("k_cents")).over(wCum))
      // the prefix-min includes the EMPTY prefix (P_0 = 0): without
      // the 0 floor, a first-day excess would read as S_1 = 0
      .withColumn("cusum_cents", col("p") - least(lit(0L), min(col("p")).over(wCum)))
      .select(
        col("day_no"), col("cents"), col("cusum_cents"),
        when(col("cusum_cents") > col("k_cents"), 1L).otherwise(0L).as("shifted"))
  }

  /** Multi-touch marketing attribution: every purchase's revenue
    * attributed to the user's FIRST and LAST preceding engagement
    * (view/click) — the first-touch/last-touch pair every growth team
    * reports. One window pass over the user-partitioned event stream
    * (`first`/`last` with ignoreNulls over an unbounded-to-previous
    * frame — no purchase×engagement self-join, which is the naive
    * quadratic formulation), then a ≤(channels+1)² aggregate.
    * Purchases with no prior engagement attribute to 'none'.
    */
  def touchAttribution(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("tms"), col("event_id"), col("value"))
    val eng = when(col("event_type").isin("view", "click"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("first_touch", first(eng, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(eng, ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(
        coalesce(col("first_touch"), lit("none")).as("first_touch"),
        coalesce(col("last_touch"), lit("none")).as("last_touch"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
  }

  /** 2-D skyline (Pareto frontier) of parts: the non-dominated set
    * minimizing (retail price, size) — the classic multi-criteria
    * operator (Börzsönyi et al. 2001). The sort-filter formulation,
    * made scale-safe by the observation that the 2-D frontier needs
    * only MIN(y) per x: the corpus reduces to one row per distinct
    * price (map-side-combined min aggregate), and the running-min
    * dominance test is a window over that value-cardinality relation
    * — never a self-join of the table against itself (the naive
    * NOT EXISTS dominance query is quadratic). Exact integer cents.
    */
  def skylineParts(part: DataFrame): DataFrame = {
    val perPrice = part
      .groupBy((col("p_retailprice").cast(DecimalType(12, 2)) * 100).cast("long")
        .as("price_cents"))
      .agg(min(col("p_size").cast("long")).as("size"))
    val w = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    perPrice
      .withColumn("mn", min("size").over(w))
      .where(col("mn").isNull || col("size") < col("mn"))
      .select("price_cents", "size")
  }

  /** Robust outlier days by median absolute deviation — the
    * median/MAD twin of the 3-sigma mean/stddev anomaly family
    * (Hampel filter): a handful of extreme days can't drag the
    * center or the spread the way they drag a mean and sigma.
    *
    * Scale shape: the corpus reduces to daily totals first
    * (partial+final cents sum), so both exact medians run at DAY
    * cardinality — corpus-independent, the same discipline as CUSUM.
    *
    * Exactness: everything rides doubled integers. `percentile(·,0.5)`
    * of BIGINTs interpolates to k or k+0.5, so 2× the median is an
    * exactly-representable integer in both engines (Spark `percentile`
    * and DuckDB `quantile_cont` share the (1−f)·lo+f·hi definition —
    * the Relational percentile gates pin this); dev2 = |2x − med2| and
    * mad2 = 2·median(dev2) stay integer, and the Hampel test
    * |x−med| > 3·1.4826·MAD becomes 10000·dev2 > 44478·mad2 by exact
    * integer cross-multiplication. No float ever crosses a comparison.
    */
  def madOutlierDays(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val med = daily.agg(expr("cast(2 * percentile(cents, 0.5d) as bigint)").as("med2"))
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
    val mad = dev.agg(expr("cast(2 * percentile(dev2, 0.5d) as bigint)").as("mad2"))
    dev.crossJoin(broadcast(mad))
      .select(
        col("day_no"), col("cents"), col("dev2"), col("mad2"),
        when(col("dev2") * 10000 > col("mad2") * lit(44478L), 1L).otherwise(0L)
          .as("outlier"))
  }

  /** Time-bounded funnel: users converting (purchasing) within
    * `windowMs` of their FIRST view — the standard "7-day conversion"
    * growth metric. The unbounded-window funnel (`events_funnel`) has
    * no deadline; this one anchors a per-user clock. One user-keyed
    * whole-partition window pass attaches first_view to every row (no
    * view×purchase self-join — the naive formulation), then a single
    * global aggregate; conversion rate is exact integer permille.
    */
  def funnelTimeBound(events: DataFrame, windowMs: Long): DataFrame = {
    val w = Window.partitionBy("user_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ev = events.select(
      col("user_id"), col("event_type"), unix_millis(col("ts")).as("tms"),
      (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
    val withFv = ev.withColumn("first_view",
      min(when(col("event_type") === "view", col("tms"))).over(w))
    val isConv = col("event_type") === "purchase" && col("first_view").isNotNull &&
      col("tms") >= col("first_view") && col("tms") <= col("first_view") + windowMs
    withFv.agg(
      count_distinct(when(col("event_type") === "view", col("user_id"))).as("n_viewers"),
      count_distinct(when(isConv, col("user_id"))).as("n_converted"),
      sum(when(isConv, col("cents")).otherwise(lit(0L))).as("conv_revenue_cents"))
      .select(
        col("n_viewers"), col("n_converted"), col("conv_revenue_cents"),
        expr("(1000 * n_converted) div n_viewers").as("conv_permille"))
  }

  /** Seasonal-naive forecast backtest — the baseline every demand-
    * forecasting pipeline must beat (M-competition convention):
    * forecast(d) = actual(d − 7), error aggregated per weekday. The
    * corpus reduces to daily totals first (the CUSUM/MAD discipline),
    * the lag-7 window runs at DAY cardinality, and the backtest rollup
    * is a 7-row relation. sum_abs_err and the MAE (integer cents div)
    * are exact.
    */
  def seasonalNaiveBacktest(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val w = Window.orderBy("day_no")
    daily
      .withColumn("forecast", lag(col("cents"), 7).over(w))
      .where(col("forecast").isNotNull)
      .groupBy((col("day_no") % 7).as("weekday"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(abs(col("cents") - col("forecast"))).as("sum_abs_err"))
      .select(
        col("weekday"), col("n_days"), col("sum_abs_err"),
        expr("sum_abs_err div n_days").as("mae_cents"))
  }

  /** Maximum drawdown of cumulative revenue — the risk metric
    * (peak-to-trough decline of a running total): dd(t) = max_{s≤t}
    * C(s) − C(t) over the cumulative daily series, reported at its
    * deterministic argmax (worst trough; ties → earliest day). Same
    * closed-window discipline as CUSUM: the corpus reduces to daily
    * totals, one running sum + one running max at DAY cardinality,
    * integer cents throughout.
    */
  def revenueDrawdown(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val wCum = Window.orderBy("day_no").rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("cum", sum("cents").over(wCum))
      .withColumn("peak", max("cum").over(wCum))
      .select(col("day_no").as("trough_day"), (col("peak") - col("cum")).as("drawdown_cents"))
      .orderBy(col("drawdown_cents").desc, col("trough_day"))
      .limit(1)
  }

  /** Session bounce rate: single-event sessions over all sessions —
    * the engagement KPI, as one rollup over the gap-sessionized
    * relation (which already pays the family's one user-keyed window
    * pass). Integer permille.
    */
  def bounceRate(events: DataFrame, gapMs: Long): DataFrame =
    bounceRateFrom(sessionize(events, gapMs))

  /** The rollup half of [[bounceRate]] over an ALREADY-sessionized
    * relation — split out (r19 optimization round) so composed callers
    * ([[EventFlow.eventsKpiSnapshot]]) can share ONE sessionize pass
    * across KPIs instead of re-running the user-keyed window per
    * consumer. */
  def bounceRateFrom(sess: DataFrame): DataFrame =
    sess
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(
        col("n_sessions"), col("n_bounce"),
        expr("(1000 * n_bounce) div n_sessions").as("bounce_permille"))

  /** Strict three-step ordered funnel (view → click → purchase, each
    * step strictly AFTER the previous): the sequential dependency is
    * three user-keyed aggregates chained by co-partitioned joins —
    * stage k's threshold is stage k−1's timestamp, so every join keys
    * on user_id and Catalyst plans the chain without re-exchanging
    * (one shuffle key end-to-end). The naive formulation is a 3-way
    * event self-join with inequality conditions — quadratic per user
    * and un-pushable. Counts are exact; permilles integer.
    */
  def funnelThreeStep(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"), col("event_type"), unix_millis(col("ts")).as("tms"))
    val s1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("tms").as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id").where(col("tms") > col("t1"))
      .groupBy("user_id").agg(min("tms").as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("tms") > col("t2"))
      .groupBy("user_id").agg(min("tms").as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_step1"),
        sum(col("t2").isNotNull.cast("long")).as("n_step2"),
        sum(col("t3").isNotNull.cast("long")).as("n_step3"))
      .select(
        col("n_step1"), col("n_step2"), col("n_step3"),
        expr("(1000 * n_step2) div n_step1").as("s2_permille"),
        expr("(1000 * n_step3) div n_step1").as("s3_permille"))
  }

  /** Gini coefficient of daily revenue — the inequality measure, in
    * its exact sorted form: G = Σᵢ(2i−n−1)·xᵢ / (n·Σx) over ascending
    * xᵢ (mean-absolute-difference normalized by 2·mean, no pairwise
    * O(n²) expansion). The corpus reduces to daily totals first, the
    * rank runs at DAY cardinality, and numerator/denominator surface
    * as exact BIGINTs with the ratio in integer permille.
    */
  def revenueGini(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val w = Window.orderBy("cents", "day_no")
    daily
      .withColumn("rn", row_number().over(w).cast("long"))
      .agg(
        count(lit(1)).as("n"),
        sum("cents").as("sx"),
        sum((col("rn") * 2 - 1) * col("cents")).as("wsum"))
      .select(
        col("n"), col("sx"),
        // G = [2Σi·xᵢ − (n+1)Σx]/(n·Σx); with wsum = Σ(2i−1)xᵢ the
        // numerator simplifies to wsum − n·Σx
        (col("wsum") - col("n") * col("sx")).as("gini_num"),
        (col("n") * col("sx")).as("gini_den"),
        expr("(1000 * (wsum - n * sx)) div (n * sx)").as("gini_permille"))
  }

  /** Conversion-latency distribution: hours from a user's FIRST view
    * to their first subsequent purchase, bucketed — the
    * time-to-convert histogram next to the funnel's count metrics.
    * Two chained user-keyed aggregates (the funnel discipline: the
    * inequality is a post-join filter, user_id the only exchange key),
    * then a bucket rollup at histogram cardinality. Exact integer
    * hour buckets.
    */
  def conversionLatencyHist(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"), col("event_type"), unix_millis(col("ts")).as("tms"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("tms").as("t_view"))
    val p = ev.where(col("event_type") === "purchase")
      .join(v, "user_id").where(col("tms") > col("t_view"))
      .groupBy("user_id").agg(min(col("tms") - col("t_view")).as("latency_ms"))
    p.groupBy(expr("latency_ms div 3600000").as("hours_bucket"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Pareto (80/20) revenue concentration: how many top customers
    * cover 80% of revenue — answered to BUCKET resolution, the
    * histogram-decomposition discipline (`lang_adaptive_cut`): a
    * customer-cardinality rank window would sort the whole customer
    * table in one task at 100 TB; instead customer revenues collapse
    * into value buckets (one aggregation), the descending cumulative
    * windows run at BUCKET cardinality, and the crossing bucket's
    * whole population counts (resolution = one bucket, the knob is
    * bucket width). Exact integers; the 80% test cross-multiplies
    * (5·cum ≥ 4·total).
    */
  def paretoRevenueConcentration(orders: DataFrame, bucketCents: Long): DataFrame = {
    val cust = orders
      .groupBy("o_custkey")
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val buckets = cust
      .groupBy(expr(s"cents div $bucketCents").as("b"))
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("sum_cents"))
    val wDesc = Window.orderBy(col("b").desc).rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    buckets
      .withColumn("cum_n", sum("n_cust").over(wDesc))
      .withColumn("cum_s", sum("sum_cents").over(wDesc))
      .withColumn("total_n", sum("n_cust").over(wAll))
      .withColumn("total_s", sum("sum_cents").over(wAll))
      .where(col("cum_s") * 5 >= col("total_s") * 4)
      .agg(
        min("total_n").as("n_customers"),
        min("total_s").as("total_cents"),
        min("cum_n").as("n_top_for_80pct"))
      .select(
        col("n_customers"), col("total_cents"), col("n_top_for_80pct"),
        expr("(1000 * n_top_for_80pct) div n_customers").as("top_share_permille"))
  }

  /** DuckDB oracle of the hourly anomaly relation — shared by the
    * batch gate (`events_hourly_anomaly`) and the streaming twin
    * (`streaming_hourly_anomaly`), which must agree with it exactly.
    */
  val hourlyAnomalyOracle: String =
    """WITH hourly AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hour_no, event_type,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |win AS (
      |  SELECT hour_no, event_type, cnt,
      |    count(*) OVER w AS n_prev,
      |    CAST(sum(cnt) OVER w AS BIGINT) AS sum_prev,
      |    CAST(sum(cnt * cnt) OVER w AS BIGINT) AS sumsq_prev
      |  FROM hourly
      |  WINDOW w AS (
      |    PARTITION BY event_type ORDER BY hour_no
      |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT hour_no, event_type, cnt, n_prev, sum_prev,
      |  CAST(CASE WHEN (n_prev * cnt - sum_prev) * (n_prev * cnt - sum_prev)
      |            > 9 * (n_prev * sumsq_prev - sum_prev * sum_prev)
      |       THEN 1 ELSE 0 END AS BIGINT) AS anomaly
      |FROM win WHERE n_prev >= 12
      |ORDER BY event_type, hour_no""".stripMargin

  /** Exponentially-weighted moving average of daily revenue with α=1/2
    * and a 20-day truncated kernel — EXACT integer arithmetic: the
    * weights are powers of two, so `ewma·2^19` is an integer
    * convolution (`Σ cents[t−off]·2^(19−off)`), and both engines
    * compute the identical BIGINT. The usual EWMA recurrence is a
    * sequential float fold (order-dependent, non-distributable); the
    * truncated-kernel convolution is its scale shape: one fact
    * aggregation collapses orders to day cardinality, the calendar
    * spine fills gaps with zero revenue, and the convolution is a
    * 20-way generate at day cardinality — no corpus-wide window, no
    * float accumulation. Kernel mass truncation is < 2^-20 of the
    * infinite tail. Overflow-safe: daily cents ·2^19·20 stays < 2^63
    * through sf100.
    */
  def ewmaRevenue(orders: DataFrame): DataFrame = {
    // the day-cardinality aggregate is consumed by FOUR downstream
    // subtrees (bounds, spine fill, convolution, final join); without
    // the checkpoint each one re-scans the fact table (the dumped plan
    // had 5 parquet scans) — the train-once/scan-many discipline
    // (SemDedup assignments, BPE vocab) makes the corpus pay exactly one
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
      .localCheckpoint()
    val b = daily.agg(min("day_no").as("d0"), max("day_no").as("d1"))
    val filled = b.select(explode(sequence(col("d0"), col("d1"))).as("day_no"))
      .join(daily, Seq("day_no"), "left")
      .select(col("day_no"), coalesce(col("cents"), lit(0L)).as("cents"))
    val ew = filled
      .select(col("day_no"), col("cents"),
        explode(sequence(lit(0L), lit(19L))).as("off"))
      .select((col("day_no") + col("off")).as("day_no"),
        expr("cents * CAST(pow(2, 19 - off) AS BIGINT)").as("c"))
      .crossJoin(broadcast(b.select(col("d1"))))
      .where(col("day_no") <= col("d1"))
      .groupBy("day_no").agg(sum("c").as("ewma_scaled"))
    filled.join(ew, Seq("day_no")).select("day_no", "cents", "ewma_scaled")
  }

  /** Theil–Sen robust trend estimator over the daily-revenue series:
    * the median of all pairwise slopes (Theil 1950 / Sen 1968) —
    * outlier-resistant where OLS (`ols_tokens_by_lang`) is not; a
    * single anomalous day moves OLS but not the pairwise-slope median
    * until half the days are corrupt (29.3% breakdown point).
    *
    * INTEGER-EXACT: each slope is quantized to micro-cents/day with
    * the sign rule (sign · (|Δcents|·10⁶ div Δdays) — magnitude-first
    * so Spark's truncating `div` and DuckDB's flooring `//` agree on
    * negative slopes), and the median of those BIGINT values is an
    * exact discrete selection (lower median, rank (n+1) div 2). The
    * Δcents·10⁶ product runs in DECIMAL(38,0)/HUGEINT; the quantized
    * slope re-enters BIGINT (ceiling: |Δcents| ≤ 9.2·10¹² — a $92B/day
    * revenue swing — before the micro lane would wrap).
    *
    * Scale (100 TB): the corpus collapses to |days| rows in one
    * map-side-combined aggregation — the pair expansion is
    * |days|²/2, CALENDAR-bounded, not corpus-bounded (2,400 days →
    * 2.9M pairs; 30 years → 60M — trivial either way), and the small
    * daily relation broadcasts so the non-equi self-join never
    * shuffles. The median itself is the ExactQuantile two-phase
    * bucket decomposition: a 2²⁰-micro-wide histogram pass locates
    * the rank-k bucket (truncating vs flooring bucket boundaries
    * differ between engines, but any monotone contiguous bucketing
    * selects the same k-th value), then a re-scan confined to that
    * bucket picks the exact slope — no corpus-scale single-partition
    * sort anywhere.
    */
  def theilSenTrend(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
      .localCheckpoint() // pair expansion + phase-2 re-scan reuse it
    // The slope relation is consumed twice (histogram phase + the
    // candidate-bucket re-scan) — pin it once (|days|²/2 longs, ~25 MB
    // at 30 years) so the BNLJ expansion and the decimal slope lane run
    // a single time (measured ~2× end-to-end).
    val (slopes, _) = graft.Checkpoints.localEager(
      daily.select(col("day_no").as("di"), col("cents").as("ri"))
      .join(broadcast(daily.select(col("day_no").as("dj"), col("cents").as("rj"))),
        col("dj") > col("di"))
      .select(
        // greatest(…,1) is inert (the join guarantees dj > di) but keeps
        // ANSI Spark from tripping on the divisor when codegen hoists it
        // out of the CaseWhen branches ahead of the branch guard.
        when(col("rj") >= col("ri"),
          expr("((cast(rj as decimal(38,0)) - ri) * 1000000) div greatest(dj - di, 1)"))
          .otherwise(-expr("((cast(ri as decimal(38,0)) - rj) * 1000000) div greatest(dj - di, 1)"))
          .cast("long").as("s")))
    val w = 1L << 20
    val hist = slopes
      .withColumn("bkt", expr(s"s div $w"))
      .groupBy("bkt").agg(count(lit(1)).as("cnt"))
    val target = hist
      .withColumn("n_pairs", expr("sum(cnt) over ()"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy("bkt")))
      .withColumn("k", expr("(n_pairs + 1) div 2"))
      .where(col("cum") - col("cnt") < col("k") && col("k") <= col("cum"))
      .select(col("bkt"), (col("cum") - col("cnt")).as("rank_before"),
        col("k"), col("n_pairs"))
    slopes
      .withColumn("bkt", expr(s"s div $w"))
      .join(broadcast(target), "bkt")
      .groupBy("s", "rank_before", "k", "n_pairs").agg(count(lit(1)).as("c"))
      .withColumn("cum2", sum(col("c")).over(Window.orderBy("s")))
      .where(col("rank_before") + col("cum2") >= col("k"))
      .orderBy("s").limit(1)
      .select(col("n_pairs"), col("s").as("median_slope_micro"))
  }

  /** STL-lite additive decomposition of the daily-revenue series:
    * cents = trend + seasonal + residual. Trend is the centered 7-day
    * moving average (NULL at the ≤3-day boundaries — no partial-window
    * bias); the weekly seasonal is the per-weekday mean of the
    * detrended series, RE-CENTERED so the seven seasonals sum to ~0
    * (the standard identifiability constraint); the residual is what
    * anomaly detection should consume — `mad_outlier_days` on raw
    * cents flags every Sunday, on the residual only true anomalies.
    *
    * INTEGER-EXACT: every division is a sign-ruled truncating div
    * (detrended values are signed — the Drift rule keeps Spark `div`
    * and DuckDB `//` agreeing), so decomposition is bit-identical in
    * both engines. Scale: the corpus collapses to |days| rows in one
    * map-side-combined aggregation; the trend window, weekday means,
    * and recentering all run at day/weekday cardinality.
    */
  def stlDecomposeDaily(orders: DataFrame): DataFrame = {
    def sdiv(num: String, den: String) =
      s"IF($num >= 0, $num div $den, -((-($num)) div $den))"
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val w = Window.orderBy("day_no").rangeBetween(-3, 3)
    val trended = daily
      .withColumn("w_sum", sum(col("cents")).over(w))
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("trend",
        when(col("w_n") === 7, expr(sdiv("w_sum", "7"))).otherwise(lit(null)))
      .withColumn("detr", col("cents") - col("trend"))
      .select("day_no", "cents", "trend", "detr")
    val weekly = trended.where(col("detr").isNotNull)
      .groupBy((col("day_no") % 7).as("wd"))
      .agg(sum(col("detr")).as("s"), count(lit(1)).as("n"))
      .withColumn("s_raw", expr(sdiv("s", "n")))
      .withColumn("s_mean_num", expr("sum(s_raw) over ()"))
      .withColumn("seasonal", col("s_raw") - expr(sdiv("s_mean_num", "7")))
      .select("wd", "seasonal")
    // LEFT join: a series too short/gapped for some weekday to appear
    // in the fully-windowed region must keep those days with NULL
    // seasonal/residual (the NULL-trend boundary convention) — an inner
    // join would silently DROP them, the worse failure mode.
    trended
      .join(broadcast(weekly), (col("day_no") % 7) === col("wd"), "left_outer")
      .select(
        col("day_no"), col("cents"), col("trend"), col("seasonal"),
        (col("cents") - col("trend") - col("seasonal")).as("residual"))
  }

  private val DuckStl =
    """WITH daily AS (
      |  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |tr AS (
      |  SELECT day_no, cents,
      |    CASE WHEN count(*) OVER win = 7 THEN
      |      CASE WHEN sum(cents) OVER win >= 0 THEN (sum(cents) OVER win) // 7
      |           ELSE -((-(sum(cents) OVER win)) // 7) END
      |    END AS trend
      |  FROM daily
      |  WINDOW win AS (ORDER BY day_no RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (SELECT day_no, cents, trend, cents - trend AS detr FROM tr),
      |wk0 AS (
      |  SELECT day_no % 7 AS wd,
      |    CAST(sum(detr) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      |  FROM dt WHERE detr IS NOT NULL GROUP BY 1),
      |wk1 AS (SELECT wd,
      |    CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS s_raw FROM wk0),
      |wk AS (SELECT wd, s_raw,
      |    CAST(sum(s_raw) OVER () AS BIGINT) AS m FROM wk1),
      |sea AS (SELECT wd,
      |    s_raw - (CASE WHEN m >= 0 THEN m // 7 ELSE -((-m) // 7) END) AS seasonal FROM wk)
      |SELECT d.day_no, d.cents, CAST(d.trend AS BIGINT) AS trend,
      |  CAST(s.seasonal AS BIGINT) AS seasonal,
      |  CAST(d.cents - d.trend - s.seasonal AS BIGINT) AS residual
      |FROM dt d LEFT JOIN sea s ON d.day_no % 7 = s.wd
      |ORDER BY d.day_no""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "stl_decompose_daily",
      (s, dir) => stlDecomposeDaily(Tables.orders(s, dir)).orderBy("day_no"),
      Some(DuckStl),
    ),
    EngineQuery(
      "theilsen_revenue_trend",
      (s, dir) => theilSenTrend(Tables.orders(s, dir)),
      Some("""WITH daily AS (
             |  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |p AS (
             |  SELECT CASE WHEN b.cents >= a.cents
             |    THEN ((CAST(b.cents AS HUGEINT) - a.cents) * 1000000) // (b.day_no - a.day_no)
             |    ELSE -(((CAST(a.cents AS HUGEINT) - b.cents) * 1000000) // (b.day_no - a.day_no))
             |    END AS s
             |  FROM daily a JOIN daily b ON b.day_no > a.day_no),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM p),
             |sel AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM p)
             |SELECT n.n_pairs, CAST(sel.s AS BIGINT) AS median_slope_micro
             |FROM sel, n WHERE rn = (n_pairs + 1) // 2 ORDER BY 1""".stripMargin),
    ),
    EngineQuery(
      "ewma_revenue_daily",
      (s, dir) => ewmaRevenue(Tables.orders(s, dir)).orderBy("day_no"),
      Some("""WITH daily AS (
             |  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |b AS (SELECT min(day_no) AS d0, max(day_no) AS d1 FROM daily),
             |filled AS (
             |  SELECT s.day_no, COALESCE(d.cents, 0) AS cents
             |  FROM (SELECT unnest(generate_series(d0, d1)) AS day_no FROM b) s
             |  LEFT JOIN daily d USING (day_no)),
             |contrib AS (
             |  SELECT f.day_no + o.off AS day_no,
             |    f.cents * CAST(pow(2, 19 - o.off) AS BIGINT) AS c
             |  FROM filled f, (SELECT unnest(generate_series(0, 19)) AS off) o),
             |ew AS (SELECT day_no, CAST(sum(c) AS BIGINT) AS ewma_scaled
             |  FROM contrib, b WHERE day_no <= b.d1 GROUP BY day_no)
             |SELECT f.day_no, f.cents, e.ewma_scaled
             |FROM filled f JOIN ew e USING (day_no) ORDER BY f.day_no""".stripMargin),
    ),
    EngineQuery(
      "cohort_retention",
      (s, dir) => cohortRetention(Tables.events(s, dir)).orderBy("cohort_wk", "week_offset"),
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
             |u AS (SELECT user_id, wk,
             |  min(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM uw),
             |m AS (SELECT cohort_wk, wk - cohort_wk AS week_offset,
             |  CAST(count(*) AS BIGINT) AS n_users FROM u GROUP BY 1, 2),
             |c AS (SELECT cohort_wk, week_offset, n_users,
             |  max(CASE WHEN week_offset = 0 THEN n_users END)
             |    OVER (PARTITION BY cohort_wk) AS cohort_size FROM m)
             |SELECT cohort_wk, week_offset, n_users,
             |  CAST((1000 * n_users) // cohort_size AS BIGINT) AS retention_permille
             |FROM c ORDER BY cohort_wk, week_offset""".stripMargin),
      headline = true,
    ),
    // RANGE-frame moving aggregate: 7-day trailing revenue per order
    // day. The frame is value-based (rangeBetween over a day number),
    // not row-based — days with no orders still shrink the window, and
    // duplicate days fall into one frame; a ROWS frame gets both wrong.
    // The window accumulates in DECIMAL (exact — Spark's and DuckDB's
    // windowed-sum combine orders may differ, so a double accumulation
    // would be ulp-fragile); doubles are derived only at the end, per
    // the EngineQuery portability contract.
    EngineQuery(
      "moving_avg_daily_revenue",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
          .agg(sum(dec("o_totalprice")).as("revenue_dec"))
        val w = Window.orderBy("day_no").rangeBetween(-6, 0)
        daily
          .withColumn("trailing_dec", sum(col("revenue_dec")).over(w))
          .withColumn("trailing_7d_days", count(lit(1)).over(w))
          .select(
            col("day_no"),
            col("revenue_dec").cast("double").as("revenue"),
            col("trailing_dec").cast("double").as("trailing_7d_revenue"),
            col("trailing_7d_days"),
            (col("trailing_dec").cast("double") / col("trailing_7d_days").cast("double"))
              .as("trailing_7d_avg"))
          .orderBy("day_no")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue_dec
             |  FROM orders GROUP BY day_no),
             |win AS (
             |  SELECT day_no, revenue_dec,
             |    sum(revenue_dec) OVER w AS trailing_dec,
             |    count(*) OVER w AS trailing_7d_days
             |  FROM daily
             |  WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT day_no,
             |  CAST(revenue_dec AS DOUBLE) AS revenue,
             |  CAST(trailing_dec AS DOUBLE) AS trailing_7d_revenue,
             |  trailing_7d_days,
             |  CAST(trailing_dec AS DOUBLE) / CAST(trailing_7d_days AS DOUBLE) AS trailing_7d_avg
             |FROM win ORDER BY day_no""".stripMargin),
    ),
    // Trailing-window anomaly detection on hourly event volume — the
    // ops-monitoring query every ingest pipeline runs over its own
    // throughput. The event stream collapses FIRST to (hour, type)
    // counts (partial+final aggregate — the only corpus-wide work);
    // the trailing-24h baseline is a value-based RANGE frame over hour
    // numbers (hours with no events shrink the frame; a ROWS frame
    // would silently bridge gaps), excluding the current hour so the
    // tested value never contaminates its own baseline. The 3-sigma
    // test is cross-multiplied to integers — (n·cnt − Σ)² > 9·(n·Σx² −
    // Σ²) is (cnt − mean)² > 9·var with both sides scaled by n² — so
    // no sqrt, no float accumulation, and DuckDB agrees bit-for-bit.
    // At 100 TB the window input is hour-cardinality (corpus-
    // independent), so the window task is trivially small.
    EngineQuery(
      "events_hourly_anomaly",
      (s, dir) => hourlyAnomaly(Tables.events(s, dir)).orderBy("event_type", "hour_no"),
      Some(hourlyAnomalyOracle),
    ),
    EngineQuery(
      "skyline_parts",
      (s, dir) => skylineParts(Tables.part(s, dir)).orderBy("price_cents"),
      Some("""WITH pp AS (
             |  SELECT CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_cents,
             |    CAST(min(p_size) AS BIGINT) AS size
             |  FROM part GROUP BY 1),
             |sky AS (
             |  SELECT price_cents, size,
             |    min(size) OVER (ORDER BY price_cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mn
             |  FROM pp)
             |SELECT price_cents, size FROM sky
             |WHERE mn IS NULL OR size < mn ORDER BY price_cents""".stripMargin),
    ),
    // Rank-function completeness: percent_rank / cume_dist / dense_rank
    // / nth_value over the daily-revenue relation (day cardinality — the
    // corpus reduces first, so the single-partition ordering window is
    // corpus-independent). The compound (cents, day_no) order key makes
    // every rank deterministic; percent_rank and cume_dist are exact
    // small rationals, bit-identical as doubles in both engines.
    EngineQuery(
      "window_rank_suite",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day_no"))
          .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
        val w = Window.orderBy("cents", "day_no")
        val wAll = Window.orderBy("cents", "day_no")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        daily.select(
          col("day_no"), col("cents"),
          dense_rank().over(w).cast("long").as("drank"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"),
          nth_value(col("cents"), 3).over(wAll).as("third_lowest"))
          .orderBy("day_no")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1)
             |SELECT day_no, cents,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
             |  percent_rank() OVER w AS prank,
             |  cume_dist() OVER w AS cdist,
             |  nth_value(cents, 3) OVER (ORDER BY cents, day_no
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_lowest
             |FROM daily
             |WINDOW w AS (ORDER BY cents, day_no)
             |ORDER BY day_no""".stripMargin),
    ),
    EngineQuery(
      "seasonal_naive_backtest",
      (s, dir) => seasonalNaiveBacktest(Tables.orders(s, dir)).orderBy("weekday"),
      Some("""WITH daily AS (
             |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |f AS (SELECT day_no, cents,
             |  lag(cents, 7) OVER (ORDER BY day_no) AS forecast FROM daily)
             |SELECT day_no % 7 AS weekday, CAST(count(*) AS BIGINT) AS n_days,
             |  CAST(sum(abs(cents - forecast)) AS BIGINT) AS sum_abs_err,
             |  CAST(sum(abs(cents - forecast)) AS BIGINT) // count(*) AS mae_cents
             |FROM f WHERE forecast IS NOT NULL
             |GROUP BY 1 ORDER BY weekday""".stripMargin),
    ),
    EngineQuery(
      "funnel_time_bound",
      (s, dir) => funnelTimeBound(Tables.events(s, dir), windowMs = 7L * 86400000L),
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_ms(ts) AS tms,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
             |  FROM events),
             |fv AS (
             |  SELECT *, min(CASE WHEN event_type = 'view' THEN tms END)
             |    OVER (PARTITION BY user_id) AS first_view
             |  FROM ev),
             |m AS (SELECT
             |  CAST(count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS n_viewers,
             |  CAST(count(DISTINCT CASE WHEN event_type = 'purchase' AND first_view IS NOT NULL
             |    AND tms >= first_view AND tms <= first_view + 604800000 THEN user_id END) AS BIGINT) AS n_converted,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND first_view IS NOT NULL
             |    AND tms >= first_view AND tms <= first_view + 604800000 THEN cents ELSE 0 END), 0) AS BIGINT)
             |    AS conv_revenue_cents
             |  FROM fv)
             |SELECT n_viewers, n_converted, conv_revenue_cents,
             |  (1000 * n_converted) // n_viewers AS conv_permille FROM m""".stripMargin),
    ),
    EngineQuery(
      "funnel_three_step",
      (s, dir) => funnelThreeStep(Tables.events(s, dir)),
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
             |s1 AS (SELECT user_id, min(tms) AS t1 FROM ev
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(tms) AS t2 FROM ev e JOIN s1 USING (user_id)
             |  WHERE event_type = 'click' AND tms > t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(tms) AS t3 FROM ev e JOIN s2 USING (user_id)
             |  WHERE event_type = 'purchase' AND tms > t2 GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_step1,
             |  CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step2,
             |  CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step3
             |  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
             |SELECT n_step1, n_step2, n_step3,
             |  (1000 * n_step2) // n_step1 AS s2_permille,
             |  (1000 * n_step3) // n_step1 AS s3_permille FROM m""".stripMargin),
    ),
    // Argmax/argmin surface: max_by/min_by with a PACKED deterministic
    // comparison key (cents·10^7 + orderkey — ties on price resolve by
    // key, so both engines' arg_max agree exactly; bare max_by on a
    // tied value column is engine-arbitrary and ungateable).
    EngineQuery(
      "argmax_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderpriority"), col("o_orderkey"),
            (expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as long)") * 10000000L
              + col("o_orderkey")).as("pk"))
          .groupBy("o_orderpriority")
          .agg(
            expr("max_by(o_orderkey, pk)").as("priciest_order"),
            expr("min_by(o_orderkey, pk)").as("cheapest_order"))
          .orderBy("o_orderpriority"),
      Some("""WITH t AS (
             |  SELECT o_orderpriority, o_orderkey,
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 10000000
             |      + o_orderkey AS pk
             |  FROM orders)
             |SELECT o_orderpriority,
             |  arg_max(o_orderkey, pk) AS priciest_order,
             |  arg_min(o_orderkey, pk) AS cheapest_order
             |FROM t GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
    ),
    EngineQuery(
      "conversion_latency_hist",
      (s, dir) => conversionLatencyHist(Tables.events(s, dir)).orderBy("hours_bucket"),
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
             |v AS (SELECT user_id, min(tms) AS t_view FROM ev
             |  WHERE event_type = 'view' GROUP BY 1),
             |p AS (SELECT e.user_id, min(tms - t_view) AS latency_ms
             |  FROM ev e JOIN v USING (user_id)
             |  WHERE event_type = 'purchase' AND tms > t_view GROUP BY 1)
             |SELECT latency_ms // 3600000 AS hours_bucket,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM p GROUP BY 1 ORDER BY hours_bucket""".stripMargin),
    ),
    EngineQuery(
      "pareto_revenue_concentration",
      (s, dir) => paretoRevenueConcentration(Tables.orders(s, dir), bucketCents = 100000L),
      Some("""WITH cust AS (
             |  SELECT o_custkey,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |bk AS (SELECT cents // 100000 AS b, CAST(count(*) AS BIGINT) AS n_cust,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents FROM cust GROUP BY 1),
             |c AS (SELECT b,
             |  CAST(sum(n_cust) OVER wd AS BIGINT) AS cum_n,
             |  CAST(sum(sum_cents) OVER wd AS BIGINT) AS cum_s,
             |  CAST(sum(n_cust) OVER wa AS BIGINT) AS total_n,
             |  CAST(sum(sum_cents) OVER wa AS BIGINT) AS total_s
             |  FROM bk
             |  WINDOW wd AS (ORDER BY b DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wa AS (ORDER BY b DESC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
             |m AS (SELECT min(total_n) AS n_customers, min(total_s) AS total_cents,
             |  min(cum_n) AS n_top_for_80pct
             |  FROM c WHERE cum_s * 5 >= total_s * 4)
             |SELECT n_customers, total_cents, n_top_for_80pct,
             |  (1000 * n_top_for_80pct) // n_customers AS top_share_permille FROM m""".stripMargin),
    ),
    EngineQuery(
      "revenue_gini",
      (s, dir) => revenueGini(Tables.orders(s, dir)),
      Some("""WITH daily AS (
             |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |r AS (SELECT cents,
             |  CAST(row_number() OVER (ORDER BY cents, day_no) AS BIGINT) AS rn FROM daily),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sx,
             |  CAST(sum((rn * 2 - 1) * cents) AS BIGINT) AS wsum FROM r)
             |SELECT n, sx, wsum - n * sx AS gini_num, n * sx AS gini_den,
             |  (1000 * (wsum - n * sx)) // (n * sx) AS gini_permille FROM m""".stripMargin),
    ),
    EngineQuery(
      "revenue_drawdown",
      (s, dir) => revenueDrawdown(Tables.orders(s, dir)),
      Some("""WITH daily AS (
             |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |c1 AS (SELECT day_no, sum(cents) OVER (ORDER BY day_no
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM daily),
             |c2 AS (SELECT day_no, cum, max(cum) OVER (ORDER BY day_no
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM c1)
             |SELECT day_no AS trough_day, CAST(peak - cum AS BIGINT) AS drawdown_cents
             |FROM c2 ORDER BY drawdown_cents DESC, trough_day LIMIT 1""".stripMargin),
    ),
    EngineQuery(
      "session_bounce_rate",
      (s, dir) => bounceRate(Tables.events(s, dir), gapMs = 30 * 60 * 1000L),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
             |g AS (SELECT user_id, event_id, tms,
             |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
             |s AS (SELECT user_id,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g),
             |sess AS (SELECT user_id, session_id, count(*) AS n_events
             |  FROM s GROUP BY 1, 2),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
             |  FROM sess)
             |SELECT n_sessions, n_bounce,
             |  (1000 * n_bounce) // n_sessions AS bounce_permille FROM m""".stripMargin),
    ),
    EngineQuery(
      "mad_outlier_days",
      (s, dir) => madOutlierDays(Tables.orders(s, dir)).orderBy("day_no"),
      Some("""WITH daily AS (
             |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |med AS (SELECT CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2 FROM daily),
             |dev AS (SELECT day_no, cents, abs(cents * 2 - med2) AS dev2, med2
             |  FROM daily CROSS JOIN med),
             |mad AS (SELECT CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad2 FROM dev)
             |SELECT day_no, cents, dev2, mad2,
             |  CAST(CASE WHEN dev2 * 10000 > mad2 * 44478 THEN 1 ELSE 0 END AS BIGINT) AS outlier
             |FROM dev CROSS JOIN mad ORDER BY day_no""".stripMargin),
    ),
    EngineQuery(
      "attribution_touch_revenue",
      (s, dir) => touchAttribution(Tables.events(s, dir)).orderBy("first_touch", "last_touch"),
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_ms(ts) AS tms, event_id, value FROM events),
             |f AS (
             |  SELECT *,
             |    first_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
             |      IGNORE NULLS) OVER w AS first_touch,
             |    last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
             |      IGNORE NULLS) OVER w AS last_touch
             |  FROM ev
             |  WINDOW w AS (
             |    PARTITION BY user_id ORDER BY tms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT COALESCE(first_touch, 'none') AS first_touch,
             |  COALESCE(last_touch, 'none') AS last_touch,
             |  count(*) AS n_purchases,
             |  CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
             |    AS revenue_cents
             |FROM f WHERE event_type = 'purchase'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),
    EngineQuery(
      "cusum_revenue_shift",
      (s, dir) => cusumRevenueShift(Tables.orders(s, dir)).orderBy("day_no"),
      Some("""WITH daily AS (
             |  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |tot AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS k_cents FROM daily),
             |pre AS (
             |  SELECT day_no, cents, k_cents,
             |    CAST(sum(cents - k_cents) OVER w AS BIGINT) AS p
             |  FROM daily, tot
             |  WINDOW w AS (ORDER BY day_no ROWS UNBOUNDED PRECEDING)),
             |cus AS (
             |  SELECT day_no, cents, k_cents,
             |    p - least(0, min(p) OVER (ORDER BY day_no ROWS UNBOUNDED PRECEDING))
             |      AS cusum_cents
             |  FROM pre)
             |SELECT day_no, cents, cusum_cents,
             |  CAST(CASE WHEN cusum_cents > k_cents THEN 1 ELSE 0 END AS BIGINT) AS shifted
             |FROM cus ORDER BY day_no""".stripMargin),
      headline = true,
    ),
    // Event funnel: users who viewed and then purchased AFTER their
    // first view. One running-flag window pass + one aggregation — no
    // self-join of the event stream.
    EngineQuery(
      "funnel_view_purchase",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(
            col("user_id"),
            col("event_type"),
            unix_millis(col("ts")).as("tms"),
            col("event_id"))
        val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        val flagged = ev
          .withColumn("seen_view", max(when(col("event_type") === "view", 1L).otherwise(0L)).over(w))
        flagged.groupBy("user_id")
          .agg(
            max(when(col("event_type") === "view", 1L).otherwise(0L)).as("viewed"),
            max(when(col("event_type") === "purchase" && col("seen_view") === 1L, 1L)
              .otherwise(0L)).as("purchased_after_view"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_ms(ts) AS tms, event_id,
             |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER (
             |      PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen_view
             |  FROM events)
             |SELECT user_id,
             |  CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
             |  CAST(max(CASE WHEN event_type = 'purchase' AND seen_view = 1 THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_view
             |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // NTILE quartiles per group: orders bucketed into price quartiles
    // within each priority. Ties broken by the unique key so the bucket
    // assignment is total across engines.
    EngineQuery(
      "ntile_price_quartiles",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .withColumn("quartile",
            ntile(4).over(
              Window.partitionBy("o_orderpriority")
                .orderBy(col("o_totalprice"), col("o_orderkey"))).cast("long"))
          .groupBy("o_orderpriority", "quartile")
          .agg(
            count(lit(1)).as("cnt"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))
          .orderBy("o_orderpriority", "quartile"),
      Some("""SELECT o_orderpriority, quartile, count(*) AS cnt,
             |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |FROM (
             |  SELECT o_orderpriority, o_totalprice,
             |    CAST(ntile(4) OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
             |  FROM orders)
             |GROUP BY o_orderpriority, quartile
             |ORDER BY o_orderpriority, quartile""".stripMargin),
    ),
    // Scale-safe quantile-bucket twin (see quartilesByThreshold doc):
    // self-verifying like percentile_prices_approx — the relation emits
    // the deterministic per-priority totals plus share-bracket booleans,
    // so the oracle is exact (count + literal true).
    EngineQuery(
      "price_quartiles_scalable",
      (s, dir) =>
        quartilesByThreshold(Tables.orders(s, dir)).orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS cnt_total,
             |  true AS q1_share_ok, true AS q2_share_ok,
             |  true AS q3_share_ok, true AS q4_share_ok
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),
    // Forward fill (gap filling): carry the last non-null observation
    // per user through time — one window pass, the time-series
    // enrichment twin of the as-of join. Gaps synthesized
    // deterministically (every 5th event's value nulled) so the fill
    // provably fires; applied identically in the oracle.
    EngineQuery(
      "gap_fill_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id"),
          when(col("event_id") % 5 =!= 0, col("value")).as("v"))
        val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        ev.withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms,
             |  CASE WHEN event_id % 5 <> 0 THEN value END AS v FROM events)
             |SELECT user_id, tms, event_id, v,
             |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
             |FROM e ORDER BY user_id, event_id""".stripMargin),
    ),
    // Rolling distinct users over a 7-day window WITHOUT re-touching
    // rows: one HLL sketch per day (the stored partial), then a windowed
    // hll_union_agg merges 7 sketches per output row — the mergeable-
    // sketch answer to "rolling cardinality", which exact
    // count(distinct) can only do by rescanning each window. The
    // windows run over per-DAY rows (bounded cardinality at any corpus
    // scale, like moving_avg_daily_revenue) on a value-based day-number
    // RANGE frame so calendar gaps shrink the window. Self-verifying:
    // the exact rolling distinct is computed alongside (7-way fan-out
    // of distinct (day, user) pairs — also fully distributed) and the
    // gate asserts the ±5% bracket.
    EngineQuery(
      "rolling_distinct_users",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val daily = ev
          .groupBy(to_date(col("ts")).as("d"))
          .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
          .withColumn("day_no", datediff(col("d"), lit("2020-01-01")))
        val w = Window.orderBy("day_no").rangeBetween(-6, 0)
        val est = daily
          .withColumn("usk", expr("hll_union_agg(sk, false)").over(w))
          .select(col("d"), expr("hll_sketch_estimate(usk)").as("est"))
        val pairs = ev.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val days = pairs.select("d").distinct()
        val exact = pairs
          .select(explode(sequence(lit(0), lit(6))).as("off"), col("d"), col("user_id"))
          .select(date_add(col("d"), col("off")).as("d"), col("user_id"))
          .join(days, Seq("d"), "left_semi")
          .distinct()
          .groupBy("d").agg(count(lit(1)).as("exact_users"))
        est.join(exact, Seq("d"))
          .select(
            col("d"), col("exact_users"),
            (abs(col("est") - col("exact_users"))
              <= col("exact_users").cast("double") * 0.05 + 1.0).as("est_ok"))
          .orderBy("d")
      },
      Some("""WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
             |days AS (SELECT DISTINCT d FROM pairs),
             |ex AS (SELECT DISTINCT d + CAST(off AS INT) AS td, user_id
             |       FROM pairs, (SELECT unnest(generate_series(0, 6)) AS off) o),
             |roll AS (SELECT td, count(*) AS exact_users FROM ex
             |         WHERE td IN (SELECT d FROM days) GROUP BY td)
             |SELECT td AS d, exact_users, true AS est_ok FROM roll ORDER BY d""".stripMargin),
    ),
    // Fixed-width histogram: one partial+final aggregation over the
    // binned value — the profiling op behind every data-quality
    // dashboard. Bin edges by integer floor division (exact).
    EngineQuery(
      "histogram_prices",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy((floor(col("o_totalprice") / 25000) * 25000).cast("long").as("bin_lo"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("bin_lo"),
      Some("""SELECT CAST(floor(o_totalprice / 25000) * 25000 AS BIGINT) AS bin_lo, count(*) AS cnt
             |FROM orders GROUP BY bin_lo ORDER BY bin_lo""".stripMargin),
    ),
    // Ranking window: top-2 orders per customer.
    EngineQuery(
      "window_rank_top_orders",
      (s, dir) =>
        topNPerGroup(
          Tables.orders(s, dir), "o_custkey",
          Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin),
    ),
    // Running (cumulative) aggregate window — exact decimal accumulation.
    // The window ORDER BY includes l_quantity: lineitem carries genuine
    // duplicate (l_orderkey, l_linenumber) rows with different
    // quantities (seen at sf0.1), and without it the running sum
    // depends on nondeterministic tie order.
    EngineQuery(
      "window_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, dir)
          .withColumn("running_qty", sum(dec("l_quantity")).over(w).cast("double"))
          .select(
            col("l_suppkey"), col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            col("running_qty"))
          // running_qty in the sort: (suppkey, orderkey, linenumber) is
          // NOT unique in the harness data (165 duplicate triples at
          // sf0.01), so without it the tie order is engine-dependent
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      },
      Some("""SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (
             |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
             |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin),
    ),
    // lag/lead: inter-event gap per user in milliseconds.
    EngineQuery(
      "window_lag_event_gap",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tms"))
          .withColumn("gap_ms", col("tms") - lag(col("tms"), 1).over(w))
          .where(col("gap_ms").isNotNull)
          .select("user_id", "event_id", "gap_ms")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, gap_ms FROM (
             |  SELECT user_id, event_id,
             |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap_ms
             |  FROM events) WHERE gap_ms IS NOT NULL ORDER BY user_id, event_id""".stripMargin),
    ),
    // Event-time tumbling-window rollup (batch twin of the streaming job).
    EngineQuery(
      "events_hourly_rollup",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(
            unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
            col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(dec("value")).cast("double").as("sum_value"))
          .orderBy("hour_ms", "event_type"),
      Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY hour_ms, event_type ORDER BY hour_ms, event_type""".stripMargin),
      headline = true,
    ),
    // Native session_window operator — the engine's third sessionization
    // formulation (window-function based, stateful fold based, and this
    // built-in merging session window). NOTE the boundary semantics:
    // session_window is half-open — an event at exactly last+gap starts
    // a NEW session — so the oracle splits on `diff >= gap` (the other
    // two formulations use the inclusive `diff > gap` convention).
    // end = last event + gap, so last_ms = end - gap.
    EngineQuery(
      "session_window_native",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(
            col("user_id"),
            unix_millis(col("session_window.start")).as("start_ms"),
            (unix_millis(col("session_window.end")) - lit(30 * 60 * 1000L)).as("end_ms"),
            col("n_events"))
          .orderBy("user_id", "start_ms"),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
             |g AS (SELECT user_id, event_id, tms,
             |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w >= 1800000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
             |s AS (SELECT user_id, tms,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, min(tms) AS start_ms, max(tms) AS end_ms, count(*) AS n_events
             |FROM s GROUP BY user_id, session_id ORDER BY user_id, start_ms""".stripMargin),
    ),
    // Gap-based sessionization (30-minute inactivity gap).
    EngineQuery(
      "events_sessionize",
      (s, dir) =>
        sessionize(Tables.events(s, dir), gapMs = 30 * 60 * 1000L)
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
