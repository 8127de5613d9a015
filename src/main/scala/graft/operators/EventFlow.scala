package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Event-sequence analytics: Markov transition matrices, session path
  * mining, and interval sweep-lines — the clickstream-flow category
  * (product analytics "user flows" / "path analysis"). Nothing in the
  * reference's k-mer surface touches sequences-within-a-key; this
  * family extends the engine's windowed story from per-row frames to
  * whole-trajectory operators.
  *
  * Scale notes (100 TB): every operator here shuffles the event stream
  * exactly once, keyed on `user_id` (the trajectory key); everything
  * after that first window pass runs at collapsed cardinality —
  * transition matrices are |types|², path tables are capped-length
  * string groups, and the sweep-line runs at HOUR cardinality with
  * carry-ins computed by aggregation, not by widening any window.
  * No self-joins anywhere: the naive "pair every event with its
  * successor by timestamp join" formulation is quadratic under
  * timestamp ties and shuffles twice.
  */
object EventFlow {

  private def ev(events: DataFrame): DataFrame =
    events.select(
      col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("tms"), col("event_id"))

  /** First-order Markov transition matrix over per-user event
    * trajectories: (prev_type, event_type, n, p_permille), where the
    * synthetic 'start' state precedes each user's first event and
    * p_permille is the exact integer-permille row-conditional
    * probability. One user-keyed window pass; the permille division
    * happens on the |types|²-row matrix, never on the stream.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    matrixFromPairs(ev(events)
      .withColumn("prev_type", coalesce(lag(col("event_type"), 1).over(w), lit("start")))
      .select("prev_type", "event_type"))
  }

  /** (prev_type, event_type) pairs → the counted matrix with exact
    * integer-permille row-conditional probabilities. Shared by the
    * window formulation above and the stateful-fold streaming twin
    * ([[graft.streaming.StatefulSessions.runStreamingTransitionMatrix]]).
    */
  def matrixFromPairs(pairs: DataFrame): DataFrame =
    pairs
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p_permille", expr("(1000 * n) div sum(n) over (partition by prev_type)"))
      .select("prev_type", "event_type", "n", "p_permille")

  /** Top-k session paths: the most frequent ordered event-type
    * sequences, truncated to the first `maxLen` events of each
    * 30-minute-gap session. The stream pays ONE user-keyed window pass
    * (sessionize + rank share the same partitioning, so Catalyst runs
    * them in a single Window node chain without a second exchange);
    * the truncation rank cut drops everything past `maxLen` BEFORE the
    * per-session aggregation, and the path table the top-k runs on is
    * ≤|types|^maxLen rows.
    */
  def sessionPaths(events: DataFrame, gapMs: Long, maxLen: Int, k: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val bySess = Window.partitionBy("user_id", "session_id").orderBy("tms", "event_id")
    ev(events)
      .withColumn("prev", lag(col("tms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("tms") - col("prev") > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(cum).cast("long"))
      .withColumn("rn", row_number().over(bySess))
      .where(col("rn") <= maxLen)
      .groupBy("user_id", "session_id")
      .agg(expr(
        "concat_ws('>', transform(array_sort(collect_list(struct(rn, event_type))), s -> s.event_type))")
        .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Peak concurrent sessions per hour — the interval max-overlap
    * sweep-line, decomposed so no window ever spans the corpus: each
    * session explodes into the hours it covers (capped at 48 — a
    * session longer than two days is truncated, the degenerate-interval
    * guard), the hour's carry-in (sessions alive at the hour boundary)
    * is a pure aggregation over that bounded span relation, and the
    * ±1 boundary sweep runs inside hour-keyed window partitions over
    * boundary events only. The naive global sweep is ONE ordering over
    * every boundary in the corpus — a single reducer at 100 TB; this
    * shape's widest window partition is one hour of boundaries.
    *
    * Tie discipline: ends (emitted at end_ms+1) sort before starts at
    * the same millisecond via the `delta` ascending sort key, so the
    * reported peak is the conservative (post-decrement) reading;
    * concurrency is inclusive of both endpoints.
    */
  def concurrentSessionsPeak(events: DataFrame, gapMs: Long): DataFrame =
    concurrentSessionsPeakFrom(Analytic.sessionize(events, gapMs), gapMs)

  /** The sweep half over an ALREADY-sessionized relation — split out
    * (r19 optimization round) so [[eventsKpiSnapshot]] shares one
    * sessionize pass across its KPIs. */
  def concurrentSessionsPeakFrom(sessionized: DataFrame, gapMs: Long): DataFrame = {
    val sess = sessionized
      .select(col("start_ms"), col("end_ms"))
      .withColumn("h0", expr("start_ms div 3600000"))
      .withColumn("end_c", least(col("end_ms"), expr("(h0 + 49) * 3600000 - 1")))
      .withColumn("h1", expr("end_c div 3600000"))
    val spans = sess.select(col("h0"), explode(expr("sequence(h0, h1)")).as("hour_no"))
    val carry = spans.where(col("h0") < col("hour_no"))
      .groupBy("hour_no").agg(count(lit(1)).as("carry_in"))
    val starts = sess.select(col("h0").as("hour_no"), col("start_ms").as("t"), lit(1L).as("delta"))
    val ends = sess.where(expr("(end_c + 1) div 3600000") === col("h1"))
      .select(col("h1").as("hour_no"), (col("end_c") + 1).as("t"), lit(-1L).as("delta"))
    val w = Window.partitionBy("hour_no").orderBy("t", "delta")
      .rowsBetween(Window.unboundedPreceding, 0)
    val inHour = starts.union(ends)
      .withColumn("s", sum("delta").over(w))
      .groupBy("hour_no").agg(greatest(max("s"), lit(0L)).as("peak_delta"))
    carry.join(inHour, Seq("hour_no"), "full")
      .select(col("hour_no"),
        (coalesce(col("carry_in"), lit(0L)) + coalesce(col("peak_delta"), lit(0L)))
          .as("peak_sessions"))
  }

  /** A/B experiment readout with an exact chi-square decision — the
    * experimentation-platform primitive (two-proportion test on
    * conversion). Variant = user_id parity (the deterministic hash
    * assignment every A/B system uses); converted = the user has ≥1
    * purchase. The stream collapses to one (user, variant, converted)
    * row FIRST (partial/final distinct-style aggregate — the only wide
    * exchange keys on user_id), the 2×2 contingency table is a 1-row
    * aggregate, and the χ² ≥ 3.841 (df=1, p<0.05) decision is computed
    * by exact cross-multiplication in DECIMAL(38,0) — the float
    * formula n·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) never divides:
    * 1000·n·(ad−bc)² ≥ 3841·∏margins, overflow-safe in 38 digits
    * through ~10⁹ users. No float, no division, bit-identical verdict.
    */
  def abTestChi2(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val t = perUser.agg(
      sum(when(col("variant") === 0 && col("converted") === 1, 1L).otherwise(0L)).as("a"),
      sum(when(col("variant") === 0 && col("converted") === 0, 1L).otherwise(0L)).as("b"),
      sum(when(col("variant") === 1 && col("converted") === 1, 1L).otherwise(0L)).as("c"),
      sum(when(col("variant") === 1 && col("converted") === 0, 1L).otherwise(0L)).as("d"))
    val dec38 = "decimal(38,0)"
    t.select(
      col("a").as("conv_a"), col("b").as("nonconv_a"),
      col("c").as("conv_b"), col("d").as("nonconv_b"),
      expr(s"""cast(1000 as $dec38) * cast(a + b + c + d as $dec38)
              |  * cast(cast(a as $dec38) * cast(d as $dec38)
              |       - cast(b as $dec38) * cast(c as $dec38) as $dec38)
              |  * cast(cast(a as $dec38) * cast(d as $dec38)
              |       - cast(b as $dec38) * cast(c as $dec38) as $dec38)
              | >= cast(3841 as $dec38) * cast(a + b as $dec38) * cast(c + d as $dec38)
              |  * cast(a + c as $dec38) * cast(b + d as $dec38)""".stripMargin)
        .cast("long").as("significant"))
  }

  /** Bot/automation detection by inter-event timing regularity: a
    * human's gaps between events are high-variance; a scripted
    * client's are near-constant. Per user: one lag window pass over
    * the trajectory (the family's single user-keyed exchange), exact
    * integer gap moments (n, Σg, Σg²), and the low-variance flag by
    * cross-multiplication — n·Σg² − (Σg)² < τ²·n·(n−1) means the
    * sample variance is under τ² without ever dividing. Users with
    * < `minEvents` gaps are unflagged (insufficient evidence).
    * Gap magnitudes: ms gaps ≤ ~2.6e9 over a month, squared ≤ 7e18 —
    * one gap² fits BIGINT but a SUM of them may not at depth, so the
    * moments accumulate in DECIMAL(38,0) (exact, engine-portable).
    */
  def botRegularityFlags(events: DataFrame, tauMs: Long, minEvents: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val gaps = ev(events)
      .withColumn("gap", col("tms") - lag(col("tms"), 1).over(w))
      .where(col("gap").isNotNull)
    gaps.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap").cast("decimal(38,0)")).as("sg"),
        sum((col("gap") * col("gap")).cast("decimal(38,0)")).as("sg2"))
      .select(
        col("user_id"), col("n_gaps"),
        ((col("n_gaps") >= minEvents) &&
          (col("n_gaps").cast("decimal(38,0)") * col("sg2") - col("sg") * col("sg")
            < lit(tauMs * tauMs).cast("decimal(38,0)")
              * col("n_gaps").cast("decimal(38,0)")
              * (col("n_gaps") - 1).cast("decimal(38,0)")))
          .cast("long").as("bot_flag"))
  }

  /** Per-user engagement diversity by Simpson's index (1 − Σp²) — the
    * log-free diversity measure (entropy needs floats; Simpson is an
    * exact rational): simpson_permille = 1000·(n² − Σc²) div n² over
    * the user's event-type counts. Output is the corpus histogram of
    * diversity buckets — the stream pays one (user, type) count and
    * one per-user rollup, both user-keyed.
    */
  def diversitySimpson(events: DataFrame): DataFrame = {
    val perType = events.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val perUser = perType.groupBy("user_id")
      .agg(sum("c").as("n"), sum(col("c") * col("c")).as("sc2"))
      .withColumn("simpson_permille",
        expr("(1000 * (n * n - sc2)) div (n * n)"))
    perUser.groupBy(expr("simpson_permille div 10").as("bucket"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Composed events KPI snapshot — the dashboard query: FIVE audited
    * subsystems (sessionize/bounce, interval sweep-line, strict
    * funnel, trailing-sigma anomaly) reduced to one metrics row by
    * 1-row broadcast carriers. The point of the composition (the
    * `curated_corpus` precedent on the events side): each component
    * keeps its own pinned plan shape, the stream pays each family's
    * single wide exchange, and the final row is pure carrier joins —
    * the cost is the sum of the audited parts, nothing multiplicative.
    */
  def eventsKpiSnapshot(events: DataFrame): DataFrame = {
    val gapMs = 30 * 60 * 1000L
    // By-convention pin (harness frees): the session relation feeds two
    // KPIs (bounce rollup + concurrency sweep), and unpinned each
    // consumer re-ran the user-keyed sessionize window — AQE exchange
    // reuse dedups only the user_id exchange BELOW the window, never
    // the window + session aggregate above it (r19 optimization round).
    val sessions = Analytic.sessionize(events, gapMs).localCheckpoint(true)
    val sess = Analytic.bounceRateFrom(sessions)
      .select(col("n_sessions"), col("bounce_permille"))
    val peak = concurrentSessionsPeakFrom(sessions, gapMs)
      .agg(max("peak_sessions").as("max_concurrent"))
    val funnel = Analytic.funnelThreeStep(events)
      .select(col("n_step3").as("n_full_funnel"), col("s3_permille"))
    val anom = Analytic.hourlyAnomaly(events)
      .agg(sum("anomaly").as("n_anomalous_hours"))
    sess.crossJoin(broadcast(peak))
      .crossJoin(broadcast(funnel))
      .crossJoin(broadcast(anom))
  }

  /** Shared oracle CTE: 30-minute-gap sessions with per-event rank —
    * mirrors the `events_sessionize` oracle exactly, plus `rn`.
    */
  private val duckSessionCtes =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms FROM events),
      |g AS (SELECT user_id, event_id, event_type, tms,
      |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
      |s AS (SELECT user_id, event_type, tms, event_id,
      |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g),
      |r AS (SELECT user_id, session_id, event_type,
      |  row_number() OVER (PARTITION BY user_id, session_id ORDER BY tms, event_id) AS rn
      |  FROM s)""".stripMargin

  /** Markov removal-effect attribution (the data-driven alternative to
    * first/last-touch, `attribution_touch_revenue`): build the
    * first-order journey chain START → channels… → CONV/NULL per user
    * (truncated at the first purchase — the purchase event itself IS
    * the CONV transition), then each channel's credit is how much the
    * fixed-horizon conversion probability DROPS when every transition
    * into that channel is redirected to NULL. Absorption is evaluated
    * at a fixed `steps` horizon (exact integer power iteration) rather
    * than by matrix inversion — rationals under inversion blow up
    * unboundedly, while the T-step ppm iteration is bit-portable.
    *
    * INTEGER-EXACT: transition probabilities are ppm
    * ((10⁶·n) div out_src, computed on the UNFILTERED matrix so removal
    * mass flows to NULL), each iteration is v(s) = (Σ p·v(dst)) div 10⁶
    * — nonnegative throughout, so Spark/Scala truncation ≡ DuckDB
    * floor — and the removal drop is a plain subtraction (no signed
    * division anywhere).
    *
    * Scale: ONE user-keyed window pass collapses the stream to the
    * ≤(|types|+1)² transition matrix; the driver collects that matrix
    * (bounded by the event-type vocabulary — the audited
    * bounded-collect loop discipline) and replays 8 ppm iterations per
    * variant in exact Long arithmetic. The unrolled DuckDB oracle
    * replays the identical chains.
    */
  def markovRemovalAttribution(events: DataFrame, steps: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val cumB = w.rowsBetween(Window.unboundedPreceding, -1)
    val e = ev(events)
    val kept = e
      .withColumn("pp", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(cumB), lit(0L)))
      .where(col("pp") === 0 && col("event_type") =!= "purchase")
    val chains = kept
      .withColumn("src", coalesce(lag(col("event_type"), 1).over(w), lit("START")))
      .select(col("src"), col("event_type").as("dst"))
    val pu = e.groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    val lk = kept.groupBy("user_id")
      .agg(max(struct(col("tms"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("last_type"))
    val term = pu.join(lk, Seq("user_id"), "left_outer")
      .select(coalesce(col("last_type"), lit("START")).as("src"),
        when(col("conv") === 1L, lit("CONV")).otherwise(lit("NULL")).as("dst"))
    val matrix = chains.union(term).groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .withColumn("p", expr("(1000000 * n) div (sum(n) over (partition by src))"))
      .select("src", "dst", "p")
      .collect() // bounded: ≤ (|types|+1)·(|types|+2) rows
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val transientStates = matrix.map(_._1).distinct.sorted.toSeq
    def horizonConv(drop: Option[String]): Long = {
      val p = matrix.filter(r => drop.forall(c => r._1 != c && r._2 != c))
      var v = transientStates.map(_ -> 0L).toMap
      for (_ <- 1 to steps) {
        v = transientStates.map { s =>
          val tot = p.iterator.filter(_._1 == s).map { case (_, d, pp) =>
            pp * (if (d == "CONV") 1000000L else if (d == "NULL") 0L else v.getOrElse(d, 0L))
          }.sum
          s -> tot / 1000000L
        }.toMap
      }
      v.getOrElse("START", 0L)
    }
    val base = horizonConv(None)
    val channels = matrix.map(_._2).filter(d => d != "CONV" && d != "NULL").distinct.sorted.toSeq
    channels.map { c =>
      val removed = horizonConv(Some(c))
      (c, base, removed, base - removed)
    }.toDF("channel", "conv_base_ppm", "conv_removed_ppm", "removal_drop_ppm")
  }

  /** CUPED variance-reduced experiment readout (Deng et al. 2013,
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data"): the per-arm post-period metric is
    * adjusted by θ·(x̄_arm − x̄) where x is the PRE-period covariate and
    * θ = cov(x,y)/var(x) is fit pooled — same expected means, strictly
    * smaller variance, the standard lever for detecting small effects
    * without more traffic. Pre/post split at the data-derived midpoint
    * timestamp; x = pre-period event count, y = post-period purchase
    * count, arm = user_id % 2 (the `ab_test_chi2` convention).
    *
    * INTEGER-EXACT: θ quantizes ONCE to sign-ruled ppm
    * (θ_ppm = sign·(10⁶·|n·Σxy − Σx·Σy|) div (n·Σx² − (Σx)²) — the
    * moment lanes run in DECIMAL(38,0)), then every adjustment is a
    * single sign-ruled division of ppm quantities — no compounding
    * rational denominators, which is what would overflow any fixed
    * lane at corpus scale. θ at ppm resolution is the documented
    * quantization (one part in 10⁶ of the covariate scale).
    *
    * Scale: one user-keyed aggregation collapses the stream; the
    * pooled moments and per-arm sums are two single-row/two-row
    * aggregates over the user relation joined by broadcast carriers.
    */
  def cupedReadout(events: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val e = ev(events)
    val cut = e.agg(expr("(min(tms) + max(tms)) div 2").as("cut"))
    val perUser = e.crossJoin(broadcast(cut))
      .groupBy("user_id")
      .agg(
        sum(when(col("tms") < col("cut"), 1L).otherwise(0L)).as("x"),
        sum(when(col("tms") >= col("cut") && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val pooled = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"))
    val arms = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n_a"),
        sum(col("x").cast(d38)).as("sx_a"),
        sum(col("y").cast(d38)).as("sy_a"))
    arms.crossJoin(broadcast(pooled))
      .withColumn("tnum", expr("n * sxy - sx * sy"))
      .withColumn("tden", expr("greatest(n * sxx - sx * sx, 1)"))
      .withColumn("theta_ppm", expr(
        "CASE WHEN tnum >= 0 THEN (1000000 * tnum) div tden ELSE -((1000000 * -tnum) div tden) END")
        .cast("long"))
      .withColumn("mean_y_ppm", expr("(1000000 * sy_a) div greatest(n_a, 1)").cast("long"))
      .withColumn("dx_ppm", expr(
        "(1000000 * sx_a) div greatest(n_a, 1) - (1000000 * sx) div greatest(n, 1)").cast("long"))
      // theta_ppm is unbounded when the covariate variance degenerates,
      // so the ppm x ppm product runs in DECIMAL(38,0) — the oracle's
      // HUGEINT lane — never in a wrappable BIGINT.
      .withColumn("adj_ppm", expr(
        s"""CASE WHEN CAST(theta_ppm AS $d38) * CAST(dx_ppm AS $d38) >= 0
           |  THEN (CAST(theta_ppm AS $d38) * CAST(dx_ppm AS $d38)) div 1000000
           |  ELSE -((-(CAST(theta_ppm AS $d38) * CAST(dx_ppm AS $d38))) div 1000000) END""".stripMargin)
        .cast("long"))
      .select(
        col("variant"), col("n_a").as("n_users"), col("mean_y_ppm"),
        col("theta_ppm"),
        (col("mean_y_ppm") - col("adj_ppm")).as("cuped_mean_ppm"))
  }

  private val DuckCuped =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
      |cut AS (SELECT (min(tms) + max(tms)) // 2 AS cut FROM e),
      |pu AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN tms < cut THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN tms >= cut AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    CAST(user_id % 2 AS BIGINT) AS variant
      |  FROM e CROSS JOIN cut GROUP BY user_id),
      |pool AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x * y) AS HUGEINT) AS sxy, CAST(sum(x * x) AS HUGEINT) AS sxx
      |  FROM pu),
      |arms AS (
      |  SELECT variant, CAST(count(*) AS HUGEINT) AS n_a,
      |    CAST(sum(x) AS HUGEINT) AS sx_a, CAST(sum(y) AS HUGEINT) AS sy_a
      |  FROM pu GROUP BY variant),
      |j AS (
      |  SELECT variant, n_a, sx_a, sy_a, n, sx, sy, sxy, sxx,
      |    n * sxy - sx * sy AS tnum, greatest(n * sxx - sx * sx, 1) AS tden
      |  FROM arms CROSS JOIN pool),
      |q AS (
      |  SELECT variant, n_a,
      |    CAST(CASE WHEN tnum >= 0 THEN (1000000 * tnum) // tden
      |         ELSE -((1000000 * -tnum) // tden) END AS BIGINT) AS theta_ppm,
      |    CAST((1000000 * sy_a) // greatest(n_a, 1) AS BIGINT) AS mean_y_ppm,
      |    CAST((1000000 * sx_a) // greatest(n_a, 1)
      |       - (1000000 * sx) // greatest(n, 1) AS BIGINT) AS dx_ppm
      |  FROM j)
      |SELECT variant, CAST(n_a AS BIGINT) AS n_users, mean_y_ppm, theta_ppm,
      |  mean_y_ppm - (CASE WHEN CAST(theta_ppm AS HUGEINT) * dx_ppm >= 0
      |    THEN CAST((CAST(theta_ppm AS HUGEINT) * dx_ppm) // 1000000 AS BIGINT)
      |    ELSE -CAST(((-(CAST(theta_ppm AS HUGEINT) * dx_ppm)) // 1000000) AS BIGINT) END)
      |  AS cuped_mean_ppm
      |FROM q ORDER BY variant""".stripMargin

  /** Unrolled DuckDB mirror of [[markovRemovalAttribution]]: the
    * harness event-type vocabulary is static, so the four channel
    * variants unroll statically like the perceptron's rounds.
    */
  private def duckMarkov(steps: Int, channels: Seq[String]): String = {
    def variant(tag: String, filter: String): String = {
      val v0 = s"v${tag}0 AS (SELECT s, CAST(0 AS BIGINT) AS v FROM st)"
      val its = (1 to steps).map { t =>
        s"""v$tag$t AS (
           |  SELECT st.s, coalesce(CAST(sum(p.p * CASE WHEN p.dst = 'CONV' THEN 1000000
           |      WHEN p.dst = 'NULL' THEN 0 ELSE coalesce(pv.v, 0) END) // 1000000 AS BIGINT), 0) AS v
           |  FROM st LEFT JOIN p ON p.src = st.s $filter
           |  LEFT JOIN v$tag${t - 1} pv ON pv.s = p.dst
           |  GROUP BY st.s)""".stripMargin
      }
      (v0 +: its).mkString(",\n")
    }
    val variants = variant("B", "") +: channels.map(c =>
      variant(c.toUpperCase, s"AND p.src <> '$c' AND p.dst <> '$c'"))
    val res = channels.map(c =>
      s"""SELECT '$c' AS channel,
         |  (SELECT v FROM vB$steps WHERE s = 'START') AS conv_base_ppm,
         |  (SELECT v FROM v${c.toUpperCase}$steps WHERE s = 'START') AS conv_removed_ppm""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms, event_id FROM events),
       |k AS (SELECT user_id, event_type, tms, event_id,
       |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY tms, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pp
       |  FROM e),
       |kept AS (SELECT user_id, event_type, tms, event_id
       |  FROM k WHERE pp = 0 AND event_type <> 'purchase'),
       |chains AS (SELECT
       |    coalesce(lag(event_type) OVER (PARTITION BY user_id ORDER BY tms, event_id),
       |      'START') AS src,
       |    event_type AS dst FROM kept),
       |pu AS (SELECT user_id,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |  FROM e GROUP BY 1),
       |lk AS (SELECT user_id, event_type AS last_type FROM (
       |    SELECT user_id, event_type,
       |      row_number() OVER (PARTITION BY user_id ORDER BY tms DESC, event_id DESC) AS rn
       |    FROM kept) WHERE rn = 1),
       |term AS (SELECT coalesce(lk.last_type, 'START') AS src,
       |    CASE WHEN pu.conv = 1 THEN 'CONV' ELSE 'NULL' END AS dst
       |  FROM pu LEFT JOIN lk USING (user_id)),
       |m AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT * FROM chains UNION ALL SELECT * FROM term) GROUP BY 1, 2),
       |p AS (SELECT src, dst,
       |    CAST((1000000 * n) // (sum(n) OVER (PARTITION BY src)) AS BIGINT) AS p FROM m),
       |st AS (SELECT DISTINCT src AS s FROM p),
       |${variants.mkString(",\n")}
       |SELECT channel, conv_base_ppm, conv_removed_ppm,
       |  conv_base_ppm - conv_removed_ppm AS removal_drop_ppm
       |FROM ($res) ORDER BY channel""".stripMargin
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "markov_attribution",
      (s, dir) => markovRemovalAttribution(Tables.events(s, dir)),
      Some(duckMarkov(8, Seq("click", "error", "signup", "view"))),
    ),
    EngineQuery(
      "ab_cuped_readout",
      (s, dir) => cupedReadout(Tables.events(s, dir)).orderBy("variant"),
      Some(DuckCuped),
    ),
    EngineQuery(
      "event_transition_matrix",
      (s, dir) => transitionMatrix(Tables.events(s, dir))
        .orderBy("prev_type", "event_type"),
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
    EngineQuery(
      "session_path_topk",
      (s, dir) => sessionPaths(Tables.events(s, dir), gapMs = 30 * 60 * 1000L, maxLen = 5, k = 20),
      Some(s"""$duckSessionCtes,
             |p AS (SELECT user_id, session_id,
             |  string_agg(event_type, '>' ORDER BY rn) AS path
             |  FROM r WHERE rn <= 5 GROUP BY user_id, session_id)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
             |FROM p GROUP BY path
             |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin),
    ),
    EngineQuery(
      "ab_test_chi2",
      (s, dir) => abTestChi2(Tables.events(s, dir)),
      Some("""WITH pu AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY 1),
             |t AS (SELECT
             |  sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0 END) AS a,
             |  sum(CASE WHEN user_id % 2 = 0 AND conv = 0 THEN 1 ELSE 0 END) AS b,
             |  sum(CASE WHEN user_id % 2 = 1 AND conv = 1 THEN 1 ELSE 0 END) AS c,
             |  sum(CASE WHEN user_id % 2 = 1 AND conv = 0 THEN 1 ELSE 0 END) AS d
             |  FROM pu)
             |SELECT CAST(a AS BIGINT) AS conv_a, CAST(b AS BIGINT) AS nonconv_a,
             |  CAST(c AS BIGINT) AS conv_b, CAST(d AS BIGINT) AS nonconv_b,
             |  CAST(CASE WHEN CAST(1000 AS HUGEINT) * (a + b + c + d)
             |      * (a * d - b * c) * (a * d - b * c)
             |    >= CAST(3841 AS HUGEINT) * (a + b) * (c + d) * (a + c) * (b + d)
             |    THEN 1 ELSE 0 END AS BIGINT) AS significant
             |FROM t""".stripMargin),
    ),
    EngineQuery(
      "events_kpi_snapshot",
      (s, dir) => eventsKpiSnapshot(Tables.events(s, dir)),
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms FROM events),
             |g AS (SELECT user_id, event_id, tms,
             |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
             |s AS (SELECT user_id, tms,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g),
             |sess AS (SELECT user_id, session_id, count(*) AS n_events,
             |  min(tms) AS start_ms, max(tms) AS end_ms FROM s GROUP BY 1, 2),
             |bounce AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             |  (1000 * CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT))
             |    // count(*) AS bounce_permille FROM sess),
             |sx AS (SELECT start_ms, end_ms, start_ms // 3600000 AS h0,
             |    least(end_ms, (start_ms // 3600000 + 49) * 3600000 - 1) AS end_c,
             |    least(end_ms, (start_ms // 3600000 + 49) * 3600000 - 1) // 3600000 AS h1
             |  FROM sess),
             |spans AS (SELECT h0, unnest(generate_series(h0, h1)) AS hour_no FROM sx),
             |carry AS (SELECT hour_no, CAST(count(*) AS BIGINT) AS carry_in
             |  FROM spans WHERE h0 < hour_no GROUP BY hour_no),
             |evb AS (
             |  SELECT h0 AS hour_no, start_ms AS t, CAST(1 AS BIGINT) AS delta FROM sx
             |  UNION ALL
             |  SELECT h1, end_c + 1, CAST(-1 AS BIGINT) FROM sx
             |  WHERE (end_c + 1) // 3600000 = h1),
             |ih AS (SELECT hour_no, greatest(max(ps), 0) AS peak_delta FROM (
             |    SELECT hour_no, sum(delta) OVER (PARTITION BY hour_no ORDER BY t, delta
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps
             |    FROM evb) GROUP BY hour_no),
             |pk AS (SELECT CAST(max(coalesce(carry_in, 0) + coalesce(peak_delta, 0)) AS BIGINT)
             |    AS max_concurrent
             |  FROM carry FULL JOIN ih USING (hour_no)),
             |f1 AS (SELECT user_id, min(tms) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
             |f2 AS (SELECT e2.user_id, min(tms) AS t2 FROM e e2 JOIN f1 USING (user_id)
             |  WHERE event_type = 'click' AND tms > t1 GROUP BY 1),
             |f3 AS (SELECT e3.user_id, min(tms) AS t3 FROM e e3 JOIN f2 USING (user_id)
             |  WHERE event_type = 'purchase' AND tms > t2 GROUP BY 1),
             |fu AS (SELECT CAST(count(*) AS BIGINT) AS n1,
             |  CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_full
             |  FROM f1 LEFT JOIN f2 USING (user_id) LEFT JOIN f3 USING (user_id)),
             |hourly AS (SELECT epoch_ms(ts) // 3600000 AS hour_no, event_type,
             |  CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
             |win AS (SELECT hour_no, event_type, cnt, count(*) OVER w AS n_prev,
             |  CAST(sum(cnt) OVER w AS BIGINT) AS sum_prev,
             |  CAST(sum(cnt * cnt) OVER w AS BIGINT) AS sumsq_prev
             |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour_no
             |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
             |an AS (SELECT CAST(sum(CASE
             |    WHEN (n_prev * cnt - sum_prev) * (n_prev * cnt - sum_prev)
             |      > 9 * (n_prev * sumsq_prev - sum_prev * sum_prev)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_hours
             |  FROM win WHERE n_prev >= 12)
             |SELECT bounce.n_sessions, bounce.bounce_permille, pk.max_concurrent,
             |  fu.n_full AS n_full_funnel, (1000 * fu.n_full) // fu.n1 AS s3_permille,
             |  an.n_anomalous_hours
             |FROM bounce, pk, fu, an""".stripMargin),
      headline = true,
    ),
    EngineQuery(
      "bot_regularity_flags",
      (s, dir) => botRegularityFlags(Tables.events(s, dir), tauMs = 3600000L, minEvents = 5)
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, event_id FROM events),
             |g AS (SELECT user_id,
             |  tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) AS gap
             |  FROM e),
             |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             |  sum(CAST(gap AS HUGEINT)) AS sg, sum(CAST(gap AS HUGEINT) * gap) AS sg2
             |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
             |SELECT user_id, n_gaps,
             |  CAST(CASE WHEN n_gaps >= 5
             |    AND CAST(n_gaps AS HUGEINT) * sg2 - sg * sg
             |      < CAST(3600000 AS HUGEINT) * 3600000 * n_gaps * (n_gaps - 1)
             |    THEN 1 ELSE 0 END AS BIGINT) AS bot_flag
             |FROM m ORDER BY user_id""".stripMargin),
    ),
    EngineQuery(
      "user_diversity_simpson",
      (s, dir) => diversitySimpson(Tables.events(s, dir)).orderBy("bucket"),
      Some("""WITH pt AS (
             |  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
             |pu AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
             |  CAST(sum(c * c) AS BIGINT) AS sc2 FROM pt GROUP BY 1),
             |s AS (SELECT (1000 * (n * n - sc2)) // (n * n) AS sp FROM pu)
             |SELECT sp // 10 AS bucket, CAST(count(*) AS BIGINT) AS n_users
             |FROM s GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    EngineQuery(
      "concurrent_sessions_peak",
      (s, dir) => concurrentSessionsPeak(Tables.events(s, dir), gapMs = 30 * 60 * 1000L)
        .orderBy("hour_no"),
      Some(s"""$duckSessionCtes,
             |sess0 AS (SELECT user_id, session_id, min(tms) AS start_ms, max(tms) AS end_ms
             |  FROM s GROUP BY user_id, session_id),
             |sess AS (SELECT start_ms, end_ms, start_ms // 3600000 AS h0,
             |    least(end_ms, (start_ms // 3600000 + 49) * 3600000 - 1) AS end_c,
             |    least(end_ms, (start_ms // 3600000 + 49) * 3600000 - 1) // 3600000 AS h1
             |  FROM sess0),
             |spans AS (SELECT h0, unnest(generate_series(h0, h1)) AS hour_no FROM sess),
             |carry AS (SELECT hour_no, CAST(count(*) AS BIGINT) AS carry_in
             |  FROM spans WHERE h0 < hour_no GROUP BY hour_no),
             |ev AS (
             |  SELECT h0 AS hour_no, start_ms AS t, CAST(1 AS BIGINT) AS delta FROM sess
             |  UNION ALL
             |  SELECT h1, end_c + 1, CAST(-1 AS BIGINT) FROM sess
             |  WHERE (end_c + 1) // 3600000 = h1),
             |ih AS (SELECT hour_no, greatest(max(ps), 0) AS peak_delta FROM (
             |    SELECT hour_no, sum(delta) OVER (PARTITION BY hour_no ORDER BY t, delta
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps
             |    FROM ev) GROUP BY hour_no)
             |SELECT coalesce(carry.hour_no, ih.hour_no) AS hour_no,
             |  CAST(coalesce(carry_in, 0) + coalesce(peak_delta, 0) AS BIGINT) AS peak_sessions
             |FROM carry FULL JOIN ih ON carry.hour_no = ih.hour_no
             |ORDER BY hour_no""".stripMargin),
      headline = true,
    ),
  )
}
