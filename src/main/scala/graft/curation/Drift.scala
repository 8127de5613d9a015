package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Distribution-shift audit between two corpus cohorts — the check a
  * training-data pipeline runs before accepting a new crawl snapshot
  * (did the length/quality profile move?). The cohorts here are the
  * English subcorpus vs the rest (deterministic, non-trivial shift in
  * the harness data); the computation is cohort-agnostic and serves
  * snapshot-t vs snapshot-t+1 identically.
  *
  * Distances are INTEGER-EXACT: per-bin proportion gaps and the total
  * variation distance are computed as exact integer ppm via
  * cross-multiplied counts (|n_a·N_b − n_b·N_a| / (N_a·N_b)) — no
  * float accumulation, so the DuckDB oracle hash-matches bit-for-bit.
  * Chi-square/PSI variants need a transcendental or an order-dependent
  * float sum and are deliberately left out of the oracle-gated surface
  * (`ab_test_chi2` covers the chi-square shape on exact rationals).
  *
  * Scale (100 TB): the corpus collapses to per-BIN counts in one
  * map-side-combined aggregation — bins are floor(log2(n_chars))+1 via
  * `length(bin(x))`, pure integer ops, ≤ 64 of them — and everything
  * after the first shuffle (global-window totals, the ppm division)
  * runs at bin cardinality. The cross-multiplied-and-ppm-scaled
  * numerators (10⁶·|n_a·N_b − n_b·N_a| ≤ 10⁶·N²) would wrap int64 at
  * only ~3·10⁶ docs per cohort, so the whole numerator lane runs in
  * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact integers to 10³⁸,
  * i.e. ~10¹⁵ docs per cohort — and only the final ≤10⁶ ppm value is
  * cast back to BIGINT. All of this happens at bin cardinality (≤64
  * rows), so the wide lane costs nothing measurable.
  */
object Drift {

  /** Corpus → per-length-bin cohort counts (bin cardinality ≤ 64). */
  private def binned(docs: DataFrame): DataFrame =
    docs.select(
        length(bin(col("n_chars"))).cast("long").as("len_bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("in_a"))
      .groupBy("len_bin")
      .agg(sum(col("in_a")).as("n_a"), sum(lit(1L) - col("in_a")).as("n_b"))

  private def withTotals(bins: DataFrame): DataFrame =
    bins
      .withColumn("na_tot", expr("sum(n_a) over ()"))
      .withColumn("nb_tot", expr("sum(n_b) over ()"))

  /** Per-bin signed proportion gap in exact ppm. The sign is applied
    * AFTER the magnitude division: Spark `div` truncates toward zero
    * while DuckDB `//` floors, so a signed numerator would disagree on
    * negative gaps — |gap| div totals is engine-portable, the sign is a
    * separate exact factor. The numerator lane is DECIMAL(38,0): int64
    * would wrap at ~3·10⁶ docs per cohort once the 10⁶ ppm scale is
    * applied (see the object scaladoc); `div` (IntegralDivide) accepts
    * decimals and returns BIGINT. An empty cohort makes the divisor 0 —
    * `greatest(…, 1)` keeps Spark (NULL) and DuckDB (error) agreeing on
    * gap 0, since the numerator is 0 whenever a total is.
    *
    * Exposed on a pre-binned (len_bin, n_a, n_b) frame so the wide-lane
    * arithmetic is unit-testable at synthetic 10¹⁰-count scales without
    * 10¹⁰ rows ([[DriftSpec]]).
    */
  private[curation] def gapPpm(bins: DataFrame): DataFrame =
    withTotals(bins)
      .withColumn("d",
        expr("CAST(n_a AS DECIMAL(38,0)) * nb_tot - CAST(n_b AS DECIMAL(38,0)) * na_tot"))
      .withColumn("gap_ppm",
        expr("""if(d < 0, -1L, 1L) *
          ((1000000 * abs(d)) div greatest(CAST(na_tot AS DECIMAL(38,0)) * nb_tot, 1))"""))
      .select("len_bin", "n_a", "n_b", "gap_ppm")

  def driftBins(docs: DataFrame): DataFrame = gapPpm(binned(docs))

  /** Total variation distance between the two cohorts' length-bin
    * distributions, exact ppm, one summary row (n_a, n_b, tv_ppm).
    * Same DECIMAL(38,0) numerator lane and empty-cohort divisor guard
    * as [[gapPpm]]; split out on the binned frame for the same
    * synthetic-scale unit test.
    */
  private[curation] def tvPpm(bins: DataFrame): DataFrame =
    withTotals(bins)
      .agg(
        max(col("na_tot")).as("n_a"),
        max(col("nb_tot")).as("n_b"),
        sum(abs(expr(
          "CAST(n_a AS DECIMAL(38,0)) * nb_tot - CAST(n_b AS DECIMAL(38,0)) * na_tot")))
          .as("absdiff"))
      .withColumn("tv_ppm",
        expr("(1000000 * absdiff) div greatest(2 * CAST(n_a AS DECIMAL(38,0)) * n_b, 1)"))
      .select("n_a", "n_b", "tv_ppm")

  def driftTv(docs: DataFrame): DataFrame = tvPpm(binned(docs))

  private var sinkCounter = 0

  /** Streaming twin of [[driftTv]] — the shape a live ingest gate runs:
    * the per-length-bin cohort counts are maintained as a complete-mode
    * streaming aggregation (bounded state: ≤64 bin rows regardless of
    * stream volume — the same bounded-state argument as
    * `streaming_blocklist_freq`), and the TV summary is computed
    * post-stream on that tiny maintained table with the SAME
    * DECIMAL(38,0) ppm lane as the batch operator. Gate result ≡ the
    * batch oracle exactly — drift monitoring needs no second batch scan
    * of data the stream already counted.
    */
  def runStreamingDriftTv(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    // Layout-branching source (single file vs part-file directory) —
    // the shared helper, [[graft.sources.StreamingSources]] doc.
    val src = graft.sources.StreamingSources.docSource(spark, sfDir)
    val qn = synchronized { sinkCounter += 1; s"graft_drift_sink_$sinkCounter" }
    val q = binned(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    tvPpm(spark.table(qn))
  }

  /** Exact Kolmogorov–Smirnov distance between the two cohorts'
    * doc-length distributions: max over lengths of |CDF_a − CDF_b|,
    * in exact ppm, plus the length where the divergence peaks (min
    * such length on ties — total order). KS complements [[driftTv]]:
    * TV sums per-bin gaps (sensitive to everywhere-small drift), KS
    * takes the worst single threshold (sensitive to one concentrated
    * shift) — the two standard accept/reject distances a snapshot
    * gate reads together.
    *
    * Integer-exact via the same cross-multiplied DECIMAL(38,0)/HUGEINT
    * lane as [[gapPpm]]: dev(x) = |cum_a(x)·N_b − cum_b(x)·N_a|, one
    * division at the end. Scale: the corpus collapses to per-LENGTH
    * cohort counts map-side (distinct n_chars cardinality, bounded by
    * max doc length); the CDF prefix windows and the argmax run at
    * that cardinality — same shape as [[graft.text.TextAnalysis.langidAuc]]'s
    * score-cardinality window, documented single tiny partition.
    */
  private[curation] def ksPpm(counts: DataFrame): DataFrame = {
    val cum = counts
      .withColumn("cum_a", expr("sum(n_a) over (order by n_chars)"))
      .withColumn("cum_b", expr("sum(n_b) over (order by n_chars)"))
      .withColumn("na_tot", expr("sum(n_a) over ()"))
      .withColumn("nb_tot", expr("sum(n_b) over ()"))
      .withColumn("dev", abs(expr(
        "CAST(cum_a AS DECIMAL(38,0)) * nb_tot - CAST(cum_b AS DECIMAL(38,0)) * na_tot")))
    val m = cum.agg(
      max(col("na_tot")).as("n_a"),
      max(col("nb_tot")).as("n_b"),
      max(col("dev")).as("maxdev"))
    cum.select("n_chars", "dev").crossJoin(m)
      .where(col("dev") === col("maxdev"))
      .groupBy("n_a", "n_b", "maxdev")
      .agg(min(col("n_chars")).as("ks_at_n_chars"))
      .select(
        col("n_a"), col("n_b"),
        expr("CAST((1000000 * maxdev) div greatest(CAST(n_a AS DECIMAL(38,0)) * n_b, 1) AS BIGINT)")
          .as("ks_ppm"),
        col("ks_at_n_chars"))
  }

  def driftKs(docs: DataFrame): DataFrame =
    ksPpm(docs.select(
        col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("in_a"))
      .groupBy("n_chars")
      .agg(sum(col("in_a")).as("n_a"), sum(lit(1L) - col("in_a")).as("n_b")))

  /** One-row snapshot acceptance report — the composed go/no-go a
    * pipeline reads before promoting a candidate cohort B against the
    * incumbent A: length-distribution TV distance, top-k vocabulary
    * overlap, how much of B is an exact duplicate of A (the "did we
    * just re-crawl the same data" check), and the alphabetic-quality
    * gap. All exact integers; single-row component relations fuse by
    * 1-row cross joins (the events_kpi_snapshot carrier pattern), so
    * the report costs its parts and nothing more.
    *
    * Scale: the duplicate check is ONE md5-keyed aggregation carrying
    * both cohorts as flags (no A-side broadcast, no two corpus
    * branches); the quality gap collapses to per-cohort sums in the
    * same kind of single pass; TV and vocab components are audited in
    * their own queries ([[driftTv]], `vocab_drift_topk`).
    */
  def snapshotAcceptance(docs: DataFrame): DataFrame = {
    val tv = driftTv(docs).select(
      col("n_a"), col("n_b"), col("tv_ppm").as("len_tv_ppm"))
    val vocab = graft.text.TextAnalysis.vocabDriftTopk(docs, k = 20)
      .select(col("jaccard_permille").as("vocab_jaccard_permille"))
    val dup = docs
      .select(
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("h"),
        when(col("lang") === "en", 1L).otherwise(0L).as("in_a"))
      .groupBy("h")
      .agg(max(col("in_a")).as("in_a"), sum(lit(1L) - col("in_a")).as("nb"))
      .agg(
        sum(col("nb") * col("in_a")).as("dup_b"),
        sum(col("nb")).as("tot_b"))
      // greatest(tot_b, 1): an all-A corpus makes tot_b 0 — Spark div
      // would return NULL where DuckDB `//` errors out; the numerator
      // is 0 whenever tot_b is, so the guard pins both engines to 0.
      .select(expr("(1000 * dup_b) div greatest(tot_b, 1)").as("dup_b_in_a_permille"))
    val quality = docs
      .select(
        when(col("lang") === "en", 1L).otherwise(0L).as("in_a"),
        expr("""(1000 * (length(text) -
          length(regexp_replace(text, '[A-Za-z]', '')))) div
          greatest(length(text), 1)""").as("alpha_pm"))
      .groupBy()
      .agg(
        sum(col("in_a") * col("alpha_pm")).as("s_a"),
        sum(col("in_a")).as("c_a"),
        sum((lit(1L) - col("in_a")) * col("alpha_pm")).as("s_b"),
        sum(lit(1L) - col("in_a")).as("c_b"))
      // Same empty-cohort guard: sums are 0 whenever counts are, so a
      // missing cohort contributes mean 0 instead of NULL-vs-error.
      .select(expr("(s_a div greatest(c_a, 1)) - (s_b div greatest(c_b, 1))")
        .as("alpha_gap_pm"))
    tv.crossJoin(vocab).crossJoin(dup).crossJoin(quality)
  }

  private val duckBins =
    """WITH b AS (SELECT CAST(length(bin(n_chars)) AS BIGINT) AS len_bin,
      |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_a FROM documents),
      |g AS (SELECT len_bin, CAST(sum(in_a) AS BIGINT) AS n_a,
      |  CAST(sum(1 - in_a) AS BIGINT) AS n_b FROM b GROUP BY 1),
      |t AS (SELECT len_bin, n_a, n_b,
      |  CAST(sum(n_a) OVER () AS BIGINT) AS na_tot,
      |  CAST(sum(n_b) OVER () AS BIGINT) AS nb_tot FROM g)""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "corpus_drift_bins",
      (s, dir) => driftBins(Tables.documents(s, dir)).orderBy("len_bin"),
      Some(s"""$duckBins
             |SELECT len_bin, n_a, n_b,
             |  CAST((CASE WHEN CAST(n_a AS HUGEINT) * nb_tot - CAST(n_b AS HUGEINT) * na_tot < 0
             |      THEN -1 ELSE 1 END)
             |    * ((1000000 * abs(CAST(n_a AS HUGEINT) * nb_tot - CAST(n_b AS HUGEINT) * na_tot))
             |       // greatest(CAST(na_tot AS HUGEINT) * nb_tot, 1))
             |    AS BIGINT) AS gap_ppm
             |FROM t ORDER BY len_bin""".stripMargin),
    ),
    EngineQuery(
      "snapshot_acceptance",
      (s, dir) => snapshotAcceptance(Tables.documents(s, dir)),
      Some(s"""$duckBins,
             |tvq AS (SELECT CAST(max(na_tot) AS BIGINT) AS n_a,
             |  CAST(max(nb_tot) AS BIGINT) AS n_b,
             |  CAST((1000000 * sum(abs(CAST(n_a AS HUGEINT) * nb_tot - CAST(n_b AS HUGEINT) * na_tot)))
             |    // greatest(2 * CAST(max(na_tot) AS HUGEINT) * CAST(max(nb_tot) AS HUGEINT), 1)
             |    AS BIGINT) AS len_tv_ppm FROM t),
             |vt AS (SELECT CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS cohort,
             |  unnest(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |    ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS term
             |  FROM documents),
             |vg AS (SELECT cohort, term, count(*) AS cnt FROM vt GROUP BY 1, 2),
             |vr AS (SELECT cohort, term,
             |  row_number() OVER (PARTITION BY cohort ORDER BY cnt DESC, term) AS rk
             |  FROM vg),
             |vs AS (SELECT term,
             |  max(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS in_a,
             |  max(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS in_b
             |  FROM vr WHERE rk <= 20 GROUP BY 1),
             |vq AS (SELECT CAST((1000 * CAST(sum(in_a * in_b) AS BIGINT))
             |  // (40 - CAST(sum(in_a * in_b) AS BIGINT)) AS BIGINT)
             |  AS vocab_jaccard_permille FROM vs),
             |dg AS (SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS h,
             |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_a FROM documents),
             |dh AS (SELECT h, max(in_a) AS in_a,
             |  CAST(sum(1 - in_a) AS BIGINT) AS nb FROM dg GROUP BY 1),
             |dq AS (SELECT CAST((1000 * CAST(sum(nb * in_a) AS BIGINT))
             |  // greatest(CAST(sum(nb) AS BIGINT), 1) AS BIGINT) AS dup_b_in_a_permille FROM dh),
             |qg AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_a,
             |  (1000 * (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))))
             |    // greatest(length(text), 1) AS alpha_pm FROM documents),
             |qq AS (SELECT CAST((CAST(sum(in_a * alpha_pm) AS BIGINT)
             |    // greatest(CAST(sum(in_a) AS BIGINT), 1))
             |  - (CAST(sum((1 - in_a) * alpha_pm) AS BIGINT)
             |    // greatest(CAST(sum(1 - in_a) AS BIGINT), 1)) AS BIGINT) AS alpha_gap_pm FROM qg)
             |SELECT n_a, n_b, len_tv_ppm, vocab_jaccard_permille,
             |  dup_b_in_a_permille, alpha_gap_pm
             |FROM tvq, vq, dq, qq""".stripMargin),
      headline = true,
    ),
    EngineQuery(
      "corpus_drift_ks",
      (s, dir) => driftKs(Tables.documents(s, dir)),
      Some("""WITH c AS (SELECT n_chars,
             |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |  CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_b
             |  FROM documents GROUP BY 1),
             |cum AS (SELECT n_chars,
             |  CAST(sum(n_a) OVER (ORDER BY n_chars) AS HUGEINT) AS cum_a,
             |  CAST(sum(n_b) OVER (ORDER BY n_chars) AS HUGEINT) AS cum_b,
             |  CAST(sum(n_a) OVER () AS HUGEINT) AS na_tot,
             |  CAST(sum(n_b) OVER () AS HUGEINT) AS nb_tot FROM c),
             |d AS (SELECT n_chars, na_tot, nb_tot,
             |  abs(cum_a * nb_tot - cum_b * na_tot) AS dev FROM cum),
             |m AS (SELECT max(dev) AS maxdev FROM d)
             |SELECT CAST(max(na_tot) AS BIGINT) AS n_a,
             |  CAST(max(nb_tot) AS BIGINT) AS n_b,
             |  CAST((1000000 * max(maxdev)) // greatest(max(na_tot) * max(nb_tot), 1) AS BIGINT)
             |    AS ks_ppm,
             |  min(n_chars) AS ks_at_n_chars
             |FROM d, m WHERE dev = maxdev""".stripMargin),
    ),
    EngineQuery(
      "corpus_drift_tv",
      (s, dir) => driftTv(Tables.documents(s, dir)),
      Some(s"""$duckBins
             |SELECT CAST(max(na_tot) AS BIGINT) AS n_a,
             |  CAST(max(nb_tot) AS BIGINT) AS n_b,
             |  CAST((1000000 * sum(abs(CAST(n_a AS HUGEINT) * nb_tot - CAST(n_b AS HUGEINT) * na_tot)))
             |    // greatest(2 * CAST(max(na_tot) AS HUGEINT) * CAST(max(nb_tot) AS HUGEINT), 1)
             |    AS BIGINT) AS tv_ppm
             |FROM t""".stripMargin),
    ),
    // Streaming twin: the bin counts maintained by a complete-mode
    // streaming aggregation, TV computed on the maintained table —
    // must equal the batch oracle exactly.
    EngineQuery(
      "streaming_drift_tv",
      (s, dir) => runStreamingDriftTv(s, dir),
      Some(s"""$duckBins
             |SELECT CAST(max(na_tot) AS BIGINT) AS n_a,
             |  CAST(max(nb_tot) AS BIGINT) AS n_b,
             |  CAST((1000000 * sum(abs(CAST(n_a AS HUGEINT) * nb_tot - CAST(n_b AS HUGEINT) * na_tot)))
             |    // greatest(2 * CAST(max(na_tot) AS HUGEINT) * CAST(max(nb_tot) AS HUGEINT), 1)
             |    AS BIGINT) AS tv_ppm
             |FROM t""".stripMargin),
    ),
  )
}
