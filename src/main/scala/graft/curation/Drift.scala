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
  * runs at bin cardinality. The cross-multiplied numerators stay under
  * int64 through ~3·10⁹ docs per cohort; past that, the per-bin gap
  * switches to ppm-of-cohort terms (gap of two int64 ppm values) with
  * one extra integer division — same plan shape.
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
    * separate exact factor.
    */
  def driftBins(docs: DataFrame): DataFrame =
    withTotals(binned(docs))
      .withColumn("d", expr("n_a * nb_tot - n_b * na_tot"))
      .withColumn("gap_ppm",
        expr("if(d < 0, -1L, 1L) * ((1000000 * abs(d)) div (na_tot * nb_tot))"))
      .select("len_bin", "n_a", "n_b", "gap_ppm")

  /** Total variation distance between the two cohorts' length-bin
    * distributions, exact ppm, one summary row (n_a, n_b, tv_ppm).
    */
  def driftTv(docs: DataFrame): DataFrame =
    withTotals(binned(docs))
      .agg(
        max(col("na_tot")).as("n_a"),
        max(col("nb_tot")).as("n_b"),
        sum(abs(expr("n_a * nb_tot - n_b * na_tot"))).as("absdiff"))
      .withColumn("tv_ppm", expr("(1000000 * absdiff) div (2 * n_a * n_b)"))
      .select("n_a", "n_b", "tv_ppm")

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
      .select(expr("(1000 * dup_b) div tot_b").as("dup_b_in_a_permille"))
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
      .select(expr("(s_a div c_a) - (s_b div c_b)").as("alpha_gap_pm"))
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
             |  CAST((CASE WHEN n_a * nb_tot - n_b * na_tot < 0 THEN -1 ELSE 1 END)
             |    * ((1000000 * abs(n_a * nb_tot - n_b * na_tot)) // (na_tot * nb_tot))
             |    AS BIGINT) AS gap_ppm
             |FROM t ORDER BY len_bin""".stripMargin),
    ),
    EngineQuery(
      "snapshot_acceptance",
      (s, dir) => snapshotAcceptance(Tables.documents(s, dir)),
      Some(s"""$duckBins,
             |tvq AS (SELECT CAST(max(na_tot) AS BIGINT) AS n_a,
             |  CAST(max(nb_tot) AS BIGINT) AS n_b,
             |  CAST((1000000 * CAST(sum(abs(n_a * nb_tot - n_b * na_tot)) AS BIGINT))
             |    // (2 * CAST(max(na_tot) AS BIGINT) * CAST(max(nb_tot) AS BIGINT))
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
             |  // CAST(sum(nb) AS BIGINT) AS BIGINT) AS dup_b_in_a_permille FROM dh),
             |qg AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_a,
             |  (1000 * (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))))
             |    // greatest(length(text), 1) AS alpha_pm FROM documents),
             |qq AS (SELECT CAST((CAST(sum(in_a * alpha_pm) AS BIGINT)
             |    // CAST(sum(in_a) AS BIGINT))
             |  - (CAST(sum((1 - in_a) * alpha_pm) AS BIGINT)
             |    // CAST(sum(1 - in_a) AS BIGINT)) AS BIGINT) AS alpha_gap_pm FROM qg)
             |SELECT n_a, n_b, len_tv_ppm, vocab_jaccard_permille,
             |  dup_b_in_a_permille, alpha_gap_pm
             |FROM tvq, vq, dq, qq""".stripMargin),
      headline = true,
    ),
    EngineQuery(
      "corpus_drift_tv",
      (s, dir) => driftTv(Tables.documents(s, dir)),
      Some(s"""$duckBins
             |SELECT CAST(max(na_tot) AS BIGINT) AS n_a,
             |  CAST(max(nb_tot) AS BIGINT) AS n_b,
             |  CAST((1000000 * CAST(sum(abs(n_a * nb_tot - n_b * na_tot)) AS BIGINT))
             |    // (2 * CAST(max(na_tot) AS BIGINT) * CAST(max(nb_tot) AS BIGINT))
             |    AS BIGINT) AS tv_ppm
             |FROM t""".stripMargin),
    ),
  )
}
