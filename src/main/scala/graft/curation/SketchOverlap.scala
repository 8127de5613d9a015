package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** KMV (k-minimum-values) sketch overlap — estimate the Jaccard overlap
  * between two corpus cohorts from two k-row sketches, the join-free
  * answer to "how much of candidate crawl B is already in incumbent A"
  * at 100 TB. The exact answer needs a distinct-hash aggregation over
  * both corpora (computed here too, as the error reference); the KMV
  * estimate needs only each cohort's k smallest content hashes —
  * sketches are mergeable, k rows each, so cross-DATACENTER overlap
  * checks ship kilobytes, not corpora.
  *
  * Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07): merge the two sketches, keep
  * the k smallest distinct hashes of the union; the fraction of those
  * present in BOTH sketches estimates J(A,B). Everything is exact
  * integer arithmetic over a deterministic md5-derived 60-bit hash, so
  * the DuckDB oracle replays the estimate bit-for-bit — the "estimate"
  * is approximate w.r.t. the true Jaccard, not w.r.t. the oracle.
  *
  * Scale (100 TB): one map-side-combined distinct on (cohort, hash) —
  * the same single exchange exact dedup pays — then the per-cohort
  * k-smallest cut runs as WindowGroupLimit (rank ≤ k pushed below the
  * exchange, so only ≤ k rows per cohort leave each map partition).
  * Everything downstream of the cut is ≤ 2k rows. The exact companion
  * rides the same hash relation with flag aggregation (no self-join).
  */
object SketchOverlap {

  /** 60-bit positive content hash: first 15 hex chars of md5 over
    * whitespace-normalized lowercased text — same normalization as the
    * exact-dedup family, so "overlap" means what [[Drift]]'s dup check
    * means.
    */
  private def contentHash = conv(
    substring(md5(regexp_replace(lower(col("text")), "\\s+", " ")), 1, 15), 16, 10)
    .cast("long")

  private def cohortHashes(docs: DataFrame): DataFrame =
    docs.select(
      when(col("lang") === "en", "a").otherwise("b").as("cohort"),
      contentHash.as("h"))

  def kmvCohortOverlap(docs: DataFrame, k: Int = 256): DataFrame = {
    val hashes = cohortHashes(docs)
    // distinct = groupBy(cohort, h): partials dedupe map-side, ONE
    // exchange; the cohort-keyed window after it re-exchanges only the
    // ≤ k surviving rows per cohort per partition (WindowGroupLimit).
    val dedup = hashes.distinct()
    val sketch = dedup
      .withColumn("rk", row_number().over(Window.partitionBy("cohort").orderBy("h")))
      .where(col("rk") <= k)
    // merged union sketch: k smallest distinct hashes across both
    // sketches (≤ 2k rows in — the single-partition window is fine)
    val est = sketch
      .groupBy("h")
      .agg(
        max(when(col("cohort") === "a", 1L).otherwise(0L)).as("in_a"),
        max(when(col("cohort") === "b", 1L).otherwise(0L)).as("in_b"))
      .withColumn("urk", row_number().over(Window.orderBy("h")))
      .where(col("urk") <= k)
      .agg(
        count(lit(1)).as("sketch_union"),
        sum(col("in_a") * col("in_b")).as("est_inter"))
      .select(
        col("sketch_union"), col("est_inter"),
        expr("(1000 * est_inter) div greatest(sketch_union, 1)")
          .as("jaccard_est_permille"))
    val exact = hashes
      .groupBy("h")
      .agg(
        max(when(col("cohort") === "a", 1L).otherwise(0L)).as("in_a"),
        max(when(col("cohort") === "b", 1L).otherwise(0L)).as("in_b"))
      .agg(
        count(lit(1)).as("exact_union"),
        sum(col("in_a") * col("in_b")).as("exact_inter"))
      .select(
        col("exact_union"), col("exact_inter"),
        expr("(1000 * exact_inter) div greatest(exact_union, 1)")
          .as("jaccard_exact_permille"))
    est.crossJoin(exact).select(
      lit(k.toLong).as("k"),
      col("sketch_union"), col("est_inter"), col("jaccard_est_permille"),
      col("exact_union"), col("exact_inter"), col("jaccard_exact_permille"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "kmv_cohort_overlap",
      (s, dir) => kmvCohortOverlap(Tables.documents(s, dir)),
      Some("""WITH hh AS (SELECT CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS cohort,
             |  CAST('0x' || substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 15)
             |    AS BIGINT) AS h
             |  FROM documents),
             |d AS (SELECT cohort, h FROM hh GROUP BY 1, 2),
             |sk AS (SELECT cohort, h,
             |  row_number() OVER (PARTITION BY cohort ORDER BY h) AS rk FROM d),
             |mg AS (SELECT h,
             |  max(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS in_a,
             |  max(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS in_b
             |  FROM sk WHERE rk <= 256 GROUP BY 1),
             |mgk AS (SELECT * FROM
             |  (SELECT mg.*, row_number() OVER (ORDER BY h) AS urk FROM mg)
             |  WHERE urk <= 256),
             |est AS (SELECT CAST(count(*) AS BIGINT) AS sketch_union,
             |  CAST(sum(in_a * in_b) AS BIGINT) AS est_inter FROM mgk),
             |ex0 AS (SELECT h,
             |  max(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS in_a,
             |  max(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS in_b
             |  FROM hh GROUP BY 1),
             |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_union,
             |  CAST(sum(in_a * in_b) AS BIGINT) AS exact_inter FROM ex0)
             |SELECT CAST(256 AS BIGINT) AS k, sketch_union, est_inter,
             |  CAST((1000 * est_inter) // greatest(sketch_union, 1) AS BIGINT)
             |    AS jaccard_est_permille,
             |  exact_union, exact_inter,
             |  CAST((1000 * exact_inter) // greatest(exact_union, 1) AS BIGINT)
             |    AS jaccard_exact_permille
             |FROM est, ex""".stripMargin),
      headline = true,
    ),
  )
}
