package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}
import graft.text.RollingHash

/** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03 — the MOSS algorithm): hash every character k-window,
  * slide a window of w consecutive hashes, keep each window's minimum
  * (ties to the rightmost). The selection is position-robust — ANY
  * shared substring of length ≥ k + w − 1 between two documents is
  * GUARANTEED to contribute at least one identical fingerprint to
  * both, while expected density is only 2/(w+1) of positions. That
  * guarantee is what the content-defined 1-in-2^b sampling of
  * [[SubstringDup]] gives up (it misses a copied span with
  * probability (1−2^−b)^span); winnowing is the deterministic-recall
  * member of the exact-substring family.
  *
  * Exactness/portability: the window hash is the two-lane polynomial
  * rolling hash of [[graft.text.RollingHash]] — pure BIGINT
  * arithmetic the DuckDB oracle replays bit-for-bit (nested fold for
  * the hash; the rightmost-min rule declaratively as lag/lead
  * run-length predicates). No vendor hash function on either side.
  *
  * Scale notes (100 TB): fingerprint extraction AND selection run
  * inside the map stage via the [[graft.text.RollingHashGenerator]]
  * codegen generator — O(n) rolling pass, ring-buffer deque, zero
  * shuffle; only the ~2/(w+1) selected minority reaches the first
  * exchange. The pair join is an equi-join on the fingerprint value
  * with a per-fingerprint document cap (the MinHash-band discipline:
  * a boilerplate fingerprint shared by 10⁶ docs must not expand into
  * 10¹² candidate pairs — capped fingerprints are dropped, which only
  * suppresses boilerplate-only matches).
  */
object Winnow {

  val K = 16 // character window
  val W = 8  // winnow window over hashes; guarantee span = K + W - 1 = 23 chars
  val HotCap = 32 // max docs sharing a fingerprint before it is dropped as boilerplate
  val MinShared = 3 // fingerprints two docs must share to pair

  /** Per-doc fingerprint relation (doc_id, pos, h), selection done in
    * the map stage by the generator.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    graft.Partitioning.fanOut(docs)
      .selectExpr("doc_id", s"winnow_fingerprints(text, $K, $W) AS (pos, h)")
  }

  /** Per-document fingerprint statistics: window positions, selected
    * fingerprints, distinct fingerprint values, selection density in
    * permille (expected ≈ 2000/(w+1) ≈ 222‰ at w=8).
    */
  def fingerprintStats(docs: DataFrame): DataFrame = {
    val perDoc = fingerprints(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_selected"),
        countDistinct(col("h")).as("n_distinct_fp"))
    docs
      .select(
        col("doc_id"),
        greatest(length(col("text")) - (K - 1), lit(0)).cast("long").as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"), col("n_windows"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("n_distinct_fp"), lit(0L)).as("n_distinct_fp"),
        expr("(1000 * coalesce(n_selected, 0L)) div greatest(n_windows, 1L)")
          .as("density_permille"))
  }

  /** Pair join over a (doc_id, h) fingerprint relation — the shared
    * core of the batch and incremental paths. Single fingerprint-keyed
    * repartition (the containmentPairs discipline): the (doc, h) dedup,
    * the hot cap, and both join sides are partition-local on one reused
    * exchange.
    */
  private def pairsFromFingerprints(fp0: DataFrame): DataFrame = {
    val fp = fp0
      .repartition(
        fp0.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt, col("h"))
      .distinct()
    val keepable = fp.groupBy("h")
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") <= HotCap)
      .select("h")
    val fpk = fp.join(keepable, "h")
    fpk.as("a")
      .join(fpk.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= MinShared)
  }

  /** Document pairs sharing ≥ `MinShared` distinct fingerprints, hot
    * (boilerplate) fingerprints capped out: (doc_a, doc_b, n_shared).
    */
  def dupPairs(docs: DataFrame): DataFrame =
    pairsFromFingerprints(fingerprints(docs).select("doc_id", "h"))

  /** The persisted fingerprint index a production pipeline maintains
    * between crawl snapshots: distinct (doc_id, h).
    */
  def fingerprintIndex(docs: DataFrame): DataFrame =
    fingerprints(docs).select("doc_id", "h").distinct()

  /** Incremental twin of [[dupPairs]] — the crawl-snapshot ingestion
    * shape: a new batch is fingerprinted FRESH (the O(chars) rolling
    * map stage runs only over the batch) and probes the EXISTING
    * corpus's persisted fingerprint index; the corpus itself is never
    * re-fingerprinted. The hot cap applies over the combined fingerprint
    * population (a boilerplate fingerprint is boilerplate regardless of
    * which snapshot its docs arrived in — and a fingerprint an incoming
    * batch pushes past the cap correctly retracts its existing-only
    * pairs too), so the result is BIT-IDENTICAL to running [[dupPairs]]
    * over the union corpus: incremental ≡ batch, gated by the same
    * oracle. At 100 TB the saving is the extraction pass — the
    * fingerprint join itself stays index ∪ batch sized, hash-partitioned
    * on the fingerprint value.
    */
  def incrementalDupPairs(index: DataFrame, incoming: DataFrame): DataFrame =
    pairsFromFingerprints(
      index.select("doc_id", "h").union(fingerprintIndex(incoming)))

  /** Shared oracle prefix: all window hashes, per-doc counts, and the
    * winnow selection — the declarative replay of the generator.
    */
  private def duckSelCtes: String = {
    val h = RollingHash.duckWindowHash("text", "p", K)
    val selected = RollingHash.duckWinnowSelected(W, "n")
    s"""pos AS (
       |  SELECT doc_id, p, $h AS h
       |  FROM documents, unnest(generate_series(1, length(text) - ${K - 1})) AS g(p)
       |  WHERE length(text) >= $K),
       |wcnt AS (SELECT doc_id, p, h, count(*) OVER (PARTITION BY doc_id) AS n FROM pos),
       |sel AS (
       |  SELECT doc_id, p, h FROM (
       |    SELECT doc_id, p, h, $selected AS keep
       |    FROM wcnt WINDOW wn AS (PARTITION BY doc_id ORDER BY p))
       |  WHERE keep)""".stripMargin
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "winnow_fingerprint_stats",
      (s, dir) => fingerprintStats(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $duckSelCtes,
             |perdoc AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
             |    CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_fp
             |  FROM sel GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(greatest(length(d.text) - ${K - 1}, 0) AS BIGINT) AS n_windows,
             |  coalesce(p.n_selected, 0) AS n_selected,
             |  coalesce(p.n_distinct_fp, 0) AS n_distinct_fp,
             |  (1000 * coalesce(p.n_selected, 0))
             |    // greatest(CAST(greatest(length(d.text) - ${K - 1}, 0) AS BIGINT), 1)
             |    AS density_permille
             |FROM documents d LEFT JOIN perdoc p USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      headline = true,
    ),
    EngineQuery(
      "winnow_dup_pairs",
      (s, dir) => dupPairs(Tables.documents(s, dir)).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $duckSelCtes,
             |fp AS (SELECT DISTINCT doc_id, h FROM sel),
             |ok AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= $HotCap),
             |fpk AS (SELECT fp.doc_id, fp.h FROM fp JOIN ok USING (h))
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(count(*) AS BIGINT) AS n_shared
             |FROM fpk a JOIN fpk b ON a.h = b.h AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= $MinShared
             |ORDER BY doc_a, doc_b""".stripMargin),
    ),
    // The incremental path must reproduce the batch relation exactly:
    // even-id docs play the existing corpus (their fingerprint index is
    // "precomputed" — materialized before the incremental call), odd-id
    // docs the new crawl snapshot; the oracle is the BATCH oracle.
    EngineQuery(
      "winnow_incremental_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // materialize the index first — the production shape is a
        // PERSISTED index, so only the batch side runs the rolling
        // fingerprint Generate (pinned in PlanAuditSpec)
        val index = fingerprintIndex(docs.where(col("doc_id") % 2 === 0))
          .localCheckpoint(true)
        incrementalDupPairs(index, docs.where(col("doc_id") % 2 =!= 0))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $duckSelCtes,
             |fp AS (SELECT DISTINCT doc_id, h FROM sel),
             |ok AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= $HotCap),
             |fpk AS (SELECT fp.doc_id, fp.h FROM fp JOIN ok USING (h))
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(count(*) AS BIGINT) AS n_shared
             |FROM fpk a JOIN fpk b ON a.h = b.h AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= $MinShared
             |ORDER BY doc_a, doc_b""".stripMargin),
      headline = true,
    ),
  )
}
