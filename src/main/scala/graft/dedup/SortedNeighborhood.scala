package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge) —
  * the third candidate-generation strategy next to MinHash banding
  * (resemblance) and containment grams (quotation): sort the corpus by
  * a normalized key and compare each record only against its `w`
  * successors in the sort order. Where LSH catches high-Jaccard pairs
  * probabilistically, SNM catches *prefix-adjacent* near-dups
  * deterministically (boilerplate headers, templated titles, re-crawls
  * differing past char 8) at exactly `w·N` candidate pairs — a hard,
  * tunable bound no LSH parameterization gives.
  *
  * Scale (100 TB): the global sort RANK is computed bucket-decomposed
  * and bounds-invariant — approx_percentile key bounds split the corpus
  * into `buckets` ranges, per-bucket counts prefix-sum into offsets at
  * bucket cardinality, and rank = offset + per-bucket row_number, which
  * equals the global row_number for ANY bounds (same invariance
  * argument as `packSequencesScalable`). No single-partition window
  * touches the corpus. Candidates come from an equi-join on rank+o
  * (o ∈ 1..w) — shuffle on rank, perfectly balanced by construction
  * (rank is a permutation: every key exactly once per side, the
  * anti-skew ideal no natural key offers). Verification is a
  * per-candidate Levenshtein on the 32-char normalized prefix — w·N
  * bounded work, no corpus blow-up.
  */
object SortedNeighborhood {

  /** Normalized blocking material: lowercased alphanumerics only. */
  private def norm(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** First 8 normalized chars packed base-256 into a BIGINT — numeric,
    * order-identical to the lexicographic prefix (space-padded; ' '
    * sorts below [0-9a-z], preserving prefix order). Numeric so
    * approx_percentile can cut range bounds for the decomposed rank.
    * Max value 122·(256⁸-1)/255 < 2⁶³ — no wrap.
    */
  private def packedKey(k8: Column): Column =
    (0 until 8)
      .map(i => ascii(substring(k8, i + 1, 1)).cast("long") * lit(math.pow(256, 7 - i).toLong))
      .reduce(_ + _)

  /** Exact global rank by (key, doc_id), bucket-decomposed (see object
    * scaladoc). Input needs columns (doc_id, key); adds `rank`.
    */
  def globalRank(df: DataFrame, buckets: Int = 32): DataFrame = {
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds: Seq[Long] =
      if (qs.isEmpty) Seq.empty
      else Option(
        df.agg(expr(s"approx_percentile(key, array(${qs.mkString(",")}), 10000)").as("bs"))
          .head.getSeq[Long](0)
      ).getOrElse(Seq.empty)
    // Bucket = #bounds below key, as a flat SUM of codegen'd IFs — NOT
    // the `aggregate(array(...))` HOF packSequencesScalable uses: the
    // HOF runs interpreted, and with `key` being a large inlined
    // expression (9 regexp_replaces here) the lambda re-evaluates it
    // per bound per row per plan site (measured 16s vs 0.4s at sf0.1).
    // The flat sum is one subexpression-eliminated key eval per row.
    val bucketCol =
      if (bounds.isEmpty) lit(0L)
      else bounds.map(b => when(col("key") > b, 1L).otherwise(0L)).reduce(_ + _)
    val bucketed = df.withColumn("b", bucketCol)
    val offsets = bucketed.groupBy("b")
      .agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(
          sum(col("n")).over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("b", "offset")
    bucketed.join(broadcast(offsets), Seq("b"))
      .withColumn("rank",
        col("offset") + row_number().over(Window.partitionBy("b").orderBy("key", "doc_id")))
      .drop("b", "offset")
  }

  /** Candidate pairs within `w` of the sort order, verified by
    * Levenshtein ≤ `maxLev` on the 32-char normalized prefix. Output
    * (doc_a, doc_b, gap, lev) with doc_a the lower-RANK side.
    */
  def snmNearDupPairs(
      docs: DataFrame, w: Int = 3, maxLev: Int = 8, buckets: Int = 32): DataFrame = {
    val keyed = docs.select(
      col("doc_id"),
      substring(norm(col("text")), 1, 32).as("p32"),
      packedKey(rpad(norm(col("text")), 8, " ")).as("key"))
    val ranked = globalRank(keyed, buckets)
    val left = ranked
      .select(col("doc_id").as("doc_a"), col("p32").as("pa"), col("rank"),
        explode(expr(s"sequence(1L, ${w}L)")).as("gap"))
      .withColumn("rk2", col("rank") + col("gap"))
    val right = ranked
      .select(col("doc_id").as("doc_b"), col("p32").as("pb"), col("rank").as("rk2"))
    left.join(right, Seq("rk2"))
      .withColumn("lev", levenshtein(col("pa"), col("pb")).cast("long"))
      .where(col("lev") <= maxLev)
      .select("doc_a", "doc_b", "gap", "lev")
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "snm_neardup_pairs",
      (s, dir) => snmNearDupPairs(Tables.documents(s, dir)).orderBy("doc_a", "doc_b"),
      Some("""WITH nk AS (SELECT doc_id,
             |  substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 32) AS p32,
             |  rpad(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 8, ' ') AS k8
             |  FROM documents),
             |ky AS (SELECT doc_id, p32,
             |  ord(substr(k8, 1, 1)) * 72057594037927936
             |  + ord(substr(k8, 2, 1)) * 281474976710656
             |  + ord(substr(k8, 3, 1)) * 1099511627776
             |  + ord(substr(k8, 4, 1)) * 4294967296
             |  + ord(substr(k8, 5, 1)) * 16777216
             |  + ord(substr(k8, 6, 1)) * 65536
             |  + ord(substr(k8, 7, 1)) * 256
             |  + ord(substr(k8, 8, 1)) AS key FROM nk),
             |r AS (SELECT doc_id, p32,
             |  row_number() OVER (ORDER BY key, doc_id) AS rank FROM ky)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(b.rank - a.rank AS BIGINT) AS gap,
             |  CAST(levenshtein(a.p32, b.p32) AS BIGINT) AS lev
             |FROM r a JOIN r b ON b.rank BETWEEN a.rank + 1 AND a.rank + 3
             |WHERE levenshtein(a.p32, b.p32) <= 8
             |ORDER BY doc_a, doc_b""".stripMargin),
      headline = true,
    ),
  )
}
