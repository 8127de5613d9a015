package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Hashed-feature linear text scorer — the fastText architecture
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"): features are unigrams plus hashed bigrams, the
  * model is one linear layer, and scoring a 100 TB corpus is a pure
  * per-row projection. This is the quality-classifier plumbing every
  * web-scale curation pipeline runs (CCNet's fastText LM filter, the
  * LLaMA/RedPajama "looks-like-Wikipedia" classifier): the expensive
  * part at scale is not the model, it is streaming the corpus through
  * feature extraction + dot product without a shuffle — which is
  * exactly what this operator is.
  *
  * Weights: deterministic md5-derived integers in [-1000, 1000]
  * (milli-units) — a reproducible stand-in for trained weights (the
  * hashing trick makes the weight TABLE implicit: w(f) is computed
  * from f, so there is nothing to broadcast and the scorer is
  * embarrassingly parallel; a trained model swaps in a broadcast
  * weights map with the identical plan shape). Integer weights make
  * the per-doc sum ORDER-INDEPENDENT — exact cross-engine portability
  * without pinning a float summation order; the only IEEE operation is
  * the final single division to a mean score.
  *
  * Zero shuffle end-to-end: tokenize, bigram, hash, weigh, and sum all
  * happen inside one array-lambda projection per row (the gate's final
  * ORDER BY is the only exchange).
  */
object HashedLinear {

  /** Integer milli-weight of a feature string: md5 lane 0 mod 2001,
    * shifted to [-1000, 1000]. */
  private def milliWeight(f: Column): Column =
    (conv(substring(md5(f), 1, 8), 16, 10).cast("long") % 2001L) - 1000L

  /** doc_id, n_features, score_milli (exact BIGINT), score (mean
    * milli-weight as ONE IEEE division), label (score_milli > 0). */
  def hashedLinearScore(docs: DataFrame): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val bigs = when(size(col("__toks")) >= 2,
      transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ", element_at(col("__toks"), i), element_at(col("__toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val feats = filter(
      array_distinct(concat(col("__toks"), col("__bigs"))), x => x =!= "")
    graft.Partitioning.fanOut(docs)
      .withColumn("__toks", toks)
      .withColumn("__bigs", bigs)
      .withColumn("__feats", feats)
      .select(
        col("doc_id"),
        size(col("__feats")).cast("long").as("n_features"),
        aggregate(col("__feats"), lit(0L), (acc, x) => acc + milliWeight(x))
          .as("score_milli"))
      .withColumn("score",
        col("score_milli").cast("double") /
          (lit(1000.0) * greatest(col("n_features"), lit(1L)).cast("double")))
      .withColumn("label", col("score_milli") > 0L)
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "hashed_linear_score",
      (s, dir) => hashedLinearScore(Tables.documents(s, dir)).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |       ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
             |  FROM documents),
             |f AS (SELECT doc_id,
             |  list_filter(list_distinct(list_concat(toks,
             |    CASE WHEN length(toks) >= 2
             |         THEN list_transform(generate_series(1, length(toks) - 1),
             |                i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])
             |         ELSE CAST([] AS VARCHAR[]) END)), x -> x <> '') AS feats
             |  FROM t),
             |m AS (SELECT doc_id,
             |  CAST(length(feats) AS BIGINT) AS n_features,
             |  CAST(coalesce(list_sum(list_transform(feats,
             |    x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2001) - 1000)), 0) AS BIGINT)
             |    AS score_milli
             |  FROM f)
             |SELECT doc_id, n_features, score_milli,
             |  CAST(score_milli AS DOUBLE) / (1000.0 * CAST(greatest(n_features, 1) AS DOUBLE)) AS score,
             |  score_milli > 0 AS label
             |FROM m ORDER BY doc_id""".stripMargin),
    ),
  )
}
