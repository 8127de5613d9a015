package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Bigram language-model fluency scoring — the perplexity-filter
  * stand-in (CCNet, Wenzek et al. 2020, filters web text by KenLM
  * perplexity; Gopher and LLaMA both gate on LM scores): train a
  * bigram model ON the corpus itself, then score each document by its
  * mean transition probability. Low-scoring documents are
  * word-salad/boilerplate whose token transitions are rare in the
  * corpus — the same signal perplexity thresholding uses, minus the
  * external model file.
  *
  * Portability: a log-prob sum would inherit the ln() 1-ulp engine gap
  * PER TOKEN (unlike tfidf's single product, a 10^5-term float sum can
  * genuinely drift), so the score is defined as EXACT INTEGER
  * arithmetic end-to-end: each transition contributes
  * floor(10^6 · cnt(w1,w2) / cnt1(w1)) (integer division of exact
  * counts — the scaled conditional probability P(w2|w1)), a document's
  * `score_sum` is the BIGINT sum over its bigram occurrences, and the
  * only IEEE operation is the final mean division. Every bigram a doc
  * contains exists in the model by construction (it contributed to the
  * counts), so there is no smoothing branch.
  *
  * Scale shape: the model is two partial+final count aggregations
  * (unigram table ~vocab, bigram table ~vocab²-bounded but corpus
  * supported); scoring joins each doc's bigram stream to the model on
  * (w1, w2) — declarative equi-joins that hash-partition at scale, the
  * inverted-index probe shape. cnt1 rides along inside the bigram
  * model row (one join, not two). Nothing driver-side.
  */
object BigramLm {

  val Scale = 1000000L

  /** (doc_id, w1, w2) one row per bigram OCCURRENCE. */
  private def docBigrams(docs: DataFrame): DataFrame =
    graft.Partitioning.fanOut(docs)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("__toks"))
      .where(size(col("__toks")) >= 2 && col("__toks").getItem(0) =!= "")
      .select(col("doc_id"), explode(
        transform(
          sequence(lit(1), size(col("__toks")) - 1),
          i => struct(
            element_at(col("__toks"), i).as("w1"),
            element_at(col("__toks"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** The trained model: (w1, w2, p_scaled) with
    * p_scaled = floor(Scale · cnt2 / cnt1(w1)). */
  def bigramModel(docs: DataFrame): DataFrame = {
    val bi = docBigrams(docs)
    val cnt1 = bi.groupBy("w1").agg(count(lit(1)).as("cnt1"))
    bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
      .join(cnt1, Seq("w1"))
      .select(col("w1"), col("w2"),
        expr(s"CAST(($Scale * cnt2) div cnt1 AS BIGINT)").as("p_scaled"))
  }

  /** Per-doc fluency: n_bigrams, exact score_sum, and the mean scaled
    * transition probability (one IEEE division). Docs with < 2 tokens
    * surface with zero bigrams via the left join from `docs`. */
  def fluencyScores(docs: DataFrame): DataFrame = {
    val scored = docBigrams(docs)
      .join(bigramModel(docs), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_scaled")).as("score_sum"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_sum"), lit(0L)).as("score_sum"))
      .withColumn("mean_p_scaled",
        col("score_sum").cast("double") /
          greatest(col("n_bigrams"), lit(1L)).cast("double"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "bigram_lm_fluency",
      (s, dir) => fluencyScores(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
             |  FROM documents WHERE length(trim(text)) > 0),
             |bi AS (
             |  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
             |  FROM t, unnest(generate_series(1, length(toks) - 1)) AS g(i)
             |  WHERE length(toks) >= 2),
             |c1 AS (SELECT w1, count(*) AS cnt1 FROM bi GROUP BY w1),
             |model AS (
             |  SELECT w1, w2, CAST(($Scale * count(*)) // max(cnt1) AS BIGINT) AS p_scaled
             |  FROM bi JOIN c1 USING (w1) GROUP BY w1, w2),
             |scored AS (
             |  SELECT doc_id, count(*) AS n_bigrams, sum(p_scaled) AS score_sum
             |  FROM bi JOIN model USING (w1, w2) GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |  CAST(coalesce(score_sum, 0) AS BIGINT) AS score_sum,
             |  CAST(coalesce(score_sum, 0) AS DOUBLE)
             |    / CAST(greatest(coalesce(n_bigrams, 0), 1) AS DOUBLE) AS mean_p_scaled
             |FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id
             |ORDER BY d.doc_id""".stripMargin),
    ),
  )
}
