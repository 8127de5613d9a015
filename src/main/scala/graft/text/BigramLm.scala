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

  /** Word2vec-style phrase mining (Mikolov et al. 2013 §4): surface
    * bigrams whose joint frequency beats chance,
    * score = (cnt(ab) − δ) / (cnt(a)·cnt(b)), kept in exact integers as
    * score_scaled = ((cnt2 − δ)·tot·1000) div (cnta·cntb) — a monotone
    * surrogate of the PMI-ish original, so ranking (which is what
    * phrase promotion needs) is engine-exact. δ discounts rare
    * accidents; minCount > δ keeps the numerator positive.
    *
    * Scale shape: one token pass → unigram counts (vocab-scale), one
    * bigram pass → pair counts (corpus-supported), two vocab-keyed
    * equi-joins to attach cnta/cntb, single-row total broadcast, and
    * TakeOrderedAndProject for the cut. The BIGINT products are safe to
    * ~1e18; a 100 TB corpus would hoist the score into per-band log
    * space or DECIMAL(38) — the ranking, not the absolute value, is
    * the contract.
    */
  def phraseMiningPmi(docs: DataFrame, minCount: Long, discount: Long, k: Int): DataFrame = {
    val toks = graft.Partitioning.fanOut(docs)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = uni.agg(sum("cnt").cast("long").as("tot"))
    docBigrams(docs)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
      .where(col("cnt2") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("cnt").as("cnta")), "w1")
      .join(uni.select(col("tok").as("w2"), col("cnt").as("cntb")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("cnt2"),
        expr(s"(((cnt2 - $discount) * tot) * 1000) div (cnta * cntb)").as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** CCNet-style per-language perplexity bucketing (Wenzek et al. 2020
    * §4.3 buckets web text into head/middle/tail thirds by KenLM
    * perplexity PER LANGUAGE, then trains mostly on the head): the
    * fluency metric here is the self-trained bigram score,
    * m = score_sum·1000 div n_bigrams (exact integers), and the
    * per-language tercile thresholds come from the same
    * histogram-decomposed exact-rank pick as [[graft.curation.Curation.langAdaptiveCut]]
    * — the corpus pays one (lang, m) histogram aggregation, the
    * running/total windows run at value cardinality, and the ≤|langs|-row
    * threshold table broadcasts back. High fluency = head (CCNet's low
    * perplexity = head, same orientation).
    */
  def perplexityBuckets(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = fluencyScores(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumn("m", expr("(score_sum * 1000) div greatest(n_bigrams, 1)"))
    val hist = scored.groupBy("lang", "m").agg(count(lit(1)).as("c"))
    val run = Window.partitionBy("lang").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h2 = hist
      .withColumn("run", sum("c").over(run))
      .withColumn("tot", sum("c").over(Window.partitionBy("lang")))
    val t1 = h2.where(col("run") * 3 >= col("tot"))
      .groupBy("lang").agg(min("m").as("t1"))
    val t2 = h2.where(col("run") * 3 >= col("tot") * 2)
      .groupBy("lang").agg(min("m").as("t2"))
    scored
      .join(broadcast(t1), "lang").join(broadcast(t2), "lang")
      .select(col("doc_id"), col("lang"), col("m"),
        when(col("m") <= col("t1"), "tail")
          .when(col("m") <= col("t2"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** Shared oracle CTE prefix: tokens → bigrams → model → per-doc
    * fluency (the bigram_lm_fluency pipeline, reused verbatim). */
  private val duckFluencyCtes =
    s"""WITH t AS (
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
       |  FROM bi JOIN model USING (w1, w2) GROUP BY doc_id)""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "phrase_mining_pmi",
      (s, dir) =>
        phraseMiningPmi(Tables.documents(s, dir), minCount = 5, discount = 2, k = 30),
      Some("""WITH tk AS (
             |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
             |  FROM documents WHERE length(trim(text)) > 0),
             |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
             |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM uni),
             |t AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents WHERE length(trim(text)) > 0),
             |bi AS (
             |  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
             |  FROM t, unnest(generate_series(1, length(toks) - 1)) AS g(i)
             |  WHERE length(toks) >= 2),
             |pc AS (
             |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt2
             |  FROM bi GROUP BY w1, w2 HAVING count(*) >= 5)
             |SELECT pc.w1, pc.w2, pc.cnt2,
             |  (((pc.cnt2 - 2) * tt.tot) * 1000) // (a.cnt * b.cnt) AS score_scaled
             |FROM pc
             |JOIN uni a ON pc.w1 = a.tok
             |JOIN uni b ON pc.w2 = b.tok
             |CROSS JOIN tt
             |ORDER BY score_scaled DESC, pc.w1, pc.w2 LIMIT 30""".stripMargin),
    ),
    EngineQuery(
      "ccnet_perplexity_buckets",
      (s, dir) => perplexityBuckets(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""$duckFluencyCtes,
             |sm AS (
             |  SELECT d.doc_id, d.lang,
             |    (CAST(coalesce(s.score_sum, 0) AS BIGINT) * 1000)
             |      // greatest(CAST(coalesce(s.n_bigrams, 0) AS BIGINT), 1) AS m
             |  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id),
             |hist AS (SELECT lang, m, count(*) AS c FROM sm GROUP BY lang, m),
             |h2 AS (
             |  SELECT lang, m,
             |    sum(c) OVER (PARTITION BY lang ORDER BY m) AS run,
             |    sum(c) OVER (PARTITION BY lang) AS tot
             |  FROM hist),
             |t1 AS (SELECT lang, min(m) AS t1 FROM h2 WHERE run * 3 >= tot GROUP BY lang),
             |t2 AS (SELECT lang, min(m) AS t2 FROM h2 WHERE run * 3 >= tot * 2 GROUP BY lang)
             |SELECT sm.doc_id, sm.lang, sm.m,
             |  CASE WHEN sm.m <= t1.t1 THEN 'tail'
             |       WHEN sm.m <= t2.t2 THEN 'middle'
             |       ELSE 'head' END AS bucket
             |FROM sm JOIN t1 USING (lang) JOIN t2 USING (lang)
             |ORDER BY sm.doc_id""".stripMargin),
      headline = true,
    ),
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
