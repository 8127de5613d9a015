package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** n-gram struct stream from a token-array column, as the CODEGEN'D
    * `arrays_zip` of n shifted `slice`s (r20 optimization round): the
    * former `transform(sequence(…), i -> struct(element_at…))`
    * formulation interpreted its lambda per position (higher-order
    * functions are CodegenFallback), and the n-gram explode is the
    * per-row CPU of every LM pass — the trigram path pays it twice
    * (model + scoring). Same rows bit-for-bit: slice j (1-based start
    * j, length L−n+1) zipped across j = 1..n is exactly the sliding
    * window, and `arrays_zip` of equal-length arrays pads nothing.
    * ~2.5× on a 2M-trigram microbench; differential row-identity in
    * BigramLmSpec.
    */
  private[text] def ngramZip(toks: Column, n: Int, names: Seq[String]): Column =
    explode(arrays_zip(
      names.zipWithIndex.map { case (nm, j) =>
        slice(toks, lit(j + 1), size(toks) - (n - 1)).as(nm)
      }: _*))

  /** (doc_id, w1, w2) one row per bigram OCCURRENCE. */
  private def docBigrams(docs: DataFrame): DataFrame =
    graft.Partitioning.fanOut(docs)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("__toks"))
      .where(size(col("__toks")) >= 2 && col("__toks").getItem(0) =!= "")
      .select(col("doc_id"), ngramZip(col("__toks"), 2, Seq("w1", "w2")).as("b"))
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
    // By-convention pin (harness frees; r19 optimization round): the
    // scored relation feeds the per-language histogram chain AND the
    // final bucket-assignment join — unpinned, each consumer re-ran the
    // fluency pipeline (bigram stream + model train + score join)
    // beneath it, with only the model-aggregate exchanges deduped by
    // reuse. The pin is doc-cardinality (one row per doc). Paired sf0.1
    // A/B (three runs each): 3.27/2.55/2.60s → 3.15/2.12/2.05s.
    val scored = fluencyScores(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumn("m", expr("(score_sum * 1000) div greatest(n_bigrams, 1)"))
      .localCheckpoint(true)
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

  /** Trigram-LM pruning threshold: n-grams below this count are dropped
    * from the model (KenLM-style singleton pruning) — which is exactly
    * what makes BACKOFF meaningful on a self-trained model (unpruned,
    * every trigram the corpus contains would hit the trigram branch).
    */
  val TriMinCount = 2L

  /** Stupid-backoff weights as exact integer scales: α = 0.4 per backoff
    * level (Brants et al. 2007 §3), so the three tiers contribute
    * floor(10⁶·cnt₃/ctx₁₂), floor(4·10⁵·cnt₂/ctx₂), and
    * floor(1.6·10⁵·cnt₁/N) respectively — no float until the final mean.
    */
  val BiBackoffScale = 400000L
  val UniBackoffScale = 160000L


  /** Tokenized corpus rows (doc_id, __toks); `fanOut = false` for
    * streaming inputs (no repartition on an unbounded source).
    */
  private def tokenArrays(docs: DataFrame, fanOut: Boolean = true): DataFrame =
    (if (fanOut) graft.Partitioning.fanOut(docs) else docs)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("__toks"))
      .where(size(col("__toks")) >= 1 && col("__toks").getItem(0) =!= "")

  private def ngramsOf(tokArr: DataFrame, n: Int, names: Seq[String]): DataFrame =
    tokArr.where(size(col("__toks")) >= n)
      .select(col("doc_id"), ngramZip(col("__toks"), n, names).as("g"))
      .select(col("doc_id") +: names.map(nm => col(s"g.$nm").as(nm)): _*)

  /** The trained backoff model relations (pruned tri/bi, unigram) plus
    * the collected token total (ONE bounded 1-row collect — the lane
    * every scorer shares, batch and streaming alike).
    */
  private[text] case class BackoffModels(tri: DataFrame, bi: DataFrame, uni: DataFrame, tot: Long)

  private def backoffModels(tokArr: DataFrame): BackoffModels = {
    val d38 = "DECIMAL(38,0)"
    val toks = tokArr.select(explode(col("__toks")).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cnt1"))
    // coalesce: sum over ZERO rows (empty/all-blank corpus) is null —
    // getLong on it throws; an empty model should train to tot=0, not
    // crash (the scorer guards its division below).
    val tot = uni.agg(coalesce(sum("cnt1"), lit(0L)).cast("long").as("tot"))
      .collect()(0).getLong(0)
    val bi = ngramsOf(tokArr, 2, Seq("w1", "w2"))
    val tri = ngramsOf(tokArr, 3, Seq("w1", "w2", "w3"))
    // ONE bigram aggregate serves both roles: raw context denominators
    // (pruning drops estimates, not evidence) and the pruned bi model.
    val cnt2Raw = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
    val triModel = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt3"))
      .where(col("cnt3") >= TriMinCount)
      .join(cnt2Raw.withColumnRenamed("cnt2", "ctx12"), Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        expr(s"CAST((CAST($Scale AS $d38) * cnt3) div ctx12 AS BIGINT)").as("p3"))
    val biModel = cnt2Raw
      .where(col("cnt2") >= TriMinCount)
      .join(uni.select(col("tok").as("w1"), col("cnt1").as("ctx2")), "w1")
      .select(col("w1").as("bw2"), col("w2").as("bw3"),
        expr(s"CAST((CAST($BiBackoffScale AS $d38) * cnt2) div ctx2 AS BIGINT)").as("p2"))
    BackoffModels(triModel, biModel, uni, tot)
  }

  /** The ONE scoring expression both the batch gate and the streaming
    * twin execute (shared so the two cannot drift): per trigram
    * occurrence, the highest-order surviving estimate and its tier.
    */
  private def scoreTrigramsWith(tri: DataFrame, m: BackoffModels): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    tri
      .join(m.tri, Seq("w1", "w2", "w3"), "left_outer")
      .join(m.bi.withColumnRenamed("bw2", "w2").withColumnRenamed("bw3", "w3"),
        Seq("w2", "w3"), "left_outer")
      .join(m.uni.select(col("tok").as("w3"), col("cnt1").as("cnt1u")), Seq("w3"))
      .select(col("doc_id"),
        coalesce(col("p3"), col("p2"),
          // max(tot, 1): an empty-corpus model carries tot=0, and the
          // unigram tier must degrade to a zero estimate, never a
          // divide-by-zero (the greatest(n_docs, 1) discipline).
          expr(s"CAST((CAST($UniBackoffScale AS $d38) * cnt1u) div ${math.max(m.tot, 1L)} AS BIGINT)")).as("p"),
        when(col("p3").isNotNull, 3L).when(col("p2").isNotNull, 2L).otherwise(1L).as("tier"))
  }

  /** Trigram fluency with stupid backoff — what CCNet's KenLM filter
    * actually runs, minus the external model file: a PRUNED trigram
    * model (cnt ≥ [[TriMinCount]]) self-trained on the corpus, scoring
    * each trigram occurrence by the highest-order surviving estimate —
    * trigram → α·bigram → α²·unigram. Per doc: occurrence count, the
    * exact BIGINT score sum, per-tier hit counts (the backoff-rate
    * observability a pruning decision needs), and the one IEEE mean.
    *
    * Exactness: every tier is an integer division of exact counts; the
    * 10⁶-scale products run in DECIMAL(38,0) (a 100 TB corpus's hot
    * trigram count × 10⁶ can exceed BIGINT), mirrored HUGEINT in the
    * oracle.
    *
    * Scale shape: one corpus pass per n-gram order (three partial+final
    * count aggregations, each corpus-supported); scoring is three
    * hash equi-joins (two LEFT, precedence by coalesce; the token total
    * rides as a collected literal — one bounded 1-row collect) + a
    * doc-keyed rollup. No driver loop, no
    * windows, nothing vocabulary-collected.
    */
  def trigramBackoffScores(docs: DataFrame): DataFrame = {
    // ONE scan+tokenize pass, pinned: five consumers derive from the
    // token arrays (unigram/bigram/trigram counts + the scoring
    // stream) — unpinned, each would re-read and re-split the corpus
    // (the first cut of this operator paid 8 parquet scans). A
    // by-convention pin the harness frees: Bench and Verify unpersist
    // all persistent RDDs after each query.
    val tokArr = tokenArrays(docs).localCheckpoint(true)
    val m = backoffModels(tokArr)
    val scored = scoreTrigramsWith(ngramsOf(tokArr, 3, Seq("w1", "w2", "w3")), m)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(col("p")).as("score_sum"),
        sum(when(col("tier") === 3L, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("tier") === 2L, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("tier") === 1L, 1L).otherwise(0L)).as("n_uni"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("score_sum"), lit(0L)).as("score_sum"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"))
      .withColumn("mean_p_scaled",
        col("score_sum").cast("double") /
          greatest(col("n_trigrams"), lit(1L)).cast("double"))
  }

  private var trigramSinkCounter = 0

  /** Streaming twin of the trigram tiers: the model trains batch-side
    * (same [[backoffModels]] over the same pinned tokenize pass), each
    * model relation pins eagerly, and the document STREAM's trigram
    * occurrences score through the SAME [[scoreTrigramsWith]] as
    * stream-static equi-joins — then a complete-mode per-TIER aggregate
    * maintains exactly three rows of state at any stream volume
    * (a per-doc rollup would grow state with the corpus). Draining the
    * finite gate corpus must equal the batch scorer's tier totals —
    * integer sums, order-free.
    */
  def runStreamingTrigramTiers(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val tokArr = tokenArrays(docs).localCheckpoint(true)
    val m0 = backoffModels(tokArr)
    // pin the model relations, then free the corpus-scale tokenize pin —
    // the stream must never re-derive through the released lineage
    val m = BackoffModels(
      m0.tri.localCheckpoint(true), m0.bi.localCheckpoint(true),
      m0.uni.localCheckpoint(true), m0.tot)
    graft.Checkpoints.release(tokArr)
    val src = graft.sources.StreamingSources.docSource(spark, sfDir)
    val agg = scoreTrigramsWith(
        ngramsOf(tokenArrays(src, fanOut = false), 3, Seq("w1", "w2", "w3")), m)
      .groupBy("tier")
      .agg(count(lit(1)).as("n_occurrences"), sum(col("p")).as("score_sum"))
    val qn = synchronized { trigramSinkCounter += 1; s"graft_trigram_sink_$trigramSinkCounter" }
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn).select("tier", "n_occurrences", "score_sum")
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

  /** Shared trigram-oracle prefix: tokens, models, and the per-
    * occurrence scored stream `sc` (tier + p) — the batch gate and
    * the streaming twin aggregate the SAME relation. */
  private val duckTrigramScored: String =
    s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
             |  FROM documents WHERE length(trim(text)) > 0),
             |tk AS (SELECT unnest(toks) AS tok FROM t),
             |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt1 FROM tk GROUP BY tok),
             |tt AS (SELECT CAST(sum(cnt1) AS BIGINT) AS tot FROM uni),
             |bi AS (
             |  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
             |  FROM t, unnest(generate_series(1, length(toks) - 1)) AS g(i)
             |  WHERE length(toks) >= 2),
             |tri AS (
             |  SELECT doc_id, toks[CAST(i AS INT)] AS w1,
             |    toks[CAST(i + 1 AS INT)] AS w2, toks[CAST(i + 2 AS INT)] AS w3
             |  FROM t, unnest(generate_series(1, length(toks) - 2)) AS g(i)
             |  WHERE length(toks) >= 3),
             |ctx12 AS (SELECT w1, w2, count(*) AS ctx12 FROM bi GROUP BY w1, w2),
             |trim3 AS (
             |  SELECT w1, w2, w3,
             |    CAST((CAST($Scale AS HUGEINT) * cnt3) // ctx12 AS BIGINT) AS p3
             |  FROM (SELECT w1, w2, w3, count(*) AS cnt3 FROM tri GROUP BY w1, w2, w3
             |        HAVING count(*) >= $TriMinCount) m
             |  JOIN ctx12 USING (w1, w2)),
             |bim AS (
             |  SELECT m.w1 AS bw2, m.w2 AS bw3,
             |    CAST((CAST($BiBackoffScale AS HUGEINT) * cnt2) // u.cnt1 AS BIGINT) AS p2
             |  FROM (SELECT w1, w2, count(*) AS cnt2 FROM bi GROUP BY w1, w2
             |        HAVING count(*) >= $TriMinCount) m
             |  JOIN uni u ON m.w1 = u.tok),
             |sc AS (
             |  SELECT tri.doc_id,
             |    coalesce(trim3.p3, bim.p2,
             |      CAST((CAST($UniBackoffScale AS HUGEINT) * u.cnt1) // tt.tot AS BIGINT)) AS p,
             |    CASE WHEN trim3.p3 IS NOT NULL THEN 3
             |         WHEN bim.p2 IS NOT NULL THEN 2 ELSE 1 END AS tier
             |  FROM tri
             |  LEFT JOIN trim3 USING (w1, w2, w3)
             |  LEFT JOIN bim ON tri.w2 = bim.bw2 AND tri.w3 = bim.bw3
             |  JOIN uni u ON tri.w3 = u.tok
             |  CROSS JOIN tt)"""
      .stripMargin

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
      "trigram_backoff_fluency",
      (s, dir) => trigramBackoffScores(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""$duckTrigramScored,
             |scored AS (
             |  SELECT doc_id, count(*) AS n_trigrams, sum(p) AS score_sum,
             |    sum(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS n_tri,
             |    sum(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS n_bi,
             |    sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS n_uni
             |  FROM sc GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_trigrams, 0) AS BIGINT) AS n_trigrams,
             |  CAST(coalesce(score_sum, 0) AS BIGINT) AS score_sum,
             |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
             |  CAST(coalesce(n_bi, 0) AS BIGINT) AS n_bi,
             |  CAST(coalesce(n_uni, 0) AS BIGINT) AS n_uni,
             |  CAST(coalesce(score_sum, 0) AS DOUBLE)
             |    / CAST(greatest(coalesce(n_trigrams, 0), 1) AS DOUBLE) AS mean_p_scaled
             |FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id
             |ORDER BY d.doc_id""".stripMargin),
      headline = true,
    ),
    EngineQuery(
      "streaming_trigram_tiers",
      (s, dir) => runStreamingTrigramTiers(s, dir).orderBy("tier"),
      Some(s"""$duckTrigramScored
             |SELECT CAST(tier AS BIGINT) AS tier,
             |  CAST(count(*) AS BIGINT) AS n_occurrences,
             |  CAST(sum(p) AS BIGINT) AS score_sum
             |FROM sc GROUP BY tier ORDER BY tier""".stripMargin),
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
