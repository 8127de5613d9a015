package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
  * relevance framework; the Okapi BM25 scoring function with Lucene's
  * non-negative idf = ln(1 + (N − df + 0.5)/(df + 0.5))) — the search
  * capability of an analytics engine over a document corpus: score
  * documents against query terms via an inverted-index probe, return
  * the top-k per term.
  *
  * Gate portability follows the `tfidf_top_terms` precedent
  * ([[TextAnalysis]]): the emitted relation carries the RANKING plus
  * the exact integer inputs (tf, df, dl) but NOT the raw float score —
  * ln() differs by 1 ulp between the JVM and DuckDB's libm. The
  * ranking itself is ulp-robust: each score is ONE expression chain
  * (no cross-term float summation — scoring is per query term), so
  * equal (tf, df, dl) inputs give exactly-equal scores in each engine
  * (ties broken by doc_id) and distinct inputs give scores separated
  * by far more than an ulp.
  *
  * Scale shape (the inverted-index probe): query terms broadcast into
  * a semi-join FILTER on the raw token stream, so the tf aggregation
  * shuffles ONLY query-term occurrences — never the corpus vocabulary.
  * Per-doc length (dl) is a doc_id-keyed aggregate (map-side combine,
  * ~1 row per doc); N and avgdl reduce that to one broadcast row. The
  * top-k cut is a per-term window behind `WindowGroupLimit`. The
  * full-vocabulary df aggregate here exists only because the GATE
  * derives its query terms from the corpus (top-`nTerms` by df) to
  * stay deterministic — a real search passes literal terms and skips
  * it.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Top-`k` docs per query term by BM25. Query terms = the corpus's
    * `nTerms` highest-df tokens (ties by token) unless given. */
  def bm25TopDocs(docs: DataFrame, nTerms: Int = 3, k: Int = 10): DataFrame = {
    // By-convention pin (harness frees): the token stream has THREE
    // aggregation consumers (per-doc length, the gate's df/query-term
    // derivation, and the tf probe), and without the pin each one
    // re-executed the corpus tokenize+explode subtree — AQE exchange
    // reuse dedups only the fan-out exchange below the explode, never
    // the explode itself (r19 optimization round; the r19-review
    // truth/corpus/qAll pin lesson applied here). At 100 TB this
    // trades one materialized token stream for two extra full corpus
    // tokenize passes; a real search with literal query terms skips
    // the df consumer and keeps the same shape.
    val toks = graft.Partitioning.fanOut(docs)
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .where(col("term") =!= "")
      .localCheckpoint(true)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val dfTbl = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val qterms = dfTbl.orderBy(col("df").desc, col("term")).limit(nTerms)
    val tf = toks
      .join(broadcast(qterms), Seq("term"))
      .groupBy("term", "df", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
      .withColumn("score",
        col("idf") * (col("tf").cast("double") * lit(K1 + 1.0)) /
          (col("tf").cast("double") +
            lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") *
              col("n_docs").cast("double") / col("sum_dl").cast("double"))))
    val w = Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("term"), col("rank"), col("doc_id"), col("tf"), col("df"), col("dl"))
      .orderBy("term", "rank")
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "bm25_top_docs",
      (s, dir) => bm25TopDocs(Tables.documents(s, dir)),
      Some(s"""WITH toks AS (
             |  SELECT doc_id, tok AS term FROM (
             |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
             |    FROM documents WHERE length(trim(text)) > 0)
             |  WHERE tok <> ''),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
             |corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
             |dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
             |q AS (SELECT term, df FROM dfr ORDER BY df DESC, term LIMIT 3),
             |tf AS (
             |  SELECT t.term, q.df, t.doc_id, count(*) AS tf
             |  FROM toks t JOIN q ON t.term = q.term
             |  GROUP BY 1, 2, 3),
             |scored AS (
             |  SELECT tf.term, tf.doc_id, tf.tf, tf.df, dl.dl,
             |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(tf.df AS DOUBLE) + 0.5)
             |         / (CAST(tf.df AS DOUBLE) + 0.5))
             |    * (CAST(tf.tf AS DOUBLE) * ${K1 + 1.0})
             |    / (CAST(tf.tf AS DOUBLE)
             |       + $K1 * (${1.0 - B} + $B * CAST(dl.dl AS DOUBLE)
             |           * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))) AS score
             |  FROM tf JOIN dl USING (doc_id) CROSS JOIN corpus),
             |ranked AS (
             |  SELECT term, doc_id, tf, df, dl,
             |    CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT)
             |      AS rank
             |  FROM scored)
             |SELECT term, rank, doc_id, tf, df, dl
             |FROM ranked WHERE rank <= 10
             |ORDER BY term, rank""".stripMargin),
    ),
  )
}
