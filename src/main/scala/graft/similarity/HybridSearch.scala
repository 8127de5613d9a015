package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al.) of a
  * lexical BM25 ranking and a vector cosine top-k over the SAME
  * document ids — the standard two-tower search stack (sparse +
  * dense) fused without score calibration. RRF needs only ranks:
  * score(d) = Σ_lists 1/(C + rank_d), C = 60.
  *
  * Exactness/portability: the fused score uses integer reciprocals
  * (10⁹ div (60 + rank)) — ranks are the only inputs, so both engines
  * agree bit-for-bit even though each underlying ranking used
  * (ulp-robust, per-row) float scoring. Missing-from-a-list
  * contributes 0, exactly as RRF prescribes.
  *
  * Scale notes: both input rankings are already top-k cut (bounded
  * relations), so the fusion join/sort costs k, not the corpus; the
  * corpus-scale work lives in the audited BM25 probe
  * ([[graft.text.Bm25]]) and ANN ([[Ann]]) plans. At 100 TB the
  * brute-force vector side swaps for the LSH/IVF variants — the
  * fusion is ranking-agnostic by construction.
  */
object HybridSearch {

  private val C = 60L
  private val Scale = 1000000000L

  /** Fuse the top-`depth` BM25 docs (single highest-df query term)
    * with the top-`depth` cosine neighbors of query vector 0; return
    * the top-`k` fused docs. Absent ranks surface as 0.
    */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame, depth: Int, k: Int): DataFrame = {
    val lex = graft.text.Bm25.bm25TopDocs(docs, nTerms = 1, k = depth)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val vec = Ann.bruteForceTopK(embeddings, embeddings.where(col("vec_id") === 0), depth)
      .select(col("n_id").as("doc_id"), col("rank").as("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_scaled",
        when(col("lex_rank") > 0, expr(s"$Scale div ($C + lex_rank)")).otherwise(0L)
          + when(col("vec_rank") > 0, expr(s"$Scale div ($C + vec_rank)")).otherwise(0L))
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
      .limit(k)
  }

  private def oracle(depth: Int, k: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, tok AS term FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |    FROM documents WHERE length(trim(text)) > 0)
       |  WHERE tok <> ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
       |dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
       |q AS (SELECT term, df FROM dfr ORDER BY df DESC, term LIMIT 1),
       |tf AS (
       |  SELECT t.term, q.df, t.doc_id, count(*) AS tf
       |  FROM toks t JOIN q ON t.term = q.term
       |  GROUP BY 1, 2, 3),
       |lexscored AS (
       |  SELECT tf.doc_id,
       |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(tf.df AS DOUBLE) + 0.5)
       |         / (CAST(tf.df AS DOUBLE) + 0.5))
       |    * (CAST(tf.tf AS DOUBLE) * ${graft.text.Bm25.K1 + 1.0})
       |    / (CAST(tf.tf AS DOUBLE)
       |       + ${graft.text.Bm25.K1} * (${1.0 - graft.text.Bm25.B}
       |           + ${graft.text.Bm25.B} * CAST(dl.dl AS DOUBLE)
       |           * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))) AS score
       |  FROM tf JOIN dl USING (doc_id) CROSS JOIN corpus),
       |lex AS (
       |  SELECT doc_id, rnk AS lex_rank FROM (
       |    SELECT doc_id,
       |      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
       |    FROM lexscored)
       |  WHERE rnk <= $depth),
       |n AS (
       |  SELECT vec_id, q, CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS nrm
       |  FROM (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |    FROM embeddings)),
       |vecscored AS (
       |  SELECT b.vec_id AS doc_id,
       |    CAST(CAST(list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS sim
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id WHERE a.vec_id = 0),
       |vec AS (
       |  SELECT doc_id, rnk AS vec_rank FROM (
       |    SELECT doc_id,
       |      CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS rnk
       |    FROM vecscored)
       |  WHERE rnk <= $depth),
       |fused AS (
       |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       |    COALESCE(lex_rank, 0) AS lex_rank,
       |    COALESCE(vec_rank, 0) AS vec_rank
       |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
       |SELECT doc_id, lex_rank, vec_rank,
       |  CAST(CASE WHEN lex_rank > 0 THEN $Scale // ($C + lex_rank) ELSE 0 END
       |     + CASE WHEN vec_rank > 0 THEN $Scale // ($C + vec_rank) ELSE 0 END AS BIGINT)
       |    AS rrf_scaled
       |FROM fused ORDER BY rrf_scaled DESC, doc_id LIMIT $k""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "hybrid_search_rrf",
      (s, dir) => hybridRrf(Tables.documents(s, dir), Tables.embeddings(s, dir), depth = 20, k = 10),
      Some(oracle(depth = 20, k = 10)),
      headline = true,
    ),
  )
}
