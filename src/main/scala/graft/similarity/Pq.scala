package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}
import graft.dedup.Dedup

/** Product quantization with asymmetric distance computation — PQ/ADC
  * (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
  * Neighbor Search"): split each D-dim vector into S subvectors,
  * quantize every subvector to its nearest entry in a per-subspace
  * codebook of C entries, and approximate a query-to-vector distance
  * as the SUM over subspaces of precomputed query-to-codeword
  * distances (a table lookup per subspace — no per-vector float math
  * at scan time).
  *
  * Why this matters at 100 TB: a 64-dim float corpus costs 256 B per
  * vector to scan; PQ codes cost S·log2(C) bits (4 B here — 64×
  * smaller), and the scan's inner loop becomes integer adds over a
  * broadcast S×C distance table. This is the memory-bound regime
  * every billion-vector ANN system (FAISS IVF-PQ) lives in. Composing
  * with this engine's IVF ([[Ann.ivfTopK]] inverted lists to restrict
  * WHICH codes are scanned) yields classic IVF-PQ; the PQ/ADC half is
  * the piece the engine was missing.
  *
  * Determinism/portability: everything runs on the engine's
  * floor(x·1000) integer quantization ([[Dedup.quantized]]), so code
  * assignment (argmin of exact integer squared L2, ties to the lowest
  * code id) and ADC distances are EXACT BIGINTs — the DuckDB oracle
  * reproduces them bit-for-bit, no float tolerance anywhere. The
  * codebook is the subvectors of the first C corpus vectors
  * (deterministic seed, like [[Ann.ivfTopK]]'s centroids; production
  * trains per-subspace k-means — the index/scan structure is
  * unchanged).
  *
  * Plan shape: codebook (S·C rows) broadcasts; corpus code assignment
  * is one explode(×S) + broadcast join + per-(vec, subspace) min-struct
  * aggregate — the only wide op keyed (vec_id, s), bounded S rows per
  * vector. ADC joins corpus codes to the broadcast query distance
  * table and sums S integers per (query, vector) pair.
  */
object Pq {

  val SubSpaces = 4
  val SubDim: Int = Dedup.Dim / SubSpaces
  val Codes = 16

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** (id, s, sub): the S quantized subvectors of each vector. */
  private def subVectors(quantized: DataFrame, idCol: String): DataFrame =
    quantized.select(
      col("vec_id").as(idCol),
      explode(array((0 until SubSpaces).map(s =>
        struct(lit(s).as("s"), slice(col("q"), s * SubDim + 1, SubDim).as("sub"))): _*)).as("e"))
      .select(col(idCol), col("e.s").as("s"), col("e.sub").as("sub"))

  /** Per-(id, s, codebook entry) exact squared L2 — shared by corpus
    * assignment and the query distance table. */
  private def distTable(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), Seq("s"))
      .select(subs.columns.head, "s", "c", "sub", "cbv")
      .withColumn("d", sqDist(col("sub"), col("cbv")))

  /** Top-`k` per query by ADC distance over PQ codes. */
  def pqAdcTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = Dedup.quantized(embeddings)
    val cb = subVectors(corpus.where(col("vec_id") < Codes), "c")
      .select(col("s"), col("c"), col("sub").as("cbv"))
    // corpus code assignment: argmin_c d(sub, cb[s][c]), ties -> min c
    val codes = distTable(subVectors(corpus, "n_id"), cb)
      .groupBy("n_id", "s")
      .agg(min(struct(col("d"), col("c"))).as("m"))
      .select(col("n_id"), col("s"), col("m.c").as("c"))
    // query ADC table: d(q_sub, cb[s][c]) for all (s, c)
    val qtab = distTable(subVectors(Dedup.quantized(queries), "q_id"), cb)
      .select(col("q_id"), col("s"), col("c"), col("d"))
    val adc = codes.join(broadcast(qtab), Seq("s", "c"))
      .where(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg(sum(col("d")).as("approx_dist"))
    val w = Window.partitionBy("q_id").orderBy(col("approx_dist").asc, col("n_id"))
    adc.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("q_id", "rank", "n_id", "approx_dist")
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "ann_pq_adc_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        pqAdcTopK(emb, emb.where(col("vec_id") < 10), 5).orderBy("q_id", "rank")
      },
      Some(s"""WITH qx AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
             |  FROM embeddings),
             |sgen AS (SELECT unnest(generate_series(0, ${SubSpaces - 1})) AS s),
             |subs AS (
             |  SELECT vec_id, s, q[s * $SubDim + 1 : s * $SubDim + $SubDim] AS sub
             |  FROM qx, sgen),
             |cb AS (SELECT s, vec_id AS c, sub AS cbv FROM subs WHERE vec_id < $Codes),
             |dists AS (
             |  SELECT subs.vec_id, subs.s, cb.c,
             |    CAST(list_sum(list_transform(list_zip(sub, cbv),
             |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d
             |  FROM subs JOIN cb ON subs.s = cb.s),
             |codes AS (
             |  SELECT vec_id AS n_id, s, c FROM dists
             |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) = 1),
             |qtab AS (SELECT vec_id AS q_id, s, c, d FROM dists WHERE vec_id < 10),
             |adc AS (
             |  SELECT q_id, n_id, sum(d) AS approx_dist
             |  FROM codes JOIN qtab USING (s, c)
             |  WHERE q_id <> n_id GROUP BY 1, 2),
             |ranked AS (
             |  SELECT q_id, n_id, approx_dist,
             |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY approx_dist, n_id) AS BIGINT) AS rank
             |  FROM adc)
             |SELECT q_id, rank, n_id, CAST(approx_dist AS BIGINT) AS approx_dist
             |FROM ranked WHERE rank <= 5
             |ORDER BY q_id, rank""".stripMargin),
    ),
  )
}
