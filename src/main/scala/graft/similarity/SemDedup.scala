package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.{EngineQuery, Tables}

/** Semantic deduplication (SemDeDup-style): cluster the embedding
  * corpus with k-means, then prune, within each cluster, every vector
  * that has a near-identical (cosine ≥ τ) neighbor — keeping one
  * representative per semantic-duplicate group. This is the
  * embedding-space analog of MinHash near-dup removal (Abbas et al.
  * 2023, "SemDeDup"): clustering first makes the quadratic pairwise
  * step LOCAL to a cluster, never global.
  *
  * The reference engine has no embedding operators at all
  * (`/root/reference/src/main.cpp:55-92` is a k-mer pipeline); this
  * family is part of the LLM-training-data surface the engine adds on
  * top, composed entirely from pieces that are already oracle-gated:
  * [[Ann.kmeansConverged]] trains the centroids, [[Dedup.quantized]]
  * supplies the exact-integer cosine lane, and the keep rule is the
  * same smaller-id-wins greedy as `dedup_apply_keep`.
  *
  * 100 TB shape:
  *  - centroid training is broadcast Lloyd (corpus never shuffles for
  *    assignment; the only exchanges are the (cid, dim) aggregations);
  *  - the final assignment is one broadcast join + per-vector
  *    row_number, materialized ONCE (a real pipeline writes the
  *    assignment table; the single-job analog is a local checkpoint,
  *    so the three consumers below don't recompute the train loop);
  *  - the pairwise step shuffles the corpus once, by cid, and is
  *    quadratic only WITHIN a cluster — `m` is the knob that bounds
  *    cluster size (production sets m ≈ N / targetClusterSize; the
  *    paper uses ~100k clusters for LAION-scale corpora, keeping the
  *    per-cluster work constant as N grows).
  */
object SemDedup {

  /** Per-vector cluster assignment against TRAINED centroids:
    * (vec_id, cid, q, nrm), checkpointed so the caller can fan out
    * multiple consumers without re-running the Lloyd loop. All
    * intermediate checkpoints (update matrix, centroid table) are
    * released once the assignment is materialized — only the returned
    * frame's own blocks stay pinned (the caller's to consume).
    */
  private[similarity] def assignments(
      embeddings: DataFrame, m: Int, trainIter: Int): DataFrame = {
    val matrix = Ann.kmeansConverged(embeddings, m, trainIter)
    val (cents, freeCents) =
      graft.Checkpoints.localEager(Ann.rebuildCentroids(matrix))
    graft.Checkpoints.release(matrix)
    val base = Dedup.quantized(embeddings)
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
    val (mem, _) = graft.Checkpoints.localEager(
      base.crossJoin(broadcast(cents))
        .withColumn("csim",
          expr("dot_i64(q, cq)").cast("double") /
            (sqrt(col("nrm").cast("double")) * sqrt(col("cnrm").cast("double"))))
        .withColumn("crn", row_number().over(w))
        .where(col("crn") === 1)
        .select("vec_id", "cid", "q", "nrm"))
    freeCents()
    mem
  }

  /** Per-vector semantic-dedup verdict: (vec_id, cid, pruned,
    * max_prior_sim). A vector is pruned when some SAME-CLUSTER vector
    * with a smaller vec_id is cosine-≥ τ close — so exactly one
    * member of every duplicate group (its smallest id) survives, the
    * deterministic analog of the paper's keep-one-per-ε-ball.
    * `max_prior_sim` is the evidence column: the closest smaller-id
    * neighbor's similarity (NULL for each cluster's first vector).
    */
  def semDedupPrune(
      embeddings: DataFrame, m: Int = 16, trainIter: Int = 3,
      tau: Double = 0.30): DataFrame = {
    val mem = assignments(embeddings, m, trainIter)
    val b = mem.select(
      col("vec_id").as("b_id"), col("cid").as("b_cid"),
      col("q").as("b_q"), col("nrm").as("b_nrm"))
    val prior = mem
      .join(b, col("cid") === col("b_cid") && col("b_id") < col("vec_id"))
      .withColumn("sim",
        expr("dot_i64(q, b_q)").cast("double") /
          (sqrt(col("nrm").cast("double")) * sqrt(col("b_nrm").cast("double"))))
      .groupBy("vec_id")
      .agg(max(col("sim")).as("max_prior_sim"))
    mem.select("vec_id", "cid")
      .join(prior, Seq("vec_id"), "left")
      .withColumn("pruned",
        when(col("max_prior_sim") >= tau, 1L).otherwise(0L))
      .select("vec_id", "cid", "pruned", "max_prior_sim")
  }

  /** Per-cluster dedup report: (cid, n_members, n_pruned, keep_rate) —
    * the shape a curation run logs per shard. keep_rate is an exact
    * integer ratio cast to double at the end (portable).
    */
  def semDedupStats(
      embeddings: DataFrame, m: Int = 16, trainIter: Int = 3,
      tau: Double = 0.30): DataFrame =
    semDedupPrune(embeddings, m, trainIter, tau)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"), sum(col("pruned")).as("n_pruned"))
      .withColumn("keep_rate",
        (col("n_members") - col("n_pruned")).cast("double") /
          col("n_members").cast("double"))
      .select("cid", "n_members", "n_pruned", "keep_rate")

  // --------------------------------------------------------------- oracles

  /** Shared oracle text: the kmeans CTE chain, the final assignment,
    * and the smaller-id max-similarity table. τ is compared on the
    * raw double quotient — both engines parse the same decimal
    * literal to the same IEEE double and divide exactly-rounded ints,
    * so the comparison is portable (same argument as the sims the
    * gate already hashes in `embedding_neardup_pairs`).
    */
  private def duckSemDedupCtes(iters: Int, m: Int): String =
    s"""${Ann.duckKmeansCtes(iters, m)},
       |asgf AS (
       |  SELECT n.vec_id, c.cid, n.q, n.nrm,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      CAST(CAST(list_sum(list_transform(list_zip(n.q, c.cq), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
       |        / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) DESC, c.cid) AS crn
       |  FROM n CROSS JOIN centv$iters c),
       |mem AS (SELECT vec_id, cid, q, nrm FROM asgf WHERE crn = 1),
       |prior AS (
       |  SELECT a.vec_id, max(${Ann.duckSimExpr}) AS max_prior_sim
       |  FROM mem a JOIN mem b ON a.cid = b.cid AND b.vec_id < a.vec_id
       |  GROUP BY a.vec_id)""".stripMargin

  private def duckSemDedupPrune(iters: Int, m: Int, tau: Double): String =
    s"""WITH ${duckSemDedupCtes(iters, m)}
       |SELECT m.vec_id, m.cid,
       |  CASE WHEN p.max_prior_sim >= $tau THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pruned,
       |  p.max_prior_sim
       |FROM mem m LEFT JOIN prior p ON m.vec_id = p.vec_id
       |ORDER BY m.vec_id""".stripMargin

  private def duckSemDedupStats(iters: Int, m: Int, tau: Double): String =
    s"""WITH ${duckSemDedupCtes(iters, m)},
       |verdict AS (
       |  SELECT m.vec_id, m.cid,
       |    CASE WHEN p.max_prior_sim >= $tau THEN 1 ELSE 0 END AS pruned
       |  FROM mem m LEFT JOIN prior p ON m.vec_id = p.vec_id)
       |SELECT cid, count(*) AS n_members, CAST(sum(pruned) AS BIGINT) AS n_pruned,
       |  CAST(count(*) - sum(pruned) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_rate
       |FROM verdict GROUP BY cid ORDER BY cid""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "semdedup_prune",
      (s, dir) => semDedupPrune(Tables.embeddings(s, dir)).orderBy("vec_id"),
      Some(duckSemDedupPrune(iters = 3, m = 16, tau = 0.30)),
      headline = true,
    ),
    EngineQuery(
      "semdedup_stats",
      (s, dir) => semDedupStats(Tables.embeddings(s, dir)).orderBy("cid"),
      Some(duckSemDedupStats(iters = 3, m = 16, tau = 0.30)),
    ),
  )
}
