package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}
import graft.dedup.Dedup

/** Greedy k-center coreset selection (Gonzalez' farthest-point
  * traversal; the 2-approximation behind coreset selection for
  * data-efficient training, Sener & Savarese 2018) over the embedding
  * table — the geometric complement of [[graft.curation.MaxCover]]'s
  * set-coverage greedy: each step picks the point FARTHEST from its
  * nearest already-picked center, so the k picks spread across the
  * embedding space instead of piling onto the densest mode.
  *
  * Distances are squared Euclidean over the shared floor(x*1000)
  * integer quantization ([[Dedup.quantized]]): d² = ‖a‖² + ‖b‖² −
  * 2·a·b with every term an exact int64 (64 dims × 2000² ≈ 2.6e8 per
  * component bound), so the greedy trajectory — argmax with ties
  * broken (d² DESC, vec_id ASC), seeded at the minimum vec_id — is
  * bit-identical in any engine and the unrolled k-step DuckDB oracle
  * replays it exactly. No cosine division, no IEEE drift.
  *
  * Execution follows the audited BPE/MaxCover loop discipline: the
  * quantized relation is pinned once (checkpoint-released at exit);
  * each of the k−1 rounds broadcasts the ≤k picked centers against
  * one pass of the corpus — a map-side nearest-center min, a single
  * aggregate, ONE argmax row to the driver. No per-point state grows
  * with n; centers live driver-side bounded by k (a selection
  * budget). At 100 TB the per-round cost is one scan + one exchange
  * of (vec_id, min-d²) pairs, and k stays small by construction.
  */
object KCenter {

  val K = 4

  /** Greedy pick trajectory: (step 1..k, vec_id, d2) where d2 is the
    * squared distance to the nearest earlier center at pick time
    * (0 for the seed). Stops early if the corpus has < k points.
    */
  def select(embeddings: DataFrame, k: Int = K): DataFrame = {
    require(k >= 1, s"need a positive selection budget, got $k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (base, release) = graft.Checkpoints.localEager(Dedup.quantized(embeddings))
    val picks = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    val seed = base.orderBy("vec_id").limit(1).select("vec_id").collect()
    if (seed.nonEmpty) {
      picks += ((1L, seed(0).getLong(0), 0L))
      var step = 2L
      var done = false
      while (!done && step <= k) {
        val pickedIds = picks.map(_._2)
        val centers = base.where(col("vec_id").isInCollection(pickedIds))
          .select(col("q").as("cq"), col("nrm").as("cn"))
        val top = base.where(!col("vec_id").isInCollection(pickedIds))
          .crossJoin(broadcast(centers))
          .withColumn("d2", col("nrm") + col("cn") - lit(2L) * expr("dot_i64(q, cq)"))
          .groupBy("vec_id").agg(min(col("d2")).as("d2"))
          .orderBy(col("d2").desc, col("vec_id"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          picks += ((step, top(0).getLong(0), top(0).getLong(1)))
          step += 1
        }
      }
    }
    release()
    picks.toSeq.toDF("step", "vec_id", "d2")
  }

  /** Unrolled k-step farthest-point greedy in nested CTEs — the
    * centers accumulate as a UNION of single-row picks, structurally
    * independent of the engine's broadcast loop.
    */
  private def duckKCenterSql(k: Int): String = {
    val d2 =
      "CAST(list_sum(list_transform(list_zip(x.q, c.q), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
    val ctes = scala.collection.mutable.ListBuffer(
      """qx AS (SELECT vec_id,
         |  list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings)""".stripMargin,
      "p1 AS (SELECT vec_id, q, CAST(0 AS BIGINT) AS md FROM qx ORDER BY vec_id LIMIT 1)")
    for (s <- 2 to k) {
      val centers = (1 until s).map(j => s"SELECT vec_id, q FROM p$j").mkString(" UNION ALL ")
      ctes += s"""m$s AS (SELECT x.vec_id, min($d2) AS md
                 |  FROM qx x, ($centers) c
                 |  WHERE x.vec_id NOT IN (${(1 until s).map(j => s"SELECT vec_id FROM p$j").mkString(" UNION ALL ")})
                 |  GROUP BY 1)""".stripMargin
      ctes += s"p$s AS (SELECT m$s.vec_id, qx.q, md FROM m$s JOIN qx USING (vec_id) ORDER BY md DESC, m$s.vec_id LIMIT 1)"
    }
    "WITH " + ctes.mkString(",\n") + "\n" +
      (1 to k).map(s => s"SELECT CAST($s AS BIGINT) AS step, vec_id, md AS d2 FROM p$s")
        .mkString(" UNION ALL ") +
      " ORDER BY step"
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "kcenter_select",
      (s, dir) => select(Tables.embeddings(s, dir)).orderBy("step"),
      Some(duckKCenterSql(K)),
    ),
  )
}
