package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}
import graft.dedup.Dedup

/** Grid-blocked DBSCAN (Ester et al. 1996) over a deterministic 2-D
  * integer projection of the embedding space — the practitioner's
  * project-then-density-cluster pipeline (UMAP→DBSCAN) with the
  * learned projection replaced by an exact ±1 Johnson–Lindenstrauss
  * projection so every engine computes the identical space.
  *
  * Density clustering complements the engine's existing clustering
  * members: k-means ([[Ann.kmeansSteps]]) needs k and carves convex
  * cells; SemDedup prunes within k-means cells; DBSCAN discovers
  * cluster COUNT and shape from density and labels sparse points as
  * noise — the outlier-robust member.
  *
  * Exact semantics in the projected space: p = (dot(q, r₁), dot(q, r₂))
  * with q the floor(x·1000) quantization and r ±1 planes from
  * [[Dedup.hyperplanes]]; neighbor = squared L2 distance ≤ eps² in
  * BIGINT; core = |N_eps incl. self| ≥ minPts; clusters = connected
  * components of the core-core graph (min-label, loud
  * non-convergence); border points adopt the MINIMUM cluster label
  * among their core neighbors (deterministic tie rule); noise = −1.
  * No floats anywhere.
  *
  * Scale shape (100 TB): candidate pairs come from a 3×3
  * adjacent-cell equi-join on the eps-width grid — in 2-D, cell width
  * = eps makes adjacent cells a COMPLETE neighbor superset, so
  * correctness never depends on data distribution while the join
  * cost tracks occupied-cell density, not corpus². (Grid blocking is
  * exactly why DBSCAN runs in the projected space: in the raw 64-dim
  * space a complete ±1-projection grid needs width 8·eps per the
  * Cauchy–Schwarz bound and degenerates to all-pairs on isotropic
  * data.) The grid join, neighbor counts, and CC iterations all key
  * on cell/node — no corpus-scale sort, no driver state.
  */
object Dbscan {

  val Eps = 250L
  val MinPts = 4
  private val Eps2 = Eps * Eps
  private val CellW = Eps
  private val Pos = 1L << 30 // shift projections positive before DIV
  private val M = 1L << 23   // cell-key packing stride

  private def planeLit(j: Int): String = {
    val arr = Dedup.hyperplanes(2)(j).mkString(",")
    s"CAST(array($arr) AS ARRAY<BIGINT>)"
  }

  /** (vec_id, p1, p2, cx, cy) — the projected, grid-addressed points. */
  def projected(embeddings: DataFrame): DataFrame =
    Dedup.quantized(embeddings)
      .select(
        col("vec_id"),
        expr(s"dot_i64(q, ${planeLit(0)})").as("p1"),
        expr(s"dot_i64(q, ${planeLit(1)})").as("p2"))
      // Bounds guard on the cell-key packing below (cell = cx*M + cy):
      // a projection outside ±Pos (embedding magnitude ≳16k after the
      // ×1000 quantization) or a cell index ≥ M would alias or go
      // negative and silently DROP neighbor pairs — raise instead.
      // greatest/least keep the guard one codegen'd branch per row.
      .withColumn("cx", expr(
        s"""IF(p1 >= -$Pos AND p1 < ${(M - 1) * CellW - Pos},
           |   (p1 + $Pos) DIV $CellW,
           |   CAST(raise_error(concat('dbscan: projection p1 out of grid range: ',
           |        CAST(p1 AS STRING))) AS BIGINT))""".stripMargin))
      .withColumn("cy", expr(
        s"""IF(p2 >= -$Pos AND p2 < ${(M - 1) * CellW - Pos},
           |   (p2 + $Pos) DIV $CellW,
           |   CAST(raise_error(concat('dbscan: projection p2 out of grid range: ',
           |        CAST(p2 AS STRING))) AS BIGINT))""".stripMargin))

  /** Directed neighbor pairs (vec_a ≠ vec_b, dist² ≤ eps²) via the
    * 3×3 adjacent-cell join — each pair matches on exactly one cell
    * offset, so no distinct is needed.
    */
  def neighborPairs(embeddings: DataFrame): DataFrame = {
    val p = projected(embeddings)
    val a = p.select(
      col("vec_id").as("vec_a"), col("p1").as("pa1"), col("p2").as("pa2"),
      (col("cx") * M + col("cy")).as("cell"))
    val b = p
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(
        col("vec_id").as("vec_b"), col("p1").as("pb1"), col("p2").as("pb2"),
        ((col("cx") + col("dx")) * M + (col("cy") + col("dy"))).as("cell"))
    a.join(b, Seq("cell"))
      .where(col("vec_a") =!= col("vec_b"))
      .where(
        (col("pa1") - col("pb1")) * (col("pa1") - col("pb1")) +
          (col("pa2") - col("pb2")) * (col("pa2") - col("pb2")) <= Eps2)
      .select("vec_a", "vec_b")
  }

  /** Full labeling: (vec_id, n_eps incl. self, is_core, cluster;
    * noise = −1).
    */
  def cluster(embeddings: DataFrame): DataFrame = {
    val nb = neighborPairs(embeddings)
    val counts = nb.groupBy(col("vec_a").as("vec_id"))
      .agg(count(lit(1)).as("n_nbr"))
    val pts = embeddings.select("vec_id")
      .join(counts, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), (coalesce(col("n_nbr"), lit(0L)) + 1).as("n_eps"))
      .withColumn("is_core", col("n_eps") >= MinPts)
    val cores = pts.where(col("is_core")).select("vec_id")
    val coreEdges = nb
      .join(cores.withColumnRenamed("vec_id", "vec_a"), Seq("vec_a"))
      .join(cores.withColumnRenamed("vec_id", "vec_b"), Seq("vec_b"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    // density graphs can be chainy (unlike near-dup quasi-cliques):
    // give min-label propagation diameter headroom, still fail-loud
    val cc = Dedup.connectedComponents(coreEdges, maxIter = 100)
      .select(col("doc_id").as("vec_id"), col("component"))
    val coreCluster = cores
      .join(cc, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("cluster"))
    val borderCluster = nb
      .join(coreCluster.withColumnRenamed("vec_id", "vec_b"), Seq("vec_b"))
      .groupBy(col("vec_a").as("vec_id"))
      .agg(min(col("cluster")).as("b_cluster"))
    pts
      .join(coreCluster, Seq("vec_id"), "left_outer")
      .join(borderCluster, Seq("vec_id"), "left_outer")
      .select(
        col("vec_id"), col("n_eps"), col("is_core"),
        when(col("is_core"), col("cluster"))
          .otherwise(coalesce(col("b_cluster"), lit(-1L))).as("cluster"))
  }

  private def duckProjCtes: String =
    s"""q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |p AS (
       |  SELECT vec_id,
       |    CAST(list_sum(list_transform(list_zip(q, [${Dedup.hyperplanes(2)(0).mkString(",")}]), x -> x[1] * x[2])) AS BIGINT) AS p1,
       |    CAST(list_sum(list_transform(list_zip(q, [${Dedup.hyperplanes(2)(1).mkString(",")}]), x -> x[1] * x[2])) AS BIGINT) AS p2
       |  FROM q),
       |nb AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM p a JOIN p b ON a.vec_id <> b.vec_id
       |    AND (a.p1 - b.p1) * (a.p1 - b.p1) + (a.p2 - b.p2) * (a.p2 - b.p2) <= $Eps2),
       |cnt AS (
       |  SELECT e.vec_id, CAST(coalesce(n.c, 0) + 1 AS BIGINT) AS n_eps
       |  FROM embeddings e
       |  LEFT JOIN (SELECT va, count(*) AS c FROM nb GROUP BY va) n ON e.vec_id = n.va),
       |core AS (SELECT vec_id FROM cnt WHERE n_eps >= $MinPts),
       |ce AS (
       |  SELECT va, vb FROM nb
       |  WHERE va IN (SELECT vec_id FROM core) AND vb IN (SELECT vec_id FROM core)),
       |reach(a, b) AS (
       |  SELECT va, vb FROM ce
       |  UNION
       |  SELECT r.a, c.vb FROM reach r JOIN ce c ON r.b = c.va WHERE r.a <> c.vb),
       |comp AS (SELECT a, least(a, min(b)) AS component FROM reach GROUP BY a),
       |corec AS (
       |  SELECT c.vec_id, coalesce(m.component, c.vec_id) AS cluster
       |  FROM core c LEFT JOIN comp m ON c.vec_id = m.a),
       |borderc AS (
       |  SELECT nb.va AS vec_id, min(k.cluster) AS cluster
       |  FROM nb JOIN corec k ON nb.vb = k.vec_id
       |  WHERE nb.va NOT IN (SELECT vec_id FROM core)
       |  GROUP BY nb.va)""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "dbscan_clusters",
      (s, dir) => cluster(Tables.embeddings(s, dir)).orderBy("vec_id"),
      // brute-force all-pairs DBSCAN in the same projected space
      Some(s"""WITH RECURSIVE $duckProjCtes
             |SELECT cnt.vec_id, cnt.n_eps,
             |  cnt.vec_id IN (SELECT vec_id FROM core) AS is_core,
             |  coalesce(corec.cluster, borderc.cluster, -1) AS cluster
             |FROM cnt
             |LEFT JOIN corec ON cnt.vec_id = corec.vec_id
             |LEFT JOIN borderc ON cnt.vec_id = borderc.vec_id
             |ORDER BY cnt.vec_id""".stripMargin),
    ),
    EngineQuery(
      "dbscan_summary",
      (s, dir) => {
        val c = cluster(Tables.embeddings(s, dir))
        c.groupBy("cluster")
          .agg(
            count(lit(1)).as("n_points"),
            sum(when(col("is_core"), 1L).otherwise(0L)).as("n_core"))
          .where(col("cluster") >= 0)
          .agg(
            count(lit(1)).as("n_clusters"),
            sum("n_points").as("n_clustered"),
            max("n_points").as("largest"),
            sum("n_core").as("n_core"))
          .crossJoin(
            c.agg(sum(when(col("cluster") === -1L, 1L).otherwise(0L)).as("n_noise")))
      },
      Some(s"""WITH RECURSIVE $duckProjCtes,
             |lab AS (
             |  SELECT cnt.vec_id,
             |    cnt.vec_id IN (SELECT vec_id FROM core) AS is_core,
             |    coalesce(corec.cluster, borderc.cluster, -1) AS cluster
             |  FROM cnt
             |  LEFT JOIN corec ON cnt.vec_id = corec.vec_id
             |  LEFT JOIN borderc ON cnt.vec_id = borderc.vec_id),
             |per AS (
             |  SELECT cluster, count(*) AS n_points,
             |    sum(CASE WHEN is_core THEN 1 ELSE 0 END) AS n_core
             |  FROM lab WHERE cluster >= 0 GROUP BY cluster)
             |SELECT CAST(count(*) AS BIGINT) AS n_clusters,
             |  CAST(sum(n_points) AS BIGINT) AS n_clustered,
             |  CAST(max(n_points) AS BIGINT) AS largest,
             |  CAST(sum(n_core) AS BIGINT) AS n_core,
             |  (SELECT CAST(count(*) AS BIGINT) FROM lab WHERE cluster = -1) AS n_noise
             |FROM per""".stripMargin),
    ),
  )
}
