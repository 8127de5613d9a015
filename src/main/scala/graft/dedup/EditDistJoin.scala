package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Blocked edit-distance similarity join — the entity-resolution /
  * record-linkage string matcher (Fellegi–Sunter blocking + Levenshtein
  * verify): find value pairs within edit distance `maxDist` without
  * ever comparing all pairs. The reference engine has no string
  * similarity at all; this completes the engine's similarity ladder
  * (set: Jaccard/MinHash; vector: cosine/LSH; sequence: edit distance).
  *
  * Scale shape (100 TB): the corpus first collapses to DISTINCT values
  * — names/titles/addresses are vocabulary-scale, orders of magnitude
  * below row count, and partial+final distinct is map-side combined.
  * Candidates come from a token-blocking equi-join (pairs must share
  * ≥1 token whose document frequency is ≤ `maxDf` — the hot-block cap
  * that keeps a stopword token from recreating the quadratic join),
  * and the O(len²) Levenshtein verify runs only on blocked candidates.
  * `levenshtein` is a codegen'd builtin in both engines with identical
  * unit-cost semantics, so the gate hash-matches exactly.
  */
object EditDistJoin {

  def similarNames(df: DataFrame, valueCol: String, maxDist: Int, maxDf: Int): DataFrame = {
    val names = df.select(col(valueCol).as("name")).distinct()
    val toks = names.select(col("name"), explode(split(col("name"), "\\s+")).as("w")).distinct()
    val usable = toks.groupBy("w").agg(count(lit(1)).as("df")).where(col("df") <= maxDf)
    val t = toks.join(usable.select("w"), Seq("w"))
    val cand = t.select(col("name").as("name_a"), col("w"))
      .join(t.select(col("name").as("name_b"), col("w")), Seq("w"))
      .where(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct()
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
  }

  /** Entity-resolution clusters over the blocked edit-distance pairs:
    * names within `maxDist` of each other (transitively) share a
    * cluster, labeled by the cluster's lexicographic min name — the
    * standard ER pipeline (block → verify → cluster) composed from
    * [[similarNames]] and the audited
    * [[graft.dedup.Dedup.connectedComponents]] loop (checkpoint-
    * released iterations, loud non-convergence). Name→id mapping is a
    * rank over the DISTINCT name vocabulary (single-partition window at
    * vocabulary cardinality — corpus-independent), so the integer CC
    * runs on dense ids and the min-id label maps back to the min name.
    */
  def nameClusters(df: DataFrame, valueCol: String, maxDist: Int, maxDf: Int): DataFrame = {
    val pairs = similarNames(df, valueCol, maxDist, maxDf)
    val names = df.select(col(valueCol).as("name")).distinct()
    val ids = names.withColumn("id",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("name")).cast("long"))
    val e = pairs
      .join(ids.select(col("name").as("name_a"), col("id").as("doc_a")), Seq("name_a"))
      .join(ids.select(col("name").as("name_b"), col("id").as("doc_b")), Seq("name_b"))
      .select("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(e)
    ids.join(cc.withColumnRenamed("doc_id", "id"), Seq("id"), "left")
      .withColumn("comp", coalesce(col("component"), col("id")))
      .join(ids.select(col("id").as("comp"), col("name").as("cluster_rep")), Seq("comp"))
      .select(col("name"), col("cluster_rep"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "editdist_similar_names",
      (s, dir) => similarNames(Tables.part(s, dir), "p_name", maxDist = 4, maxDf = 1000)
        .orderBy("name_a", "name_b"),
      Some("""WITH names AS (SELECT DISTINCT p_name AS name FROM part),
             |toks AS (SELECT DISTINCT name, unnest(string_split_regex(name, '\s+')) AS w FROM names),
             |usable AS (SELECT w FROM toks GROUP BY w HAVING count(*) <= 1000),
             |t AS (SELECT toks.name, toks.w FROM toks JOIN usable ON toks.w = usable.w),
             |cand AS (
             |  SELECT DISTINCT a.name AS name_a, b.name AS name_b
             |  FROM t a JOIN t b ON a.w = b.w WHERE a.name < b.name)
             |SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
             |FROM cand WHERE levenshtein(name_a, name_b) <= 4
             |ORDER BY name_a, name_b""".stripMargin),
    ),
    EngineQuery(
      "er_name_clusters",
      (s, dir) => nameClusters(Tables.part(s, dir), "p_name", maxDist = 4, maxDf = 1000)
        .orderBy("name"),
      Some {
        // min-label propagation unrolled 8 MATERIALIZED rounds (plain
        // CTEs would re-inline the chain); rounds past the graph
        // diameter are idempotent, and the engine side fails loud if
        // ITS loop hasn't converged — equality means both finished.
        val rounds = (1 to 8).map { i =>
          s"""l$i AS MATERIALIZED (
             |  SELECT v.n, least(v.l, coalesce(min(u.l), v.l)) AS l
             |  FROM l${i - 1} v LEFT JOIN e ON e.a = v.n LEFT JOIN l${i - 1} u ON u.n = e.b
             |  GROUP BY v.n, v.l)""".stripMargin
        }.mkString(",\n")
        s"""WITH names AS (SELECT DISTINCT p_name AS name FROM part),
           |toks AS (SELECT DISTINCT name, unnest(string_split_regex(name, '\\s+')) AS w FROM names),
           |usable AS (SELECT w FROM toks GROUP BY w HAVING count(*) <= 1000),
           |t AS (SELECT toks.name, toks.w FROM toks JOIN usable ON toks.w = usable.w),
           |cand AS (
           |  SELECT DISTINCT a.name AS na, b.name AS nb
           |  FROM t a JOIN t b ON a.w = b.w WHERE a.name < b.name),
           |p AS (SELECT na, nb FROM cand WHERE levenshtein(na, nb) <= 4),
           |e AS MATERIALIZED (SELECT na AS a, nb AS b FROM p UNION ALL SELECT nb, na FROM p),
           |l0 AS MATERIALIZED (SELECT name AS n, name AS l FROM names),
           |$rounds
           |SELECT n AS name, l AS cluster_rep FROM l8 ORDER BY name""".stripMargin
      },
    ),
  )
}
