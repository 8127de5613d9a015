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
  )
}
