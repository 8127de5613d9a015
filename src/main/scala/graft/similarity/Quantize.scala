package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}
import graft.dedup.Dedup

/** Embedding compression paths for ANN at 100 TB (north-star
  * extension; the reference — a k-mer counter, `/root/reference/src/
  * main.cpp:105-248` — has no vector operators at all):
  *
  *  - **int8 scalar quantization (SQ8)**: per-dimension min/max over
  *    the corpus → each float compressed to a 0..255 code. 4× smaller
  *    vectors (16× vs float32 at byte layout), and the index fits in
  *    memory where the raw corpus would not. `sq8Recall` measures what
  *    the compression costs: recall@k of the SQ8 ranking against the
  *    full-precision ranking.
  *  - **random ±1 projection (Johnson–Lindenstrauss)**: 64 dims → 16
  *    via a deterministic sign matrix ([[Dedup.hyperplanes]]); inner
  *    products are preserved in expectation, so top-k in the projected
  *    space is the other classic shrink-then-search path.
  *  - **diagonal-Mahalanobis outlier scores**: per-dimension moments →
  *    Σ_d z²_d per vector; the curation-side use of the same stats
  *    (drop corrupt/degenerate embeddings before indexing).
  *
  * Exactness/portability: everything runs in the floor(x*1000) BIGINT
  * lane ([[Dedup.quantized]]). SQ8 codes are `((v-min)*255) div span`
  * — non-negative numerator, so Spark `div` and DuckDB `//` agree.
  * Outlier scores are `(cnt·v − Σv)²·100 div (cnt·Σv² − (Σv)²)` —
  * squared numerator (non-negative) over a variance-positive
  * denominator, again exact. No float accumulation anywhere.
  *
  * Scale notes: the stats pass reduces to |dims| rows (map-side
  * partial agg — the exchange carries 64 rows per task); codes/scores
  * are then ONE corpus pass with the 64-element bounds arrays
  * broadcast as a single-row literal-carrier crossJoin (same shape as
  * the mixture-budget carrier). Queries are a bounded broadcast side;
  * the corpus never shuffles for the recall probe.
  */
object Quantize {

  /** Per-dim (min,max) of the quantized lane, packed as two 64-element
    * arrays in one row (broadcast carrier).
    */
  private def bounds(quant: DataFrame): DataFrame =
    quant
      .select(posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(min("v").as("mn"), max("v").as("mx"))
      .groupBy()
      .agg(
        array_sort(collect_list(struct(col("dim"), col("mn")))).as("mns"),
        array_sort(collect_list(struct(col("dim"), col("mx")))).as("mxs"))
      .select(
        expr("transform(mns, s -> s.mn)").as("mn"),
        expr("transform(mxs, s -> s.mx)").as("mx"))

  /** (vec_id, code: array<bigint 0..255>) — SQ8 codes. */
  def sq8Codes(embeddings: DataFrame): DataFrame = {
    val quant = Dedup.quantized(embeddings)
    quant
      .crossJoin(broadcast(bounds(quant)))
      .select(
        col("vec_id"),
        expr(
          """transform(q, (v, i) ->
            |  CASE WHEN mx[i] = mn[i] THEN CAST(0 AS BIGINT)
            |       ELSE ((v - mn[i]) * 255) div (mx[i] - mn[i]) END)""".stripMargin)
          .as("code"))
  }

  /** Per-vector code summary (the gate-friendly scalar view of the
    * code table: sum/min/max pin the array without hashing arrays).
    */
  def sq8Stats(embeddings: DataFrame): DataFrame =
    sq8Codes(embeddings).select(
      col("vec_id"),
      expr("aggregate(code, CAST(0 AS BIGINT), (a, x) -> a + x)").as("c_sum"),
      expr("array_min(code)").as("c_min"),
      expr("array_max(code)").as("c_max"))

  private def topkByDot(
      side: DataFrame, vecCol: String, nQueries: Int, k: Int, rankName: String): DataFrame = {
    val q = side.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col(vecCol).as("qa"))
    val n = side.select(col("vec_id").as("n_id"), col(vecCol).as("qb"))
    val scored = broadcast(q).crossJoin(n)
      .where(col("q_id") =!= col("n_id"))
      .withColumn("d", expr("dot_i64(qa, qb)"))
    val w = Window.partitionBy("q_id").orderBy(col("d").desc, col("n_id"))
    scored.withColumn(rankName, row_number().over(w).cast("long"))
      .where(col(rankName) <= k)
  }

  /** Recall@k of the SQ8 dot-product ranking against the
    * full-precision (floor·1000 lane) dot-product ranking, per query.
    * Output: (q_id, hits, recall_pm) with recall_pm = hits·1000/k.
    */
  def sq8Recall(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val quant = Dedup.quantized(embeddings)
    val exact = topkByDot(quant, "q", nQueries, k, "rank")
      .select("q_id", "n_id")
    val approx = topkByDot(sq8Codes(embeddings), "code", nQueries, k, "rank")
      .select("q_id", "n_id")
    val qs = quant.where(col("vec_id") < nQueries).select(col("vec_id").as("q_id"))
    qs.join(exact.join(approx, Seq("q_id", "n_id")), Seq("q_id"), "left")
      .groupBy("q_id")
      .agg(count(col("n_id")).as("hits"))
      .withColumn("recall_pm", expr(s"(hits * 1000) div $k"))
  }

  /** JL projection: 64-dim quantized vector → `dims` exact integer
    * coordinates, p_j = dot(q, plane_j) over the deterministic ±1
    * matrix shared with sign-LSH ([[Dedup.hyperplanes]]).
    */
  def rpProject(embeddings: DataFrame, dims: Int): DataFrame = {
    val quant = Dedup.quantized(embeddings)
    val planes = Dedup.hyperplanes(dims)
    val coords: Seq[Column] = planes.map { plane =>
      expr(s"dot_i64(q, CAST(array(${plane.mkString(",")}) AS ARRAY<BIGINT>))")
    }
    quant.select(col("vec_id"), array(coords: _*).as("p"))
  }

  /** Top-k by inner product in the projected space (E[p·p'] = dims·q·q',
    * so the projected ranking tracks the full one at 1/4 the width).
    */
  def rpTopK(embeddings: DataFrame, nQueries: Int, k: Int, dims: Int = 16): DataFrame =
    topkByDot(rpProject(embeddings, dims), "p", nQueries, k, "rank")
      .select(col("q_id"), col("n_id"), col("rank"), col("d").as("pdot"))

  /** Diagonal-Mahalanobis outlier scores: per-vector
    * Σ_d ((cnt·v_d − Σv_d)²·100 div (cnt·Σv²_d − (Σv_d)²)) ≈ 100·Σ z².
    * Top `n` by (score desc, vec_id) — the curation cut that drops
    * corrupt embeddings before an index build.
    */
  def outliers(embeddings: DataFrame, n: Int): DataFrame = {
    val quant = Dedup.quantized(embeddings)
    val stats = quant
      .select(posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sm"), sum(col("v") * col("v")).as("s2"))
      .groupBy()
      .agg(
        first(col("cnt")).as("cnt"),
        array_sort(collect_list(struct(col("dim"), col("sm")))).as("sms"),
        array_sort(collect_list(struct(col("dim"), col("s2")))).as("s2s"))
      .select(
        col("cnt"),
        expr("transform(sms, s -> s.sm)").as("sm"),
        expr("transform(s2s, s -> s.s2)").as("s2"))
    quant
      .crossJoin(broadcast(stats))
      .select(
        col("vec_id"),
        expr(
          """aggregate(
            |  transform(q, (v, i) ->
            |    CASE WHEN cnt * s2[i] - sm[i] * sm[i] = 0 THEN CAST(0 AS BIGINT)
            |         ELSE ((cnt * v - sm[i]) * (cnt * v - sm[i]) * 100)
            |              div (cnt * s2[i] - sm[i] * sm[i]) END),
            |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(n)
  }

  // --------------------------------------------------------------- oracles

  private val duckQuantized =
    """SELECT vec_id,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |FROM embeddings""".stripMargin

  /** (vec_id, dim, v) long form of the quantized lane. */
  private val duckLong =
    s"""SELECT vec_id, t.i AS dim, q[t.i + 1] AS v
       |FROM ($duckQuantized), range(${Dedup.Dim}) t(i)""".stripMargin

  private val duckCodes =
    s"""WITH e AS ($duckLong),
       |st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY dim),
       |c AS (
       |  SELECT vec_id,
       |    list(CASE WHEN mx = mn THEN 0 ELSE ((v - mn) * 255) // (mx - mn) END
       |         ORDER BY dim) AS code
       |  FROM e JOIN st USING (dim) GROUP BY vec_id)""".stripMargin

  private def duckTopkByDot(src: String, nQueries: Int, k: Int): String =
    s"""SELECT q_id, n_id FROM (
       |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
       |    row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY CAST(list_sum(list_transform(list_zip(a.vv, b.vv), p -> p[1] * p[2])) AS BIGINT) DESC,
       |        b.vec_id) AS rnk
       |  FROM $src a JOIN $src b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id < $nQueries)
       |WHERE rnk <= $k""".stripMargin

  private[similarity] def sq8StatsOracle: String =
    s"""$duckCodes
       |SELECT vec_id,
       |  CAST(list_sum(code) AS BIGINT) AS c_sum,
       |  CAST(list_min(code) AS BIGINT) AS c_min,
       |  CAST(list_max(code) AS BIGINT) AS c_max
       |FROM c ORDER BY vec_id""".stripMargin

  private[similarity] def sq8RecallOracle(nQueries: Int, k: Int): String =
    s"""$duckCodes,
       |qv AS (SELECT vec_id, q AS vv FROM ($duckQuantized)),
       |cv AS (SELECT vec_id, code AS vv FROM c),
       |ex AS (${duckTopkByDot("qv", nQueries, k)}),
       |ap AS (${duckTopkByDot("cv", nQueries, k)}),
       |hit AS (SELECT q_id, n_id FROM ex INTERSECT SELECT q_id, n_id FROM ap)
       |SELECT q.vec_id AS q_id, count(hit.n_id) AS hits,
       |  CAST(count(hit.n_id) * 1000 / $k AS BIGINT) AS recall_pm
       |FROM (SELECT vec_id FROM qv WHERE vec_id < $nQueries) q
       |LEFT JOIN hit ON hit.q_id = q.vec_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private[similarity] def rpTopkOracle(nQueries: Int, k: Int, dims: Int): String = {
    val planes = Dedup.hyperplanes(dims)
    val coords = planes.map { plane =>
      s"CAST(list_sum(list_transform(list_zip(q, [${plane.mkString(",")}]), p -> p[1] * p[2])) AS BIGINT)"
    }.mkString(",\n    ")
    s"""WITH pv AS (
       |  SELECT vec_id, list_value(
       |    $coords) AS vv
       |  FROM ($duckQuantized))
       |SELECT q_id, n_id, rnk AS rank, pdot FROM (
       |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
       |    CAST(list_sum(list_transform(list_zip(a.vv, b.vv), p -> p[1] * p[2])) AS BIGINT) AS pdot,
       |    row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY CAST(list_sum(list_transform(list_zip(a.vv, b.vv), p -> p[1] * p[2])) AS BIGINT) DESC,
       |        b.vec_id) AS rnk
       |  FROM pv a JOIN pv b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id < $nQueries)
       |WHERE rnk <= $k ORDER BY q_id, rank""".stripMargin
  }

  private[similarity] def outliersOracle(n: Int): String =
    s"""WITH e AS ($duckLong),
       |st AS (
       |  SELECT dim, count(*) AS cnt, CAST(sum(v) AS BIGINT) AS sm,
       |    CAST(sum(v * v) AS BIGINT) AS s2
       |  FROM e GROUP BY dim)
       |SELECT vec_id,
       |  CAST(sum(CASE WHEN cnt * s2 - sm * sm = 0 THEN 0
       |    ELSE ((cnt * v - sm) * (cnt * v - sm) * 100) // (cnt * s2 - sm * sm) END) AS BIGINT) AS score
       |FROM e JOIN st USING (dim)
       |GROUP BY vec_id ORDER BY score DESC, vec_id LIMIT $n""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "embedding_sq8_stats",
      (s, dir) => sq8Stats(Tables.embeddings(s, dir)).orderBy("vec_id"),
      Some(sq8StatsOracle),
    ),
    EngineQuery(
      "embedding_sq8_recall",
      (s, dir) => sq8Recall(Tables.embeddings(s, dir), nQueries = 20, k = 5).orderBy("q_id"),
      Some(sq8RecallOracle(nQueries = 20, k = 5)),
      headline = true,
    ),
    EngineQuery(
      "rp_projection_topk",
      (s, dir) => rpTopK(Tables.embeddings(s, dir), nQueries = 20, k = 5).orderBy("q_id", "rank"),
      Some(rpTopkOracle(nQueries = 20, k = 5, dims = 16)),
    ),
    EngineQuery(
      "embedding_outliers",
      (s, dir) => outliers(Tables.embeddings(s, dir), n = 20),
      Some(outliersOracle(n = 20)),
    ),
  )
}
