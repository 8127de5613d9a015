package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * "A Theory for Record Linkage", JASA) — the decision-theoretic
  * scorer the ER ladder was missing: [[EditDistJoin]] blocks and
  * verifies STRINGS, [[SortedNeighborhood]] bounds the candidate
  * window, but neither weighs evidence. FS scores a candidate pair by
  * the likelihood ratio
  *
  *   R = Π_f  agree_f ? m_f/u_f : (1−m_f)/(1−u_f)
  *
  * where m_f = P(field f agrees | same entity) (a per-field prior) and
  * u_f = P(field f agrees | different entities), estimated from the
  * data itself as the random-pair agreement probability
  * Σ_v cnt_v² / N² — the standard frequency-based u. High-cardinality
  * fields (rare agreement by chance) earn large agreement weights;
  * low-cardinality fields small ones; disagreement on a
  * high-m field costs heavily.
  *
  * Exactness & scale discipline:
  *  - u_f is quantized to permyriad (round-half-up, clamped to
  *    [1, 9999]) BEFORE entering the ratio — this fixes the rational
  *    denominator at 10⁴ independent of corpus size, so the 3-field
  *    product stays ≤ (95·10⁴)³ < 2⁶³ in plain BIGINT lanes AT ANY
  *    SCALE (naive N²-denominator rationals overflow 38 digits past
  *    N ≈ 10⁵). The quantization is part of the operator definition,
  *    replayed identically by the oracle.
  *  - The match gate is the EXACT integer cross-multiplication
  *    num ≥ T·den — no float ever decides a row. The reported score is
  *    one decimal-lane integer division (num·10⁶ DIV den), exact in
  *    both engines.
  *  - Blocking is an equi-join on the block key; u-statistics are one
  *    partial+final aggregate per field (three tiny single-row scalar
  *    carriers broadcast into the pair stream). Nothing driver-side,
  *    nothing quadratic beyond the per-block candidate set the blocking
  *    key itself defines. At 100 TB the blocking key's cardinality must
  *    grow with the corpus — a fixed-cardinality key makes every block
  *    corpus/|keys| and the within-block join quadratic; the scale path
  *    is to feed FS candidates from [[SortedNeighborhood]] windows or
  *    MinHash bands and keep THIS operator purely as the scorer (gate
  *    keeps the name-block join because the harness name vocabulary is
  *    64 values over a bounded corpus).
  */
object FellegiSunter {

  /** m priors as exact rationals (num, den). */
  val MBrand = (9L, 10L)
  val MType = (19L, 20L)
  val MSize = (4L, 5L)

  /** Match threshold: keep pairs with likelihood ratio ≥ 20. */
  val Threshold = 20L

  private val PM = 10000L // permyriad lane for u

  /** Scored part-pair linkage: block on p_name, weigh brand/type/size
    * agreement. Output: (part_a, part_b, brand_eq, type_eq, size_eq,
    * score_ppm) for pairs with R ≥ [[Threshold]].
    */
  def partLinkage(parts: DataFrame): DataFrame = {
    val p = parts.select(
      col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))

    // frequency-based u per comparison field: Σ cnt_v² / N², one
    // single-row carrier per field. The squares/products ride a
    // DECIMAL(38,0) lane — BIGINT Σcnt² wraps silently (non-ANSI) once
    // a value's count passes ~3·10⁹; the decimal lane is exact to
    // N ≈ 10¹⁴ and only the ≤ 4-digit quantized quotient leaves it.
    def uStat(field: String): DataFrame =
      p.groupBy(field).agg(count(lit(1)).cast("decimal(38,0)").as("cnt"))
        .agg(
          sum(col("cnt") * col("cnt")).as("__un"),
          (sum(col("cnt")) * sum(col("cnt"))).as("__ud"))
        .select(
          greatest(lit(1L), least(lit(PM - 1),
            expr(s"(2 * $PM * __un + __ud) DIV (2 * __ud)"))).as(s"u_$field"))

    val stats = uStat("p_brand")
      .crossJoin(uStat("p_type"))
      .crossJoin(uStat("p_size"))

    val pairs = p.as("a")
      .join(p.as("b"),
        col("a.p_name") === col("b.p_name") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .crossJoin(broadcast(stats))

    // per-field ratio as BIGINT rational (num_f, den_f):
    //   agree:    m_num·10⁴       / (m_den·u_pm)
    //   disagree: (m_den−m_num)·10⁴ / (m_den·(10⁴−u_pm))
    def ratio(eq: org.apache.spark.sql.Column, m: (Long, Long), u: org.apache.spark.sql.Column) = (
      when(eq, lit(m._1 * PM)).otherwise(lit((m._2 - m._1) * PM)),
      when(eq, lit(m._2) * u).otherwise(lit(m._2) * (lit(PM) - u)))

    val brandEq = col("a.p_brand") === col("b.p_brand")
    val typeEq = col("a.p_type") === col("b.p_type")
    val sizeEq = col("a.p_size") === col("b.p_size")
    val (nB, dB) = ratio(brandEq, MBrand, col("u_p_brand"))
    val (nT, dT) = ratio(typeEq, MType, col("u_p_type"))
    val (nS, dS) = ratio(sizeEq, MSize, col("u_p_size"))
    val num = nB * nT * nS
    val den = dB * dT * dS

    pairs
      .select(
        col("a.p_partkey").as("part_a"),
        col("b.p_partkey").as("part_b"),
        brandEq.as("brand_eq"), typeEq.as("type_eq"), sizeEq.as("size_eq"),
        num.as("__num"), den.as("__den"))
      .where(col("__num") >= lit(Threshold) * col("__den"))
      .select(
        col("part_a"), col("part_b"),
        col("brand_eq"), col("type_eq"), col("size_eq"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __num) DIV __den AS BIGINT)")
          .as("score_ppm"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "fs_linkage_scores",
      (s, dir) => partLinkage(Tables.part(s, dir)).orderBy("part_a", "part_b"),
      Some(s"""WITH n AS (SELECT count(*) AS n FROM part),
             |ub AS (SELECT greatest(1, least(${PM - 1},
             |    (2 * $PM * sum(cnt * cnt) + max(nn)) // (2 * max(nn)))) AS u
             |  FROM (SELECT p_brand, count(*) AS cnt, (SELECT n * n FROM n) AS nn
             |        FROM part GROUP BY 1)),
             |ut AS (SELECT greatest(1, least(${PM - 1},
             |    (2 * $PM * sum(cnt * cnt) + max(nn)) // (2 * max(nn)))) AS u
             |  FROM (SELECT p_type, count(*) AS cnt, (SELECT n * n FROM n) AS nn
             |        FROM part GROUP BY 1)),
             |us AS (SELECT greatest(1, least(${PM - 1},
             |    (2 * $PM * sum(cnt * cnt) + max(nn)) // (2 * max(nn)))) AS u
             |  FROM (SELECT p_size, count(*) AS cnt, (SELECT n * n FROM n) AS nn
             |        FROM part GROUP BY 1)),
             |scored AS (
             |  SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
             |    a.p_brand = b.p_brand AS brand_eq,
             |    a.p_type = b.p_type AS type_eq,
             |    a.p_size = b.p_size AS size_eq,
             |    (CASE WHEN a.p_brand = b.p_brand THEN CAST(${MBrand._1 * PM} AS BIGINT)
             |          ELSE CAST(${(MBrand._2 - MBrand._1) * PM} AS BIGINT) END) *
             |    (CASE WHEN a.p_type = b.p_type THEN CAST(${MType._1 * PM} AS BIGINT)
             |          ELSE CAST(${(MType._2 - MType._1) * PM} AS BIGINT) END) *
             |    (CASE WHEN a.p_size = b.p_size THEN CAST(${MSize._1 * PM} AS BIGINT)
             |          ELSE CAST(${(MSize._2 - MSize._1) * PM} AS BIGINT) END) AS num,
             |    (CASE WHEN a.p_brand = b.p_brand
             |          THEN ${MBrand._2} * CAST((SELECT u FROM ub) AS BIGINT)
             |          ELSE ${MBrand._2} * ($PM - CAST((SELECT u FROM ub) AS BIGINT)) END) *
             |    (CASE WHEN a.p_type = b.p_type
             |          THEN ${MType._2} * CAST((SELECT u FROM ut) AS BIGINT)
             |          ELSE ${MType._2} * ($PM - CAST((SELECT u FROM ut) AS BIGINT)) END) *
             |    (CASE WHEN a.p_size = b.p_size
             |          THEN ${MSize._2} * CAST((SELECT u FROM us) AS BIGINT)
             |          ELSE ${MSize._2} * ($PM - CAST((SELECT u FROM us) AS BIGINT)) END) AS den
             |  FROM part a JOIN part b
             |    ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey)
             |SELECT part_a, part_b, brand_eq, type_eq, size_eq,
             |  CAST((1000000::HUGEINT * num) // den AS BIGINT) AS score_ppm
             |FROM scored WHERE num >= $Threshold * den
             |ORDER BY part_a, part_b""".stripMargin),
    ),
  )
}
