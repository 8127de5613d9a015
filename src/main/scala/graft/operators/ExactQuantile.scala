package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** EXACT distributed percentiles with bounded state — the two-phase
  * histogram-bisection selection (the classic scalable exact-quantile
  * shape: one coarse-histogram pass to locate each target rank's
  * bucket, one re-scan confined to the candidate buckets to select the
  * exact value).
  *
  * This closes the engine's last exactness/scalability trade in the
  * quantile family: `percentile_prices` is exact but its aggregation
  * buffer holds every distinct value per group (unbounded at 100 TB);
  * `percentile_prices_approx` / `price_quartiles_scalable` are bounded
  * but approximate. Here BOTH hold:
  *
  *  - phase 1 aggregates (group, value DIV W) counts — state is
  *    `groups × domain/W` rows (~763 buckets for the order-price
  *    domain at W = 2^16 cents), NOT corpus rows; the per-group
  *    cumulative walk + target-rank arithmetic runs on that bounded
  *    relation;
  *  - phase 2 re-scans the fact table filtered to the ≤|groups|·|ps|
  *    candidate buckets (a broadcast semi-join — at 100 TB the scan
  *    reads everything but shuffles only rows from candidate buckets,
  *    ≤ corpus/763 in expectation), groups by exact value WITHIN a
  *    bucket (distinct values per bucket ≤ W — bounded again), and
  *    picks the value whose cumulative count crosses the target rank.
  *
  * Selection semantics are the discrete percentile: the smallest value
  * v with |{x ≤ v}| ≥ ⌈p·n⌉ — pure integer arithmetic on cents
  * (⌈p·n⌉ = (p_pct·n + 99) div 100), so Spark and the oracle agree
  * bit-for-bit with no interpolation floats anywhere.
  *
  * Two full scans (vs one for the buffering exact aggregate) is the
  * deliberate price of bounded memory; both scans prune to two columns
  * and the second's shuffle is ~1/763 of the first's input.
  */
object ExactQuantile {

  /** Bucket width in cents: 2^16 ≈ $655 slices of the price domain. */
  val BucketWidth = 65536L

  /** Percentile targets in integer percent (keeps ⌈p·n⌉ exact). */
  val Percents = Seq(50, 90, 99)

  /** Exact per-group p50/p90/p99 of `o_totalprice` in cents, with the
    * group count — two bounded-state passes, no per-group value buffer.
    */
  def exactPricePercentiles(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._

    val v = orders.select(
      col("o_orderpriority").as("g"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("c"))
      .withColumn("b", expr(s"c DIV $BucketWidth"))

    // ---- phase 1: coarse histogram + per-(group, percentile) target
    val hist = v.groupBy("g", "b").agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy("g")
    val cum = hist
      .withColumn("tot", sum("cnt").over(wg))
      .withColumn("cum", sum("cnt").over(wg.orderBy("b")))
    val cands = cum
      .select(col("g"), col("b"), col("cnt"), col("tot"), col("cum"),
        explode(typedLit(Percents)).as("pid"))
      .withColumn("r", expr("(pid * tot + 99) DIV 100"))
      // the unique bucket whose cumulative range covers rank r
      .where(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
      .select(col("g"), col("pid"), col("b"), col("r"),
        (col("cum") - col("cnt")).as("prev"), col("tot"))

    // ---- phase 2: exact selection inside the candidate buckets only
    val bucketKeys = cands.select("g", "b").distinct()
    val byVal = v.join(broadcast(bucketKeys), Seq("g", "b"))
      .groupBy("g", "b", "c").agg(count(lit(1)).as("vc"))
    val picked = byVal
      .withColumn("cumv",
        sum("vc").over(Window.partitionBy("g", "b").orderBy("c")))
      .join(broadcast(cands), Seq("g", "b"))
      .where(col("prev") + col("cumv") >= col("r"))
      .groupBy("g", "pid")
      .agg(min("c").as("val"), min("tot").as("tot"))

    picked.groupBy(col("g").as("o_orderpriority"))
      .agg(
        min(when(col("pid") === 50, col("val"))).as("p50_cents"),
        min(when(col("pid") === 90, col("val"))).as("p90_cents"),
        min(when(col("pid") === 99, col("val"))).as("p99_cents"),
        min("tot").as("cnt"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "percentile_exact_twopass",
      (s, dir) => exactPricePercentiles(Tables.orders(s, dir))
        .orderBy("o_orderpriority"),
      // the oracle computes the same discrete percentile directly from
      // the full per-value cumulative distribution — definitionally
      // identical, structurally independent of the bucketing
      Some("""WITH v AS (
             |  SELECT o_orderpriority AS g,
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
             |  FROM orders),
             |pv AS (SELECT g, c, count(*) AS vc FROM v GROUP BY 1, 2),
             |cum AS (
             |  SELECT g, c,
             |    sum(vc) OVER (PARTITION BY g ORDER BY c) AS cum,
             |    sum(vc) OVER (PARTITION BY g) AS tot
             |  FROM pv)
             |SELECT g AS o_orderpriority,
             |  min(CASE WHEN cum >= (50 * tot + 99) // 100 THEN c END) AS p50_cents,
             |  min(CASE WHEN cum >= (90 * tot + 99) // 100 THEN c END) AS p90_cents,
             |  min(CASE WHEN cum >= (99 * tot + 99) // 100 THEN c END) AS p99_cents,
             |  CAST(min(tot) AS BIGINT) AS cnt
             |FROM cum GROUP BY g ORDER BY o_orderpriority""".stripMargin),
      headline = true,
    ),
  )
}
