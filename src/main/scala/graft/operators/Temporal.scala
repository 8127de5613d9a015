package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{EngineQuery, Tables}

/** Temporal-state operators: point-in-time reconstruction from a change
  * log, time-series regularization (gap-fill + LOCF), and a mergeable
  * histogram sketch store for range quantiles — the "what did the data
  * look like / how do I query any time range cheaply" family that
  * warehouse pipelines layer on top of CDC feeds. Extends the
  * [[Cdc]] family (single-generation MERGE/SCD2/delta-maintain) with
  * multi-generation, timestamped log semantics.
  *
  * Exactness: all money travels as integer cents, the synthetic
  * uplift is `cents + cents div 10` (BIGINT, no decimal rounding
  * question), day indices are exact datediffs — both engines agree
  * bit-for-bit.
  */
object Temporal {

  private def dec(c: String) = col(c).cast(DecimalType(12, 2))

  private def dayNo(c: String) =
    datediff(col(c), lit("1992-01-01")).cast("long")

  /** Deterministic multi-generation change log derived from orders:
    * every key INSERTs at its order date; the `%10==3` cohort UPDATEs
    * (+10% integer cents) 30 days later; the `%10==7` cohort DELETEs
    * 60 days later. Ops on one key land on distinct days by
    * construction, so "latest change ≤ T" is unambiguous.
    */
  def changeLog(orders: DataFrame): DataFrame = {
    val base = orders.select(
      col("o_orderkey").as("k"), dayNo("o_orderdate").as("d"),
      (dec("o_totalprice") * 100).cast("long").as("cents"))
    val ins = base.select(col("k"), col("d").as("ts_day"), lit("I").as("op"), col("cents"))
    val upd = base.where(col("k") % 10 === 3)
      .select(col("k"), (col("d") + 30).as("ts_day"), lit("U").as("op"),
        (col("cents") + expr("cents div 10")).as("cents"))
    val del = base.where(col("k") % 10 === 7)
      .select(col("k"), (col("d") + 60).as("ts_day"), lit("D").as("op"),
        lit(null).cast("long").as("cents"))
    ins.unionByName(upd).unionByName(del)
  }

  /** Point-in-time snapshot: the table state as of day T, reconstructed
    * from the log — latest change per key with ts ≤ T wins; keys whose
    * latest op is a delete are absent. One key-partitioned rank window
    * over the time-filtered log (the filter prunes BEFORE the
    * exchange); no join against any "current" table.
    */
  def snapshotAsOf(orders: DataFrame, tDay: Long): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("ts_day").desc)
    changeLog(orders)
      .where(col("ts_day") <= tDay)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select(col("k").as("o_orderkey"), col("op").as("last_op"), col("cents"))
  }

  /** Daily revenue of the URGENT cohort, gap-filled over the full
    * calendar spine with last-observation-carried-forward. The corpus
    * reduces to day cardinality FIRST (partial+final cents sum); the
    * spine is a generated sequence off a 1-row min/max carrier, and
    * the LOCF window runs at day cardinality — corpus-independent,
    * the CUSUM/MAD discipline. `was_gap` marks spine days with no
    * observation.
    */
  def gapfillLocf(orders: DataFrame): DataFrame = {
    val daily = orders.where(col("o_orderpriority") === "1-URGENT")
      .groupBy(dayNo("o_orderdate").as("day_no"))
      .agg((sum(dec("o_totalprice")) * 100).cast("long").as("cents"))
    val bounds = daily.agg(min("day_no").as("lo"), max("day_no").as("hi"))
    val spine = bounds.select(explode(expr("sequence(lo, hi)")).as("day_no"))
    val w = Window.orderBy("day_no").rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("day_no"), "left")
      .withColumn("cents_filled", last(col("cents"), ignoreNulls = true).over(w))
      .select(
        col("day_no"), col("cents_filled"),
        col("cents").isNull.cast("long").as("was_gap"))
  }

  /** Mergeable histogram sketch store: per-(month, price-bin) counts —
    * the quantile twin of the HLL daily-sketch store (store once,
    * query ANY range by pure addition; bins merge associatively, so a
    * month's histogram folds from day histograms without re-scanning
    * the corpus). [[histogramQuantiles]] answers range-quantile
    * queries from the store alone.
    */
  def histogramStore(orders: DataFrame, binCents: Long): DataFrame =
    orders
      .groupBy(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long")
          .as("month_no"),
        expr(s"((cast(cast(o_totalprice as decimal(12,2)) * 100 as long)) div $binCents)")
          .as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Range quantiles (p50/p90/p99 permille) over [loMonth, hiMonth],
    * answered from the histogram store: merge the range's bins by
    * addition, one cumulative window at BIN cardinality, and the
    * answer is the first bin whose cumulative count crosses p·total
    * (exact integer cross-multiplication). Rank error ≤ one bin width
    * — the knob is `binCents`, not a rescan.
    */
  def histogramQuantiles(orders: DataFrame, loMonth: Long, hiMonth: Long, binCents: Long): DataFrame = {
    val merged = histogramStore(orders, binCents)
      .where(col("month_no").between(loMonth, hiMonth))
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    // total = one more frame over the SAME bin-cardinality window pass —
    // an .agg() carrier would re-derive the store subtree (second scan)
    val wAll = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = merged
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("total", sum("cnt").over(wAll))
    val ps = orders.sparkSession.range(1)
      .select(explode(array(lit(500L), lit(900L), lit(990L))).as("p_permille"))
    cum.join(broadcast(ps), expr("1000 * cum >= p_permille * total"))
      .groupBy("p_permille")
      .agg(min(col("bin")).as("qbin"))
      .select(col("p_permille"), (col("qbin") * binCents).as("lo_cents"))
  }

  private val SnapDay = 1247L // 1995-06-01 relative to 1992-01-01

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "cdc_snapshot_asof",
      (s, dir) => snapshotAsOf(Tables.orders(s, dir), SnapDay).orderBy("o_orderkey"),
      Some(s"""WITH base AS (
             |  SELECT o_orderkey AS k,
             |    CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS d,
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
             |  FROM orders),
             |log AS (
             |  SELECT k, d AS ts_day, 'I' AS op, cents FROM base
             |  UNION ALL
             |  SELECT k, d + 30, 'U', cents + cents // 10 FROM base WHERE k % 10 = 3
             |  UNION ALL
             |  SELECT k, d + 60, 'D', NULL FROM base WHERE k % 10 = 7),
             |r AS (
             |  SELECT k, op, cents,
             |    row_number() OVER (PARTITION BY k ORDER BY ts_day DESC) AS rn
             |  FROM log WHERE ts_day <= $SnapDay)
             |SELECT k AS o_orderkey, op AS last_op, cents
             |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY o_orderkey""".stripMargin),
    ),
    EngineQuery(
      "timeseries_gapfill_locf",
      (s, dir) => gapfillLocf(Tables.orders(s, dir)).orderBy("day_no"),
      Some("""WITH daily AS (
             |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
             |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
             |bounds AS (SELECT min(day_no) AS lo, max(day_no) AS hi FROM daily),
             |spine AS (SELECT unnest(generate_series(lo, hi)) AS day_no FROM bounds)
             |SELECT s.day_no,
             |  last_value(d.cents IGNORE NULLS) OVER (ORDER BY s.day_no
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled,
             |  CAST(CASE WHEN d.cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
             |FROM spine s LEFT JOIN daily d ON s.day_no = d.day_no
             |ORDER BY s.day_no""".stripMargin),
    ),
    EngineQuery(
      "histogram_quantile_range",
      (s, dir) => histogramQuantiles(Tables.orders(s, dir),
        loMonth = 1995L * 12, hiMonth = 1995L * 12 + 11, binCents = 1000000L)
        .orderBy("p_permille"),
      Some("""WITH store AS (
             |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_no,
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 1000000 AS bin,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM orders GROUP BY 1, 2),
             |merged AS (
             |  SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM store
             |  WHERE month_no BETWEEN 23940 AND 23951 GROUP BY bin),
             |cum AS (
             |  SELECT bin, sum(cnt) OVER (ORDER BY bin
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    (SELECT sum(cnt) FROM merged) AS total
             |  FROM merged),
             |ps AS (SELECT unnest([CAST(500 AS BIGINT), 900, 990]) AS p_permille)
             |SELECT p_permille, CAST(min(bin) * 1000000 AS BIGINT) AS lo_cents
             |FROM cum JOIN ps ON 1000 * cum >= p_permille * total
             |GROUP BY p_permille ORDER BY p_permille""".stripMargin),
    ),
  )
}
