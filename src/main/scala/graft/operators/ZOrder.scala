package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Z-order (Morton-curve) multi-dimensional layout — the data-skipping
  * technique behind Delta OPTIMIZE ZORDER BY / Iceberg sort orders
  * (Morton 1966; "interleave the bits of the clustering keys so ONE
  * sort order localizes EVERY dimension"): a file sorted by raw key A
  * prunes scans filtering on A but is useless for filters on B; files
  * laid out along the Z-curve over (A, B) keep BOTH dimensions'
  * min/max spans narrow, so a 2-D predicate skips most files.
  *
  * At 100 TB this is a WRITE-TIME decision that pays on every read:
  * `repartitionByRange(zval)` before the parquet writer assigns rows
  * to files along the curve, and the engine's ordinary min/max
  * file-statistics pruning (see `partitioned_scan_prune` /
  * `FormatSources`) then skips files no differently than for a 1-D
  * sort — no new read-path machinery needed.
  *
  * The gate query quantifies exactly that effect without writing
  * files: rows map to 64 hypothetical files under (a) the Z-curve and
  * (b) a raw partkey-range layout; per-file min/max of both dimensions
  * decide which files a fixed 2-D predicate must read. The whole plan
  * is one tiny broadcast (the two key maxima) + a projection + a
  * 64-group aggregate (map-side combine; no window, no big join, no
  * global sort ANYWHERE — both layouts' file ids are pure per-row
  * expressions).
  *
  * The 16-bit key domain is DERIVED FROM THE DATA, not fixed: each key
  * is scaled by `floor(key * 2^16 / (max_key + 1))` so the Z-curve
  * always spans its full 32-bit range and all 64 files materialize at
  * every scale factor (a fixed `key mod 2^16` domain degenerates when
  * the observed keys are far below 2^16 — at sf0.01 partkey ≤ 2,000
  * collapses the layout to 1–2 files and a fixed predicate selects
  * none of them). The scaling is exact double arithmetic (products
  * < 2^53) so Spark and DuckDB agree bit-for-bit. The 2-D predicate is
  * cell-aligned — one 1/8 stripe of each scaled dimension — so at any
  * SF the Z-layout must read ≥ 1 but far-from-all files while the
  * linear layout reads the full x-stripe with unbounded y.
  */
object ZOrder {

  val Bits = 16
  val NumFiles = 64

  /** Morton interleave of the low 16 bits of two BIGINT columns:
    * bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private val duckZ: String =
    (0 until Bits).map { i =>
      s"(((x16 >> $i) & 1) << ${2 * i}) + (((y16 >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  // Cell-aligned 2-D predicate over the SCALED domain: the second 1/8
  // stripe of each dimension — one Z-grid cell, but 8 linear files'
  // worth of x with every y. Aligned to the 8×8 top-bits grid so the
  // contrast (Z reads ~1 cell, linear reads the whole x stripe) holds
  // at every SF once keys are scaled to fill the domain.
  val PLo = 8192L; val PHi = 16384L; val SLo = 8192L; val SHi = 16384L

  /** Per-layout skipping stats: total files, files a 2-D range
    * predicate must read (min/max overlap), and the rows inside them
    * (the scan volume an engine with file stats would actually read). */
  def zorderSkippingStats(lineitem: DataFrame): DataFrame = {
    val mx = lineitem.agg(
      max(col("l_partkey")).cast("double").as("__mxp"),
      max(col("l_suppkey")).cast("double").as("__mxs"))
    val base = lineitem.crossJoin(broadcast(mx)).select(
      floor(col("l_partkey").cast("double") * lit(65536.0) / (col("__mxp") + lit(1.0)))
        .cast("long").as("x16"),
      floor(col("l_suppkey").cast("double") * lit(65536.0) / (col("__mxs") + lit(1.0)))
        .cast("long").as("y16"))
    val withFids = base.select(
      col("x16"), col("y16"),
      // z ∈ [0, 2^32): 64 files of 2^26 z-values each
      shiftright(zValue(col("x16"), col("y16")), 26).as("fid_zorder"),
      // linear baseline: 64 equal partkey ranges (2^10 values each)
      shiftright(col("x16"), 10).as("fid_linear"))
    def stats(fid: String, label: String): DataFrame = {
      val perFile = withFids.groupBy(col(fid).as("fid"))
        .agg(
          count(lit(1)).as("cnt"),
          min("x16").as("min_x"), max("x16").as("max_x"),
          min("y16").as("min_y"), max("y16").as("max_y"))
      val mustRead =
        col("max_x") >= PLo && col("min_x") < PHi &&
          col("max_y") >= SLo && col("min_y") < SHi
      perFile.agg(
        count(lit(1)).as("n_files"),
        sum(when(mustRead, 1L).otherwise(0L)).as("n_files_read"),
        sum(when(mustRead, col("cnt")).otherwise(0L)).as("rows_in_read_files"),
        sum(when(mustRead, col("max_y") - col("min_y")).otherwise(0L)).as("sum_y_span_read"))
        .select(lit(label).as("layout"), col("n_files"), col("n_files_read"),
          col("rows_in_read_files"), col("sum_y_span_read"))
    }
    stats("fid_zorder", "zorder").unionByName(stats("fid_linear", "linear"))
      .orderBy("layout")
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "zorder_skipping_stats",
      (s, dir) => zorderSkippingStats(Tables.lineitem(s, dir)),
      Some(s"""WITH mx AS (
             |  SELECT CAST(max(l_partkey) AS DOUBLE) AS mxp,
             |         CAST(max(l_suppkey) AS DOUBLE) AS mxs FROM lineitem),
             |base AS (
             |  SELECT
             |    CAST(floor(CAST(l_partkey AS DOUBLE) * 65536.0 / (mxp + 1.0)) AS BIGINT) AS x16,
             |    CAST(floor(CAST(l_suppkey AS DOUBLE) * 65536.0 / (mxs + 1.0)) AS BIGINT) AS y16
             |  FROM lineitem, mx),
             |fids AS (
             |  SELECT x16, y16,
             |    ($duckZ) >> 26 AS fid_zorder,
             |    x16 >> 10 AS fid_linear
             |  FROM base),
             |pz AS (
             |  SELECT fid_zorder AS fid, count(*) AS cnt,
             |    min(x16) AS min_x, max(x16) AS max_x,
             |    min(y16) AS min_y, max(y16) AS max_y
             |  FROM fids GROUP BY 1),
             |pl AS (
             |  SELECT fid_linear AS fid, count(*) AS cnt,
             |    min(x16) AS min_x, max(x16) AS max_x,
             |    min(y16) AS min_y, max(y16) AS max_y
             |  FROM fids GROUP BY 1),
             |sz AS (
             |  SELECT 'zorder' AS layout, count(*) AS n_files,
             |    CAST(sum(CASE WHEN max_x >= $PLo AND min_x < $PHi AND max_y >= $SLo AND min_y < $SHi
             |        THEN 1 ELSE 0 END) AS BIGINT) AS n_files_read,
             |    CAST(sum(CASE WHEN max_x >= $PLo AND min_x < $PHi AND max_y >= $SLo AND min_y < $SHi
             |        THEN cnt ELSE 0 END) AS BIGINT) AS rows_in_read_files,
             |    CAST(sum(CASE WHEN max_x >= $PLo AND min_x < $PHi AND max_y >= $SLo AND min_y < $SHi
             |        THEN max_y - min_y ELSE 0 END) AS BIGINT) AS sum_y_span_read
             |  FROM pz),
             |sl AS (
             |  SELECT 'linear' AS layout, count(*) AS n_files,
             |    CAST(sum(CASE WHEN max_x >= $PLo AND min_x < $PHi AND max_y >= $SLo AND min_y < $SHi
             |        THEN 1 ELSE 0 END) AS BIGINT) AS n_files_read,
             |    CAST(sum(CASE WHEN max_x >= $PLo AND min_x < $PHi AND max_y >= $SLo AND min_y < $SHi
             |        THEN cnt ELSE 0 END) AS BIGINT) AS rows_in_read_files,
             |    CAST(sum(CASE WHEN max_x >= $PLo AND min_x < $PHi AND max_y >= $SLo AND min_y < $SHi
             |        THEN max_y - min_y ELSE 0 END) AS BIGINT) AS sum_y_span_read
             |  FROM pl)
             |SELECT * FROM sz UNION ALL SELECT * FROM sl ORDER BY layout""".stripMargin),
    ),
  )
}
