package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{EngineQuery, Tables}

/** ANALYZE-style table profiling — per-column row/null/distinct counts
  * and typed min/max, the statistics layer under optimizer costing,
  * data-quality monitoring, and ingest validation (every warehouse's
  * ANALYZE TABLE / dbt source freshness / Deequ profile). Not in the
  * reference (no tables); engine-infrastructure extension.
  *
  * Shape: ONE aggregation pass computes every metric for every column
  * — no per-column scans. The multiple exact COUNT(DISTINCT)s rewrite
  * into a single Expand-based aggregate (one shuffle, data ×(ncols+1)
  * map-side). That expansion is the scale knob: at 100 TB you swap
  * `countDistinct` for `approx_count_distinct` (same plan minus the
  * Expand; the engine's `hll_partitioned_distinct` query is that
  * sketch path) — exact distinct is kept HERE because the gate
  * cross-checks the values against DuckDB exactly.
  *
  * Type portability: numeric min/max surface as double (exact casts of
  * the stored values); timestamps as epoch MICROSECOND doubles (micros
  * < 2^53, so the double is exact); strings in their own min/max
  * columns. The one wide row unpivots to one row per column via a
  * generator projection, so the gate relation is (col_name, metrics…).
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    def numView(f: StructField) = f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      // parquet timestamps surface as NTZ (isAdjustedToUTC=false);
      // session TZ is UTC everywhere in this engine, so the NTZ→TZ cast
      // is the identity wall-clock mapping DuckDB's epoch_us applies
      case _: TimestampType | _: TimestampNTZType =>
        Some(unix_micros(col(f.name).cast("timestamp")).cast("double"))
      case _ => None
    }
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val isStr = f.dataType == StringType
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        countDistinct(c).as(s"__nd_${f.name}"),
        numView(f).map(min).getOrElse(min(nullD)).as(s"__minn_${f.name}"),
        numView(f).map(max).getOrElse(max(nullD)).as(s"__maxn_${f.name}"),
        (if (isStr) min(c) else min(nullS)).as(s"__mins_${f.name}"),
        (if (isStr) max(c) else max(nullS)).as(s"__maxs_${f.name}"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one
      .select(explode(array(fields.map { f =>
        struct(
          lit(f.name).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_${f.name}")).as("n_nulls"),
          col(s"__nd_${f.name}").as("n_distinct"),
          col(s"__minn_${f.name}").as("min_num"),
          col(s"__maxn_${f.name}").as("max_num"),
          col(s"__mins_${f.name}").as("min_str"),
          col(s"__maxs_${f.name}").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** The catalog half of ANALYZE (the [[profile]] relation is the
    * observable half): register `name` as a catalog parquet table over
    * `sfDir` and compute table + column statistics, so Catalyst's CBO
    * (`spark.sql.cbo.enabled`) can estimate filter selectivity and
    * join build sides from ndv/min/max instead of raw file size. The
    * engine's gate queries read paths (no catalog), so they plan on
    * AQE's runtime re-estimation; this is the write-side workflow a
    * persistent deployment runs after ingest — ANALYZE once, every
    * subsequent query's compile-time join order/build-side improves.
    * `StatsPlanningSpec` pins a join whose broadcast decision flips
    * exactly when these stats are present.
    */
  def analyzeTable(
      spark: org.apache.spark.sql.SparkSession, sfDir: String, name: String): String = {
    Tables.ensureLegacyParquetConf(spark)
    val cat = s"graft_stats_$name"
    spark.sql(s"DROP TABLE IF EXISTS $cat")
    spark.sql(s"CREATE TABLE $cat USING parquet LOCATION '$sfDir/$name.parquet'")
    spark.sql(s"ANALYZE TABLE $cat COMPUTE STATISTICS FOR ALL COLUMNS")
    cat
  }

  /** DuckDB mirror: one UNION ALL branch per column (the oracle can
    * afford per-column scans at verification scale). */
  private def duckProfile(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (name, kind) =>
      val (minN, maxN) = kind match {
        case "num" => (s"CAST(min(CAST($name AS DOUBLE)) AS DOUBLE)",
          s"CAST(max(CAST($name AS DOUBLE)) AS DOUBLE)")
        case "ts" => (s"CAST(min(epoch_us($name)) AS DOUBLE)",
          s"CAST(max(epoch_us($name)) AS DOUBLE)")
        case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      }
      val (minS, maxS) =
        if (kind == "str") (s"min($name)", s"max($name)")
        else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      s"""SELECT '$name' AS col_name, count(*) AS n_rows,
         |  count(*) - count($name) AS n_nulls,
         |  count(DISTINCT $name) AS n_distinct,
         |  $minN AS min_num, $maxN AS max_num,
         |  $minS AS min_str, $maxS AS max_str
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  private val lineitemCols = Seq(
    "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
    "l_linenumber" -> "num", "l_quantity" -> "num", "l_extendedprice" -> "num",
    "l_discount" -> "num", "l_tax" -> "num", "l_returnflag" -> "str",
    "l_linestatus" -> "str", "l_shipdate" -> "ts")

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "profile_lineitem",
      (s, dir) => profile(Tables.lineitem(s, dir)),
      Some(duckProfile("lineitem", lineitemCols)),
    ),
  )
}
