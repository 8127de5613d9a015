package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{EngineQuery, Tables}

/** Row-format source coverage: CSV, JSON-lines, and ORC reads of the
  * same relation, each verified against the parquet-table oracle. The
  * reference's only format is whole text files; a pipeline engine must
  * ingest the common row formats with explicit schemas (schema
  * inference is a full extra pass at 100 TB — always pass the schema).
  *
  * Materialization is one-time test plumbing, as in [[CorpusSource]].
  */
object FormatSources {

  private def base: String = graft.OutDir.base

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def dirFor(sfDir: String, fmt: String): String =
    s"$base/graft_formats/${sfDir.replaceAll("[^A-Za-z0-9.]+", "_")}/$fmt"

  private def materialize(spark: SparkSession, sfDir: String, fmt: String): String = synchronized {
    val dir = dirFor(sfDir, fmt)
    if (!new File(dir, "_SUCCESS").exists()) {
      val df = Tables.events(spark, sfDir).select("event_id", "user_id", "event_type", "value")
      fmt match {
        case "csv" => df.write.mode("overwrite").option("header", "true").csv(dir)
        case "json" => df.write.mode("overwrite").json(dir)
        case "orc" => df.write.mode("overwrite").orc(dir)
        case "xml" => df.write.mode("overwrite").option("rowTag", "event").xml(dir)
      }
    }
    dir
  }

  /** Read back with an explicit schema (no inference pass). */
  def read(spark: SparkSession, sfDir: String, fmt: String): DataFrame = {
    val dir = materialize(spark, sfDir, fmt)
    fmt match {
      case "csv" => spark.read.schema(schema).option("header", "true").csv(dir)
      case "json" => spark.read.schema(schema).json(dir)
      case "orc" => spark.read.orc(dir)
      // XML is a first-class Spark 4 source (spark-xml was merged into
      // core) — same explicit-schema contract as the text formats.
      case "xml" => spark.read.schema(schema).option("rowTag", "event").xml(dir)
    }
  }

  private def rollupOf(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"),
        max(col("event_id")).as("max_event_id"))
      .orderBy("event_type")

  private val oracle =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  max(event_id) AS max_event_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Two parquet generations under one root with different schemas —
    * generation 1 lacks `event_type` (added later, the classic corpus
    * evolution). `mergeSchema` unions the footers; gen-1 rows read the
    * missing column as NULL. At 100 TB schema evolution is a fact of
    * life: the engine must read a decade of layouts in one scan, not
    * migrate petabytes.
    */
  private def materializeEvolved(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "evolved")
    if (!new File(s"$dir/v2", "_SUCCESS").exists()) {
      val df = Tables.events(spark, sfDir).select("event_id", "user_id", "event_type", "value")
      df.where(col("event_id") % 2 === 0).drop("event_type")
        .write.mode("overwrite").parquet(s"$dir/v1")
      df.where(col("event_id") % 2 =!= 0)
        .write.mode("overwrite").parquet(s"$dir/v2")
    }
    dir
  }

  def readEvolved(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = materializeEvolved(spark, sfDir)
    spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/v1", s"$dir/v2")
  }

  /** A JSON-lines landing with deliberately malformed records (every
    * 10th line loses its tail) — real ingestion is never clean, and at
    * 100 TB one bad line must not kill the scan. PERMISSIVE mode + an
    * explicit corrupt-record column turn bad lines into data: the raw
    * line is captured, schema fields are NULL, and quarantine
    * accounting is a plain aggregation. (JSON, not CSV, for the demo:
    * CSV's documented PERMISSIVE semantics null-fill token-count
    * mismatches WITHOUT marking the record corrupt, so a malformed JSON
    * object is the dependable corrupt-capture path.)
    */
  private def materializeMalformed(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "malformed_json")
    if (!new File(dir, "_SUCCESS").exists()) {
      val good = to_json(struct(
        col("event_id"), col("user_id"), col("event_type"), col("value")))
      Tables.events(spark, sfDir)
        .select(
          when(col("event_id") % 10 === 0, good.substr(lit(1), length(good) - 5))
            .otherwise(good)
            .as("value"))
        .write.mode("overwrite").text(dir)
    }
    dir
  }

  def readMalformed(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = materializeMalformed(spark, sfDir)
    val withCorrupt = schema.add(StructField("_corrupt", StringType))
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
  }

  def engineQueries: Seq[EngineQuery] =
    Seq("csv", "json", "orc", "xml").map { fmt =>
      EngineQuery(
        s"${fmt}_source_scan",
        (s, dir) => rollupOf(read(s, dir, fmt)),
        Some(oracle),
      )
    } :+ EngineQuery(
      "json_malformed_scan",
      (s, dir) =>
        readMalformed(s, dir)
          .groupBy(
            when(col("_corrupt").isNotNull, lit("<corrupt>"))
              .otherwise(col("event_type")).as("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            max(col("event_id")).as("max_event_id"))
          .orderBy("event_type"),
      // the oracle applies the corruption rule to the original table:
      // every 10th row lands in the quarantine bucket with NULL fields
      // (the raw line lives only in the corrupt column)
      Some("""SELECT CASE WHEN event_id % 10 = 0 THEN '<corrupt>' ELSE event_type END AS event_type,
             |  count(*) AS cnt,
             |  max(CASE WHEN event_id % 10 <> 0 THEN event_id END) AS max_event_id
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ) :+ EngineQuery(
      "schema_evolution_scan",
      (s, dir) =>
        readEvolved(s, dir)
          .groupBy(coalesce(col("event_type"), lit("<pre-schema>")).as("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"),
            max(col("event_id")).as("max_event_id"))
          .orderBy("event_type"),
      // The oracle reads the ORIGINAL table and applies the generation
      // rule: even event_ids were written before event_type existed.
      Some("""SELECT CASE WHEN event_id % 2 = 0 THEN '<pre-schema>' ELSE event_type END AS event_type,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
             |  max(event_id) AS max_event_id
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    )
}
