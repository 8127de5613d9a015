package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver harness's TPC-H-ish test data
  * (see /root/repo/TESTDATA.md). The reference engine's only source is a
  * directory-of-text-files scan (reference `src/helper.cpp:21-39`); here
  * the harness serves Parquet, which Spark scans with column pruning +
  * predicate pushdown for free.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** The harness has served the events table with different physical
    * types for `ts` across data regenerations: TIMESTAMP(NANOS) (which
    * Spark's vectorized reader only accepts as a raw long via the
    * legacy conf) and plain-micros TIMESTAMP / TIMESTAMP_NTZ. Branch on
    * the type that actually arrived so a regeneration can never again
    * break every events-dependent query at plan time (the r9 outage).
    * All branches yield session-zone `TimestampType` micros; with the
    * engine's fixed UTC session zone the micros value equals what
    * DuckDB reads, so oracles hold across all three encodings.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: rebuild micros (flooring — agrees with DuckDB's
        // epoch on the original nanos at every ms-granularity use)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // wall-clock micros: reinterpret in the (UTC) session zone
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other; " +
            "expected INT64 (nanos), TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(spark, sfDir, "events"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
