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
  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects; read nanos as long and rebuild a
    * microsecond timestamp (flooring — agrees with DuckDB's epoch_ms on
    * the original nanos for every downstream ms-granularity use).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
