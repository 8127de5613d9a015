package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Hive-style partitioned data layout: the disk-level analog of the
  * engine's in-memory partitioning story. Writing a table
  * `partitionBy(col)` turns equality predicates on that column into
  * partition PRUNING — whole directories never open, visible as
  * `PartitionFilters` on the scan — which at 100 TB is the difference
  * between scanning one partition and scanning the lake.
  *
  * Layout materialization is one-time test plumbing (like
  * [[CorpusSource]]); on a real deployment the table is written
  * partitioned in the first place.
  */
object PartitionedLayout {

  private def base: String = graft.OutDir.base

  /** events laid out as event_type=<v>/ parquet dirs (one-time). */
  def materialize(spark: SparkSession, sfDir: String): String = synchronized {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val dir = s"$base/graft_partitioned/$name"
    if (!new File(dir, "_SUCCESS").exists()) {
      Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "value")
        .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    }
    dir
  }

  def readLayout(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(materialize(spark, sfDir))

  def engineQueries: Seq[EngineQuery] = Seq(
    // The equality predicate must resolve via partition pruning (scan
    // shows PartitionFilters, non-matching dirs never read); result
    // must equal the same filter over the unpartitioned table.
    EngineQuery(
      "partitioned_scan_prune",
      (s, dir) =>
        readLayout(s, dir)
          .where(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
              .cast("double").as("sum_value"))
          .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS cnt,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
  )
}
