package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{EngineQuery, Tables}

/** Bucketed table layout for co-located joins: both sides are written
  * pre-hashed into the same number of buckets on the join key
  * (`bucketBy` + `sortBy`), so an equi-join on that key plans with NO
  * shuffle on either side — each task sort-merges bucket i against
  * bucket i. This is the disk-layout answer to "reuse a partitioning
  * across stages": at 100 TB, every downstream join/aggregation on the
  * bucket key skips its exchange forever, amortizing one write-time
  * shuffle across all future queries.
  *
  * The in-memory session catalog holds the bucketing spec here; a
  * cluster metastore persists it. Spark-side only — the oracle sees
  * the plain unbucketed join (results must be identical; bucketing is
  * pure physical layout).
  */
object BucketedTables {

  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!spark.catalog.tableExists("orders_bucketed")) {
      // the in-memory catalog forgets tables between JVMs while the
      // warehouse dir persists — clear stale locations before create
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Seq("orders_bucketed", "customer_bucketed").foreach { t =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
      }
      Tables.orders(spark, sfDir)
        .write.bucketBy(16, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bucketed")
      Tables.customer(spark, sfDir)
        .write.bucketBy(16, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bucketed")
    }
  }

  /** The co-located join itself (no aggregation — plan inspection
    * target: SortMergeJoin with zero hash exchanges).
    */
  def colocatedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark, sfDir)
    val o = spark.table("orders_bucketed")
    val c = spark.table("customer_bucketed")
    o.join(c, o("o_custkey") === c("c_custkey"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "bucketed_join_revenue",
      (s, dir) =>
        colocatedJoin(s, dir)
          .groupBy(col("c_nationkey").cast("long").as("nationkey"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("double").as("revenue"))
          .orderBy("nationkey"),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY nationkey ORDER BY nationkey""".stripMargin),
    ),
  )
}
