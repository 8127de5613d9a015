package graft

import org.apache.spark.sql.DataFrame

/** Partitioning helpers for expansion-heavy operators.
  *
  * A sliding-window explode multiplies row count by ~|text| before the
  * first shuffle, so the expansion inherits the SCAN's parallelism. A
  * small corpus arrives as one parquet split (row-group granularity —
  * `spark.sql.files.maxPartitionBytes` can't split a single row group),
  * serializing the whole explode+hash pipeline onto one core.
  */
object Partitioning {

  /** Round-robin fan-out of a (small, pre-expansion) input to the
    * session's default parallelism — only when the scan would yield
    * fewer partitions. The shuffled volume is the pre-expansion corpus
    * (k× smaller than the window stream it feeds), and on a real
    * cluster a 100 TB corpus already arrives in thousands of splits,
    * where this is a no-op — the guard keeps it from ever reshuffling a
    * big scan.
    *
    * The guard reads the OPTIMIZED plan's size estimate (file-size sum
    * for a parquet scan), never the physical plan: `df.rdd` here would
    * compile a physical plan that the enclosing query then recompiles —
    * double planning on every query build. A source is "small" when its
    * estimated bytes can't fill `target` scan splits of
    * `spark.sql.files.maxPartitionBytes` each.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val splitBytes =
      try spark.sessionState.conf.filesMaxPartitionBytes
      catch { case _: Throwable => 128L * 1024 * 1024 }
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(splitBytes) * target) df.repartition(target) else df
  }
}
