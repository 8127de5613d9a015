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
    * session's default parallelism — only when the scan yields fewer
    * partitions. The shuffled volume is the pre-expansion corpus (k×
    * smaller than the window stream it feeds), and on a real cluster a
    * 100 TB corpus already arrives in thousands of splits, where this
    * is a no-op — the guard keeps it from ever reshuffling a big scan.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
