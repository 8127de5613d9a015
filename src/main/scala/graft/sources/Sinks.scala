package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's two sinks, Spark-shaped:
  *
  *  - the `output.txt` count relation, `"<word> : <count>"` text lines
  *    (reference `print_mapped_counts`, `src/main.cpp:55-73` — there a
  *    hardcoded single file; here a parallel text write, one part per
  *    partition, `coalesce(1)` only if a single file is demanded);
  *  - the `points.txt` append-mode metrics row
  *    (reference `POINTSFILE`, `src/main.cpp:19-38`) as append CSV.
  */
object Sinks {

  /** Write a (word, cnt) relation in the reference's output format. */
  def writeCounts(counts: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val lines = counts.select(concat_ws(" : ", col("word"), col("cnt")).as("value"))
    (if (singleFile) lines.coalesce(1) else lines)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Append one metrics row (the POINTSFILE analog). */
  def appendMetricsRow(
      df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).option("header", "false").csv(path)

  /** Small-files compaction — the housekeeping pass every long-lived
    * 100 TB table needs (streaming ingest and fine-grained partitions
    * accrete thousands of KB-sized files; each costs a task + open per
    * scan). One distributed rewrite: `repartition` bounds the file
    * count from below, `maxRecordsPerFile` from above, so output files
    * land in [target/2, target] records regardless of input skew.
    * Returns the row count for the caller's invariant check.
    */
  /** Physical training-shard write: the curated corpus laid out in the
    * deterministic shard structure
    * [[graft.curation.Curation.trainingShardAssignment]] computed — one
    * `shard=N/` parquet directory per shard, so a trainer (or a
    * per-shard reader) opens exactly its slice. partitionBy writes each
    * shard from the tasks that hold its rows (no extra global shuffle
    * beyond the assignment join); at 100 TB pair with
    * [[compactParquet]] per shard if fine-grained task output needs
    * re-grain. Deterministic content: the assignment is md5-ranked, so
    * the same corpus always produces byte-equal shard memberships.
    */
  def writeTrainingShards(
      docs: org.apache.spark.sql.DataFrame,
      assignment: org.apache.spark.sql.DataFrame, outDir: String): Unit =
    docs.join(assignment.select("doc_id", "shard"), Seq("doc_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)

  def compactParquet(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetRecordsPerFile: Int): Long = {
    val df = spark.read.parquet(inDir)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRecordsPerFile).toInt)
    df.repartition(files)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRecordsPerFile.toString)
      .parquet(outDir)
    n
  }
}
