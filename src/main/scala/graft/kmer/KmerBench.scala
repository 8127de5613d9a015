package graft.kmer

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Micro-benchmark main deciding the kmer explode strategy: codegen'd
  * `explode(sequence(...))` (array materialization per row) vs the
  * interpreted [[KmerGenerator]] (no array, but a codegen boundary).
  * Run: `sbt "runMain graft.kmer.KmerBench"` with SPARK_GRAFT_SF_DIR.
  */
object KmerBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    def time(label: String, mk: Int => DataFrame): Unit = {
      for (k <- Seq(3, 8, 21)) {
        mk(k).write.format("noop").mode("overwrite").save() // warm-up
        val t0 = System.nanoTime()
        mk(k).write.format("noop").mode("overwrite").save()
        println(f"$label k=$k%-3d ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("explode(sequence)", k =>
      Kmers.kmers(docs, "text", k).groupBy("word").count())
    time("KmerGenerator    ", k =>
      Kmers.kmersGen(docs, "text", k).groupBy("word").count())
    spark.stop()
  }
}
