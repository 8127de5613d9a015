package graft.curation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** The end-of-pipeline shard export ([[Curation.exportTrainingShards]] /
  * [[Curation.trainingShardAssignment]] /
  * [[graft.sources.Sinks.writeTrainingShards]]): bounded shard sizes,
  * sequence integrity, conservation against the packed curated corpus,
  * determinism, and the physical write round-trip (the CompactionSpec
  * precedent).
  */
class ShardExportSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val docs = graft.Tables.documents(spark, sfDir)

  test("shard sizes are balanced to +-1 sequence; totals conserve the packed curated corpus") {
    val shards = Curation.exportTrainingShards(docs, minScore = 0.51, budget = 512, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    shards.map(_._1).sorted shouldBe (0L until 8L).toArray
    // round-robin over the md5-shuffled rank: provably +-1, not just expected
    (shards.map(_._2).max - shards.map(_._2).min) should be <= 1L
    // conservation: every curated doc and token lands in exactly one shard
    val asg = Curation.trainingShardAssignment(docs, minScore = 0.51, budget = 512, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    shards.map(_._3).sum shouldBe asg.length.toLong
    asg.map(_._1).distinct.length shouldBe asg.length // one shard per doc
    // sequence integrity: all docs of one (lang, bin) sequence share a shard
    asg.groupBy(t => (t._2, t._3)).values.foreach { seq =>
      seq.map(_._4).distinct.length shouldBe 1
    }
  }

  test("assignment is deterministic and restart-reproducible") {
    def run(): Set[(Long, Long)] =
      Curation.trainingShardAssignment(docs, minScore = 0.51, budget = 512, nShards = 8)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    run() shouldBe run()
  }

  test("a different shard count re-deals the same sequences, never re-packs them") {
    def seqsOf(n: Int): Map[(String, Long), Long] =
      Curation.trainingShardAssignment(docs, minScore = 0.51, budget = 512, nShards = n)
        .collect().map(r => ((r.getString(1), r.getLong(2)), r.getLong(3)))
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.head }
    val at8 = seqsOf(8)
    val at3 = seqsOf(3)
    at8.keySet shouldBe at3.keySet // identical sequence set
    at3.values.toSet.subsetOf((0L until 3L).toSet) shouldBe true
  }

  test("physical write round-trip: shard=N layout matches the assignment, content intact") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val asgDf = Curation.trainingShardAssignment(docs, minScore = 0.51, budget = 512, nShards = 4)
    graft.sources.Sinks.writeTrainingShards(docs, asgDf, out)
    val back = spark.read.parquet(out)
    val asg = asgDf.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val got = back.select(col("doc_id"), col("shard").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe asg
    // text survives the round trip byte-exactly
    val origText = docs.join(asgDf.select("doc_id"), Seq("doc_id"))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    back.select("doc_id", "text").collect().foreach { r =>
      r.getString(1) shouldBe origText(r.getLong(0))
    }
  }
}
