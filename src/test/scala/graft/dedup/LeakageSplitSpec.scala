package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** The defining invariant of [[Dedup.leakageSafeSplit]]: a near-dup
  * component NEVER straddles splits (the contamination a doc_id-hash
  * split permits), docs with no near-dup keep the plain
  * `split_assign` assignment (same md5 rule on their own id), and the
  * assignment is deterministic across reruns.
  */
class LeakageSplitSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("no component straddles splits; singletons match split_assign") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = Dedup.leakageSafeSplit(docs).cache()

    // every grp maps to exactly one split
    out.groupBy("grp").agg(countDistinct("split").as("ns"))
      .where(col("ns") > 1).count() shouldBe 0L

    // clustered docs carry their component label as grp
    val comp = Dedup.connectedComponents(Dedup.minhashCandidatePairs(docs))
    val mismatched = out.join(comp, Seq("doc_id"))
      .where(col("grp") =!= col("component")).count()
    mismatched shouldBe 0L

    // docs outside any component fall back to their own id — and for
    // those, the assignment equals split_assign's
    val solo = out.join(comp, Seq("doc_id"), "left_anti")
    solo.where(col("grp") =!= col("doc_id")).count() shouldBe 0L
    val plain = graft.curation.Curation.splitAssign(docs)
    solo.join(plain.withColumnRenamed("split", "plain_split"), Seq("doc_id"))
      .where(col("split") =!= col("plain_split")).count() shouldBe 0L

    // all docs assigned, exactly once
    out.count() shouldBe docs.count()
    out.unpersist()
  }

  test("a synthetic near-dup pair spanning the hash boundary lands together") {
    // Construct two docs whose individual id-hash splits DIFFER but
    // which are near-dups of each other — the exact leakage case.
    // Find two ids with different split_assign buckets, give them the
    // same text (exact dup -> same component), and check both land in
    // ONE split under leakageSafeSplit.
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val ids = graft.curation.Curation
      .splitAssign((1L to 200L).map((_, "x")).toDF("doc_id", "text"))
      .select("doc_id", "split").as[(Long, String)].collect()
    val bys = ids.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val trainId = bys("train").head
    val testId = bys("test").head
    val docs = Seq(
      (trainId, t), (testId, t),
      (9999L, "completely different content nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Dedup.leakageSafeSplit(docs)
    val splits = out.where(col("doc_id").isin(trainId, testId))
      .select("split").distinct().as[String].collect()
    splits.length shouldBe 1
  }
}
