package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class SortedNeighborhoodSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("globalRank equals the single-window row_number for any bucket count") {
    val df = Seq(
      (1L, 50L), (2L, 10L), (3L, 10L), (4L, 99L), (5L, 7L), (6L, 50L)
    ).toDF("doc_id", "key")
    val expected = df
      .withColumn("rank", expr("CAST(row_number() over (order by key, doc_id) AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (buckets <- Seq(1, 2, 4, 32)) {
      val got = SortedNeighborhood.globalRank(df, buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      withClue(s"buckets=$buckets: ") { got shouldBe expected }
    }
  }

  test("prefix-adjacent near-dups pair; sort-distant docs never meet") {
    val docs = Seq(
      // three templated titles sharing a long prefix -> adjacent in sort
      (1L, "Invoice #1001 for ACME Corp, January"),
      (2L, "Invoice #1002 for ACME Corp, February"),
      (3L, "Invoice #1003 for ACME Corp, March"),
      // unrelated docs far away in the sort order
      (10L, "zebra crossing patterns in urban planning"),
      (11L, "quantum chromodynamics lattice results")
    ).toDF("doc_id", "text")
    val pairs = SortedNeighborhood.snmNearDupPairs(docs, w = 3, maxLev = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain allOf ((1L, 2L), (2L, 3L), (1L, 3L))
    // invoice docs never pair with the unrelated tail
    pairs.foreach { case (a, b) =>
      Set(10L, 11L).intersect(Set(a, b)).size should not be 1
    }
  }

  test("window bound w: only w successors are candidates") {
    // five docs with identical keys -> sort order is doc_id order
    val docs = (1L to 5L).map(i => (i, "identical text prefix shared by all"))
      .toDF("doc_id", "text")
    val pairs = SortedNeighborhood.snmNearDupPairs(docs, w = 2, maxLev = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.map(p => (p._1, p._2)).toSet shouldBe Set(
      (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 5L), (4L, 5L))
    pairs.foreach(p => (p._2 - p._1) should be <= 2L)
  }

  test("rank join is a permutation: each doc appears at most w times per side") {
    val docs = (1L to 20L).map(i => (i, s"document body number $i with words"))
      .toDF("doc_id", "text")
    val all = SortedNeighborhood.snmNearDupPairs(docs, w = 3, maxLev = 32)
      .collect()
    all.groupBy(_.getLong(0)).values.foreach(_.length should be <= 3)
  }
}
