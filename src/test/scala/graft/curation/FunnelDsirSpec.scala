package graft.curation

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{Tables, TestSpark}

class FunnelDsirSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("curation funnel: stages are monotone non-increasing, raw = corpus size") {
    val rows = Curation.curationFunnel(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    rows.map(_._2) shouldBe Seq("raw", "quality", "exact_dedup", "repetition")
    rows.head._3 shouldBe docs.count()
    rows.sliding(2).foreach { case Array(a, b) => b._3 should be <= a._3 }
    // the gates actually cut something on this corpus (not all-pass)
    rows.last._3 should be < rows.head._3
    rows.last._3 should be > 0L
  }

  test("curation funnel: a known dup group survives exactly once") {
    val dup = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 200L),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s", 200L),
      (3L, "unique words only here today friend", "en", "s", 150L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Curation.curationFunnel(dup)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows(1L) shouldBe 3L // raw
    rows(2L) shouldBe 3L // all pass the length gate (n_chars >= 100)
    rows(3L) shouldBe 2L // one copy of the dup pair removed
    rows(4L) shouldBe 2L // no token dominates 1/4 of either survivor
  }

  test("dsir selection: excludes target-source docs and is deterministic") {
    val sel = Curation.dsirImportanceSelect(docs, "src0", k = 30).collect()
    sel.length shouldBe 30
    sel.map(_.getString(1)).toSet should not contain "src0"
    // deterministic under repartitioning (exact integer arithmetic)
    val again = Curation.dsirImportanceSelect(
      docs.repartition(7), "src0", k = 30).collect()
    sel.map(r => (r.getLong(0), r.getLong(2))).toSeq shouldBe
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq
  }

  test("dsir weighting: a doc made of target-only vocabulary outranks one of novel vocabulary") {
    val corpus = Seq(
      // target slice defines the vocabulary {aa, bb}
      (1L, "aa bb aa bb", "tgt", "en", 10L),
      // raw doc entirely inside the target vocabulary
      (2L, "aa bb aa aa", "web", "en", 10L),
      // raw doc entirely outside it (weight 0 tokens only)
      (3L, "cc dd cc dd", "web", "en", 10L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val sel = Curation.dsirImportanceSelect(corpus, "tgt", k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    sel(2L) should be > sel(3L)
    sel(3L) shouldBe 0L
  }
}
