package graft.curation

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class MaxCoverSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Naive greedy over word-3-gram sets. */
  private def naive(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] = {
    def grams(t: String): Set[String] = {
      val ts = t.trim.split("\\s+").toSeq
      if (ts.length < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val gs = docs.map { case (id, t) => id -> grams(t) }.toMap
    var covered = Set.empty[String]
    var picked = Set.empty[Long]
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var step = 1L
    var done = false
    while (!done && step <= k) {
      val cands = gs.view
        .filterKeys(id => !picked(id))
        .mapValues(g => (g -- covered).size)
        .filter(_._2 > 0).toSeq
      if (cands.isEmpty) done = true
      else {
        val (id, gain) = cands.minBy { case (i, g) => (-g, i) }
        out += ((step, id, gain.toLong))
        covered ++= gs(id); picked += id; step += 1
      }
    }
    out.toSeq
  }

  test("greedy trajectory matches the naive reference (randomized overlap)") {
    val rnd = new scala.util.Random(31)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    for (trial <- 1 to 8) {
      val docs = (0L until 30L).map { id =>
        id -> Array.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = MaxCover.select(docs.toDF("doc_id", "text"), k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      withClue(s"trial=$trial: ") { got shouldBe naive(docs, 4) }
    }
  }

  test("stops early when nothing adds coverage") {
    // two identical docs + one distinct: step 3 has no positive gain
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y z w"), (3L, "p q r")).toDF("doc_id", "text")
    val got = MaxCover.select(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    got shouldBe Array((1L, 1L, 2L), (2L, 3L, 1L))
  }

  test("ties break to the smallest doc_id") {
    val docs = Seq((7L, "a b c"), (4L, "d e f")).toDF("doc_id", "text")
    MaxCover.select(docs, k = 1).collect().head.getLong(1) shouldBe 4L
  }

  test("CELF lazy-greedy lands on the identical trajectory (randomized)") {
    val rnd = new scala.util.Random(47)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    for (trial <- 1 to 6) {
      val docs = (0L until 30L).map { id =>
        id -> Array.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      val eager = MaxCover.select(df, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val lazyT = MaxCover.selectLazy(df, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      withClue(s"trial=$trial: ") { lazyT shouldBe eager }
    }
  }

  test("CELF stops early and matches select when nothing adds coverage") {
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y z w"), (3L, "p q r")).toDF("doc_id", "text")
    val got = MaxCover.selectLazy(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    got shouldBe Array((1L, 1L, 2L), (2L, 3L, 1L))
  }

  test("CELF probes are doc-local and bounded (laziness is real)") {
    val rnd = new scala.util.Random(53)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0L until 40L).map { id =>
      id -> Array.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    MaxCover.selectLazy(docs.toDF("doc_id", "text"), k = 4).collect()
    // worst case would be ~n_docs probes per pick; CELF should do far
    // fewer — assert it stays under one full re-evaluation sweep total
    MaxCover.lastLazyProbes should be >= 1
    MaxCover.lastLazyProbes should be < 40
  }
}
