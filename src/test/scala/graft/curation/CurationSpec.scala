package graft.curation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{Tables, TestSpark}

class CurationSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("split assignment is deterministic and partitioning-invariant") {
    val a = Curation.splitAssign(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Curation.splitAssign(docs.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    a shouldBe b // a rand()-based split would fail this
    a.values.toSet shouldBe Set("train", "val", "test")
    // 80/10/10 within hash tolerance on 500 docs
    val train = a.values.count(_ == "train").toDouble / a.size
    train should (be > 0.7 and be < 0.9)
  }

  test("stratified sample honors per-stratum rates") {
    val sampled = Curation.stratifiedSample(docs, Map("en" -> 1000, "zh" -> 0), 500)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang("en") shouldBe total("en") // rate 1000/1000 keeps everything
    byLang.get("zh") shouldBe None    // rate 0 drops everything
  }

  test("shuffle order is a permutation of 1..n and stable across runs") {
    val pos = Curation.shuffleOrder(docs).collect().map(_.getLong(1)).sorted
    pos shouldBe (1L to pos.length.toLong).toArray
    // not the identity order (it actually shuffles)
    val firstIds = Curation.shuffleOrder(docs).orderBy("pos").limit(10)
      .collect().map(_.getLong(0)).toSeq
    firstIds should not be firstIds.sorted
    Curation.shuffleOrder(docs.repartition(5)).orderBy("pos").limit(10)
      .collect().map(_.getLong(0)).toSeq shouldBe firstIds
  }

  test("repetition score flags boilerplate over natural text") {
    val d = Seq(
      (1L, "spam spam spam spam spam ham"),
      (2L, "all words here are fully distinct tokens")).toDF("doc_id", "text")
    val scores = Curation.repetitionScore(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    scores(1L) shouldBe (5.0 / 6.0) +- 1e-12
    scores(2L) shouldBe (1.0 / 7.0) +- 1e-12
  }

  test("pii scrub counts and redacts emails/phones") {
    val d = Seq(
      (1L, "reach me at a.b@corp.io or 555-123-4567 thanks"),
      (2L, "no contact info here")).toDF("doc_id", "text")
    val out = Curation.piiScrub(d, col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((1L, 1L))
    out(2L) shouldBe ((0L, 0L))
    // scrubbed text differs iff something was redacted
    val hashes = Curation.piiScrub(d, col("text")).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val plain = d.select(col("doc_id"), md5(col("text"))).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hashes(1L) should not be plain(1L)
    hashes(2L) shouldBe plain(2L)
  }

  test("decontamination flags exactly the docs sharing a holdout n-gram") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different words with no overlap at all here")).toDF("doc_id", "text")
    val holdout = Seq((99L, "the quick brown fox jumps straight up")).toDF("doc_id", "text")
    val flagged = Curation.decontaminate(corpus, holdout, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    flagged.keySet shouldBe Set(1L) // shares "the quick brown fox jumps"
    flagged(1L) shouldBe 1L
  }

  test("balanced cap keeps at most N per stratum, deterministically") {
    val capped = Curation.balancedCap(docs, "lang", 10)
    val byLang = capped.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    all(byLang.values) should be <= 10L
    // deterministic under repartitioning
    val a = capped.collect().map(_.getLong(0)).sorted
    val b = Curation.balancedCap(docs.repartition(7), "lang", 10).collect().map(_.getLong(0)).sorted
    a shouldBe b
  }

  test("pack fragmentation: straddling doc counted, tail fill exact") {
    // three 300-token docs, budget 512: cum 0/300/600 -> bins 0/0/1,
    // end bins 0/1/1 -> doc 2 straddles; 900 % 512 = 388 tail tokens.
    def doc(i: Long) = (i, Seq.fill(300)("w").mkString(" "), "en")
    val d = Seq(doc(1), doc(2), doc(3)).toDF("doc_id", "text", "lang")
    val r = Curation.packFragmentationReport(d, budget = 512).collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) shouldBe
      ((3L, 900L, 2L, 1L, 333333L, (1000000L * 388) / 512))
  }

  test("dedup savings: keeper never counted, ppm exact") {
    val d = Seq(
      (1L, "x", "A", 1L), (2L, "x", "A", 1L), (3L, "y", "A", 1L),
      (4L, "z", "B", 5L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = Curation.dedupSavingsBySource(d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    out("A") shouldBe ((3L, 2L, 1L, 333333L, 3L, 1L, 333333L))
    out("B") shouldBe ((1L, 1L, 0L, 0L, 5L, 0L, 0L))
  }

  test("doremi weights shift mass toward the high-excess-loss domain") {
    // Two domains with very different chars-per-token: 'b' has long
    // tokens (high loss proxy) so multiplicative updates must move
    // weight from 'a' to 'b', and the ppm total must stay ~1e6.
    val d = Seq(
      (1L, "aa bb cc dd", "a", 11L),
      (2L, "ee ff gg hh", "a", 11L),
      (3L, "supercalifragilistic expialidocious", "b", 35L),
      (4L, "pneumonoultramicroscopic silicovolcanoconiosis", "b", 46L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val w = Curation.doremiWeights(d, rounds = 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    w("b") should be > w("a")
    (w("a") + w("b")) should (be > 999990L and be <= 1000000L)
    // round 0 is uniform; more rounds = more concentration
    val w1 = Curation.doremiWeights(d, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    w("b") should be > w1("b")
    w1("b") should be > 500000L
  }

  test("doremi apply: the learned mixture DRIVES the sample — two losses, two kept sets (r19)") {
    // 12 docs per domain; 'b' is the high-loss (long-token) domain, so
    // under the learned weights its quota must EXCEED its proportional
    // share, and the kept set must differ from the rounds=0 (uniform
    // weights) sample over the same corpus.
    val d = (0L until 12L).flatMap { i =>
      Seq((i, "aa bb cc dd ee", "a", 14L),
        (100L + i, "pneumonoultramicroscopicsilicovolcanoconiosis", "b", 45L))
    }.toDF("doc_id", "text", "lang", "n_chars")
    def kept(rounds: Int): Map[String, Set[Long]] =
      Curation.mixtureDoremiApply(d, budget = 10, rounds = rounds)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    val uniform = kept(0)
    val learned = kept(5)
    // exact budget both times (capacity suffices: 12 per domain)
    uniform.values.map(_.size).sum shouldBe 10
    learned.values.map(_.size).sum shouldBe 10
    // uniform weights -> 5/5; learned weights shift quota toward 'b'
    uniform("a").size shouldBe 5
    learned("b").size should be > 5
    learned should not equal uniform
    // the learned quota's per-domain picks are the md5-rank prefix of
    // the uniform ones (same total order, longer/shorter cut)
    learned("a").subsetOf(uniform("a")) shouldBe true
    uniform("b").subsetOf(learned("b")) shouldBe true
    // restart-reproducible: the pick is hash-ranked, not rand()-based
    kept(5) shouldBe learned
  }

  test("unimax budget: waterfill caps the small languages, splits the rest exactly") {
    // tokens: a=2, b=3, c=10; epochCap=2 -> caps 4, 6, 20; budget 18.
    // waterfill: share 6 -> a capped (4 < 6); R=14 over 2: b capped
    // (6 < 7); R=8 -> c gets 8 (< 20). Sum = 4+6+8 = 18.
    val d = Seq(
      (1L, "t t", "a"), (2L, "t t t", "b"),
      (3L, "t t t t t t t t t t", "c"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.unimaxBudget(d, totalBudget = 18L, epochCap = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5)))).toMap
    out("a") shouldBe ((4L, true, 4L, 2000000L))
    out("b") shouldBe ((6L, true, 6L, 2000000L))
    out("c") shouldBe ((20L, false, 8L, 800000L))
    out.values.map(_._3).sum shouldBe 18L
  }

  test("unimax budget: remainder tokens go one each to the first uncapped languages") {
    // tokens a=1, b=5, c=5; epochCap=1 -> caps 1, 5, 5; budget 9.
    // a capped (1·3 < 9); R=8 over 2 -> q=4 mod 0... use budget 10:
    // a capped (3 < 10); R=9 over 2 -> q=4, mod 1 -> b (first by
    // (cap, lang) order among uncapped) gets 5, c gets 4. Sum = 10.
    val d = Seq(
      (1L, "t", "a"), (2L, "t t t t t", "b"), (3L, "t t t t t", "c"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.unimaxBudget(d, totalBudget = 10L, epochCap = 1L)
      .collect().map(r => r.getString(0) -> ((r.getBoolean(3), r.getLong(4)))).toMap
    out("a") shouldBe ((true, 1L))
    out("b") shouldBe ((false, 5L))
    out("c") shouldBe ((false, 4L))
  }

  test("unimax budget: a budget beyond total capacity caps every language") {
    val d = Seq((1L, "t t", "a"), (2L, "t t t", "b")).toDF("doc_id", "text", "lang")
    val out = Curation.unimaxBudget(d, totalBudget = 1000L, epochCap = 2L)
      .collect().map(r => r.getString(0) -> ((r.getBoolean(3), r.getLong(4)))).toMap
    out("a") shouldBe ((true, 4L))
    out("b") shouldBe ((true, 6L))
  }

  test("snapshot diff classifies added/removed/changed/same") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("doc_id", "text")
    val st = Curation.snapshotDiff(v1, v2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    st shouldBe Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added")
  }

  test("sequence packing: bins are contiguous and respect the budget") {
    val packed = Curation.packSequences(docs, budget = 512)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // bin index is the exclusive running token total DIV budget
      var cum = 0L
      sorted.foreach { case (_, _, n, bin) =>
        bin shouldBe cum / 512
        cum += n
      }
    }
  }

  test("curriculum interleave: stride schedule by hand on a 4+1 source mix") {
    // w_a = floor(sqrt(4)*1000) = 2000, w_b = 1000, wtot = 3000.
    // vt_a(r) = r*3000 div 2000 = 1,3,4,6; vt_b(1) = 3.
    // (vt, source) order: a@1, a@3, b@3 (tie -> source asc), a@4, a@6
    // -> by-source sequence a,a,b,a,a REGARDLESS of which a-doc gets
    // which md5 rank.
    val mix = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"),
    ).toDF("doc_id", "source")
    val out = Curation.curriculumInterleave(mix).orderBy("pos").collect()
      .map(r => (r.getString(1), r.getLong(3)))
    out.map(_._2).toSeq shouldBe (1L to 5L)
    out.map(_._1).toSeq shouldBe Seq("a", "a", "b", "a", "a")
  }

  test("curriculum interleave: total order, permutation, smooth pacing on the corpus") {
    val out = Curation.curriculumInterleave(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe docs.count()
    // pos is a permutation of 1..N
    out.map(_._4).sorted.toSeq shouldBe (1L to out.length)
    // pos order == (vt, source) order
    out.sortBy(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
      case _ =>
    }
    // pacing: in the first HALF of the schedule every source has
    // emitted about half its docs (within the stride rounding slack)
    val half = out.length / 2
    val tot = out.groupBy(_._2).view.mapValues(_.length).toMap
    val firstHalf = out.filter(_._4 <= half).groupBy(_._2).view.mapValues(_.length).toMap
    tot.foreach { case (src, n) =>
      val got = firstHalf.getOrElse(src, 0)
      math.abs(got - n / 2.0) should be <= (n * 0.15 + 2.0)
    }
    // determinism: a repartitioned input yields the identical schedule
    val again = Curation.curriculumInterleave(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    out.map(t => (t._1, t._4)).toMap shouldBe again
  }

  test("host quality: keep iff host pass rate >= corpus rate; filter keeps exactly those docs") {
    // host = cdn{(doc_id div 3) % 5}: ids 0-2 -> cdn0, 3-5 -> cdn1, ...
    // good text passes every Gopher rule (60 words, stopwords, alpha);
    // bad text fails the word-count floor.
    val good = ("the quick brown fox and a lazy dog be to of " * 6).trim
    val bad = "x"
    val texts = Map( // per-host pass pattern: cdn0 3/3, cdn1 0/3, cdn2 2/3, cdn3 1/3, cdn4 0/3
      0L -> good, 1L -> good, 2L -> good,
      3L -> bad, 4L -> bad, 5L -> bad,
      6L -> good, 7L -> good, 8L -> bad,
      9L -> good, 10L -> bad, 11L -> bad,
      12L -> bad, 13L -> bad, 14L -> bad)
    val docs = texts.toSeq.map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val roll = Curation.hostQualityRollup(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(5)))).toMap
    // global: 6/15 = 400000 ppm; cdn0 1000000, cdn2 666666 keep; rest cut
    roll("cdn0.example.com") shouldBe ((1000000L, true))
    roll("cdn2.example.com") shouldBe ((666666L, true))
    roll("cdn1.example.com")._2 shouldBe false
    roll("cdn3.example.com") shouldBe ((333333L, false))
    roll("cdn4.example.com")._2 shouldBe false
    Curation.hostQualityFilter(docs).collect().map(_.getLong(0)).sorted shouldBe
      Array(0L, 1L, 2L, 6L, 7L, 8L)
  }

  test("smoothed host rule: a 1-doc host is not condemned on one bad document — the flip the smoothing exists for (r18)") {
    val good = ("the quick brown fox and a lazy dog be to of " * 6).trim
    val bad = "x"
    // cdn0: 3 docs, 2 pass; cdn1: 3 docs, 0 pass; cdn2: ONE doc, fail.
    // global 2/7. Raw: cdn2 ppm 0 < 285714 -> cut on a single
    // observation. Laplace α=1: (0+1)·7 = 7 ≥ 2·(1+2) = 6 -> keep.
    val docs = Seq(
      (0L, good), (1L, good), (2L, bad),
      (3L, bad), (4L, bad), (5L, bad),
      (6L, bad))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val out = Curation.hostQualityRollupSmoothed(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    out("cdn0.example.com") shouldBe ((3L, 2L, true, true, false))
    // the 0/3 host stays cut under both rules: 1·7 = 7 < 2·5 = 10
    out("cdn1.example.com") shouldBe ((3L, 0L, false, false, false))
    // the thin host FLIPS: raw cuts, smoothed keeps
    out("cdn2.example.com") shouldBe ((1L, 0L, false, true, true))
    // smooth_ppm column replays (n_pass+1)/(n_docs+2) exactly
    val smooth = Curation.hostQualityRollupSmoothed(docs).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    smooth("cdn2.example.com") shouldBe 333333L // 10^6 · 1/3, floored
    smooth("cdn0.example.com") shouldBe 600000L // 10^6 · 3/5
  }
}
