package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class DedupSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "completely unrelated text with different words entirely"),
  ).toDF("doc_id", "text")

  test("minhash signatures: identical docs get identical signatures") {
    val sig = Dedup.minhashSignatures(docs).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    sig(1L) shouldBe sig(2L)
    sig(1L) should not be sig(3L)
    // permutation values stay inside the Carter-Wegman field
    sig.values.flatten.foreach { v =>
      val h = v.asInstanceOf[Long]
      h should (be >= 0L and be < Dedup.PermP)
    }
  }

  test("keep-best dedup keeps the higher-scored duplicate, not the lower id") {
    import org.apache.spark.sql.functions.col
    // docs 1 and 2 are exact dups (one component); score doc 2 higher
    val scores = Seq((1L, 0.1), (2L, 0.9), (3L, 0.5)).toDF("doc_id", "score")
    val kept = Dedup.dedupApplyBest(docs, scores)
      .orderBy(col("doc_id")).collect().map(_.getLong(0)).toSeq
    kept shouldBe Seq(2L, 3L) // best-of-cluster 2 survives; unclustered 3 keeps itself
    // min-id semantics (dedupApply) would instead keep 1
    Dedup.dedupApply(docs).orderBy(col("doc_id")).collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 3L)
  }

  test("minhash LSH pairs: identical docs share all bands -> candidate pair") {
    val pairs = Dedup.minhashCandidatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
  }

  test("per-band cap drops degenerate bands but keeps small clusters") {
    // 10 copies of mass-duplicated boilerplate (one band value with 10
    // members) + one small near-dup pair — the O(n²)-within-a-bucket
    // scenario the cap exists for.
    val boiler = (1L to 10L).map(i => (i, "this legal boilerplate footer is repeated on every single page"))
    val pair = Seq(
      (100L, "a genuinely distinct document about rivers and mountains"),
      (101L, "a genuinely distinct document about rivers and mountains"))
    val corpus = (boiler ++ pair).toDF("doc_id", "text")

    val capped = Dedup.minhashCandidatePairs(corpus, maxBandSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe Set((100L, 101L)) // boilerplate band (10 > 5) dropped, pair kept

    val uncapped = Dedup.minhashCandidatePairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    uncapped should contain((1L, 2L)) // default cap leaves the small corpus intact
    uncapped.size shouldBe 45 + 1     // C(10,2) boilerplate pairs + the near-dup pair

    // the stats relation surfaces exactly what the cap dropped
    val stats = Dedup.minhashBandStats(corpus, maxBandSize = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    stats.foreach { case (_, _, maxMembers, cappedBands) =>
      maxMembers shouldBe 10L
      cappedBands shouldBe 1L
    }
  }

  test("embedding bucket cap drops a degenerate bucket, keeps the rest") {
    // 8 identical vectors share one sign bucket; 2 identical different
    // vectors share another. Cap 5 must kill only the big bucket's pairs.
    val vecs = ((1L to 8L).map(i => (i, Array.fill(64)(0.5f))) ++
      Seq((100L, Array.fill(64)(-0.5f)), (101L, Array.fill(64)(-0.5f)))).toDF("vec_id", "embedding")
    val capped = Dedup.embeddingNearDupPairs(vecs, maxBucketSize = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    capped shouldBe Set((100L, 101L))
    val uncapped = Dedup.embeddingNearDupPairs(vecs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    uncapped.size shouldBe 28 + 1 // C(8,2) + the small pair
  }

  test("incremental dedup: existing dups drop, batch dups keep one, novel docs land") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "some established corpus document with plenty of unique words")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"), // dup of existing 1
      (11L, "a genuinely novel incoming document about glaciers and fjords"), // novel
      (12L, "another brand new text mentioning volcanoes and geysers"),  // novel
      (13L, "another brand new text mentioning volcanoes and geysers")   // dup of 12 within batch
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupIncremental(existing, incoming)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(11L, 12L) // 10 matched existing; 13 lost to 12
    val stats = Dedup.dedupIncrementalStats(existing, incoming).collect()(0)
    (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3)) shouldBe ((4L, 1L, 1L, 2L))
  }

  test("simhash: deterministic 16-bit string, equal for equal docs") {
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sh(1L) shouldBe sh(2L)
    sh(1L).length shouldBe 16
    sh(1L).foreach(c => "01" should contain(c))
  }

  test("ngram jaccard: identical docs score 1.0") {
    val rows = Dedup.ngramJaccardPairs(docs, n = 5, maxDf = 50, minJaccard = 0.05)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    rows((1L, 2L)) shouldBe 1.0
  }

  test("containment flags a short doc quoted inside a long one; Jaccard misses it") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta"
    val long = (1 to 40).map(i => s"filler$i").mkString(" ") + " " + quote
    val cdocs = Seq((1L, quote), (2L, long)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(cdocs, n = 5, maxDf = 50, minPermille = 900)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    cont((1L, 2L)) shouldBe 1000L // every gram of the quote is in the long doc
    cont.contains((2L, 1L)) shouldBe false // the long side is NOT contained
    Dedup.ngramJaccardPairs(cdocs, n = 5, maxDf = 50, minJaccard = 0.5)
      .count() shouldBe 0L // resemblance dedup would have kept both
  }

  test("hyperplanes are deterministic, ±1, and per-plane balanced-ish") {
    val a = Dedup.hyperplanes(8)
    val b = Dedup.hyperplanes(8)
    a shouldBe b
    a.foreach { plane =>
      plane.foreach(v => Set(1, -1) should contain(v))
      val pos = plane.count(_ == 1)
      // a degenerate all-same plane would make the bucket bit constant
      pos should (be > 8 and be < Dedup.Dim - 8)
    }
  }

  test("embedding near-dup: identical vectors pair with cosine 1.0") {
    val v = Array.fill(64)(1.0f)
    val w = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val emb = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    pairs.keySet should contain((1L, 2L))
    pairs((1L, 2L)) shouldBe 1.0
  }

  test("semantic decontaminate drops zero-norm vectors instead of NaN-matching them") {
    // components in [0, 0.001) quantize to 0 — the cosine denominator is
    // 0 and Spark's non-ANSI division yields NaN, which compares GREATEST
    // and used to pass the sim >= threshold cut (DuckDB returns NULL and
    // drops the row — engine/oracle divergence). Both sides now filter.
    val normal = Array.fill(64)(0.5f)
    val zeroish = Array.fill(64)(0.0005f)
    val emb = Seq(
      (1L, normal, 0),  // benchmark vector
      (2L, normal, 1),  // corpus dup of the benchmark -> must match, sim 1.0
      (3L, zeroish, 1), // zero-norm corpus vector -> must NOT match anything
      (4L, zeroish, 0), // zero-norm benchmark vector -> must contaminate nothing
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.semanticDecontaminate(emb)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.keySet shouldBe Set(2L)
    out(2L) shouldBe 1.0
    out.values.foreach(v => v.isNaN shouldBe false)
  }

  test("embedding near-dup pairs never emit a zero-norm (NaN-cosine) side") {
    val emb = Seq(
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.fill(64)(0.5f)),
      (3L, Array.fill(64)(0.0005f)), // quantizes to the zero vector
      (4L, Array.fill(64)(0.0005f)),
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3)))
    pairs.map(_._1).toSet shouldBe Set((1L, 2L))
    pairs.foreach { case (_, sim) => sim.isNaN shouldBe false }
  }

  test("connected components merge transitively linked pairs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comps shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L)
  }

  test("exact dedup groups by content hash") {
    val grouped = docs.groupBy(md5(col("text")).as("hash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    grouped shouldBe Map(1L -> 2L, 3L -> 1L)
  }

  test("band sweep: recall rises with band count, all layouts surface, hits bounded") {
    // 3 near-dup pairs (one-token edits on 30-token docs, J ≈ 0.94) +
    // noise docs with disjoint vocabularies
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = (Seq(
      (0L, base), (1L, base.replace("tok7", "edit7")),
      (10L, base.replace("tok", "w")), (11L, base.replace("tok", "w").replace("w9", "e9")),
      (20L, base.replace("tok", "z")), (21L, base.replace("tok", "z").replace("z3", "e3"))) ++
      (30L to 39L).map(i => i -> (1 to 25).map(j => s"n${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.minhashBandSweep(corpus, t = 0.8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out.keySet shouldBe Set(2L, 4L, 8L) // every layout surfaces
    val nTruth = out(2L)._3
    nTruth shouldBe 3L // the three planted pairs, found losslessly
    out.values.foreach { case (cand, hits, tr) =>
      hits should be <= math.min(cand, tr)
      tr shouldBe nTruth
    }
    // more bands (fewer rows per band) can only gain recall
    out(2L)._2 should be <= out(4L)._2
    out(4L)._2 should be <= out(8L)._2
    out(8L)._2 should be > 0L
  }

  test("layout select: chosen = fewest candidates among floor-meeting layouts, audited in-row") {
    // same planted corpus as the sweep test: 3 true pairs, noise docs
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = (Seq(
      (0L, base), (1L, base.replace("tok7", "edit7")),
      (10L, base.replace("tok", "w")), (11L, base.replace("tok", "w").replace("w9", "e9")),
      (20L, base.replace("tok", "z")), (21L, base.replace("tok", "z").replace("z3", "e3"))) ++
      (30L to 39L).map(i => i -> (1 to 25).map(j => s"n${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.minhashLayoutSelect(corpus, t = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(6), r.getLong(7), r.getLong(8)))
    out.map(_._1).toSet shouldBe Set(2L, 4L, 8L) // full curve surfaces
    out.count(_._5 == 1L) shouldBe 1 // exactly one chosen
    val chosen = out.find(_._5 == 1L).get
    val qualifying = out.filter(_._4 == 1L)
    if (qualifying.nonEmpty) {
      // the decision rule replayed by hand: min candidates, then bands
      chosen shouldBe qualifying.minBy(q => (q._2, q._1))
    } else chosen shouldBe out.maxBy(q => (q._3, -q._2, -q._1))
  }

  test("layout select: floor nothing meets degrades to max recall") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((0L, base), (1L, base.replace("tok7", "edit7")))
      .toDF("doc_id", "text")
    val out = Dedup.minhashLayoutSelect(corpus, t = 0.8,
        recallFloorPpm = 2000000L) // impossible floor: > 100%
      .collect().map(r => (r.getLong(0), r.getLong(6), r.getLong(7), r.getLong(8)))
    out.map(_._3).sum shouldBe 0L // nothing meets
    out.count(_._4 == 1L) shouldBe 1
    val chosen = out.find(_._4 == 1L).get
    chosen._2 shouldBe out.map(_._2).max // max recall wins the fallback
  }

  test("choose→apply: applied pairs equal the SELECTED layout's candidate set, and the decision drives the apply (r18)") {
    // 4 high-J pairs (one-token edits) + 3 moderate pairs (8 of 30
    // tokens replaced, J ≈ 0.58) + noise docs: at t = 0.5 the curve is
    // recall 4/7 (2 bands), 6/7 (4), 7/7 (8) with candidates 4/6/7 —
    // so a 0.8 floor picks 4×4 (fewest qualifying candidates) while an
    // impossible floor degrades to max recall = 8×2: two floors, two
    // DIFFERENT decisions, and the apply must follow each.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    def moderate(pref: String): String =
      (1 to 30).map(i => if (i <= 8) s"$pref$pref$i" else s"$pref$i").mkString(" ")
    val corpus = (Seq(
      (0L, base), (1L, base.replace("tok7", "edit7")),
      (10L, base.replace("tok", "w")), (11L, base.replace("tok", "w").replace("w9", "e9")),
      (20L, base.replace("tok", "z")), (21L, base.replace("tok", "z").replace("z3", "e3")),
      (30L, base.replace("tok", "m")), (31L, base.replace("tok", "m")),
      (40L, base.replace("tok", "p")), (41L, moderate("p")),
      (50L, base.replace("tok", "q")), (51L, moderate("q")),
      (60L, base.replace("tok", "r")), (61L, moderate("r"))) ++
      (70L to 83L).map(i => i -> (1 to 25).map(j => s"n${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    // per-layout ground truth through the same internals the sweep uses
    def layoutPairs(nb: Long): Set[(Long, Long)] =
      Dedup.layoutCandidatePairs(Dedup.bandedLayouts(Dedup.tokenMinhashSigs(corpus)))
        .where(col("n_bands") === nb)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    def applied(floor: Long): Set[(Long, Long)] =
      Dedup.neardupPairsChosenLayout(corpus, t = 0.5, recallFloorPpm = floor)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def chosenBands(floor: Long): Long =
      Dedup.minhashLayoutSelect(corpus, t = 0.5, recallFloorPpm = floor)
        .where(col("chosen") === 1L).collect().head.getLong(0)
    // reachable floor: 4×4 qualifies with fewer candidates than 8×2
    chosenBands(800000L) shouldBe 4L
    applied(800000L) shouldBe layoutPairs(4L)
    // impossible floor: the select degrades to max recall = 8×2, and
    // the applied pairs must follow the CHANGED decision
    chosenBands(2000000L) shouldBe 8L
    applied(2000000L) shouldBe layoutPairs(8L)
    // the two applied sets genuinely differ (8×2 catches the moderate
    // pairs 4×4 misses), so apply-follows-decision is not vacuous
    applied(800000L) should not be applied(2000000L)
  }

  test("contrastive triplets: positives are near-dups, negatives avoid both ends") {
    // two near-identical docs (the positive pair) + distinct fillers
    val long = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = (Seq((0L, long), (1L, long + " tail")) ++
      (2L to 9L).map(i => i -> s"unique doc $i with its own words ${"pad" * 5} $i"))
      .toDF("doc_id", "text")
    val out = Dedup.contrastiveTriplets(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(t => (t._1, t._2)) should contain((0L, 1L))
    out.foreach { case (a, p, n) =>
      n should not be a
      n should not be p
      n should (be >= 0L and be < 10L)
    }
  }
}
