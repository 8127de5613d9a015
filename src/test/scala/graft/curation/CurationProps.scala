package graft.curation

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** Property twins for the curation primitives: the hash bucket is a
  * total, stable function into its range, and chunking covers every
  * token with the configured stride — checked against in-driver models
  * on random inputs.
  */
object CurationProps extends Properties("Curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  property("md5Bucket lands in [0, mod) and is reproducible") =
    forAll(Gen.listOfN(20, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)), Gen.chooseNum(2, 1000)) {
      (ids, mod) =>
        import spark.implicits._
        val df = ids.distinct.toDF("doc_id")
        def run() = df.select(Curation.md5Bucket(org.apache.spark.sql.functions.col("doc_id"), mod))
          .collect().map(_.getLong(0)).toSeq
        val a = run()
        a.forall(b => b >= 0 && b < mod) && a == run()
    }

  property("scalable packing equals single-window packing for any docs/budget/buckets") =
    forAll(
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 500L), Gen.oneOf("en", "de"), Gen.chooseNum(1, 30))),
      Gen.chooseNum(8, 256),
      Gen.chooseNum(1, 64),
    ) { (rows, budget, buckets) =>
      import spark.implicits._
      val docs = rows.distinctBy(_._1)
        .map { case (id, lang, nTok) => (id, lang, Seq.fill(nTok)("w").mkString(" ")) }
        .toDF("doc_id", "lang", "text")
      def run(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      run(Curation.packSequencesScalable(docs, budget, buckets)) ==
        run(Curation.packSequences(docs, budget))
    }

  property("unimax waterfill: exact budget conservation, caps respected, uncapped near-uniform") =
    forAll(
      Gen.listOfN(6, Gen.chooseNum(1, 40)),
      Gen.chooseNum(1L, 400L),
      Gen.chooseNum(1L, 3L),
    ) { (tokCounts, budget, epochs) =>
      import spark.implicits._
      val docs = tokCounts.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "), s"l$i")
      }.toDF("doc_id", "text", "lang")
      val out = Curation.unimaxBudget(docs, budget, epochs).collect()
        .map(r => (r.getLong(2), r.getBoolean(3), r.getLong(4)))
      val capacity = tokCounts.map(_.toLong * epochs).sum
      val allocs = out.map(_._3)
      val uncapped = out.filter(!_._2).map(_._3)
      allocs.sum == math.min(budget, capacity) &&
        out.forall { case (cap, _, a) => a <= cap && a >= 0 } &&
        (uncapped.isEmpty || uncapped.max - uncapped.min <= 1)
    }

  property("chunking covers every token; window starts follow the stride") =
    forAll(Gen.chooseNum(1, 200), Gen.chooseNum(1, 8)) { (nTok, strideFactor) =>
      import spark.implicits._
      val chunk = 32
      val stride = math.max(1, chunk / strideFactor)
      val text = (1 to nTok).map(i => s"t$i").mkString(" ")
      val out = graft.text.TextAnalysis
        .chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"), chunk, stride)
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val nChunks = 1 + math.max(0, math.ceil((nTok - chunk) / stride.toDouble).toInt)
      val sizes = (0 until nChunks).map(i => math.min(chunk, nTok - i * stride).toLong)
      out.map(_._1).toSeq == (0L until nChunks.toLong) &&
        out.map(_._2).toSeq == sizes &&
        // coverage: the last chunk reaches the final token
        (nChunks - 1) * stride + sizes.last == nTok
    }

  property("langAdaptiveCut equals the percentile_disc model for any scores and p") =
    forAll(
      Gen.listOfN(45, Gen.zip(Gen.chooseNum(1L, 100000L), Gen.oneOf("en", "de", "zh"), Gen.chooseNum(1L, 30L))),
      Gen.chooseNum(1, 100),
    ) { (rowsRaw, pPct) =>
      import spark.implicits._
      val rows = rowsRaw.distinctBy(_._1)
      val docs = rows.toDF("doc_id", "lang", "n_chars")
      val got = Curation.langAdaptiveCut(docs, pPct)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      // model: thr = smallest value whose rank fraction reaches p
      val thr = rows.groupBy(_._2).map { case (lang, ds) =>
        val sorted = ds.map(_._3).sorted
        lang -> sorted(math.ceil(sorted.size * pPct / 100.0).toInt.max(1) - 1)
      }
      val want = rows.filter { case (_, lang, n) => n >= thr(lang) }
        .map { case (id, lang, _) => id -> thr(lang) }.toMap
      got == want
    }

  /** Smoothed host rule vs an exact BigInt rational model (r18): for
    * random per-host pass patterns, the engine's DECIMAL-lane
    * keep_smooth verdict must equal (n_pass+1)/(n_docs+2) ≥
    * g_pass/g_docs computed in unbounded integers, and flipped must be
    * exactly keep_raw ≠ keep_smooth on the engine's own counts. The
    * corpus is built from pass/fail texts (the CurationSpec fixture
    * pair), so the property exercises the whole Gopher→rollup→verdict
    * pipeline, not a replayed formula.
    */
  property("hostQualityRollupSmoothed matches the exact rational model on its own counts") =
    forAll(Gen.listOfN(14, Gen.oneOf(true, false))) { passes =>
      import spark.implicits._
      val good = ("the quick brown fox and a lazy dog be to of " * 6).trim
      val bad = "x"
      val docs = passes.zipWithIndex
        .map { case (p, i) => (i.toLong, if (p) good else bad, 10L) }
        .toDF("doc_id", "text", "n_chars")
      val rows = Curation.hostQualityRollupSmoothed(docs).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))
      val gDocs = BigInt(rows.map(_._1).sum)
      val gPass = BigInt(rows.map(_._2).sum)
      rows.forall { case (nDocs, nPass, keepRaw, keepSmooth, flipped) =>
        val model = (BigInt(nPass) + 1) * gDocs >= gPass * (BigInt(nDocs) + 2)
        keepSmooth == model && flipped == (keepRaw != keepSmooth)
      }
    }
}
