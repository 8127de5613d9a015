package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class BigramLmSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed model and scores on a three-doc corpus") {
    val docs = Seq(
      1L -> "a b a b",   // bigrams: (a,b) (b,a) (a,b)
      2L -> "a b c",     // bigrams: (a,b) (b,c)
      3L -> "a c",       // bigram:  (a,c)
    ).toDF("doc_id", "text")
    // cnt1: a→4 (a,b)x3 + (a,c)x1 ; b→2 ; total bigrams 6
    // p_scaled: (a,b) = 1e6*3/4 = 750000; (b,a) = 1e6*1/2 = 500000
    //           (b,c) = 500000; (a,c) = 1e6*1/4 = 250000
    val model = BigramLm.bigramModel(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    model(("a", "b")) shouldBe 750000L
    model(("b", "a")) shouldBe 500000L
    model(("b", "c")) shouldBe 500000L
    model(("a", "c")) shouldBe 250000L

    val out = BigramLm.fluencyScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_bigrams") shouldBe 3L
    out(1L).getAs[Long]("score_sum") shouldBe (750000L + 500000L + 750000L)
    out(2L).getAs[Long]("score_sum") shouldBe (750000L + 500000L)
    out(3L).getAs[Long]("score_sum") shouldBe 250000L
    out(3L).getAs[Double]("mean_p_scaled") shouldBe 250000.0
  }

  test("scrambled word order scores below fluent text (the filter signal)") {
    // the salad reuses the SAME vocabulary in transitions the corpus
    // rarely makes — the perplexity-filter signal. (A salad of unique
    // hapax tokens would score p=1 per transition under a self-trained
    // model; rarity is relative to the trained unigram mass.)
    val fluent = (1 to 50).map(_ => "the cat sat").mkString(" ")
    val salad = "cat the sat cat the sat"
    val docs = Seq(1L -> fluent, 2L -> salad).toDF("doc_id", "text")
    val out = BigramLm.fluencyScores(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_p_scaled")).toMap
    out(1L) should be > out(2L)
  }

  test("trigram backoff: all three tiers hand-computed on a two-doc corpus") {
    val docs = Seq(
      1L -> "a b c a b c", // trigrams: (a,b,c)x2, (b,c,a), (c,a,b)
      2L -> "x b c",       // trigram:  (x,b,c)
    ).toDF("doc_id", "text")
    // pruned tri model (cnt>=2): only (a,b,c) cnt3=2, ctx12(a,b)=2
    //   -> p3 = 1e6*2/2 = 1000000
    // pruned bi model (cnt>=2): (a,b) cnt=2 ctx=cnt1(a)=2 -> p2=400000
    //                           (b,c) cnt=3 ctx=cnt1(b)=3 -> p2=400000
    // unigrams: a=2 b=3 c=3 x=1, tot=9
    // doc1: (a,b,c)x2 tier3 @1000000; (b,c,a): tri pruned, bi (c,a)
    //   pruned -> tier1 @ floor(160000*2/9)=35555; (c,a,b): tri pruned,
    //   bi (a,b) kept -> tier2 @400000
    // doc2: (x,b,c): tri pruned (cnt 1), bi (b,c) kept -> tier2 @400000
    val out = BigramLm.trigramBackoffScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_trigrams") shouldBe 4L
    out(1L).getAs[Long]("n_tri") shouldBe 2L
    out(1L).getAs[Long]("n_bi") shouldBe 1L
    out(1L).getAs[Long]("n_uni") shouldBe 1L
    out(1L).getAs[Long]("score_sum") shouldBe (2000000L + 400000L + 35555L)
    out(2L).getAs[Long]("n_trigrams") shouldBe 1L
    out(2L).getAs[Long]("n_bi") shouldBe 1L
    out(2L).getAs[Long]("score_sum") shouldBe 400000L
  }

  test("trigram backoff: repeated fluent text outscores a same-vocabulary scramble") {
    val fluent = (1 to 40).map(_ => "the cat sat on the mat").mkString(" ")
    val salad = "mat the on sat cat the sat mat on cat"
    val docs = Seq(1L -> fluent, 2L -> salad).toDF("doc_id", "text")
    val out = BigramLm.trigramBackoffScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Double]("mean_p_scaled") should be > out(2L).getAs[Double]("mean_p_scaled")
    // the scramble's rare trigrams genuinely BACK OFF (pruning bites)
    (out(2L).getAs[Long]("n_bi") + out(2L).getAs[Long]("n_uni")) should be > 0L
  }

  test("trigram backoff: docs under three tokens surface with zeros") {
    val docs = Seq(1L -> "", 2L -> "a b", 3L -> "a b c d").toDF("doc_id", "text")
    val out = BigramLm.trigramBackoffScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_trigrams") shouldBe 0L
    out(2L).getAs[Long]("n_trigrams") shouldBe 0L
    out(2L).getAs[Double]("mean_p_scaled") shouldBe 0.0
    out(3L).getAs[Long]("n_trigrams") shouldBe 2L
  }

  test("short and empty docs surface with zero bigrams") {
    val docs = Seq(1L -> "", 2L -> "solo", 3L -> "a b").toDF("doc_id", "text")
    val out = BigramLm.fluencyScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_bigrams") shouldBe 0L
    out(2L).getAs[Long]("n_bigrams") shouldBe 0L
    out(1L).getAs[Double]("mean_p_scaled") shouldBe 0.0
    out(3L).getAs[Long]("n_bigrams") shouldBe 1L
    out(3L).getAs[Long]("score_sum") shouldBe 1000000L // only (a,b): p=1
  }

  test("trigram backoff trains and scores an empty / all-blank corpus without throwing") {
    // ADVICE r16: sum(cnt1) over zero rows is null (getLong NPE'd) and
    // tot=0 reached the unigram tier as a literal zero denominator.
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    BigramLm.trigramBackoffScores(empty).count() shouldBe 0L
    // blank docs still surface (zero-filled) through the left join
    val blank = Seq(1L -> "   ", 2L -> "").toDF("doc_id", "text")
    val out = BigramLm.trigramBackoffScores(blank).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L).getAs[Long]("n_trigrams") shouldBe 0L
    out(1L).getAs[Double]("mean_p_scaled") shouldBe 0.0
  }

  test("ngramZip ≡ the transform(sequence)+struct formulation, n = 2 and 3 (r20)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(71)
    val alphabet = Seq("a", "bb", "ccc", "é", "")
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).toSeq)
    }
    val df = rows.toDF("doc_id", "__toks")
    for ((n, names) <- Seq(2 -> Seq("w1", "w2"), 3 -> Seq("w1", "w2", "w3"))) {
      // the pre-r20 interpreted formulation, inlined as the reference
      val oldG = explode(transform(
        sequence(lit(1), org.apache.spark.sql.functions.size(col("__toks")) - (n - 1)),
        i => struct(names.zipWithIndex.map { case (nm, j) =>
          element_at(col("__toks"), i + j).as(nm) }: _*)))
      val base = df.where(org.apache.spark.sql.functions.size(col("__toks")) >= n)
      val got = base.select(col("doc_id"), BigramLm.ngramZip(col("__toks"), n, names).as("g"))
        .select(col("doc_id") +: names.map(nm => col(s"g.$nm").as(nm)): _*)
        .collect().map(_.toSeq).toSeq
      val exp = base.select(col("doc_id"), oldG.as("g"))
        .select(col("doc_id") +: names.map(nm => col(s"g.$nm").as(nm)): _*)
        .collect().map(_.toSeq).toSeq
      withClue(s"n=$n: ") { got shouldBe exp }
    }
  }
}
