package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** Boundary tests for the Gopher document flags and the C4 line filter —
  * each rule pinned on a hand-built document sitting exactly on (or just
  * off) its threshold.
  */
class QualityFiltersSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def gopherRow(text: String, minWords: Int = 1, maxWords: Int = 100000) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    QualityFilters.gopherQualityFlags(df, minWords, maxWords).collect().head
  }

  test("gopher: stopword flag needs >= 2 DISTINCT stopwords") {
    // "the" repeated is one distinct stopword — fails
    val one = gopherRow("the the cat sat mat cat sat mat")
    one.getAs[Long]("n_stopwords") shouldBe 1L
    one.getAs[Boolean]("flag_stopwords") shouldBe false
    // "the" + "and" = exactly 2 distinct — passes
    val two = gopherRow("the cat and dog sat mat run far")
    two.getAs[Long]("n_stopwords") shouldBe 2L
    two.getAs[Boolean]("flag_stopwords") shouldBe true
  }

  test("gopher: mean word length boundaries are inclusive at 3.0 and 10.0") {
    // four 3-char words → mean exactly 3.0 → pass
    val lo = gopherRow("cat dog rat bat")
    lo.getAs[Double]("mean_word_len") shouldBe 3.0
    lo.getAs[Boolean]("flag_mean_len") shouldBe true
    // two 2-char words → mean 2.0 → fail
    gopherRow("ab cd").getAs[Boolean]("flag_mean_len") shouldBe false
    // two 10-char words → mean exactly 10.0 → pass
    val hi = gopherRow("abcdefghij klmnopqrst")
    hi.getAs[Double]("mean_word_len") shouldBe 10.0
    hi.getAs[Boolean]("flag_mean_len") shouldBe true
    // one 11-char word → 11.0 → fail
    gopherRow("abcdefghijk").getAs[Boolean]("flag_mean_len") shouldBe false
  }

  test("gopher: word-count window is inclusive on both edges") {
    gopherRow("one two three", minWords = 3, maxWords = 3)
      .getAs[Boolean]("flag_word_count") shouldBe true
    gopherRow("one two three four", minWords = 3, maxWords = 3)
      .getAs[Boolean]("flag_word_count") shouldBe false
    gopherRow("one two", minWords = 3, maxWords = 3)
      .getAs[Boolean]("flag_word_count") shouldBe false
  }

  test("gopher: alpha-word ratio counts words containing any letter") {
    // 4 of 5 words alphabetic = 0.8, not > 0.8 → fail
    gopherRow("cat dog rat bat 123").getAs[Boolean]("flag_alpha") shouldBe false
    // 5 of 5 → 1.0 → pass
    gopherRow("cat dog rat bat cow").getAs[Boolean]("flag_alpha") shouldBe true
  }

  test("gopher: symbol ratio counts '#' and '...' against word count") {
    // 10 words, one '#' → 0.1, not < 0.1 → fail
    val r = gopherRow("a b c d e f g h i j#")
    r.getAs[Double]("symbol_ratio") shouldBe 0.1
    r.getAs[Boolean]("flag_symbol") shouldBe false
    // '...' counts once per triple
    val e = gopherRow("a b c d e f g h i j...")
    e.getAs[Double]("symbol_ratio") shouldBe 0.1
    e.getAs[Boolean]("flag_symbol") shouldBe false
    gopherRow("a b c d e f g h i j").getAs[Boolean]("flag_symbol") shouldBe true
  }

  test("gopher: bullet and ellipsis line ratios") {
    val bullets = (1 to 9).map(i => s"- item $i").mkString("\n") + "\nplain line"
    val b = gopherRow(bullets)
    b.getAs[Double]("bullet_line_ratio") shouldBe 0.9
    b.getAs[Boolean]("flag_bullets") shouldBe false // 0.9 not < 0.9
    val ell = "one line...\ntwo line\nthree line\nfour line…\nfive line\nsix line\nseven\neight\nnine\nten"
    val e = gopherRow(ell)
    e.getAs[Double]("ellipsis_line_ratio") shouldBe 0.2
    e.getAs[Boolean]("flag_ellipsis") shouldBe true
  }

  private def c4Row(text: String, minKeptLines: Int = 3) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    QualityFilters.c4LineFilter(df, minKeptLines).collect().head
  }

  test("c4: the four line rules — punctuation, length, javascript, brace") {
    val doc = Seq(
      "This line has five words.",            // kept
      "Too short words here.",                // 4 words → dropped
      "This line has no terminal punctuation",// dropped
      "Enable JavaScript to view this page.", // dropped (case-insensitive)
      "A line with a { brace in it.",         // dropped
      "Another good line with six words!",    // kept
      "Quoted lines are also terminal \"",    // kept (ends in ")
    ).mkString("\n")
    val r = c4Row(doc)
    r.getAs[Long]("n_lines") shouldBe 7L
    r.getAs[Long]("n_kept") shouldBe 3L
    r.getAs[Boolean]("keep_doc") shouldBe true
  }

  test("c4: lorem ipsum anywhere kills the document") {
    val doc = Seq(
      "This line has five words.",
      "Another good line with six words!",
      "A third acceptable line right here.",
      "Lorem Ipsum dolor sit amet text.",
    ).mkString("\n")
    val r = c4Row(doc)
    r.getAs[Long]("n_kept") shouldBe 4L
    r.getAs[Boolean]("keep_doc") shouldBe false
  }

  test("c4: fewer than minKeptLines kept lines kills the document") {
    val doc = "This line has five words.\nAnother good line with six words!"
    c4Row(doc, minKeptLines = 3).getAs[Boolean]("keep_doc") shouldBe false
    c4Row(doc, minKeptLines = 2).getAs[Boolean]("keep_doc") shouldBe true
  }

  test("repetition n-grams: heavy bigram flags, unique text passes") {
    val docs = Seq(
      1L -> "a b a b a b",            // "a b"×3 (9 chars), "b a"×2 (6) → top 9/15
      2L -> "one two three four five six seven eight nine ten eleven twelve" // all n-grams unique
    ).toDF("doc_id", "text")
    val out = QualityFilters.repetitionNgrams(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n")) -> r).toMap
    val r12 = out((1L, 2))
    r12.getAs[Double]("top_gram_char_frac") shouldBe 0.6 +- 1e-12
    r12.getAs[Double]("dup_gram_char_frac") shouldBe 1.0
    r12.getAs[Boolean]("rep_flag") shouldBe false // 0.6 > 0.20
    val r22 = out((2L, 2))
    r22.getAs[Double]("dup_gram_char_frac") shouldBe 0.0
    r22.getAs[Boolean]("rep_flag") shouldBe true
    // doc 1 has 6 tokens → rows only for n <= 6; doc 2 all n <= 10
    out.keys.filter(_._1 == 1L).map(_._2).max shouldBe 6
    out.keys.filter(_._1 == 2L).map(_._2).max shouldBe 10
    // n=5 on doc 1: grams "a b a b a"(cnt 2? no — positions 1,2 → "a b a b a","b a b a b")
    val r15 = out((1L, 5))
    r15.getAs[Double]("dup_gram_char_frac") shouldBe 0.0 // both distinct
    r15.getAs[Boolean]("rep_flag") shouldBe true
  }

  test("repetition lines: dup-line fractions just past both thresholds flag") {
    val docs = Seq(
      1L -> "x\nx\nyy",   // dup 1/3 > 0.30; chars: dup 1 / 4 = 0.25 > 0.20
      2L -> "a\nb\nc",
    ).toDF("doc_id", "text")
    val out = QualityFilters.repetitionLines(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Long]("n_lines") shouldBe 3L
    out(1L).getAs[Long]("n_dup_lines") shouldBe 1L
    out(1L).getAs[Double]("dup_line_frac") shouldBe (1.0 / 3.0) +- 1e-12
    out(1L).getAs[Double]("dup_line_char_frac") shouldBe 0.25
    out(1L).getAs[Boolean]("rep_flag") shouldBe false
    out(2L).getAs[Double]("dup_line_frac") shouldBe 0.0
    out(2L).getAs[Boolean]("rep_flag") shouldBe true
  }

  test("synthetic line builder is deterministic and multi-line") {
    val docs = Seq(
      (0L, (1 to 20).map(i => s"tok$i").mkString(" ")),
      (31L, (1 to 20).map(i => s"tok$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val built = QualityFilters.withSyntheticLines(docs)
      .orderBy("doc_id").as[(Long, String)].collect()
    // 20 tokens → 3 lines of 8/8/4 tokens; doc 0 and 31 also gain lorem ipsum
    built.foreach { case (_, t) => t.split("\n").length shouldBe 4 }
    built.foreach { case (_, t) => t should include("lorem ipsum") }
    // line endings cycle by (doc_id + i) % 4: doc 0 line 1 → m=1 (bare),
    // line 2 → m=2 (javascript), line 3 → m=3 (brace)
    val lines0 = built.head._2.split("\n")
    lines0(1) should include("javascript")
    lines0(2) should include("{code}")
  }
  test("Cohen's kappa: independence -> 0, identity -> 1e6, inversion -> -1e6") {
    def kappa(rows: Seq[(String, Long)]): (Long, Long, Long) = {
      val df = rows.toDF("text", "n_chars")
      val r = QualityFilters
        .filterAgreementKappa(df, minWords = 2L, maxWords = 10L, minChars = 10L)
        .collect().head
      (r.getAs[Long]("po_ppm"), r.getAs[Long]("pe_ppm"), r.getAs[Long]("kappa_ppm"))
    }
    // one doc per 2x2 cell: observed = chance -> kappa exactly 0
    kappa(Seq(("w w w", 20L), ("w w w", 5L), ("w", 20L), ("w", 5L))) shouldBe
      ((500000L, 500000L, 0L))
    // flags coincide on every doc -> kappa 1e6 despite pe = 0.5
    kappa(Seq(("w w w", 20L), ("w w w", 20L), ("w", 5L), ("w", 5L))) shouldBe
      ((1000000L, 500000L, 1000000L))
    // flags invert on every doc -> kappa -1e6 (the sign-rule lane)
    kappa(Seq(("w w w", 5L), ("w w w", 5L), ("w", 20L), ("w", 20L))) shouldBe
      ((0L, 500000L, -1000000L))
  }

  test("code detection separates a source snippet from prose") {
    val code = "def main(args):\n    import sys\n    x_val = {1: 2};\n    return x_val[1]\n"
    val prose = "the quick brown fox jumps over the lazy dog and keeps on running home"
    val df = Seq((1L, code), (2L, prose)).toDF("doc_id", "text")
    val out = QualityFilters.codeDetect(df)
      .collect().map(r => r.getLong(0) -> ((r.getAs[Long]("code_permille"), r.getAs[Long]("is_code")))).toMap
    out(1L)._2 shouldBe 1L
    out(2L)._2 shouldBe 0L
    out(1L)._1 should be > out(2L)._1
  }

  test("code detection feature counts are exact on a hand-built doc") {
    // 2 braces + 2 parens + 1 semicolon + 1 equals = 6 symbols; one
    // indented line; keywords: def, return; idents: snake_case + camelCase
    val doc = "def f(a):\n  x = 1;\n{my_var fooBar}\nreturn"
    val r = QualityFilters.codeDetect(Seq((1L, doc)).toDF("doc_id", "text")).collect().head
    r.getAs[Long]("n_symbols") shouldBe 6L
    r.getAs[Long]("n_indent_lines") shouldBe 1L
    r.getAs[Long]("n_keywords") shouldBe 2L
    r.getAs[Long]("n_idents") shouldBe 2L
  }
  test("Luhn scan: valid card counted, invalid 16-digit run rejected, short runs ignored") {
    val df = Seq(
      (1L, "pay with 4539578763621486 now"),     // Luhn-valid
      (2L, "fake 4111111111111112 number"),      // 16 digits, bad checksum
      (3L, "order 12345 reference 999"),         // no 16-digit run
    ).toDF("doc_id", "text")
    val out = QualityFilters.luhnPiiScan(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((1L, 1L))
    out(2L) shouldBe ((1L, 0L))
    out(3L) shouldBe ((0L, 0L))
  }
}
