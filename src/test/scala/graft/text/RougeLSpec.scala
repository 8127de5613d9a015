package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class RougeLSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook O(nm) LCS — the definitional model the expression must match. */
  private def lcsRef(a: Seq[String], b: Seq[String]): Long = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length).toLong
  }

  private def lcsEngine(pairs: Seq[(Seq[String], Seq[String])]): Seq[Long] =
    pairs.toDF("a", "b").select(expr("lcs_len(a, b)")).collect().map(_.getLong(0)).toSeq

  test("lcs_len: hand cases") {
    lcsEngine(Seq(
      (Seq("a", "b", "c", "d"), Seq("a", "x", "c", "d")),   // 3
      (Seq("a", "b", "c"), Seq("c", "b", "a")),             // 1
      (Seq("x"), Seq("y")),                                 // 0
      (Seq.empty[String], Seq("a", "b")),                   // 0
      (Seq("t", "t", "t"), Seq("t", "t")),                  // 2
      (Seq("a", "b", "a", "b"), Seq("b", "a", "b", "a")),   // 3
    )) shouldBe Seq(3L, 1L, 0L, 0L, 2L, 3L)
  }

  test("lcs_len: 200 randomized differentials against the O(nm) definition") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 200).map { _ =>
      def arr = Seq.fill(rnd.nextInt(40))(("tok" + rnd.nextInt(6)))
      (arr, arr)
    }
    lcsEngine(pairs) shouldBe pairs.map { case (a, b) => lcsRef(a, b) }
  }

  test("lcs_len: null elements never match (no NPE in either eval path)") {
    // ADVICE r16: a direct SQL caller can pass containsNull arrays;
    // nulls must score as non-matching tokens, not dereference.
    val interpreted = spark.sql(
      "SELECT lcs_len(array('a', CAST(NULL AS STRING), 'b'), array('a', NULL, 'b'))")
      .collect()(0).getLong(0)
    interpreted shouldBe 2L // 'a', 'b' — the nulls contribute nothing
    // codegen path: route through a Range column so constant folding
    // can't pre-evaluate it interpreted
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      spark.range(1).select(
        expr("lcs_len(array('a', NULL, CAST(id AS STRING)), array('a', NULL, 'b'))").as("l"))
        .collect()(0).getLong(0) shouldBe 1L
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("lcs_len runs inside WholeStageCodegen (no interpreted boundary)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // a literal-only input constant-folds to a LocalTableScan before
      // codegen ever runs — route one operand through a Range column
      val df = spark.range(1).select(
        expr("lcs_len(array('a', 'b', CAST(id AS STRING)), array('b', 'c', 'd'))").as("l"))
      df.collect().map(_.getLong(0)) shouldBe Array(1L) // only 'b' survives
      df.queryExecution.executedPlan.toString should include regex """\*\(\d+\) Project"""
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("rouge_l_eval: the block-swap corruption makes the LCS genuinely nontrivial") {
    // 16 distinct tokens: swapped = B2 B1 B4 B3, dropout removes p=3,10.
    // A trivial (order-preserving) corruption would give lcs = n_cand;
    // here reorders must cost subsequence length.
    val text = (1 to 16).map(i => s"w$i").mkString(" ")
    val out = RougeL.rougeLEval(Seq((1L, text)).toDF("doc_id", "text")).collect()(0)
    out.getAs[Long]("n_ref") shouldBe 16L
    out.getAs[Long]("n_cand") shouldBe 14L // 16 minus p∈{3,10}
    val lcs = out.getAs[Long]("lcs")
    lcs should be < out.getAs[Long]("n_cand")
    lcs should be > 0L
    // cross-check against the definitional model on the replayed cohort
    val ref = (1 to 16).map(i => s"w$i")
    val swapped = (1 to 16).map { p =>
      val q = p - 1
      val idx = ((q / 4) ^ 1) * 4 + (q % 4)
      if (idx < 16) ref(idx) else ref(p - 1)
    }
    val cand = (1 to 16).filter(_ % 7 != 3).map(p => swapped(p - 1))
    lcs shouldBe lcsRef(cand, ref)
    out.getAs[Long]("f_ppm") shouldBe (2000000L * lcs) / (16L + 14L)
  }

  test("rouge_l_eval: empty and single-token docs surface with zeros, not errors") {
    val out = RougeL.rougeLEval(
      Seq((1L, ""), (2L, "solo"), (3L, "  ")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_ref") shouldBe 0L
    out(1L).getAs[Long]("f_ppm") shouldBe 0L
    out(3L).getAs[Long]("n_ref") shouldBe 0L
    out(2L).getAs[Long]("n_ref") shouldBe 1L
    out(2L).getAs[Long]("lcs") shouldBe 1L // single token survives swap+dropout
    out(2L).getAs[Long]("f_ppm") shouldBe 1000000L
  }
}
