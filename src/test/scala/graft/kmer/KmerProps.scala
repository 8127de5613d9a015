package graft.kmer

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** ScalaCheck twin of the reference's golden-output verifier
  * (`/root/reference/scripts/verifier.py`): the engine must agree with a
  * naive in-driver sliding-window model on random corpora, and satisfy
  * the count invariant Σ cnt = Σ_rows max(0, len−k+1).
  */
object KmerProps extends Properties("Kmers") {

  // Each case runs two Spark jobs; keep the case count bounded.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val genText: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, Gen.oneOf('A', 'C', 'G', 'T')).map(_.mkString))
  private val genCorpus: Gen[List[String]] = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, genText))
  private val genK: Gen[Int] = Gen.chooseNum(1, 8)

  property("matches naive sliding-window model and count invariant") =
    forAll(genCorpus, genK) { (texts, k) =>
      import spark.implicits._
      val engine = Kmers.kmerCounts(texts.toDF("text"), "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val naive = texts
        .flatMap(t => t.sliding(k).filter(_.length == k))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expectedTotal = texts.map(t => math.max(0, t.length - k + 1).toLong).sum
      engine == naive && engine.values.sum == expectedTotal
    }

  // Windows are CODE POINTS, not UTF-16 units or bytes: 1-, 2-, 3-, and
  // 4-byte UTF-8 sequences (the last is an astral char — a surrogate
  // PAIR in the JVM String) must each count as one window position.
  private val genCodePoint: Gen[String] =
    Gen.oneOf("a", "é", "λ", "日", new String(Character.toChars(0x1F600)))
  private val genUnicodeText: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, genCodePoint).map(_.mkString))

  private def cpWindows(s: String, k: Int): Seq[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) Nil else (0 to cps.length - k).map(i => new String(cps, i, k))
  }

  property("multibyte text windows are code-point windows (generator path)") =
    forAll(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, genUnicodeText)), Gen.chooseNum(1, 4)) {
      (texts, k) =>
        import spark.implicits._
        val engine = Kmers.kmerCounts(texts.toDF("text"), "text", k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val naive = texts.flatMap(cpWindows(_, k))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        engine == naive
    }
}
