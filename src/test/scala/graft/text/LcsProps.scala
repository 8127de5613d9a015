package graft.text

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.expr
import graft.TestSpark

/** ScalaCheck pin of the LCS facts `rouge_l_eval` relies on, over
  * random token arrays through the real `lcs_len` codegen expression:
  *
  *  1. identity: LCS(a, a) = |a|;
  *  2. symmetry: LCS(a, b) = LCS(b, a);
  *  3. bounds: LCS(a, b) ≤ min(|a|, |b|);
  *  4. subsequence soundness: deleting elements from a can only
  *     shrink LCS(·, b), and any subsequence s of a has
  *     LCS(s, a) = |s| exactly (the property the twin-cohort design
  *     leans on: an order-preserving corruption would trivialize the
  *     gate — see RougeL's scaladoc);
  *  5. appending a shared token to both sides grows the LCS by
  *     exactly 1.
  *
  * Small batched Spark jobs (one select per property case set).
  */
object LcsProps extends Properties("LcsLen") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private def lcs(pairs: Seq[(Seq[String], Seq[String])]): Seq[Long] = {
    import spark.implicits._
    pairs.toDF("a", "b").select(expr("lcs_len(a, b)")).collect().map(_.getLong(0)).toSeq
  }

  private val tokArr: Gen[Seq[String]] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, Gen.oneOf("u", "v", "w", "x")))

  property("identity, symmetry, and the min-length bound") =
    forAll(tokArr, tokArr) { (a, b) =>
      val Seq(aa, ab, ba) = lcs(Seq((a, a), (a, b), (b, a)))
      aa == a.length.toLong && ab == ba && ab <= math.min(a.length, b.length).toLong
    }

  property("a subsequence scores its full length; deletion never helps") =
    forAll(tokArr, Gen.long) { (a, seed) =>
      val rnd = new scala.util.Random(seed)
      val sub = a.filter(_ => rnd.nextBoolean())
      val Seq(subVsA, aVsA) = lcs(Seq((sub, a), (a, a)))
      subVsA == sub.length.toLong && subVsA <= aVsA
    }

  property("appending a shared token grows the LCS by exactly one") =
    forAll(tokArr, tokArr) { (a, b) =>
      val Seq(base, grown) = lcs(Seq((a, b), (a :+ "z", b :+ "z")))
      grown == base + 1
    }
}
