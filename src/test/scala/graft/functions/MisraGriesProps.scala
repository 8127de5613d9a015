package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck pin of the two Misra–Gries theorems the exact two-pass
  * heavy-hitters relies on, over random streams AND random partition
  * splits (the merge path is what Spark's partial aggregation
  * exercises; Agarwal et al. 2013 §3 mergeable summaries):
  *
  *  1. superset: every item with true frequency > n/(k+1) survives;
  *  2. bound:    the summary never holds more than k counters, and
  *               each surviving counter lower-bounds the true count.
  *
  * Pure driver-side — no Spark jobs — so the case count can be high.
  */
object MisraGriesProps extends Properties("MisraGries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  // small alphabet → heavy items actually occur; skewed sizes
  private val genStream: Gen[List[String]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("hot"),
        3 -> Gen.oneOf("w1", "w2", "w3"),
        2 -> Gen.chooseNum(0, 50).map(i => s"cold$i"))))
  private val genK: Gen[Int] = Gen.chooseNum(1, 12)
  // random cut points simulating Spark partitions
  private val genCuts: Gen[List[Int]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 400)))

  private def mgOf(agg: MisraGriesAgg, xs: Seq[String]): Map[String, Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("single-pass summary: superset, size bound, count lower bound") =
    forAll(genStream, genK) { (xs, k) =>
      val agg = new MisraGriesAgg(k)
      val summary = mgOf(agg, xs)
      val freqs = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = freqs.filter { case (_, c) => c * (k + 1) > xs.size }.keySet
      heavy.subsetOf(summary.keySet) &&
        summary.size <= k &&
        summary.forall { case (w, c) => c <= freqs(w) }
    }

  property("merged partition summaries keep all three guarantees") =
    forAll(genStream, genK, genCuts) { (xs, k, cuts) =>
      val agg = new MisraGriesAgg(k)
      // split the stream at the (sorted, clamped) cut points
      val bounds = (0 +: cuts.map(_ min xs.size).sorted :+ xs.size).distinct
      val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val merged = parts.map(mgOf(agg, _)).foldLeft(agg.zero)(agg.merge)
      val freqs = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = freqs.filter { case (_, c) => c * (k + 1) > xs.size }.keySet
      heavy.subsetOf(merged.keySet) &&
        merged.size <= k &&
        merged.forall { case (w, c) => c <= freqs(w) }
    }
}
