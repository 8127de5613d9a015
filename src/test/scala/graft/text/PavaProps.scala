package graft.text

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck pin of the PAVA facts `perceptron_isotonic_calibration`
  * relies on, over random bin tables:
  *
  *  1. the fit is monotone non-decreasing (exact cross-multiplied
  *     rate comparison, no floats);
  *  2. blocks partition the bins and conserve mass (Σn, Σpos);
  *  3. the stack algorithm reaches THE unique isotonic fixed point:
  *     merging violators in a completely different order (always the
  *     FIRST violation, re-scanning from the start) lands on the
  *     identical block structure — the classic PAVA uniqueness fact,
  *     which is what lets the DuckDB oracle's recursive stack CTE and
  *     the engine's driver loop agree without sharing code.
  *
  * Pure driver-side — no Spark jobs — so the case count can be high.
  */
object PavaProps extends Properties("Pava") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  private val genBins: Gen[List[(Long, Long, Long)]] =
    Gen.chooseNum(1, 40).flatMap { nb =>
      Gen.listOfN(nb, for {
        n <- Gen.chooseNum(1L, 1000000000L) // wide counts stress the lane
        p <- Gen.chooseNum(0L, n)
      } yield (n, p))
    }.map(_.zipWithIndex.map { case ((n, p), i) => (i.toLong, n, p) })

  /** Merge-FIRST-violator-until-fixed-point reference (different merge
    * order than the stack; PAVA's fixed point is unique).
    */
  private def naive(bins: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    var blocks = bins.sortBy(_._1).map { case (b, n, p) => (b, b, n, p) }.toVector
    var changed = true
    while (changed) {
      changed = false
      val i = blocks.indices.dropRight(1).find { i =>
        BigInt(blocks(i)._4) * blocks(i + 1)._3 > BigInt(blocks(i + 1)._4) * blocks(i)._3
      }
      i.foreach { j =>
        val (lo1, _, n1, p1) = blocks(j)
        val (_, hi2, n2, p2) = blocks(j + 1)
        blocks = blocks.patch(j, Seq((lo1, hi2, n1 + n2, p1 + p2)), 2)
        changed = true
      }
    }
    blocks
  }

  property("stack PAVA = first-violator fixed point; monotone; mass-conserving") =
    forAll(genBins) { bins =>
      val got = Perceptron.pavaBlocks(bins)
      val ref = naive(bins)
      val monotone = got.sliding(2).forall {
        case Seq(a, b) => BigInt(a._4) * b._3 <= BigInt(b._4) * a._3
        case _ => true
      }
      val partition = got.map(b => b._2 - b._1 + 1).sum == bins.length &&
        got.zip(got.drop(1)).forall { case (a, b) => a._2 + 1 == b._1 }
      val mass = got.map(_._3).sum == bins.map(_._2).sum &&
        got.map(_._4).sum == bins.map(_._3).sum
      got == ref && monotone && partition && mass
    }
}
