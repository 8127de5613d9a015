package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** Property twin for the integer PageRank: on random co-purchase
  * inputs, the distributed unrolled-join formulation must agree
  * EXACTLY (integer arithmetic — no tolerance) with a plain-Scala
  * in-driver model of the same recurrence, and conservation bounds
  * must hold (each node's rank sits in [0.15·S, n·S]).
  */
object GraphRankProps extends Properties("GraphRank") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  private val S = 1000000000L

  // small key domains → dense co-purchase overlap, multi-part orders
  private val orderGen = Gen.chooseNum(1L, 8L)
  private val partGen = Gen.chooseNum(1L, 10L)

  property("3-iteration rank equals the in-driver integer model; bounds hold") =
    forAll(Gen.listOfN(30, Gen.zip(orderGen, partGen))) { lines =>
      import spark.implicits._
      val li = lines.toDF("l_orderkey", "l_partkey")

      // reference model: same edge derivation + recurrence in plain Scala
      val byOrder = lines.distinct.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      val edges = byOrder.values.flatMap { parts =>
        for (a <- parts; b <- parts if a != b) yield (a, b)
      }.toSet
      if (edges.isEmpty) {
        GraphRank.pagerank(GraphRank.coPurchaseEdges(li), 3).count() == 0L
      } else {
        val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
        val nodes = edges.flatMap(e => Seq(e._1, e._2))
        var pr = nodes.map(_ -> S).toMap
        (1 to 3).foreach { _ =>
          val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
          adj.foreach { case (src, dsts) =>
            val c = pr(src) / dsts.size
            dsts.foreach(d => contrib(d) += c)
          }
          pr = nodes.map(n => n -> (15L * S / 100L + 85L * contrib(n) / 100L)).toMap
        }
        val got = GraphRank.pagerank(GraphRank.coPurchaseEdges(li), 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val bounds = got.values.forall(v => v >= 15L * S / 100L && v <= nodes.size.toLong * S)
        got == pr && bounds
      }
    }
}
