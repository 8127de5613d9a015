package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class TriangleSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Build a lineitem-shaped frame whose co-purchase graph is exactly
    * `edges` (one order per edge; part keys are multiples of 5 so the
    * query's nodeMod=5 sample keeps every node).
    */
  private def lineitemFor(edges: Seq[(Long, Long)]) =
    edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a * 5), (i.toLong, b * 5))
    }.toDF("l_orderkey", "l_partkey")

  test("K4 yields 3 triangles per node (C(3,2) corners each)") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val out = GraphRank.triangleCounts(lineitemFor(k4), nodeMod = 5)
      .collect().map(r => r.getLong(0) / 5 -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("a path graph has no triangles") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    GraphRank.triangleCounts(lineitemFor(path), nodeMod = 5)
      .count() shouldBe 0L
  }

  test("two triangles sharing an edge count the shared corners twice") {
    // {1,2,3} and {2,3,4}: nodes 2,3 in both.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = GraphRank.triangleCounts(lineitemFor(g), nodeMod = 5)
      .collect().map(r => r.getLong(0) / 5 -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
  }

  test("k-core peels the pendant chain and keeps the clique") {
    // K5 on 1..5 plus a chain 5-6-7: the 4-core is exactly the clique
    // (peeling round 1 drops 7 and 6 together — both sit under k after
    // the degree pass; node 5's within-clique degree stays 4)
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val g = k5 ++ Seq((5L, 6L), (6L, 7L))
    val out = GraphRank.kCore(lineitemFor(g), k = 4, nodeMod = 5)
      .collect().map(r => r.getLong(0) / 5 -> r.getLong(1)).toMap
    out shouldBe (1L to 5L).map(_ -> 4L).toMap
    GraphRank.lastKCoreIterations should be >= 2 // peel round + confirm round
  }

  test("k-core fails loud instead of silently stopping early") {
    // a long path needs one round per node end-to-end under k=2? no —
    // a PATH's 2-core is empty and peeling eats one endpoint pair per
    // round: maxIter=2 on an 8-path cannot converge -> must throw
    val path = (1L to 8L).sliding(2).map(s => (s(0), s(1))).toSeq
    an[IllegalStateException] should be thrownBy
      GraphRank.kCore(lineitemFor(path), k = 2, nodeMod = 5, maxIter = 2)
  }
}
