package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** Hand-checked PageRank arithmetic on tiny graphs, plus the edge
  * derivation from a lineitem-shaped relation. The engine iteration is
  * pure integer arithmetic (nano-ranks), so expected values are
  * computable by hand — no tolerance, exact equality.
  */
class GraphRankSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000000L // nano-rank scale

  test("co-purchase edges: symmetric, distinct, no self-loops") {
    // order 1: parts {10, 20, 30}; order 2: parts {10, 20} (dup line)
    val li = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (2L, 20L))
      .toDF("l_orderkey", "l_partkey")
    val edges = GraphRank.coPurchaseEdges(li)
      .as[(Long, Long)].collect().toSet
    edges shouldBe Set(
      (10L, 20L), (20L, 10L), (10L, 30L), (30L, 10L), (20L, 30L), (30L, 20L))
  }

  test("BFS depth: path graph levels out from the source; beyond-rounds nodes absent") {
    // path 0–5–10–15–20–25 (all keys %5==0 so nodeMod keeps them);
    // source set = node%50==0 -> {0}; rounds=4 reaches depth 4
    val li = Seq((1L, 0L), (1L, 5L), (2L, 5L), (2L, 10L), (3L, 10L), (3L, 15L),
      (4L, 15L), (4L, 20L), (5L, 20L), (5L, 25L))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphRank.bfsDepth(li, nodeMod = 5, rounds = 4)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(0L -> 0L, 5L -> 1L, 10L -> 2L, 15L -> 3L, 20L -> 4L)
    // node 25 is 5 hops away — out of the bounded-depth horizon
  }

  test("LPA: two disjoint cliques each converge to their min-id label") {
    val li = Seq((1L, 5L), (1L, 10L), (1L, 15L), (2L, 20L), (2L, 25L), (2L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphRank.lpaCommunities(li, nodeMod = 5, rounds = 3)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(
      5L -> 5L, 10L -> 5L, 15L -> 5L,
      20L -> 20L, 25L -> 20L, 30L -> 20L)
  }

  test("one iteration on a two-node cycle is exact") {
    // A↔B, both outdeg 1: contrib = S, pr' = 0.15·S + 0.85·S = S exactly
    val li = Seq((1L, 1L), (1L, 2L)).toDF("l_orderkey", "l_partkey")
    val pr = GraphRank.pagerank(GraphRank.coPurchaseEdges(li), iters = 3)
      .as[(Long, Long)].collect().toMap
    pr shouldBe Map(1L -> S, 2L -> S)
  }

  test("asymmetric triangle-with-tail matches hand-rolled integer PageRank") {
    // orders: {1,2,3} clique plus {3,4} pair → node 3 has degree 3, 4 has 1
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = GraphRank.pagerank(GraphRank.coPurchaseEdges(li), iters = 2)
      .as[(Long, Long)].collect().toMap

    // independent reference: same integer recurrence in plain Scala
    val edges = Map(
      1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    var pr = edges.keys.map(_ -> S).toMap
    (1 to 2).foreach { _ =>
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (src, dsts) =>
        val c = pr(src) / dsts.size
        dsts.foreach(d => contrib(d) += c)
      }
      pr = edges.keys.map(n => n -> (15L * S / 100L + 85L * contrib(n) / 100L)).toMap
    }
    got shouldBe pr
    // sanity: hub (3) above leaf (4)
    got(3L) should be > got(4L)
  }

  test("HITS: one round on a tiny bipartite graph is exact") {
    // c1 buys {p1,p2,p3}, c2 buys {p1} (duplicate edge must dedup).
    // a_raw: p1=2e9, p2=1e9, p3=1e9; total 4e9 ->
    // a: p1 = 500000000, p2 = p3 = 250000000.
    val edges = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 10L))
      .toDF("c", "p")
    val a = GraphRank.hits(edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a shouldBe Map(10L -> 500000000L, 20L -> 250000000L, 30L -> 250000000L)

    // Round 2 concentrates further on the shared part: h1(c1)=666666666,
    // h1(c2)=333333333; a_raw2: p1=999999999, p2=p3=666666666;
    // total=2333333331 -> a2(p1)=428571428 > a2(p2)=285714285.
    val a2 = GraphRank.hits(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a2(10L) shouldBe 428571428L
    a2(20L) shouldBe 285714285L
    a2(10L) should be < a(10L) + 1L // normalized scale stays ~1e9 total
  }

  test("symmetric fast path ≡ general path on a symmetric graph (r16)") {
    // triangle+tail co-purchase graph: both directions of every edge
    // exist by construction, so dropping the nodes left-join and fusing
    // iteration 1 must be bit-identical to the general recurrence
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 7L))
      .toDF("l_orderkey", "l_partkey")
    val e = GraphRank.coPurchaseEdges(li)
    val general = GraphRank.pagerank(e, iters = 3)
      .as[(Long, Long)].collect().toMap
    val fast = GraphRank.pagerank(e, iters = 3, symmetric = true)
      .as[(Long, Long)].collect().toMap
    fast shouldBe general
  }

  test("personalized pagerank: mass concentrates near the seed, unreachable stays zero") {
    // chain 0↔1↔2↔3 plus a disconnected pair 4↔5; only node 0 seeds
    // (0 % 100 == 0 — no other id is a multiple of 100)
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L))
    val e = chain.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val pr = GraphRank.personalizedPagerank(e, seedMod = 100L, iters = 3)
      .as[(Long, Long)].collect().toMap
    // parity-robust claims (a 3-iteration chain oscillates mass between
    // odd/even distances, so per-node order flips — the NEIGHBORHOOD
    // claims don't): the seed half of the chain holds more mass than
    // the far half, the 1-hop node beats the 2-hop node, and nothing
    // reaches the disconnected component
    (pr(0L) + pr(1L)) should be > (pr(2L) + pr(3L))
    pr(1L) should be > pr(2L)
    pr(4L) shouldBe 0L // unreachable from the seed set
    pr(5L) shouldBe 0L
  }

  test("degree histogram over the tiny graph") {
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val hist = GraphRank.degreeHistogram(li)
      .as[(Long, Long)].collect().toMap
    // nodes 1,2,4 → see {2,3},{1,3},{3}: degrees 2,2,1; node 3 → degree 3
    hist shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
  }
}
