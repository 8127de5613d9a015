package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class DbscanSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Random synthetic embeddings: 64-dim floats, mixture of tight
    * blobs (dense) and scattered background (sparse).
    */
  private def synth(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(3)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    (0 until n).map { i =>
      val emb =
        if (i % 4 < 3) { // blob member: center + small jitter
          val c = centers(i % 3)
          c.map(v => v + (rnd.nextFloat() - 0.5f) * 0.02f)
        } else Array.fill(64)(rnd.nextFloat() * 2 - 1) // background
      (i.toLong, emb.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  /** Reference DBSCAN over the projected integer points, brute force. */
  private def naive(pts: Map[Long, (Long, Long)]): Map[Long, (Long, Boolean, Long)] = {
    val eps2 = Dbscan.Eps * Dbscan.Eps
    def nbrs(id: Long): Seq[Long] = {
      val (x, y) = pts(id)
      pts.collect { case (o, (ox, oy))
        if o != id && (x - ox) * (x - ox) + (y - oy) * (y - oy) <= eps2 => o }.toSeq
    }
    val nEps = pts.keys.map(id => id -> (nbrs(id).size + 1L)).toMap
    val core = pts.keys.filter(id => nEps(id) >= Dbscan.MinPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- core; o <- nbrs(c) if core(o)) {
      val (ra, rb) = (find(c), find(o))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> find(c)).toMap
    pts.keys.map { id =>
      val cl =
        if (core(id)) label(id)
        else {
          val coreNb = nbrs(id).filter(core).map(label)
          if (coreNb.isEmpty) -1L else coreNb.min
        }
      id -> ((nEps(id), core(id), cl))
    }.toMap
  }

  test("full labeling matches brute-force DBSCAN on blobs+noise") {
    for (seed <- Seq(1, 2, 3)) {
      val emb = synth(240, seed)
      val pts = Dbscan.projected(emb).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = naive(pts)
      val got = Dbscan.cluster(emb).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
      withClue(s"seed=$seed: ") { got shouldBe want }
    }
  }

  test("grid candidate join is complete: equals brute-force neighbor pairs") {
    val emb = synth(300, 7)
    val pts = Dbscan.projected(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val eps2 = Dbscan.Eps * Dbscan.Eps
    val want = (for {
      (a, (ax, ay)) <- pts.toSeq; (b, (bx, by)) <- pts.toSeq
      if a != b && (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= eps2
    } yield (a, b)).sorted
    val got = Dbscan.neighborPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    got shouldBe want
  }

  test("all-isolated input: everything noise, n_eps = 1") {
    // separated along dim 0 so the PROJECTIONS are far apart too
    // (|Δp| = 5000 per step ≫ eps; separating along distinct dims
    // instead can collapse under the ±1 projection)
    val emb = (0 until 8).map { i =>
      (i.toLong, Array.tabulate(64)(d => if (d == 0) i * 5.0f else 0.0f).toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = Dbscan.cluster(emb).collect()
    got.foreach { r =>
      r.getLong(1) shouldBe 1L
      r.getBoolean(2) shouldBe false
      r.getLong(3) shouldBe -1L
    }
  }
}
