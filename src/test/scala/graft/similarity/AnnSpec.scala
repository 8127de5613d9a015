package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class AnnSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // v2 = 2*v1 (cosine 1 with v1), v3 orthogonal-ish to v1
  private val v1 = Array.tabulate(64)(i => if (i < 32) 1.0f else 0.0f)
  private val v2 = Array.tabulate(64)(i => if (i < 32) 2.0f else 0.0f)
  private val v3 = Array.tabulate(64)(i => if (i >= 32) 1.0f else 0.0f)
  private val emb = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")

  test("brute-force top-k ranks the colinear vector first") {
    val out = Ann.bruteForceTopK(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    out.length shouldBe 2
    out(0)._2 shouldBe 2L // rank 1 = colinear vector
    out(0)._3 shouldBe 1.0 +- 1e-12 // cosine; sqrt of unequal norms rounds
    out(1)._2 shouldBe 3L
    out(1)._3 shouldBe 0.0 +- 1e-12
  }

  test("multi-probe LSH recall is a superset of single-bucket LSH") {
    val single = Ann.lshTopK(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(_.getLong(1)).toSet
    val multi = Ann.lshTopKMultiProbe(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(_.getLong(1)).toSet
    single.subsetOf(multi) shouldBe true
    multi should contain(2L)
  }

  test("IVF top-k finds the colinear neighbor through its inverted list") {
    // m=2 centroids = vectors 1 and 2 (colinear) -> all three vectors'
    // nearest centroid lists overlap for query 1; neighbor 2 must rank 1
    val out = Ann.ivfTopK(emb, emb.where(col("vec_id") === 1), k = 2, m = 2, nprobe = 2)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    out.head._2 shouldBe 2L
    out.head._3 shouldBe 1.0 +- 1e-12
  }

  test("LSH top-k finds same-bucket colinear neighbor") {
    val out = Ann.lshTopK(emb, emb.where(col("vec_id") === 1), 2)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
    // colinear vectors have identical sign patterns on every hyperplane
    out.map(_._2) should contain(2L)
    out.find(_._2 == 2L).get._3 shouldBe 1.0 +- 1e-12
  }

  test("centroid silhouette: separated labels -> 1e6; a vector sitting on the other centroid -> negative mean") {
    def vec(a: Float, b: Float) =
      Array.tabulate(64)(i => if (i == 0) a else if (i == 1) b else 0.0f)
    // label 0: (1,0) and (0,1) -> centroid (500,500); label 1: (0,1) x2
    // -> centroid (0,1000). x2 sits exactly ON label 1's centroid:
    // d_own=500000, d_other=0 -> sil -1e6; x1: (2e6-5e5)/2e6 -> 750000.
    // label-0 mean = (750000-1000000)/2 = -125000. label 1: both at own
    // centroid (d_own=0, d_other=500000) -> mean 1e6.
    val e = Seq(
      (1L, vec(1f, 0f), 0), (2L, vec(0f, 1f), 0),
      (3L, vec(0f, 1f), 1), (4L, vec(0f, 1f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.centroidSilhouette(e)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(0L) shouldBe ((2L, -125000L))
    out(1L) shouldBe ((2L, 1000000L))

    // single-label input: silhouette undefined -> empty, not NULL rows
    val single = Seq((1L, vec(1f, 0f), 0), (2L, vec(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    Ann.centroidSilhouette(single).count() shouldBe 0L
  }

  test("streaming IVF ingest equals an independent nearest-centroid recomputation (r16)") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Ann.ivfStreamingIngestFromSaved(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replay: read the PERSISTED artifact, recompute the
    // argmax-cosine assignment in plain Scala (same IEEE arithmetic,
    // ties to min cid — the engine's ORDER BY csim DESC, cid)
    val cents = spark.read
      .parquet(graft.models.ModelStore.path("ivf_centroids_ingest", sfDir))
      .collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Seq[Long]]("cq").toArray, r.getAs[Long]("cnrm")))
    cents should not be empty
    val vecs = graft.dedup.Dedup.quantized(graft.Tables.embeddings(spark, sfDir))
      .select("vec_id", "q", "nrm").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Long]]("q").toArray, r.getAs[Long]("nrm")))
    val expected = vecs.map { case (id, q, nrm) =>
      val best = cents.map { case (cid, cq, cnrm) =>
        val dot = q.indices.map(i => q(i) * cq(i)).sum
        (dot.toDouble / (math.sqrt(nrm.toDouble) * math.sqrt(cnrm.toDouble)), cid)
      }.maxBy { case (sim, cid) => (sim, -cid) }
      id -> best._2
    }.toMap
    got.keySet shouldBe vecs.map(_._1).toSet // every vector lands exactly once
    got shouldBe expected
  }

  test("gram matrix: upper triangle of sum of outer products, exact") {
    import spark.implicits._
    // two vectors, constant 1.0 and alternating ±2.0 (quantized 1000 / ±2000)
    val vs = Seq(
      (0L, Array.fill(64)(1.0f)),
      (1L, Array.tabulate(64)(i => if (i % 2 == 0) 2.0f else -2.0f))).toDF("vec_id", "embedding")
    val out = Ann.gramMatrixUpper(vs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.size shouldBe 64 * 65 / 2
    // G[0][0] = 1000² + 2000²; G[0][1] = 1000·1000 + 2000·(−2000)
    out((0L, 0L)) shouldBe (1000L * 1000 + 2000L * 2000)
    out((0L, 1L)) shouldBe (1000L * 1000 - 2000L * 2000)
    out.contains((1L, 0L)) shouldBe false // strictly upper triangle
  }

  test("kmeans step: centroid members and exact dimension sums") {
    // 4-dim-style tiny corpus embedded in 64 dims: vectors 0 and 1 are
    // the centroids; 2 is colinear with 1, 3 with 0 -> memberships {0,3} {1,2}
    import spark.implicits._
    def vec(base: Float, scale: Float) = Array.tabulate(64)(i => if (i % 2 == 0) base * scale else -base * scale)
    val vs = Seq(
      (0L, vec(1.0f, 1.0f)),
      (1L, vec(-1.0f, 1.0f)),
      (2L, vec(-1.0f, 2.0f)),
      (3L, vec(1.0f, 3.0f))).toDF("vec_id", "embedding")
    val out = Ann.kmeansStep(vs, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // every (cid, dim) row carries its cluster size
    out.keys.map(_._1).toSet shouldBe Set(0L, 1L)
    out((0L, 0L))._1 shouldBe 2L // vectors 0 and 3
    out((1L, 0L))._1 shouldBe 2L // vectors 1 and 2
    // dim 0 sums: cluster 0: 1000 + 3000; cluster 1: -1000 + -2000
    out((0L, 0L))._2 shouldBe 4000L
    out((1L, 0L))._2 shouldBe -3000L
  }

  test("probe select: cheapest setting above the floor per method; floor unmet -> max recall (r19)") {
    val sfDir = "/root/testdata/sf0.001"
    val embT = graft.Tables.embeddings(spark, sfDir)
    val qs = embT.where(col("vec_id") < 10)
    val curve = Ann.annRecallCurve(embT, qs, k = 5, mpProbes = Seq(1, 3, 5), bits = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    val ivf = curve.filter(_._1 == "ivf_trained").sortBy(_._2)
    // the corpus must yield a non-flat IVF curve or these tests test nothing
    ivf.map(_._3).distinct.size should be > 1
    // floor = max ivf recall: only the best setting(s) meet it
    val floorHigh = ivf.map(_._3).max
    val selHigh = Ann.annProbeSelect(embT, qs, k = 5, mpProbes = Seq(1, 3, 5), bits = 4,
        recallFloorPermille = floorHigh)
      .where(col("method") === "ivf_trained" && col("chosen") === 1L)
      .collect().map(r => r.getLong(1))
    selHigh.length shouldBe 1
    selHigh.head shouldBe ivf.filter(_._3 >= floorHigh).map(_._2).min
    // floor above everything: the rule degrades to max recall
    val selUnmet = Ann.annProbeSelect(embT, qs, k = 5, mpProbes = Seq(1, 3, 5), bits = 4,
        recallFloorPermille = 1001L)
      .where(col("method") === "ivf_trained" && col("chosen") === 1L)
      .collect().map(r => r.getLong(1))
    val maxRecall = ivf.map(_._3).max
    selUnmet.head shouldBe ivf.filter(_._3 == maxRecall).map(_._2).min
    // exactly one chosen marker per method
    val perMethod = Ann.annProbeSelect(embT, qs, k = 5, mpProbes = Seq(1, 3, 5), bits = 4)
      .groupBy("method").agg(sum("chosen").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perMethod shouldBe Map("ivf_trained" -> 1L, "lsh_multiprobe" -> 1L)
  }

  test("chosen-nprobe apply: the decision DRIVES the search — two floors, two applied sets (r19)") {
    val sfDir = "/root/testdata/sf0.001"
    val embT = graft.Tables.embeddings(spark, sfDir)
    val qs = embT.where(col("vec_id") < 10)
    val curve = Ann.annRecallCurve(embT, qs, k = 5, mpProbes = Seq(1, 3, 5), bits = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    val ivf = curve.filter(_._1 == "ivf_trained").sortBy(_._2)
    ivf.map(_._3).distinct.size should be > 1
    val floorLow = ivf.map(_._3).min   // every setting meets it -> cheapest (min nprobe)
    val floorHigh = ivf.map(_._3).max  // only the best meets it -> a LARGER nprobe
    val npLow = ivf.map(_._2).min
    val npHigh = ivf.filter(_._3 >= floorHigh).map(_._2).min
    npLow should not be npHigh
    def applied(floor: Long): Seq[(Long, Long, Long)] =
      Ann.annIvfChosenNprobe(embT, qs, k = 5, bits = 4,
          recallFloorPermille = floor)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val low = applied(floorLow)
    val high = applied(floorHigh)
    low should not equal high
    // and each applied set IS the production trained search at its chosen setting
    def prod(np: Int): Seq[(Long, Long, Long)] =
      Ann.ivfTrainedTopK(embT, qs, k = 5, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    low shouldBe prod(npLow.toInt)
    high shouldBe prod(npHigh.toInt)
  }
}
