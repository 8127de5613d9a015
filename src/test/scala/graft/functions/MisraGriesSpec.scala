package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark
import graft.text.HeavyHitters

/** Pins the Misra–Gries guarantees the two-pass heavy-hitters relies on:
  *  - superset: any item with true frequency > n/(k+1) survives the
  *    summary, for any arrival order AND any partition split (merge);
  *  - the output encoder yields a real SQL array (explodable) — the
  *    round-5 kryo encoder made `explode` fail analysis.
  */
class MisraGriesSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freqs(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("reduce keeps every item with freq > n/(k+1) — adversarial order") {
    val k = 3
    // heavy item "h": freq 10 of n=20 > 20/(k+1)=5, each occurrence
    // immediately followed by a fresh distractor (worst case for MG)
    val stream = (1 to 10).flatMap(i => Seq("h", s"d$i"))
    val agg = new MisraGriesAgg(k)
    val summary = stream.foldLeft(agg.zero)(agg.reduce)
    summary.keySet should contain("h")
    summary.size should be <= k
  }

  test("merge across partition summaries preserves the superset guarantee") {
    val k = 3
    val agg = new MisraGriesAgg(k)
    // 4 "partitions", heavy item total 24 of n=60 > 60/4 = 15
    val parts = Seq(
      (1 to 6).flatMap(i => Seq("h", s"a$i")) ++ Seq("h", "h", "h"),       // 15, h=9
      (1 to 6).flatMap(i => Seq("h", s"b$i")) ++ Seq("h", "h", "h"),       // 15, h=9
      (1 to 12).map(i => s"c$i") ++ Seq("h", "h", "h"),                    // 15, h=3
      (1 to 12).map(i => s"e$i") ++ Seq("h", "h", "h"),                    // 15, h=3
    )
    parts.map(_.size).sum shouldBe 60
    parts.flatten.count(_ == "h") shouldBe 24
    val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
    merged.keySet should contain("h")
    merged.size should be <= k
  }

  test("udaf output is a real SQL array — explode works end-to-end") {
    val k = 4
    val mg = udaf(new MisraGriesAgg(k))
    val data = ((1 to 50).map(_ => "big") ++ (1 to 30).map(i => s"small$i")).toDF("term")
    val cands = data.repartition(4)
      .agg(mg(col("term")).as("cands"))
      .select(explode(col("cands")).as("term"))
      .as[String].collect().toSet
    cands should contain("big") // freq 50 of 80 > 80/5 = 16
    cands.size should be <= k
  }

  test("heavy_hitters recount drops MG false positives and is exact") {
    // n = 40: "alpha"×20, "beta"×12, 8 singletons. k=4 → threshold n/5 = 8:
    // exactly {alpha, beta} qualify, whatever MG's summary contains.
    val words = (1 to 20).map(_ => "alpha") ++ (1 to 12).map(_ => "beta") ++
      (1 to 8).map(i => s"uniq$i")
    val docs = words.grouped(5).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val out = HeavyHitters.heavyHitters(docs, k = 4)
      .orderBy("term")
      .as[(String, Long, Long)].collect()
    out shouldBe Array(("alpha", 20L, 40L), ("beta", 12L, 40L))
    val expected = freqs(words).filter { case (_, c) => c * 5 > 40 }
    out.map(r => r._1 -> r._2).toMap shouldBe expected
  }
}
