package graft.dedup

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** ScalaCheck pin of the algebraic facts the canonical-URL dedup family
  * relies on, over structured random URLs through the real
  * [[UrlDedup.canonicalizeUrl]] column expression:
  *
  *  1. idempotence: canon(canon(u)) = canon(u) — a canonical form that
  *     isn't a fixed point would make re-ingesting already-deduped
  *     corpora re-split groups;
  *  2. scheme/host case invariance;
  *  3. tracking-parameter invariance (inserting utm_ / fbclid / gclid
  *     params anywhere never changes the canonical form);
  *  4. query-parameter order invariance;
  *  5. fragment invariance.
  *
  * Small batched Spark jobs (one select per property case).
  */
object UrlProps extends Properties("UrlCanonicalize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlDedup.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  private val scheme: Gen[String] = Gen.oneOf("http", "https")
  private val host: Gen[String] =
    Gen.listOfN(2, Gen.oneOf("alpha", "beta", "cdn7", "m")).map(_.mkString(".") + ".example.com")
  private val pathSeg: Gen[String] = Gen.oneOf("a", "b2", "files", "x-y")
  private val path: Gen[String] = for {
    n <- Gen.chooseNum(0, 3)
    segs <- Gen.listOfN(n, pathSeg)
    trail <- Gen.oneOf("", "/", "//") // trailing-slash runs must still be fixed points
  } yield (if (segs.isEmpty) "" else "/" + segs.mkString("/")) + trail
  private val param: Gen[String] = for {
    k <- Gen.oneOf("id", "page", "q", "sort")
    v <- Gen.chooseNum(0, 99)
  } yield s"$k=$v"
  private val trackingParam: Gen[String] =
    Gen.oneOf("utm_source=feed", "utm_campaign=x", "fbclid=abc123", "gclid=9z")
  private val params: Gen[List[String]] = Gen.chooseNum(0, 4).flatMap(Gen.listOfN(_, param))

  private def assemble(sch: String, h: String, p: String, qs: List[String], frag: String): String =
    sch + "://" + h + p +
      (if (qs.isEmpty) "" else "?" + qs.mkString("&")) +
      (if (frag.isEmpty) "" else "#" + frag)

  property("idempotence: the canonical form is a fixed point") =
    forAll(scheme, host, path, params) { (s, h, p, qs) =>
      val u = assemble(s, h, p, qs, "frag")
      val Seq(c1) = canon(Seq(u))
      val Seq(c2) = canon(Seq(c1))
      c2 == c1
    }

  property("scheme/host case and fragments never change the canonical form") =
    forAll(scheme, host, path, params, Gen.alphaStr) { (s, h, p, qs, frag) =>
      val base = assemble(s, h, p, qs, "")
      val shouted = assemble(s.toUpperCase, h.toUpperCase, p, qs, frag)
      canon(Seq(base, shouted)).distinct.length == 1
    }

  property("tracking params inserted at any position are invisible") =
    forAll(scheme, host, path, params, trackingParam, Gen.chooseNum(0, 4)) {
      (s, h, p, qs, tp, at) =>
        val withTracking = qs.patch(math.min(at, qs.length), Seq(tp), 0)
        canon(Seq(assemble(s, h, p, qs, ""), assemble(s, h, p, withTracking, "")))
          .distinct.length == 1
    }

  property("query-param order never changes the canonical form") =
    forAll(scheme, host, path, params, Gen.long) { (s, h, p, qs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(qs)
      canon(Seq(assemble(s, h, p, qs, ""), assemble(s, h, p, shuffled, "")))
        .distinct.length == 1
    }
}
