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
  // includes %-escaped spellings: unreserved escapes in both hex cases
  // (decode targets), a reserved escape in both cases (uppercase-only
  // targets), and malformed escapes (byte-identical passthrough) — the
  // idempotence property below must hold over ALL of them (r18)
  private val pathSeg: Gen[String] = Gen.oneOf(
    "a", "b2", "files", "x-y", "f%69les", "f%69Les", "%7Edoc", "%7edoc",
    "a%2Fb", "a%2fb", "p%4", "p%zz", "q%")
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

  // ---- r18: percent-encoding normalization + the scheme guard --------

  /** A plain path alongside its %-escaped-unreserved spelling (random
    * hex case) — the two spellings a real crawl URL list mixes freely.
    */
  private val encodedPair: Gen[(String, String)] = for {
    segs <- Gen.nonEmptyListOf(Gen.oneOf("files", "doc", "a1"))
    hexCase <- Gen.oneOf(true, false)
  } yield {
    val plain = "/" + segs.mkString("/")
    val enc = plain.flatMap {
      case c if c.isLetter =>
        val h = "%%%02X".format(c.toInt)
        if (hexCase) h else h.toLowerCase
      case c => c.toString
    }
    (plain, enc)
  }

  property("unreserved %-escapes decode: both spellings share one canonical form") =
    forAll(scheme, host, encodedPair, params) { case (s, h, (plain, enc), qs) =>
      canon(Seq(assemble(s, h, plain, qs, ""), assemble(s, h, enc, qs, "")))
        .distinct.length == 1
    }

  property("reserved %-escapes keep their bytes; only the hex case normalizes") =
    forAll(scheme, host, Gen.oneOf("2F", "3F", "23", "40")) { (s, h, hex) =>
      val Seq(lo, up) = canon(Seq(
        s"$s://$h/x%${hex.toLowerCase}y", s"$s://$h/x%${hex}y"))
      lo == up && lo.endsWith(s"/x%${hex}y")
    }

  property("scheme-less inputs pass through unchanged (fixed-point guard)") =
    forAll(host, path, params) { (h, p, qs) =>
      val u = h + p + (if (qs.isEmpty) "" else "?" + qs.mkString("&"))
      canon(Seq(u)) == Seq(u)
    }

  /** Userinfo in mixed case — case-SENSITIVE per RFC 3986 §3.2.1,
    * unlike the host that follows it.
    */
  private val userinfo: Gen[String] = for {
    u <- Gen.oneOf("User", "aB3", "x")
    pw <- Gen.option(Gen.oneOf("PaSs", "s3cr3t"))
  } yield u + pw.map(":" + _).getOrElse("")

  property("userinfo survives case-sensitively while the host case-folds; still idempotent") =
    forAll(scheme, userinfo, host, path, params) { (s, ui, h, p, qs) =>
      val u = s + "://" + ui + "@" + h.toUpperCase + p +
        (if (qs.isEmpty) "" else "?" + qs.mkString("&"))
      val Seq(c1) = canon(Seq(u))
      val Seq(c2) = canon(Seq(c1))
      c1.startsWith(s + "://" + ui + "@" + h) && c2 == c1
    }
}
