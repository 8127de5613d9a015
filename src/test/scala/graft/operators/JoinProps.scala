package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** Property twins for the composite join operators: the scale-safe
  * formulations (UNION+window as-of, bucket-explode range join,
  * priority-sampling rank cut) must agree with brute-force in-driver
  * models on random inputs — including the tie/boundary cases random
  * generation hits far more often than the gate corpus does.
  */
object JoinProps extends Properties("Joins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private val keyGen = Gen.chooseNum(1L, 4L) // few keys → dense per-key histories
  private val timeGen = Gen.chooseNum(0L, 40L) // small domain → frequent exact ties

  property("as-of join equals the brute-force latest-at-or-before model") =
    forAll(
      Gen.listOfN(25, Gen.zip(keyGen, timeGen)),
      Gen.listOfN(12, Gen.zip(keyGen, timeGen)),
    ) { (leftRaw, rightRaw) =>
      import spark.implicits._
      val left = leftRaw.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rightRaw.distinctBy(r => (r._1, r._2)) // unique per (key, time) — the operator's contract
        .map { case (k, t) => (k, t, k * 1000 + t) }
      val l = left.toDF("k", "t", "ev")
      val r = right.toDF("k", "t", "p")
      val got = AsOf.asOfJoin(l, r, "k", "t", "p")
        .collect().map(row => row.getAs[Long]("ev") -> Option(row.getAs[Any]("p"))).toMap
      val want = left.map { case (k, t, ev) =>
        ev -> right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3.asInstanceOf[Any])
      }.toMap
      got == want
    }

  property("bucketed range join equals the naive predicate join for any bucket width") =
    forAll(
      Gen.listOfN(30, Gen.chooseNum(0.0, 100.0)),
      Gen.listOfN(6, Gen.zip(Gen.chooseNum(0.0, 90.0), Gen.chooseNum(1.0, 40.0))),
      Gen.oneOf(1.0, 7.0, 25.0, 50.0, 200.0),
    ) { (values, intervalsRaw, width) =>
      import spark.implicits._
      val intervals = intervalsRaw.zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
      val l = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val r = intervals.toDF("band", "lo", "hi")
      val got = RangeJoin.rangeJoin(l, "v", r, "lo", "hi", bucketWidth = width)
        .collect().map(row => (row.getAs[Long]("id"), row.getAs[Long]("band"))).toSet
      val want = (for {
        (id, v) <- values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        (band, lo, hi) <- intervals if v >= lo && v < hi
      } yield (id, band)).toSet
      got == want
    }

  property("weighted priority sample equals the brute-force top-k per group") =
    forAll(
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 10000L), Gen.oneOf("en", "de", "zh"), Gen.chooseNum(1L, 5000L))),
      Gen.chooseNum(1, 8),
    ) { (rowsRaw, k) =>
      import spark.implicits._
      val rows = rowsRaw.distinctBy(_._1)
      val docs = rows.toDF("doc_id", "lang", "n_chars")
      val got = graft.curation.Curation.weightedPrioritySample(docs, k, "prop")
        .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("rk"), r.getAs[Long]("doc_id"))).toSet
      // brute force with the exact same md5-derived priority
      val withPriority = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(
            org.apache.spark.sql.functions.md5(
              org.apache.spark.sql.functions.concat(
                org.apache.spark.sql.functions.lit("prop:"),
                org.apache.spark.sql.functions.col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").as("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val nChars = rows.map(r => r._1 -> r._3).toMap
      val want = withPriority
        .map { case (id, lang, v) => (id, lang, nChars(id).toDouble * 4294967297.0 / (v + 1.0)) }
        .groupBy(_._2)
        .flatMap { case (lang, docs) =>
          docs.sortBy(d => (-d._3, d._1)).take(k).zipWithIndex
            .map { case ((id, _, _), i) => (lang, (i + 1).toLong, id) }
        }.toSet
      got == want
    }
}
