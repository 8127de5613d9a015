package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

/** Differential check: the 64-bit gram-hash stream
  * ([[Dedup.wordNgramHashesRaw]], what decontamination and the Jaccard
  * join now shuffle) is a faithful stand-in for the gram STRING stream
  * ([[Dedup.wordNgramsRaw]], kept as this spec's oracle): same window
  * count per doc, and hash equality ≡ gram equality on real data (a
  * collision would break the bijection between distinct grams and
  * distinct hashes).
  */
class WordNgramHashSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "§ü", "0")
  private val docs = (1L to 60L).map { id =>
    val len = rnd.nextInt(12) // includes empty and shorter-than-n docs
    (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
  }.toDF("doc_id", "text")

  for (n <- Seq(2, 5)) {
    test(s"n=$n: hash stream matches the string stream window-for-window") {
      val strings = Dedup.wordNgramsRaw(docs, n)
      val hashes = Dedup.wordNgramHashesRaw(docs, n)

      // same multiset size per doc (every window present exactly once)
      val cs = strings.groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ch = hashes.groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      ch shouldBe cs

      // bijection: |distinct grams| == |distinct hashes| globally AND
      // per doc — hash equality is exactly gram equality on this data
      strings.select("gram").distinct().count() shouldBe
        hashes.select("gh").distinct().count()
      val ds = strings.distinct().groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dh = hashes.distinct().groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      dh shouldBe ds
    }
  }

  test("cross-doc equality: gram-join pairs == hash-join pairs") {
    val n = 3
    val s = Dedup.wordNgramsRaw(docs, n).distinct()
    val h = Dedup.wordNgramHashesRaw(docs, n).distinct()
    def pairs(df: org.apache.spark.sql.DataFrame, key: String): Set[(Long, Long)] = {
      val a = df.toDF("doc_a", key)
      val b = df.toDF("doc_b", key)
      a.join(b, key).where($"doc_a" < $"doc_b").select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    pairs(h, "gh") shouldBe pairs(s, "gram")
  }
}
