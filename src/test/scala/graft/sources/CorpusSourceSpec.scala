package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class CorpusSourceSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("fastaClean strips FASTA headers and newlines (modifier.sh parity)") {
    val df = Seq(">genome 1\nACGT\nTTAA\n>another header\nGG\n").toDF("value")
    df.select(CorpusSource.fastaClean(col("value")).as("t"))
      .collect()(0).getString(0) shouldBe "ACGTTTAAGG"
  }

  test("wholetext scan reads one row per file through the gzip codec") {
    val dir = "target/graft_corpus_test"
    Seq((1L, ">doc 1\nACGTAC"), (2L, ">doc 2\nGGTT"))
      .toDF("doc_id", "value")
      .write.partitionBy("doc_id").option("compression", "gzip")
      .mode("overwrite").text(dir)
    val rows = CorpusSource.readCorpus(spark, dir)
      .select(
        regexp_extract(col("file"), "doc_id=(\\d+)", 1).cast("long").as("doc_id"),
        CorpusSource.fastaClean(col("value")).as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows shouldBe Map(1L -> "ACGTAC", 2L -> "GGTT")
  }
}
