package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("mapPartitions decode path produces the stub's deterministic features") {
    val docs = Seq((7L, "abcd", "s3")).toDF("doc_id", "text", "source")
    val out = Multimodal.extractFeatures(Multimodal.asMediaTable(docs)).collect()(0)
    out.getLong(0) shouldBe 7L
    out.getLong(1) shouldBe 4L // byte_len
    out.getLong(2) shouldBe 68L // width = 64 + 4 % 576
    out.getLong(3) shouldBe 92L // height = 64 + 28 % 448
    out.getLong(4) shouldBe 5L // n_frames = 1 + 4 % 30
  }

  test("binary payload round-trips the exact bytes") {
    val docs = Seq((1L, "héllo", "src")).toDF("doc_id", "text", "source")
    val bytes = Multimodal.asMediaTable(docs).collect()(0).getAs[Array[Byte]]("data")
    new String(bytes, "UTF-8") shouldBe "héllo"
  }
}
