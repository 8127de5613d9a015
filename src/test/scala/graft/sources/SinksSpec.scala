package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class SinksSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("writeCounts emits the reference's 'word : count' output format") {
    val dir = "target/graft_sink_test"
    Sinks.writeCounts(Seq(("AB", 2L), ("BA", 1L)).toDF("word", "cnt"), dir, singleFile = true)
    val lines = spark.read.text(dir).collect().map(_.getString(0)).toSet
    lines shouldBe Set("AB : 2", "BA : 1")
  }

  test("appendMetricsRow accumulates rows across writes (POINTSFILE analog)") {
    val dir = "target/graft_metrics_test"
    val row1 = Seq((1000L, 3, "kmer_count", 1.23)).toDF("n", "k", "metric", "value")
    spark.sparkContext.hadoopConfiguration // touch to keep fs initialized
    new java.io.File(dir).listFiles() // ignore state; append twice fresh
    row1.write.mode("overwrite").csv(dir) // reset dir for test idempotence
    Sinks.appendMetricsRow(Seq((2000L, 3, "kmer_count", 2.34)).toDF("n", "k", "metric", "value"), dir)
    spark.read.csv(dir).count() shouldBe 2L
  }
}
