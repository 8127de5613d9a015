package graft.sources

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class CompactionSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private def partFiles(dir: String): Seq[File] =
    new File(dir).listFiles().toSeq
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compaction rewrites a fragmented dir into bounded files, content intact") {
    val base = new File(graft.OutDir.base, "compaction_test").getAbsolutePath
    val frag = s"$base/fragmented"
    val compacted = s"$base/compacted"
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    events.repartition(64).write.mode("overwrite").parquet(frag)
    partFiles(frag).size shouldBe 64 // the small-files problem, synthesized

    val n = Sinks.compactParquet(spark, frag, compacted, targetRecordsPerFile = 300)
    n shouldBe events.count()
    val outFiles = partFiles(compacted)
    outFiles.size shouldBe math.ceil(n.toDouble / 300).toInt // 1000 rows -> 4 files

    // content preserved exactly
    val a = spark.read.parquet(compacted).agg(
      count(lit(1)), sum(col("event_id")), sum(col("value").cast("decimal(12,2)")))
      .collect().head
    val b = events.agg(
      count(lit(1)), sum(col("event_id")), sum(col("value").cast("decimal(12,2)")))
      .collect().head
    a shouldBe b
  }
}
