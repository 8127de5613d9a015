package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class PartitionedLayoutSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  test("equality predicate on the partition column becomes a PartitionFilter") {
    val df = PartitionedLayout.readLayout(spark, "/root/testdata/sf0.001")
      .where(col("event_type") === "purchase")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("purchase")
    // and the data actually filters
    df.select("event_type").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("purchase")
  }
}
