package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class BucketedTablesSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  test("bucketed equi-join plans with zero hash exchanges") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    // force the sort-merge path so bucketing (not broadcast) is what
    // removes the shuffle
    spark.conf.set(key, "-1")
    try {
      val df = BucketedTables.colocatedJoin(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      df.count() should be > 0L
    } finally spark.conf.set(key, old)
  }
}
