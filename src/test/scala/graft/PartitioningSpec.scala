package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PartitioningSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("fanOut repartitions a small scan but leaves a 'big' one alone") {
    // small corpus: estimated bytes << target * maxPartitionBytes -> fan out
    Partitioning.fanOut(docs).queryExecution.executedPlan.toString should
      include("RoundRobinPartitioning")
    // shrink the split size so the same bytes count as "already parallel"
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, "1b")
    try {
      Partitioning.fanOut(docs).queryExecution.executedPlan.toString should
        not include "RoundRobinPartitioning"
    } finally spark.conf.set(key, old)
  }

}
