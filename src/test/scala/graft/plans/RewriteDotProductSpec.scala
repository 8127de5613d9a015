package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class RewriteDotProductSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // column inputs — literal arrays would be constant-folded away before
  // the rewrite is observable in the plan; ConvertToLocalRelation would
  // likewise evaluate the whole projection over an inline relation at
  // optimize time, so it is excluded while inspecting plans here
  private def arrDf = Seq((Seq(3L, 4L), Seq(1L, 2L))).toDF("a", "b")

  private def withPlanVisible[T](body: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("self-dot HOF pattern is rewritten to dot_i64 and stays correct") {
    withPlanVisible {
      val df = arrDf.selectExpr(
        "aggregate(zip_with(a, a, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS nrm")
      df.queryExecution.optimizedPlan.toString should include("dot_i64")
      df.collect()(0).getLong(0) shouldBe 25L
    }
  }

  test("two-sided (non-self) pattern is NOT rewritten — null-pad semantics differ") {
    withPlanVisible {
      val df = arrDf.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d")
      df.queryExecution.optimizedPlan.toString should not include "dot_i64"
      df.collect()(0).getLong(0) shouldBe 11L
    }
  }

  test("non-multiply lambda is NOT rewritten") {
    withPlanVisible {
      val df = arrDf.selectExpr(
        "aggregate(zip_with(a, a, (x, y) -> x + y), 0L, (acc, v) -> acc + v) AS d")
      df.queryExecution.optimizedPlan.toString should not include "dot_i64"
      df.collect()(0).getLong(0) shouldBe 14L
    }
  }

  test("range join gate shape: bucketized band join equals theta semantics") {
    import org.apache.spark.sql.functions._
    val left = Seq(5.0, 12.5, 59.9, 60.0, 499.0).toDF("value").withColumn("id", monotonically_increasing_id())
    val bands = Seq(("a", 0.0, 12.5), ("b", 12.5, 60.0), ("c", 60.0, 500.0)).toDF("band", "lo", "hi")
    val out = graft.operators.RangeJoin.rangeJoin(left, "value", bands, "lo", "hi", 25.0)
      .select("value", "band")
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    out shouldBe Map(5.0 -> "a", 12.5 -> "b", 59.9 -> "b", 60.0 -> "c", 499.0 -> "c")
  }
}
