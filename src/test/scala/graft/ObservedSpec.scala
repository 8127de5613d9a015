package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ObservedSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("observe delivers quality metrics on the query's own pass") {
    val collector = Observed.install(spark)
    try {
      val df = Seq((1L, "a"), (2L, "b"), (5L, "c")).toDF("k", "v")
      val observed = Observed.withKeyStats(df, "obs_test", "k")
      // the observing query does real work; metrics ride along
      observed.where(col("k") > 0).count() shouldBe 3L
      // QueryExecutionListener delivery is async — poll briefly
      val deadline = System.currentTimeMillis() + 30000
      while (collector.get("obs_test").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val row = collector.get("obs_test").get
      row.getLong(row.fieldIndex("rows")) shouldBe 3L
      row.getLong(row.fieldIndex("null_keys")) shouldBe 0L
      row.getLong(row.fieldIndex("min_key")) shouldBe 1L
      row.getLong(row.fieldIndex("max_key")) shouldBe 5L
    } finally spark.listenerManager.unregister(collector)
  }
}
