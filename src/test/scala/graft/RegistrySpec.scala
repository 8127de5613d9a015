package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the driver contract: SparkEntry.queries is built as a Map, so a
  * duplicate registry name would silently DROP a query from the gate.
  */
class RegistrySpec extends AnyFunSuite with Matchers {

  test("registry names are unique, well-formed, and survive the Map") {
    val names = Registry.all.map(_.name)
    names.distinct.length shouldBe names.length
    names.foreach(n => n should fullyMatch regex "[a-z0-9_]+")
    SparkEntry.queries.size shouldBe names.length
  }

  test("flagship entry returns rows (the driver's smoke check)") {
    SparkEntry.entry(TestSpark.spark).limit(1).count() shouldBe 1L
  }

  test("every oracle key exists in queries; headline set is non-empty") {
    SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet) shouldBe true
    Registry.all.count(_.headline) should be >= 8
    // every query has an oracle — the approximate-sketch queries are
    // self-verifying (exact value + within-tolerance boolean relation)
    Registry.all.filter(_.oracle.isEmpty).map(_.name) shouldBe empty
  }
}
