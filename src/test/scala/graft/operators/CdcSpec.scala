package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark

class CdcSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // keys chosen to hit every cohort: 13→update, 17→delete, 11→insert-src, 20→untouched
  private val base = Seq(
    (13L, "O", 100.00), (17L, "O", 200.00), (11L, "F", 300.00), (20L, "O", 400.00),
  ).toDF("o_orderkey", "o_orderstatus", "o_totalprice")

  test("mergeUpsert applies update, delete, insert; leaves the rest") {
    val out = Cdc.mergeUpsert(base, Cdc.changeFeed(base)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    out.keySet shouldBe Set(13L, 11L, 20L, Cdc.InsertKeyOffset + 11L)
    out(13L) shouldBe (("U", 110.00))          // updated: ×1.1 exact decimal
    out(20L) shouldBe (("O", 400.00))          // untouched
    out(11L) shouldBe (("F", 300.00))          // insert SOURCE row remains
    out(Cdc.InsertKeyOffset + 11L) shouldBe (("F", 300.00)) // cloned insert
  }

  test("scd2History: closed v1 for update/delete, v2 for update/insert") {
    val out = Cdc.scd2History(base, Cdc.changeFeed(base)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getDouble(3), r.getBoolean(4))).toMap
    out((13L, 1L)) shouldBe (("O", 100.00, false)) // closed by update
    out((13L, 2L)) shouldBe (("U", 110.00, true))  // new current
    out((17L, 1L)) shouldBe (("O", 200.00, false)) // closed by delete, no v2
    out.contains((17L, 2L)) shouldBe false
    out((20L, 1L)) shouldBe (("O", 400.00, true))  // untouched current
    out((Cdc.InsertKeyOffset + 11L, 2L)) shouldBe (("F", 300.00, true))
    out.contains((Cdc.InsertKeyOffset + 11L, 1L)) shouldBe false
    out((11L, 1L)) shouldBe (("F", 300.00, true))  // source of insert untouched
  }

  test("streaming twin lands exactly the batch merge relation") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, dir)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getDouble(2))
    val batch = Cdc.mergeUpsert(orders, Cdc.changeFeed(orders))
      .collect().map(key).sortBy(_._1)
    val streamed = Cdc.runStreamingCdcMerge(spark, dir)
      .collect().map(key).sortBy(_._1)
    streamed shouldBe batch
  }

  test("aggMaintain equals a recompute over the merged table, across group moves") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_orderstatus").agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum("o_totalprice").as("sum_price"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val maintained = Cdc.aggMaintain(base, Cdc.aggDelta(base)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val recomputed = agg(Cdc.mergeUpsert(base, Cdc.changeFeed(base)))
    maintained shouldBe recomputed
    // the update MOVED key 13 out of 'O' into 'U': retraction visible
    maintained("O") shouldBe ((1L, 400.00)) // only untouched key 20 (17 deleted, 13 moved)
    maintained("U") shouldBe ((1L, 110.00)) // after-image landed in the new group
    maintained("F") shouldBe ((2L, 600.00)) // insert source + clone
  }

  test("join-view maintenance equals recompute across the dimension join") {
    // base keys: 13→update (cust 1), 17→delete (cust 2), 11→insert-src
    // (cust 1), 20→untouched (cust 2); customers map to nations 5 and 9
    val baseJ = Seq(
      (13L, 1L, "O", 100.00), (17L, 2L, "O", 200.00),
      (11L, 1L, "F", 300.00), (20L, 2L, "O", 400.00),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Seq((1L, 5), (2L, 9)).toDF("c_custkey", "c_nationkey")
    val out = Cdc.joinMaintain(baseJ, cust).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // nation 5: key 13 moved O→U (+10%); key 11 stays F and its insert
    // clone doubles the F group. nation 9: 17 deleted, 20 untouched.
    out shouldBe Map(
      (5L, "U") -> ((1L, 110.00)),
      (5L, "F") -> ((2L, 600.00)),
      (9L, "O") -> ((1L, 400.00)))
  }

  test("merge then re-merge is idempotent for U/D cohorts on unchanged keys") {
    // merging an EMPTY change feed returns the base unchanged
    val empty = Cdc.changeFeed(base.where($"o_orderkey" < 0))
    val out = Cdc.mergeUpsert(base, empty).collect()
    out.length shouldBe 4
    out.map(_.getLong(0)).sorted shouldBe Array(11L, 13L, 17L, 20L)
  }
}
