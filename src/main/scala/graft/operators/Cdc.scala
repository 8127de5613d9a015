package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{EngineQuery, Tables}

/** Change-data-capture merge — MERGE INTO / upsert semantics and SCD2
  * (slowly-changing-dimension type 2) history, the ingestion pattern
  * every periodically-refreshed 100 TB table needs (Delta/Iceberg
  * MERGE, Kimball SCD2). Not in the reference (one-shot batch only);
  * north-star extension.
  *
  * The change feed is DERIVED deterministically from the snapshot
  * itself (update/delete/insert cohorts keyed on o_orderkey mod 10),
  * so both engines construct bit-identical inputs and the gate checks
  * the MERGE algebra, not a synthetic-data generator:
  *  - keys ≡ 3 (mod 10): update — status → 'U', totalprice × 1.1
  *    (exact decimal arithmetic, double only at the surface);
  *  - keys ≡ 7 (mod 10): delete;
  *  - keys ≡ 1 (mod 10): insert — the row cloned under key+10^9.
  *
  * Plan shape: ONE full-outer shuffle join on the merge key resolves
  * all three verbs in a single pass — no per-verb subqueries, no
  * union-of-three-joins. At 100 TB both sides hash-partition on the
  * key; with the base table bucketed by key (see
  * [[graft.sources.BucketedTables]]) the base side doesn't even
  * shuffle, which is the Delta/Iceberg merge-on-read layout argument.
  * SCD2 derives open/closed version rows from the same single join —
  * history is a projection of the merge, not a second pass.
  */
object Cdc {

  val InsertKeyOffset = 1000000000L

  // The single source of truth for the derived change feed's cohort
  // rule — changeFeed, aggDelta, and the duckChanges oracle SQL all
  // read these, so the three stay in lockstep by construction.
  private val UpdateCohort = 3
  private val DeleteCohort = 7
  private val InsertCohort = 1
  private val UpliftLit = "1.1" // update multiplier, DECIMAL(2,1)

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
  private def uplift = lit(UpliftLit).cast(DecimalType(2, 1))

  /** The deterministic change feed: (o_orderkey, op, new_status,
    * new_totalprice) with op ∈ {'U','D','I'}. */
  def changeFeed(orders: DataFrame): DataFrame = {
    val m = col("o_orderkey") % 10
    val upd = orders.where(m === UpdateCohort).select(
      col("o_orderkey"), lit("U").as("op"), lit("U").as("new_status"),
      (dec(col("o_totalprice")) * uplift).as("new_totalprice"))
    val del = orders.where(m === DeleteCohort).select(
      col("o_orderkey"), lit("D").as("op"),
      lit(null).cast("string").as("new_status"),
      lit(null).cast(DecimalType(15, 3)).as("new_totalprice"))
    val ins = orders.where(m === InsertCohort).select(
      (col("o_orderkey") + InsertKeyOffset).as("o_orderkey"), lit("I").as("op"),
      col("o_orderstatus").as("new_status"),
      dec(col("o_totalprice")).cast(DecimalType(15, 3)).as("new_totalprice"))
    upd.unionByName(del).unionByName(ins)
  }

  /** MERGE INTO: one full-outer join resolves update/delete/insert.
    * Emits the merged table (key, status, totalprice). */
  def mergeUpsert(base: DataFrame, changes: DataFrame): DataFrame =
    base
      .select(col("o_orderkey"), col("o_orderstatus"),
        dec(col("o_totalprice")).cast(DecimalType(15, 3)).as("o_totalprice"))
      .join(changes, Seq("o_orderkey"), "full_outer")
      .where(col("op").isNull || col("op") =!= "D")
      .select(
        col("o_orderkey"),
        when(col("op") === "U" || col("op") === "I", col("new_status"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(col("op") === "U" || col("op") === "I", col("new_totalprice"))
          .otherwise(col("o_totalprice")).cast("double").as("o_totalprice"))

  /** SCD2 history from the same single join: version 1 = the base row
    * (closed by an update or delete, else current); version 2 = the
    * post-change row for updates and inserts. */
  def scd2History(base: DataFrame, changes: DataFrame): DataFrame = {
    val joined = base
      .select(col("o_orderkey"), col("o_orderstatus"),
        dec(col("o_totalprice")).cast(DecimalType(15, 3)).as("o_totalprice"))
      .join(changes, Seq("o_orderkey"), "full_outer")
    val v1 = joined.where(col("op").isNull || col("op").isin("U", "D"))
      .select(
        col("o_orderkey"), lit(1L).as("version"),
        col("o_orderstatus"), col("o_totalprice").cast("double").as("o_totalprice"),
        col("op").isNull.as("is_current"))
    val v2 = joined.where(col("op") === "U" || col("op") === "I")
      .select(
        col("o_orderkey"), lit(2L).as("version"),
        col("new_status").as("o_orderstatus"),
        col("new_totalprice").cast("double").as("o_totalprice"),
        lit(true).as("is_current"))
    v1.unionByName(v2)
  }

  /** The change feed as BEFORE/AFTER-image aggregate deltas: each change
    * row contributes (status, ±1, ±price) terms — an update retracts its
    * before-image from the old group and adds the after-image to the new
    * one, a delete retracts, an insert adds. This is the input a
    * delta-maintained materialized view consumes: note it derives from
    * the change cohorts alone, never a scan of the maintained base.
    */
  def aggDelta(orders: DataFrame): DataFrame = {
    val m = col("o_orderkey") % 10
    def price = dec(col("o_totalprice")).cast(DecimalType(15, 3))
    val updOld = orders.where(m === UpdateCohort).select(
      col("o_orderstatus").as("status"), lit(-1L).as("d_cnt"), (-price).as("d_sum"))
    val updNew = orders.where(m === UpdateCohort).select(
      lit("U").as("status"), lit(1L).as("d_cnt"),
      (dec(col("o_totalprice")) * uplift)
        .cast(DecimalType(15, 3)).as("d_sum"))
    val delOld = orders.where(m === DeleteCohort).select(
      col("o_orderstatus").as("status"), lit(-1L).as("d_cnt"), (-price).as("d_sum"))
    val insNew = orders.where(m === InsertCohort).select(
      col("o_orderstatus").as("status"), lit(1L).as("d_cnt"), price.as("d_sum"))
    updOld.unionByName(updNew).unionByName(delOld).unionByName(insNew)
  }

  /** Incremental aggregate maintenance (materialized-view delta — the
    * streaming-warehouse pattern for keeping a 100 TB table's rollup
    * fresh): the stored per-status aggregate merges with the change
    * feed's ±delta terms; the refresh pays |changes|, never a base
    * rescan. The oracle RECOMPUTES the aggregate from the fully merged
    * table, so the gate proves maintenance ≡ recompute, including
    * cross-group moves (updates re-status rows into 'U').
    */
  def aggMaintain(base: DataFrame, delta: DataFrame): DataFrame = {
    val mv = base.groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("d_cnt"),
        sum(dec(col("o_totalprice")).cast(DecimalType(15, 3)))
          .cast(DecimalType(25, 3)).as("d_sum"))
    mv.unionByName(delta.withColumn("d_sum", col("d_sum").cast(DecimalType(25, 3))))
      .groupBy("status")
      .agg(sum(col("d_cnt")).as("cnt"), sum(col("d_sum")).cast("double").as("sum_price"))
      .where(col("cnt") > 0)
  }

  /** The change feed's ± terms with the ORDER's customer key attached —
    * the input to join-view maintenance ([[joinMaintain]]). Same
    * cohorts/arithmetic as [[aggDelta]]; inserts keep the source row's
    * customer.
    */
  def joinDelta(orders: DataFrame): DataFrame = {
    val m = col("o_orderkey") % 10
    def price = dec(col("o_totalprice")).cast(DecimalType(15, 3))
    val updOld = orders.where(m === UpdateCohort).select(
      col("o_custkey"), col("o_orderstatus").as("status"),
      lit(-1L).as("d_cnt"), (-price).as("d_sum"))
    val updNew = orders.where(m === UpdateCohort).select(
      col("o_custkey"), lit("U").as("status"), lit(1L).as("d_cnt"),
      (dec(col("o_totalprice")) * uplift).cast(DecimalType(15, 3)).as("d_sum"))
    val delOld = orders.where(m === DeleteCohort).select(
      col("o_custkey"), col("o_orderstatus").as("status"),
      lit(-1L).as("d_cnt"), (-price).as("d_sum"))
    val insNew = orders.where(m === InsertCohort).select(
      col("o_custkey"), col("o_orderstatus").as("status"),
      lit(1L).as("d_cnt"), price.as("d_sum"))
    updOld.unionByName(updNew).unionByName(delOld).unionByName(insNew)
  }

  /** Incremental maintenance of a JOIN view — the step past
    * [[aggMaintain]]: the materialized rollup is orders⋈customer
    * grouped by (nation, status), and the refresh applies the change
    * feed's ± terms JOINED TO THE DIMENSION (broadcast — the dimension
    * never re-shuffles for a delta), never rescanning the fact base.
    * This is ΔA⋈B of the textbook join-delta decomposition
    * (Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) with an immutable dimension, the
    * overwhelmingly common warehouse case. The oracle RECOMPUTES the
    * rollup from the fully merged table joined to the dimension, so
    * the gate proves maintenance ≡ recompute across the join,
    * including cross-group moves.
    */
  def joinMaintain(orders: DataFrame, customer: DataFrame): DataFrame = {
    val dim = broadcast(customer.select(
      col("c_custkey").as("o_custkey"), col("c_nationkey").cast("long").as("nation")))
    val mv = orders.join(dim, "o_custkey")
      .groupBy(col("nation"), col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("d_cnt"),
        sum(dec(col("o_totalprice")).cast(DecimalType(15, 3)))
          .cast(DecimalType(25, 3)).as("d_sum"))
    val delta = joinDelta(orders).join(dim, "o_custkey")
      .select(col("nation"), col("status"), col("d_cnt"),
        col("d_sum").cast(DecimalType(25, 3)).as("d_sum"))
    mv.unionByName(delta)
      .groupBy("nation", "status")
      .agg(sum(col("d_cnt")).as("cnt"), sum(col("d_sum")).cast("double").as("sum_price"))
      .where(col("cnt") > 0)
  }

  /** Streaming twin of [[mergeUpsert]] — continuous CDC ingestion, the
    * same shape as [[graft.dedup.Dedup.runStreamingIncrementalDedup]]:
    * the change source arrives as a file stream, each microbatch
    * derives its change feed and merges against the static base inside
    * `foreachBatch`, and the merged rows land in a parquet sink. The
    * finite gate source lands in ONE microbatch, so the landed table
    * provably equals the batch twin's — identical oracle. (In
    * production each merged batch becomes the next trigger's base —
    * Delta/Iceberg `MERGE` per microbatch.)
    */
  def runStreamingCdcMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
    val outDir =
      s"${graft.OutDir.base}/graft_stream_cdc/${sfDir.replaceAll("[^A-Za-z0-9.]+", "_")}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val stream = graft.sources.StreamingSources.ordersSource(spark, sfDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeUpsert(base, changeFeed(batch))
          .write.mode("append").parquet(outDir)
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.read.parquet(outDir)
  }

  private def q(f: (DataFrame, DataFrame) => DataFrame, order: String*)
      : (SparkSession, String) => DataFrame =
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      f(orders, changeFeed(orders)).orderBy(order.map(col): _*)
    }

  private val duckChanges =
    s"""ch AS (
      |  SELECT o_orderkey, 'U' AS op, 'U' AS new_status,
      |    CAST(o_totalprice AS DECIMAL(12,2)) * CAST($UpliftLit AS DECIMAL(2,1)) AS new_totalprice
      |  FROM orders WHERE o_orderkey % 10 = $UpdateCohort
      |  UNION ALL
      |  SELECT o_orderkey, 'D', NULL, NULL FROM orders WHERE o_orderkey % 10 = $DeleteCohort
      |  UNION ALL
      |  SELECT o_orderkey + $InsertKeyOffset, 'I', o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(15,3))
      |  FROM orders WHERE o_orderkey % 10 = $InsertCohort),
      |base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(15,3)) AS o_totalprice
      |  FROM orders),
      |j AS (
      |  SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
      |    b.o_orderstatus, b.o_totalprice, c.op, c.new_status, c.new_totalprice
      |  FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey)""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "cdc_merge_upsert",
      q(mergeUpsert, "o_orderkey"),
      Some(s"""WITH $duckChanges
             |SELECT o_orderkey,
             |  CASE WHEN op IN ('U','I') THEN new_status ELSE o_orderstatus END AS o_orderstatus,
             |  CAST(CASE WHEN op IN ('U','I') THEN new_totalprice ELSE o_totalprice END AS DOUBLE)
             |    AS o_totalprice
             |FROM j WHERE op IS NULL OR op <> 'D'
             |ORDER BY o_orderkey""".stripMargin),
    ),
    EngineQuery(
      "streaming_cdc_merge",
      (s, dir) => runStreamingCdcMerge(s, dir).orderBy("o_orderkey"),
      Some(s"""WITH $duckChanges
             |SELECT o_orderkey,
             |  CASE WHEN op IN ('U','I') THEN new_status ELSE o_orderstatus END AS o_orderstatus,
             |  CAST(CASE WHEN op IN ('U','I') THEN new_totalprice ELSE o_totalprice END AS DOUBLE)
             |    AS o_totalprice
             |FROM j WHERE op IS NULL OR op <> 'D'
             |ORDER BY o_orderkey""".stripMargin),
    ),
    EngineQuery(
      "cdc_agg_maintain",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        aggMaintain(orders, aggDelta(orders)).orderBy("status")
      },
      Some(s"""WITH $duckChanges,
             |m AS (
             |  SELECT
             |    CASE WHEN op IN ('U','I') THEN new_status ELSE o_orderstatus END AS status,
             |    CASE WHEN op IN ('U','I') THEN new_totalprice ELSE o_totalprice END AS price
             |  FROM j WHERE op IS NULL OR op <> 'D')
             |SELECT status, count(*) AS cnt, CAST(sum(price) AS DOUBLE) AS sum_price
             |FROM m GROUP BY status HAVING count(*) > 0
             |ORDER BY status""".stripMargin),
      headline = true,
    ),
    EngineQuery(
      "cdc_join_maintain",
      (s, dir) => joinMaintain(Tables.orders(s, dir), Tables.customer(s, dir))
        .orderBy("nation", "status"),
      Some(s"""WITH m AS (
             |  SELECT o_custkey,
             |    CASE WHEN o_orderkey % 10 = $UpdateCohort THEN 'U' ELSE o_orderstatus END AS status,
             |    CASE WHEN o_orderkey % 10 = $UpdateCohort
             |      THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST($UpliftLit AS DECIMAL(2,1)) AS DECIMAL(15,3))
             |      ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(15,3)) END AS price
             |  FROM orders WHERE o_orderkey % 10 <> $DeleteCohort
             |  UNION ALL
             |  SELECT o_custkey, o_orderstatus,
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(15,3))
             |  FROM orders WHERE o_orderkey % 10 = $InsertCohort)
             |SELECT CAST(c.c_nationkey AS BIGINT) AS nation, m.status,
             |  count(*) AS cnt, CAST(sum(m.price) AS DOUBLE) AS sum_price
             |FROM m JOIN customer c ON m.o_custkey = c.c_custkey
             |GROUP BY 1, 2 HAVING count(*) > 0
             |ORDER BY nation, status""".stripMargin),
    ),
    EngineQuery(
      "cdc_scd2_history",
      q(scd2History, "o_orderkey", "version"),
      Some(s"""WITH $duckChanges
             |SELECT o_orderkey, CAST(1 AS BIGINT) AS version, o_orderstatus,
             |  CAST(o_totalprice AS DOUBLE) AS o_totalprice, op IS NULL AS is_current
             |FROM j WHERE (op IS NULL OR op <> 'I')
             |UNION ALL
             |SELECT o_orderkey, 2, new_status, CAST(new_totalprice AS DOUBLE), true
             |FROM j WHERE op IN ('U','I')
             |ORDER BY o_orderkey, version""".stripMargin),
    ),
  )
}
