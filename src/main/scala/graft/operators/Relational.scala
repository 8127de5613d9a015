package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{EngineQuery, Tables}

/** Generic relational operator surface: the reference's scan / project /
  * filter / group-count / threshold / distinct / sort / total operators
  * (SURVEY.md §2 M-1..M-6, D-2, H-2, H-3) expressed over the harness
  * tables, plus the join / set-op / top-k categories the reference lacks
  * (§2.2) but any engine user needs.
  *
  * Scale notes: every query here is a declarative single-pass plan —
  * filters and projections reach the parquet scan (predicate pushdown +
  * column pruning), aggregations run partial+final around one shuffle,
  * dimension joins are broadcast so the fact table never shuffles.
  */
object Relational {

  /** Exact decimal view of a money/quantity column: makes SUM results
    * order-independent (float accumulation is not associative; decimal
    * is), so results are reproducible across engines and cluster sizes.
    */
  private def dec(c: String) = col(c).cast(DecimalType(12, 2))

  /** Two-phase salted group-count — the skew guard for hot grouping
    * keys. Phase 1 aggregates on (key, salt) so a hot key's rows spread
    * over `saltBuckets` reducers; phase 2 merges the per-salt partials.
    * The final relation is salt-invariant (counts are associative), so
    * any salt source works; a per-row unique column gives the most even
    * spread. At 100 TB this is the difference between one straggler
    * reducer owning a whole hot key and `saltBuckets` reducers sharing
    * it. (AQE's skew handling covers joins; aggregation skew needs this
    * explicit decomposition.)
    */
  def saltedGroupCount(df: org.apache.spark.sql.DataFrame, key: String, saltSource: org.apache.spark.sql.Column, saltBuckets: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets.toLong)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).cast("long").as("cnt"))

  /** Deliberately skewed fact-fact join — the AQE skew-join surface.
    * Every `hotModulus`-th orderkey on BOTH sides collapses onto hot key
    * 0, synthesizing the real-world hot-join-key profile (at 100 TB a
    * shuffle join always inherits key skew). The `merge` hint pins the
    * shuffle sort-merge path — the big-big shape where a hot key means
    * one straggler reducer — so AQE's OptimizeSkewedJoin can split the
    * oversized partition at runtime into advisory-sized chunks (each
    * joined against a replicated copy of the other side's partition).
    * Salting (saltedGroupCount) covers aggregation skew; this covers
    * join skew, where AQE's runtime split IS the idiomatic fix — no
    * manual salt column threads through the join. The skew split fires
    * when partition sizes cross the configured thresholds (asserted
    * plan-level in SkewJoinSpec with scaled-down thresholds); the
    * relation itself is threshold-invariant.
    */
  def skewedJoinStats(lineitem: DataFrame, orders: DataFrame, hotModulus: Int = 100): DataFrame = {
    def hot(c: org.apache.spark.sql.Column) =
      when(c % hotModulus === 0, lit(0L)).otherwise(c)
    val li = lineitem.select(hot(col("l_orderkey")).as("hot_key"), dec("l_quantity").as("qty"))
    val o = orders.select(hot(col("o_orderkey")).as("hot_key"), col("o_orderpriority"))
    li.hint("merge").join(o, Seq("hot_key"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).cast("double").as("qty"))
  }

  /** Eager-aggregation twin of [[skewedJoinStats]]: the identical
    * relation with the hot-key pair mass made VIRTUAL. Both sides
    * collapse to per-key aggregates BEFORE the join, and the joined
    * counts multiply back (Σ o_cnt·li_cnt per priority), so the hot
    * key's |li|×|o| cross product is never enumerated.
    *
    * Why this twin exists (r12 probe finding): at 30× facts the hot
    * bucket's pair mass grows quadratically with scale (180k×45k ≈
    * 8·10⁹ pairs) while its SHUFFLE INPUT stays a few MB — below
    * `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes` —
    * so AQE's OptimizeSkewedJoin (which triggers on map-output sizes,
    * not join output) never splits it, and one reducer streams the
    * whole cross product through a DECIMAL aggregate (~20 min/pass
    * measured). AQE's split is the right fix when the INPUT is skewed;
    * when the OUTPUT is the skew, pushing the aggregate through the
    * join is — pair mass drops from |li|×|o| to |keys| with the same
    * exact answer. [[skewedJoinStats]] stays as the deliberate
    * AQE-split stress at bench scale; THIS is the 100 TB formulation.
    */
  def skewedJoinStatsPreagg(
      lineitem: DataFrame, orders: DataFrame, hotModulus: Int = 100): DataFrame = {
    def hot(c: org.apache.spark.sql.Column) =
      when(c % hotModulus === 0, lit(0L)).otherwise(c)
    val li = lineitem
      .select(hot(col("l_orderkey")).as("hot_key"), dec("l_quantity").as("qty"))
      .groupBy("hot_key")
      .agg(count(lit(1)).as("li_cnt"), sum(col("qty")).as("li_qty"))
    val o = orders
      .select(hot(col("o_orderkey")).as("hot_key"), col("o_orderpriority"))
      .groupBy("hot_key", "o_orderpriority")
      .agg(count(lit(1)).as("o_cnt"))
    o.join(li, Seq("hot_key"))
      .groupBy("o_orderpriority")
      .agg(
        sum(col("o_cnt") * col("li_cnt")).as("cnt"),
        sum(col("o_cnt") * col("li_qty")).cast("double").as("qty"))
  }

  /** Typed array-valued aggregate: per-customer sorted order-key list.
    * One partial+final hash-agg shuffle on o_custkey; sort_array makes
    * the list deterministic regardless of partitioning.
    */
  def collectOrdersPerCustomer(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_custkey"))
      .agg(
        sort_array(collect_list(col("o_orderkey"))).as("order_keys"),
        count(lit(1)).as("cnt"))

  def engineQueries: Seq[EngineQuery] = Seq(
    // M-1 + H-3: scan with pushed-down filter and pruned projection.
    EngineQuery(
      "scan_project",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .where(col("l_quantity") > 30)
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_quantity"),
            col("l_returnflag"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_returnflag
             |FROM lineitem WHERE l_quantity > 30 ORDER BY l_orderkey, l_linenumber""".stripMargin),
    ),
    // M-5: the reference's one aggregation — group-count.
    EngineQuery(
      "group_count",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ),
    // M-6a: post-aggregation threshold (the reference's `v > 1` output filter).
    EngineQuery(
      "threshold_filter",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") > 5)
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey, count(*) AS cnt FROM orders
             |GROUP BY o_custkey HAVING count(*) > 5 ORDER BY o_custkey""".stripMargin),
    ),
    // M-6b: distinct output (the reference's unordered_set dedup).
    EngineQuery(
      "dedup_distinct",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select("l_returnflag", "l_linestatus").distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ),
    // M-4: sort by key.
    EngineQuery(
      "sort_by_key",
      (s, dir) =>
        Tables.part(s, dir)
          .select("p_partkey", "p_name", "p_retailprice")
          .orderBy(col("p_retailprice").desc, col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
             |ORDER BY p_retailprice DESC, p_partkey""".stripMargin),
    ),
    // D-2: total count.
    EngineQuery(
      "total_count",
      (s, dir) => Tables.lineitem(s, dir).agg(count(lit(1)).as("total")),
      Some("SELECT count(*) AS total FROM lineitem"),
    ),
    // H-3: per-row truncation (`head -c N` analog).
    EngineQuery(
      "truncate_project",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").substr(1, 100).as("prefix"))
          .orderBy("doc_id"),
      Some("SELECT doc_id, substr(text, 1, 100) AS prefix FROM documents ORDER BY doc_id"),
    ),
    // H-2: FASTA-style cleanup projection (strip non-alpha, uppercase).
    EngineQuery(
      "fasta_clean",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            upper(regexp_replace(col("text"), "[^A-Za-z]", "")).as("cleaned"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, upper(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS cleaned
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // TPC-H Q1-shaped pricing summary: multi-aggregate with exact decimal
    // arithmetic surfaced as doubles (order-independent, engine-portable).
    EngineQuery(
      "q1_pricing_summary",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec("l_quantity")).cast("double").as("sum_qty"),
            sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
            sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec("l_discount")))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true,
    ),
    // Broadcast dimension join: fact table (orders) never shuffles for the
    // join; nation/customer broadcast. At 100 TB the fact side streams.
    EngineQuery(
      "join_broadcast_revenue",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(
            sum(dec("o_totalprice")).cast("double").as("revenue"),
            count(lit(1)).as("cnt"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             |  count(*) AS cnt
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      headline = true,
    ),
    // Shuffle (big-big) join: lineitem ⋈ orders on the natural key; AQE
    // handles skew, both sides hash-partition on l_orderkey/o_orderkey.
    EngineQuery(
      "join_shuffle_lineitem_orders",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            sum(dec("l_quantity")).cast("double").as("sum_qty"),
            count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             |  count(*) AS cnt
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      headline = true,
    ),
    // Left-semi join (EXISTS).
    EngineQuery(
      "semi_join_customers_with_orders",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
    ),
    // Left-anti join (NOT EXISTS). The right side is the 1998 order
    // slice, not all orders: in the harness data EVERY customer has at
    // least one order, so the unrestricted anti join passed on 0 = 0
    // rows (r15 verdict's agreement-on-empty smell) — the date band
    // makes the gate emit lapsed customers (8 at sf0.01) so the anti
    // path's keep/drop behavior is actually exercised.
    EngineQuery(
      "anti_join_customers_without_orders",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= expr("TIMESTAMP '1998-01-01'"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01')
             |ORDER BY c_custkey""".stripMargin),
    ),
    // Set operations (absent from the reference, §2.2 — provided as the
    // engine's set-op surface).
    EngineQuery(
      "set_union_keys",
      (s, dir) =>
        Tables.orders(s, dir).select(col("o_custkey").as("key"))
          .union(Tables.customer(s, dir).select(col("c_custkey").as("key")))
          .distinct().orderBy("key"),
      Some("""SELECT o_custkey AS key FROM orders UNION SELECT c_custkey AS key FROM customer ORDER BY key"""),
    ),
    EngineQuery(
      "set_intersect_keys",
      (s, dir) =>
        Tables.orders(s, dir).select(col("o_custkey").as("key"))
          .intersect(
            Tables.customer(s, dir).where(col("c_acctbal") > 5000)
              .select(col("c_custkey").as("key")))
          .orderBy("key"),
      Some("""SELECT o_custkey AS key FROM orders INTERSECT
             |SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000 ORDER BY key""".stripMargin),
    ),
    // EXCEPT with a nonempty result (r16): every harness customer has
    // orders, so `customer EXCEPT orders` was agreement-on-empty; the
    // ordering-customers-minus-high-balance direction emits 843 keys at
    // sf0.01, so both the dedup and the anti semantics of EXCEPT are
    // exercised.
    EngineQuery(
      "set_except_keys",
      (s, dir) =>
        Tables.orders(s, dir).select(col("o_custkey").as("key"))
          .except(
            Tables.customer(s, dir).where(col("c_acctbal") > 5000)
              .select(col("c_custkey").as("key")))
          .orderBy("key"),
      Some("""SELECT o_custkey AS key FROM orders EXCEPT
             |SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
             |ORDER BY key""".stripMargin),
    ),
    // The SQL-text front door: a TPC-H-Q3-shaped query submitted as raw
    // ANSI SQL over temp views — same Catalyst pipeline as the
    // DataFrame API, same oracle discipline.
    EngineQuery(
      "sql_text_shipping_priority",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT o_orderkey, o_orderpriority,
                |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
                |  count(*) AS n_lines
                |FROM customer_v JOIN orders_v ON c_custkey = o_custkey
                |JOIN lineitem_v ON o_orderkey = l_orderkey
                |WHERE c_mktsegment = 'BUILDING'
                |GROUP BY o_orderkey, o_orderpriority
                |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             |  count(*) AS n_lines
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, o_orderpriority
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
    ),
    // TPC-H Q4 analog: correlated EXISTS — Catalyst decorrelates into a
    // LEFT SEMI join on l_orderkey (never a per-row subquery execution);
    // the date band pushes to the orders scan. Late shipment stands in
    // for Q4's commit<receipt (the harness lineitem has no commit date).
    EngineQuery(
      "sql_q4_late_shipment",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT o_orderpriority, count(*) AS order_count
                |FROM orders_v o
                |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
                |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
                |  AND EXISTS (SELECT 1 FROM lineitem_v l
                |              WHERE l.l_orderkey = o.o_orderkey
                |                AND l.l_shipdate > o.o_orderdate)
                |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders o
             |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
             |  AND EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_shipdate > o.o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),
    // TPC-H Q5 analog: the 6-table star join (local supplier volume).
    // The densest join graph in the registry — customer⋈orders⋈lineitem
    // on the fact spine, supplier attached on BOTH l_suppkey and the
    // c_nationkey=s_nationkey locality condition, nation/region pruning
    // the supplier side. The region/nation/supplier dims broadcast;
    // the only big exchanges are the fact-spine keys, and the date band
    // pushes to the orders scan. This is the join-reorder stress case:
    // Catalyst must put the selective region→nation→supplier chain on
    // the build side, never shuffle the fact table per-dim.
    EngineQuery(
      "sql_q5_local_supplier",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        Tables.region(s, dir).createOrReplaceTempView("region_v")
        s.sql("""SELECT n_name,
                |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
                |FROM customer_v
                |JOIN orders_v ON c_custkey = o_custkey
                |JOIN lineitem_v ON l_orderkey = o_orderkey
                |JOIN supplier_v ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                |JOIN nation_v ON s_nationkey = n_nationkey
                |JOIN region_v ON n_regionkey = r_regionkey
                |WHERE r_name = 'ASIA'
                |  AND o_orderdate >= TIMESTAMP '1996-01-01'
                |  AND o_orderdate < TIMESTAMP '1997-01-01'
                |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      headline = true,
    ),
    // TPC-H Q10 analog: returned-item reporting — per-customer revenue
    // lost to returns in a quarter, top 20. The quarter band prunes
    // orders at the scan, the returnflag filter prunes lineitem at the
    // scan, and the final top-20 is a TakeOrderedAndProject over the
    // per-customer aggregate (no global sort of customers).
    EngineQuery(
      "sql_q10_returned_items",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        s.sql("""SELECT c_custkey, c_name, n_name,
                |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
                |FROM customer_v
                |JOIN orders_v ON c_custkey = o_custkey
                |JOIN lineitem_v ON l_orderkey = o_orderkey
                |JOIN nation_v ON c_nationkey = n_nationkey
                |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                |  AND o_orderdate < TIMESTAMP '1996-04-01'
                |  AND l_returnflag = 'R'
                |GROUP BY c_custkey, c_name, n_name
                |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name, n_name,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
    ),
    // TPC-H Q7 analog: volume shipping between a nation pair. Two
    // broadcast attaches of the SAME tiny nation dim under different
    // aliases (supplier side and customer side); the symmetric OR pair
    // filter sits right above them, pruning the fact stream before the
    // (nation, nation, year) aggregate. Ship-year is an exact integer.
    EngineQuery(
      "sql_q7_volume_shipping",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        s.sql("""SELECT supp_nation, cust_nation, l_year,
                |  CAST(sum(volume_dec) AS DOUBLE) AS revenue
                |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
                |    CAST(l_extendedprice AS DECIMAL(12,2))
                |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume_dec
                |  FROM supplier_v
                |  JOIN lineitem_v ON s_suppkey = l_suppkey
                |  JOIN orders_v ON o_orderkey = l_orderkey
                |  JOIN customer_v ON c_custkey = o_custkey
                |  JOIN nation_v n1 ON s_nationkey = n1.n_nationkey
                |  JOIN nation_v n2 ON c_nationkey = n2.n_nationkey
                |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) t
                |GROUP BY supp_nation, cust_nation, l_year
                |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(sum(volume_dec) AS DOUBLE) AS revenue
             |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |    CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume_dec
             |  FROM supplier
             |  JOIN lineitem ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) t
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
    ),
    // TPC-H Q18 analog: large-volume orders. The HAVING pre-aggregation
    // shrinks lineitem to the qualifying order keys BEFORE any customer
    // or orders attach — the wide table never joins unfiltered — and the
    // top-20 is a TakeOrderedAndProject. Quantities sum in DECIMAL
    // (exact), surfacing as double only at the end.
    EngineQuery(
      "sql_q18_large_orders",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT c_custkey, c_name, o_orderkey,
                |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                |  CAST(sq AS DOUBLE) AS sum_qty
                |FROM customer_v
                |JOIN orders_v ON c_custkey = o_custkey
                |JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
                |      FROM lineitem_v GROUP BY l_orderkey
                |      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300) q
                |  ON o_orderkey = l_orderkey
                |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
             |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             |  CAST(sq AS DOUBLE) AS sum_qty
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300) q
             |  ON o_orderkey = l_orderkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),
    ),
    // TPC-H Q19 analog: disjunctive join predicate (discounted revenue
    // over three OR'd brand/size/quantity bands). The optimizer stress:
    // the common `p_partkey = l_partkey` conjunct must be FACTORED OUT
    // of the disjunction into the join key (a naive plan falls back to
    // a nested-loop over the whole OR), with the per-branch residual
    // evaluated as a post-probe filter, and the branch-common l_quantity
    // bound pushed to the lineitem scan.
    EngineQuery(
      "sql_q19_brand_bands",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        s.sql("""SELECT
                |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
                |  count(*) AS n_lines
                |FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
                |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
                |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
                |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
      },
      Some("""SELECT
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
    ),
    // TPC-H Q8 analog: national market share — the widest join graph in
    // the registry (lineitem⋈part⋈orders⋈customer⋈nation⋈region⋈supplier
    // ⋈nation again): nation joins TWICE under aliases (customer's and
    // supplier's), every dim broadcasts, and the share is a conditional
    // aggregate over one fact pass (never two scans split by nation).
    // Volumes are exact e4-scaled integers; the permille share is
    // integer division (both operands positive, so Spark's truncating
    // `div` and DuckDB's flooring `//` agree).
    EngineQuery(
      "sql_q8_market_share",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        Tables.region(s, dir).createOrReplaceTempView("region_v")
        s.sql("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                |  CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN v.vol_e4 ELSE 0 END) * 1000
                |       div sum(v.vol_e4) AS BIGINT) AS mkt_share_permille,
                |  CAST(sum(v.vol_e4) AS BIGINT) AS total_vol_e4
                |FROM (SELECT l_orderkey, l_suppkey, l_partkey,
                |        CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                |          * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT) AS vol_e4
                |      FROM lineitem_v) v
                |JOIN part_v ON p_partkey = v.l_partkey
                |JOIN orders_v ON o_orderkey = v.l_orderkey
                |JOIN customer_v ON c_custkey = o_custkey
                |JOIN nation_v n1 ON c_nationkey = n1.n_nationkey
                |JOIN region_v ON n1.n_regionkey = r_regionkey
                |JOIN supplier_v ON s_suppkey = v.l_suppkey
                |JOIN nation_v n2 ON s_nationkey = n2.n_nationkey
                |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
                |  AND o_orderdate >= TIMESTAMP '1996-01-01'
                |  AND o_orderdate < TIMESTAMP '1998-01-01'
                |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin)
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN v.vol_e4 ELSE 0 END) * 1000
             |       // sum(v.vol_e4) AS BIGINT) AS mkt_share_permille,
             |  CAST(sum(v.vol_e4) AS BIGINT) AS total_vol_e4
             |FROM (SELECT l_orderkey, l_suppkey, l_partkey,
             |        CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             |          * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT) AS vol_e4
             |      FROM lineitem) v
             |JOIN part ON p_partkey = v.l_partkey
             |JOIN orders ON o_orderkey = v.l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey
             |JOIN supplier ON s_suppkey = v.l_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin),
      headline = true,
    ),
    // TPC-H Q9 analog: product-type profit by supplier nation and year.
    // The harness has no partsupp, so supply cost stands in as 60% of
    // p_retailprice — which keeps Q9's real content: a LIKE-filtered
    // part dim pruning the fact scan, a 5-table join, and a profit
    // expression mixing fact and dim columns. All arithmetic is exact
    // e4-scaled int64 (price·(1−disc) is integral at scale 4; the cost
    // term is 60·retail_cents·qty — no decimal subtraction whose
    // intermediate precision the two engines could type differently).
    EngineQuery(
      "sql_q9_product_profit",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        s.sql("""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)
                |      - 60 * CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                |           * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_e4
                |FROM lineitem_v
                |JOIN part_v ON p_partkey = l_partkey
                |JOIN supplier_v ON s_suppkey = l_suppkey
                |JOIN nation_v ON s_nationkey = n_nationkey
                |JOIN orders_v ON o_orderkey = l_orderkey
                |WHERE p_name LIKE '%widget%'
                |GROUP BY n_name, year(o_orderdate) ORDER BY n_name, o_year""".stripMargin)
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)
             |      - 60 * CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             |           * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_e4
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON o_orderkey = l_orderkey
             |WHERE p_name LIKE '%widget%'
             |GROUP BY n_name, year(o_orderdate) ORDER BY n_name, o_year""".stripMargin),
    ),
    // TPC-H Q11 analog: important-stock screen — per-part value vs a
    // GLOBAL scalar threshold over the same filtered relation (no
    // partsupp in the harness, so lineitem value from EUROPE-region
    // suppliers stands in for supply value). The load-bearing plan
    // property: the filtered relation is aggregated TWICE (per-part and
    // globally) but the threshold side collapses to one row broadcast
    // into the HAVING — never a per-group re-scan. Cross-multiplied
    // integer comparison (×1200), no division at the boundary.
    EngineQuery(
      "sql_q11_important_parts",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        Tables.region(s, dir).createOrReplaceTempView("region_v")
        s.sql("""WITH v AS (SELECT l_partkey,
                |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT) AS vol_e4
                |  FROM lineitem_v JOIN supplier_v ON s_suppkey = l_suppkey
                |  JOIN nation_v ON s_nationkey = n_nationkey
                |  JOIN region_v ON n_regionkey = r_regionkey
                |  WHERE r_name = 'EUROPE')
                |SELECT l_partkey, CAST(sum(vol_e4) AS BIGINT) AS value_e4
                |FROM v GROUP BY l_partkey
                |HAVING sum(vol_e4) * 1200 > (SELECT sum(vol_e4) FROM v)
                |ORDER BY value_e4 DESC, l_partkey""".stripMargin)
      },
      Some("""WITH v AS (SELECT l_partkey,
             |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT) AS vol_e4
             |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE')
             |SELECT l_partkey, CAST(sum(vol_e4) AS BIGINT) AS value_e4
             |FROM v GROUP BY l_partkey
             |HAVING sum(vol_e4) * 1200 > (SELECT sum(vol_e4) FROM v)
             |ORDER BY value_e4 DESC, l_partkey""".stripMargin),
    ),
    // TPC-H Q12 analog: shipping-mode priority counts — the harness
    // lineitem has no shipmode/commitdate, so linestatus buckets the
    // rows and "late" is ship > order + 60 days (same join-then-
    // conditional-aggregate shape: ONE fact pass produces both the
    // high- and low-priority counts via CASE, never two filtered scans).
    EngineQuery(
      "sql_q12_late_priority",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT l_linestatus,
                |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
                |FROM orders_v JOIN lineitem_v ON o_orderkey = l_orderkey
                |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
                |  AND l_shipdate >= TIMESTAMP '1996-01-01'
                |  AND l_shipdate < TIMESTAMP '1997-01-01'
                |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
             |  AND l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
    ),
    // TPC-H Q15 analog: top supplier by quarterly revenue — a derived
    // aggregate view consumed TWICE (join side + scalar max). The
    // load-bearing plan property: the quarter band prunes lineitem at
    // the scan, the per-supplier aggregate computes once and the max
    // side is one broadcast row; the equality is exact-integer (e4
    // units), so ties surface deterministically instead of hinging on
    // float rounding.
    EngineQuery(
      "sql_q15_top_supplier",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        s.sql("""WITH revenue AS (
                |  SELECT l_suppkey,
                |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)) AS BIGINT)
                |      AS total_rev_e4
                |  FROM lineitem_v
                |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                |    AND l_shipdate < TIMESTAMP '1996-04-01'
                |  GROUP BY l_suppkey)
                |SELECT s_suppkey, s_name, total_rev_e4
                |FROM supplier_v JOIN revenue ON s_suppkey = l_suppkey
                |WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
                |ORDER BY s_suppkey""".stripMargin)
      },
      Some("""WITH revenue AS (
             |  SELECT l_suppkey,
             |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)) AS BIGINT)
             |      AS total_rev_e4
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_rev_e4
             |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
             |WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
             |ORDER BY s_suppkey""".stripMargin),
    ),
    // TPC-H Q2 analog: minimum-cost supplier — the classic correlated
    // scalar-min subquery over the supply relation, restricted to one
    // region. The harness has no partsupp, so the supply offers come
    // from lineitem: cost(part, supplier) = min extendedprice that
    // supplier ever charged for that part (exact DECIMAL — no float
    // min). Catalyst decorrelates the per-part regional min into ONE
    // aggregate over the offers relation + an equi-join back on
    // p_partkey; the supplier→nation→region chain broadcasts onto both
    // sides, so only the offers aggregation shuffles (on l_partkey,
    // l_suppkey) — the same exchange both the outer and the subquery
    // side reuse. Completes the 22-query TPC-H suite (Q1,Q3–Q22 were
    // already in the registry).
    EngineQuery(
      "sql_q2_min_cost_supplier",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        Tables.region(s, dir).createOrReplaceTempView("region_v")
        s.sql("""WITH offers AS (
                |  SELECT l_partkey, l_suppkey,
                |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
                |  FROM lineitem_v GROUP BY l_partkey, l_suppkey)
                |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
                |  CAST(o.cost AS DOUBLE) AS supplycost
                |FROM part_v p
                |JOIN offers o ON o.l_partkey = p.p_partkey
                |JOIN supplier_v s ON s.s_suppkey = o.l_suppkey
                |JOIN nation_v n ON s.s_nationkey = n.n_nationkey
                |JOIN region_v r ON n.n_regionkey = r.r_regionkey
                |WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
                |  AND r.r_name = 'EUROPE'
                |  AND o.cost = (
                |    SELECT min(o2.cost)
                |    FROM offers o2
                |    JOIN supplier_v s2 ON s2.s_suppkey = o2.l_suppkey
                |    JOIN nation_v n2 ON s2.s_nationkey = n2.n_nationkey
                |    JOIN region_v r2 ON n2.n_regionkey = r2.r_regionkey
                |    WHERE o2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
                |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
                |LIMIT 100""".stripMargin)
      },
      Some("""WITH offers AS (
             |  SELECT l_partkey, l_suppkey,
             |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
             |  FROM lineitem GROUP BY l_partkey, l_suppkey)
             |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
             |  CAST(o.cost AS DOUBLE) AS supplycost
             |FROM part p
             |JOIN offers o ON o.l_partkey = p.p_partkey
             |JOIN supplier s ON s.s_suppkey = o.l_suppkey
             |JOIN nation n ON s.s_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
             |  AND r.r_name = 'EUROPE'
             |  AND o.cost = (
             |    SELECT min(o2.cost)
             |    FROM offers o2
             |    JOIN supplier s2 ON s2.s_suppkey = o2.l_suppkey
             |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
             |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
             |    WHERE o2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
             |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
             |LIMIT 100""".stripMargin),
    ),
    // TPC-H Q16 analog: supplier diversity per part attribute triple —
    // count(DISTINCT supplier) grouped by (brand, type, size) with a
    // NOT IN exclusion subquery (negative-balance suppliers stand in
    // for Q16's complaint filter; lineitem's (part, supplier) pairs
    // stand in for partsupp). The exclusion rewrites to an anti-join
    // against a broadcast-tiny relation, never a per-row probe.
    EngineQuery(
      "sql_q16_supplier_cnt",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        s.sql("""SELECT p_brand, p_type, p_size,
                |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
                |FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
                |WHERE p_brand <> 'Brand#13' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
                |  AND l_suppkey NOT IN
                |    (SELECT s_suppkey FROM supplier_v WHERE s_acctbal < 0.0)
                |GROUP BY p_brand, p_type, p_size
                |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#13' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
             |  AND l_suppkey NOT IN
             |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    ),
    // TPC-H Q17 analog: small-quantity revenue — each line compared to
    // 0.2× ITS OWN PART's average quantity via a correlated scalar
    // aggregate. Catalyst decorrelates into one per-part aggregate +
    // equi-join (the plan pin asserts no per-row re-execution). The avg
    // divides an exact int64 sum by an int64 count — one IEEE division,
    // bit-identical in both engines — and revenue is integer cents.
    EngineQuery(
      "sql_q17_small_qty_rev",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        s.sql("""SELECT CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                |         AS BIGINT)) AS BIGINT) AS small_qty_rev_cents,
                |  count(*) AS n_lines
                |FROM lineitem_v l JOIN part_v p ON p.p_partkey = l.l_partkey
                |WHERE p.p_brand = 'Brand#5'
                |  AND l.l_quantity < 0.2 * (SELECT avg(CAST(l2.l_quantity AS BIGINT))
                |                            FROM lineitem_v l2
                |                            WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
      },
      Some("""SELECT CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
             |         AS BIGINT)) AS BIGINT) AS small_qty_rev_cents,
             |  count(*) AS n_lines
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE p.p_brand = 'Brand#5'
             |  AND l.l_quantity < 0.2 * (SELECT avg(CAST(l2.l_quantity AS BIGINT))
             |                            FROM lineitem l2
             |                            WHERE l2.l_partkey = l.l_partkey)""".stripMargin),
    ),
    // TPC-H Q20 analog: supplier pre-qualification — a nested IN whose
    // subquery is a GROUPED aggregate with HAVING (suppliers that moved
    // >400 units of 'small%' parts in the year; availqty doesn't exist
    // in the harness, so shipped volume is the stand-in). The IN
    // rewrites to a semi-join against the aggregated relation; the
    // region chain broadcasts onto the 100-row supplier dim.
    EngineQuery(
      "sql_q20_qualified_suppliers",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        Tables.region(s, dir).createOrReplaceTempView("region_v")
        s.sql("""SELECT s_suppkey, s_name
                |FROM supplier_v JOIN nation_v ON s_nationkey = n_nationkey
                |JOIN region_v ON n_regionkey = r_regionkey
                |WHERE r_name = 'EUROPE'
                |  AND s_suppkey IN (
                |    SELECT l_suppkey FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
                |    WHERE p_name LIKE 'small%'
                |      AND l_shipdate >= TIMESTAMP '1996-01-01'
                |      AND l_shipdate < TIMESTAMP '1997-01-01'
                |    GROUP BY l_suppkey HAVING sum(CAST(l_quantity AS BIGINT)) > 400)
                |ORDER BY s_suppkey""".stripMargin)
      },
      Some("""SELECT s_suppkey, s_name
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'EUROPE'
             |  AND s_suppkey IN (
             |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
             |    WHERE p_name LIKE 'small%'
             |      AND l_shipdate >= TIMESTAMP '1996-01-01'
             |      AND l_shipdate < TIMESTAMP '1997-01-01'
             |    GROUP BY l_suppkey HAVING sum(CAST(l_quantity AS BIGINT)) > 400)
             |ORDER BY s_suppkey""".stripMargin),
    ),
    // TPC-H Q21 analog: suppliers who kept orders waiting — the classic
    // EXISTS + NOT EXISTS double correlation on the SAME fact table
    // ("another supplier contributed to the order" / "no other supplier
    // was ALSO late"). Late = ship > order + 60 days (no receipt/commit
    // dates in the harness). Catalyst turns the pair into a left-semi
    // and a left-anti join on l_orderkey — the NOT EXISTS correlates on
    // o_orderdate from the OUTER orders table, the stress case for
    // nested-correlation rewrites. Top-20 via TakeOrderedAndProject.
    EngineQuery(
      "sql_q21_waiting_suppliers",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        Tables.region(s, dir).createOrReplaceTempView("region_v")
        s.sql("""SELECT s_name, count(*) AS numwait
                |FROM supplier_v
                |JOIN lineitem_v l1 ON s_suppkey = l1.l_suppkey
                |JOIN orders_v o ON o.o_orderkey = l1.l_orderkey
                |JOIN nation_v ON s_nationkey = n_nationkey
                |JOIN region_v ON n_regionkey = r_regionkey
                |WHERE o.o_orderstatus = 'F' AND r_name = 'ASIA'
                |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                |  AND EXISTS (SELECT 1 FROM lineitem_v l2
                |              WHERE l2.l_orderkey = l1.l_orderkey
                |                AND l2.l_suppkey <> l1.l_suppkey)
                |  AND NOT EXISTS (SELECT 1 FROM lineitem_v l3
                |                  WHERE l3.l_orderkey = l1.l_orderkey
                |                    AND l3.l_suppkey <> l1.l_suppkey
                |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
                |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM supplier
             |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             |JOIN orders o ON o.o_orderkey = l1.l_orderkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o.o_orderstatus = 'F' AND r_name = 'ASIA'
             |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin),
      headline = true,
    ),
    // TPC-H Q13 analog: orders-per-customer distribution — the LEFT
    // OUTER join keeps zero-order customers in the c_count=0 bucket,
    // then a second (tiny) aggregation over counts.
    EngineQuery(
      "sql_q13_custdist",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT c_count, count(*) AS custdist
                |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                |      FROM customer_v c LEFT OUTER JOIN orders_v o
                |        ON c.c_custkey = o.o_custkey
                |      GROUP BY c.c_custkey) t
                |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
             |      FROM customer c LEFT OUTER JOIN orders o
             |        ON c.c_custkey = o.o_custkey
             |      GROUP BY c.c_custkey) t
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
    ),
    // TPC-H Q22 analog: scalar subquery threshold + correlated EXISTS.
    // The above-average test cross-multiplies by the count instead of
    // comparing against avg(): Spark types avg(DECIMAL) as DECIMAL and
    // DuckDB as DOUBLE, so the avg form would hinge on float rounding at
    // the boundary — sum/count cross-multiplication stays exact decimal
    // × integer in both engines. (EXISTS, not Q22's NOT EXISTS: every
    // harness customer has orders, so the anti form is vacuously empty.)
    EngineQuery(
      "sql_q22_balance_segments",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT c_mktsegment, count(*) AS numcust,
                |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
                |FROM customer_v c
                |WHERE CAST(c_acctbal AS DECIMAL(12,2))
                |      * (SELECT count(*) FROM customer_v WHERE c_acctbal > 0.0)
                |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2)))
                |       FROM customer_v WHERE c_acctbal > 0.0)
                |  AND EXISTS (SELECT 1 FROM orders_v o WHERE o.o_custkey = c.c_custkey)
                |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, count(*) AS numcust,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
             |FROM customer c
             |WHERE CAST(c_acctbal AS DECIMAL(12,2))
             |      * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
             |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2)))
             |       FROM customer WHERE c_acctbal > 0.0)
             |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),
    // LATERAL correlated subquery with ORDER BY + LIMIT — the SQL-2016
    // lateral-join surface (top-n per driving row). Catalyst
    // decorrelates the per-segment top-2 into a DomainJoin-derived
    // rank, never a per-row re-execution; the plan pin asserts no
    // nested loop over the fact side.
    EngineQuery(
      "sql_lateral_topk",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT t.c_mktsegment, l.o_orderkey, l.price
                |FROM (SELECT DISTINCT c_mktsegment FROM customer_v) t
                |JOIN LATERAL (
                |  SELECT o.o_orderkey,
                |    CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
                |  FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
                |  WHERE c.c_mktsegment = t.c_mktsegment
                |  ORDER BY CAST(o.o_totalprice AS DECIMAL(12,2)) DESC, o.o_orderkey
                |  LIMIT 2) l
                |ORDER BY t.c_mktsegment, l.price DESC, l.o_orderkey""".stripMargin)
      },
      Some("""SELECT t.c_mktsegment, l.o_orderkey, l.price
             |FROM (SELECT DISTINCT c_mktsegment FROM customer) t
             |JOIN LATERAL (
             |  SELECT o.o_orderkey,
             |    CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  WHERE c.c_mktsegment = t.c_mktsegment
             |  ORDER BY CAST(o.o_totalprice AS DECIMAL(12,2)) DESC, o.o_orderkey
             |  LIMIT 2) l ON true
             |ORDER BY t.c_mktsegment, l.price DESC, l.o_orderkey""".stripMargin),
    ),
    // Pairwise correlation MOMENTS across the numeric lineitem columns
    // in ONE aggregation pass — the Pearson-matrix building block
    // (corr = (n·Σxy − ΣxΣy) / √(…)); the engine surfaces the exact
    // integer moment sums and leaves the float division to the consumer
    // (the portability rule: no float crosses the gate). Scales chosen
    // BIGINT-overflow-safe through sf100: quantity as-is (≤50), price
    // in whole units (integer cents div 100), discount in permyriad.
    EngineQuery(
      "corr_moments_lineitem",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_quantity").cast(DecimalType(12, 2)).cast("long").as("q"),
          expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as long) div 100").as("p"),
          (col("l_discount").cast(DecimalType(6, 4)) * 10000).cast("long").as("d"))
        li.agg(
          count(lit(1)).as("n"),
          sum("q").as("sq"), sum("p").as("sp"), sum("d").as("sd"),
          sum(col("q") * col("q")).as("sqq"),
          sum(col("p") * col("p")).as("spp"),
          sum(col("d") * col("d")).as("sdd"),
          sum(col("q") * col("p")).as("sqp"),
          sum(col("q") * col("d")).as("sqd"),
          sum(col("p") * col("d")).as("spd"))
      },
      Some("""WITH t AS (
             |  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS q,
             |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100 AS p,
             |    CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT) AS d
             |  FROM lineitem)
             |SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
             |  CAST(sum(d) AS BIGINT) AS sd,
             |  CAST(sum(q*q) AS BIGINT) AS sqq, CAST(sum(p*p) AS BIGINT) AS spp,
             |  CAST(sum(d*d) AS BIGINT) AS sdd, CAST(sum(q*p) AS BIGINT) AS sqp,
             |  CAST(sum(q*d) AS BIGINT) AS sqd, CAST(sum(p*d) AS BIGINT) AS spd
             |FROM t""".stripMargin),
    ),
    // TPC-H Q2's decorrelation class — a correlated SCALAR AGGREGATE
    // subquery (each row compared against its own group's max), which
    // Catalyst rewrites into a grouped aggregate + equi-join rather
    // than a per-row execution. The equality compares the stored double
    // against itself (same bits both engines), never arithmetic.
    EngineQuery(
      "sql_correlated_max_order",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                |FROM orders_v o
                |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                |                      FROM orders_v o2
                |                      WHERE o2.o_custkey = o.o_custkey)
                |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders o
             |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
             |                      FROM orders o2
             |                      WHERE o2.o_custkey = o.o_custkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
    ),
    // Recursive CTE (Spark 4's WITH RECURSIVE → iterative UnionLoop
    // execution): ancestor-chain reachability over a deterministic
    // binary-tree parent edge (key DIV 2), the transitive-closure shape
    // the DataFrame CC loop (neardup_components) hand-rolls. All-integer
    // arithmetic; the only dialect split is integer division (Spark
    // `DIV`, DuckDB `//`).
    EngineQuery(
      "sql_recursive_reachability",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        s.sql("""WITH RECURSIVE anc(c_custkey, anc_key, depth) AS (
                |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer_v
                |  UNION ALL
                |  SELECT a.c_custkey, a.anc_key DIV 2, a.depth + 1
                |  FROM anc a WHERE a.anc_key > 1
                |)
                |SELECT c_custkey, max(depth) AS depth, count(*) AS chain_len
                |FROM anc GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)
      },
      Some("""WITH RECURSIVE anc(c_custkey, anc_key, depth) AS (
             |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
             |  UNION ALL
             |  SELECT a.c_custkey, a.anc_key // 2, a.depth + 1
             |  FROM anc a WHERE a.anc_key > 1
             |)
             |SELECT c_custkey, max(depth) AS depth, count(*) AS chain_len
             |FROM anc GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),
      headline = true,
    ),
    // Array scalar functions over tokenized text: distinct, sort,
    // slice, size — all codegen'd builtins (no UDFs).
    EngineQuery(
      "array_funcs_tokens",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
          .select(
            col("doc_id"),
            size(col("t")).cast("long").as("n_tokens"),
            size(array_distinct(col("t"))).cast("long").as("n_distinct"),
            concat_ws(" ", slice(array_sort(array_distinct(col("t"))), 1, 5)).as("first5_sorted"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  length(t) AS n_tokens,
             |  length(list_distinct(t)) AS n_distinct,
             |  array_to_string(list_sort(list_distinct(t))[1:5], ' ') AS first5_sorted
             |FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents)
             |ORDER BY doc_id""".stripMargin),
    ),
    // Pivot: long -> wide with an explicit value list (never the
    // implicit-distinct form, which needs an extra pass to discover
    // columns). Oracle is conditional aggregation — same plan shape
    // Spark lowers pivot to.
    EngineQuery(
      "pivot_event_counts",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_id"),
      // CAST each sum to BIGINT: DuckDB's bare sum() over integers yields
      // HUGEINT, Spark writes BIGINT — values match but the driver's
      // serialized-value hash would differ.
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // Unpivot (melt): wide -> long without a join or explode-side blowup
    // (Expand node, one pass).
    EngineQuery(
      "unpivot_quality_metrics",
      (s, dir) =>
        graft.text.TextAnalysis.qualityScore(Tables.documents(s, dir))
          .select("doc_id", "alpha_ratio", "stop_ratio", "score")
          .unpivot(
            Array(col("doc_id")),
            Array(col("alpha_ratio"), col("stop_ratio"), col("score")),
            "metric", "metric_value")
          .orderBy("doc_id", "metric"),
      Some("""WITH t AS (SELECT doc_id, text,
             |  length(text) AS n_chars,
             |  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
             |  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |       ELSE string_split_regex(trim(text), '\s+') END AS toks
             |  FROM documents),
             |u AS (SELECT doc_id,
             |  CAST(n_alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS alpha_ratio,
             |  CAST(length(list_filter(toks, x -> x IN ('the', 'of', 'and', 'to', 'in', 'a'))) AS DOUBLE)
             |    / CAST(greatest(length(toks), 1) AS DOUBLE) AS stop_ratio
             |  FROM t),
             |w AS (SELECT doc_id, alpha_ratio, stop_ratio,
             |  0.6 * alpha_ratio + 0.4 * stop_ratio AS score FROM u)
             |SELECT doc_id, 'alpha_ratio' AS metric, alpha_ratio AS metric_value FROM w
             |UNION ALL SELECT doc_id, 'score', score FROM w
             |UNION ALL SELECT doc_id, 'stop_ratio', stop_ratio FROM w
             |ORDER BY doc_id, metric""".stripMargin),
    ),
    // Typed Aggregator surface: exact integer moments, doubles derived
    // only at the end — reproducible under any partitioning.
    EngineQuery(
      "typed_agg_moments",
      (s, dir) => {
        val moments = udaf(graft.functions.ExactMomentsAgg)
        Tables.events(s, dir)
          .select(
            col("event_type"),
            expr("CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("qv"))
          .groupBy("event_type")
          .agg(moments(col("qv")).as("m"))
          .select(
            col("event_type"),
            col("m.n").as("cnt"),
            col("m.sum").as("sum_q"),
            col("m.sumsq").as("sumsq_q"),
            (col("m.sum").cast("double") / col("m.n").cast("double") / lit(100.0)).as("mean"),
            ((col("m.sumsq").cast("double") / col("m.n").cast("double")
              - (col("m.sum").cast("double") / col("m.n").cast("double"))
                * (col("m.sum").cast("double") / col("m.n").cast("double"))) / lit(10000.0)).as("var_pop"))
          .orderBy("event_type")
      },
      // sums CAST to BIGINT (DuckDB HUGEINT vs Spark BIGINT hash parity).
      Some("""WITH q AS (SELECT event_type, CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT) AS qv FROM events),
             |m AS (SELECT event_type, count(*) AS cnt, CAST(sum(qv) AS BIGINT) AS sum_q, CAST(sum(qv * qv) AS BIGINT) AS sumsq_q FROM q GROUP BY event_type)
             |SELECT event_type, cnt, sum_q, sumsq_q,
             |  CAST(sum_q AS DOUBLE) / CAST(cnt AS DOUBLE) / 100.0 AS mean,
             |  (CAST(sumsq_q AS DOUBLE) / CAST(cnt AS DOUBLE)
             |    - (CAST(sum_q AS DOUBLE) / CAST(cnt AS DOUBLE)) * (CAST(sum_q AS DOUBLE) / CAST(cnt AS DOUBLE))) / 10000.0 AS var_pop
             |FROM m ORDER BY event_type""".stripMargin),
    ),
    // JSON scalar functions: extract a typed field from the events
    // payload column (the reference has no json functions, SURVEY §2.2).
    EngineQuery(
      "json_extract_stats",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
          .orderBy("event_type"),
      // sum CAST to BIGINT (DuckDB HUGEINT vs Spark BIGINT hash parity).
      Some("""SELECT event_type, count(*) AS cnt,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    // Same extraction through the VARIANT lane (Spark 4 semi-structured
    // type): parse once into the binary variant encoding, then typed
    // path access — at scale this beats per-access string re-parsing
    // when several fields are read (parse cost paid once per row, and
    // shredded variant columns prune at the scan). Oracle = the JSON
    // twin's: the lane change must not change the relation —
    // try_parse_json, because get_json_object is lenient (NULL on
    // malformed input) and strict parse_json would instead fail the
    // query on one bad row.
    EngineQuery(
      "variant_extract_stats",
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_type"),
            expr("variant_get(try_parse_json(props), '$.k', 'long')").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    // Hierarchical subtotals: ROLLUP plans as a single Expand + one
    // aggregate pass — no per-level re-scan. (Category absent from the
    // reference: SURVEY §2.2 "no grouping sets, cube, or rollup".)
    EngineQuery(
      "rollup_order_stats",
      (s, dir) =>
        Tables.orders(s, dir)
          .rollup("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("cnt"), sum(dec("o_totalprice")).cast("double").as("revenue"))
          .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
             |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
    ),
    EngineQuery(
      "cube_lineitem_stats",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), sum(dec("l_quantity")).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    ),
    // TPC-H Q6 shape — the forecast-revenue scan-aggregate: every
    // predicate (date band, discount band, quantity cap) must reach the
    // parquet scan as a pushed filter — which is why the date band is a
    // RANGE comparison on the raw column, not year(): a function wrap
    // would block pushdown (asserted in PlanAuditSpec). No join, no
    // shuffle beyond the single global aggregate. Revenue accumulates in
    // the exact decimal lane (price × discount), double only at the end.
    EngineQuery(
      "q6_forecast_revenue",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .where(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(
            sum(dec("l_extendedprice") * dec("l_discount")).cast("double").as("revenue"),
            count(lit(1)).as("cnt")),
      Some("""SELECT
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             |  count(*) AS cnt
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
    ),
    // TPC-H Q14 shape — promo revenue share: fact × small dimension
    // (broadcast — lineitem never shuffles to join), conditional decimal
    // aggregation, ratio derived from the two exact sums in one pass.
    EngineQuery(
      "q14_promo_revenue",
      (s, dir) => {
        val one = lit(1).cast(DecimalType(12, 2))
        val rev = dec("l_extendedprice") * (one - dec("l_discount"))
        Tables.lineitem(s, dir)
          .where(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(12, 2))))
              .cast("double").as("promo_revenue"),
            sum(rev).cast("double").as("total_revenue"),
            count(lit(1)).as("cnt"))
          .select(
            col("promo_revenue"), col("total_revenue"), col("cnt"),
            (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_share"))
      },
      Some("""WITH j AS (
             |  SELECT p_type,
             |    CAST(l_extendedprice AS DECIMAL(12,2))
             |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS rev
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'),
             |agg AS (
             |  SELECT
             |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
             |    CAST(sum(rev) AS DOUBLE) AS total_revenue,
             |    count(*) AS cnt
             |  FROM j)
             |SELECT promo_revenue, total_revenue, cnt,
             |  100.0 * promo_revenue / total_revenue AS promo_share
             |FROM agg""".stripMargin),
    ),
    // Arbitrary grouping sets (the general form rollup/cube specialize):
    // Spark 4's Dataset.groupingSets API — still one Expand + one
    // aggregate pass, no per-set re-scan.
    EngineQuery(
      "grouping_sets_stats",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupingSets(
            Seq(
              Seq(col("o_orderpriority"), col("o_orderstatus")),
              Seq(col("o_orderstatus")),
              Seq.empty),
            col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), sum(dec("o_totalprice")).cast("double").as("revenue"))
          .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
             |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
    ),
    // Mergeable-sketch distinct counting: per (event_type, day) HLL
    // sketches — the pre-aggregated rollup a 100 TB pipeline stores —
    // then hll_union_agg merges the partials into per-type estimates
    // WITHOUT re-touching rows. Re-aggregatability is what exact
    // count(distinct) can't give you: a day's sketch is computed once,
    // and any date-range cardinality is a cheap union of stored
    // sketches. Self-verifying gate (sketches aren't engine-portable):
    // lgConfigK=14 keeps typical error under 1%; the gate asserts ±5%
    // of exact alongside the deterministic exact count.
    EngineQuery(
      "hll_partitioned_distinct",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val daily = ev
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
        val est = daily.groupBy("event_type")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
        val exact = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_users"))
        est.join(exact, Seq("event_type"))
          .select(
            col("event_type"), col("exact_users"),
            (abs(col("est") - col("exact_users")) <= col("exact_users").cast("double") * 0.05)
              .as("est_ok"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS est_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    // Rolling 7-day active users — THE growth metric exact distinct
    // can't serve at scale (distinct aggregates don't window): per-day
    // HLL sketches stored once, the trailing week is a RANGE-frame
    // hll_union_agg over 7 stored sketches per day (no row re-touch,
    // the sketch-store pattern applied to a sliding window). Exact twin
    // for the gate: each (user, day) spreads to the 7 target days it
    // counts toward — distinct pairs, then a per-day count; the spread
    // relation is 7×|user-days|, corpus-bounded. Self-verifying gate
    // (sketches aren't engine-portable): exact value + a ±5% est flag.
    EngineQuery(
      "rolling_7d_active_users",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
          .distinct()
        val daily = ev.groupBy("day").agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
        val est = daily.selectExpr(
          "day",
          """hll_sketch_estimate(hll_union_agg(sk, false) OVER
            |  (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS est""".stripMargin)
        val exact = ev
          .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
          .distinct()
          .groupBy("day").agg(count(lit(1)).as("exact_7d_users"))
        est.join(exact, Seq("day"))
          .select(
            col("day"), col("exact_7d_users"),
            (abs(col("est") - col("exact_7d_users"))
              <= col("exact_7d_users").cast("double") * 0.05).as("est_ok"))
          .orderBy("day")
      },
      Some("""WITH ev AS (
             |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
             |sp AS (
             |  SELECT DISTINCT user_id, day + i AS day
             |  FROM ev, range(0, 7) t(i)),
             |days AS (SELECT DISTINCT day FROM ev),
             |exact AS (
             |  SELECT sp.day, CAST(count(*) AS BIGINT) AS exact_7d_users
             |  FROM sp JOIN days d ON sp.day = d.day GROUP BY 1)
             |SELECT day, exact_7d_users, true AS est_ok
             |FROM exact ORDER BY day""".stripMargin),
    ),
    // Temporal scalar functions over the order date (the reference has
    // no date/time functions at all, SURVEY §2.2).
    EngineQuery(
      "date_extract_stats",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(
            year(col("o_orderdate")).cast("long").as("o_year"),
            quarter(col("o_orderdate")).cast("long").as("o_quarter"))
          .agg(count(lit(1)).as("cnt"), sum(dec("o_totalprice")).cast("double").as("revenue"))
          .orderBy("o_year", "o_quarter"),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY o_year, o_quarter ORDER BY o_year, o_quarter""".stripMargin),
    ),
    // Exact interpolated percentiles (Spark `percentile` and DuckDB
    // `quantile_cont` share the (1-f)·lo + f·hi definition).
    EngineQuery(
      "percentile_prices",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("p50"),
            expr("percentile(o_totalprice, 0.9)").as("p90"),
            count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  quantile_cont(o_totalprice, 0.5) AS p50,
             |  quantile_cont(o_totalprice, 0.9) AS p90,
             |  count(*) AS cnt
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),
    // Sketch twin: approximate percentile — the bounded-state path at
    // 100 TB. Self-verifying gate: approx_percentile(accuracy=1000)
    // guarantees rank error ≤ n/1000, so the sketch value must lie in
    // the exact ±0.01-quantile bracket (10× slack) — the relation emits
    // the exact percentiles plus the two bracket booleans, making the
    // oracle deterministic: exact quantiles + literal true.
    EngineQuery(
      "percentile_prices_approx",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("p50"),
            expr("percentile(o_totalprice, 0.9)").as("p90"),
            expr("approx_percentile(o_totalprice, 0.5, 1000)").as("__ap50"),
            expr("approx_percentile(o_totalprice, 0.9, 1000)").as("__ap90"),
            expr("percentile(o_totalprice, 0.49)").as("__lo50"),
            expr("percentile(o_totalprice, 0.51)").as("__hi50"),
            expr("percentile(o_totalprice, 0.89)").as("__lo90"),
            expr("percentile(o_totalprice, 0.91)").as("__hi90"))
          .select(
            col("o_orderpriority"), col("p50"), col("p90"),
            (col("__ap50") >= col("__lo50") && col("__ap50") <= col("__hi50")).as("p50_in_bracket"),
            (col("__ap90") >= col("__lo90") && col("__ap90") <= col("__hi90")).as("p90_in_bracket"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  quantile_cont(o_totalprice, 0.5) AS p50,
             |  quantile_cont(o_totalprice, 0.9) AS p90,
             |  true AS p50_in_bracket,
             |  true AS p90_in_bracket
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),
    // Skew-safe aggregation: event_type is a classic hot-key column
    // (few values, millions of rows each at scale); the salted two-phase
    // plan must produce exactly the plain GROUP BY result.
    EngineQuery(
      "salted_group_count",
      (s, dir) =>
        saltedGroupCount(Tables.events(s, dir), "event_type", col("event_id"), 32)
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      headline = true,
    ),
    // Join-key skew: 1% of lineitem rows and 1% of orders collapse onto
    // one hot key; the shuffle sort-merge join inherits the straggler
    // partition and AQE splits it at runtime (see skewedJoinStats doc).
    EngineQuery(
      "skew_join_hot_key",
      (s, dir) =>
        skewedJoinStats(Tables.lineitem(s, dir), Tables.orders(s, dir))
          .orderBy("o_orderpriority"),
      Some("""WITH li AS (
             |  SELECT CASE WHEN l_orderkey % 100 = 0 THEN 0 ELSE l_orderkey END AS hot_key,
             |    CAST(l_quantity AS DECIMAL(12,2)) AS qty
             |  FROM lineitem),
             |o AS (
             |  SELECT CASE WHEN o_orderkey % 100 = 0 THEN 0 ELSE o_orderkey END AS hot_key,
             |    o_orderpriority
             |  FROM orders)
             |SELECT o_orderpriority, count(*) AS cnt,
             |  CAST(sum(qty) AS DOUBLE) AS qty
             |FROM li JOIN o USING (hot_key)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      headline = true,
    ),
    // Same relation, pair mass virtual — see skewedJoinStatsPreagg.
    // The oracle is intentionally the naive pair-enumerating SQL: the
    // gate proves eager aggregation ≡ the cross product it avoids.
    EngineQuery(
      "skew_join_preagg",
      (s, dir) =>
        skewedJoinStatsPreagg(Tables.lineitem(s, dir), Tables.orders(s, dir))
          .orderBy("o_orderpriority"),
      Some("""WITH li AS (
             |  SELECT CASE WHEN l_orderkey % 100 = 0 THEN 0 ELSE l_orderkey END AS hot_key,
             |    CAST(l_quantity AS DECIMAL(12,2)) AS qty
             |  FROM lineitem),
             |o AS (
             |  SELECT CASE WHEN o_orderkey % 100 = 0 THEN 0 ELSE o_orderkey END AS hot_key,
             |    o_orderpriority
             |  FROM orders)
             |SELECT o_orderpriority, count(*) AS cnt,
             |  CAST(sum(qty) AS DOUBLE) AS qty
             |FROM li JOIN o USING (hot_key)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      headline = true,
    ),
    // Array-valued aggregation: per-customer sorted order-key list.
    // collect_list is order-nondeterministic under parallelism, so the
    // engine ALWAYS sorts the collected array — the only way a
    // list-valued aggregate is reproducible across partitionings/engines.
    // The gate emits the list as a CSV scalar (sorted numerically FIRST,
    // then stringified): the driver's pandas checker cannot sort/hash raw
    // ARRAY cells, so the portable twin IS the graded output. Callers who
    // want the typed array use collectOrdersPerCustomer directly.
    EngineQuery(
      "collect_orders_per_customer",
      (s, dir) =>
        collectOrdersPerCustomer(Tables.orders(s, dir))
          .select(
            col("o_custkey"),
            concat_ws(",", transform(col("order_keys"), _.cast("string")))
              .as("order_keys_csv"),
            col("cnt"))
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
             |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys_csv,
             |  count(*) AS cnt
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
    ),
    // Global top-k: Spark plans TakeOrderedAndProject — per-partition
    // heaps + a k-row driver merge, no full sort at scale.
    EngineQuery(
      "topk_global",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .withColumn("l_linenumber", col("l_linenumber").cast("long"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(10),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
             |FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin),
    ),
  )
}
