package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Market-basket analysis: frequent item pairs and association rules
  * (support / confidence / lift) over order baskets — the classic
  * retail-analytics MapReduce workload (Agrawal–Srikant a-priori, first
  * two levels). The reference engine (a k-mer counter,
  * `/root/reference/src/main.cpp:105-248`) has nothing in this
  * category; the co-purchase PAIR expansion reuses the exact shape
  * already audited for [[GraphRank.coPurchaseEdges]].
  *
  * Exactness/portability: support is an exact BIGINT order count;
  * confidence and lift are surfaced as integer permilles via BIGINT
  * `div` (truncation identical to DuckDB `//` on the all-positive
  * domain) — no float ratio ever crosses an exchange, so both engines
  * agree bit-for-bit.
  *
  * Scale notes (100 TB): the basket relation first collapses to
  * distinct (order, item) — partial+final on a narrow pair — and the
  * pair expansion is a self-equi-join on the order key, O(rows ·
  * basket_size), never quadratic in the table. `maxBasket` hard-caps
  * degenerate mega-baskets (a wholesale order with 10^5 items would
  * otherwise expand to 10^10 pairs on one key); the cap is part of the
  * operator's semantics and the oracle replicates it. Item totals and
  * the 1-row basket count attach to the pair relation by broadcast
  * (item counts are vocabulary-scale), so the only wide exchanges key
  * on the order id and the pair.
  */
object MarketBasket {

  /** Distinct (order, item) basket rows, mega-baskets capped out.
    *
    * One explicit repartition on the order key up front; everything
    * downstream — the (ok, pk) dedup, the basket-size window, and the
    * pair self-join — is distribution-preserving on that partitioning
    * (the [[GraphRank.pagerank]] discipline), so the basket relation
    * crosses the wire once, not once per operator. The size cap rides
    * a window count instead of a groupBy+semi-join: same partition-
    * local pass, no second relation.
    */
  def baskets(lineitem: DataFrame, maxBasket: Int): DataFrame = {
    val shuffleParts =
      lineitem.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(shuffleParts, col("ok"))
      .distinct()
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("ok")))
      .where(col("bsz") <= maxBasket)
      .select("ok", "pk")
  }

  /** Association rules a→b with support ≥ minSup:
    * (antecedent, consequent, support, conf_permille, lift_permille).
    *
    * Pair support is SYMMETRIC (both items of an unordered pair appear
    * in the same orders), so the expansion joins on `a.pk < b.pk`,
    * aggregates each unordered pair ONCE, applies the support floor,
    * and only then mirrors the surviving pairs into both rule
    * directions — the pair exchange and the aggregation hash table
    * carry half the rows of the naive `a.pk <> b.pk` formulation,
    * and the (tiny) post-floor relation is what gets doubled. Output
    * is row-identical to the naive form.
    */
  def assocRules(lineitem: DataFrame, minSup: Long, maxBasket: Int = 64): DataFrame = {
    // By-convention pin (harness frees), with the ok-hash layout
    // DECLARED (r19 optimization round): the basket relation has FOUR
    // consumers — the 1-row order count, the item totals, and both
    // sides of the pair self-join. AQE's ReusedExchange dedups only the
    // repartition exchange below them; the distinct aggregate + basket-
    // size window + cap filter above it re-executed once per consumer
    // (4× over the fact table at any scale). The declared pin runs that
    // derivation ONCE and keeps the self-join partition-local; the
    // window's partition-key sort makes sortedByKeys true for free, so
    // the merge join needs no re-sort either.
    val shuffleParts =
      lineitem.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val (op, _) =
      org.apache.spark.sql.graftplan.PartitionedCheckpoint.localEagerDeclared(
        baskets(lineitem, maxBasket), Seq("ok"), shuffleParts, sortedByKeys = true)
    val nOrders = op.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCnt = op.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val pairCnt = op.as("a")
      .join(op.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("lo"), col("b.pk").as("hi"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
      .select(explode(array(
        struct(col("lo").as("antecedent"), col("hi").as("consequent")),
        struct(col("hi").as("antecedent"), col("lo").as("consequent")))).as("p"),
        col("support"))
      .select(col("p.antecedent"), col("p.consequent"), col("support"))
    pairCnt
      .join(broadcast(itemCnt.withColumnRenamed("pk", "antecedent")
        .withColumnRenamed("n_item", "n_a")), "antecedent")
      .join(broadcast(itemCnt.withColumnRenamed("pk", "consequent")
        .withColumnRenamed("n_item", "n_b")), "consequent")
      .crossJoin(broadcast(nOrders))
      .select(
        col("antecedent"), col("consequent"), col("support"),
        expr("(1000 * support) div n_a").as("conf_permille"),
        expr("(1000 * support * n_orders) div (n_a * n_b)").as("lift_permille"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "assoc_rules_lift",
      (s, dir) => assocRules(Tables.lineitem(s, dir), minSup = 3)
        .orderBy("antecedent", "consequent"),
      Some("""WITH op0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |op AS (
             |  SELECT ok, pk FROM op0
             |  WHERE ok IN (SELECT ok FROM op0 GROUP BY ok HAVING count(*) <= 64)),
             |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM op),
             |item AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM op GROUP BY pk),
             |pair AS (
             |  SELECT a.pk AS antecedent, b.pk AS consequent,
             |    CAST(count(*) AS BIGINT) AS support
             |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT p.antecedent, p.consequent, p.support,
             |  (1000 * p.support) // ia.n_item AS conf_permille,
             |  (1000 * p.support * t.n_orders) // (ia.n_item * ib.n_item) AS lift_permille
             |FROM pair p
             |JOIN item ia ON ia.pk = p.antecedent
             |JOIN item ib ON ib.pk = p.consequent
             |CROSS JOIN tot t
             |ORDER BY antecedent, consequent""".stripMargin),
      headline = true,
    ),
  )
}
