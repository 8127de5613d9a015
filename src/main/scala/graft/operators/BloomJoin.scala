package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{EngineQuery, Tables}

/** Bloom-filter semi-join pruning — the runtime-filter / sideways-
  * information-passing pattern (Spark's own `InjectRuntimeFilter`,
  * Trino/Presto dynamic filters; Bloom 1970): when the build side of a
  * selective join is too large to broadcast as raw keys but its
  * MEMBERSHIP fits in a fixed-size bitmap, build the bitmap with one
  * small aggregation, broadcast it, and prefilter the probe side AT THE
  * SCAN — rows that cannot join never enter the join's shuffle.
  *
  * Not in the reference (its one join-shaped op is the verifier's
  * equi-join, `scripts/verifier.py:22-36`); this is a north-star scale
  * operator: at 100 TB the probe-side shuffle is THE cost of a
  * selective join, and a 16 KiB bitmap that removes 80% of probe rows
  * before the exchange is the difference between shuffling 100 TB and
  * shuffling 20 TB.
  *
  * Everything is native SQL expressions — no UDF, no driver-side
  * filter object (Spark's own runtime filter materializes the bloom on
  * the driver; here even that is avoided: the bitmap is a one-row
  * DataFrame broadcast by AQE's single-row cross-join pattern used
  * throughout this repo, so the build never leaves the cluster):
  *
  *  1. build keys → one md5 per key → `NumHashes` universal-hash
  *     positions from the digest's 32-bit hex lanes (same portable
  *     md5-lane scheme as [[graft.dedup.Dedup]] MinHash);
  *  2. positions → 32-bit words, `bit_or` partial+final aggregation →
  *     ≤ `NumWords` rows → one dense `array<bigint>` row;
  *  3. probe rows evaluate all `NumHashes` bit tests as scalar
  *     projections against the broadcast array — zero shuffle, inside
  *     WholeStageCodegen;
  *  4. an exact semi-join on the survivors removes Bloom false
  *     positives (no false negatives exist by construction), so the
  *     operator is semantically TRANSPARENT: result ≡ plain semi-join,
  *     which is exactly what the oracle checks.
  *
  * Hash portability: md5-hex lanes + integer modular arithmetic only,
  * so DuckDB reproduces the bitmap bit-for-bit
  * (`CAST('0x' || substr(md5(k), a, 8) AS BIGINT)`); the stats query's
  * false-positive count is therefore exactly checkable cross-engine.
  * Words are 32-bit (mask ≤ 2^31 in a BIGINT) so no engine touches the
  * sign bit.
  */
object BloomJoin {

  /** Bitmap size in bits (2^17 → 4096 32-bit words, 16 KiB). At the
    * build cardinalities this demo targets (thousands to tens of
    * thousands of keys) the false-positive rate spans ~1e-5 (sf0.01) to
    * ~0.15 (sf0.1) — both regimes exercised by the same constants. A
    * production call sizes m from an observed build count; the operator
    * only requires m = 64 × NumWords.
    */
  val NumBits = 1 << 17
  val WordBits = 32
  val NumWords: Int = NumBits / WordBits
  val NumHashes = 5
  /** Hash constants for [[graft.functions.PortableHash]]: odd A < 2^14
    * so A·lane < 2^46 never overflows BIGINT in either engine. */
  val A = Seq(3967L, 4349L, 5843L, 7919L, 9973L)
  val B = Seq(101L, 211L, 307L, 401L, 503L)

  /** Position of hash `i` given a digest column named `__d` — the
    * shared portable-hash fragment (same arithmetic as the DuckDB
    * oracle below). */
  private def posSql(i: Int): String =
    graft.functions.PortableHash.posSqlSpark("__d", i % 4, A(i), B(i), NumBits.toLong)

  /** One dense bitmap row: `bloom: array<bigint>` of length NumWords.
    * The aggregation is partial+final `bit_or` over ≤ NumWords word
    * indices — shuffle volume is the bitmap, not the keys.
    */
  def bloomBitmap(keys: DataFrame, keyCol: String): DataFrame = {
    val pos = keys
      .select(md5(col(keyCol).cast("string")).as("__d"))
      .select(explode(array((0 until NumHashes).map(i => expr(posSql(i))): _*)).as("p"))
    pos
      .select(
        expr(s"CAST(p div $WordBits AS INT)").as("w"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $WordBits AS INT))").as("m"))
      .groupBy("w")
      .agg(bit_or(col("m")).as("bits"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("__m"))
      .select(
        transform(
          sequence(lit(0), lit(NumWords - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("bloom"))
  }

  /** All-bits-set membership test against the broadcast `bloom` array
    * column, for PRE-COMPUTED position columns `__p0..__p{NumHashes-1}`.
    * Pure scalar conjunction — NumHashes `element_at` + bit tests per
    * row, each on attribute inputs only. */
  private def mightContain: Column =
    (0 until NumHashes).map { i =>
      expr(
        s"(element_at(bloom, CAST(__p$i div $WordBits AS INT) + 1) & " +
          s"shiftleft(CAST(1 AS BIGINT), CAST(__p$i % $WordBits AS INT))) != 0")
    }.reduce(_ && _)

  /** Probe rows surviving the Bloom prefilter (false positives
    * included). The bitmap row arrives via broadcast cross-join; the
    * filter itself is a zero-shuffle scan-side projection.
    *
    * The five hash POSITIONS are hoisted into the probe-side Project
    * (r19 optimization round): as part of the filter condition they
    * were re-derived from the digest per bit test — two conv/substring
    * lane parses per hash — inside a join condition, where codegen
    * subexpression elimination does not apply. As projected columns
    * the digest parses once per lane under Project-level CSE, and the
    * surviving condition is five element_at + mask tests on attributes.
    */
  def bloomPrefilter(probe: DataFrame, probeKey: String, bitmap: DataFrame): DataFrame = {
    // isnotnull(probeKey) first: a null key can never pass a semi-join,
    // and pre-coalesce a null digest made every bit test null (row
    // dropped) — so dropping nulls here preserves both callers' results
    // exactly. Without it, coalesce(…, 0) below would map a null key's
    // five positions all to 0 and pass it iff bit 0 of word 0 is set,
    // which `bloomStats` (whose n_pass_bloom is oracle-checked exactly)
    // would expose on any probe relation with null keys. The filter is
    // on the raw key attribute, so it pushes to the scan for free.
    //
    // coalesce(…, 0): positions are non-null after the key filter, but
    // a NULLABLE position column makes InferFiltersFromConstraints
    // derive isnotnull(<position>) from the bit-test condition and push
    // it below this Project as a scan-side Filter that RE-EVALUATES the
    // whole md5+conv chain per hash — doubling the per-row hash work
    // (measured: 5.05s vs 3.2s at sf0.1). Non-nullable output ⇒ no
    // constraint to infer.
    val withPos = (0 until NumHashes).foldLeft(
      probe.where(col(probeKey).isNotNull)
        .withColumn("__d", md5(col(probeKey).cast("string")))) {
      case (df, i) => df.withColumn(s"__p$i", coalesce(expr(posSql(i)), lit(0L)))
    }
    withPos
      .crossJoin(broadcast(bitmap))
      .where(mightContain)
      .drop("__d" +: "bloom" +: (0 until NumHashes).map(i => s"__p$i"): _*)
  }

  /** The transparent operator: Bloom-prune `probe` on `probeKey`
    * against `build`'s `buildKey` set, then an exact equi-join against
    * the DISTINCT key set to kill false positives (distinct keys ⇒ the
    * inner join has semi-join multiplicity). Result ≡
    * `probe SEMI JOIN build`, with the join's probe-side exchange fed
    * only by Bloom survivors.
    *
    * Inner join, NOT left_semi (r19 optimization round): the optimizer's
    * `PushDownLeftSemiAntiJoin` sank a left-semi below the bitmap
    * cross-join + filter, so the EXECUTED plan ran the exact semi-join
    * on the raw probe side and applied the Bloom test to its output —
    * the exact inversion of this operator's contract (PLANS.md's own
    * r18 dump shows `BroadcastHashJoin LeftSemi` below the
    * `BroadcastNestedLoopJoin` bitmap attach while the prose claims
    * scan-side pruning; at 100 TB, where the build side is not
    * broadcastable, the probe exchange would have carried the UNPRUNED
    * stream and the bitmap would have pruned nothing). Inner joins are
    * outside that pushdown rule, and `ReorderJoin` preserves the
    * bitmap-first order, so the bit tests now run below the exact
    * join — [[graft.curation.Curation.decontaminateBloom]] has always
    * used this inner-join formulation for the same reason.
    */
  def bloomSemiJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String): DataFrame = {
    val keys = build.select(col(buildKey)).distinct()
    bloomPrefilter(probe, probeKey, bloomBitmap(keys, buildKey))
      .join(keys.withColumnRenamed(buildKey, probeKey), Seq(probeKey))
  }

  // ---------------------------------------------------------------- queries

  private val urgent = "1-URGENT"

  private def dec(c: String) = col(c).cast(DecimalType(12, 2))

  /** Revenue of lineitems belonging to URGENT orders, computed through
    * the Bloom-pruned semi-join. The oracle is the PLAIN semi-join —
    * transparency is the contract under test. */
  private def prunedRevenue(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val build = Tables.orders(s, dir).where(col("o_orderpriority") === urgent)
    bloomSemiJoin(Tables.lineitem(s, dir), "l_orderkey", build, "o_orderkey")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Distinct-key Bloom accounting: build size, probe key count, keys
    * passing the Bloom test, keys truly present, and false positives —
    * the DuckDB oracle rebuilds the identical bitmap, so `n_false_pos`
    * is checked exactly, not just bounded. */
  private def bloomStats(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val build = Tables.orders(s, dir)
      .where(col("o_orderpriority") === urgent)
      .select(col("o_orderkey")).distinct()
    val probeKeys = Tables.lineitem(s, dir).select(col("l_orderkey")).distinct()
    val passed = bloomPrefilter(probeKeys, "l_orderkey", bloomBitmap(build, "o_orderkey"))
    val trueKeys = probeKeys.join(
      build.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_semi")
    val fp = passed.join(
      build.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_anti")
    val one = (d: DataFrame, n: String) => d.agg(count(lit(1)).as(n))
    one(build, "n_build_keys")
      .crossJoin(one(probeKeys, "n_probe_keys"))
      .crossJoin(one(passed, "n_pass_bloom"))
      .crossJoin(one(trueKeys, "n_true_keys"))
      .crossJoin(one(fp, "n_false_pos"))
  }

  /** The bloom position arithmetic in DuckDB syntax — same shared
    * fragment, oracle side. `col` is the key expression. */
  private def duckPos(col: String, i: Int): String =
    graft.functions.PortableHash.posSqlDuck(
      s"CAST($col AS VARCHAR)", i % 4, A(i), B(i), NumBits.toLong)

  private def duckWords: String = {
    val posList = (0 until NumHashes).map(i => duckPos("key", i)).mkString(", ")
    s"""bkeys AS (SELECT DISTINCT o_orderkey AS key FROM orders WHERE o_orderpriority = '$urgent'),
       |bpos AS (SELECT unnest([$posList]) AS p FROM bkeys),
       |words AS (SELECT p // $WordBits AS w,
       |  bit_or(CAST(1 AS BIGINT) << CAST(p % $WordBits AS INT)) AS bits
       |  FROM bpos GROUP BY 1)""".stripMargin
  }

  private def duckStats: String = {
    val joins = (0 until NumHashes).map { i =>
      val p = duckPos("p.key", i)
      s"""JOIN words w$i ON w$i.w = $p // $WordBits
         |  AND (w$i.bits & (CAST(1 AS BIGINT) << CAST($p % $WordBits AS INT))) <> 0""".stripMargin
    }.mkString("\n  ")
    s"""WITH $duckWords,
       |pkeys AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
       |pass AS (SELECT p.key FROM pkeys p
       |  $joins),
       |tk AS (SELECT key FROM pkeys WHERE key IN (SELECT key FROM bkeys)),
       |fp AS (SELECT key FROM pass WHERE key NOT IN (SELECT key FROM bkeys))
       |SELECT (SELECT count(*) FROM bkeys) AS n_build_keys,
       |  (SELECT count(*) FROM pkeys) AS n_probe_keys,
       |  (SELECT count(*) FROM pass) AS n_pass_bloom,
       |  (SELECT count(*) FROM tk) AS n_true_keys,
       |  (SELECT count(*) FROM fp) AS n_false_pos""".stripMargin
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "bloom_semi_join_pruned",
      (s, dir) => prunedRevenue(s, dir),
      Some(s"""SELECT l_returnflag, count(*) AS n_rows,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '$urgent')
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      headline = true,
    ),
    EngineQuery(
      "bloom_filter_stats",
      (s, dir) => bloomStats(s, dir),
      Some(duckStats),
    ),
  )
}
